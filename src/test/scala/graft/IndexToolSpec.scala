package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnIndex

/** The maintenance CLI drives the same library entry points an operator's
  * runbook needs — compact, recall gauge (with the alerting exit code),
  * rebuild, crash recovery — against a real index. */
class IndexToolSpec extends SparkTestBase {
  import spark.implicits._

  test("IndexTool: compact, recall (with --min alerting), rebuild, recover") {
    val dim = 8
    val rnd = new scala.util.Random(71)
    val emb = (0 until 300).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    val path = java.nio.file.Files.createTempDirectory("graft-tool").toString + "/idx"
    val cents = graft.operators.AnnSearch.kmeans(emb, "vid", col("v"), 8)
    AnnIndex.buildIvf(emb, "vid", col("v"), cents, path)
    val extra = (300 until 340).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    AnnIndex.append(extra, "vid", col("v"), path, batchId = Some(0L))

    val q = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    def answer() = AnnIndex.ivfTopK(spark, path, "vid", q, 10, nProbe = 8)
      .collect().map(_.toSeq).toSeq
    val before = answer()

    // compact folds batch=0 into the base; answers unchanged
    assert(IndexTool.run(spark, Array("compact", path)) == 0)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("batch=-1"), dirs.toString)
    assert(answer() == before)

    // recall: all-probe recall is ~1; the --min gate exits 0 below it and
    // 3 when the demanded floor is unreachable
    assert(IndexTool.run(spark, Array("recall", path, "vid",
      "--nprobe", "8", "--min", "0.99")) == 0)
    assert(IndexTool.run(spark, Array("recall", path, "vid",
      "--nprobe", "1", "--min", "1.01")) == 3)

    // rebuild keeps the corpus and the sidecar kind
    assert(IndexTool.run(spark, Array("rebuild", path, "vid",
      "--iters", "3")) == 0)
    assert(spark.read.parquet(path).count() == 340)
    assert(AnnIndex.readIvfCentroids(spark, path).get.size == 8)

    // recover repairs a mid-swap crash state
    java.nio.file.Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(path + "__old"))
    assert(IndexTool.run(spark, Array("recover", path)) == 0)
    assert(spark.read.parquet(path).count() == 340)

    // unknown action is a usage error, not an exception
    assert(IndexTool.run(spark, Array("frobnicate", path)) == 2)
  }

  test("IndexTool: recall-pq gauges an IVF-PQ index against a source table, " +
    "with the --min exit gate; --source is mandatory") {
    val dim = 8
    val rnd = new scala.util.Random(73)
    val emb = (0 until 200).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-toolpq").toString
    emb.write.mode("overwrite").parquet(s"$dir/src")
    val cents = graft.operators.AnnSearch.kmeans(emb, "vid", col("embedding"), 4)
    val books = graft.operators.Quantize.pqTrain(emb, col("vid"),
      col("embedding"), m = 2, nCodes = 8, iters = 2)
    AnnIndex.buildIvfPq(emb, "vid", col("embedding"), cents, books, s"$dir/idx")
    assert(IndexTool.run(spark, Array("recall-pq", s"$dir/idx", "vid",
      "--source", s"$dir/src", "--nprobe", "4", "--min", "0.1")) == 0)
    assert(IndexTool.run(spark, Array("recall-pq", s"$dir/idx", "vid",
      "--source", s"$dir/src", "--nprobe", "4", "--min", "1.01")) == 3)
    assert(IndexTool.run(spark, Array("recall-pq", s"$dir/idx", "vid")) == 2)
  }

  test("IndexTool: compact-fp and compact-sink fold their tables in place") {
    import graft.operators.Dedup
    import graft.streaming.StreamOps
    val root = java.nio.file.Files.createTempDirectory("graft-tool2").toString
    val fp = s"$root/fp"
    Dedup.writeFingerprintIndex(Seq((1L, "a b c")).toDF("id", "text"),
      "id", col("text"), fp)
    Dedup.writeFingerprintIndex(Seq((2L, "d e f")).toDF("id", "text"),
      "id", col("text"), fp, batchId = Some(0L))
    assert(IndexTool.run(spark, Array("compact-fp", fp)) == 0)
    assert(new java.io.File(fp).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet == Set("batch=-1"))
    assert(spark.read.parquet(fp).count() == 2)

    val sink = s"$root/sink"
    StreamOps.parquetSink(sink)(Seq((1L, "x")).toDF("id", "t"), 0L)
    StreamOps.parquetSink(sink)(Seq((2L, "y")).toDF("id", "t"), 1L)
    assert(IndexTool.run(spark, Array("compact-sink", sink)) == 0)
    assert(StreamOps.readSink(spark, sink).count() == 2)
    // a batch replayed across the fold no-ops
    StreamOps.parquetSink(sink)(Seq((1L, "x")).toDF("id", "t"), 0L)
    assert(StreamOps.readSink(spark, sink).count() == 2)
  }

  test("IndexTool: bloom builds the prefilter sidecar; missing operand " +
    "and unknown action exit 2") {
    import graft.operators.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft-tool3").toString
    val fp = s"$root/fp"
    Dedup.writeFingerprintIndex(
      (1L to 20L).map(i => (i, s"doc $i")).toDF("id", "text"),
      "id", col("text"), fp)
    assert(IndexTool.run(spark, Array("bloom", fp, "--fpp", "0.02")) == 0)
    assert(Dedup.readFingerprintBloom(spark, fp).isDefined)
    val dup = Seq((99L, "doc 5")).toDF("id", "text")
    assert(Dedup.incrementalExactBloom(dup, "id", col("text"), fp, None)
      .select("id", "keeper").as[(Long, Long)].collect().toSet == Set((99L, 5L)))
    assert(IndexTool.run(spark, Array("bloom")) == 2)
    assert(IndexTool.run(spark, Array("nonsense", fp)) == 2)
  }

  test("IndexTool: bpe-train/bpe-encode and nb-train/nb-score run the " +
    "persisted-model lifecycle end to end; missing flags exit 2") {
    val root = java.nio.file.Files.createTempDirectory("graft-tool4").toString
    val corpus = Seq(
      (1L, "low low lower newest newest newest widest", true),
      (2L, "low low low newest newest newest widest widest", true),
      (3L, "buy cheap pills now click here buy buy", false),
      (4L, "click now cheap offer pills here now", false))
      .toDF("id", "text", "good")
    corpus.write.parquet(s"$root/corpus")

    // bpe: train persists a model the encode pass reproduces exactly
    assert(IndexTool.run(spark, Array("bpe-train", s"$root/bpe",
      "--source", s"$root/corpus", "--merges", "6")) == 0)
    val merges = graft.operators.Bpe.load(spark, s"$root/bpe")
    assert(merges.nonEmpty)
    assert(IndexTool.run(spark, Array("bpe-encode", s"$root/bpe",
      "--source", s"$root/corpus", "--out", s"$root/enc")) == 0)
    val enc = spark.read.parquet(s"$root/enc")
    assert(enc.columns.toSeq == Seq("id", "tokens", "n_tokens"))
    val expected = corpus.select(col("id"), graft.operators.Bpe.tokenCount(
        graft.functions.TextKernels.wordTokens(col("text")), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(enc.select("id", "n_tokens").as[(Long, Long)].collect().toMap
      == expected)

    // nb: train persists; score against the stored model separates classes
    assert(IndexTool.run(spark, Array("nb-train", s"$root/nb",
      "--source", s"$root/corpus", "--label", "good")) == 0)
    assert(IndexTool.run(spark, Array("nb-score", s"$root/nb",
      "--source", s"$root/corpus", "--out", s"$root/scores")) == 0)
    val scores = spark.read.parquet(s"$root/scores")
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(3L) && scores(2L) > scores(4L))

    // missing required flags print usage and exit 2, not throw
    assert(IndexTool.run(spark, Array("bpe-train", s"$root/bpe")) == 2)
    assert(IndexTool.run(spark, Array("bpe-encode", s"$root/bpe",
      "--source", s"$root/corpus")) == 2)
    assert(IndexTool.run(spark, Array("nb-train", s"$root/nb",
      "--source", s"$root/corpus")) == 2)
    assert(IndexTool.run(spark, Array("nb-score", s"$root/nb",
      "--source", s"$root/corpus")) == 2)
  }

  test("IndexTool: scrub-pii, clean, gopher (verdicts + --filter), and " +
    "split run the batch curation passes parquet-to-parquet") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-curtool").toString
    val healthy = (("the table holds a value for every row and every " +
      "key maps a value into the table with care ") * 3).trim
    Seq((1L, healthy + " mail me: jane@example.org"),
        (2L, "too short"))
      .toDF("id", "text").write.mode("overwrite").parquet(s"$root/src")
    assert(IndexTool.run(spark, Array("scrub-pii", s"$root/src",
      "--out", s"$root/masked")) == 0)
    val masked = spark.read.parquet(s"$root/masked")
      .where(col("id") === 1L).head.getString(1)
    assert(masked.endsWith("mail me: <EMAIL>"), masked)
    assert(IndexTool.run(spark, Array("clean", s"$root/src",
      "--out", s"$root/cleaned")) == 0)
    assert(spark.read.parquet(s"$root/cleaned").count() == 2)
    assert(IndexTool.run(spark, Array("gopher", s"$root/src",
      "--out", s"$root/verdicts",
      "--stop-words", "the,a,value,table")) == 0)
    val v = spark.read.parquet(s"$root/verdicts")
    assert(v.columns.contains("pass") && v.count() == 2)
    assert(IndexTool.run(spark, Array("gopher", s"$root/src",
      "--out", s"$root/kept", "--filter",
      "--stop-words", "the,a,value,table")) == 0)
    assert(spark.read.parquet(s"$root/kept")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(IndexTool.run(spark, Array("split", s"$root/src",
      "--out", s"$root/splits", "--splits", "train:98,holdout:2")) == 0)
    val sp = spark.read.parquet(s"$root/splits")
    assert(sp.columns.contains("split") && sp.count() == 2)
    // quantile-cut: band labels from the integral score expression
    assert(IndexTool.run(spark, Array("quantile-cut", s"$root/src",
      "--out", s"$root/bands", "--score-expr", "length(text)",
      "--cuts", "500000", "--labels", "short,long")) == 0)
    val bands = spark.read.parquet(s"$root/bands")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(bands == Map(1L -> "long", 2L -> "short"), bands.toString)
    // lm-train / lm-score: persisted bigram LM, parquet-to-parquet
    assert(IndexTool.run(spark, Array("lm-train", s"$root/lm",
      "--source", s"$root/src")) == 0)
    assert(IndexTool.run(spark, Array("lm-score", s"$root/lm",
      "--source", s"$root/src", "--out", s"$root/lmscores")) == 0)
    val lmScores = spark.read.parquet(s"$root/lmscores")
    assert(lmScores.columns.toSet ==
      Set("id", "n_bigrams", "n_oov", "logq") && lmScores.count() == 2)
    assert(lmScores.agg(org.apache.spark.sql.functions.sum("n_oov"))
      .first().getLong(0) == 0L) // self-scored: everything in vocabulary
    // rand-project: JL-shrink a vector column parquet-to-parquet
    Seq((1L, Seq(1.0, 2.0, 3.0, 4.0)), (2L, Seq(-1.0, 0.5, 0.0, 2.0)))
      .toDF("id", "embedding").write.mode("overwrite").parquet(s"$root/vecs")
    assert(IndexTool.run(spark, Array("rand-project", s"$root/vecs",
      "--out", s"$root/proj", "--out-dim", "2")) == 0)
    val proj = spark.read.parquet(s"$root/proj")
    assert(proj.columns.toSet == Set("id", "vector") && proj.count() == 2)
    assert(proj.select("vector").as[Seq[Double]].collect()
      .forall(_.size == 2))
    // missing required flags exit 2
    assert(IndexTool.run(spark, Array("scrub-pii", s"$root/src")) == 2)
    assert(IndexTool.run(spark, Array("lm-score", s"$root/lm",
      "--source", s"$root/src")) == 2)
    assert(IndexTool.run(spark, Array("rand-project", s"$root/vecs",
      "--out", s"$root/proj2")) == 2)
    assert(IndexTool.run(spark, Array("split", s"$root/src",
      "--out", s"$root/x")) == 2)
    assert(IndexTool.run(spark, Array("quantile-cut", s"$root/src",
      "--out", s"$root/y", "--score-expr", "length(text)")) == 2)
  }
  test("IndexTool: image-hash decodes real pixels to aHash/dHash and " +
    "emits near-dup pairs; missing --out exits 2") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-imgtool").toString
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val g = f(x, y) & 0xff; img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
    }
    val grad: (Int, Int) => Int = (x, y) => 2 * x + 3 * y + ((x / 8) * 11 % 32)
    Seq(
      (1L, png(grad)),
      (2L, png(grad)),                             // exact pixel twin
      (3L, png((x, y) => 255 - grad(x, y))),       // inverted: far away
      (4L, "garbage bytes".getBytes("UTF-8")))     // undecodable
      .toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$root/imgs")
    assert(IndexTool.run(spark, Array("image-hash", s"$root/imgs",
      "--out", s"$root/hashes", "--id", "doc_id", "--data", "payload",
      "--pairs-out", s"$root/pairs")) == 0)
    val hashes = spark.read.parquet(s"$root/hashes")
    assert(hashes.columns.contains("doc_id") && hashes.count() == 4)
    assert(hashes.where(col("decoded")).count() == 3)
    val pairs = spark.read.parquet(s"$root/pairs")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)))
    assert(IndexTool.run(spark, Array("image-hash", s"$root/imgs")) == 2)

    // audio-fp: PCM decode -> fingerprint; identical clips pair at 0
    def wav(samples: Array[Int]): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val pcm = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        pcm(i * 2) = (samples(i) & 0xff).toByte
        pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm),
        new AudioFormat(16000f, 16, 1, true, false), samples.length.toLong),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val clip = Array.tabulate(650)(f => ((f / 10) * 37 % 50 + 1) * 100)
    Seq((1L, wav(clip)), (2L, wav(clip)), (3L, "noise".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$root/clips")
    assert(IndexTool.run(spark, Array("audio-fp", s"$root/clips",
      "--out", s"$root/afps", "--id", "doc_id", "--data", "payload",
      "--pairs-out", s"$root/apairs")) == 0)
    val afps = spark.read.parquet(s"$root/afps")
    assert(afps.where(col("decoded")).count() == 2 && afps.count() == 3)
    assert(spark.read.parquet(s"$root/apairs")
      .as[(Long, Long, Long)].collect().toSet == Set((1L, 2L, 0L)))
    assert(IndexTool.run(spark, Array("audio-fp", s"$root/clips")) == 2)

    // audio-stats: quality-gate signals parquet-to-parquet
    assert(IndexTool.run(spark, Array("audio-stats", s"$root/clips",
      "--out", s"$root/astats", "--id", "doc_id", "--data", "payload")) == 0)
    val astats = spark.read.parquet(s"$root/astats").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(astats(1L).getAs[Boolean]("decoded") &&
      astats(1L).getAs[Long]("nFrames") == 650L &&
      astats(1L).getAs[Long]("durationMs") == 650L * 1000 / 16000)
    assert(!astats(3L).getAs[Boolean]("decoded"))

    // image-resize: box thumbnailing parquet-to-parquet
    assert(IndexTool.run(spark, Array("image-resize", s"$root/imgs",
      "--out", s"$root/thumbs", "--id", "doc_id", "--data", "payload",
      "--box", "16x16")) == 0)
    val thumbs = spark.read.parquet(s"$root/thumbs").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(thumbs(1L).getAs[Boolean]("resized") &&
      thumbs(1L).getAs[Int]("width") == 16 && thumbs(1L).getAs[Int]("height") == 12)
    assert(!thumbs(4L).getAs[Boolean]("decoded")) // garbage passes through
    assert(IndexTool.run(spark, Array("image-resize", s"$root/imgs",
      "--out", s"$root/t2", "--box", "bogus")) == 2)

    // image-stats: quality-gate signals parquet-to-parquet
    assert(IndexTool.run(spark, Array("image-stats", s"$root/imgs",
      "--out", s"$root/istats", "--id", "doc_id", "--data", "payload")) == 0)
    val istats = spark.read.parquet(s"$root/istats").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(istats(1L).getAs[Boolean]("isGray") &&
      istats(1L).getAs[Long]("nPixels") == 64L * 48)
    assert(!istats(4L).getAs[Boolean]("decoded"))
    assert(IndexTool.run(spark, Array("image-stats", s"$root/imgs")) == 2)
  }

  test("IndexTool: profile accumulates per-batch sketches, --merge folds " +
    "them to estimates without the corpus; overlap prints set relations") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-proftool").toString
    def batch(off: Int) = (0 until 300).map(i =>
      (off + i.toLong, Seq("en", "de")(i % 2), s"tok${i % 40} body $i"))
      .toDF("doc_id", "lang", "text")
    batch(0).write.mode("overwrite").parquet(s"$root/b0")
    batch(1000).write.mode("overwrite").parquet(s"$root/b1")
    assert(IndexTool.run(spark, Array("profile", s"$root/b0",
      "--out", s"$root/prof", "--keys", "lang")) == 0)
    assert(IndexTool.run(spark, Array("profile", s"$root/b1",
      "--out", s"$root/prof", "--keys", "lang", "--append")) == 0)
    assert(IndexTool.run(spark, Array("profile", s"$root/prof",
      "--out", s"$root/merged", "--keys", "lang", "--merge")) == 0)
    val m = spark.read.parquet(s"$root/merged").collect()
      .map(r => r.getAs[String]("__k0") -> r).toMap
    assert(m("en").getAs[Long]("n_docs") == 300)
    // both batches share text shapes but differ in the trailing counter:
    // the union estimate must land near the exact distinct count
    val exact = batch(0).union(batch(1000)).where(col("lang") === "en")
      .select(col("text")).distinct().count()
    val est = m("en").getAs[Long]("est_distinct_docs")
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"$est vs $exact")
    assert(IndexTool.run(spark, Array("overlap", s"$root/b0",
      "--other", s"$root/b1")) == 0)
    assert(IndexTool.run(spark, Array("profile", s"$root/b0")) == 2)
    assert(IndexTool.run(spark, Array("overlap", s"$root/b0")) == 2)
    // --series over --batch-stamped partials: per-batch + cumulative rows
    assert(IndexTool.run(spark, Array("profile", s"$root/b0",
      "--out", s"$root/ser", "--keys", "lang", "--batch", "0")) == 0)
    assert(IndexTool.run(spark, Array("profile", s"$root/b1",
      "--out", s"$root/ser", "--keys", "lang", "--append", "--batch", "1")) == 0)
    assert(IndexTool.run(spark, Array("profile", s"$root/ser",
      "--out", s"$root/series", "--keys", "lang", "--series")) == 0)
    val ser = spark.read.parquet(s"$root/series").collect()
      .map(r => (r.getAs[String]("__k0"), r.getAs[Long]("batch")) -> r).toMap
    assert(ser.size == 4) // 2 langs x 2 batches
    assert(ser(("en", 1L)).getAs[Long]("cum_n_docs") == 300)
    // batch 1's texts repeat batch 0's (only doc_ids differ): the
    // cumulative sketch must not grow — the stalled-crawl signal
    assert(ser(("en", 1L)).getAs[Long]("delta_est_docs") == 0)
    assert(ser(("en", 1L)).getAs[Long]("cum_est_distinct_docs") ==
      ser(("en", 0L)).getAs[Long]("cum_est_distinct_docs"))
  }

  test("IndexTool: video-frames hashes MJPEG clips with sequence pairs; " +
    "video-stats reports the black/flat gates; missing flags exit 2") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-vidtool").toString
    val src = (0 until 12).map(t => GenVideoFixture.framePx(21, t))
    val v1 = GenVideoFixture.avi(64, 48, 100000L,
      src.map(GenVideoFixture.encodeJpeg(_, 0.85f)))
    val v2 = GenVideoFixture.avi(64, 48, 100000L,
      src.map(GenVideoFixture.encodeJpeg(_, 0.62f)))
    Seq((1L, v1), (2L, v2), (9L, "garbage".getBytes))
      .toDF("id", "data").write.parquet(s"$root/vids")
    assert(IndexTool.run(spark, Array("video-frames", s"$root/vids",
      "--out", s"$root/fr", "--pairs-out", s"$root/pairs")) == 0)
    val fr = spark.read.parquet(s"$root/fr")
    assert(fr.where(col("decoded")).count() == 6) // 3 ticks x 2 clips
    assert(fr.where(!col("decoded")).count() == 1)
    val pairs = spark.read.parquet(s"$root/pairs")
      .as[(Long, Long, Long, Long)].collect().map(p => (p._1, p._2, p._3) -> p._4).toMap
    assert(pairs((1L, 2L, 0L)) == 3L)
    assert(IndexTool.run(spark, Array("video-stats", s"$root/vids",
      "--out", s"$root/vs")) == 0)
    val vs = spark.read.parquet(s"$root/vs").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(vs(1L).getAs[Boolean]("decoded") && vs(1L).getAs[Int]("nSampled") == 3)
    assert(!vs(9L).getAs[Boolean]("decoded"))
    assert(IndexTool.run(spark, Array("video-frames", s"$root/vids")) == 2)
    assert(IndexTool.run(spark, Array("video-stats", s"$root/vids")) == 2)
  }

  test("IndexTool: video-dedup-stream and audio-seq-stream --once drain " +
    "a watched directory through the streaming loops into the exactly-" +
    "once sink and the persisted index; missing flags exit 2") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-streamtool").toString
    // video: a clip and its re-encode pair at diagonal 0 across 3 ticks
    val src = (0 until 12).map(t => GenVideoFixture.framePx(21, t))
    Seq(
      (1L, GenVideoFixture.avi(64, 48, 100000L,
        src.map(GenVideoFixture.encodeJpeg(_, 0.85f)))),
      (2L, GenVideoFixture.avi(64, 48, 100000L,
        src.map(GenVideoFixture.encodeJpeg(_, 0.62f)))))
      .toDF("id", "data").write.parquet(s"$root/vids")
    assert(IndexTool.run(spark, Array("video-dedup-stream", s"$root/vids",
      "--index", s"$root/vididx", "--sink", s"$root/vidpairs",
      "--once")) == 0)
    val vp = spark.read.parquet(s"$root/vidpairs")
      .select("a", "b", "d", "n_match")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(vp == Set((1L, 2L, 0L, 3L)), vp)
    assert(spark.read.parquet(s"$root/vididx/bands").count() > 0)
    // audio: byte-identical PCM clips pair on all 4 whole windows
    // (per-window distinct seeds — see StreamOpsSpec's audio loop test)
    val base = (0 until 4).toArray.flatMap(w =>
      GenAudioFpFixture.synth(4000, 73 + 13 * w))
    Seq((1L, GenAudioFpFixture.wavBytes(Array(base))),
        (2L, GenAudioFpFixture.wavBytes(Array(base))))
      .toDF("id", "data").write.parquet(s"$root/auds")
    assert(IndexTool.run(spark, Array("audio-seq-stream", s"$root/auds",
      "--index", s"$root/audidx", "--sink", s"$root/audpairs",
      "--once")) == 0)
    val ap = spark.read.parquet(s"$root/audpairs")
      .select("a", "b", "d", "n_match")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ap == Set((1L, 2L, 0L, 4L)), ap)
    assert(IndexTool.run(spark, Array("video-dedup-stream", s"$root/vids",
      "--sink", s"$root/x")) == 2)
    assert(IndexTool.run(spark, Array("audio-seq-stream", s"$root/auds",
      "--index", s"$root/audidx")) == 2)
  }

  test("IndexTool: dsir weights/selects and dedup-substr cuts repeated " +
    "spans parquet-to-parquet; missing flags exit 2") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-dsirtool").toString
    Seq(
      (1L, "good clean prose text", "en"),
      (2L, "spam junk garbage words", "de"),
      (3L, "good clean prose text", "de"),
      (4L, "c1 c2 c3 c4 c5 c6 c7 c8 unique tail", "en"),
      (5L, "c1 c2 c3 c4 c5 c6 c7 c8 other end", "en"))
      .toDF("id", "text", "lang").write.parquet(s"$root/src")

    assert(IndexTool.run(spark, Array("dsir", s"$root/src",
      "--out", s"$root/w", "--target-where", "lang = 'en'",
      "--buckets", "128")) == 0)
    val w = spark.read.parquet(s"$root/w")
      .select("id", "weight").as[(Long, Double)].collect().toMap
    assert(w.size == 5 && w(3L) > w(2L), w)

    assert(IndexTool.run(spark, Array("dsir", s"$root/src",
      "--out", s"$root/sel", "--target-where", "lang = 'en'",
      "--buckets", "128", "--k", "2")) == 0)
    val sel = spark.read.parquet(s"$root/sel")
    assert(sel.count() == 2 && sel.columns.contains("sel_key"))

    assert(IndexTool.run(spark, Array("dedup-substr", s"$root/src",
      "--out", s"$root/cut", "--n", "8")) == 0)
    val cut = spark.read.parquet(s"$root/cut")
      .select("id", "text_clean").as[(Long, String)].collect().toMap
    assert(cut(4L) == "unique tail" && cut(5L) == "other end", cut)
    assert(cut(1L) == "good clean prose text", cut)

    assert(IndexTool.run(spark, Array("dedup-substr", s"$root/src",
      "--out", s"$root/spans", "--n", "8", "--spans")) == 0)
    val spans = spark.read.parquet(s"$root/spans")
    assert(spans.count() == 2 &&
      spans.where(col("span_start") === 0 && col("span_end") === 8)
        .count() == 2)

    // dsir-train / dsir-score: the persisted-model pair
    assert(IndexTool.run(spark, Array("dsir-train", s"$root/model",
      "--source", s"$root/src", "--target-where", "lang = 'en'",
      "--buckets", "128")) == 0)
    assert(IndexTool.run(spark, Array("dsir-score", s"$root/model",
      "--source", s"$root/src", "--out", s"$root/scored")) == 0)
    val scored = spark.read.parquet(s"$root/scored")
      .select("id", "weight").as[(Long, Double)].collect().toMap
    // same corpus, same model: scoring reproduces the direct weights
    assert(scored.keySet == w.keySet &&
      w.keySet.forall(k => math.abs(scored(k) - w(k)) < 1e-9), scored)
    assert(IndexTool.run(spark, Array("dsir-train", s"$root/model",
      "--source", s"$root/src")) == 2)
    assert(IndexTool.run(spark, Array("dsir-score", s"$root/model",
      "--source", s"$root/src")) == 2)

    assert(IndexTool.run(spark, Array("dsir", s"$root/src",
      "--out", s"$root/x")) == 2)
    assert(IndexTool.run(spark, Array("dsir", s"$root/src",
      "--target-where", "lang = 'en'")) == 2)
    assert(IndexTool.run(spark, Array("dedup-substr", s"$root/src")) == 2)
  }
}
