package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

class StreamOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts: watermarked tumbling-window counts per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamOps.windowedCounts(
      input.toDF().toDF("ts", "event_type"), "ts", "event_type", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "click"), (ts("2024-01-01 00:02:00"), "click"),
        (ts("2024-01-01 00:03:00"), "view"), (ts("2024-01-01 00:11:00"), "click"))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)))
      assert(rows.contains(("2024-01-01 00:00:00.0", "view", 1L)))
      assert(rows.contains(("2024-01-01 00:10:00.0", "click", 1L)))
    } finally q.stop()
  }

  test("stateless pipeline kernels compose with streams: per-doc chunking " +
    "runs per micro-batch in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val w = graft.functions.TextKernels.wordTokens(col("text"))
    // chunkTokens is a narrow per-row map + posexplode, so it applies to a
    // streaming frame verbatim — no watermark, no state
    val out = graft.operators.Packing.chunkTokens(
        docs.select(col("doc_id"), w.as("w")),
        col("doc_id"), col("w"), 4, 1)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("ck")
      .outputMode("append").start()
    try {
      input.addData((1L, "a b a b a b"), (2L, "x"))
      q.processAllAvailable()
      val rows = spark.table("ck")
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(rows == Set(
        (1L, 0L, 0L, 4L, "a b a b"),
        (1L, 1L, 3L, 6L, "b a b"),
        (2L, 0L, 0L, 1L, "x")))
    } finally q.stop()
  }

  test("incrementalDedupStream: the streamed corpus yields the batch " +
    "minhashPairs pair set, and late duplicates of early batches are caught") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    import graft.functions.TextKernels
    // 16-word docs; one trailing word changed => shingle Jaccard 14/16 =
    // 0.875 >= 0.8. doc5 repeats doc1 verbatim, doc6 near-dups doc4.
    val words = (1 to 16).map(i => s"w$i").mkString(" ")
    val wordsX = (1 to 16).map(i => s"x$i").mkString(" ")
    val d1 = words
    val d2 = (1 to 16).map(i => s"y$i").mkString(" ")
    val d3 = words.replaceAll("w16$", "zzz")
    val d4 = wordsX
    val d5 = words // late exact repeat of batch-1's doc 1
    val d6 = wordsX.replaceAll("x16$", "qqq")
    val path = java.nio.file.Files.createTempDirectory("graft-sbidx").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Double)]]
    val q = StreamOps.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", path, 0.8) {
      (pairs, batchId) =>
        perBatch(batchId) = pairs.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    try {
      input.addData((1L, d1), (2L, d2)); q.processAllAvailable()
      input.addData((3L, d3), (4L, d4)); q.processAllAvailable()
      input.addData((5L, d5), (6L, d6)); q.processAllAvailable()
    } finally q.stop()
    // batch 3 catches the LATE duplicate of batch 1 through the grown
    // index — two generations back, never re-hashing the stored corpus
    assert(perBatch(2).exists { case (a, b, _) => a == 5L && b == 1L },
      s"late dup of batch 1 missed: ${perBatch(2)}")
    assert(perBatch(2).exists { case (a, b, _) => a == 6L && b == 4L })
    // union over all batches == one batch minhashPairs over the whole
    // corpus, up to pair orientation
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4), (5L, d5), (6L, d6))
      .toDF("doc_id", "text")
    val batchPairs = Dedup.minhashPairs(docs, "doc_id",
        TextKernels.wordShingles2(TextKernels.wordTokens(col("text"))), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def normalize(s: Set[(Long, Long, Double)]) =
      s.map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }
    assert(normalize(perBatch.values.flatten.toSet) == normalize(batchPairs),
      s"streamed ${perBatch.values.flatten.toSet} != batch $batchPairs")
    assert(batchPairs.nonEmpty, "fixture produced no pairs — vacuous test")
  }

  test("incrementalDedupStream: re-delivering a committed micro-batch " +
    "(at-least-once replay) emits the same pairs and leaves the index " +
    "bit-identical") {
    import graft.streaming.StreamOps
    val words = (1 to 16).map(i => s"w$i").mkString(" ")
    val wordsX = (1 to 16).map(i => s"x$i").mkString(" ")
    val path = java.nio.file.Files.createTempDirectory("graft-replay-dd").toString + "/idx"
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Double)]]
    def sink(pairs: org.apache.spark.sql.DataFrame, @annotation.unused bid: Long): Unit =
      emitted += pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def deliver(bid: Long, rows: (Long, String)*): Unit =
      StreamOps.dedupBatch(rows.toDF("doc_id", "text"), bid,
        "doc_id", "text", path, 0.8, sink)
    // batch 0: two unrelated docs; batch 1: a near-dup PAIR in-batch plus a
    // cross dup of batch 0 — the worst case for replay (its own committed
    // band keys would re-emit the in-batch pair as two cross pairs)
    deliver(0L, (1L, words), (2L, (1 to 16).map(i => s"y$i").mkString(" ")))
    deliver(1L, (3L, wordsX), (4L, wordsX.replaceAll("x16$", "qqq")),
      (5L, words.replaceAll("w16$", "zzz")))
    def indexContents() = Seq("bands", "shingles").map { sub =>
      spark.read.parquet(s"$path/$sub").collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    }
    val (pairs1, idx1) = (emitted(1), indexContents())
    assert(pairs1.exists { case (a, b, _) => a == 3L && b == 4L } &&
      pairs1.exists { case (a, b, _) => a == 5L && b == 1L },
      s"fixture must cover in-batch AND cross pairs, got $pairs1")
    // crash after commit, before the checkpoint advanced: foreachBatch
    // re-delivers batch 1 with the same id and rows
    deliver(1L, (3L, wordsX), (4L, wordsX.replaceAll("x16$", "qqq")),
      (5L, words.replaceAll("w16$", "zzz")))
    assert(emitted(2) == pairs1,
      s"replay emitted different pairs: ${emitted(2)} vs $pairs1")
    assert(indexContents() == idx1, "replay changed the index contents")
    // and the NEXT batch still dedups against everything exactly once
    deliver(2L, (6L, words))
    assert(emitted(3).map { case (a, b, _) => (a, b) } == Set((6L, 1L), (6L, 5L)),
      s"post-replay batch pairs wrong: ${emitted(3)}")
  }

  test("incrementalExactStream: online exact dedup over a persisted " +
    "fingerprint index — in-batch, cross-batch, replay, and late smaller id") {
    import graft.streaming.StreamOps
    val path = java.nio.file.Files.createTempDirectory("graft-exstream").toString + "/idx"
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    def sink(dups: org.apache.spark.sql.DataFrame, @annotation.unused bid: Long): Unit =
      emitted += dups.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def deliver(bid: Long, rows: (Long, String)*): Unit =
      StreamOps.exactBatch(rows.toDF("doc_id", "text"), bid,
        "doc_id", "text", path, sink)

    // the streaming wiring itself (writeStream + foreachBatch): one batch
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.incrementalExactStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", path)(sink)
    try {
      input.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
      q.processAllAvailable()
    } finally q.stop()
    assert(emitted(0) == Set((3L, 1L)), s"in-batch dup: ${emitted(0)}")

    // cross-batch dup against the persisted index
    deliver(1L, (10L, "bbb"), (11L, "ccc"))
    assert(emitted(1) == Set((10L, 2L)), s"cross dup: ${emitted(1)}")
    // at-least-once replay: identical emission, index unchanged
    def indexRows() = spark.read.parquet(path).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val idx1 = indexRows()
    deliver(1L, (10L, "bbb"), (11L, "ccc"))
    assert(emitted(2) == emitted(1), "replay changed the emission")
    assert(indexRows() == idx1, "replay changed the index")
    // online contract: a LATE smaller id is the duplicate, the seen doc
    // stays the keeper
    deliver(2L, (0L, "aaa"))
    assert(emitted(3) == Set((0L, 1L)), s"late small id: ${emitted(3)}")
    // a doc can duplicate both in-batch and vs the index: one row, with
    // the smallest keeper seen so far
    deliver(3L, (21L, "ccc"), (20L, "ccc"))
    assert(emitted(4) == Set((20L, 11L), (21L, 11L)), emitted(4).toString)
  }

  test("compactBandIndex: probe answers unchanged, files folded to the " +
    "base, compacted batchIds no-op on re-delivery") {
    import graft.operators.Dedup
    import graft.functions.TextKernels
    val shingles = TextKernels.wordShingles2(TextKernels.wordTokens(col("text")))
    val words = (1 to 16).map(i => s"w$i").mkString(" ")
    val path = java.nio.file.Files.createTempDirectory("graft-compact-dd").toString + "/idx"
    def docs(ids: Long*) = ids.map(i => (i, if (i % 2 == 0) words else s"doc $i " * 8))
      .toDF("doc_id", "text")
    Dedup.writeBandIndex(docs(1L, 2L), "doc_id", shingles, path, batchId = Some(0L))
    (1 to 3).foreach(i => Dedup.writeBandIndex(docs(10L * i, 10L * i + 1), "doc_id",
      shingles, path, batchId = Some(i.toLong)))
    val probe = docs(100L) // even id -> near-dups every even indexed doc
    val before = Dedup.incrementalPairs(probe, "doc_id", shingles, path, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before == Set((100L, 2L), (100L, 10L), (100L, 20L), (100L, 30L)))
    Dedup.compactBandIndex(spark, path)
    val after = Dedup.incrementalPairs(probe, "doc_id", shingles, path, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, s"compaction changed answers: $after")
    // everything folded into batch=-1, one well-sized file per table
    Seq("bands", "shingles").foreach { sub =>
      val dirs = new java.io.File(s"$path/$sub").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(dirs == Seq("batch=-1"), s"$sub dirs: $dirs")
    }
    // a committed batch re-delivered across the compaction must no-op
    val n = spark.read.parquet(s"$path/shingles").count()
    Dedup.writeBandIndex(docs(30L, 31L), "doc_id", shingles, path, batchId = Some(3L))
    assert(spark.read.parquet(s"$path/shingles").count() == n,
      "replay of a compacted batch re-added rows")
    // new batches still land
    Dedup.writeBandIndex(docs(40L), "doc_id", shingles, path, batchId = Some(4L))
    assert(spark.read.parquet(s"$path/shingles").count() == n + 1)
  }

  test("annIndexAppendStream: streamed vector batches land in the served " +
    "index; a probe equals brute force over everything committed") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{AnnIndex, AnnSearch}
    val dim = 8
    def vecs(seed: Int, from: Int, n: Int): Seq[(Long, Seq[Double])] = {
      val rnd = new scala.util.Random(seed)
      (from until from + n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    }
    val base = vecs(11, 0, 300)
    val b1 = vecs(13, 300, 100)
    val b2 = vecs(17, 400, 100)
    val path = java.nio.file.Files.createTempDirectory("graft-annapp").toString + "/idx"
    AnnIndex.buildLsh(base.toDF("vid", "v"), "vid", col("v"), dim, path, nBits = 5)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamOps.annIndexAppendStream(
      input.toDF().toDF("vid", "v"), "vid", "v", path)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val qv = { val rnd = new scala.util.Random(19); Seq.fill(dim)(rnd.nextDouble() * 2 - 1) }
    // all-probe over the grown index == brute force over all 500 vectors
    val grown = AnnIndex.lshTopK(spark, path, "vid", qv, 10, probes = 32)
      .select("vid").as[Long].collect().toSeq
    val brute = AnnSearch.bruteCosineTopK((base ++ b1 ++ b2).toDF("vid", "v"),
        "vid", col("v"), qv, 10)
      .select("vid").as[Long].collect().toSeq
    assert(grown == brute, s"grown $grown != brute $brute")
    // a SINGLE-probe query still reads only its pruned bucket
    assert(AnnIndex.lshTopK(spark, path, "vid", qv, 10, probes = 1).count() <= 10)
  }

  test("annIndexAppendStream against an IVF index: the sidecar's kind " +
    "routes the append; a full-probe query equals brute force") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{AnnIndex, AnnSearch}
    val dim = 8
    def vecs(seed: Int, from: Int, n: Int): Seq[(Long, Seq[Double])] = {
      val rnd = new scala.util.Random(seed)
      (from until from + n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    }
    val base = vecs(43, 0, 200)
    val b1 = vecs(47, 200, 80)
    val cs = (0 until 4).map(c => (0 until dim).map(d => math.sin(c * 3.1 + d) * 0.7))
    val path = java.nio.file.Files.createTempDirectory("graft-ivfstream").toString + "/idx"
    AnnIndex.buildIvf(base.toDF("vid", "v"), "vid", col("v"), cs, path)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamOps.annIndexAppendStream(
      input.toDF().toDF("vid", "v"), "vid", "v", path)
    try { input.addData(b1: _*); q.processAllAvailable() } finally q.stop()
    val qv = { val rnd = new scala.util.Random(53); Seq.fill(dim)(rnd.nextDouble() * 2 - 1) }
    val grown = AnnIndex.ivfTopK(spark, path, "vid", qv, 10, nProbe = 4)
      .select("vid").as[Long].collect().toSeq
    val brute = AnnSearch.bruteCosineTopK((base ++ b1).toDF("vid", "v"),
        "vid", col("v"), qv, 10)
      .select("vid").as[Long].collect().toSeq
    assert(grown == brute, s"grown $grown != brute $brute")
  }

  test("incrementalDedupStream with compactEvery: committed batches fold " +
    "into the base mid-stream, pair sets are unchanged, and the in-flight " +
    "batch still replays idempotently across its own compaction") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val words = (1 to 16).map(i => s"w$i").mkString(" ")
    val wordsX = (1 to 16).map(i => s"x$i").mkString(" ")
    val path = java.nio.file.Files.createTempDirectory("graft-autocomp").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val q = StreamOps.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", path, 0.8,
      compactEvery = 1) { (pairs, batchId) =>
      perBatch(batchId) = pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    try {
      input.addData((1L, words), (2L, (1 to 16).map(i => s"y$i").mkString(" ")))
      q.processAllAvailable()
      input.addData((3L, wordsX), (4L, wordsX.replaceAll("x16$", "qqq")),
        (5L, words.replaceAll("w16$", "zzz")))
      q.processAllAvailable()
      input.addData((6L, words)); q.processAllAvailable()
    } finally q.stop()
    // the same pair sets the uncompacted run emits (in-batch, cross vs
    // folded base, cross vs a folded later batch)
    assert(perBatch(1L) == Set((3L, 4L), (5L, 1L)), perBatch.toString)
    assert(perBatch(2L) == Set((6L, 1L), (6L, 5L)), perBatch.toString)
    // batches 0..1 are folded into the base; only the in-flight batch's
    // partition remains — files-per-table stays bounded over an unbounded run
    Seq("bands", "shingles").foreach { sub =>
      val dirs = new java.io.File(s"$path/$sub").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq.sorted
      assert(dirs == Seq("batch=-1", "batch=2"), s"$sub dirs: $dirs")
    }
    // crash AFTER batch 2's append+compaction but before its checkpoint
    // commit: the restart re-runs the whole foreachBatch body (dedup +
    // compact) — emission identical, index logically unchanged. This is
    // exactly why the loop folds only THROUGH batchId-1: batch 2's own
    // partition survived the fold, so the re-delivery overwrites it in
    // place and the candidate read still excludes it.
    def contents() = Seq("bands", "shingles").map { sub =>
      spark.read.parquet(s"$path/$sub").collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    }
    val before = contents()
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    StreamOps.dedupBatch(Seq((6L, words)).toDF("doc_id", "text"), 2L,
      "doc_id", "text", path, 0.8,
      (pairs, _) => emitted += pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    Dedup.compactBandIndex(spark, path, through = Some(1L))
    assert(emitted.head == perBatch(2L),
      s"replay emitted ${emitted.head} vs ${perBatch(2L)}")
    assert(contents() == before, "replay changed the index contents")
  }

  test("annIndexAppendStream with compactEvery: buckets fold mid-stream " +
    "and probes still equal brute force over everything committed") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{AnnIndex, AnnSearch}
    val dim = 8
    def vecs(seed: Int, from: Int, n: Int): Seq[(Long, Seq[Double])] = {
      val rnd = new scala.util.Random(seed)
      (from until from + n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    }
    val base = vecs(23, 0, 200)
    val batches = Seq(vecs(29, 200, 80), vecs(31, 280, 80), vecs(37, 360, 80))
    val path = java.nio.file.Files.createTempDirectory("graft-annac").toString + "/idx"
    AnnIndex.buildLsh(base.toDF("vid", "v"), "vid", col("v"), dim, path, nBits = 4)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamOps.annIndexAppendStream(
      input.toDF().toDF("vid", "v"), "vid", "v", path, compactEvery = 2)
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    // the fold at batch 2 (through = 1) left only the base and the two
    // still-unfolded batch partitions in each bucket
    val batchDirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName).distinct.sorted
    assert(batchDirs.toSeq == Seq("batch=-1", "batch=2"), batchDirs.mkString(","))
    val qv = { val rnd = new scala.util.Random(41); Seq.fill(dim)(rnd.nextDouble() * 2 - 1) }
    val grown = AnnIndex.lshTopK(spark, path, "vid", qv, 10, probes = 16)
      .select("vid").as[Long].collect().toSeq
    val brute = AnnSearch.bruteCosineTopK(
        (base ++ batches.flatten).toDF("vid", "v"), "vid", col("v"), qv, 10)
      .select("vid").as[Long].collect().toSeq
    assert(grown == brute, s"grown $grown != brute $brute")
  }

  test("curationStream: quality gate -> exact dedup -> greedy near-dup " +
    "drop -> only SURVIVORS enter the indexes; replay emits the identical " +
    "survivor set across the in-loop compaction") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val words = (1 to 16).map(i => s"w$i").mkString(" ")
    val wordsX = (1 to 16).map(i => s"x$i").mkString(" ")
    val wordsY = (1 to 16).map(i => s"y$i").mkString(" ")
    val root = java.nio.file.Files.createTempDirectory("graft-curate").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = StreamOps.curationStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", root, 0.8,
      length(col("text")) >= 20, compactEvery = 1) { (accepted, batchId) =>
      perBatch(batchId) = accepted.select("doc_id").collect()
        .map(_.getLong(0)).toSet
    }
    val b1 = Seq((5L, words), (6L, words.replaceAll("w16$", "zzz")),
      (7L, wordsX), (8L, wordsX.replaceAll("x16$", "qqq")))
    try {
      // batch 0: 1 accepted; 2 = exact in-batch dup of 1; 3 = quality
      // reject; 4 = distinct accepted
      input.addData((1L, words), (2L, words), (3L, "short"), (4L, wordsY))
      q.processAllAvailable()
      // batch 1: 5 = exact dup vs the ACCEPTED index; 6 = near-dup of
      // accepted doc 1; 7/8 = fresh in-batch near pair (greedy keeps 7)
      input.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set(1L, 4L), perBatch.toString)
    assert(perBatch(1L) == Set(7L), perBatch.toString)
    // only survivors were indexed: the exact index holds 1, 4, 7
    assert(spark.read.parquet(s"$root/exact").select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 4L, 7L))
    // the in-loop fold ran at batch 1 (through = 0)
    val dirs = new java.io.File(s"$root/exact").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    assert(dirs == Seq("batch=-1", "batch=1"), dirs.toString)
    // crash after batch 1's accept+fold, before its checkpoint commit:
    // the re-run (dedup + fold) emits the same survivors and leaves both
    // indexes logically unchanged
    def contents() = Seq("exact", "near/bands", "near/shingles").map { sub =>
      spark.read.parquet(s"$root/$sub").collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    }
    val before = contents()
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    StreamOps.curationBatch(b1.toDF("doc_id", "text"), 1L, "doc_id", "text",
      root, 0.8, length(col("text")) >= 20,
      (accepted, _) => emitted += accepted.select("doc_id").collect()
        .map(_.getLong(0)).toSet)
    Dedup.compactFingerprintIndex(spark, s"$root/exact", through = Some(0L))
    Dedup.compactBandIndex(spark, s"$root/near", through = Some(0L))
    assert(emitted.head == Set(7L), s"replay emitted ${emitted.head}")
    assert(contents() == before, "replay changed the index contents")
  }

  test("curationStream with a LEARNED quality gate: scoreColumn over a " +
    "persisted classifier model is a stateless predicate, so the " +
    "CCNet-style filter composes with the dedup stages unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.QualityClassifier
    val tok = graft.functions.TextKernels.wordTokens(col("text"))
    val seeds = Seq(
      ("clean prose with thoughtful words and careful argument", true),
      ("another clean document with careful thoughtful writing", true),
      ("buy cheap pills now click here buy buy", false),
      ("click now cheap offer pills here now", false)).toDF("text", "good")
    val root = java.nio.file.Files.createTempDirectory("graft-curate-nb")
      .toString
    // the model travels through its persisted form, as a deployment would
    QualityClassifier.save(spark,
      QualityClassifier.train(seeds, tok, col("good")), s"$root/model")
    val gate =
      QualityClassifier.scoreColumn(tok,
        QualityClassifier.load(spark, s"$root/model")) >= 0.0
    val input = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = StreamOps.curationStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$root/idx", 0.8, gate) { (accepted, batchId) =>
      perBatch(batchId) = accepted.select("doc_id").collect()
        .map(_.getLong(0)).toSet
    }
    // 16 words: 8 carry positive weights, 8 are unseen (weight 0) — the
    // doc scores positive; the single-word edit in doc 4 leaves a ~0.88
    // shingle jaccard, the near-dup stage's bread and butter
    val goodDoc = "thoughtful careful prose argument clean document " +
      "writing words " + (1 to 8).map(i => s"n$i").mkString(" ")
    try {
      // 1 passes the classifier; 2 scores negative (junk-seed words) and
      // is gated out BEFORE dedup; 3 passes but exact-dups 1
      input.addData(
        (1L, goodDoc),
        (2L, "buy cheap pills click now cheap pills"),
        (3L, goodDoc))
      q.processAllAvailable()
      // next batch: 4 near-dups the ACCEPTED doc 1; 5 is junk
      input.addData(
        (4L, goodDoc.replaceAll("n8$", "zzz")),
        (5L, "cheap offer pills here now click"))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set(1L), perBatch.toString)
    assert(perBatch(1L) == Set.empty, perBatch.toString)
    // only classifier-passing survivors entered the accepted index
    assert(spark.read.parquet(s"$root/idx/exact").select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L))
  }

  test("curationStream with the Gopher rule battery as the gate: " +
    "gopherPass is a pure narrow predicate, so the rule filter drops " +
    "straight into the streaming loop") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-curate-gopher")
      .toString
    // 50+ words with healthy shape, containing two probe words
    val healthy = (("the table holds a value for every row and " +
      "every key maps a value into the table with care ") * 3).trim
    val gate = graft.operators.QualityRules.gopherPass(col("text"),
      stopWords = Seq("the", "a", "value", "table"))
    val input = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = StreamOps.curationStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$root/idx", 0.8, gate) { (accepted, batchId) =>
      perBatch(batchId) = accepted.select("doc_id").collect()
        .map(_.getLong(0)).toSet
    }
    try {
      input.addData(
        (1L, healthy),
        (2L, "too short"),                       // fails ok_words
        (3L, ("### " * 60).trim))                // symbol occupancy
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L) == Set(1L), perBatch.toString)
  }

  test("parquetSink: the curation loop is exactly-once END TO END — a " +
    "replayed batch rewrites its own sink partition, and compaction folds " +
    "without changing contents or re-admitting folded batches") {
    implicit val sqlCtx = spark.sqlContext
    val words = (1 to 16).map(i => s"w$i").mkString(" ")
    val wordsY = (1 to 16).map(i => s"y$i").mkString(" ")
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val idx = s"$root/idx"
    val sink = s"$root/out"
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.curationStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", idx, 0.8,
      length(col("text")) >= 20)(StreamOps.parquetSink(sink))
    val b1 = Seq((5L, words), (6L, wordsY + " extra"))
    try {
      // batch 0: 1 accepted, 2 exact dup, 3 quality-rejected
      input.addData((1L, words), (2L, words), (3L, "short"))
      q.processAllAvailable()
      // batch 1: 5 = dup vs index, 6 = fresh
      input.addData(b1: _*); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
    } finally q.stop()
    def sinkRows() = StreamOps.readSink(spark, sink).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val clean = sinkRows()
    assert(StreamOps.readSink(spark, sink).select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 6L))
    // crash-replay batch 1 exactly as foreachBatch would re-deliver it:
    // the sink must be BIT-IDENTICAL afterwards, not hold doc 6 twice
    StreamOps.curationBatch(b1.toDF("doc_id", "text"), 1L, "doc_id", "text",
      idx, 0.8, length(col("text")) >= 20, StreamOps.parquetSink(sink))
    assert(sinkRows() == clean, "replay changed the sink contents")
    // compaction folds the batch partitions, contents unchanged
    StreamOps.compactSink(spark, sink)
    assert(sinkRows() == clean, "compaction changed the sink contents")
    val dirs = new java.io.File(sink).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    assert(dirs == Seq("batch=-1"), dirs.toString)
    // a batch re-delivered ACROSS the compaction no-ops instead of
    // re-adding its rows beside the folded copy
    StreamOps.parquetSink(sink)(b1.toDF("doc_id", "text")
      .where(col("doc_id") === 6L), 1L)
    assert(sinkRows() == clean, "post-compaction replay re-added rows")
  }

  test("parquetSink skips empty batches and refuses a conflicting batch column") {
    val sink = java.nio.file.Files.createTempDirectory("graft-sink2").toString + "/out"
    StreamOps.parquetSink(sink)(Seq.empty[(Long, String)].toDF("id", "t"), 0L)
    assert(!new java.io.File(sink).exists)
    StreamOps.parquetSink(sink)(Seq((1L, "a")).toDF("id", "t"), 1L)
    assert(StreamOps.readSink(spark, sink).columns.toSeq == Seq("id", "t"))
    intercept[IllegalArgumentException] {
      StreamOps.parquetSink(sink)(Seq((1L, 2L)).toDF("id", "batch"), 2L)
    }
  }

  test("dedupWithinWatermark: duplicate keys inside the horizon collapse") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val out = StreamOps.dedupWithinWatermark(
      input.toDF().toDF("ts", "fp", "doc_id"), "ts", Seq("fp"), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "fpA", 1L),
        (ts("2024-01-01 00:02:00"), "fpA", 2L), // dup of fpA within horizon
        (ts("2024-01-01 00:03:00"), "fpB", 3L))
      q.processAllAvailable()
      val fps = spark.table("dd").select("fp").collect().map(_.getString(0)).toSeq
      assert(fps.sorted == Seq("fpA", "fpB"))
    } finally q.stop()
  }

  test("compactLatest: the kept record never regresses when a stale update arrives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long, Double)]
    val out = StreamOps.compactLatest(
      input.toDF().toDF("ts", "user_id", "event_id", "value"),
      "ts", "user_id", "event_id", Seq("value"))
    val q = out.writeStream.format("memory").queryName("cl").outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), 7L, 1L, 1.0),
        (ts("2024-01-01 00:05:00"), 7L, 2L, 2.0), // newer for user 7
        (ts("2024-01-01 00:02:00"), 8L, 3L, 3.0))
      q.processAllAvailable()
      // an OLDER record for user 7 must not displace the kept one
      input.addData((ts("2024-01-01 00:03:00"), 7L, 4L, 4.0))
      q.processAllAvailable()
      val latest = spark.table("cl").collect()
        .map(r => (r.getLong(0), (r.getTimestamp(1), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1.getTime) }
      assert(latest(7L) == ((ts("2024-01-01 00:05:00"), 2L, 2.0)))
      assert(latest(8L) == ((ts("2024-01-01 00:02:00"), 3L, 3.0)))
      // every emission for user 7 (update mode may re-emit on the stale
      // batch) still carries event 2 — the stale record never surfaces
      val after = spark.table("cl").collect().filter(_.getLong(0) == 7L)
        .map(r => r.getLong(2))
      assert(after.forall(_ == 2L))
    } finally q.stop()
  }

  test("annStream: streamed queries match the batch brute-force top-k per query") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .where(col("vec_id") >= 10) // reserve a few vectors as queries
    val queryVecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .where(col("vec_id") < 3).as[(Long, Seq[Double])].collect()

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamOps.annStream(
      input.toDF().toDF("qid", "qv"), "qid", "qv", corpus, "vec_id", "v", 5,
      brute = true) { (batch, _) =>
      results ++= batch.as[(Long, Long, Double, Long)].collect()
    }
    try {
      input.addData(queryVecs.map { case (id, v) => (id, v.toSeq) }.toSeq: _*)
      q.processAllAvailable()
      assert(results.map(_._1).toSet == queryVecs.map(_._1).toSet)
      queryVecs.foreach { case (qid, qv) =>
        val expected = graft.operators.AnnSearch
          .bruteCosineTopK(corpus, "vec_id", col("v"), qv, 5)
          .as[(Long, Double)].collect().toSeq
        val got = results.filter(_._1 == qid).sortBy(_._4)
          .map(r => (r._2, r._3)).toSeq
        assert(got == expected, s"query $qid mismatch")
      }
    } finally q.stop()
  }

  test("minhashDedupStream: near-duplicate documents are suppressed within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 30).map(i => if (i == 30) "zz" else s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"x$i").mkString(" ")
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.minhashDedupStream(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text", "10 minutes")
    val q = out.writeStream.format("memory").queryName("mhd").outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:01:00"), 1L, base))
      q.processAllAvailable()
      input.addData(
        (ts("2024-01-01 00:02:00"), 2L, nearDup), // collides with doc 1's bands
        (ts("2024-01-01 00:03:00"), 3L, other))   // disjoint vocabulary -> kept
      q.processAllAvailable()
      val kept = spark.table("mhd").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L))
    } finally q.stop()
  }

  test("sessionizeStream: flatMapGroupsWithState closes sessions by gap and by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamOps.sessionizeStream(
      input.toDF().toDF("ts", "user"), "ts", "user",
      gapMs = 5 * 60 * 1000L, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // one batch containing a full session AND its successor: the gap is
      // observed in-batch, so the first session closes immediately
      input.addData(
        (ts("2024-01-01 00:01:00"), "u1"), (ts("2024-01-01 00:03:00"), "u1"),
        (ts("2024-01-01 00:20:00"), "u1"))
      q.processAllAvailable()
      val inBatch = spark.table("sess").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
      assert(inBatch.toSeq == Seq(("u1", "2024-01-01 00:01:00.0", "2024-01-01 00:03:00.0", 2L)))

      // a late-but-within-watermark u1 event in a LATER batch must extend
      // the open session BACKWARDS (start moves from 00:20 to 00:19:30)
      input.addData((ts("2024-01-01 00:19:30"), "u1"))
      q.processAllAvailable()

      // advance the watermark far past u1's open session + gap:
      // the event-time timeout must close it with no further u1 event
      input.addData((ts("2024-01-01 01:00:00"), "u2"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 01:10:00"), "u2"))
      q.processAllAvailable()
      val all = spark.table("sess").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert(all.contains(("u1", "2024-01-01 00:19:30.0", 2L)),
        s"timeout-closed, backwards-extended session missing from $all")
    } finally q.stop()
  }

  test("windowedValueSums: per-window per-key sums") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.windowedValueSums(
      input.toDF().toDF("ts", "user", "value"), "ts", "user", "value", "1 hour", "10 minutes")
    val q = out.writeStream.format("memory").queryName("ws").outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 00:05:00"), "u1", 2.0), (ts("2024-01-01 00:40:00"), "u1", 3.0),
        (ts("2024-01-01 00:10:00"), "u2", 7.0))
      q.processAllAvailable()
      val rows = spark.table("ws").collect()
        .map(r => (r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set(("u1", 5.0), ("u2", 7.0)))
    } finally q.stop()
  }

  test("annDedupStream: in-batch and cross-batch embedding near-dups emit " +
    "per micro-batch; replay emits the same pairs and leaves the index " +
    "bit-identical") {
    import graft.operators.{AnnIndex, AnnSearch}
    import graft.streaming.StreamOps
    val dim = 8
    val rnd = new scala.util.Random(101)
    def vec(): Seq[Double] = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    val (v1, v3) = (vec(), vec())
    val path = java.nio.file.Files.createTempDirectory("graft-anndd").toString + "/idx"
    // base corpus: vector 1 and an unrelated vector 2
    AnnIndex.buildLsh(Seq((1L, v1), (2L, vec())).toDF("vid", "v"),
      "vid", col("v"), dim, path)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Double)]]
    def sink(pairs: org.apache.spark.sql.DataFrame, @annotation.unused bid: Long): Unit =
      emitted += pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def deliver(bid: Long, rows: (Long, Seq[Double])*): Unit =
      StreamOps.annDedupBatch(rows.toDF("vid", "v"), bid,
        "vid", "v", path, 0.98, sink)
    // batch 0: id 3 (novel) + id 4 = scaled copy of 3 (in-batch pair) +
    // id 5 = copy of indexed vector 1 (cross pair)
    deliver(0L, (3L, v3), (4L, v3.map(_ * 0.7)), (5L, v1))
    assert(emitted(0).exists { case (a, b, c) => a == 3L && b == 4L && c == 1.0 })
    assert(emitted(0).exists { case (a, b, c) => a == 5L && b == 1L && c == 1.0 })
    // batch 1: a late dup of batch 0's id 3 — found via the grown index
    deliver(1L, (6L, v3.map(_ * 1.3)))
    assert(emitted(1).exists { case (a, b, _) => a == 6L && (b == 3L || b == 4L) })
    def indexContents() = spark.read.parquet(path).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val (pairs1, idx1) = (emitted(1), indexContents())
    // at-least-once replay of committed batch 1: same pairs, same index
    deliver(1L, (6L, v3.map(_ * 1.3)))
    assert(emitted(2) == pairs1, s"replay emitted ${emitted(2)} != $pairs1")
    assert(indexContents() == idx1, "replay changed the index")
    // the stream wrapper drives the same batch function
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamOps.annDedupStream(input.toDF().toDF("vid", "v"),
      "vid", "v", path, 0.98)(sink)
    try {
      input.addData((7L, v1.map(_ * 2.0)))
      q.processAllAvailable()
      assert(emitted.last.exists { case (a, b, _) => a == 7L && (b == 1L || b == 5L) })
    } finally q.stop()
  }

  test("profileStream: per-batch partial profiles fold to the one-shot " +
    "statistics; a replayed batch overwrites its own partition instead " +
    "of double-counting") {
    import graft.operators.Profile
    import graft.streaming.StreamOps
    val path = java.nio.file.Files.createTempDirectory("graft-profstream")
      .toString + "/prof"
    def docs(off: Int) = (0 until 400).map(i =>
      (off + i.toLong, Seq("en", "de")(i % 2), s"w${i % 13} body $i"))
      .toDF("doc_id", "lang", "text")
    StreamOps.profileBatch(docs(0), 0L, "text", Seq("lang"), path)
    StreamOps.profileBatch(docs(5000), 1L, "text", Seq("lang"), path)
    def merged() = Profile.mergeProfiles(spark.read.parquet(path), 1)
      .collect().map(r => r.getAs[String]("__k0") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("est_distinct_docs"))).toMap
    val m1 = merged()
    assert(m1("en")._1 == 400 && m1("de")._1 == 400)
    // replay of committed batch 1: identical statistics, no double count
    StreamOps.profileBatch(docs(5000), 1L, "text", Seq("lang"), path)
    assert(merged() == m1, "replay must not change the folded profile")
    // the stream wrapper drives the same batch function — on its OWN dir:
    // a fresh stream's batchIds restart at 0, and the overwrite-own-
    // partition discipline would (correctly) replace a same-id partition
    val path2 = java.nio.file.Files.createTempDirectory("graft-profstream2")
      .toString + "/prof"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOps.profileStream(
      input.toDF().toDF("doc_id", "lang", "text"), "text", Seq("lang"), path2)
    try {
      input.addData((9000L, "en", "streamed doc one"))
      q.processAllAvailable()
      val m = Profile.mergeProfiles(spark.read.parquet(path2), 1)
        .collect().map(r => r.getAs[String]("__k0") -> r.getAs[Long]("n_docs")).toMap
      assert(m == Map("en" -> 1L))
    } finally q.stop()
  }

  test("signatureDedupStream: in-batch and cross-batch signature near-dups " +
    "emit per micro-batch; replay is idempotent; compaction preserves " +
    "answers; real images compose through imageHash in the stream graph") {
    import graft.streaming.StreamOps
    val path = java.nio.file.Files.createTempDirectory("graft-sigdd").toString + "/idx"
    val s = 0x600dc0ffee1234L
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long)]]
    def sink(pairs: org.apache.spark.sql.DataFrame, @annotation.unused bid: Long): Unit =
      emitted += pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def deliver(bid: Long, rows: (Long, Long)*): Unit =
      StreamOps.signatureBatch(rows.toDF("id", "sig"), bid,
        "id", "sig", path, 3, sink)
    // batch 0: an in-batch twin pair + a novel code (no index yet)
    deliver(0L, 10L -> s, 11L -> (s ^ 1L), 12L -> 0x17ac0deL)
    assert(emitted(0) == Set((10L, 11L, 1L)))
    // batch 1: a late dup — cross pairs against BOTH stored copies
    deliver(1L, 13L -> (s ^ 2L))
    assert(emitted(1) == Set((13L, 10L, 1L), (13L, 11L, 2L)))
    def indexContents() = spark.read.parquet(s"$path/bands").collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val idx1 = indexContents()
    // at-least-once replay of committed batch 1: same pairs, same index
    deliver(1L, 13L -> (s ^ 2L))
    assert(emitted(2) == emitted(1), s"replay emitted ${emitted(2)}")
    assert(indexContents() == idx1, "replay changed the index")
    // compaction folds the committed batches; later dups are still caught
    graft.operators.Dedup.compactHammingIndex(spark, path, through = Some(1L))
    deliver(2L, 14L -> s)
    assert(emitted(3) == Set((14L, 10L, 0L), (14L, 11L, 1L), (14L, 13L, 1L)))
    // replaying the committed batch ACROSS the compaction: same pairs,
    // idempotent append (its own partition survived the through bound)
    deliver(2L, 14L -> s)
    assert(emitted(4) == emitted(3))

    // real images: imageHash composes into the streaming graph upstream
    val path2 = java.nio.file.Files.createTempDirectory("graft-sigdd2")
      .toString + "/idx"
    def png(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(48, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 48) {
        val g = ((x * 29 + y * 13 + seed * 7) & 0xff)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o); o.toByteArray
    }
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val hashed = graft.multimodal.Multimodal.imageHash(
        input.toDF().toDF("id", "data")
          .select(col("id"), lit("image").as("kind"), col("data")))
      .toDF().where(col("decoded")).select(col("id"), col("dhash"))
    val q = StreamOps.signatureDedupStream(hashed, "id", "dhash", path2)(sink)
    try {
      input.addData((100L, png(1)), (101L, png(1)), (102L, png(9)))
      q.processAllAvailable()
      assert(emitted.last.contains((100L, 101L, 0L)),
        s"identical streamed images should pair: ${emitted.last}")
      input.addData((103L, png(1)))
      q.processAllAvailable()
      assert(emitted.last.exists { case (a, b, h) =>
        a == 103L && (b == 100L || b == 101L) && h == 0L },
        s"late image dup should cross-pair: ${emitted.last}")
    } finally q.stop()
  }

  test("videoDedupStream: real MJPEG clips decode, pair in-batch and " +
    "against the grown frame index per micro-batch; replay is idempotent") {
    import graft.streaming.StreamOps
    val path = java.nio.file.Files.createTempDirectory("graft-viddd").toString + "/idx"
    val src = (0 until 12).map(t => GenVideoFixture.framePx(21, t))
    val v1 = GenVideoFixture.avi(64, 48, 100000L, src.map(GenVideoFixture.encodeJpeg(_, 0.85f)))
    val v2 = GenVideoFixture.avi(64, 48, 100000L, src.map(GenVideoFixture.encodeJpeg(_, 0.62f)))
    val v3 = GenVideoFixture.avi(64, 48, 100000L,
      src.drop(5).map(GenVideoFixture.encodeJpeg(_, 0.85f)))
    val unrelated = GenVideoFixture.avi(64, 48, 100000L,
      (0 until 10).map(t => GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(77, t + 3), 0.85f)))
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long, Long)]]
    def sink(pairs: org.apache.spark.sql.DataFrame, @annotation.unused bid: Long): Unit =
      emitted += pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def deliver(bid: Long, rows: (Long, Array[Byte])*): Unit =
      StreamOps.videoBatch(
        rows.toDF("id", "data").select(col("id"), lit("video").as("kind"), col("data")),
        bid, 500L, path, 3, 2L, sink)
    // batch 0: the base clip + its re-encode pair IN BATCH; one unrelated
    deliver(0L, 1L -> v1, 2L -> v2, 4L -> unrelated)
    assert(emitted(0) == Set((1L, 2L, 0L, 3L)))
    // batch 1: a trimmed late copy — pairs against BOTH stored versions
    // on the shifted diagonal (a = new clip, b = indexed)
    deliver(1L, 3L -> v3)
    assert(emitted(1) == Set((3L, 1L, -1L, 2L), (3L, 2L, -1L, 2L)))
    // at-least-once replay of committed batch 1: same pairs (its own
    // partition is excluded from the probe), idempotent index
    def indexContents() = spark.read.parquet(s"$path/bands").count()
    val n1 = indexContents()
    deliver(1L, 3L -> v3)
    assert(emitted(2) == emitted(1), s"replay emitted ${emitted(2)}")
    assert(indexContents() == n1, "replay changed the index")
    // an all-undecodable batch emits nothing and commits nothing
    deliver(2L, 9L -> "not a container".getBytes)
    assert(emitted(3).isEmpty && indexContents() == n1)
  }

  test("audioSeqDedupStream: windowed signatures pair in-batch and " +
    "against the grown index per micro-batch; a whole-window trim pairs " +
    "on the shifted diagonal; replay is idempotent") {
    import graft.streaming.StreamOps
    val path = java.nio.file.Files.createTempDirectory("graft-auddd").toString + "/idx"
    // 1 s at 16 kHz, 250 ms windows -> 4 whole windows of 4000 frames;
    // each window gets its own synth seed so windows are mutually
    // DISTINCT (one seed's block structure is self-similar enough that
    // different windows can land within hamming 3 — a legitimate match
    // the operator reports, but noise for this test's planted diagonals)
    val base = (0 until 4).toArray.flatMap(w =>
      GenAudioFpFixture.synth(4000, 71 + 13 * w))
    val wavA = GenAudioFpFixture.wavBytes(Array(base))
    val wavB = GenAudioFpFixture.wavBytes(Array(base)) // byte-identical PCM
    val wavC = GenAudioFpFixture.wavBytes(Array(base.drop(4000))) // -1 window
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long, Long)]]
    def sink(pairs: org.apache.spark.sql.DataFrame, @annotation.unused bid: Long): Unit =
      emitted += pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def deliver(bid: Long, rows: (Long, Array[Byte])*): Unit =
      StreamOps.audioSeqBatch(
        rows.toDF("id", "data").select(col("id"), lit("audio").as("kind"), col("data")),
        bid, 250L, path, 3, 2L, sink)
    deliver(0L, 1L -> wavA, 2L -> wavB, 9L -> "not audio".getBytes)
    assert(emitted(0) == Set((1L, 2L, 0L, 4L)))
    // the trimmed copy arrives later: its window j holds the stored
    // clips' window j+1 -> diagonal -1 across the 3 shared windows
    deliver(1L, 3L -> wavC)
    assert(emitted(1) == Set((3L, 1L, -1L, 3L), (3L, 2L, -1L, 3L)))
    def indexContents() = spark.read.parquet(s"$path/bands").count()
    val n1 = indexContents()
    deliver(1L, 3L -> wavC)
    assert(emitted(2) == emitted(1) && indexContents() == n1)
  }
}
