package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, AnnSearch}

/** The persisted bucketed ANN index: answers must be identical to the
  * on-the-fly paths, and the query must physically read ONLY the probed
  * partition directories (partition pruning at file listing). */
class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8
  private lazy val emb = {
    val rnd = new scala.util.Random(61)
    (0 until 500).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
  }
  private def query(seed: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get

  /** Data files under each bucket directory, across its batch= levels. */
  private def parquetFilesPerBucket(path: String): Seq[Int] =
    new java.io.File(path).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(AnnIndex.BucketCol + "="))
      .map { bucket =>
        bucket.listFiles().filter(_.isDirectory)
          .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
      }

  test("persisted LSH index: probed query == on-the-fly lshTopK, and only " +
    "the probed partitions are listed/read") {
    val path = java.nio.file.Files.createTempDirectory("graft-lshidx").toString + "/idx"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, path)
    val total = new java.io.File(path).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith(AnnIndex.BucketCol + "="))
    assert(total > 50, s"expected many non-empty buckets, got $total")
    // bucket co-location: the pre-write repartition means ONE task owns a
    // bucket, so each directory holds exactly one data file — without it,
    // every write task would spray a file into every bucket it touches
    val filesPerBucket = parquetFilesPerBucket(path)
    assert(filesPerBucket.forall(_ == 1),
      s"expected one file per bucket, got ${filesPerBucket.toSeq.distinct}")
    for (probes <- Seq(1, 4)) {
      val q = query(71)
      // the Plan variant: the serving lshTopK executes eagerly (retry
      // wrapper), so plan assertions run against the lazy twin
      val idx = AnnIndex.lshTopKPlan(spark, path, "vid", q, 10, probes = probes)
      val fly = AnnSearch.lshTopK(emb, "vid", col("v"), dim, q, 10, probes = probes)
      assert(idx.collect().map(_.toSeq).toSeq == fly.collect().map(_.toSeq).toSeq,
        s"probes=$probes diverged")
      // partition pruning: the scan's partition filter carries the probe
      // set and the selected partition count is <= probes (of `total`)
      val scan = scanOf(idx)
      assert(scan.partitionFilters.nonEmpty, "bucket filter must be a partition filter")
      val selected = scan.metrics("numPartitions").value
      assert(selected <= probes && selected < total,
        s"probes=$probes should prune to <= $probes of $total partitions, read $selected")
    }
  }

  test("persisted IVF index: probed query == on-the-fly ivfTopK, pruned to " +
    "nProbe partitions; all-probe == brute force") {
    val rnd = new scala.util.Random(67)
    val cents = (0 until 16).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val path = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString + "/idx"
    AnnIndex.buildIvf(emb, "vid", col("v"), cents, path)
    val q = query(73)
    // no caller-supplied centroids: the sidecar metadata drives the probe
    val idx = AnnIndex.ivfTopKPlan(spark, path, "vid", q, 10, nProbe = 2)
    val fly = AnnSearch.ivfTopK(emb, "vid", col("v"), cents, q, 10, nProbe = 2)
    assert(idx.collect().map(_.toSeq).toSeq == fly.collect().map(_.toSeq).toSeq)
    val scan = scanOf(idx)
    assert(scan.partitionFilters.nonEmpty)
    assert(scan.metrics("numPartitions").value <= 2)
    // probing every cluster from the index equals brute force over the corpus
    val all = AnnIndex.ivfTopK(spark, path, "vid", q, 10, nProbe = 16)
      .select("vid").as[Long].collect().toSeq
    val brute = AnnSearch.bruteCosineTopK(emb, "vid", col("v"), q, 10)
      .select("vid").as[Long].collect().toSeq
    assert(all == brute)
  }

  test("recallProbe detects drift-induced recall sag after appends; " +
    "rebuild re-trains the quantizer and restores it") {
    val d = 4
    val rnd = new scala.util.Random(53)
    // training blob: a tight cluster near e1 — the 8 trained centroids all
    // land inside it, their bisector planes are noise
    val blob = (0 until 200).map { i =>
      (i.toLong, Seq(1.0, 0.0, 0.0, 0.0).map(_ + rnd.nextGaussian() * 0.05))
    }.toDF("vid", "v")
    val path = java.nio.file.Files.createTempDirectory("graft-recall").toString + "/idx"
    val cents = AnnSearch.kmeans(blob, "vid", col("v"), 8)
    AnnIndex.buildIvf(blob, "vid", col("v"), cents, path)
    // drifted append: vectors spread over the whole sphere — each lands in
    // an arbitrary training-blob centroid, so a drifted query's true
    // neighbors scatter across buckets its nProbe=1 probe never visits
    val drift = (200 until 400).map { i =>
      (i.toLong, Seq.fill(d)(rnd.nextDouble() * 2 - 1))
    }.toDF("vid", "v")
    AnnIndex.append(drift, "vid", col("v"), path, batchId = Some(0L))
    val before = AnnIndex.recallProbe(spark, path, "vid", k = 10, nProbe = 1)
    val ceiling = AnnIndex.recallProbe(spark, path, "vid", k = 10, nProbe = 8)
    assert(ceiling > 0.99, s"all-probe recall must be ~1, got $ceiling")
    assert(before < 0.9, s"drifted nProbe=1 recall should sag, got $before")
    AnnIndex.rebuild(spark, path, "vid")
    val after = AnnIndex.recallProbe(spark, path, "vid", k = 10, nProbe = 1)
    assert(after > before + 0.05,
      s"rebuild should restore recall: before=$before after=$after")
    // the rebuild folded the batch partitions and advanced the replay
    // bookkeeping: the drifted batch re-delivered across it no-ops
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("batch=-1"), dirs.toString)
    val n0 = spark.read.parquet(path).count()
    AnnIndex.append(drift, "vid", col("v"), path, batchId = Some(0L))
    assert(spark.read.parquet(path).count() == n0,
      "a batch replayed across the rebuild must no-op")
    assert(n0 == 400)
    // the probe is flavor-agnostic (sidecar-routed): all-probe recall on
    // an LSH index of the same corpus is ~1 too
    val lshPath = java.nio.file.Files.createTempDirectory("graft-recallL").toString + "/idx"
    AnnIndex.buildLsh(blob.unionByName(drift), "vid", col("v"), d, lshPath, nBits = 5)
    assert(AnnIndex.recallProbe(spark, lshPath, "vid", k = 10, nProbe = 32) > 0.99)
  }

  test("append grows a served index with the stored parameters: probes see " +
    "old and new vectors alike, equal to a from-scratch build of the union") {
    val rnd = new scala.util.Random(89)
    val extra = (500 until 600).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    val union = emb.unionByName(extra)
    val q = query(97)

    val lshPath = java.nio.file.Files.createTempDirectory("graft-lshapp").toString + "/idx"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, lshPath, nBits = 6, seed = 7L)
    AnnIndex.appendLsh(extra, "vid", col("v"), lshPath)
    val grown = AnnIndex.lshTopK(spark, lshPath, "vid", q, 10, probes = 4)
    val rebuilt = AnnSearch.lshTopK(union, "vid", col("v"), dim, q, 10,
      nBits = 6, seed = 7L, probes = 4)
    assert(grown.collect().map(_.toSeq).toSeq == rebuilt.collect().map(_.toSeq).toSeq)
    // the appended batch is probeable (some of the 100 new vectors land in
    // the probed buckets of SOME query; prove membership directly)
    val ids = spark.read.parquet(lshPath).select("vid").as[Long].collect().toSet
    assert(ids.size == 600 && ids.contains(599L))

    val cents = (0 until 8).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val ivfPath = java.nio.file.Files.createTempDirectory("graft-ivfapp").toString + "/idx"
    AnnIndex.buildIvf(emb, "vid", col("v"), cents, ivfPath)
    AnnIndex.appendIvf(extra, "vid", col("v"), ivfPath)
    val gIvf = AnnIndex.ivfTopK(spark, ivfPath, "vid", q, 10, nProbe = 8)
      .select("vid").as[Long].collect().toSeq
    val bIvf = AnnSearch.bruteCosineTopK(union, "vid", col("v"), q, 10)
      .select("vid").as[Long].collect().toSeq
    assert(gIvf == bIvf, "all-probe over the grown index must equal brute force")
    // appending to a non-index path fails loudly, not silently mis-bucketed
    val e = intercept[IllegalArgumentException] {
      AnnIndex.appendLsh(extra, "vid", col("v"),
        java.nio.file.Files.createTempDirectory("graft-noidx").toString)
    }
    assert(e.getMessage.contains("no LSH index metadata"))
  }

  test("batchId-keyed appends are replay-idempotent: re-delivering a " +
    "committed micro-batch leaves index contents and probe answers unchanged") {
    val rnd = new scala.util.Random(101)
    def batch(from: Int, n: Int) = (from until from + n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    val q = query(103)

    val lshPath = java.nio.file.Files.createTempDirectory("graft-replay").toString + "/idx"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, lshPath, nBits = 5)
    val b0 = batch(500, 80).cache()
    AnnIndex.appendLsh(b0, "vid", col("v"), lshPath, batchId = Some(0L))
    def contents() = spark.read.parquet(lshPath)
      // partition-column types are inferred from directory names -> cast
      .select(col("vid"), col(AnnIndex.BucketCol).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def answer() = AnnIndex.lshTopK(spark, lshPath, "vid", q, 10, probes = 32)
      .collect().map(_.toSeq).toSeq
    val (c1, a1) = (contents(), answer())
    // at-least-once re-delivery: same batchId, same rows
    AnnIndex.appendLsh(b0, "vid", col("v"), lshPath, batchId = Some(0L))
    assert(contents() == c1, "replayed append changed the index contents")
    assert(answer() == a1, "replayed append changed served answers")
    assert(c1.map(_._1).distinct.size == c1.size, "a vector appears twice")

    // IVF twin
    val cents = (0 until 8).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val ivfPath = java.nio.file.Files.createTempDirectory("graft-replayivf").toString + "/idx"
    AnnIndex.buildIvf(emb, "vid", col("v"), cents, ivfPath)
    AnnIndex.appendIvf(b0, "vid", col("v"), ivfPath, batchId = Some(0L))
    val n1 = spark.read.parquet(ivfPath).count()
    val i1 = AnnIndex.ivfTopK(spark, ivfPath, "vid", q, 10, nProbe = 8)
      .collect().map(_.toSeq).toSeq
    AnnIndex.appendIvf(b0, "vid", col("v"), ivfPath, batchId = Some(0L))
    assert(spark.read.parquet(ivfPath).count() == n1)
    assert(AnnIndex.ivfTopK(spark, ivfPath, "vid", q, 10, nProbe = 8)
      .collect().map(_.toSeq).toSeq == i1)
    b0.unpersist()
  }

  test("compact folds appended batches into the base: answers identical, " +
    "one file per bucket again, and a pre-compaction batchId no-ops") {
    val rnd = new scala.util.Random(107)
    def batch(from: Int, n: Int) = (from until from + n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    val q = query(109)
    val path = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/idx"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, path, nBits = 4)
    val batches = (0 until 4).map(i => batch(500 + 100 * i, 100).cache())
    batches.zipWithIndex.foreach { case (b, i) =>
      AnnIndex.appendLsh(b, "vid", col("v"), path, batchId = Some(i.toLong))
    }
    // appends accumulate one file per touched bucket per batch
    assert(parquetFilesPerBucket(path).exists(_ > 1),
      "fixture did not accumulate multiple files — vacuous test")
    val before = AnnIndex.lshTopK(spark, path, "vid", q, 10, probes = 16)
      .collect().map(_.toSeq).toSeq
    AnnIndex.compact(spark, path)
    assert(AnnIndex.lshTopK(spark, path, "vid", q, 10, probes = 16)
      .collect().map(_.toSeq).toSeq == before, "compaction changed answers")
    val after = parquetFilesPerBucket(path)
    assert(after.forall(_ <= 1),
      s"compaction must restore ~one file per bucket, got ${after.distinct}")
    assert(spark.read.parquet(path).count() == 900)
    // sidecar parameters survive the swap (parameter-free probe still works)
    assert(AnnIndex.readLshMeta(spark, path).contains(AnnIndex.LshMeta(dim, 4, 42L)))
    // a committed batch re-delivered ACROSS the compaction must no-op —
    // its rows are already folded into the base
    AnnIndex.appendLsh(batches(3), "vid", col("v"), path, batchId = Some(3L))
    assert(spark.read.parquet(path).count() == 900,
      "replay of a compacted batch re-added its rows")
    // but genuinely new batches still append and serve
    AnnIndex.appendLsh(batch(900, 50), "vid", col("v"), path, batchId = Some(4L))
    assert(spark.read.parquet(path).count() == 950)
    batches.foreach(_.unpersist())
  }

  test("self-describing indexes: parameters round-trip through the sidecar; " +
    "a stale override fails loudly instead of silently mis-probing") {
    val base = java.nio.file.Files.createTempDirectory("graft-meta").toString
    val lshPath = s"$base/lsh"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, lshPath, nBits = 6, seed = 7L)
    // metadata round-trip: build -> read
    assert(AnnIndex.readLshMeta(spark, lshPath)
      .contains(AnnIndex.LshMeta(dim, 6, 7L)))
    // parameter-free query resolves (nBits, seed) from the sidecar and
    // equals the on-the-fly path at the build's parameters
    val q = query(79)
    val idx = AnnIndex.lshTopK(spark, lshPath, "vid", q, 10, probes = 2)
    val fly = AnnSearch.lshTopK(emb, "vid", col("v"), dim, q, 10,
      nBits = 6, seed = 7L, probes = 2)
    assert(idx.collect().map(_.toSeq).toSeq == fly.collect().map(_.toSeq).toSeq)
    // agreeing explicit parameters are admitted; stale ones throw
    AnnIndex.lshTopK(spark, lshPath, "vid", q, 10, nBits = 6, seed = 7L, probes = 2)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.lshTopK(spark, lshPath, "vid", q, 10, nBits = 8, probes = 2)
    }
    assert(e.getMessage.contains("disagrees"))

    val rnd = new scala.util.Random(83)
    val cents = (0 until 4).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val ivfPath = s"$base/ivf"
    AnnIndex.buildIvf(emb, "vid", col("v"), cents, ivfPath)
    // Double.toString -> Jackson parse round-trips bit-exactly
    assert(AnnIndex.readIvfCentroids(spark, ivfPath).contains(cents))
    AnnIndex.ivfTopK(spark, ivfPath, "vid", q, 5, nProbe = 1, centroids = cents)
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.ivfTopK(spark, ivfPath, "vid", q, 5, nProbe = 1,
        centroids = cents.map(_.map(_ + 1.0)))
    }
    assert(e2.getMessage.contains("disagrees"))
    // cross-kind confusion is caught too
    val e3 = intercept[IllegalArgumentException] {
      AnnIndex.readIvfCentroids(spark, lshPath)
    }
    assert(e3.getMessage.contains("not IVF"))
  }

  test("incrementalNearDup: a batch checks against the persisted LSH index " +
    "without re-signing the corpus; planted dups found, novel rows clean, " +
    "replayed partitions excluded") {
    val path = java.nio.file.Files.createTempDirectory("graft-incrann").toString + "/idx"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, path)
    // batch: an exact copy of vector 7 (certain near-dup, same bucket), a
    // scaled copy of vector 11 (cosine 1 with it), and an orthogonal-ish
    // novel vector unlikely to clear 0.95 against anything
    val v7 = emb.where(col("vid") === 7L).head.getSeq[Double](1).toSeq
    val v11 = emb.where(col("vid") === 11L).head.getSeq[Double](1).toSeq
    val batch = Seq(
      (1007L, v7), (1011L, v11.map(_ * 0.5)),
      (1099L, Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)))
      .toDF("vid", "v")
    val got = AnnIndex.incrementalNearDup(batch, "vid", col("v"), path, 0.95)
      .as[(Long, Long, Double)].collect()
    val byA = got.groupBy(_._1)
    assert(byA.contains(1007L) && byA(1007L).exists(r => r._2 == 7L && r._3 == 1.0))
    assert(byA.contains(1011L) && byA(1011L).exists(r => r._2 == 11L && r._3 == 1.0))
    assert(!byA.contains(1099L) ||
      byA(1099L).forall(_._2 != 1099L)) // novel row matches nothing planted
    // replay guard: after the batch is appended under batchId 5, re-checking
    // WITH excludeBatch(5) must not match the batch against its own copy
    AnnIndex.append(batch, "vid", col("v"), path, batchId = Some(5L))
    val replay = AnnIndex.incrementalNearDup(batch, "vid", col("v"), path,
        0.95, excludeBatch = Some(5L))
      .as[(Long, Long, Double)].collect()
    assert(!replay.exists(r => r._2 >= 1000L),
      s"replayed batch matched its own first-attempt rows: ${replay.toSeq}")
    assert(replay.exists(r => r._1 == 1007L && r._2 == 7L))
  }

  test("nearDupAgainstIndex broadcast gate: a small batch plans as a " +
    "broadcast join, but a batch whose size estimate exceeds the session " +
    "threshold is NOT force-broadcast (the planner chooses; a bulk " +
    "backfill through the incremental path must not OOM the driver)") {
    val path = java.nio.file.Files.createTempDirectory("graft-bcgate").toString + "/idx"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, path)
    val batch = Seq((1007L, Seq.fill(dim)(0.5))).toDF("vid", "v")
    def planFor(): String =
      AnnIndex.incrementalNearDup(batch, "vid", col("v"), path, 0.95)
        .queryExecution.executedPlan.toString
    // default 10 MB threshold: the 1-row batch hints broadcast
    assert(planFor().contains("BroadcastHashJoin"),
      s"small batch should broadcast:\n${planFor()}")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    // a 1-byte threshold: every size estimate exceeds it, so the gate
    // withholds the hint and nothing else volunteers a broadcast
    spark.conf.set(key, "1")
    try assert(!planFor().contains("BroadcastHashJoin"),
      s"over-threshold batch must not force a broadcast:\n${planFor()}")
    finally spark.conf.set(key, prev)
  }

  test("persisted IVF-PQ index: codes only (no vectors), probe == composed " +
    "encode+assign+ADC, pruned partitions, kind-routed append, compact-safe") {
    import graft.operators.Quantize
    val rnd = new scala.util.Random(89)
    val cents = (0 until 8).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val books = Quantize.pqTrain(emb, col("vid"), col("v"), m = 2,
      nCodes = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString + "/idx"
    AnnIndex.buildIvfPq(emb, "vid", col("v"), cents, books, path)
    // compression contract: the index stores (vid, codes) — never the vector
    val stored = spark.read.parquet(path)
    assert(stored.columns.toSet == Set("vid", "codes", "bucket", "batch"))
    // sidecar round-trips both training artifacts bit-exactly
    assert(AnnIndex.readIvfPqMeta(spark, path).contains((cents, books)))
    val q = query(97)
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val probed = cents.indices.sortBy(i => (l2(q, cents(i)), i)).take(2)
    val flyEnc = Quantize.pqEncode(
      emb.withColumn("c", AnnSearch.ivfCluster(col("v"), cents))
        .where(col("c").isin(probed: _*)), col("vid"), col("v"), books)
    val fly = Quantize.pqAdcTopK(flyEnc, col("id"), col("codes"), books, q, 10)
    val idx = AnnIndex.ivfPqTopKPlan(spark, path, "vid", q, 10, nProbe = 2)
    assert(idx.collect().map(_.toSeq).toSeq == fly.collect().map(_.toSeq).toSeq)
    val scan = scanOf(idx)
    assert(scan.partitionFilters.nonEmpty)
    assert(scan.metrics("numPartitions").value <= 2)
    // kind-routed append: generic append() encodes with the STORED books
    val extra = Seq((9001L, Seq.fill(dim)(0.1))).toDF("vid", "v")
    AnnIndex.append(extra, "vid", col("v"), path)
    assert(spark.read.parquet(path).where(col("vid") === 9001L).count() == 1)
    // compact folds the append; all-probe answers are unchanged by it
    val before = AnnIndex.ivfPqTopK(spark, path, "vid", q, 10, nProbe = 8)
      .collect().map(_.toSeq).toSeq
    AnnIndex.compact(spark, path)
    val after = AnnIndex.ivfPqTopK(spark, path, "vid", q, 10, nProbe = 8)
      .collect().map(_.toSeq).toSeq
    assert(before == after)
    // no stored vectors -> recallProbe must refuse, not crash obscurely
    val e = intercept[IllegalArgumentException] {
      AnnIndex.recallProbe(spark, path, "vid", 5, 2)
    }
    assert(e.getMessage.contains("IVF-PQ"))
    // the source-side gauge works instead: probing EVERY cluster makes
    // bucket loss zero, so residual recall loss is PQ distortion only —
    // strictly positive recall, and never above 1
    val rAll = AnnIndex.ivfPqRecallProbe(spark, path, emb, "vid", col("v"),
      k = 10, nProbe = 8, sampleN = 8)
    assert(rAll > 0.3 && rAll <= 1.0, s"all-probe recall $rAll out of range")
    // a starved probe still returns a sane reading (ADC distortion means
    // fewer probes is not STRICTLY dominated, so only the range is asserted)
    val r1 = AnnIndex.ivfPqRecallProbe(spark, path, emb, "vid", col("v"),
      k = 10, nProbe = 1, sampleN = 8)
    assert(r1 >= 0.0 && r1 <= 1.0, s"nProbe=1 recall $r1 out of range")
  }
}
