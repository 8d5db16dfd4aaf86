package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Dedup, IndexIO}
import graft.streaming.StreamOps

/** Crash-window hardening of the persisted-index swap/append contract:
  *
  *  - a compaction swap interrupted between its two renames leaves the
  *    index only at `<path>__old`; every bootstrap/append/compact entry
  *    point must REPAIR that state instead of reading "no index yet" and
  *    silently restarting the accepted corpus from one batch;
  *  - an empty micro-batch (or an all-rejected first curation batch) must
  *    not commit a file-less parquet directory that wedges every later
  *    read on schema inference;
  *  - a served ANN probe racing a concurrent compaction's atomic swap must
  *    retry its stale listing and answer, never surface a FileNotFound.
  */
class IndexRecoverySpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String) =
    Files.createTempDirectory(s"graft-$tag").toString

  private def mv(a: String, b: String): Unit =
    Files.move(Paths.get(a), Paths.get(b))

  // ------------------------------------------------------------- recoverSwap

  test("recoverSwap: index stranded at __old with a complete __compacting " +
    "finishes the swap; without one it rolls back") {
    // forward case: complete the swap to the rewritten twin
    val p1 = tmpDir("rsf") + "/idx"
    Dedup.writeFingerprintIndex(Seq((1L, "a b c")).toDF("id", "text"),
      "id", col("text"), p1)
    Dedup.compactFingerprintIndex(spark, p1) // leaves a well-formed layout
    // craft the mid-swap crash: path at __old, rewritten tmp complete
    mv(p1, p1 + "__compacting__stage")
    Dedup.writeFingerprintIndex(Seq((1L, "a b c")).toDF("id", "text"),
      "id", col("text"), p1)
    mv(p1, p1 + "__old")
    mv(p1 + "__compacting__stage", p1 + "__compacting")
    IndexIO.recoverSwap(spark, p1)
    assert(new java.io.File(p1).isDirectory)
    assert(!new java.io.File(p1 + "__old").exists)
    assert(!new java.io.File(p1 + "__compacting").exists)
    assert(spark.read.parquet(p1).select("id").head.getLong(0) == 1L)

    // rollback case: no complete tmp -> restore __old
    val p2 = tmpDir("rsb") + "/idx"
    Dedup.writeFingerprintIndex(Seq((2L, "d e f")).toDF("id", "text"),
      "id", col("text"), p2)
    mv(p2, p2 + "__old")
    IndexIO.recoverSwap(spark, p2)
    assert(new java.io.File(p2).isDirectory && !new java.io.File(p2 + "__old").exists)
    assert(spark.read.parquet(p2).select("id").head.getLong(0) == 2L)
  }

  test("exactBatch after a mid-swap crash dedups against the RESTORED " +
    "corpus instead of silently rebuilding from the replayed batch") {
    val path = tmpDir("rse") + "/idx"
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def run(batch: Seq[(Long, String)], id: Long): Unit =
      StreamOps.exactBatch(batch.toDF("doc_id", "text"), id, "doc_id", "text",
        path, (dups, _) => emitted += dups.select("id").collect()
          .map(_.getLong(0)).toSet)
    run(Seq((1L, "alpha beta"), (2L, "gamma delta")), 0L)
    assert(emitted.last == Set.empty[Long])
    // crash window: the index is stranded at __old
    mv(path, path + "__old")
    // batch 1 re-sends doc 1's text under a new id: with the bare exists()
    // bootstrap this was admitted as novel (corpus lost); with recovery it
    // is flagged as a duplicate of the restored corpus
    run(Seq((10L, "alpha beta")), 1L)
    assert(emitted.last == Set(10L),
      s"duplicate of the pre-crash corpus not detected: ${emitted.last}")
  }

  // --------------------------------------------------- empty-batch robustness

  test("curationStream survives a first batch with zero survivors (all " +
    "quality-rejected) — later batches still dedup and index") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val words = (1 to 16).map(i => s"w$i").mkString(" ")
    val root = tmpDir("curempty") + "/idx"
    val input = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = StreamOps.curationStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", root, 0.8,
      length(col("text")) >= 20) { (accepted, batchId) =>
      perBatch(batchId) = accepted.select("doc_id").collect()
        .map(_.getLong(0)).toSet
    }
    try {
      input.addData((1L, "short"), (2L, "tiny")) // batch 0: all rejected
      q.processAllAvailable()
      input.addData((3L, words), (4L, words))    // batch 1: 4 = dup of 3
      q.processAllAvailable()
      input.addData((5L, words))                 // batch 2: dup vs index
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
    } finally q.stop()
    assert(perBatch(0L) == Set.empty[Long])
    assert(perBatch(1L) == Set(3L), perBatch.toString)
    assert(perBatch(2L) == Set.empty[Long], perBatch.toString)
  }

  test("incremental dedup/exact streams ignore empty micro-batches without " +
    "committing file-less index directories") {
    val path = tmpDir("empt") + "/idx"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    var calls = 0
    StreamOps.exactBatch(empty, 0L, "doc_id", "text", path,
      (_, _) => calls += 1)
    // the emission still fires (contract) but no index dir was committed
    assert(calls == 1)
    assert(!IndexIO.hasData(spark, path))
    // a later real batch bootstraps cleanly
    StreamOps.exactBatch(Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text"),
      1L, "doc_id", "text", path, (_, _) => ())
    assert(IndexIO.hasData(spark, path))

    val band = tmpDir("emptb") + "/idx"
    StreamOps.dedupBatch(empty, 0L, "doc_id", "text", band, 0.8, (_, _) => ())
    assert(!IndexIO.hasData(spark, s"$band/bands"))
  }

  test("the annindex.compactEvery session knob drives in-loop compaction " +
    "when the stream's argument is left at default") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmpDir("knob") + "/idx"
    val input = MemoryStream[(Long, String)]
    spark.conf.set(graft.api.Knobs.AnnIndexCompactEvery, "1")
    val q = try StreamOps.incrementalExactStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", path)((_, _) => ())
      finally ()
    try {
      input.addData((1L, "aa bb")); q.processAllAvailable()
      input.addData((2L, "cc dd")); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
    } finally { q.stop(); spark.conf.unset(graft.api.Knobs.AnnIndexCompactEvery) }
    // the fold ran at batch 1 (through = 0): batch 0 is folded into the base
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    assert(dirs == Seq("batch=-1", "batch=1"), dirs.toString)
  }

  // ------------------------------------------------------- probe resilience

  test("retryStale retries stale listings with a bound, passes other " +
    "failures through") {
    var n = 0
    val got = IndexIO.retryStale() {
      n += 1
      if (n < 3) throw new RuntimeException("wrap",
        new java.io.FileNotFoundException("part-0000 does not exist"))
      42
    }
    assert(got == 42 && n == 3)
    intercept[IllegalArgumentException] {
      IndexIO.retryStale() { throw new IllegalArgumentException("real bug") }
    }
    val e = intercept[RuntimeException] {
      IndexIO.retryStale(attempts = 2, backoffMs = 1) {
        throw new RuntimeException("x",
          new java.io.FileNotFoundException("gone"))
      }
    }
    assert(e.getMessage == "x") // bounded: the stale failure surfaces
  }

  test("lshTopK rides through the index briefly vanishing mid-probe (the " +
    "swap window) and answers identically") {
    val dim = 8
    val rnd = new scala.util.Random(31)
    val emb = (0 until 300).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    val path = tmpDir("probe") + "/idx"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, path)
    val q = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    val expect = AnnIndex.lshTopK(spark, path, "vid", q, 10, probes = 8)
      .collect().map(_.toSeq).toSeq
    // take the index away, probe from another thread (it must retry), put
    // the index back inside the retry horizon
    mv(path, path + "__swapping")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val probe = Future(
      AnnIndex.lshTopK(spark, path, "vid", q, 10, probes = 8)
        .collect().map(_.toSeq).toSeq)
    Thread.sleep(60)
    mv(path + "__swapping", path)
    assert(Await.result(probe, 30.seconds) == expect)
  }

  test("probe loop racing repeated compactions: zero failed probes, " +
    "identical answers throughout") {
    val dim = 8
    val rnd = new scala.util.Random(37)
    val emb = (0 until 300).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    val path = tmpDir("race") + "/idx"
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, path)
    val extra = (300 until 340).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    AnnIndex.append(extra, "vid", col("v"), path, batchId = Some(0L))
    val q = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    def answer() = AnnIndex.lshTopK(spark, path, "vid", q, 10, probes = 16)
      .collect().map(_.toSeq).toSeq
    val expect = answer()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    @volatile var stop = false
    val started = new java.util.concurrent.CountDownLatch(1)
    val probes = Future {
      var n = 0
      while (!stop) {
        assert(answer() == expect, s"probe $n diverged")
        n += 1; started.countDown()
      }
      n
    }
    // under a loaded host the Future can sit queued while the compactions
    // finish — wait for the first probe so the loop provably overlaps them
    assert(started.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "the probe loop never started")
    try (1 to 3).foreach(_ => AnnIndex.compact(spark, path))
    finally stop = true
    val ran = Await.result(probes, 60.seconds)
    assert(ran > 0, "the probe loop never ran during the compactions")
    assert(answer() == expect)
  }

  test("IVF-PQ probes ride through racing compactions too: zero failures, " +
    "identical ADC answers") {
    val dim = 8
    val rnd = new scala.util.Random(41)
    val emb = (0 until 300).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v")
    val cents = (0 until 4).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val books = graft.operators.Quantize.pqTrain(emb, col("vid"), col("v"),
      m = 2, nCodes = 4, iters = 1)
    val path = tmpDir("race-pq") + "/idx"
    AnnIndex.buildIvfPq(emb, "vid", col("v"), cents, books, path)
    AnnIndex.append((300 until 330).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vid", "v"),
      "vid", col("v"), path, batchId = Some(0L))
    val q = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    def answer() = AnnIndex.ivfPqTopK(spark, path, "vid", q, 10, nProbe = 4)
      .collect().map(_.toSeq).toSeq
    val expect = answer()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    @volatile var stop = false
    val started = new java.util.concurrent.CountDownLatch(1)
    val probes = Future {
      var n = 0
      while (!stop) {
        assert(answer() == expect, s"probe $n diverged")
        n += 1; started.countDown()
      }
      n
    }
    assert(started.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "the probe loop never started")
    try (1 to 3).foreach(_ => AnnIndex.compact(spark, path))
    finally stop = true
    val ran = Await.result(probes, 60.seconds)
    assert(ran > 0, "the probe loop never ran during the compactions")
    assert(answer() == expect)
  }
}
