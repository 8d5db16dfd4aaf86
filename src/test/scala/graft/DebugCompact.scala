package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (SCALING.md): probe latency on a persisted LSH index
  * grown by many small streaming appends, before vs after `compact`.
  * Per-batch appends write one file per touched bucket per batch, so a
  * long-lived ingestion stream accumulates (batches x buckets) small files
  * and the probe's file listing/open cost grows with ingestion HISTORY
  * rather than data size — compaction folds them back to one file per
  * bucket. Deterministic vectors (hash-derived), same protocol as
  * [[DebugAnnIndex]]. */
object DebugCompact {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 100000L
    val nBatches = if (args.length > 1) args(1).toInt else 100
    // > 0 = the streaming loops' in-loop policy: fold committed batches
    // (through = current - 1) every K appends, as annIndexAppendStream's
    // compactEvery does — measures the steady-state file count and the
    // amortized ingestion cost of never letting fragmentation build up
    val compactEvery = if (args.length > 2) args(2).toInt else 0
    val batchSize = 1000L
    val dim = 32
    val reps = 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.AnnIndex
    def vecs(from: Long, count: Long) = {
      val vecExpr = expr(s"transform(sequence(0, ${dim - 1}), d -> " +
        "(conv(substring(md5(concat(cast(id as string), '_', cast(d as string))), 1, 6), 16, 10) " +
        "/ 8388608.0) - 1.0)")
      spark.range(from, from + count).select(col("id").as("vid"),
        vecExpr.cast("array<double>").as("v"))
    }
    val path = "/tmp/graft-compact-bench/idx"
    AnnIndex.buildLsh(vecs(0, nBase), "vid", col("v"), dim, path)
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      AnnIndex.appendLsh(vecs(nBase + b * batchSize, batchSize), "vid", col("v"),
        path, batchId = Some(b.toLong))
      if (compactEvery > 0 && b > 0 && b % compactEvery == 0)
        AnnIndex.compact(spark, path, through = Some(b - 1L))
    }
    println(f"[compact] $nBatches appends of $batchSize (compactEvery=" +
      f"$compactEvery): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def files() = {
      var n = 0L
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).forEach(p =>
        if (p.toString.endsWith(".parquet")) n += 1)
      n
    }
    val q = (0 until dim).map(d => math.sin(d * 1.7) * 0.8)
    def probe(tag: String): Unit = (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t = System.nanoTime()
      AnnIndex.lshTopK(spark, path, "vid", q, 10, probes = 4).count()
      println(f"[compact] $tag rep$i: ${(System.nanoTime() - t) / 1e9}%.3f s")
    }
    println(s"[compact] files before: ${files()}")
    probe("fragmented")
    val tc = System.nanoTime()
    AnnIndex.compact(spark, path)
    println(f"[compact] compact: ${(System.nanoTime() - tc) / 1e9}%.1f s, " +
      s"files after: ${files()}")
    probe("compacted")
    spark.stop()
  }
}
