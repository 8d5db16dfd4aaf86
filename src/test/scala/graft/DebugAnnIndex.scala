package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (SCALING.md): persisted bucketed LSH index vs the
  * on-the-fly path, at a corpus size where scan cost dominates scheduling.
  * Synthesizes n deterministic vectors (hash-derived, no RNG state), builds
  * the index once, then times per-query cost of (a) on-the-fly lshTopK —
  * full scan + signature recompute per query — and (b) the persisted index —
  * partition-pruned read of `probes` of 256 directories. */
object DebugAnnIndex {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = 32
    val reps = 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{AnnIndex, AnnSearch}
    // deterministic corpus: dim doubles in [-1, 1) from md5-derived bits
    val vecExpr = expr(s"transform(sequence(0, ${dim - 1}), d -> " +
      "(conv(substring(md5(concat(cast(id as string), '_', cast(d as string))), 1, 6), 16, 10) " +
      "/ 8388608.0) - 1.0)")
    // materialize the corpus as plain parquet FIRST so the on-the-fly path
    // reads stored vectors like a real corpus (not re-deriving the synthetic
    // generator expression per query — that would overstate the index win)
    val rawPath = "/tmp/graft-annidx-bench/raw"
    spark.range(n).select(col("id").as("vid"),
        vecExpr.cast("array<double>").as("v"))
      .write.mode("overwrite").parquet(rawPath)
    val emb = spark.read.parquet(rawPath)
    val q = (0 until dim).map(d => math.sin(d * 1.7) * 0.8)

    val path = "/tmp/graft-annidx-bench/idx"
    val t0 = System.nanoTime()
    AnnIndex.buildLsh(emb, "vid", col("v"), dim, path)
    println(f"[annidx] build over $n rows: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    for (probes <- Seq(1, 4)) {
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        val tf = System.nanoTime()
        AnnSearch.lshTopK(emb, "vid", col("v"), dim, q, 10, probes = probes).count()
        val fly = (System.nanoTime() - tf) / 1e9
        val ti = System.nanoTime()
        AnnIndex.lshTopK(spark, path, "vid", q, 10, probes = probes).count()
        val idx = (System.nanoTime() - ti) / 1e9
        println(f"[annidx] probes=$probes rep$i: on-the-fly $fly%.3f s, index $idx%.3f s")
      }
    }
    spark.stop()
  }
}
