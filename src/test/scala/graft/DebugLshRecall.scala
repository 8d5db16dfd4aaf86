package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnSearch

/** Measured 2026-08-13 (sf0.1, 64-dim, seed 42): raw-corpus recall@10 rises
  * monotonically with probes (nBits=4: 0.10 / 0.20 / 0.50 / 0.90 / 1.00 at
  * probes 1/2/4/8/16) but the synthetic embeddings are near-random, so no
  * config reaches 0.9 at probes=4 on raw data. With planted near-neighbors
  * (amp=0.05 noise, cos ~ 0.995) at nBits=8: probes=1 -> 0.50, probes=2 ->
  * 0.70, probes=4 -> 1.00 — the calibration behind the assertions in
  * ExactFlagAndIvfSpec.
  *
  * One-off measurement harness: recall@10 of the multi-probe LSH path vs
  * brute force across (nBits, probes) on the synthetic embeddings. Run via
  * `sbt "testOnly graft.DebugLshRecall"`; results calibrate the assertions
  * in ExactFlagAndIvfSpec. */
class DebugLshRecall extends SparkTestBase {

  ignore("measure recall@10 across nBits x probes") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.where(col("vec_id") === 0).head.getSeq[Double](1)
      val corpus = e.where(col("vec_id") =!= 0).cache()
      val truth = AnnSearch.bruteCosineTopK(corpus, "vec_id", col("v"), q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(s"== $dir corpus=${corpus.count()}")
      for (nBits <- Seq(4, 6, 8); probes <- Seq(1, 2, 4, 8, 16)) {
        val got = AnnSearch.lshTopK(corpus, "vec_id", col("v"), 64, q,
            10, nBits, 42L, probes)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val recall = (got & truth).size / 10.0
        println(f"nBits=$nBits probes=$probes%2d recall@10=$recall%.2f")
      }
      corpus.unpersist()
    }
  }

  ignore("planted near-neighbors: recall across amp x probes") {
    val dir = "/root/testdata/sf0.1"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.where(col("vec_id") === 0).head.getSeq[Double](1)
    def noise(k: Int, i: Int): Double = {
      var z = 0x9e3779b97f4a7c15L * (k * 131L + i + 7)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) >>> 11) * (2.0 / (1L << 53)) - 1.0
    }
    for (amp <- Seq(0.02, 0.05, 0.1)) {
      val planted = (1 to 10).map { k =>
        (10000L + k, q.indices.map(i => q(i) + amp * noise(k, i)))
      }
      import spark.implicits._
      val pl = planted.toDF("vec_id", "v")
      val corpus = e.where(col("vec_id") =!= 0).union(pl).cache()
      val truth = AnnSearch.bruteCosineTopK(corpus, "vec_id", col("v"), q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(s"== amp=$amp truthPlanted=${truth.count(_ > 10000L)}")
      for (probes <- Seq(1, 2, 4, 8)) {
        val got = AnnSearch.lshTopK(corpus, "vec_id", col("v"), 64, q,
            10, 8, 42L, probes)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(f"amp=$amp probes=$probes%2d recall@10=${(got & truth).size / 10.0}%.2f")
      }
      corpus.unpersist()
    }
  }
}
