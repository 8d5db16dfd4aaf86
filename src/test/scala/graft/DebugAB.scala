package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.SimKernels
import graft.operators.{BoundFacet, RankAggregate}

/** Scratch A/B: per-facet TakeOrdered topK vs fused MultiTopM topKShared. */
object DebugAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val combos = Seq(Seq(0.4, 0.35, 0.25), Seq(0.2, 0.3, 0.5))
    val qUs = java.time.LocalDateTime.parse("1997-06-15T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

    def shared() = {
      val o = spark.read.parquet(s"$dir/orders.parquet").repartition(32)
        .select(col("o_orderkey"),
          SimKernels.absDist(col("o_totalprice"), lit(150000.0)).as("d0"),
          abs(unix_micros(col("o_orderdate").cast("timestamp")) - lit(qUs))
            .cast("double").as("d1"),
          SimKernels.jaccardDistDistinct(SimKernels.tokenize(col("o_orderpriority"), "-"),
            array(lit("1"), lit("URGENT"))).as("d2")).cache()
      (o, Seq(
        RankAggregate.SharedFacet("f0", col("d0"), combos.map(_(0))),
        RankAggregate.SharedFacet("f1", col("d1"), combos.map(_(1))),
        RankAggregate.SharedFacet("f2", col("d2"), combos.map(_(2)), jaccard = true)))
    }
    def timed(label: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"[ab] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    timed("topK(per-facet)") {
      val (o, fs) = shared()
      val bound = fs.zipWithIndex.map { case (f, i) =>
        BoundFacet(f.name, o.select(col("o_orderkey").as("id"), col(s"d$i").as("d")),
          f.weightPerCombo, f.decay, f.scale, f.jaccard) }
      RankAggregate.topK(spark, bound, 10, 10000).count()
    }
    timed("topKShared(MultiTopM)") {
      val (o, fs) = shared()
      RankAggregate.topKShared(spark, o, col("o_orderkey"), fs, 10, 10000).count()
    }
    spark.stop()
  }
}
