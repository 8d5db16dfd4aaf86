package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement aid (r17): carrier histograms of the banded-Hamming
  * operators' signature frames at a given SF — sizes the
  * Knobs.DedupHotSigCarriers threshold against real fixture data.
  * Usage: Test/runMain graft.DebugHotSig <sfDir> */
object DebugHotSig {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def hist(name: String, sigs: org.apache.spark.sql.DataFrame): Unit = {
      val h = sigs.where(col("sig").isNotNull && col("sig") =!= 0L)
        .groupBy("sig").agg(count(lit(1)).as("n"))
      val top = h.orderBy(desc("n")).limit(8).collect()
        .map(r => r.getLong(1)).mkString(",")
      val s = h.agg(max("n"), count(lit(1)), sum("n")).collect()(0)
      println(s"HOTSIG $name max=${s.getLong(0)} distinct=${s.getLong(1)} " +
        s"rows=${s.getLong(2)} top=[$top]")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    hist("simhash", docs.select(
      graft.functions.NativeKernels.simhash64(
        graft.functions.NativeKernels.wordTokens(col("text"))).as("sig")))
    spark.stop()
  }
}
