package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement aid (r17): break an LSH index build into compute vs
  * write/commit cost at a given SF. Usage:
  *   Test/runMain graft.DebugIndexBuild <sfDir> */
object DebugIndexBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("IDX_COMMITTER", "1"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.operators.Dedup.spread(
        spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .where(col("vec_id") % 2 === 0)
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"IDXBUILD $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm up scan+codegen
    e.write.format("noop").mode("overwrite").save()
    time("signature+repartition (noop)") {
      e.select(col("vec_id"), col("v"),
          graft.operators.AnnSearch.signatureRandom(col("v"), 64, 8, 42L).as("bucket"))
        .repartition(col("bucket"))
        .write.format("noop").mode("overwrite").save()
    }
    val base = java.nio.file.Files.createTempDirectory("graft-idxbuild").toString
    (1 to 3).foreach { i =>
      time(s"buildLsh full #$i") {
        graft.operators.AnnIndex.buildLsh(e, "vec_id", col("v"), 64,
          s"$base/lsh$i", nBits = 8)
      }
    }
    time("read-back listing + count") {
      println("IDXBUILD rows=" +
        spark.read.parquet(s"$base/lsh1/bands" match {
          case p if new java.io.File(p).exists => p
          case _ => s"$base/lsh1"
        }).count())
    }
    spark.stop()
  }
}
