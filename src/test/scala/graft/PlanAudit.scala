// Throwaway plan audit (not part of the library): prints the formatted
// physical plans of the round's new operators so the shuffle/codegen
// posture can be eyeballed. Run:
//   sbt -batch "runMain graft.tools.PlanAudit"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val w = graft.functions.NativeKernels.wordTokens(col("text"))

    println("=== rand_proj ===")
    graft.operators.Embeddings.project(emb, col("vec_id"),
      col("embedding").cast("array<double>"), 64, 16)
      .explain("formatted")

    val path = "/tmp/plan-audit-lm"
    graft.operators.BigramLm.fit(spark, docs.where(col("lang") === "en"), w, path)
    println("=== lm_score ===")
    graft.operators.BigramLm.score(spark, docs, col("doc_id"), w, path)
      .explain("formatted")

    println("=== profile (one shuffle, map-side sketch partials) ===")
    graft.operators.Profile.partialProfile(docs, Seq(col("lang")),
      col("text"), w).explain("formatted")
    println("=== overlap (two scans, 1x1 sketch cross) ===")
    graft.operators.Profile.overlap(docs, col("text"),
      docs.where(col("doc_id") % 2 === 0), col("text")).explain("formatted")
    println("=== hammingPairs (band equi-join, verify inside) ===")
    val sigs = emb.select(col("vec_id").as("id"),
      (col("vec_id") * 2654435761L).as("sig"))
    graft.operators.Dedup.hammingPairs(sigs, "id", "sig").explain("formatted")
    spark.stop()
  }
}
