package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextKernels
import graft.operators.Dedup

/** Scratch: stage-by-stage timing of the q_pipeline plan at sf0.1. */
object DebugPipe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"[job] ${j.jobId}%3d: ${(System.nanoTime() - starts.remove(j.jobId)) / 1e9}%.3f s")
    })
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Dedup.spread(spark.read.parquet(s"$dir/documents.parquet"))
    val shinglesEarly = TextKernels.wordShingles2(TextKernels.wordTokens(col("text")))
    val cf = graft.operators.Contamination.sharedShingleCounts(
      docs, col("doc_id"), shinglesEarly, col("doc_id") < Queries.ContamEvalMax)
      .where(col("n_shared").cast("double") / col("n_shingles") >= Queries.ContamRatio)
    println(cf.queryExecution.executedPlan.toString.take(4000))
    t("contam-first")(graft.operators.Contamination.sharedShingleCounts(
      docs, col("doc_id"), shinglesEarly, col("doc_id") < Queries.ContamEvalMax)
      .where(col("n_shared").cast("double") / col("n_shingles") >= Queries.ContamRatio).count())
    val w = TextKernels.wordTokens(col("text"))
    val quality = docs.select(col("doc_id"), col("text"), size(w).cast("long").as("n_tokens"))
      .where(col("n_tokens") >= 40)
    val keepers = quality.select(col("doc_id"), TextKernels.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val survivors = quality.join(keepers, Seq("doc_id"), "left_semi").cache()
    t("survivors")(survivors.count())
    println("survivor partitions: " + survivors.rdd.getNumPartitions)
    val shingles = TextKernels.wordShingles2(TextKernels.wordTokens(col("text")))
    val pairs = t("pairs-build")(Dedup.minhashPairs(survivors, "doc_id",
      graft.functions.SimKernels.qgrams(substring(col("text"), 1, 200), 10), 0.8))
    t("pairs-count")(pairs.count())
    val losers = t("clusters")(Dedup.clusters(pairs).where(col("c") < col("n"))
      .select(col("n").as("doc_id")).cache())
    t("losers-count")(losers.count())
    val contaminated = t("contam")(graft.operators.Contamination.sharedShingleCounts(
      docs, col("doc_id"), shingles, col("doc_id") < Queries.ContamEvalMax)
      .where(col("n_shared").cast("double") / col("n_shingles") >= Queries.ContamRatio)
      .select(col("id").as("doc_id")))
    t("contam-count")(contaminated.count())
    t("final")(survivors.join(losers, Seq("doc_id"), "left_anti")
      .where(col("doc_id") >= Queries.ContamEvalMax)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens")).orderBy(col("doc_id")).count())
    spark.stop()
  }
}
