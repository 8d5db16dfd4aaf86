package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiler: time one named query N times (clearing the cache
  * between reps so each rep is an honest cold run) and print the plan.
  * Extra args of the form k=v are applied as spark confs. */
object DebugTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val confs = args.drop(3).map { a => val Array(k, v) = a.split("=", 2); (k, v) }
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = confs.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        println(f"[job] ${j.jobId}%3d: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    })
    spark.range(1000).selectExpr("md5(cast(id as string)) h").count()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[debugtime] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
