package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Measurement tool (optimization rounds): run ONE declared query and print
  * its job/stage/task anatomy — number of jobs, stages, tasks, summed task
  * time vs wall time — so per-stage fixed overhead is quantifiable without
  * the Spark UI. Usage:
  *   runMain graft.QueryProbe <sfDir> <query> [reps]
  * Methodology matches Bench (noop sink, CacheScope.withScope, clearCache
  * between reps); reports each rep so warm-up effects are visible. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment confs, e.g.
    //   SPARK_GRAFT_PROBE_CONF="spark.sql.adaptive.enabled=false;k=v"
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
        shuffleReadB += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        val wall = (for { c <- s.stageInfo.completionTime; t <- s.stageInfo.submissionTime }
          yield c - t).getOrElse(-1L)
        stageRows.add((s.stageInfo.stageId, s.stageInfo.numTasks,
          s.stageInfo.taskMetrics.executorRunTime, wall,
          s.stageInfo.name.take(90)))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L
      shuffleReadB = 0L; shuffleWriteB = 0L
      val t0 = System.nanoTime()
      graft.util.CacheScope.withScope {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      println(f"[probe] $name rep=$rep wall=$wall%.3fs jobs=$jobs stages=$stages " +
        f"tasks=$tasks taskTime=${taskTimeMs / 1e3}%.2fs " +
        f"shufR=${shuffleReadB / 1e6}%.1fMB shufW=${shuffleWriteB / 1e6}%.1fMB")
      if (rep == reps) {
        import scala.jdk.CollectionConverters._
        stageRows.asScala.toSeq.sortBy(-_._4).take(18).foreach {
          case (sid, nt, rt, wl, nm) =>
            println(f"[stage] id=$sid wall=${wl / 1e3}%.2fs tasks=$nt taskTime=${rt / 1e3}%.2fs $nm")
        }
      }
      stageRows.clear()
    }
    spark.stop()
  }
}
