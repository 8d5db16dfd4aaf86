package graft

import org.apache.spark.sql.SparkSession

/** Operational CLI for the persisted indexes — the spark-submit entry point
  * for the maintenance actions an operator schedules against a serving
  * deployment without writing Scala (the reference ships its operations as
  * runnable mains; this build's index lifecycle deserves the same):
  *
  * {{{
  * spark-submit --class graft.IndexTool app.jar compact <path> [--through N]
  * spark-submit --class graft.IndexTool app.jar compact-band <path> [--through N]
  * spark-submit --class graft.IndexTool app.jar compact-fp <path> [--through N]
  * spark-submit --class graft.IndexTool app.jar compact-sink <path> [--through N]
  * spark-submit --class graft.IndexTool app.jar recall <path> <idCol> [--k 10] [--nprobe 4] [--sample 32]
  * spark-submit --class graft.IndexTool app.jar recall-pq <path> <idCol> --source <parquet> [--vec embedding]
  * spark-submit --class graft.IndexTool app.jar rebuild <path> <idCol> [--iters 10] [--train-pct 100]
  * spark-submit --class graft.IndexTool app.jar recover <path>
  * spark-submit --class graft.IndexTool app.jar bloom <path> [--fpp 0.01]
  * }}}
  *
  * `compact` folds an ANN index's streamed batch partitions into the base;
  * `compact-band` / `compact-fp` / `compact-sink` are the dedup-index and
  * emission-sink twins. `recall` prints the served recall@k of an ANN index
  * on a stored-vector sample (the drift gauge; exits nonzero below
  * `--min`, so a cron can alert). `rebuild` re-trains an IVF quantizer
  * from the stored vectors and atomically swaps. `recover` repairs a
  * compaction swap interrupted by a crash (every library entry point does
  * this automatically — the command exists for explicit operator runbooks).
  * `bloom` builds/refreshes a fingerprint index's Bloom prefilter sidecar
  * ([[graft.operators.Dedup.writeFingerprintBloom]]) so the ingestion
  * loops' exact-dedup check skips the stored-index scan on novel batches.
  * All actions assume ingestion streams are stopped cleanly, except
  * `recall`, which serves concurrently by design. Prints one JSON line per
  * action for log scraping. */
object IndexTool {

  private def opt(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(2) }
    val spark = SparkSession.builder()
      .appName(s"graft-index-tool-${args.head}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    try {
      val rc = run(spark, args)
      if (rc != 0) sys.exit(rc)
    } finally spark.stop()
  }

  /** Package-visible so the spec can drive commands against a test
    * session; returns the process exit code. */
  private[graft] def run(spark: SparkSession, args: Array[String]): Int = {
    val through = opt(args, "--through").map(_.toLong)
    // positional operand count per action: a forgotten <path>/<idCol> must
    // print usage and exit 2, not throw ArrayIndexOutOfBounds at an
    // operator mid-runbook
    val needed = args.head match {
      case "recall" | "recall-pq" | "rebuild" => 3
      case _ => 2
    }
    if (args.length < needed || args.take(needed).exists(_.startsWith("--"))) {
      System.err.println(s"missing operand for '${args.head}'\n$usage")
      return 2
    }
    args.head match {
      case "compact" =>
        graft.operators.AnnIndex.compact(spark, args(1), through)
        println(s"""{"action":"compact","path":"${args(1)}"}"""); 0
      case "compact-band" =>
        graft.operators.Dedup.compactBandIndex(spark, args(1), through)
        println(s"""{"action":"compact-band","path":"${args(1)}"}"""); 0
      case "compact-fp" =>
        graft.operators.Dedup.compactFingerprintIndex(spark, args(1), through)
        println(s"""{"action":"compact-fp","path":"${args(1)}"}"""); 0
      case "compact-sink" =>
        graft.streaming.StreamOps.compactSink(spark, args(1), through)
        println(s"""{"action":"compact-sink","path":"${args(1)}"}"""); 0
      case "recall" =>
        val k = opt(args, "--k").fold(10)(_.toInt)
        val nProbe = opt(args, "--nprobe").fold(4)(_.toInt)
        val sample = opt(args, "--sample").fold(32)(_.toInt)
        val min = opt(args, "--min").fold(0.0)(_.toDouble)
        val r = graft.operators.AnnIndex.recallProbe(spark, args(1), args(2),
          k, nProbe, sample)
        println(s"""{"action":"recall","path":"${args(1)}","k":$k,""" +
          s""""nprobe":$nProbe,"recall":$r}""")
        if (r < min) 3 else 0
      case "rebuild" =>
        val iters = opt(args, "--iters").fold(10)(_.toInt)
        val trainPct = opt(args, "--train-pct").fold(100)(_.toInt)
        graft.operators.AnnIndex.rebuild(spark, args(1), args(2), iters, trainPct)
        println(s"""{"action":"rebuild","path":"${args(1)}"}"""); 0
      case "recall-pq" =>
        val src = opt(args, "--source").getOrElse {
          System.err.println(s"recall-pq needs --source <parquet>\n$usage")
          return 2
        }
        val vecCol = opt(args, "--vec").getOrElse("embedding")
        val k = opt(args, "--k").fold(10)(_.toInt)
        val nProbe = opt(args, "--nprobe").fold(4)(_.toInt)
        val sample = opt(args, "--sample").fold(32)(_.toInt)
        val min = opt(args, "--min").fold(0.0)(_.toDouble)
        val r = graft.operators.AnnIndex.ivfPqRecallProbe(spark, args(1),
          spark.read.parquet(src), args(2),
          org.apache.spark.sql.functions.col(vecCol).cast("array<double>"),
          k, nProbe, sample)
        println(s"""{"action":"recall-pq","path":"${args(1)}","k":$k,""" +
          s""""nprobe":$nProbe,"recall":$r}""")
        if (r < min) 3 else 0
      case "recover" =>
        graft.operators.IndexIO.recoverSwap(spark, args(1))
        println(s"""{"action":"recover","path":"${args(1)}"}"""); 0
      case "bloom" =>
        val fpp = opt(args, "--fpp").fold(0.01)(_.toDouble)
        graft.operators.Dedup.writeFingerprintBloom(spark, args(1), fpp)
        println(s"""{"action":"bloom","path":"${args(1)}","fpp":$fpp}"""); 0
      case other =>
        System.err.println(s"unknown action '$other'\n$usage"); 2
    }
  }

  private val usage =
    """usage: IndexTool <action> <path> [args]
      |  compact | compact-band | compact-fp | compact-sink <path> [--through N]
      |  recall <path> <idCol> [--k 10] [--nprobe 4] [--sample 32] [--min 0.0]
      |  recall-pq <path> <idCol> --source <parquet> [--vec embedding] [--k 10] [--nprobe 4] [--sample 32] [--min 0.0]
      |  rebuild <path> <idCol> [--iters 10] [--train-pct 100]
      |  recover <path>
      |  bloom <path> [--fpp 0.01]""".stripMargin
}
