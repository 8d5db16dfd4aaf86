package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/webp_anim.parquet` (media payloads) and
  * `fixtures/webp_anim_frames.parquet` (expected per-tick hash rows) —
  * committed ground truth for the q_webp_anim_frames / q_webp_anim_neardup
  * oracles.
  *
  * The animated payloads come from `fixtures/webp_anim_golden.parquet`
  * (tools/webp_anim_golden.py): each frame's VP8L stream is REAL libwebp
  * encoder output over generator-known pixels, individually round-trip
  * verified against libwebp's still decoder; the ANMF assembly follows the
  * public container spec (honest subset: full-canvas, no-blend). Expected
  * hashes are computed HERE from the known RGBA with the standalone
  * aHash/dHash arithmetic ([[GenImagePhashFixture]]) over an independent
  * re-statement of the sampling schedule (cumulative ANMF durations,
  * last-frame-at-or-before-tick) — the engine's hash-match proves the
  * container walk, the VP8L frame decode, and the grids end to end.
  *
  * Refusal rows (sub-canvas frame, alpha-blend frame, lossy frame,
  * garbage) must take the one-marker-row undecoded branch.
  *
  * Run once: `sbt "Test/runMain graft.GenWebpAnimFixture"`, commit both
  * parquets. Deterministic: everything derives from the committed golden.
  */
object GenWebpAnimFixture {

  final case class MediaRow(media_id: Long, kind: String, data: Array[Byte])
  final case class FrameRow(media_id: Long, frame_idx: Int, ts_ms: Long,
      decoded: Boolean, ahash: Option[Long], dhash: Option[Long])

  val EveryMs = 100L // the oracle queries' sampling cadence

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-webp-anim-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    val golden = spark.read.parquet("fixtures/webp_anim_golden.parquet")
      .collect().map { r =>
        r.getAs[String]("name") -> (r.getAs[Int]("width"),
          r.getAs[Int]("height"),
          r.getAs[scala.collection.Seq[Int]]("durations_ms").toSeq,
          r.getAs[Array[Byte]]("webp"), r.getAs[Array[Byte]]("frames_rgba"))
      }.toMap

    def framePx(rgba: Array[Byte], w: Int, h: Int, j: Int): Array[Array[Int]] =
      Array.tabulate(h, w) { (y, x) =>
        val i = 4 * ((j * h + y) * w + x)
        ((rgba(i) & 0xff) << 16) | ((rgba(i + 1) & 0xff) << 8) |
          (rgba(i + 2) & 0xff)
      }

    /** Independent schedule re-statement: frame starts = cumulative
      * durations; tick i (at i * EveryMs) shows the LAST frame whose
      * start <= the tick time; n = total / EveryMs + 1. */
    def expectedTicks(id: Long, name: String): Seq[FrameRow] = {
      val (w, h, durs, _, rgba) = golden(name)
      val starts = durs.scanLeft(0L)(_ + _.toLong)
      val total = starts.last
      val n = (total / EveryMs + 1).toInt
      (0 until n).map { i =>
        val ts = i * EveryMs
        val fi = math.min(starts.count(_ <= ts) - 1, durs.length - 1)
        val px = framePx(rgba, w, h, fi)
        FrameRow(id, i, ts, decoded = true,
          Some(GenImagePhashFixture.expectedAHash(px)),
          Some(GenImagePhashFixture.expectedDHash(px)))
      }
    }

    val anims = Seq(1L -> "anim_base", 2L -> "anim_trim",
      3L -> "anim_vardur", 4L -> "anim_single")
    val media = anims.map { case (id, name) =>
      MediaRow(id, "webp", golden(name)._4)
    } ++ Seq(
      MediaRow(10L, "webp", golden("refuse_subcanvas")._4),
      MediaRow(11L, "webp", golden("refuse_blend")._4),
      MediaRow(12L, "webp", golden("refuse_lossy")._4),
      MediaRow(13L, "bin", Array.tabulate[Byte](48)(i => (i * 11).toByte)))

    val frames = anims.flatMap { case (id, name) => expectedTicks(id, name) } ++
      Seq(10L, 11L, 12L, 13L).map(id =>
        FrameRow(id, 0, 0L, decoded = false, None, None))

    // sanity: the trim twin must share >= 2 aligned frame hashes with the
    // base on ONE diagonal, so the near-dup oracle is non-trivial
    val base = frames.filter(_.media_id == 1L).map(r => r.frame_idx -> r.dhash.get)
    val trim = frames.filter(_.media_id == 2L).map(r => r.frame_idx -> r.dhash.get)
    val diag = (for {
      (pa, ha) <- base; (pb, hb) <- trim
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield pa - pb).groupBy(identity).view.mapValues(_.size)
    require(diag.values.exists(_ >= 2),
      s"no diagonal reaches minMatch 2: $diag")
    println(s"trim diagonals: ${diag.toMap}")

    def writeOne(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
      val part = new java.io.File(out + ".dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(out + ".dir"))
    }
    writeOne(media.toDF(), "fixtures/webp_anim.parquet")
    writeOne(frames.toDF(), "fixtures/webp_anim_frames.parquet")
    println(s"wrote ${media.size} media rows, ${frames.size} frame rows")
    spark.stop()
  }
}
