package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/webm_blocks.parquet` — committed
  * ground truth for the q_webm_blocks oracle. Each parseable row is a
  * REAL WebM/Matroska container hand-built per the published EBML layout
  * ([[GenAvFixture.webmClusters]] — Clusters of Timestamps +
  * SimpleBlocks, TrackNumber-bearing Tracks, interleaved audio blocks
  * the walk must EXCLUDE); expected columns (video block count, keyframe
  * count, last-presentation-time duration, total video payload bytes)
  * are the values the generator chose when writing the blocks. A
  * metadata-only WebM and garbage prove the refuse path. Run once:
  * `sbt "Test/runMain graft.GenWebmFixture"`, commit the parquet. */
object GenWebmFixture {

  final case class WebmRowF(media_id: Long, kind: String, data: Array[Byte],
      parsed: Boolean, video_track: Long, n_blocks: Long, n_keyframes: Long,
      duration_ms: Long, total_block_bytes: Long)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-webm-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    def expect(id: Long, tsScale: Long,
        clusters: Seq[(Long, Seq[(Int, Boolean, Int)])],
        audio: Boolean): WebmRowF = {
      val data = GenAvFixture.webmClusters(640, 360, tsScale, clusters,
        withAudioBlocks = audio)
      val blocks = clusters.flatMap { case (base, bs) =>
        bs.map { case (rel, key, n) => (base + rel, key, n.toLong) } }
      WebmRowF(id, "webm", data, parsed = true, 1L,
        blocks.length.toLong, blocks.count(_._2).toLong,
        blocks.map(_._1).max * tsScale / 1000000L,
        blocks.map(_._3).sum)
    }

    val rows = Seq(
      // 25 fps GOP-of-5 pattern over 3 clusters, audio interleaved
      expect(1L, 1000000L, Seq(
        (0L, (0 until 5).map(i => (i * 40, i == 0, 120 + i))),
        (200L, (0 until 5).map(i => (i * 40, i == 0, 130 + i))),
        (400L, (0 until 5).map(i => (i * 40, i == 0, 140 + i)))),
        audio = true),
      // every-frame-keyframe clip (screen capture shape), no audio, and a
      // NON-DEFAULT TimestampScale the duration must rescale through
      expect(2L, 500000L, Seq(
        (0L, (0 until 8).map(i => (i * 66, true, 400 + 3 * i)))),
        audio = false),
      // metadata-only webm (no clusters, no TrackNumber): refuses
      WebmRowF(3L, "webm",
        GenAvFixture.webm(1920, 1080, 5000f, 1000000L, 48000f, 2),
        parsed = false, 0L, 0L, 0L, 0L, 0L),
      // garbage
      WebmRowF(4L, "bin", Array.tabulate[Byte](77)(i => (i * 19 + 5).toByte),
        parsed = false, 0L, 0L, 0L, 0L, 0L))

    // structural sanity: the keyframe counts the generator believes
    require(rows.head.n_blocks == 15 && rows.head.n_keyframes == 3)
    require(rows(1).n_keyframes == 8 && rows(1).duration_ms == 7 * 66 / 2)

    def writeOne(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
      val part = new java.io.File(out + ".dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    }
    writeOne(rows.toDF(), "fixtures/webm_blocks.parquet")
    println(s"wrote ${rows.size} webm rows")
    spark.stop()
  }
}
