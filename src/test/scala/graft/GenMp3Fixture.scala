package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/audio_mp3.parquet` — committed ground
  * truth for the q_mp3_frames oracle. Each parseable row is a sequence
  * of REAL MPEG-audio frame headers hand-built per the published layout
  * (11-bit sync, version/layer/bitrate/samplerate/mode fields), each
  * frame padded with zeros to its EXACT spec length (spf/8 x bitrate /
  * sampleRate), so the engine's frame walk must land on every following
  * header precisely. Expected columns (frame count, duration summed from
  * per-frame sample counts, bitrate range, the VBR flag) are computed
  * HERE from the frames the generator chose — the VBR row is the case
  * the single-header CBR duration estimate gets wrong. Corrupt /
  * trailing-junk / truncated rows prove the stop-and-report contract.
  * Run once: `sbt "Test/runMain graft.GenMp3Fixture"`, commit. */
object GenMp3Fixture {

  private val Br1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Br2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Sr1 = Array(44100, 48000, 32000)
  private val Sr2 = Array(22050, 24000, 16000)

  /** One Layer III frame: 4-byte header + zero payload of exact length. */
  def frame(mpeg1: Boolean, kbps: Int, srIdx: Int, mono: Boolean): Array[Byte] = {
    val brIdx = (if (mpeg1) Br1 else Br2).indexOf(kbps)
    require(brIdx > 0, s"kbps $kbps not in table")
    val sr = (if (mpeg1) Sr1 else Sr2)(srIdx)
    val spf = if (mpeg1) 1152 else 576
    val len = ((spf / 8) * (kbps * 1000L) / sr).toInt // pad bit 0
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = (0xe0 | ((if (mpeg1) 3 else 2) << 3) | (1 << 1) | 1).toByte
    b(2) = ((brIdx << 4) | (srIdx << 2)).toByte
    b(3) = (((if (mono) 3 else 0) << 6) | 0x04).toByte // mode, private bits 0
    // non-zero body bytes so a frame body cannot fake the next header
    var i = 4
    while (i < len) { b(i) = ((i * 7) & 0x7f).toByte; i += 1 }
    b
  }

  /** A minimal ID3v2.3 tag of `padding` zero bytes the walk must skip. */
  def id3(padding: Int): Array[Byte] = {
    def ss(v: Int) = Array(((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
      ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++ ss(padding) ++
      new Array[Byte](padding)
  }

  final case class Mp3RowF(media_id: Long, kind: String, data: Array[Byte],
      parsed: Boolean, sample_rate: Int, channels: Int, n_frames: Long,
      duration_ms: Long, min_kbps: Int, max_kbps: Int, vbr: Boolean)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-mp3-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    def expect(id: Long, data: Array[Byte], frames: Seq[(Boolean, Int)],
        srIdx: Int, mono: Boolean): Mp3RowF = {
      val mpeg1 = frames.head._1
      val sr = (if (mpeg1) Sr1 else Sr2)(srIdx)
      val samples = frames.map { case (m1, _) => if (m1) 1152L else 576L }.sum
      Mp3RowF(id, "mp3", data, parsed = true, sr, if (mono) 1 else 2,
        frames.length.toLong, samples * 1000L / sr,
        frames.map(_._2).min, frames.map(_._2).max,
        frames.map(_._2).distinct.length > 1)
    }

    // 1: CBR MPEG1 stereo behind an ID3 tag
    val f1 = Seq.fill(20)((true, 128))
    val d1 = id3(200) ++ f1.toArray.flatMap { case (m, k) => frame(m, k, 0, mono = false) }
    // 2: VBR MPEG1 — alternating bitrates; the CBR estimate is wrong here
    val f2 = (0 until 30).map(i => (true, if (i % 2 == 0) 96 else 192))
    val d2 = f2.toArray.flatMap { case (m, k) => frame(m, k, 0, mono = false) }
    // 3: MPEG2 mono (576-sample frames)
    val f3 = Seq.fill(15)((false, 64))
    val d3 = f3.toArray.flatMap { case (m, k) => frame(m, k, 0, mono = true) }
    // 4: valid frames then trailing junk — stats over the valid prefix
    val f4 = Seq.fill(10)((true, 160))
    val d4 = f4.toArray.flatMap { case (m, k) => frame(m, k, 0, mono = false) } ++
      Array.tabulate[Byte](120)(i => (i * 3).toByte)
    // 6: truncated mid-frame — the final header still counts its frame
    val f6 = Seq.fill(5)((true, 128))
    val d6whole = f6.toArray.flatMap { case (m, k) => frame(m, k, 0, mono = false) }
    val d6 = d6whole.dropRight(100)

    val rows = Seq(
      expect(1L, d1, f1, 0, mono = false),
      expect(2L, d2, f2, 0, mono = false),
      expect(3L, d3, f3, 0, mono = true),
      expect(4L, d4, f4, 0, mono = false),
      // 5: garbage — not a single valid header
      Mp3RowF(5L, "mp3", Array.tabulate[Byte](90)(i => (i * 13 + 1).toByte),
        parsed = false, 0, 0, 0L, 0L, 0, 0, vbr = false),
      expect(6L, d6, f6, 0, mono = false))

    // structural sanity: frame lengths land each following header on 0xFF
    Seq(d2, d3).foreach { d =>
      require((d(0) & 0xff) == 0xff, "first header misplaced")
    }
    // the VBR duration differs from the CBR estimate by construction:
    // CBR at 96 kbps over d2.length bytes != the summed 783 ms
    locally {
      val r2 = rows(1)
      val cbrEst = d2.length.toLong * 8L / 96L
      require(r2.duration_ms != cbrEst,
        "VBR fixture fails to distinguish summed duration from CBR estimate")
    }

    def writeOne(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
      val part = new java.io.File(out + ".dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    }
    writeOne(rows.toDF(), "fixtures/audio_mp3.parquet")
    println(s"wrote ${rows.size} mp3 rows")
    spark.stop()
  }
}
