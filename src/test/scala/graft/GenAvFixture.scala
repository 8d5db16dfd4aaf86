package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/multimodal_av.parquet` — committed
  * ground truth for the q_multimodal_av oracle, the audio/video sibling of
  * [[GenMultimodalFixture]]. Each row is a REAL container header the
  * engine must parse ([[graft.multimodal.Multimodal.parseAvMeta]]):
  *
  *  - WAV rows are written by the JDK's own `AudioSystem` WAVE encoder (an
  *    INDEPENDENT implementation, like ImageIO for the image fixture), at
  *    varying sample rates / channel counts / lengths;
  *  - MP4 rows are ISO-BMFF box trees built per 14496-12's published
  *    layouts (no JDK MP4 encoder exists): ftyp + moov(mvhd + audio trak +
  *    video trak) + mdat, exercising version-0 AND version-1
  *    mvhd/tkhd, moov-before-mdat AND moov-after-mdat (non-faststart)
  *    orders, and an audio trak FIRST so the parser must skip 0-width
  *    tracks;
  *  - corrupt rows (truncated mid-box, bad chunk size) carry the
  *    documented stub-formula ground truth — a 100 TB ingest will contain
  *    them and the decode must degrade, not throw.
  *
  * Run once: `sbt "Test/runMain graft.GenAvFixture"`, commit the parquet.
  * Deterministic: seeded content, fixed sizes, one output file. */
object GenAvFixture {

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** Identity transform matrix (9 x 32-bit fixed-point). */
  private val matrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
    be32(0) ++ be32(0x00010000L) ++ be32(0) ++
    be32(0) ++ be32(0) ++ be32(0x40000000L)

  private def mvhd(version: Int, timescale: Long, duration: Long): Array[Byte] = {
    val times = if (version == 1) be64(0) ++ be64(0) else be32(0) ++ be32(0)
    val dur = if (version == 1) be64(duration) else be32(duration)
    box("mvhd", Array[Byte](version.toByte, 0, 0, 0) ++ times ++
      be32(timescale) ++ dur ++
      be32(0x00010000L) ++ be16(0x0100) ++ new Array[Byte](10) ++ matrix ++
      new Array[Byte](24) ++ be32(2)) // pre_defined + next_track_ID
  }

  private def tkhd(version: Int, trackId: Long, w: Int, h: Int): Array[Byte] = {
    val times = if (version == 1) be64(0) ++ be64(0) else be32(0) ++ be32(0)
    val dur = if (version == 1) be64(0) else be32(0)
    box("tkhd", Array[Byte](version.toByte, 0, 0, 7) ++ times ++
      be32(trackId) ++ be32(0) ++ dur ++ new Array[Byte](8) ++
      be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ matrix ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16)) // 16.16 fixed-point
  }

  /** Package-visible so MultimodalSpec can drive the same independent box
    * builder against the parser. */
  private[graft] def mp4(version: Int, timescale: Long, duration: Long, w: Int, h: Int,
      moovFirst: Boolean): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200) ++
      "isomiso2".getBytes("US-ASCII"))
    // audio trak FIRST (width 0x0): the parser must skip it for dimensions
    val moov = box("moov", mvhd(version, timescale, duration) ++
      box("trak", tkhd(version, 1, 0, 0)) ++
      box("trak", tkhd(version, 2, w, h)))
    val mdat = box("mdat", Array.tabulate(64)(i => (i * 7).toByte))
    if (moovFirst) ftyp ++ moov ++ mdat else ftyp ++ mdat ++ moov
  }

  private def wav(sampleRate: Int, channels: Int, nFrames: Int, seed: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    new scala.util.Random(seed).nextBytes(pcm)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-av-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._
    // (media_id, kind, data, container, width, height, duration_ms, sample_rate, channels)
    val rows = (0 until 40).map { i =>
      def stub(kind: String, data: Array[Byte]) = {
        val n = data.length.toLong
        (i.toLong, kind, data, "opaque",
          16 + (n % 64).toInt, 16 + (n % 48).toInt, n % 10000L, 0, 0)
      }
      i % 4 match {
        case 0 => // MP4, varying geometry/timescale, both box orders/versions
          val (w, h) = (160 + (i * 37) % 1800, 120 + (i * 23) % 1000)
          val ts = Seq(600L, 1000L, 90000L)(i / 4 % 3)
          val dur = ts * (3 + i) + i * 11 // non-integral seconds
          val v = (i / 4) % 2
          val data = mp4(v, ts, dur, w, h, moovFirst = i % 8 == 0)
          (i.toLong, "video", data, "mp4", w, h, dur * 1000L / ts, 0, 0)
        case 1 => // WAV via the JDK encoder, varying rate/channels/length
          val sr = Seq(8000, 16000, 22050, 44100, 48000)(i / 4 % 5)
          val ch = 1 + (i / 4) % 2
          val nFrames = sr / 5 + i * 41 // ~0.2 s + jitter
          val data = wav(sr, ch, nFrames, 500 + i)
          val byteRate = sr * ch * 2
          (i.toLong, "audio", data, "wav", 0, 0,
            nFrames.toLong * ch * 2 * 1000L / byteRate, sr, ch)
        case 2 => // truncated MP4 (cut mid-moov): must stub, not throw
          val full = mp4(0, 1000L, 4321L, 640, 480, moovFirst = true)
          stub("video", full.take(full.length / 3))
        case _ => // seeded opaque bytes: the plain stub path
          val rnd = new scala.util.Random(2000 + i)
          val data = Array.ofDim[Byte](120 + i * 17)
          rnd.nextBytes(data)
          stub("video", data)
      }
    }
    val out = "fixtures/multimodal_av.parquet"
    rows.toDF("media_id", "kind", "data", "container", "width", "height",
        "duration_ms", "sample_rate", "channels")
      .coalesce(1).write.mode("overwrite").parquet(out + ".dir")
    val part = new java.io.File(out + ".dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    println(s"wrote $out with ${rows.size} rows")
    spark.stop()
  }
}
