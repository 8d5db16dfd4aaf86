package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/ogg_pages.parquet` — committed ground
  * truth for the q_ogg_pages oracle. Each parseable row is a REAL OGG
  * stream hand-built per the RFC 3533 framing layout (page headers,
  * lacing tables with 255-continuation runs, granule positions, per-page
  * CRC-32 computed here bitwise from the spec polynomial — independent
  * of the engine's table-driven form) carrying Vorbis or Opus ID headers
  * per their published specs. Expected columns are the page/packet/
  * granule values the generator chose. A mid-stream corrupted CRC locks
  * the stop-at-last-good-page contract; a muxed second bitstream locks
  * serial filtering. Run once:
  * `sbt "Test/runMain graft.GenOggFixture"`, commit the parquet. */
object GenOggFixture {

  /** OGG CRC-32 (poly 0x04c11db7, init 0, unreflected, no xor-out),
    * bitwise — deliberately not the engine's table form. */
  def crc32ogg(b: Array[Byte]): Long = {
    var crc = 0
    b.foreach { x =>
      crc ^= (x & 0xff) << 24
      (0 until 8).foreach { _ =>
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7
          else crc << 1
      }
    }
    crc.toLong & 0xffffffffL
  }

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le64(v: Long): Array[Byte] = le32(v & 0xffffffffL) ++ le32(v >>> 32)

  /** One page: header + lacing + packet bodies, CRC patched in. */
  def page(serial: Long, seq: Long, granule: Long, headerType: Int,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = packets.flatMap { p =>
      Seq.fill(p.length / 255)(255.toByte) :+ (p.length % 255).toByte
    }
    require(lacing.length <= 255, "test builder: one lacing table per page")
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0)              // version
    out.write(headerType)
    out.write(le64(granule))
    out.write(le32(serial))
    out.write(le32(seq))
    out.write(le32(0))        // crc placeholder
    out.write(lacing.length)
    lacing.foreach(b => out.write(b & 0xff))
    packets.foreach(p => out.write(p))
    val bytes = out.toByteArray
    val crc = crc32ogg(bytes) // placeholder is zero, as the spec computes
    System.arraycopy(le32(crc), 0, bytes, 22, 4)
    bytes
  }

  /** Vorbis identification header packet (30 bytes per the spec). */
  def vorbisId(rate: Int, channels: Int): Array[Byte] =
    Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      le32(0) ++ Array(channels.toByte) ++ le32(rate.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ Array[Byte](0xb8.toByte, 1)

  /** OpusHead identification packet (19 bytes per RFC 7845). */
  def opusHead(channels: Int, preSkip: Int, inputRate: Int): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, channels.toByte) ++
      Array((preSkip & 0xff).toByte, ((preSkip >> 8) & 0xff).toByte) ++
      le32(inputRate.toLong) ++ Array[Byte](0, 0, 0)

  private def audioPacket(n: Int, seed: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((i * 31 + seed) & 0x7f).toByte)

  final case class OggRowF(media_id: Long, kind: String, data: Array[Byte],
      parsed: Boolean, codec: String, sample_rate: Int, channels: Int,
      n_pages: Long, n_packets: Long, duration_ms: Long,
      total_payload_bytes: Long)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-ogg-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    // 1: Vorbis 44.1 kHz stereo — BOS id page, a 2-packet header page,
    // three audio pages; final granule 22050 PCM samples = 500 ms; one
    // audio packet spans a 300-byte body (255-continuation lacing)
    val v1Pages = Seq(
      page(7L, 0, 0, 0x02, Seq(vorbisId(44100, 2))),
      page(7L, 1, 0, 0, Seq(audioPacket(40, 1), audioPacket(60, 2))),
      page(7L, 2, 8820L, 0, Seq(audioPacket(300, 3))),
      page(7L, 3, 17640L, 0, Seq(audioPacket(120, 4), audioPacket(80, 5))),
      page(7L, 4, 22050L, 0x04, Seq(audioPacket(90, 6))))
    val v1 = v1Pages.toArray.flatten
    val v1Payload = 30L + 40 + 60 + 300 + 120 + 80 + 90
    // 2: Opus (48 kHz granule clock), pre-skip 312; final granule 48312
    // -> exactly 1000 ms after pre-skip subtraction
    val v2Pages = Seq(
      page(9L, 0, 0, 0x02, Seq(opusHead(2, 312, 48000))),
      page(9L, 1, 24000L, 0, Seq(audioPacket(200, 7), audioPacket(150, 8))),
      page(9L, 2, 48312L, 0x04, Seq(audioPacket(180, 9))))
    val v2 = v2Pages.toArray.flatten
    val v2Payload = 19L + 200 + 150 + 180
    // 3: v1 with page 3's CRC corrupted — the walk must stop after the
    // first three verified pages (granule 8820 -> 200 ms)
    val v3 = {
      val whole = v1.clone()
      val off3 = v1Pages.take(3).map(_.length).sum
      whole(off3 + 40) = (whole(off3 + 40) ^ 0x55).toByte
      whole
    }
    // 5: a second MUXED bitstream's pages interleaved: serial filtering
    // keeps stream 7's accounting identical to row 1
    val v5 = {
      val alien = page(99L, 0, 123L, 0x02, Seq(audioPacket(50, 10)))
      val alien2 = page(99L, 1, 456L, 0, Seq(audioPacket(70, 11)))
      (v1Pages.take(2) :+ alien).toArray.flatten ++
        (v1Pages.drop(2).take(1) :+ alien2).toArray.flatten ++
        v1Pages.drop(3).toArray.flatten
    }

    val rows = Seq(
      OggRowF(1L, "ogg", v1, parsed = true, "vorbis", 44100, 2,
        5L, 7L, 500L, v1Payload),
      OggRowF(2L, "ogg", v2, parsed = true, "opus", 48000, 2,
        3L, 4L, 1000L, v2Payload),
      OggRowF(3L, "ogg", v3, parsed = true, "vorbis", 44100, 2,
        3L, 4L, 200L, 30L + 40 + 60 + 300),
      OggRowF(4L, "bin", Array.tabulate[Byte](66)(i => (i * 23 + 9).toByte),
        parsed = false, "", 0, 0, 0L, 0L, 0L, 0L),
      OggRowF(5L, "ogg", v5, parsed = true, "vorbis", 44100, 2,
        5L, 7L, 500L, v1Payload))

    def writeOne(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
      val part = new java.io.File(out + ".dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    }
    writeOne(rows.toDF(), "fixtures/ogg_pages.parquet")
    println(s"wrote ${rows.size} ogg rows")
    spark.stop()
  }
}
