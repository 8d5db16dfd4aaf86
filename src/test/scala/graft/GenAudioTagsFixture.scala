package graft

import java.io.ByteArrayOutputStream

import scala.util.chaining._

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/audio_tags.parquet` — committed ground
  * truth for the q_audio_tags oracle. Each row is a REAL ID3v2 tag
  * hand-built per the published id3.org layouts (v2.3 plain-u32 and v2.4
  * syncsafe frame sizes, ISO-8859-1 / UTF-16-with-BOM / UTF-8 text
  * encodings, unknown binary frames the parser must skip by size, NUL
  * terminators), prepended to MPEG audio frame bytes; expected strings
  * are the ones the generator wrote. Corrupt/untagged rows prove the
  * degrade contract. Run once:
  * `sbt "Test/runMain graft.GenAudioTagsFixture"`, commit the parquet. */
object GenAudioTagsFixture {

  private def ss28(v: Int): Array[Byte] = Array(
    ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
    ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
  private def u32(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Unsynchronisation ENCODE per id3.org: insert a 0x00 after every 0xFF
    * byte (the conservative form every decoder must accept — exactly
    * invertible by stripping the 0x00 of each FF 00 pair). */
  def unsyncEnc(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    b.foreach { x => out.write(x); if ((x & 0xff) == 0xff) out.write(0) }
    out.toByteArray
  }

  /** One text frame: id + size (version-appropriate) + 2 flag bytes +
    * encoding byte + encoded text (+ optional NUL terminator).
    * `unsyncFrame` (v2.4 only) sets format flag 0x02 and stores the
    * payload unsync-ENCODED, with the size field counting the on-disk
    * (encoded) bytes as the spec requires. */
  def textFrame(id: String, text: String, enc: Int, v24: Boolean,
      nulTerm: Boolean = false, unsyncFrame: Boolean = false): Array[Byte] = {
    require(!unsyncFrame || v24, "per-frame unsync is a v2.4 feature")
    val encoded = enc match {
      case 0 => text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      case 1 => // UTF-16 with BOM (the JDK writes the BOM for UTF-16)
        text.getBytes(java.nio.charset.StandardCharsets.UTF_16)
      case 3 => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case _ => sys.error(s"unsupported enc $enc")
    }
    val term: Array[Byte] =
      if (!nulTerm) Array.emptyByteArray
      else if (enc == 1) Array(0, 0) else Array(0)
    val decoded = enc.toByte +: (encoded ++ term)
    val payload = if (unsyncFrame) unsyncEnc(decoded) else decoded
    id.getBytes("US-ASCII") ++
      (if (v24) ss28(payload.length) else u32(payload.length)) ++
      Array[Byte](0, if (unsyncFrame) 0x02 else 0) ++ payload
  }

  /** A whole ID3v2 tag (version 3 or 4) followed by MPEG frame bytes.
    * `ext` prepends the version's extended header (v2.3: plain-u32 size
    * EXCLUDING its own 4 size bytes; v2.4: syncsafe size INCLUDING all
    * its bytes) and sets header flag 0x40. `unsync` sets header flag
    * 0x80 and, for v2.3, unsync-encodes the WHOLE tag body (frame
    * headers included) as that version's spec prescribes; v2.4 callers
    * combine it with per-frame-encoded frames ([[textFrame]]'s
    * `unsyncFrame`), since v2.4 unsynchronisation is per-frame. */
  def tagged(frames: Seq[Array[Byte]], v24: Boolean,
      ext: Boolean = false, unsync: Boolean = false): Array[Byte] = {
    val extBytes: Array[Byte] =
      if (!ext) Array.emptyByteArray
      else if (v24) ss28(6) ++ Array[Byte](1, 0) // size=6 incl, 1 flag byte
      else u32(6) ++ Array[Byte](0, 0, 0, 0, 0, 0) // 2 flags + u32 padding
    val raw = extBytes ++ frames.toArray.flatten
    val body = if (unsync && !v24) unsyncEnc(raw) else raw
    val out = new ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(if (v24) 4 else 3); out.write(0)
    out.write((if (unsync) 0x80 else 0) | (if (ext) 0x40 else 0))
    out.write(ss28(body.length))
    out.write(body)
    // a sliver of MPEG audio so the payload is a plausible mp3
    out.write(Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00))
    (0 until 64).foreach(i => out.write(i * 7 & 0xff))
    out.toByteArray
  }

  /** One ID3v2.2 text frame: 3-char id + 24-bit size + encoding byte +
    * text (v2.2 has no frame flag bytes). */
  def textFrame22(id: String, text: String, enc: Int): Array[Byte] = {
    require(id.length == 3)
    val encoded = enc match {
      case 0 => text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      case 1 => text.getBytes(java.nio.charset.StandardCharsets.UTF_16)
      case _ => sys.error(s"v2.2 has no enc $enc")
    }
    val payload = enc.toByte +: encoded
    id.getBytes("US-ASCII") ++ Array(
      ((payload.length >> 16) & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte,
      (payload.length & 0xff).toByte) ++ payload
  }

  /** A whole ID3v2.2 tag (6-byte frame headers, optional whole-tag
    * unsynchronisation) followed by MPEG frame bytes. */
  def tagged22(frames: Seq[Array[Byte]], unsync: Boolean = false): Array[Byte] = {
    val raw = frames.toArray.flatten
    val body = if (unsync) unsyncEnc(raw) else raw
    val out = new ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(2); out.write(0)
    out.write(if (unsync) 0x80 else 0)
    out.write(ss28(body.length))
    out.write(body)
    out.write(Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00))
    (0 until 64).foreach(i => out.write(i * 7 & 0xff))
    out.toByteArray
  }

  /** An opaque binary frame (APIC-like) the parser must skip by size. */
  def binaryFrame(v24: Boolean): Array[Byte] = {
    val payload = Array.tabulate[Byte](48)(i => (i * 11).toByte)
    "APIC".getBytes("US-ASCII") ++
      (if (v24) ss28(payload.length) else u32(payload.length)) ++
      Array[Byte](0, 0) ++ payload
  }

  final case class TagRow(media_id: Long, kind: String, data: Array[Byte],
      has_tags: Boolean, title: Option[String], artist: Option[String],
      album: Option[String])

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-audio-tags-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    val rows = Seq(
      // v2.3, ISO-8859-1, all three frames
      TagRow(1L, "mp3", tagged(Seq(
          textFrame("TIT2", "Morning Sun", 0, v24 = false),
          textFrame("TPE1", "The Examples", 0, v24 = false),
          textFrame("TALB", "Field Notes", 0, v24 = false)), v24 = false),
        has_tags = true, Some("Morning Sun"), Some("The Examples"),
        Some("Field Notes")),
      // v2.4 syncsafe, UTF-8 with non-ASCII, an APIC blob BEFORE the text
      // frames (skip-by-size), NUL-terminated strings
      TagRow(2L, "mp3", tagged(Seq(
          binaryFrame(v24 = true),
          textFrame("TIT2", "Café Noir", 3, v24 = true, nulTerm = true),
          textFrame("TPE1", "Müller", 3, v24 = true, nulTerm = true)),
          v24 = true),
        has_tags = true, Some("Café Noir"), Some("Müller"), None),
      // v2.3, UTF-16 with BOM
      TagRow(3L, "mp3", tagged(Seq(
          textFrame("TIT2", "Nocturne", 1, v24 = false),
          textFrame("TALB", "Nuits", 1, v24 = false)), v24 = false),
        has_tags = true, Some("Nocturne"), None, Some("Nuits")),
      // no tag at all: bare MPEG frame bytes
      TagRow(4L, "mp3",
        Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0) ++
          Array.tabulate[Byte](40)(i => (i * 3).toByte),
        has_tags = false, None, None, None),
      // corrupt: first frame declares a size past the tag end — no frame
      // parses, degrade to untagged
      TagRow(5L, "mp3", {
        val good = tagged(Seq(textFrame("TIT2", "X", 0, v24 = false)), v24 = false)
        // inflate the frame's u32 size field (tag offset 10 + 4 = 14)
        good.updated(14, 0x7f.toByte)
      }, has_tags = false, None, None, None),
      // v2.3 with EXTENDED HEADER + whole-tag UNSYNCHRONISATION: the
      // UTF-16 BOM (FF FE) forces real FF->FF 00 encoding, and 'ÿ'
      // (0xFF in ISO-8859-1) plants an FF inside text too — both common
      // on older real-world MP3s, both previously degraded to untagged
      TagRow(6L, "mp3", tagged(Seq(
          textFrame("TIT2", "Nuit Grise", 1, v24 = false),
          textFrame("TPE1", "ÿell", 0, v24 = false)),
          v24 = false, ext = true, unsync = true),
        has_tags = true, Some("Nuit Grise"), Some("ÿell"), None),
      // v2.4 with EXTENDED HEADER and a PER-FRAME unsynchronised UTF-16
      // frame (format flag 0x02, on-disk size counts encoded bytes)
      TagRow(7L, "mp3", tagged(Seq(
          textFrame("TALB", "Voilà", 1, v24 = true, unsyncFrame = true),
          textFrame("TPE1", "Quartet", 3, v24 = true)),
          v24 = true, ext = true),
        has_tags = true, None, Some("Quartet"), Some("Voilà")),
      // v2.4 with the GLOBAL unsync flag (spec: every frame is then
      // unsync-encoded even without its own 0x02 bit set)
      TagRow(8L, "mp3", {
        val f = textFrame("TIT2", "Søvn", 1, v24 = true)
        // encode the payload but leave the per-frame flag clear: the
        // header flag alone must drive the decode. Rebuild by hand:
        val hdr = f.take(10)
        val enc = unsyncEnc(f.drop(10))
        hdr.take(4) ++ ss28(enc.length) ++ hdr.slice(8, 10) ++ enc
      }.pipe(f => tagged(Seq(f), v24 = true, unsync = true)),
        has_tags = true, Some("Søvn"), None, None),
      // a SECOND clip by row 1's artist: the per-artist cap stage of the
      // multimodal pipeline (q_pipeline_mm) must keep exactly one of the
      // two "The Examples" rows — without a repeated artist the cap
      // would be indistinguishable from a no-op
      TagRow(9L, "mp3", tagged(Seq(
          textFrame("TIT2", "Evening Sun", 0, v24 = false),
          textFrame("TPE1", "The Examples", 0, v24 = false)), v24 = false),
        has_tags = true, Some("Evening Sun"), Some("The Examples"), None),
      // ID3v2.2 (ancient iTunes-era files): 3-char frame ids, 6-byte
      // headers, UCS-2 text, whole-tag unsynchronisation
      TagRow(10L, "mp3", tagged22(Seq(
          textFrame22("TT2", "Vieux Morceau", 1),
          textFrame22("TP1", "Les Anciens", 0),
          textFrame22("TAL", "Archives", 0)), unsync = true),
        has_tags = true, Some("Vieux Morceau"), Some("Les Anciens"),
        Some("Archives")))

    // engine round-trip assert is the SPEC's job; here only structural
    // sanity: tags declared where written
    rows.filter(_.has_tags).foreach(r =>
      require(r.data.startsWith("ID3".getBytes("US-ASCII"))))

    val out = "fixtures/audio_tags.parquet"
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(out + ".dir")
    val part = new java.io.File(out + ".dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    println(s"wrote $out with ${rows.size} rows")
    spark.stop()
  }
}
