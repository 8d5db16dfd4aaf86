package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/multimodal_media.parquet` — committed
  * ground truth for the q_multimodal_meta oracle. Each row is a REAL encoded
  * image (PNG / GIF / JPEG via the JDK's own ImageIO writers) or a seeded
  * pseudo-random "video" payload, together with the metadata the decode
  * operator must recover: images carry the true encoded width/height
  * (n_frames 1); video rows carry the documented stub formulas. The engine
  * side must re-derive width/height by PARSING THE BYTES
  * ([[graft.multimodal.Multimodal.parseDimensions]]) — the stored columns
  * are what the writer actually encoded, so a hash-match proves the parser.
  *
  * Run once: `sbt "Test/runMain graft.GenMultimodalFixture"`, commit the
  * parquet. Deterministic: seeded content, fixed sizes, one output file.
  */
object GenMultimodalFixture {

  def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** A deterministic test-card image: size exercises 1-byte and 2-byte
    * dimension encodings (JPEG/GIF u16, PNG u32). */
  def makeImage(i: Int): BufferedImage = {
    val w = 1 + (i * 37) % 500
    val h = 1 + (i * 23) % 400
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31 + y * 17 + i * 101) * 2654435761L).toInt & 0xffffff)
    img
  }

  /** Hand-built WebP headers (the JDK ships no WebP writer): the container
    * prefix plus the first chunk carrying the dimensions — exactly the
    * bytes `parseDimensions` walks, padded with seeded "compressed data"
    * so sizes vary. Flavor per the public WebP container spec. */
  def makeWebp(flavor: String, w: Int, h: Int, seed: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le24(v: Int): Unit = { le16(v); out.write((v >> 16) & 0xff) }
    def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
    val rnd = new scala.util.Random(seed)
    val tail = Array.ofDim[Byte](20 + seed % 40)
    rnd.nextBytes(tail)
    val payload = new ByteArrayOutputStream()
    flavor match {
      case "VP8 " => // frame tag (keyframe bits zeroed), sync, 14-bit dims
        payload.write(Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a))
        payload.write(Array[Byte]((w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
          (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte))
      case "VP8L" => // 2F signature, then (w-1) | (h-1)<<14 packed LE
        payload.write(0x2f)
        val b = (w - 1).toLong | ((h - 1).toLong << 14)
        payload.write(Array[Byte]((b & 0xff).toByte, ((b >> 8) & 0xff).toByte,
          ((b >> 16) & 0xff).toByte, ((b >> 24) & 0xff).toByte))
      case "VP8X" => // flags + reserved, then LE24 canvas dims - 1
        payload.write(Array[Byte](0, 0, 0, 0))
        payload.write(Array[Byte](((w - 1) & 0xff).toByte,
          (((w - 1) >> 8) & 0xff).toByte, (((w - 1) >> 16) & 0xff).toByte,
          ((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
          (((h - 1) >> 16) & 0xff).toByte))
    }
    payload.write(tail)
    val chunk = payload.toByteArray
    ascii("RIFF"); le32(4 + 8 + chunk.length); ascii("WEBP")
    ascii(flavor); le32(chunk.length); out.write(chunk)
    out.toByteArray
  }

  /** Hand-built minimal AVIF: ftyp(avif) + meta→iprp→ipco→ispe carrying
    * the BE32 dimensions — the ISO-BMFF path `parseDimensions` walks. */
  def makeAvif(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def be32(v: Int): Unit = {
      out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    be32(16); ascii("ftyp"); ascii("avif"); be32(0)   // brand + minor
    be32(48); ascii("meta"); be32(0)                  // FullBox head
    be32(36); ascii("iprp")
    be32(28); ascii("ipco")
    be32(20); ascii("ispe"); be32(0); be32(w); be32(h)
    out.toByteArray
  }

  /** Multi-item AVIF (thumbnail item 1 + primary item 2): ipco carries TWO
    * ispe properties with the THUMBNAIL'S FIRST, `pitm` names item 2 and
    * `ipma` associates item 1 → property 1, item 2 → property 2 — a parser
    * that grabs the first ispe reports the thumbnail's dimensions; the
    * correct walk resolves pitm through ipma. `pitmV1` exercises the
    * 32-bit item-id layout, `wideIdx` the flags-bit-0 15-bit property
    * indexes, `brand` the avif/avis (sequence) major brands. */
  def makeAvifMulti(tw: Int, th: Int, w: Int, h: Int,
      pitmV1: Boolean = false, wideIdx: Boolean = false,
      brand: String = "avif"): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def be32(v: Int): Unit = { be16(v >>> 16); be16(v) }
    be32(16); ascii("ftyp"); ascii(brand); be32(0)
    val pitmSz = if (pitmV1) 16 else 14
    val ipmaSz = 16 + (if (wideIdx) 10 else 8) // head+count + 2 entries
    val ipcoSz = 8 + 20 + 20
    val iprpSz = 8 + ipcoSz + ipmaSz
    be32(12 + pitmSz + iprpSz); ascii("meta"); be32(0)
    be32(pitmSz); ascii("pitm")
    if (pitmV1) { out.write(1); out.write(0); out.write(0); out.write(0); be32(2) }
    else { be32(0); be16(2) }
    be32(iprpSz); ascii("iprp")
    be32(ipcoSz); ascii("ipco")
    be32(20); ascii("ispe"); be32(0); be32(tw); be32(th) // prop 1: thumbnail
    be32(20); ascii("ispe"); be32(0); be32(w); be32(h)   // prop 2: primary
    be32(ipmaSz); ascii("ipma")
    out.write(0); out.write(0); out.write(0); out.write(if (wideIdx) 1 else 0)
    be32(2)
    be16(1); out.write(1); if (wideIdx) be16(1) else out.write(1)
    be16(2); out.write(1); if (wideIdx) be16(2) else out.write(2)
    out.toByteArray
  }

  /** Animated WebP: VP8X with the animation flag (0x02) set and an ANIM
    * chunk (background color + loop count) after it — the canvas
    * dimensions still come from the VP8X header, which is exactly what
    * the parser reads. */
  def makeWebpAnim(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le24(v: Int): Unit = { le16(v); out.write((v >> 16) & 0xff) }
    def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
    ascii("RIFF"); le32(4 + 8 + 10 + 8 + 6); ascii("WEBP")
    ascii("VP8X"); le32(10)
    out.write(0x02); out.write(0); out.write(0); out.write(0) // ANIM flag
    le24(w - 1); le24(h - 1)
    ascii("ANIM"); le32(6)
    le32(0xffffffff); le16(0) // white background, loop forever
    out.toByteArray
  }

  /** Hand-built big-endian (MM) TIFF: first IFD with LONG ImageWidth /
    * ImageLength — the byte order and value layout the JDK writer
    * (little-endian II, SHORT-packed) does not produce. */
  def makeTiffMM(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def be32(v: Int): Unit = { be16(v >>> 16); be16(v) }
    out.write('M'); out.write('M'); be16(42); be32(8)
    be16(2)                                   // entry count
    be16(256); be16(4); be32(1); be32(w)      // ImageWidth, LONG
    be16(257); be16(4); be32(1); be32(h)      // ImageLength, LONG
    be32(0)                                   // no next IFD
    out.toByteArray
  }

  /** Hand-built BMP variants the JDK writer does not emit: the ancient
    * BITMAPCOREHEADER (u16 dims) and a top-down BITMAPINFOHEADER
    * (negative height — sign encodes row order, not geometry). */
  def makeBmp(w: Int, h: Int, core: Boolean = false,
      topDown: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write('B'); out.write('M')
    if (core) {
      le32(26 + 4); le32(0); le32(26)  // file size, reserved, data offset
      le32(12); le16(w); le16(h); le16(1); le16(24)
      le32(0) // token pixel data
    } else {
      le32(54 + 4); le32(0); le32(54)
      le32(40); le32(w); le32(if (topDown) -h else h)
      le16(1); le16(24); le32(0); le32(0)
      le32(0); le32(0); le32(0); le32(0)
      le32(0)
    }
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-multimodal-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      i % 4 match {
        case 3 => // video stub payload: seeded bytes, stub-formula truth
          val rnd = new scala.util.Random(1000 + i)
          val data = Array.ofDim[Byte](100 + i * 13)
          rnd.nextBytes(data)
          val n = data.length
          (i.toLong, "video", data, 16 + n % 64, 16 + n % 48, 1 + n % 30)
        case k =>
          val format = Seq("png", "jpg", "gif")(k)
          val kind = Seq("png", "jpeg", "gif")(k)
          val img = makeImage(i)
          (i.toLong, kind, encode(img, format), img.getWidth, img.getHeight, 1)
      }
    } ++ (60 until 76).map { i =>
      // WebP (all three flavors) and AVIF rows — dimensions exercise the
      // 14-bit (lossy/lossless) and 24-bit (VP8X) field widths
      val w = 1 + (i * 211) % 16000
      val h = 1 + (i * 137) % 9000
      i % 4 match {
        case 0 => (i.toLong, "webp", makeWebp("VP8 ", w, h, i), w, h, 1)
        case 1 => (i.toLong, "webp", makeWebp("VP8L", w, h, i), w, h, 1)
        case 2 =>
          val (cw, ch) = (1 + (i * 4099) % 1000000, 1 + (i * 2039) % 800000)
          (i.toLong, "webp", makeWebp("VP8X", cw, ch, i), cw, ch, 1)
        case _ => (i.toLong, "avif", makeAvif(w, h), w, h, 1)
      }
    } ++ {
      // multi-item AVIF (thumbnail ispe FIRST in ipco; truth = the PRIMARY
      // item's dimensions, resolved via pitm -> ipma) across the pitm v0/v1
      // and narrow/wide-index layouts + the avis sequence brand, and an
      // animated WebP whose canvas comes from the VP8X header
      Seq(
        (76L, "avif", makeAvifMulti(160, 90, 3840, 2160), 3840, 2160, 1),
        (77L, "avif", makeAvifMulti(320, 240, 7680, 4320,
          pitmV1 = true, wideIdx = true), 7680, 4320, 1),
        (78L, "webp", makeWebpAnim(1920, 1080), 1920, 1080, 1),
        (79L, "avif", makeAvifMulti(64, 64, 1024, 768,
          brand = "avis"), 1024, 768, 1)) ++ {
        // BMP + TIFF: real JDK encoders where they exist (bmp + II tiff),
        // hand-built for the layouts they never emit (MM/LONG tiff,
        // BITMAPCOREHEADER, top-down negative-height info header)
        val bmpImg = makeImage(80)
        val tifImg = makeImage(81)
        Seq(
          (80L, "bmp", encode(bmpImg, "bmp"),
            bmpImg.getWidth, bmpImg.getHeight, 1),
          (81L, "tiff", encode(tifImg, "tiff"),
            tifImg.getWidth, tifImg.getHeight, 1),
          (82L, "tiff", makeTiffMM(70000, 42), 70000, 42, 1),
          (83L, "bmp", makeBmp(641, 482, core = true), 641, 482, 1),
          (84L, "bmp", makeBmp(333, 777, topDown = true), 333, 777, 1))
      } ++ {
        // REAL video containers: decode's frame counts are now EXACT for
        // AVI/MP4 (the sample-table walk), no longer the stub formula —
        // incl. an edit-list MP4 whose PRESENTED frame count (4 of 6) is
        // the honest one
        val jp = (0 until 5).map(t =>
          GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(201, t), 0.85f))
        val jp6 = (0 until 6).map(t =>
          GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(202, t), 0.85f))
        Seq(
          (85L, "video", GenVideoFixture.avi(64, 48, 100000L, jp), 64, 48, 5),
          (86L, "video", GenMp4Fixture.mp4(64, 48, 1000L, Seq.fill(6)(150L),
            jp6, samplesPerChunk = 3, moovFirst = false, useCo64 = false,
            syncEvery = None), 64, 48, 6),
          (87L, "video", GenMp4Fixture.mp4(64, 48, 1000L, Seq.fill(6)(150L),
            jp6, samplesPerChunk = 6, moovFirst = true, useCo64 = false,
            syncEvery = None, editMediaTime = 300L), 64, 48, 4))
      }
    }
    val out = "fixtures/multimodal_media.parquet"
    rows.toDF("media_id", "kind", "data", "width", "height", "n_frames")
      .coalesce(1).write.mode("overwrite").parquet(out + ".dir")
    // single committed file, like the zlib fixture
    val part = new java.io.File(out + ".dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    println(s"wrote $out with ${rows.size} rows")
    spark.stop()
  }
}
