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
