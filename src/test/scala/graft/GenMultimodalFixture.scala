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
