package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Multimodal.attachBinary(
    Seq((1L, "hello world"), (2L, "x"), (3L, "a" * 100)).toDF("doc_id", "text"),
    "doc_id", "text", "image")

  test("attachBinary: schema is (id, kind, data binary)") {
    assert(media.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("id", "long"), ("kind", "string"), ("data", "binary")))
  }

  test("decode: partition-batched metadata extraction is deterministic") {
    val metas = Multimodal.decode(media).collect().map(m => m.id -> m).toMap
    assert(metas(1L).nBytes == 11 && metas(2L).nBytes == 1 && metas(3L).nBytes == 100)
    assert(metas(1L).width == 16 + 11 % 64 && metas(1L).height == 16 + 11 % 48)
    assert(metas(1L).nFrames == 1) // image, not video
    // re-running gives identical output (stub is deterministic)
    val again = Multimodal.decode(media).collect().map(m => m.id -> m).toMap
    assert(metas == again)
  }

  test("decode: video kind produces frame counts") {
    val video = Multimodal.attachBinary(
      Seq((9L, "some video payload bytes")).toDF("doc_id", "text"),
      "doc_id", "text", "video")
    val m = Multimodal.decode(video).head()
    assert(m.nFrames == 1 + (m.nBytes % 30).toInt && m.nFrames > 1)
  }

  private def encoded(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no writer for $format")
    out.toByteArray
  }

  test("parseDimensions: real PNG/JPEG/GIF headers yield the encoded size; " +
    "non-image and truncated payloads fall back to None") {
    // sizes straddle the u8/u16 boundary to exercise multi-byte fields
    for ((w, h) <- Seq((1, 1), (37, 23), (300, 212), (500, 400));
         fmt <- Seq("png", "jpg", "gif")) {
      val bytes = encoded(w, h, fmt)
      assert(Multimodal.parseDimensions(bytes).contains((w, h)),
        s"$fmt ${w}x$h: got ${Multimodal.parseDimensions(bytes)}")
      // a header-only prefix still parses for PNG/GIF (fixed offsets); a
      // truncated-before-header stream must return None, not throw
      assert(Multimodal.parseDimensions(bytes.take(8)).isEmpty)
    }
    assert(Multimodal.parseDimensions("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseDimensions(Array[Byte]()).isEmpty)
    assert(Multimodal.parseDimensions(Array.fill[Byte](64)(0x7f)).isEmpty)
    // JPEG SOI followed by garbage: walks off without finding SOF -> None
    assert(Multimodal.parseDimensions(
      Array(0xff, 0xd8, 0x00, 0x01, 0x02, 0x03, 0x04).map(_.toByte)).isEmpty)
  }

  test("decode routes image containers to the real parser and opaque " +
    "payloads to the stub branch, in one partition-batched pass") {
    val png = encoded(123, 45, "png")
    val jpg = encoded(222, 111, "jpg")
    val rows = Seq(
      (1L, "png", png), (2L, "jpeg", jpg),
      (3L, "video", "not really video bytes".getBytes("UTF-8")))
      .toDF("id", "kind", "data")
    val metas = Multimodal.decode(rows).collect().map(m => m.id -> m).toMap
    assert(metas(1L).width == 123 && metas(1L).height == 45 && metas(1L).nFrames == 1)
    assert(metas(2L).width == 222 && metas(2L).height == 111)
    // the stub branch still applies to non-image payloads
    val n = metas(3L).nBytes
    assert(metas(3L).width == 16 + (n % 64).toInt &&
      metas(3L).nFrames == 1 + (n % 30).toInt)
  }

  test("resize and frameSample shrink payloads deterministically") {
    val resized = Multimodal.resize(media, 4)
    val sizes = resized.select(col("id"), length(col("data")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sizes == Map(1L -> 4, 2L -> 1, 3L -> 4))
    val sampled = Multimodal.frameSample(media, 10)
    val s3 = sampled.where(col("id") === 3).select(length(col("data"))).head.getInt(0)
    assert(s3 == 10) // 100 bytes / stride 10
  }
}
