package graft

import graft.multimodal.Vp8lDecoder

/** VP8L decoder spec: byte-exact pixels against two committed golden sets
  * — `fixtures/webp_golden.parquet` (the REAL libwebp lossless encoder
  * over generator-known pixels: whatever transform/entropy choices it
  * made, the decode must reproduce the drawn RGBA exactly) and
  * `fixtures/webp_probe_golden.parquet` (hand-built streams isolating
  * each bitstream feature: all 14 predictor modes with their edge rules,
  * color-transform packing, subtract-green, palette bundling widths, the
  * color cache, meta-prefix groups, overlapping copies, sampled 2D
  * distance codes — each with libwebp's own decode as expected output).
  * Plus refuse-paths: lossy/animated containers, truncation fuzz, bit
  * flips, and the dimension bomb guard. */
class Vp8lSpec extends SparkTestBase {

  private def rgbaOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](w * h * 4)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(4 * i) = ((p >> 16) & 0xff).toByte
      out(4 * i + 1) = ((p >> 8) & 0xff).toByte
      out(4 * i + 2) = (p & 0xff).toByte
      out(4 * i + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    out
  }

  private def goldenRows(path: String): Seq[(String, Int, Int, Array[Byte], Array[Byte])] =
    spark.read.parquet(path).collect().toSeq.map { r =>
      (r.getAs[String]("name"), r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Array[Byte]]("webp"), r.getAs[Array[Byte]]("rgba"))
    }

  test("encoder goldens: every libwebp-encoded card decodes to the exact " +
    "drawn RGBA — transforms, entropy choices and all") {
    val rows = goldenRows("fixtures/webp_golden.parquet")
    assert(rows.size >= 13)
    for ((name, w, h, webp, rgba) <- rows) {
      val img = Vp8lDecoder.decode(webp)
      assert(img.isDefined, s"$name: refused")
      assert(img.get.getWidth == w && img.get.getHeight == h, s"$name: dims")
      assert(java.util.Arrays.equals(rgbaOf(img.get), rgba),
        s"$name: pixel mismatch")
    }
  }

  test("feature goldens: hand-built per-feature streams (predictor modes, " +
    "color transform, palettes, cache, meta groups, distance codes) " +
    "decode byte-exactly to libwebp's own output") {
    val rows = goldenRows("fixtures/webp_probe_golden.parquet")
    assert(rows.size >= 31)
    for ((name, w, h, webp, rgba) <- rows) {
      val img = Vp8lDecoder.decode(webp)
      assert(img.isDefined, s"$name: refused")
      assert(img.get.getWidth == w && img.get.getHeight == h, s"$name: dims")
      assert(java.util.Arrays.equals(rgbaOf(img.get), rgba),
        s"$name: pixel mismatch")
    }
  }

  test("refuse-don't-guess: lossy VP8, animated, truncated, flipped, and " +
    "bomb-dimension payloads all return None and never throw") {
    val rows = goldenRows("fixtures/webp_golden.parquet")
    val sample = rows.find(_._1 == "gradient").get._4
    // lossy container magic: VP8 chunk instead of VP8L
    val lossy = sample.clone()
    lossy(15) = ' '.toByte
    assert(Vp8lDecoder.decode(lossy).isEmpty)
    // an ANIM chunk anywhere before VP8L refuses
    // (build: RIFF header + ANIM chunk + original VP8L chunk)
    val vp8lChunk = sample.drop(12)
    val anim = "ANIM".getBytes ++ Array[Byte](6, 0, 0, 0) ++
      new Array[Byte](6)
    val animBody = anim ++ vp8lChunk
    val animFile = "RIFF".getBytes ++
      Array[Byte](((animBody.length + 4) & 0xff).toByte,
        (((animBody.length + 4) >> 8) & 0xff).toByte, 0, 0) ++
      "WEBP".getBytes ++ animBody
    assert(Vp8lDecoder.decode(animFile).isEmpty)
    // every truncation degrades to None, never throws
    (0 to sample.length).foreach { k =>
      Vp8lDecoder.decode(sample.take(k))
    }
    // single-bit flips anywhere never throw (decode may refuse or return
    // different pixels — both honest; a crash is not)
    for (i <- 20 until math.min(sample.length, 90)) {
      val mut = sample.clone()
      mut(i) = (mut(i) ^ 0x10).toByte
      Vp8lDecoder.decode(mut)
    }
    // declared-dimensions bomb: 16384 x 16384 = 268 M pixels, refused
    // BEFORE allocation by the maxPixels gate
    val bomb = java.nio.ByteBuffer.allocate(64)
    bomb.put("RIFF".getBytes).putInt(Integer.reverseBytes(56))
      .put("WEBP".getBytes).put("VP8L".getBytes)
      .putInt(Integer.reverseBytes(44)).put(0x2f.toByte)
      .put(Array[Byte](-1, -1, -1, -1)) // w-1 = h-1 = 16383, version bits 0
    assert(Vp8lDecoder.decode(java.util.Arrays.copyOf(bomb.array(), 64),
      maxPixels = 16L * 1024 * 1024).isEmpty)
  }

  test("simple two-symbol codes are canonical — code 0 goes to the " +
    "numerically smaller symbol even when the header writes them " +
    "reversed (pinned against libwebp: both orders decode identically)") {
    // hand-built 4x1: green simple code with symbols written as (200, 10);
    // pixels alternate code 0 / code 1 -> greens 10, 200, 10, 200
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var n = 0
    def wr(v: Int, k: Int): Unit = {
      acc |= (v.toLong & ((1L << k) - 1)) << n
      n += k
      while (n >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; n -= 8 }
    }
    def wrCode(c: Int, k: Int): Unit =
      (k - 1 to 0 by -1).foreach(i => wr((c >> i) & 1, 1))
    wr(0x2f, 8); wr(3, 14); wr(0, 14); wr(0, 1); wr(0, 3) // header 4x1
    wr(0, 1); wr(0, 1); wr(0, 1) // no transforms, no cache, no meta
    wr(1, 1); wr(1, 1); wr(1, 1); wr(200, 8); wr(10, 8) // green: (200, 10)
    for (_ <- 0 until 2) { wr(1, 1); wr(0, 1); wr(0, 1); wr(0, 1) } // r,b: {0}
    wr(1, 1); wr(0, 1); wr(1, 1); wr(255, 8) // alpha {255}
    wr(1, 1); wr(0, 1); wr(0, 1); wr(0, 1) // dist {0}
    Seq(0, 1, 0, 1).foreach(b => wrCode(b, 1))
    while (n > 0) wr(0, 1)
    val payload = bits.toByteArray
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    val file = "RIFF".getBytes ++
      Array[Byte]((padded.length + 12).toByte, 0, 0, 0) ++
      "WEBP".getBytes ++ "VP8L".getBytes ++
      Array[Byte](payload.length.toByte, 0, 0, 0) ++ padded
    val img = Vp8lDecoder.decode(file)
    assert(img.isDefined)
    val greens = (0 until 4).map(x => (img.get.getRGB(x, 0) >> 8) & 0xff)
    assert(greens == Seq(10, 200, 10, 200))
  }
}
