package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/image_phash.parquet` — committed ground
  * truth for the q_image_phash / q_image_neardup oracles. Each decodable
  * row is a REAL losslessly-encoded image (PNG / BMP / GIF via the JDK's
  * own ImageIO writers) whose expected aHash/dHash are computed HERE, from
  * the pixel array the generator drew — with the hash arithmetic
  * re-implemented standalone in this file, never by calling the engine —
  * so the engine's hash-match proves decode + integer box-average + bit
  * extraction end to end, not a formula copied from itself. Lossless-ness
  * is asserted per row (encode -> ImageIO.read -> pixel-equal), which is
  * why JPEG stays out of THIS fixture (its decoded pixels are
  * codec-defined; JPEG coverage lives in the dimensions fixture).
  *
  * Rows include planted near-duplicates (a base image plus small
  * perturbations chosen so the dHash Hamming distance lands in 1..3 — the
  * generator asserts it) so q_image_neardup is non-trivial, and corrupt /
  * hostile rows (truncated PNG body, a 10-gigapixel declared-dimensions
  * bomb, plain garbage) proving the degrade-to-undecoded contract.
  *
  * Run once: `sbt "Test/runMain graft.GenImagePhashFixture"`, commit the
  * parquet. Deterministic: seeded content, fixed sizes, one output file.
  */
object GenImagePhashFixture {

  // ---- standalone expected-hash arithmetic (the published aHash/dHash
  // ---- recipe over exact integers; intentionally independent code)

  def lumaOf(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** (sums, counts) of lumas on a gw x gh floor-partition grid. */
  def grid(px: Array[Array[Int]], gw: Int, gh: Int): (Array[Long], Array[Long]) = {
    val h = px.length; val w = px(0).length
    val s = new Array[Long](gw * gh); val c = new Array[Long](gw * gh)
    for (y <- 0 until h; x <- 0 until w) {
      val cell = (y.toLong * gh / h).toInt * gw + (x.toLong * gw / w).toInt
      s(cell) += lumaOf(px(y)(x)); c(cell) += 1
    }
    (s, c)
  }

  def expectedAHash(px: Array[Array[Int]]): Long = {
    val (s, c) = grid(px, 8, 8)
    val ts = s.sum; val tc = c.sum
    (0 until 64).foldLeft(0L) { (acc, i) =>
      if (c(i) > 0 && s(i) * tc >= ts * c(i)) acc | (1L << i) else acc
    }
  }

  def expectedDHash(px: Array[Array[Int]]): Long = {
    val (s, c) = grid(px, 9, 8)
    var bits = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val a = y * 9 + x; val b = a + 1
      if (s(a) * math.max(c(b), 1L) > s(b) * math.max(c(a), 1L))
        bits |= 1L << (y * 8 + x)
    }
    bits
  }

  // ---- drawing + lossless encoding

  def toImage(px: Array[Array[Int]]): BufferedImage = {
    val img = new BufferedImage(px(0).length, px.length, BufferedImage.TYPE_INT_RGB)
    for (y <- px.indices; x <- px(0).indices) img.setRGB(x, y, px(y)(x) & 0xffffff)
    img
  }

  def encodeLossless(px: Array[Array[Int]], format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(toImage(px), format, out), s"no writer for $format")
    val bytes = out.toByteArray
    // assert the writer was lossless for THIS image: decode and compare
    val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- px.indices; x <- px(0).indices)
      require((back.getRGB(x, y) & 0xffffff) == (px(y)(x) & 0xffffff),
        s"$format round-trip not lossless at ($x,$y)")
    bytes
  }

  /** A deterministic test card: smooth diagonal luminance gradient plus a
    * seeded block pattern — enough structure that dHash bits are far from
    * tie boundaries (a 1-luma perturbation of a flat image would flip
    * arbitrary bits; these don't). `palette` quantizes channel values so
    * the GIF writer's 256-color table can hold every color. */
  def drawCard(w: Int, h: Int, seed: Int, palette: Boolean = false): Array[Array[Int]] = {
    Array.tabulate(h, w) { (y, x) =>
      val base = (x * 255 / math.max(w - 1, 1) + y * 255 / math.max(h - 1, 1)) / 2
      val block = ((x / 8 + y / 8 + seed) * 2654435761L >>> 28).toInt & 0x3f
      val v0 = math.min(255, base / 2 + block * 2 + (seed * 31) % 64)
      val v = if (palette) v0 & 0xf8 else v0
      val g = if (palette) math.min(248, v + 8) & 0xf8 else math.min(255, v + 13)
      val b = if (palette) (v0 >> 1) & 0xf8 else v0 / 2
      (v << 16) | (g << 8) | b
    }
  }

  /** Brighten a rectangular region by `d` (clamped) — the near-dup
    * perturbation. */
  def brighten(px: Array[Array[Int]], x0: Int, y0: Int, x1: Int, y1: Int,
      d: Int): Array[Array[Int]] =
    Array.tabulate(px.length, px(0).length) { (y, x) =>
      if (x >= x0 && x < x1 && y >= y0 && y < y1) {
        val p = px(y)(x)
        def cl(v: Int) = math.max(0, math.min(255, v + d))
        (cl((p >> 16) & 0xff) << 16) | (cl((p >> 8) & 0xff) << 8) | cl(p & 0xff)
      } else px(y)(x)
    }

  /** Valid PNG signature + IHDR declaring absurd dimensions and nothing
    * else — the decompression bomb the engine must refuse by header. */
  def bombPng(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int): Unit = {
      out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    be32(13); out.write("IHDR".getBytes("US-ASCII"))
    be32(w); be32(h)
    out.write(8); out.write(2); out.write(0); out.write(0); out.write(0)
    be32(0) // wrong CRC — never reaches a decoder anyway
    out.toByteArray
  }

  // ---- EXIF-orientation helpers (standalone, independent of the engine)

  /** Rotate a pixel array 90 degrees clockwise. */
  def rot90cw(px: Array[Array[Int]]): Array[Array[Int]] = {
    val h = px.length; val w = px(0).length
    Array.tabulate(w, h)((r, c) => px(h - 1 - c)(r))
  }

  /** Apply the published EXIF stored-to-display transform (orientation
    * 1-8) to a pixel array. */
  def displayPx(px: Array[Array[Int]], o: Int): Array[Array[Int]] = {
    val h = px.length; val w = px(0).length
    val (dw, dh) = if (o >= 5) (h, w) else (w, h)
    val out = Array.ofDim[Int](dh, dw)
    for (y <- 0 until h; x <- 0 until w) {
      val dx = o match {
        case 2 | 3 => w - 1 - x
        case 6 | 7 => h - 1 - y
        case 5 | 8 => y
        case _ => x
      }
      val dy = o match {
        case 3 | 4 => h - 1 - y
        case 7 | 8 => w - 1 - x
        case 5 | 6 => x
        case _ => y
      }
      out(dy)(dx) = px(y)(x)
    }
    out
  }

  /** Inject a minimal EXIF APP1 segment (TIFF II header, IFD0 with the
    * single orientation tag) right after a JPEG's SOI marker — the layout
    * real cameras write, hand-built per the published TIFF/EXIF spec. */
  def withExifOrientation(jpeg: Array[Byte], o: Int): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val tiff = {
      val b = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
      b.write(0x49); b.write(0x49); le16(42); le32(8) // II, magic, IFD0 at 8
      le16(1)                                         // one entry
      le16(0x0112); le16(3); le32(1); le16(o); le16(0) // orientation SHORT
      le32(0)                                         // no next IFD
      b.toByteArray
    }
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val seg = Array(0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  // ---- standalone expected-resize arithmetic (channel-wise floor box
  // ---- average onto the scale-to-fit grid; independent of the engine)

  /** Scale-to-fit output dims inside maxW x maxH (floor, >= 1); None when
    * the image already fits. */
  def fitDims(w: Int, h: Int, maxW: Int, maxH: Int): Option[(Int, Int)] =
    if (w <= maxW && h <= maxH) None
    else if (w.toLong * maxH <= h.toLong * maxW)
      Some((math.max(1, (w.toLong * maxH / h).toInt), maxH))
    else Some((maxW, math.max(1, (h.toLong * maxW / w).toInt)))

  /** Channel-wise floor box average of `px` onto outW x outH. */
  def downscale(px: Array[Array[Int]], outW: Int, outH: Int): Array[Array[Int]] = {
    val h = px.length; val w = px(0).length
    val rs = Array.ofDim[Long](outH, outW); val gs = Array.ofDim[Long](outH, outW)
    val bs = Array.ofDim[Long](outH, outW); val cn = Array.ofDim[Long](outH, outW)
    for (y <- 0 until h; x <- 0 until w) {
      val oy = (y.toLong * outH / h).toInt; val ox = (x.toLong * outW / w).toInt
      val p = px(y)(x)
      rs(oy)(ox) += (p >> 16) & 0xff; gs(oy)(ox) += (p >> 8) & 0xff
      bs(oy)(ox) += p & 0xff; cn(oy)(ox) += 1
    }
    Array.tabulate(outH, outW) { (y, x) =>
      val n = math.max(cn(y)(x), 1L)
      (((rs(y)(x) / n).toInt & 0xff) << 16) |
        (((gs(y)(x) / n).toInt & 0xff) << 8) | ((bs(y)(x) / n).toInt & 0xff)
    }
  }

  /** Expected quality stats (n_pixels, luma_sum, luma_min, luma_max,
    * is_gray, entropy_milli) computed from the drawn pixel array — the
    * same published definitions, re-implemented standalone. */
  def expectedStats(px: Array[Array[Int]]): (Long, Long, Int, Int, Boolean, Long) = {
    val hist = new Array[Long](256)
    var gray = true
    for (row <- px; p <- row) {
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      if (r != g || g != b) gray = false
      hist(lumaOf(p)) += 1
    }
    val total = px.length.toLong * px(0).length
    var sum = 0L; var mn = 255; var mx = 0; var ent = 0.0
    for (i <- 0 until 256 if hist(i) > 0) {
      sum += i.toLong * hist(i)
      if (i < mn) mn = i
      if (i > mx) mx = i
      val p = hist(i).toDouble / total
      ent -= p * (math.log(p) / math.log(2.0))
    }
    (total, sum, mn, mx, gray, math.floor(ent * 1000.0).toLong)
  }

  final case class Row(media_id: Long, kind: String, data: Array[Byte],
      decoded: Boolean, width: Int, height: Int,
      ahash: Option[Long], dhash: Option[Long],
      r_resized: Boolean, r_width: Int, r_height: Int,
      r_ahash: Option[Long], r_dhash: Option[Long],
      s_n_pixels: Long, s_luma_sum: Long, s_luma_min: Int, s_luma_max: Int,
      s_is_gray: Boolean, s_entropy_milli: Long)

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-image-phash-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    def rowFor(id: Long, kind: String, data: Array[Byte],
        px: Array[Array[Int]]): Row = {
      // expected 32x32-box resize: either pass-through (original hashes)
      // or the independently downscaled pixels' hashes
      val (rr, rw, rh, ra, rd) = fitDims(px(0).length, px.length, 32, 32) match {
        case None => (false, px(0).length, px.length,
          expectedAHash(px), expectedDHash(px))
        case Some((ow, oh)) =>
          val small = downscale(px, ow, oh)
          (true, ow, oh, expectedAHash(small), expectedDHash(small))
      }
      val (sp, ss, smn, smx, sg, se) = expectedStats(px)
      Row(id, kind, data, decoded = true,
        px(0).length, px.length, Some(expectedAHash(px)), Some(expectedDHash(px)),
        rr, rw, rh, Some(ra), Some(rd), sp, ss, smn, smx, sg, se)
    }

    def imgRow(id: Long, kind: String, format: String,
        px: Array[Array[Int]]): Row =
      rowFor(id, kind, encodeLossless(px, format), px)

    // base cards across formats and sizes (incl. narrower-than-grid)
    val cards = Seq(
      (0L, "png", "png", drawCard(96, 64, 1)),
      (1L, "png", "png", drawCard(200, 150, 2)),
      (2L, "bmp", "bmp", drawCard(120, 80, 3)),
      (3L, "bmp", "bmp", drawCard(64, 96, 4)),
      (4L, "gif", "gif", drawCard(80, 60, 5, palette = true)),
      (5L, "gif", "gif", drawCard(160, 90, 6, palette = true)),
      (6L, "png", "png", drawCard(40, 30, 7)),
      (7L, "png", "png", drawCard(5, 3, 8)), // narrower than the 8/9 grids
      (8L, "bmp", "bmp", drawCard(300, 200, 9)),
      (9L, "png", "png", drawCard(33, 47, 10)),
      // a TRUE grayscale card (r == g == b everywhere): the is_gray gate
      (10L, "png", "png", Array.tabulate(50, 70) { (y, x) =>
        val v = (x * 3 + y * 5 + ((x / 8 + y / 8) * 29) % 48) & 0xff
        (v << 16) | (v << 8) | v
      })
    ).map { case (id, kind, fmt, px) => imgRow(id, kind, fmt, px) }

    // WebP-lossless rows: REAL libwebp-encoded payloads from the committed
    // golden parquet (tools/webp_golden.py — generator-known pixels, the
    // reference encoder's own transform/entropy choices), with expected
    // hashes/stats computed HERE from the known RGBA. Opaque cards only:
    // this fixture's luma arithmetic is RGB. Plus a PNG twin of one card's
    // pixels — a hamming-0 cross-CONTAINER near-dup pair proving the VP8L
    // decode lands on exactly the pixels the JDK PNG decoder produces.
    val webpGolden = spark.read.parquet("fixtures/webp_golden.parquet")
      .collect().map(r => r.getAs[String]("name") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Array[Byte]]("webp"), r.getAs[Array[Byte]]("rgba"))).toMap
    def rgbaPx(w: Int, h: Int, rgba: Array[Byte]): Array[Array[Int]] =
      Array.tabulate(h, w) { (y, x) =>
        val i = 4 * (y * w + x)
        ((rgba(i) & 0xff) << 16) | ((rgba(i + 1) & 0xff) << 8) |
          (rgba(i + 2) & 0xff)
      }
    val webpRows = Seq(20L -> "gradient", 21L -> "palette13",
      22L -> "tiles", 23L -> "text_like").map { case (id, name) =>
      val (w, h, webp, rgba) = webpGolden(name)
      rowFor(id, "webp", webp, rgbaPx(w, h, rgba))
    }
    val webpTwin = {
      val (w, h, _, rgba) = webpGolden("gradient")
      imgRow(24L, "png", "png", rgbaPx(w, h, rgba))
    }
    require(webpTwin.dhash == webpRows.head.dhash,
      "webp/png twin must be a hamming-0 pair")

    // planted near-dups: perturb one base card until dHash hamming lands
    // in 1..3 — re-encoded, so the pair exists only at the pixel level
    val basePx = drawCard(96, 64, 1)
    val baseD = expectedDHash(basePx)
    def perturbTo(id: Long, x0: Int, y0: Int, x1: Int, y1: Int): Row = {
      val chosen = (1 to 120).iterator
        .map(d => brighten(basePx, x0, y0, x1, y1, d))
        .find { p => val hd = hamming(expectedDHash(p), baseD); hd >= 1 && hd <= 3 }
        .getOrElse(sys.error("no perturbation landed in hamming 1..3"))
      imgRow(id, "png", "png", chosen)
    }
    val nearDups = Seq(
      perturbTo(100L, 0, 0, 24, 64),    // left quarter brightened
      perturbTo(101L, 60, 16, 96, 48))  // right-center block brightened
    nearDups.foreach { r =>
      val hd = hamming(r.dhash.get, baseD)
      require(hd >= 1 && hd <= 3, s"planted pair drifted to hamming $hd")
    }
    // a re-encode of the SAME pixels in another format: hamming 0 pair
    val sameOtherFormat = imgRow(102L, "bmp", "bmp", basePx)
    require(sameOtherFormat.dhash.get == baseD)

    // EXIF-rotated near-dup pair: 103 = upright JPEG; 104 = the SAME scene
    // stored rotated 90 CW with EXIF orientation 8 (display = rotate 270
    // CW back). Expected hashes come from the pixels ImageIO decodes out
    // of each JPEG (lossy codec - decoded pixels are the ground truth),
    // with 104's grid laid over the DISPLAY geometry via the standalone
    // transform; a camera's rotated re-encode must land in near-dup range
    // of the upright copy, which unoriented hashing provably misses.
    def jpegRow(id: Long, jpeg: Array[Byte], o: Int): Row = {
      val stored = GenVideoFixture.decodePx(jpeg)
      val disp = displayPx(stored, o)
      val (sp, ss, smn, smx, sg, se) = expectedStats(stored) // rotation-invariant
      // dims <= the 32x32 resize box: pass-through, re-hash = main hash
      Row(id, "jpg", jpeg, decoded = true,
        stored(0).length, stored.length, // STORED dims, the engine contract
        Some(expectedAHash(disp)), Some(expectedDHash(disp)),
        r_resized = false, stored(0).length, stored.length,
        Some(expectedAHash(disp)), Some(expectedDHash(disp)),
        sp, ss, smn, smx, sg, se)
    }
    // radial luma bowl + soft block texture: non-monotone in BOTH axes so
    // the dHash gradient bits point in mixed directions (a plain gradient
    // card is monotone left-to-right at this size and dHashes to the
    // all-zero contentless code, which the banded joins exclude)
    val scene = Array.tabulate(20, 28) { (y, x) =>
      val r2 = (x - 14) * (x - 14) * 100 / 196 + (y - 10) * (y - 10) * 100 / 100
      val v = math.min(255, 30 + r2 + ((x / 7 + y / 5) * 37) % 48)
      (v << 16) | (v << 8) | v
    }
    val upright = jpegRow(103L, GenVideoFixture.encodeJpeg(scene, 0.9f), 1)
    val rotated = jpegRow(104L,
      withExifOrientation(
        GenVideoFixture.encodeJpeg(rot90cw(scene), 0.9f), 8), 8)
    locally {
      require(upright.dhash.get != 0L && rotated.dhash.get != 0L,
        "EXIF pair content dHashed to the contentless code")
      val hd = hamming(upright.dhash.get, rotated.dhash.get)
      require(hd <= 3, s"EXIF pair drifted to hamming $hd")
      // and WITHOUT orientation the stored-geometry hash is far away -
      // the pair exists only because of the display transform
      val raw = expectedDHash(GenVideoFixture.decodePx(rotated.data))
      require(hamming(upright.dhash.get, raw) > 3,
        "unoriented hash accidentally matches; the fixture would not prove the feature")
    }

    // 105: a LARGER rotated+tagged JPEG that must actually RESIZE — the
    // thumbnail bakes the orientation in (PNG carries no tag), so the
    // expected resized hashes come from downscaling the DISPLAY pixels
    def jpegRowResized(id: Long, jpeg: Array[Byte], o: Int): Row = {
      val stored = GenVideoFixture.decodePx(jpeg)
      val disp = displayPx(stored, o)
      val (sp, ss, smn, smx, sg, se) = expectedStats(stored)
      val (ow, oh) = fitDims(disp(0).length, disp.length, 32, 32)
        .getOrElse(sys.error("row must exceed the resize box"))
      val small = downscale(disp, ow, oh)
      Row(id, "jpg", jpeg, decoded = true, stored(0).length, stored.length,
        Some(expectedAHash(disp)), Some(expectedDHash(disp)),
        r_resized = true, ow, oh,
        Some(expectedAHash(small)), Some(expectedDHash(small)),
        sp, ss, smn, smx, sg, se)
    }
    val bigScene = Array.tabulate(36, 48) { (y, x) =>
      val r2 = (x - 24) * (x - 24) * 100 / 576 + (y - 18) * (y - 18) * 100 / 324
      val v = math.min(255, 25 + r2 + ((x / 8 + y / 6) * 53) % 56)
      (v << 16) | (v << 8) | v
    }
    val rotatedBig = jpegRowResized(105L,
      withExifOrientation(
        GenVideoFixture.encodeJpeg(rot90cw(bigScene), 0.88f), 8), 8)
    require(rotatedBig.r_width == 32 && rotatedBig.r_height == 24,
      s"display-fit expected 32x24, got ${rotatedBig.r_width}x${rotatedBig.r_height}")

    // corrupt / hostile rows
    val truncated = {
      val whole = encodeLossless(drawCard(64, 64, 11), "png")
      Row(200L, "png", whole.take(40), decoded = false, 64, 64, None, None,
        r_resized = false, 64, 64, None, None, 0L, 0L, 0, 0, s_is_gray = false, 0L)
    }
    val bomb = Row(201L, "png", bombPng(100000, 100000), decoded = false,
      100000, 100000, None, None, r_resized = false, 100000, 100000, None, None,
      0L, 0L, 0, 0, s_is_gray = false, 0L)
    val garbage = Row(202L, "bin", Array.tabulate[Byte](64)(i => (i * 7).toByte),
      decoded = false, 0, 0, None, None, r_resized = false, 0, 0, None, None,
      0L, 0L, 0, 0, s_is_gray = false, 0L)

    val rows = cards ++ webpRows ++ Seq(webpTwin) ++ nearDups ++
      Seq(sameOtherFormat, upright, rotated, rotatedBig, truncated, bomb, garbage)

    // fixture-level sanity: at least one hamming<=3 pair exists among
    // DISTINCT decodable signatures, so the near-dup oracle is non-trivial
    val sigs = rows.filter(_.decoded).map(r => r.media_id -> r.dhash.get)
    val close = for { (ia, a) <- sigs; (ib, b) <- sigs if ia < ib
      if hamming(a, b) <= 3 } yield (ia, ib)
    require(close.nonEmpty, "fixture has no near-dup pair")
    println(s"near-dup pairs in fixture: $close")

    val out = "fixtures/image_phash.parquet"
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
