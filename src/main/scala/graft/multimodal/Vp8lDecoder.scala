package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM WebP-lossless (VP8L) still-image decoder — the pixel path for
  * the web-crawl image format the JDK's ImageIO cannot read. Implements
  * the public VP8L bitstream: LSB-first bit reading, canonical prefix
  * codes (simple and code-length-coded, with the 16/17/18 repeat tokens
  * and the max-symbol shortcut), meta-prefix code groups, the color
  * cache, LZ77 with the 120-entry two-dimensional distance map, and all
  * four transforms (predictor with its 14 modes and edge rules, color
  * transform, subtract-green, color indexing with sub-byte pixel
  * bundling).
  *
  * Every constant a decoder could get silently wrong — the distance map,
  * the predictor edge semantics, the color-transform channel packing and
  * signed delta arithmetic, the cache hash — was pinned EMPIRICALLY
  * against the system libwebp (7.1.5) by `tools/webp_probe.py` /
  * `tools/webp_feature_golden.py`, and the committed golden parquets
  * (real-encoder output and hand-built per-feature streams, each with
  * exact expected RGBA) hold the decoder to byte-exact output in
  * `Vp8lSpec`. Refuse-don't-guess: malformed streams, incomplete prefix
  * codes, out-of-range references, lossy (`VP8 `) and animated payloads
  * all return None — never approximate pixels.
  *
  * Memory/scale shape: one output Int per pixel plus O(palette + code
  * trees); allocation is gated by `maxPixels` BEFORE it happens
  * (decompression-bomb defense, same budget as
  * [[Multimodal.MaxHashPixels]]). Decode is a single linear pass per
  * image inside the caller's narrow mapPartitions — no Spark machinery
  * in here.
  *
  * reference: the reference engine (eu.smartdatalake.simsearch) has no
  * image support; this implements the public VP8L specification.
  */
object Vp8lDecoder {

  private object Truncated extends RuntimeException("vp8l: malformed") {
    override def fillInStackTrace(): Throwable = this
  }

  /** LSB-first bit reader (the VP8L convention, as in DEFLATE). */
  private final class Bits(data: Array[Byte], var pos: Int, end: Int) {
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var got = 0
      while (got < n) {
        if (pos >= end) throw Truncated
        val avail = 8 - bit
        val take = if (avail < n - got) avail else n - got
        v |= (((data(pos) & 0xff) >> bit) & ((1 << take) - 1)) << got
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        got += take
      }
      v
    }
    def read1(): Int = read(1)
  }

  private sealed trait Code { def read(br: Bits): Int }

  /** Zero-bit code: one symbol, nothing consumed. */
  private final class SingleCode(s: Int) extends Code {
    def read(br: Bits): Int = s
  }

  /** Two-symbol simple code — CANONICAL assignment: the numerically
    * smaller symbol gets code 0 regardless of the order the two were
    * written in the header (pinned against libwebp by Vp8lSpec: both
    * stream orders decode identically). */
  private final class PairCode(a: Int, b: Int) extends Code {
    private val lo = math.min(a, b)
    private val hi = math.max(a, b)
    def read(br: Bits): Int = if (br.read1() == 0) lo else hi
  }

  /** Canonical prefix code decoded by tree walk (first bit read = MSB of
    * the code, per the spec's ReadSymbol). Over- or under-subscribed
    * length sets refuse — libwebp accepts only complete codes (the
    * single-symbol case rides [[SingleCode]]). */
  private final class TreeCode(symbols: Array[Int], lengths: Array[Int])
      extends Code {
    // nodes as flat int pairs: 0 = absent, negative = leaf (~symbol),
    // positive = child pair index
    private val child: Array[Int] = {
      val order = symbols.indices.sortBy(i => (lengths(i), symbols(i)))
      val arr = new ArrayBuffer[Int]()
      arr += 0; arr += 0
      var code = 0L
      var prevLen = 0
      var kraft = 0.0
      for (i <- order) {
        val len = lengths(i)
        if (len <= 0 || len > 15) throw Truncated
        code <<= (len - prevLen)
        prevLen = len
        kraft += math.pow(2.0, -len)
        var node = 0
        var k = len - 1
        while (k >= 0) {
          val slot = node + ((code >> k) & 1L).toInt
          if (k == 0) {
            if (arr(slot) != 0) throw Truncated // overlapping codes
            arr(slot) = ~symbols(i)
          } else {
            if (arr(slot) < 0) throw Truncated
            if (arr(slot) == 0) {
              arr(slot) = arr.length
              arr += 0; arr += 0
            }
            node = arr(slot)
          }
          k -= 1
        }
        code += 1
      }
      if (math.abs(kraft - 1.0) > 1e-9) throw Truncated // incomplete code
      arr.toArray
    }
    def read(br: Bits): Int = {
      var node = 0
      while (true) {
        val v = child(node + br.read1())
        if (v < 0) return ~v
        if (v == 0) throw Truncated
        node = v
      }
      -1
    }
  }

  private def codeFromLengths(lengths: Array[Int]): Code = {
    val syms = ArrayBuffer[Int]()
    val lens = ArrayBuffer[Int]()
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { syms += i; lens += lengths(i) }
      i += 1
    }
    syms.length match {
      case 0 => throw Truncated
      case 1 => new SingleCode(syms(0))
      case _ => new TreeCode(syms.toArray, lens.toArray)
    }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code, simple or code-length-coded, per the spec. */
  private def readPrefixCode(br: Bits, alphabet: Int): Code = {
    if (br.read1() == 1) { // simple: 1 or 2 symbols
      val nSym = br.read1() + 1
      val s0 = if (br.read1() == 1) br.read(8) else br.read1()
      if (s0 >= alphabet) throw Truncated
      if (nSym == 1) new SingleCode(s0)
      else {
        val s1 = br.read(8)
        if (s1 >= alphabet || s0 == s1) throw Truncated
        new PairCode(s0, s1)
      }
    } else {
      val nCl = br.read(4) + 4
      if (nCl > ClOrder.length) throw Truncated
      val clLens = new Array[Int](19)
      var i = 0
      while (i < nCl) { clLens(ClOrder(i)) = br.read(3); i += 1 }
      val clCode = codeFromLengths(clLens)
      var maxSymbol =
        if (br.read1() == 1) {
          val nbits = 2 + 2 * br.read(3)
          2 + br.read(nbits)
        } else alphabet
      val lengths = new Array[Int](alphabet)
      var sym = 0
      var prevNz = 8
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) prevNz = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + br.read(2), prevNz)
            case 17 => (3 + br.read(3), 0)
            case 18 => (11 + br.read(7), 0)
            case _ => throw Truncated
          }
          if (sym + repeat > alphabet) throw Truncated
          var k = 0
          while (k < repeat) { lengths(sym) = value; sym += 1; k += 1 }
        }
      }
      codeFromLengths(lengths)
    }
  }

  /** LZ77 length/distance prefix-value coding. */
  private def lz77Value(br: Bits, sym: Int): Int = {
    if (sym < 0 || sym >= 40) throw Truncated
    if (sym < 4) sym + 1
    else {
      val extraBits = (sym - 2) >> 1
      val offset = (2 + (sym & 1)) << extraBits
      offset + br.read(extraBits) + 1
    }
  }

  /** Distance codes 1..120 -> (dx, dy) neighborhood offsets;
    * linear = max(1, dy * xsize + dx). Derived empirically from libwebp
    * 7.1.5 by tools/webp_probe.py (every entry observed, none recalled). */
  private val DistMap: Array[Int] = {
    val pairs = Array(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
      (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
      (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
      (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
      (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4),
      (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
      (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
      (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3),
      (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1),
      (2, 6), (-2, 6), (6, 2), (-6, 2), (4, 5), (-4, 5),
      (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
      (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5),
      (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
      (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
      (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
      (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
      (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7),
      (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7), (7, 6),
      (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))
    pairs.map { case (dx, dy) => (dy << 5) | (dx + 8) }
  }

  private def subSampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** One transform as read from the stream; `xsizeAtRead` is the
    * (possibly palette-reduced) width current when it was read — the
    * width its inverse operates at. */
  private final case class Transform(kind: Int, bits: Int,
      data: Array[Int], paletteSize: Int, xsizeAtRead: Int)

  /** One meta group's five prefix codes, in stream order. */
  private final class Group(br: Bits, cacheSize: Int) {
    val green: Code = readPrefixCode(br, 256 + 24 + cacheSize)
    val red: Code = readPrefixCode(br, 256)
    val blue: Code = readPrefixCode(br, 256)
    val alpha: Code = readPrefixCode(br, 256)
    val dist: Code = readPrefixCode(br, 40)
  }

  /** Decode one image stream (the main image at level 0 — with
    * transforms and meta prefixes — or an entropy-coded subimage).
    * Returns ARGB pixels at the ORIGINAL width x height. */
  private def decodeImageStream(br: Bits, xsize0: Int, ysize: Int,
      isLevel0: Boolean, maxPixels: Long): Array[Int] = {
    if (xsize0 <= 0 || ysize <= 0 || xsize0.toLong * ysize > maxPixels)
      throw Truncated
    var xsize = xsize0
    val transforms = ArrayBuffer[Transform]()
    if (isLevel0) {
      var seen = 0
      while (br.read1() == 1) {
        val t = br.read(2)
        if ((seen & (1 << t)) != 0) throw Truncated // each at most once
        seen |= 1 << t
        t match {
          case 0 | 1 => // PREDICTOR / COLOR_TRANSFORM: tiled subimage
            val bits = br.read(3) + 2
            val data = decodeImageStream(br, subSampleSize(xsize, bits),
              subSampleSize(ysize, bits), isLevel0 = false, maxPixels)
            transforms += Transform(t, bits, data, 0, xsize)
          case 2 => // SUBTRACT_GREEN: no data
            transforms += Transform(2, 0, null, 0, xsize)
          case _ => // COLOR_INDEXING: palette + pixel bundling
            val n = br.read(8) + 1
            val deltas = decodeImageStream(br, n, 1, isLevel0 = false,
              maxPixels)
            val palette = new Array[Int](n)
            var acc = 0
            var i = 0
            while (i < n) { // component-wise cumulative sum, mod 256
              acc = addPixels(acc, deltas(i))
              palette(i) = acc
              i += 1
            }
            val widthBits =
              if (n > 16) 0 else if (n > 4) 1 else if (n > 2) 2 else 3
            transforms += Transform(3, widthBits, palette, n, xsize)
            xsize = subSampleSize(xsize, widthBits)
        }
      }
    }
    val cacheBits =
      if (br.read1() == 1) {
        val b = br.read(4)
        if (b < 1 || b > 11) throw Truncated
        b
      } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    var metaBits = 0
    var meta: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (isLevel0 && br.read1() == 1) {
      metaBits = br.read(3) + 2
      metaW = subSampleSize(xsize, metaBits)
      meta = decodeImageStream(br, metaW, subSampleSize(ysize, metaBits),
        isLevel0 = false, maxPixels)
      var mx = 0
      var i = 0
      while (i < meta.length) { // meta code rides (red << 8) | green
        val c = (meta(i) >>> 8) & 0xffff
        if (c > mx) mx = c
        i += 1
      }
      numGroups = mx + 1
    }
    val groups = Array.fill(numGroups)(new Group(br, cacheSize))
    val total = xsize * ysize
    val out = new Array[Int](total)
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    var pos = 0
    var x = 0
    var y = 0
    while (pos < total) {
      val group =
        if (meta == null) groups(0)
        else groups((meta((y >> metaBits) * metaW + (x >> metaBits))
          >>> 8) & 0xffff)
      val s = group.green.read(br)
      if (s < 256) { // literal: green, then red, blue, alpha
        val r = group.red.read(br)
        val b = group.blue.read(br)
        val a = group.alpha.read(br)
        val p = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = p
        if (cache != null)
          cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
        pos += 1; x += 1; if (x == xsize) { x = 0; y += 1 }
      } else if (s < 256 + 24) { // LZ77 copy
        val len = lz77Value(br, s - 256)
        val dcode = lz77Value(br, group.dist.read(br))
        val dist =
          if (dcode > 120) dcode - 120
          else {
            val e = DistMap(dcode - 1)
            math.max(1, (e >> 5) * xsize + ((e & 31) - 8))
          }
        if (dist > pos || len > total - pos) throw Truncated
        var k = 0
        while (k < len) {
          val p = out(pos - dist)
          out(pos) = p
          if (cache != null)
            cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
          pos += 1; k += 1; x += 1; if (x == xsize) { x = 0; y += 1 }
        }
      } else { // color-cache reference
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) throw Truncated
        out(pos) = cache(idx)
        pos += 1; x += 1; if (x == xsize) { x = 0; y += 1 }
      }
    }
    // inverse transforms, last-read first
    var img = out
    var curW = xsize
    var ti = transforms.length - 1
    while (ti >= 0) {
      val tr = transforms(ti)
      tr.kind match {
        case 0 => inversePredictor(img, tr.xsizeAtRead, ysize, tr.bits, tr.data)
        case 1 => inverseColorTransform(img, tr.xsizeAtRead, ysize, tr.bits, tr.data)
        case 2 => inverseSubtractGreen(img)
        case _ =>
          img = inverseColorIndex(img, curW, tr.xsizeAtRead, ysize,
            tr.bits, tr.data)
      }
      curW = tr.xsizeAtRead
      ti -= 1
    }
    img
  }

  /** Per-channel addition mod 256 (two channels per int lane). */
  @inline private def addPixels(a: Int, b: Int): Int = {
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val ag = (((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
    (ag << 8) | rb
  }

  /** Per-channel floor average (the spec's Average2). */
  @inline private def average2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val c = clip255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
        ((tl >>> sh) & 0xff))
      out |= c << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      out |= clip255(a + (a - b) / 2) << sh
      sh += 8
    }
    out
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    var pl = 0
    var pt = 0
    var sh = 0
    while (sh < 32) {
      val cl = (l >>> sh) & 0xff
      val ct = (t >>> sh) & 0xff
      val p = cl + ct - ((tl >>> sh) & 0xff)
      pl += math.abs(p - cl)
      pt += math.abs(p - ct)
      sh += 8
    }
    if (pl < pt) l else t
  }

  private def inversePredictor(img: Array[Int], w: Int, h: Int,
      bits: Int, tiles: Array[Int]): Unit = {
    val tw = subSampleSize(w, bits)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (pos == 0) 0xff000000
          else if (y == 0) img(pos - 1) // top row: left
          else if (x == 0) img(pos - w) // left column: top
          else {
            val mode = (tiles((y >> bits) * tw + (x >> bits)) >>> 8) & 0xff
            val l = img(pos - 1)
            val t = img(pos - w)
            val tl = img(pos - w - 1)
            val tr = img(pos - w + 1) // x = w-1 wraps to this row's start
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => average2(average2(l, tr), t)
              case 6 => average2(l, tl)
              case 7 => average2(l, t)
              case 8 => average2(tl, t)
              case 9 => average2(t, tr)
              case 10 => average2(average2(l, tl), average2(t, tr))
              case 11 => select(t, l, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(average2(l, t), tl)
              case _ => throw Truncated
            }
          }
        img(pos) = addPixels(img(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  /** Signed (t * c) >> 5 color-transform delta — both operands int8. */
  @inline private def ctDelta(t: Int, c: Int): Int =
    (t.toByte * c.toByte) >> 5

  private def inverseColorTransform(img: Array[Int], w: Int, h: Int,
      bits: Int, tiles: Array[Int]): Unit = {
    val tw = subSampleSize(w, bits)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = tiles((y >> bits) * tw + (x >> bits))
        val g2r = e & 0xff          // blue channel of the transform pixel
        val g2b = (e >>> 8) & 0xff  // green channel
        val r2b = (e >>> 16) & 0xff // red channel
        val p = img(pos)
        val green = (p >>> 8) & 0xff
        val r = (((p >>> 16) & 0xff) + ctDelta(g2r, green)) & 0xff
        val b = ((p & 0xff) + ctDelta(g2b, green) + ctDelta(r2b, r)) & 0xff
        img(pos) = (p & 0xff00ff00) | (r << 16) | b
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(img: Array[Int]): Unit = {
    var i = 0
    while (i < img.length) {
      val p = img(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      img(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Unbundle packed indices (green channel) and map through the palette.
    * An index past the palette reads as transparent black, matching a
    * zero-padded palette (the encoder never emits one; a corrupt stream
    * degrades instead of refusing a mostly-valid image). */
  private def inverseColorIndex(img: Array[Int], packedW: Int, w: Int,
      h: Int, widthBits: Int, palette: Array[Int]): Array[Int] = {
    val out = new Array[Int](w * h)
    val perByte = 1 << widthBits
    val idxBits = 8 >> widthBits
    val idxMask = (1 << idxBits) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val packed = img(y * packedW + (x >> widthBits))
        val g = (packed >>> 8) & 0xff
        val idx = (g >>> ((x & (perByte - 1)) * idxBits)) & idxMask
        out(y * w + x) = if (idx < palette.length) palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Locate a VP8L chunk in a WebP RIFF container: plain `VP8L` files and
    * still `VP8X`-extended ones. Lossy (`VP8 `) and animated (`ANIM`)
    * containers return None — this decoder refuses what it cannot decode
    * exactly. */
  private def findVp8l(data: Array[Byte]): Option[(Int, Int)] = {
    def cc(i: Int): String =
      if (i + 4 <= data.length)
        new String(data, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    def le32(i: Int): Long =
      (data(i) & 0xffL) | ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) | ((data(i + 3) & 0xffL) << 24)
    if (data.length < 20 || cc(0) != "RIFF" || cc(8) != "WEBP") return None
    var i = 12
    while (i + 8 <= data.length) {
      val id = cc(i)
      val size = le32(i + 4)
      if (size > Int.MaxValue - 8) return None
      val body = i + 8
      id match {
        case "ANIM" | "ANMF" | "VP8 " => return None
        case "VP8L" =>
          return if (body + size <= data.length) Some((body, size.toInt))
            else None
        case _ => ()
      }
      i = body + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Decode a WebP payload's lossless pixels, or None for anything this
    * decoder cannot reproduce exactly (lossy, animated, malformed,
    * over-budget, truncated). */
  def decode(data: Array[Byte],
      maxPixels: Long = Multimodal.MaxHashPixels)
      : Option[java.awt.image.BufferedImage] = {
    try {
      findVp8l(data).flatMap { case (off, len) =>
        if (len < 5 || (data(off) & 0xff) != 0x2f) None
        else {
          val br = new Bits(data, off + 1, off + len)
          val w = br.read(14) + 1
          val h = br.read(14) + 1
          br.read1() // alpha hint
          if (br.read(3) != 0) None // version must be 0
          else if (w.toLong * h > maxPixels) None // bomb guard pre-alloc
          else {
            val px = decodeImageStream(br, w, h, isLevel0 = true, maxPixels)
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_ARGB)
            img.setRGB(0, 0, w, h, px, 0, w)
            Some(img)
          }
        }
      }
    } catch {
      case Truncated => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }
}
