package graft

import java.io.ByteArrayOutputStream

/** Test-side FLAC ENCODER, re-implemented standalone from the published
  * FLAC specification (never by calling the engine's decoder) — the audio
  * twin of [[GenVideoFixture]]'s RIFF builder and [[GenMp4Fixture]]'s box
  * builder: fixtures and specs encode known samples with chosen subframe
  * types / channel assignments, and the engine's bit-exact round trip
  * proves the decoder against ground truth the generator computed.
  *
  * Coverage knobs: CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, Rice
  * residuals with chosen or adaptive parameters plus the escape (raw
  * bits) path, wasted bits, and independent / left-side / right-side /
  * mid-side channel assignments. CRC-8 and CRC-16 are computed here from
  * their published polynomials. */
object FlacTestEncoder {

  final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { // q zeros then a 1
      var i = 0
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def alignByte(): Unit = if (nbits != 0) writeBits(0, 8 - nbits)
    def bytes: Array[Byte] = {
      require(nbits == 0, "unaligned")
      out.toByteArray
    }
  }

  def crc8(b: Array[Byte]): Int = {
    var crc = 0
    b.foreach { x =>
      crc ^= x & 0xff
      (0 until 8).foreach { _ =>
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
          else (crc << 1) & 0xff
      }
    }
    crc
  }

  def crc16(b: Array[Byte]): Int = {
    var crc = 0
    b.foreach { x =>
      crc ^= (x & 0xff) << 8
      (0 until 8).foreach { _ =>
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
      }
    }
    crc
  }

  /** Per-subframe encoding choice. */
  sealed trait Mode
  case object Auto extends Mode       // constant if flat, else fixed-2
  case object Verbatim extends Mode
  final case class Fixed(order: Int) extends Mode
  /** Quantized-coefficient LPC: prediction = (sum coefs(j)*s[i-1-j]) >> shift. */
  final case class Lpc(coefs: Seq[Long], shift: Int, precision: Int) extends Mode
  /** Verbatim with the residual escape path is not expressible (escape is
    * a residual feature); EscapeFixed forces the raw-bits escape in the
    * Rice partition of a fixed-order subframe. */
  final case class EscapeFixed(order: Int, rawBits: Int) extends Mode
  /** Fixed-order subframe whose residual uses coding method 1 (RICE2:
    * 5-bit parameters, escape code 31). */
  final case class Rice2Fixed(order: Int) extends Mode
  /** Verbatim of right-shifted samples with `wasted` wasted bits — every
    * input sample must be divisible by 2^wasted. */
  final case class Wasted(wasted: Int) extends Mode

  /** Channel assignment for stereo input. */
  sealed trait ChanMode
  case object Independent extends ChanMode
  case object LeftSide extends ChanMode
  case object RightSide extends ChanMode
  case object MidSide extends ChanMode

  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else ((-v) << 1) - 1

  /** Smallest Rice parameter keeping every quotient under 48 bits of
    * unary (bounded expansion), capped at 14 (15 is the escape code). */
  private def riceParam(res: Seq[Long]): Int = {
    val maxZ = res.map(zigzag).foldLeft(0L)(math.max)
    var p = 0
    while (p < 14 && (maxZ >> p) > 48) p += 1
    p
  }

  private def encodeResidual(w: BitWriter, res: Seq[Long],
      escapeRaw: Option[Int], rice2: Boolean = false): Unit = {
    w.writeBits(if (rice2) 1 else 0, 2) // method: 4-bit vs 5-bit params
    val paramBits = if (rice2) 5 else 4
    w.writeBits(0, 4) // partition order 0: one partition
    escapeRaw match {
      case Some(raw) =>
        w.writeBits(if (rice2) 31 else 15, paramBits) // escape code
        w.writeBits(raw.toLong, 5)
        res.foreach(r => if (raw > 0) w.writeBits(r & ((1L << raw) - 1), raw))
      case None =>
        val p = riceParam(res)
        w.writeBits(p.toLong, paramBits)
        res.foreach { r =>
          val z = zigzag(r)
          w.writeUnary((z >> p).toInt)
          if (p > 0) w.writeBits(z & ((1L << p) - 1), p)
        }
    }
  }

  private def fixedResidual(s: Seq[Long], order: Int): Seq[Long] = order match {
    case 0 => s
    case 1 => s.indices.drop(1).map(i => s(i) - s(i - 1))
    case 2 => s.indices.drop(2).map(i => s(i) - 2 * s(i - 1) + s(i - 2))
    case 3 => s.indices.drop(3).map(i =>
      s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3))
    case 4 => s.indices.drop(4).map(i =>
      s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4))
  }

  private def encodeSubframe(w: BitWriter, samples: Array[Int], bps: Int,
      mode: Mode): Unit = {
    val s = samples.map(_.toLong).toSeq
    w.writeBits(0, 1) // padding
    mode match {
      case Auto if s.distinct.size == 1 =>
        w.writeBits(0, 6); w.writeBits(0, 1) // CONSTANT, no wasted bits
        w.writeBits(s.head & ((1L << bps) - 1), bps)
      case Auto =>
        encodeSubframeBody(w, s, bps, 2, None)
      case Verbatim =>
        w.writeBits(1, 6); w.writeBits(0, 1)
        s.foreach(v => w.writeBits(v & ((1L << bps) - 1), bps))
      case Wasted(k) =>
        require(s.forall(v => (v & ((1L << k) - 1)) == 0L),
          s"samples not divisible by 2^$k")
        w.writeBits(1, 6)             // VERBATIM type
        w.writeBits(1, 1)             // wasted-bits flag
        w.writeUnary(k - 1)           // k = unary + 1
        val eBps = bps - k
        s.foreach(v => w.writeBits((v >> k) & ((1L << eBps) - 1), eBps))
      case Fixed(order) =>
        encodeSubframeBody(w, s, bps, order, None)
      case Rice2Fixed(order) =>
        encodeSubframeBody(w, s, bps, order, None, rice2 = true)
      case EscapeFixed(order, raw) =>
        encodeSubframeBody(w, s, bps, order, Some(raw))
      case Lpc(coefs, shift, precision) =>
        val order = coefs.length
        w.writeBits(32L + order - 1, 6); w.writeBits(0, 1)
        s.take(order).foreach(v => w.writeBits(v & ((1L << bps) - 1), bps))
        w.writeBits(precision.toLong - 1, 4)
        w.writeBits(shift.toLong & 0x1f, 5)
        coefs.foreach(c => w.writeBits(c & ((1L << precision) - 1), precision))
        val res = s.indices.drop(order).map { i =>
          val pred = coefs.zipWithIndex.map { case (c, j) =>
            c * s(i - 1 - j) }.sum >> shift
          s(i) - pred
        }
        encodeResidual(w, res, None)
    }
  }

  private def encodeSubframeBody(w: BitWriter, s: Seq[Long], bps: Int,
      order: Int, escapeRaw: Option[Int], rice2: Boolean = false): Unit = {
    w.writeBits(8L + order, 6); w.writeBits(0, 1)
    s.take(order).foreach(v => w.writeBits(v & ((1L << bps) - 1), bps))
    encodeResidual(w, fixedResidual(s, order), escapeRaw, rice2)
  }

  private def sampleSizeCode(bps: Int): Int = bps match {
    case 8 => 1
    case 16 => 4
    case 24 => 6
    case 32 => 7
    case _ => 0 // not directly expressible: get from STREAMINFO
  }

  /** Encode per-channel samples as one FLAC stream. `modes(frameIdx)`
    * picks each frame's subframe encoding (applied to every channel). */
  def encode(chans: Array[Array[Int]], sampleRate: Int, bps: Int = 16,
      blockSize: Int = 1024, chanMode: ChanMode = Independent,
      modes: Int => Mode = _ => Auto): Array[Byte] = {
    val n = chans(0).length
    require(chans.forall(_.length == n))
    require(chanMode == Independent || chans.length == 2)
    val out = new ByteArrayOutputStream()
    // ---- fLaC magic + STREAMINFO (single, last, metadata block)
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    si.writeBits(1, 1); si.writeBits(0, 7); si.writeBits(34, 24)
    si.writeBits(blockSize.toLong, 16)   // min block
    si.writeBits(blockSize.toLong, 16)   // max block
    si.writeBits(0, 24); si.writeBits(0, 24) // frame byte sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits(chans.length.toLong - 1, 3)
    si.writeBits(bps.toLong - 1, 5)
    si.writeBits(n.toLong, 36)
    (0 until 16).foreach(_ => si.writeBits(0, 8)) // md5 unset
    out.write(si.bytes)
    // ---- frames
    var frameIdx = 0
    var off = 0
    while (off < n) {
      val len = math.min(blockSize, n - off)
      val w = new BitWriter
      w.writeBits(0x3ffe, 14)       // sync
      w.writeBits(0, 1); w.writeBits(0, 1) // reserved, fixed blocking
      w.writeBits(7, 4)             // block size: 16-bit value at end
      w.writeBits(0, 4)             // sample rate: from STREAMINFO
      val chCode = chanMode match {
        case Independent => chans.length - 1
        case LeftSide => 8
        case RightSide => 9
        case MidSide => 10
      }
      w.writeBits(chCode.toLong, 4)
      w.writeBits(sampleSizeCode(bps).toLong, 3)
      w.writeBits(0, 1)             // reserved
      require(frameIdx < 128, "test encoder: single-byte frame numbers only")
      w.writeBits(frameIdx.toLong, 8)
      w.writeBits(len.toLong - 1, 16)
      val headerBytes = w.bytes
      val w2 = new BitWriter
      headerBytes.foreach(b => w2.writeBits(b & 0xffL, 8))
      w2.writeBits(crc8(headerBytes).toLong, 8)
      // subframes (stereo decorrelation computed here, independently)
      val mode = modes(frameIdx)
      val slice = chans.map(c => c.slice(off, off + len))
      chanMode match {
        case Independent =>
          slice.foreach(ch => encodeSubframe(w2, ch, bps, mode))
        case LeftSide =>
          val side = Array.tabulate(len)(i => slice(0)(i) - slice(1)(i))
          encodeSubframe(w2, slice(0), bps, mode)
          encodeSubframe(w2, side, bps + 1, mode)
        case RightSide =>
          val side = Array.tabulate(len)(i => slice(0)(i) - slice(1)(i))
          encodeSubframe(w2, side, bps + 1, mode)
          encodeSubframe(w2, slice(1), bps, mode)
        case MidSide =>
          // Long sum: l + r is a (bps + 1)-bit value, so Int wraps at
          // bps = 31 extremes; mid itself fits bps bits after the shift
          val mid = Array.tabulate(len)(i =>
            ((slice(0)(i).toLong + slice(1)(i).toLong) >> 1).toInt)
          val side = Array.tabulate(len)(i => slice(0)(i) - slice(1)(i))
          encodeSubframe(w2, mid, bps, mode)
          encodeSubframe(w2, side, bps + 1, mode)
      }
      w2.alignByte()
      val frameBytes = w2.bytes
      out.write(frameBytes)
      val c16 = crc16(frameBytes)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      off += len
      frameIdx += 1
    }
    out.toByteArray
  }

  /** The expected PCM little-endian byte stream for decoded samples —
    * what the engine's AudioInputStream must serve byte-for-byte. */
  def expectedPcm(chans: Array[Array[Int]], bps: Int = 16): Array[Byte] = {
    val bytesPer = bps / 8
    val n = chans(0).length
    val out = new Array[Byte](n * chans.length * bytesPer)
    var o = 0
    for (i <- 0 until n; c <- chans.indices) {
      var v = chans(c)(i)
      (0 until bytesPer).foreach { _ => out(o) = (v & 0xff).toByte; v >>= 8; o += 1 }
    }
    out
  }
}
