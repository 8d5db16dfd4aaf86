package graft

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/audio_fp.parquet` — committed ground
  * truth for the q_audio_fp / q_audio_neardup oracles. Each decodable row
  * is a REAL WAV the JDK's own AudioSystem wrote from synthesized PCM
  * samples — or a REAL FLAC the standalone [[FlacTestEncoder]] wrote from
  * the same kind of samples (lossless, so the raw samples stay the ground
  * truth); the expected fingerprint is computed HERE from those raw
  * samples with the windowed-energy arithmetic re-implemented standalone
  * (never by calling the engine), so the engine's hash-match proves
  * container parse + PCM extraction + windowing + bit extraction end to
  * end. WAV stores PCM 1:1, so round-trip losslessness is structural; the
  * generator still re-reads each payload and asserts sample equality.
  *
  * Rows include planted near-duplicates (amplitude edits confined to a few
  * windows, calibrated until the fingerprint Hamming distance lands in
  * 1..3), an identical-samples stereo re-encode, and corrupt rows
  * (truncated container, float-format WAV, garbage) proving the
  * degrade-to-undecoded contract.
  *
  * Run once: `sbt "Test/runMain graft.GenAudioFpFixture"`, commit the
  * parquet. Deterministic: seeded content, fixed sizes, one output file.
  */
object GenAudioFpFixture {

  // ---- standalone expected-fingerprint arithmetic

  /** mixed(frame) = channel sum; 65 floor-partition windows; bit i set iff
    * floor-mean |mixed| of window i > window i+1. */
  def expectedFp(mixed: Array[Long]): Long = {
    val n = mixed.length.toLong
    val sums = new Array[Long](65); val cnts = new Array[Long](65)
    for (f <- mixed.indices) {
      val w = (f * 65L / n).toInt
      sums(w) += math.abs(mixed(f)); cnts(w) += 1
    }
    val mean = (0 until 65).map(i => if (cnts(i) == 0) 0L else sums(i) / cnts(i))
    (0 until 64).foldLeft(0L) { (acc, i) =>
      if (mean(i) > mean(i + 1)) acc | (1L << i) else acc
    }
  }

  // ---- synthesis + encoding

  /** Seeded 16-bit sample pattern with a blockwise-varying envelope, so the
    * 65 window means genuinely differ (a flat tone would fingerprint to the
    * all-zero contentless code). */
  def synth(nFrames: Int, seed: Int): Array[Int] =
    Array.tabulate(nFrames) { t =>
      val env = 2000 + 1500 * (((t / 512) * 2654435761L + seed) >>> 60).toInt
      val osc = ((t * (seed % 7 + 3)) % 64) - 32
      val v = env / 8 * osc / 4 + ((t * 31 + seed) % 97)
      math.max(-32768, math.min(32767, v))
    }

  def wavBytes(chans: Array[Array[Int]], sampleRate: Float = 16000f): Array[Byte] = {
    val ch = chans.length
    val n = chans(0).length
    val pcm = new Array[Byte](n * ch * 2)
    for (f <- 0 until n; c <- 0 until ch) {
      val v = chans(c)(f)
      pcm((f * ch + c) * 2) = (v & 0xff).toByte
      pcm((f * ch + c) * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, ch, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    val bytes = out.toByteArray
    // structural losslessness check: decode and compare every sample
    val back = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    val readback = back.readAllBytes()
    require(java.util.Arrays.equals(readback, pcm), "WAV round-trip mismatch")
    bytes
  }

  /** 8-bit UNSIGNED mono WAV (the spec's 8-bit convention) from centered
    * sample values in -128..127. */
  def wav8Bytes(samples: Array[Int]): Array[Byte] = {
    val pcm = samples.map(v => ((v + 128) & 0xff).toByte)
    val fmt = new AudioFormat(8000f, 8, 1, false, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** An IEEE-float WAV (format tag 3, 32-bit mono) hand-built per the
    * RIFF spec — a real encoding the engine now decodes by mapping each
    * sample onto the 16-bit integer lattice. */
  def floatWav(samples: Array[Float], rate: Int = 8000): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    val dataLen = samples.length * 4
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(3); le16(1); le32(rate); le32(rate * 4); le16(4); le16(32)
    ascii("data"); le32(dataLen)
    samples.foreach(f => le32(java.lang.Float.floatToIntBits(f)))
    out.toByteArray
  }

  /** The published float-to-lattice mapping, re-implemented standalone:
    * floor(f * 32768) clamped to [-32768, 32767], NaN -> 0. */
  def lattice(f: Float): Long =
    if (f.isNaN) 0L
    else math.max(-32768.0, math.min(32767.0, math.floor(f * 32768.0))).toLong

  /** Expected quality stats from the raw per-channel samples (frames x
    * channels), re-implemented standalone: (duration_ms, peak, abs_sum,
    * n_silence, n_clipped) with hi/lo the 16-bit (or given) extremes. */
  def expectedStats(chans: Array[Array[Int]], rate: Int, bits: Int = 16)
      : (Long, Long, Long, Long, Long) = {
    val hi = (1L << (bits - 1)) - 1; val lo = -(1L << (bits - 1))
    val n = chans(0).length
    var peak = 0L; var absSum = 0L; var sil = 0L; var clip = 0L
    for (f <- 0 until n) {
      var allZero = true; var clipped = false
      for (c <- chans.indices) {
        val v = chans(c)(f).toLong
        val a = math.abs(v)
        if (a > peak) peak = a
        absSum += a
        if (v != 0L) allZero = false
        if (v == hi || v == lo) clipped = true
      }
      if (allZero) sil += 1
      if (clipped) clip += 1
    }
    (n.toLong * 1000L / rate, peak, absSum, sil, clip)
  }

  final case class FxRow(media_id: Long, kind: String, data: Array[Byte],
      decoded: Boolean, sample_rate: Int, channels: Int, n_frames: Long,
      afp: Option[Long],
      s_duration_ms: Long, s_peak: Long, s_abs_sum: Long,
      s_n_silence: Long, s_n_clipped: Long)

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-audio-fp-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    def monoRow(id: Long, samples: Array[Int], rate: Float = 16000f): FxRow = {
      val (dm, pk, as_, sl, cl) = expectedStats(Array(samples), rate.toInt)
      FxRow(id, "wav", wavBytes(Array(samples), rate), decoded = true,
        rate.toInt, 1, samples.length.toLong,
        Some(expectedFp(samples.map(_.toLong))), dm, pk, as_, sl, cl)
    }

    val base = synth(13000, 1)
    val rows = Seq(
      monoRow(0L, base),
      monoRow(1L, synth(8000, 2)),
      monoRow(2L, synth(20000, 3), 44100f),
      monoRow(3L, synth(650, 4)),      // exactly 10 frames per window
      monoRow(4L, synth(40, 5))        // fewer frames than windows
    ) ++ {
      // stereo: same program on both channels, fingerprint of the SUM
      val l = synth(9000, 6); val r = synth(9000, 7)
      val (dm, pk, as_, sl, cl) = expectedStats(Array(l, r), 16000)
      Seq(FxRow(5L, "wav", wavBytes(Array(l, r)), decoded = true, 16000, 2,
        9000L, Some(expectedFp(
          Array.tabulate(9000)(f => l(f).toLong + r(f).toLong))),
        dm, pk, as_, sl, cl))
    } ++ {
      // 8-bit unsigned mono: engine must center before |.|
      val s8 = Array.tabulate(4000)(t => ((t * 17 + 3) % 251) - 125)
      val (dm, pk, as_, sl, cl) = expectedStats(Array(s8), 8000, bits = 8)
      Seq(FxRow(6L, "wav", wav8Bytes(s8), decoded = true, 8000, 1, 4000L,
        Some(expectedFp(s8.map(_.toLong))), dm, pk, as_, sl, cl))
    } ++ {
      // planted near-dups of row 0: scale a window-aligned region's
      // amplitude until the fingerprint moves by 1..3 bits
      val baseFp = expectedFp(base.map(_.toLong))
      def perturb(id: Long, w0: Int, w1: Int): FxRow = {
        val n = base.length
        val edited = (1 to 95).iterator.flatMap(p => Seq(p, -p)).map { pct =>
          Array.tabulate(n) { f =>
            val w = (f * 65L / n).toInt
            if (w >= w0 && w < w1)
              math.max(-32768, math.min(32767, base(f) * (100 + pct) / 100))
            else base(f)
          }
        }.find { s =>
          val hd = hamming(expectedFp(s.map(_.toLong)), baseFp)
          hd >= 1 && hd <= 3
        }.getOrElse(sys.error("no amplitude edit landed in hamming 1..3"))
        monoRow(id, edited)
      }
      Seq(perturb(100L, 10, 12), perturb(101L, 40, 43))
    } ++ {
      // planted silence run + hard-clipped frames: the gate signals
      val gated = Array.tabulate(5000) { t =>
        if (t >= 1000 && t < 1500) 0
        else if (t % 997 == 0) (if (t % 2 == 0) 32767 else -32768)
        else synth(5000, 8)(t)
      }
      Seq(monoRow(7L, gated))
    } ++ {
      // IEEE-float WAV: a real float program (an integer program scaled by
      // 2^-15 maps back onto exactly those integers — v/32768f is exact in
      // float) plus clamp (|f| >= 1) and NaN edge samples the lattice
      // mapping must pin
      val ints = synth(3000, 10)
      val fs = Array.tabulate(3000) { t =>
        if (t == 100) 1.5f
        else if (t == 200) -2.0f
        else if (t == 300) Float.NaN
        else ints(t) / 32768f
      }
      val lat = fs.map(lattice)
      val (dm, pk, as_, sl, cl) = expectedStats(Array(lat.map(_.toInt)), 8000)
      Seq(FxRow(8L, "wav", floatWav(fs), decoded = true, 8000, 1, 3000L,
        Some(expectedFp(lat)), dm, pk, as_, sl, cl))
    } ++ {
      // FLAC rows (the pure-JVM decoder): 9 = a LOSSLESS re-encode of row
      // 0's exact samples — it must fingerprint IDENTICALLY and pair with
      // the WAV original at hamming 0 in the near-dup oracle (the
      // compressed-vs-uncompressed dup case a real corpus is full of);
      // 10 = stereo mid/side with fixed+LPC subframes, fingerprint of the
      // channel sum. Expected values come from the RAW samples —
      // lossless, so the samples ARE the ground truth.
      val (dm9, pk9, as9, sl9, cl9) = expectedStats(Array(base), 16000)
      val l = synth(7000, 61); val r = synth(7000, 62)
      val (dm10, pk10, as10, sl10, cl10) = expectedStats(Array(l, r), 22050)
      Seq(
        FxRow(9L, "flac", FlacTestEncoder.encode(Array(base), 16000,
            blockSize = 2048), decoded = true, 16000, 1, 13000L,
          Some(expectedFp(base.map(_.toLong))), dm9, pk9, as9, sl9, cl9),
        FxRow(10L, "flac", FlacTestEncoder.encode(Array(l, r), 22050,
            blockSize = 1024, chanMode = FlacTestEncoder.MidSide,
            modes = i => if (i % 2 == 0) FlacTestEncoder.Fixed(2)
              else FlacTestEncoder.Lpc(Seq(2L, -1L), 0, 4)),
          decoded = true, 22050, 2, 7000L,
          Some(expectedFp(Array.tabulate(7000)(f => l(f).toLong + r(f).toLong))),
          dm10, pk10, as10, sl10, cl10))
    } ++ Seq(
      // garbage behind the fLaC magic: STREAMINFO malformed, refused
      FxRow(203L, "flac", "fLaC".getBytes("US-ASCII") ++
          Array.tabulate[Byte](60)(i => (i * 7).toByte),
        decoded = false, 0, 0, 0L, None, 0L, 0L, 0L, 0L, 0L),
      // corrupt / refused rows
      // cut INSIDE the header (before fmt completes): no parse at all — a
      // cut inside the data section is legitimately decodable as a shorter
      // clip, which the engine's min(header, available) handles, so it
      // would not test the refuse path
      FxRow(200L, "wav", wavBytes(Array(synth(2000, 9))).take(20),
        decoded = false, 0, 0, 0L, None, 0L, 0L, 0L, 0L, 0L),

      FxRow(202L, "bin", Array.tabulate[Byte](80)(i => (i * 11).toByte),
        decoded = false, 0, 0, 0L, None, 0L, 0L, 0L, 0L, 0L))

    // sanity: the near-dup oracle is non-trivial and base/others are far
    val sigs = rows.filter(_.decoded).map(r => r.media_id -> r.afp.get)
    val close = for { (ia, a) <- sigs; (ib, b) <- sigs if ia < ib
      if hamming(a, b) <= 3 } yield (ia, ib)
    require(close.nonEmpty, "fixture has no audio near-dup pair")
    println(s"near-dup pairs in fixture: $close")

    val out = "fixtures/audio_fp.parquet"
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
