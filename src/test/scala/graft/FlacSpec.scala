package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{FlacDecoder, Multimodal}

/** FLAC decoder spec: bit-exact round trips against the standalone test
  * encoder ([[FlacTestEncoder]] — an independent re-statement of the
  * published spec, never the engine's own code), CRC enforcement,
  * degrade-not-crash fuzzing, and the integration contract: FLAC payloads
  * flow through audioFingerprint / audioStats / audioSeqSignatures
  * exactly like their WAV twins. */
class FlacSpec extends SparkTestBase {
  import spark.implicits._

  private def decodeAll(data: Array[Byte]): Array[Byte] = {
    val ais = FlacDecoder.audioInputStream(data).get
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = ais.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = ais.read(buf) }
    out.toByteArray
  }

  test("round trip: every subframe type (constant, verbatim, fixed 0-4, " +
    "LPC, Rice escape, wasted bits) decodes bit-exactly across frame " +
    "boundaries") {
    val n = 3000
    val mono = Array(GenAudioFpFixture.synth(n, 11))
    val modes: Int => FlacTestEncoder.Mode = {
      case 0 => FlacTestEncoder.Verbatim
      case 1 => FlacTestEncoder.Fixed(0)
      case 2 => FlacTestEncoder.Fixed(1)
      case 3 => FlacTestEncoder.Fixed(2)
      case 4 => FlacTestEncoder.Fixed(3)
      case 5 => FlacTestEncoder.Fixed(4)
      case 6 => FlacTestEncoder.Lpc(Seq(2L, -1L), 0, 4)
      case 7 => FlacTestEncoder.Lpc(Seq(3L, -3L, 1L), 1, 5)
      case 8 => FlacTestEncoder.EscapeFixed(1, 18)
      case 9 => FlacTestEncoder.Rice2Fixed(2) // method 1: 5-bit params
      case _ => FlacTestEncoder.Auto
    }
    val flac = FlacTestEncoder.encode(mono, 16000, blockSize = 256,
      modes = modes)
    val si = FlacDecoder.parseStreamInfo(flac).get
    assert(si.sampleRate == 16000 && si.channels == 1 &&
      si.bitsPerSample == 16 && si.totalSamples == n)
    assert(java.util.Arrays.equals(decodeAll(flac),
      FlacTestEncoder.expectedPcm(mono)))
    // constant subframes: a flat region through Auto
    val flat = Array(Array.fill(600)(-1234) ++ Array.fill(424)(77))
    val flatFlac = FlacTestEncoder.encode(flat, 8000, blockSize = 512)
    assert(java.util.Arrays.equals(decodeAll(flatFlac),
      FlacTestEncoder.expectedPcm(flat)))
    // wasted bits: samples divisible by 4 -> 2 wasted bits
    val even = Array(GenAudioFpFixture.synth(1000, 12).map(v => (v / 4) * 4))
    val wastedFlac = FlacTestEncoder.encode(even, 8000, blockSize = 1000,
      modes = _ => FlacTestEncoder.Wasted(2))
    assert(java.util.Arrays.equals(decodeAll(wastedFlac),
      FlacTestEncoder.expectedPcm(even)))
  }

  test("stereo decorrelation: left/side, right/side and mid/side all " +
    "reconstruct the original channels bit-exactly") {
    val l = GenAudioFpFixture.synth(2100, 21)
    val r = GenAudioFpFixture.synth(2100, 22)
    val chans = Array(l, r)
    for (cm <- Seq(FlacTestEncoder.Independent, FlacTestEncoder.LeftSide,
        FlacTestEncoder.RightSide, FlacTestEncoder.MidSide)) {
      val flac = FlacTestEncoder.encode(chans, 44100, blockSize = 512,
        chanMode = cm)
      assert(java.util.Arrays.equals(decodeAll(flac),
        FlacTestEncoder.expectedPcm(chans)), s"mismatch under $cm")
    }
  }

  test("32-bit samples: independent channels decode bit-exactly at full " +
    "Int range; stereo decorrelation at 32 bps is refused, not misdecoded " +
    "(a 33-bit side channel cannot be stored exactly)") {
    val l = Array(Int.MaxValue, Int.MinValue, 123456789, -987654321) ++
      Array.tabulate(508)(i => (i - 254) * 8388607)
    val r = Array(Int.MinValue, Int.MaxValue, -123456789, 987654321) ++
      Array.tabulate(508)(i => (254 - i) * 8380417)
    val chans = Array(l, r)
    val indep = FlacTestEncoder.encode(chans, 48000, bps = 32,
      blockSize = 512, chanMode = FlacTestEncoder.Independent,
      modes = _ => FlacTestEncoder.Verbatim)
    assert(java.util.Arrays.equals(decodeAll(indep),
      FlacTestEncoder.expectedPcm(chans, bps = 32)))
    // mid/side at bps = 32: the side subframe is 33 bits wide — the old
    // Int intermediates decoded WRONG samples with a passing CRC; now the
    // whole stream refuses (zero frames), per the refuse-don't-guess
    // contract
    for (cm <- Seq(FlacTestEncoder.LeftSide, FlacTestEncoder.RightSide,
        FlacTestEncoder.MidSide)) {
      val flac = FlacTestEncoder.encode(chans, 48000, bps = 32,
        blockSize = 512, chanMode = cm,
        modes = _ => FlacTestEncoder.Verbatim)
      assert(decodeAll(flac).isEmpty, s"32-bit $cm must refuse")
    }
  }

  test("CRC enforcement: flipping one residual byte drops that frame and " +
    "everything after it (no garbage samples); a corrupt header CRC " +
    "yields zero frames; truncation serves only whole verified frames") {
    val mono = Array(GenAudioFpFixture.synth(2048, 31))
    val flac = FlacTestEncoder.encode(mono, 16000, blockSize = 1024)
    val whole = decodeAll(flac)
    assert(whole.length == 2048 * 2)
    // find the second frame's sync (0xFF 0xF8) after the first frame
    val si = FlacDecoder.parseStreamInfo(flac).get
    val secondSync = {
      var i = si.framesStart + 2
      while (!((flac(i) & 0xff) == 0xff && (flac(i + 1) & 0xf8) == 0xf8)) i += 1
      i
    }
    // corrupt a byte INSIDE the second frame's residual area
    val bad = flac.clone()
    bad(secondSync + 40) = (bad(secondSync + 40) ^ 0x55).toByte
    val partial = decodeAll(bad)
    assert(partial.length == 1024 * 2, "only the first verified frame serves")
    assert(java.util.Arrays.equals(partial, whole.take(1024 * 2)))
    // corrupt the FIRST frame's header crc byte: zero frames
    val badHdr = flac.clone()
    badHdr(si.framesStart + 5) = (badHdr(si.framesStart + 5) ^ 0x7f).toByte
    assert(decodeAll(badHdr).isEmpty)
    // truncation mid-second-frame: first frame still serves
    assert(java.util.Arrays.equals(decodeAll(flac.take(secondSync + 30)),
      whole.take(1024 * 2)))
  }

  test("degrade-not-crash: every prefix, random bytes, and garbage behind " +
    "the fLaC magic parse to None or serve only verified frames") {
    val flac = FlacTestEncoder.encode(
      Array(GenAudioFpFixture.synth(700, 41)), 8000, blockSize = 256)
    (0 to flac.length).foreach { k =>
      val p = flac.take(k)
      FlacDecoder.parseStreamInfo(p)
      FlacDecoder.audioInputStream(p).foreach { ais =>
        val buf = new Array[Byte](1024)
        while (ais.read(buf) > 0) ()
      }
    }
    val rnd = new scala.util.Random(5)
    (1 to 200).foreach { _ =>
      val b = Array.ofDim[Byte](4 + rnd.nextInt(300)); rnd.nextBytes(b)
      System.arraycopy("fLaC".getBytes("US-ASCII"), 0, b, 0, 4)
      FlacDecoder.audioInputStream(b).foreach { ais =>
        val buf = new Array[Byte](1024)
        while (ais.read(buf) > 0) ()
      }
    }
    // non-byte-aligned sample sizes are refused, not misdecoded
    val flac12 = flac.clone()
    // bps-1 field: STREAMINFO byte 12 low bit + byte 13 high nibble
    flac12(8 + 12) = (flac12(8 + 12) & 0xfe).toByte
    flac12(8 + 13) = ((flac12(8 + 13) & 0x0f) | (11 << 4)).toByte // bps 12
    assert(FlacDecoder.parseStreamInfo(flac12).isEmpty)
  }

  test("integration: a FLAC re-encode fingerprints/stats/windows exactly " +
    "like its WAV twin, and pairs with it at hamming 0 through the " +
    "near-dup join") {
    val samples = GenAudioFpFixture.synth(13000, 1) // same program as wav
    val wav = GenAudioFpFixture.wavBytes(Array(samples))
    val flac = FlacTestEncoder.encode(Array(samples), 16000,
      blockSize = 2048)
    val media = Seq((1L, "wav", wav), (2L, "flac", flac))
      .toDF("id", "kind", "data")
    val fp = Multimodal.audioFingerprint(media).collect()
      .map(r => r.id -> r).toMap
    assert(fp(1L).decoded && fp(2L).decoded)
    assert(fp(2L).sampleRate == 16000 && fp(2L).channels == 1 &&
      fp(2L).nFrames == 13000L)
    assert(fp(1L).afp == fp(2L).afp, "lossless re-encode must fingerprint identically")
    val pairs = graft.operators.Dedup.hammingPairs(
      Multimodal.audioFingerprint(media).toDF().where(col("decoded"))
        .select(col("id"), col("afp")), "id", "afp", maxHamming = 3)
      .collect()
    assert(pairs.length == 1 && pairs.head.getLong(2) == 0L)
    val st = Multimodal.audioStats(media).collect().map(r => r.id -> r).toMap
    assert(st(1L).peak == st(2L).peak && st(1L).absSum == st(2L).absSum &&
      st(1L).nSilence == st(2L).nSilence && st(1L).durationMs == st(2L).durationMs)
    val sq = Multimodal.audioSeqSignatures(media, windowMs = 250L)
      .collect().groupBy(_.id)
    assert(sq(1L).map(r => (r.window_idx, r.sig)).sortBy(_._1).toSeq ==
      sq(2L).map(r => (r.window_idx, r.sig)).sortBy(_._1).toSeq)
    // a 24-bit stereo mid/side FLAC decodes through the same loops
    val l24 = GenAudioFpFixture.synth(4000, 51).map(_ * 200)
    val r24 = GenAudioFpFixture.synth(4000, 52).map(_ * 200)
    val flac24 = FlacTestEncoder.encode(Array(l24, r24), 48000, bps = 24,
      blockSize = 1024, chanMode = FlacTestEncoder.MidSide)
    val row24 = Multimodal.audioFingerprint(
      Seq((3L, "flac", flac24)).toDF("id", "kind", "data")).collect().head
    assert(row24.decoded && row24.sampleRate == 48000 && row24.channels == 2)
    assert(row24.afp.get == GenAudioFpFixture.expectedFp(
      Array.tabulate(4000)(i => l24(i).toLong + r24(i).toLong)))
  }
}
