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

  test("parseDimensions: WebP (VP8/VP8L/VP8X) and AVIF containers yield " +
    "their encoded dimensions; truncation and bad signatures yield None") {
    // dims exercise the 14-bit (lossy/lossless) and 24-bit (VP8X) widths
    for ((w, h) <- Seq((1, 1), (333, 77), (16383, 9000))) {
      for (flavor <- Seq("VP8 ", "VP8L")) {
        val b = GenMultimodalFixture.makeWebp(flavor, w, h, w + h)
        assert(Multimodal.parseDimensions(b).contains((w, h)),
          s"$flavor ${w}x$h: got ${Multimodal.parseDimensions(b)}")
      }
      assert(Multimodal.parseDimensions(GenMultimodalFixture.makeAvif(w, h))
        .contains((w, h)))
    }
    for ((w, h) <- Seq((1, 1), (700000, 123456), (16777216, 16777216)))
      assert(Multimodal.parseDimensions(
        GenMultimodalFixture.makeWebp("VP8X", w, h, w % 97)).contains((w, h)))
    // a corrupted VP8 sync code or VP8L signature must not parse
    val lossy = GenMultimodalFixture.makeWebp("VP8 ", 64, 48, 3)
    lossy(23) = 0x00
    assert(Multimodal.parseDimensions(lossy).isEmpty)
    val lossless = GenMultimodalFixture.makeWebp("VP8L", 64, 48, 3)
    lossless(20) = 0x00
    assert(Multimodal.parseDimensions(lossless).isEmpty)
    // an AVIF whose meta walk never reaches ispe -> None, not a crash
    val noIspe = GenMultimodalFixture.makeAvif(10, 10).take(40)
    assert(Multimodal.parseDimensions(noIspe).isEmpty)
    // a non-avif ISO-BMFF brand stays with the AV parser, not this one
    val mp4ish = GenMultimodalFixture.makeAvif(10, 10).clone()
    System.arraycopy("isom".getBytes("US-ASCII"), 0, mp4ish, 8, 4)
    assert(Multimodal.parseDimensions(mp4ish).isEmpty)
  }

  test("parseDimensions: multi-item AVIF resolves the PRIMARY item's ispe " +
    "via pitm -> ipma (not the thumbnail's, which sits first in ipco), " +
    "across pitm v0/v1, narrow/wide property indexes, and the avis brand; " +
    "a malformed ipma falls back to the first ispe") {
    // thumbnail 160x90 is ipco property 1; primary 3840x2160 is property 2
    val multi = GenMultimodalFixture.makeAvifMulti(160, 90, 3840, 2160)
    assert(Multimodal.parseDimensions(multi).contains((3840, 2160)),
      s"got ${Multimodal.parseDimensions(multi)}")
    assert(Multimodal.parseDimensions(GenMultimodalFixture.makeAvifMulti(
      320, 240, 7680, 4320, pitmV1 = true, wideIdx = true))
      .contains((7680, 4320)))
    assert(Multimodal.parseDimensions(GenMultimodalFixture.makeAvifMulti(
      64, 64, 1024, 768, brand = "avis")).contains((1024, 768)))
    // zero out ipma's entry count: association lookup fails, and the walk
    // degrades to the single-item behavior (first ispe = the thumbnail)
    // instead of None — a parse beats a stub for a merely-odd file
    val broken = GenMultimodalFixture.makeAvifMulti(160, 90, 3840, 2160)
    val ipmaAt = {
      val s = new String(broken, java.nio.charset.StandardCharsets.ISO_8859_1)
      s.indexOf("ipma")
    }
    java.util.Arrays.fill(broken, ipmaAt + 8, ipmaAt + 12, 0.toByte)
    assert(Multimodal.parseDimensions(broken).contains((160, 90)))
    // animated WebP: the VP8X canvas, ANIM flag and chunk notwithstanding
    assert(Multimodal.parseDimensions(
      GenMultimodalFixture.makeWebpAnim(1920, 1080)).contains((1920, 1080)))
  }

  test("parseDimensions: BMP (info/core/top-down) and TIFF (II SHORT via " +
    "the JDK writer, MM LONG hand-built) recover encoded dimensions; " +
    "text that happens to start with a magic degrades to None") {
    // real JDK encoders
    val bmpImg = GenMultimodalFixture.makeImage(7)
    assert(Multimodal.parseDimensions(
      GenMultimodalFixture.encode(bmpImg, "bmp"))
      .contains((bmpImg.getWidth, bmpImg.getHeight)))
    val tifImg = GenMultimodalFixture.makeImage(9)
    assert(Multimodal.parseDimensions(
      GenMultimodalFixture.encode(tifImg, "tiff"))
      .contains((tifImg.getWidth, tifImg.getHeight)))
    // hand-built layouts the JDK never writes
    assert(Multimodal.parseDimensions(
      GenMultimodalFixture.makeTiffMM(70000, 42)).contains((70000, 42)))
    assert(Multimodal.parseDimensions(
      GenMultimodalFixture.makeBmp(641, 482, core = true))
      .contains((641, 482)))
    // top-down BMP: NEGATIVE height encodes row order; magnitude reported
    assert(Multimodal.parseDimensions(
      GenMultimodalFixture.makeBmp(333, 777, topDown = true))
      .contains((333, 777)))
    // plain text starting with the magic letters lacks the NUL-bearing
    // header bytes -> stub branch, not a bogus parse
    assert(Multimodal.parseDimensions(
      ("BM this text is long enough to reach the dib size field easily"
        ).getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseDimensions(
      "MM not actually a tiff file at all".getBytes("UTF-8")).isEmpty)
    // truncated IFD: bails to None instead of reading out of bounds
    assert(Multimodal.parseDimensions(
      GenMultimodalFixture.makeTiffMM(70000, 42).take(12)).isEmpty)
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

  test("parseAvMeta: WAV written by the JDK's own encoder yields the " +
    "exact sample rate, channels, and duration") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    for ((sr, ch, nFrames) <- Seq((8000, 1, 1600), (44100, 2, 4410), (48000, 2, 9600))) {
      val fmt = new AudioFormat(sr.toFloat, 16, ch, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      new scala.util.Random(sr).nextBytes(pcm)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
        AudioFileFormat.Type.WAVE, out)
      val m = Multimodal.parseAvMeta(out.toByteArray)
      assert(m.contains(Multimodal.AvInfo("wav", 0, 0,
        nFrames.toLong * 1000L / sr, sr, ch)), s"$sr/$ch/$nFrames: $m")
    }
    // truncated WAV (header cut inside fmt): no sample rate -> stub route
    val w = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](320)), fmt, 160L),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    assert(Multimodal.parseAvMeta(w.take(16)).isEmpty)
  }

  test("parseAvMeta: MP4 box walk recovers tkhd geometry and mvhd " +
    "duration for v0/v1 boxes and moov-after-mdat; corrupt streams stub") {
    // reuse the fixture generator's independent box builder
    def file(v: Int, ts: Long, dur: Long, w: Int, h: Int, moovFirst: Boolean) =
      GenAvFixture.mp4(v, ts, dur, w, h, moovFirst)
    for (v <- Seq(0, 1); moovFirst <- Seq(true, false)) {
      val bytes = file(v, 90000L, 271234L, 1920, 1080, moovFirst)
      val m = Multimodal.parseAvMeta(bytes)
      assert(m.contains(Multimodal.AvInfo("mp4", 1920, 1080,
        271234L * 1000L / 90000L, 0, 0)), s"v$v moovFirst=$moovFirst: $m")
    }
    val full = file(0, 1000L, 5000L, 640, 480, true)
    assert(Multimodal.parseAvMeta(full.take(full.length / 3)).isEmpty,
      "truncated mid-moov must degrade to the stub, not throw")
    assert(Multimodal.parseAvMeta("RIFFxxxxJUNK".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseAvMeta(Array[Byte]()).isEmpty)
  }

  test("parseAvMeta: WebM/Matroska EBML walk recovers geometry, duration, " +
    "and audio parameters; unknown-size Segments and both doctypes work; " +
    "truncation stubs") {
    for (unknown <- Seq(false, true); dt <- Seq("webm", "matroska")) {
      val bytes = GenAvFixture.webm(1280, 720, 84500f, 1000000L, 48000f, 2,
        docType = dt, unknownSegmentSize = unknown)
      val m = Multimodal.parseAvMeta(bytes)
      assert(m.contains(Multimodal.AvInfo(dt, 1280, 720,
        GenAvFixture.webmDurationMs(84500f, 1000000L), 48000, 2)),
        s"unknown=$unknown dt=$dt: $m")
    }
    // a non-default TimestampScale rescales the float duration
    val scaled = GenAvFixture.webm(640, 360, 1000f, 500000L, 44100f, 1)
    assert(Multimodal.parseAvMeta(scaled).get.durationMs == 500L)
    val full = GenAvFixture.webm(640, 360, 9999f, 1000000L, 48000f, 2)
    assert(Multimodal.parseAvMeta(full.take(full.length / 2)).isEmpty,
      "truncated mid-element must degrade to the stub, not throw")
  }

  test("parseAvMeta: MP3 frame header tables (MPEG1/MPEG2, mono/stereo, " +
    "behind ID3v2) and FLAC STREAMINFO; spec violations stub") {
    // MPEG1 Layer III, 128 kbps, 44100 Hz, stereo, bare stream
    val m1 = Multimodal.parseAvMeta(GenAvFixture.mp3(3, 9, 0, mono = false, 8000))
    assert(m1.contains(Multimodal.AvInfo("mp3", 0, 0,
      8000L * 8 / 128, 44100, 2)), m1.toString)
    // MPEG2 tables, mono, behind an ID3v2 tag the parser must skip
    val m2 = Multimodal.parseAvMeta(GenAvFixture.mp3(2, 9, 1, mono = true,
      6000, id3Pad = 321))
    assert(m2.contains(Multimodal.AvInfo("mp3", 0, 0,
      6000L * 8 / GenAvFixture.mp3Kbps(2, 9).toLong,
      GenAvFixture.mp3SampleRate(2, 1), 1)), m2.toString)
    // free-format (bitrate index 0) and bad sample-rate index: stub
    assert(Multimodal.parseAvMeta(GenAvFixture.mp3(3, 0, 0, mono = false, 4000)).isEmpty)
    // FLAC: exact duration from the 36-bit total-sample count
    val f = Multimodal.parseAvMeta(GenAvFixture.flac(96000, 2, 960000L))
    assert(f.contains(Multimodal.AvInfo("flac", 0, 0, 10000L, 96000, 2)), f.toString)
    // first metadata block not STREAMINFO: spec violation, stub
    assert(Multimodal.parseAvMeta(
      GenAvFixture.flac(44100, 2, 1L, streamInfoFirst = false)).isEmpty)
  }

  test("parseAvMeta: animated WebP sums ANMF frame durations over the " +
    "VP8X canvas; still WebP and frameless ANIM stub") {
    // three frames of 33/100/250 ms over a 640x360 canvas
    val a = Multimodal.parseAvMeta(
      GenAvFixture.webpAnim(640, 360, Seq(33, 100, 250)))
    assert(a.contains(Multimodal.AvInfo("webp", 640, 360, 383L, 0, 0)), a.toString)
    // single frame, odd-length ANMF payload (RIFF pad byte exercised)
    val b = Multimodal.parseAvMeta(GenAvFixture.webpAnim(17, 9, Seq(1000)))
    assert(b.contains(Multimodal.AvInfo("webp", 17, 9, 1000L, 0, 0)), b.toString)
    // a STILL WebP is an image: parseDimensions claims it, parseAvMeta not
    val still = GenAvFixture.webpAnim(320, 240, Seq.empty, still = true)
    assert(Multimodal.parseAvMeta(still).isEmpty)
    assert(Multimodal.parseDimensions(still).contains((320, 240)))
    // ANIM chunk with zero ANMF frames: malformed animation, stub
    assert(Multimodal.parseAvMeta(
      GenAvFixture.webpAnim(200, 100, Seq.empty)).isEmpty)
  }

  test("decodeAv routes containers to the real parsers and opaque " +
    "payloads to the stub branch") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](6400)), fmt, 3200L),
      AudioFileFormat.Type.WAVE, out)
    val rows = Seq(
      (1L, "audio", out.toByteArray),
      (2L, "video", "opaque payload".getBytes("UTF-8")))
      .toDF("id", "kind", "data")
    val metas = Multimodal.decodeAv(rows).collect().map(m => m.id -> m).toMap
    assert(metas(1L).container == "wav" && metas(1L).sampleRate == 16000 &&
      metas(1L).channels == 1 && metas(1L).durationMs == 200L)
    val n = metas(2L).nBytes
    assert(metas(2L).container == "opaque" &&
      metas(2L).width == 16 + (n % 64).toInt &&
      metas(2L).durationMs == n % 10000L && metas(2L).sampleRate == 0)
  }

  test("container parsers never throw: every prefix of every valid " +
    "container, random byte soup, magic-prefixed garbage, and deep EBML " +
    "nesting all degrade to None/stub") {
    val wav = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val fmt = new AudioFormat(16000f, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](640)), fmt, 320L),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val valid = Seq(
      GenAvFixture.mp4(0, 1000L, 4321L, 640, 480, moovFirst = true),
      GenAvFixture.mp4(1, 90000L, 999999L, 1920, 1080, moovFirst = false),
      GenAvFixture.webm(640, 360, 1234f, 1000000L, 48000f, 2),
      GenAvFixture.webm(640, 360, 1234f, 1000000L, 48000f, 2,
        unknownSegmentSize = true),
      GenAvFixture.mp3(3, 9, 0, mono = false, 3000),
      GenAvFixture.mp3(2, 5, 1, mono = true, 3000, id3Pad = 77),
      GenAvFixture.flac(44100, 2, 99999L),
      wav,
      GenAvFixture.webpAnim(640, 360, Seq(33, 100, 250)),
      GenMultimodalFixture.makeWebp("VP8 ", 640, 480, 5),
      GenMultimodalFixture.makeWebp("VP8L", 640, 480, 5),
      GenMultimodalFixture.makeWebp("VP8X", 640, 480, 5),
      GenMultimodalFixture.makeAvif(640, 480),
      GenVideoFixture.avi(64, 48, 100000L, (0 until 3).map(t =>
        GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(4, t), 0.8f))),
      GenMp4Fixture.mp4(64, 48, 1000L, Seq(100L, 100L, 300L),
        (0 until 3).map(t => GenVideoFixture.encodeJpeg(
          GenVideoFixture.framePx(5, t), 0.8f)),
        samplesPerChunk = 2, moovFirst = true, useCo64 = false,
        syncEvery = Some(2)),
      GenMp4Fixture.mp4(64, 48, 90000L, Seq.fill(3)(9000L),
        (0 until 3).map(t => GenVideoFixture.encodeJpeg(
          GenVideoFixture.framePx(6, t), 0.8f)),
        samplesPerChunk = 1, moovFirst = false, useCo64 = true,
        syncEvery = None))
    // a 100 TB crawl truncates files at arbitrary byte offsets: every
    // prefix must parse to Some or None, never throw
    val taggedMp3 = GenAudioTagsFixture.tagged(Seq(
      GenAudioTagsFixture.textFrame("TIT2", "Fuzz Me", 0, v24 = false),
      GenAudioTagsFixture.binaryFrame(v24 = false)), v24 = false)
    (valid :+ taggedMp3).foreach { f =>
      (0 to f.length).foreach { n =>
        Multimodal.parseAvMeta(f.take(n)); Multimodal.parseDimensions(f.take(n))
        Multimodal.parseAvi(f.take(n)); Multimodal.parseId3Tags(f.take(n))
        Multimodal.parseMp4(f.take(n)); Multimodal.parseWebmBlocks(f.take(n))
        Multimodal.parseMp3Frames(f.take(n)); Multimodal.parseOggPages(f.take(n))
        Multimodal.parseTsPackets(f.take(n))
      }
    }
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val b = Array.ofDim[Byte](rnd.nextInt(400)); rnd.nextBytes(b)
      Multimodal.parseAvMeta(b); Multimodal.parseDimensions(b)
      Multimodal.parseAvi(b); Multimodal.parseId3Tags(b)
      Multimodal.parseMp4(b); Multimodal.parseWebmBlocks(b)
      Multimodal.parseMp3Frames(b); Multimodal.parseOggPages(b)
      Multimodal.parseTsPackets(b)
      Multimodal.exifOrientation(b)
    }
    // garbage BEHIND a valid magic exercises each walker's bound checks
    val magics = Seq[Array[Byte]](
      Array(0x1a, 0x45, 0xdf.toByte, 0xa3.toByte),
      "fLaC".getBytes("US-ASCII"), "RIFF".getBytes("US-ASCII"),
      "ID3".getBytes("US-ASCII"), "OggS".getBytes("US-ASCII"),
      Array(0xff.toByte, 0xfb.toByte))
    magics.foreach { m =>
      (1 to 100).foreach { _ =>
        val b = Array.ofDim[Byte](m.length + rnd.nextInt(300)); rnd.nextBytes(b)
        System.arraycopy(m, 0, b, 0, m.length)
        Multimodal.parseAvMeta(b)
        Multimodal.parseId3Tags(b) // garbage behind the ID3 magic too
        Multimodal.parseOggPages(b); Multimodal.parseMp3Frames(b)
      }
    }
    // oversized EBML integers (a 9-byte PixelWidth would shift-overflow
    // into an arbitrary value) must stub, never surface as real metadata
    val overWidth = Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte,
      0xff.toByte, // EBML header, unknown size
      0xae.toByte, 0xff.toByte, // TrackEntry, unknown size
      0xe0.toByte, 0xff.toByte, // Video, unknown size
      0xb0.toByte, 0x89.toByte) ++ Array.fill(9)(0xff.toByte) // 9-byte width
    assert(Multimodal.parseAvMeta(overWidth).isEmpty,
      "oversized integer element must route to the stub")
    // adversarial EBML: thousands of nested unknown-size master elements
    // (each [0xAE id, 0xFF size] opens a level running to the end) must
    // hit the depth bound, not overflow the stack
    val deep = Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte,
      0xff.toByte) ++
      Array.fill(5000)(Array(0xae.toByte, 0xff.toByte)).flatten
    assert(Multimodal.parseAvMeta(deep).isEmpty)
    // adversarial AVI: thousands of nested LIST headers (each declaring
    // a size running to the container end) must hit parseAvi's depth
    // bound, not overflow the stack
    val deepAvi = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Long): Unit = (0 until 4).foreach(i =>
        out.write(((v >> (8 * i)) & 0xff).toInt))
      out.write("RIFF".getBytes("US-ASCII"))
      val inner = 5000 * 12
      le32(4L + inner); out.write("AVI ".getBytes("US-ASCII"))
      var remaining = inner.toLong
      (0 until 5000).foreach { _ =>
        out.write("LIST".getBytes("US-ASCII"))
        remaining -= 12
        le32(remaining + 4); out.write("hdrl".getBytes("US-ASCII"))
      }
      out.toByteArray
    }
    assert(Multimodal.parseAvi(deepAvi).isEmpty)
    // adversarial MP4: a tower of nested moov headers (each declaring a
    // size running to the container end) must hit parseMp4's depth
    // bound, not overflow the stack
    val deepMp4 = {
      val out = new java.io.ByteArrayOutputStream()
      def be32(v: Long): Unit = (3 to 0 by -1).foreach(i =>
        out.write(((v >> (8 * i)) & 0xff).toInt))
      be32(16); out.write("ftyp".getBytes("US-ASCII"))
      be32(512); out.write("isom".getBytes("US-ASCII"))
      var remaining = 5000L * 8
      (0 until 5000).foreach { _ =>
        be32(remaining); out.write("moov".getBytes("US-ASCII"))
        remaining -= 8
      }
      out.toByteArray
    }
    assert(Multimodal.parseMp4(deepMp4).isEmpty)
    // sample-table bombs: entry counts past what the box can hold must
    // refuse, not allocate (a crafted 2^32-entry stsz would OOM)
    val bombStsz = {
      val base = GenMp4Fixture.mp4(64, 48, 1000L, Seq(100L),
        Seq(GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(8, 0), 0.8f)),
        samplesPerChunk = 1, moovFirst = true, useCo64 = false,
        syncEvery = None)
      // find stsz and inflate its sample_count field (payload offset 8)
      val idx = base.indexOfSlice("stsz".getBytes("US-ASCII"))
      val b = base.clone()
      b(idx + 12) = 0x7f.toByte; b(idx + 13) = 0xff.toByte
      b(idx + 14) = 0xff.toByte; b(idx + 15) = 0xff.toByte
      b
    }
    assert(Multimodal.parseMp4(bombStsz).isEmpty)
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

  test("sampleFramesByTime schedules frames from the REAL parsed duration; " +
    "opaque payloads emit one frame; stubs are deterministic") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 16 kHz mono 16-bit, 8000 frames = 500 ms of audio
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](16000)), fmt, 8000L),
      AudioFileFormat.Type.WAVE, out)
    val rows = Seq(
      (1L, "audio", out.toByteArray),
      (2L, "video", "opaque payload".getBytes("UTF-8")))
      .toDF("id", "kind", "data")
    val frames = Multimodal.sampleFramesByTime(rows, everyMs = 150L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getAs[Array[Byte]]("frame")))
    // 500 ms at 150 ms cadence: t = 0, 150, 300, 450
    val byId = frames.groupBy(_._1)
    assert(byId(1L).map(f => (f._2, f._3)).sortBy(_._1).toSeq ==
      Seq((0, 0L), (1, 150L), (2, 300L), (3, 450L)))
    assert(byId(2L).map(f => (f._2, f._3)).toSeq == Seq((0, 0L)))
    // stub payloads are the documented md5 of (id, idx) — deterministic
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("1/2".getBytes("UTF-8"))
    assert(byId(1L).find(_._2 == 2).get._4.sameElements(expect))
    intercept[IllegalArgumentException] {
      Multimodal.sampleFramesByTime(rows, 0L)
    }
  }

  // ------------------------------------------------ perceptual image hashing

  private def grayImage(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("imageHash: hand-checked aHash/dHash of a half-bright test image " +
    "(gray pixels make BT.601 luma exact, so the bits are derivable on paper)") {
    // left half luma 255, right half 0, 16x16: every aHash cell on the left
    // (grid x < 4) sits above the mean -> byte 0x0F per row; the 9-col dHash
    // grid puts the edge between cols 3 (avg 255) and 4 (avg 0) -> exactly
    // bit x=3 of each row is a strictly-brighter-than-right transition
    val bytes = grayImage(16, 16)((x, _) => if (x < 8) 255 else 0)
    val row = Multimodal.imageHash(Seq((1L, "png", bytes)).toDF("id", "kind", "data"))
      .collect().head
    assert(row.decoded && row.width == 16 && row.height == 16)
    assert(row.ahash.get == 0x0f0f0f0f0f0f0f0fL)
    assert(row.dhash.get == 0x0808080808080808L)
  }

  test("imageHash: declared-dimension decompression bomb is refused BEFORE " +
    "decode; truncated body degrades to undecoded with header dimensions; " +
    "garbage reports nothing") {
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val bomb = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(100000) ++ be32(100000) ++ Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    val truncated = grayImage(64, 64)((x, y) => x + y).take(40)
    val garbage = "not an image at all, nope".getBytes("UTF-8")
    val rows = Multimodal.imageHash(Seq(
        (1L, "png", bomb), (2L, "png", truncated), (3L, "bin", garbage))
      .toDF("id", "kind", "data")).collect().map(r => r.id -> r).toMap
    assert(!rows(1L).decoded && rows(1L).width == 100000 &&
      rows(1L).height == 100000 && rows(1L).ahash.isEmpty)
    assert(!rows(2L).decoded && rows(2L).width == 64 && rows(2L).height == 64)
    assert(!rows(3L).decoded && rows(3L).width == 0 && rows(3L).ahash.isEmpty)
  }

  test("imageHash: smaller-than-grid images still hash deterministically " +
    "(empty cells defined, not crashed on); re-runs are bit-identical") {
    val tiny = grayImage(5, 3)((x, y) => 40 * x + 60 * y)
    val once = Multimodal.imageHash(Seq((7L, "png", tiny)).toDF("id", "kind", "data"))
      .collect().head
    val again = Multimodal.imageHash(Seq((7L, "png", tiny)).toDF("id", "kind", "data"))
      .collect().head
    assert(once.decoded && once == again)
  }

  test("imageHash -> hammingPairs: a re-encode in another lossless format " +
    "pairs at hamming 0, a small brightness edit pairs within 3, an " +
    "unrelated image does not pair") {
    // structured card (not flat): block-varying grays
    def card(seed: Int)(x: Int, y: Int): Int =
      (x * 255 / 95 + y * 255 / 63) / 2 + (((x / 8 + y / 8 + seed) * 37) % 40)
    val w = 96; val h = 64
    def pngOf(f: (Int, Int) => Int) = grayImage(w, h)(f)
    def bmpOf(f: (Int, Int) => Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y) & 0xff; img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", out))
      out.toByteArray
    }
    // calibrate the edit: grow the brightness delta until the dHash moves
    // by 1..3 bits (the same search the fixture generator runs) — asserts
    // the pipeline through real encode/decode, not a lucky constant
    def dhashOf(bytes: Array[Byte]): Long =
      Multimodal.imageHashBatch(Iterator(
        Multimodal.MediaRow(0L, "png", bytes))).next().dhash.get
    val baseD = dhashOf(pngOf(card(1)))
    // edit a BLOCK (left quarter x top quarter — two dHash grid rows), not
    // a full-height stripe: a stripe shifts the same boundary comparison in
    // all 8 grid rows and the hamming jumps 0 -> 8 with no usable middle
    val edited: (Int, Int) => Int = (1 to 120).iterator.map { d =>
      (x: Int, y: Int) =>
        if (x < 24 && y < 16) math.min(255, card(1)(x, y) + d) else card(1)(x, y)
    }.find { f =>
      val hd = java.lang.Long.bitCount(dhashOf(pngOf(f)) ^ baseD)
      hd >= 1 && hd <= 3
    }.getOrElse(fail("no brightness edit landed in hamming 1..3"))
    // same-family seeds share the dominant gradient and sit only a couple
    // of bits apart — the genuinely unrelated image inverts it
    val unrelated: (Int, Int) => Int = (x, y) => 255 - card(9)(x, y)
    val media = Seq(
      (1L, "png", pngOf(card(1))),
      (2L, "bmp", bmpOf(card(1))),   // same pixels, other container
      (3L, "png", pngOf(edited)),    // small regional brightness edit
      (4L, "png", pngOf(unrelated)))  // different image (inverted gradient)
      .toDF("id", "kind", "data")
    val hashed = Multimodal.imageHash(media).toDF()
      .where(col("decoded")).select(col("id"), col("dhash"))
    val pairs = graft.operators.Dedup.hammingPairs(hashed, "id", "dhash")
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 0L, "re-encoded identical pixels must collide exactly")
    assert(pairs.get((1L, 3L)).exists(hd => hd >= 1 && hd <= 3),
      s"edited copy should pair within hamming 3, got ${pairs.get((1L, 3L))}")
    assert(java.lang.Long.bitCount(
      dhashOf(pngOf(card(1))) ^ dhashOf(pngOf(unrelated))) > 3,
      "the unrelated card must actually be far in dHash space")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
  }

  test("resizeImage: exact box-average thumbnailing — the half-bright card " +
    "downscales to the block-exact 8x8 whose hashes equal the original's; " +
    "fitting and undecodable payloads pass through byte-identical") {
    val big = grayImage(16, 16)((x, _) => if (x < 8) 255 else 0)
    val small = grayImage(5, 3)((x, y) => 40 * x + 60 * y)
    val garbage = "definitely not an image".getBytes("UTF-8")
    val rows = Multimodal.resizeImage(Seq(
        (1L, "png", big), (2L, "png", small), (3L, "bin", garbage))
      .toDF("id", "kind", "data"), 8, 8)
      .collect().map(r => r.id -> r).toMap
    assert(rows(1L).resized && rows(1L).width == 8 && rows(1L).height == 8)
    // 2x2 constant blocks average exactly: the resized image is the same
    // half-bright pattern, so its perceptual hashes match the original's
    val rehash = Multimodal.imageHashBatch(Iterator(
      Multimodal.MediaRow(1L, "png", rows(1L).data))).next()
    assert(rehash.decoded && rehash.width == 8 && rehash.height == 8)
    assert(rehash.ahash.get == 0x0f0f0f0f0f0f0f0fL)
    assert(rehash.dhash.get == 0x0808080808080808L)
    // fits the box: byte-identical pass-through, original container kept
    assert(!rows(2L).resized && rows(2L).data.sameElements(small) &&
      rows(2L).width == 5 && rows(2L).height == 3 && rows(2L).decoded)
    // undecodable: passes through undecoded, never dropped or mangled
    assert(!rows(3L).decoded && rows(3L).data.sameElements(garbage))
  }

  test("resizeImage: aspect is preserved by integer scale-to-fit; the " +
    "declared-dimension bomb is refused before decode") {
    val wide = grayImage(100, 40)((x, y) => (3 * x + 5 * y) & 0xff)
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val bomb = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(1 << 20) ++ be32(1 << 20) ++ Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    val rows = Multimodal.resizeImage(Seq(
        (1L, "png", wide), (2L, "png", bomb)).toDF("id", "kind", "data"), 32, 32)
      .collect().map(r => r.id -> r).toMap
    // 100x40 into 32x32: width-constrained -> 32 x floor(40*32/100) = 32x12
    assert(rows(1L).resized && rows(1L).width == 32 && rows(1L).height == 12)
    assert(Multimodal.parseDimensions(rows(1L).data).contains((32, 12)))
    assert(!rows(2L).decoded && rows(2L).width == (1 << 20) &&
      rows(2L).data.sameElements(bomb))
  }

  test("imageStats: the half-bright gray card hand-checks exactly — half " +
    "zeros half 255s give luma_sum 128*255, a 2-bin histogram gives " +
    "entropy 1000 millibits, and r==g==b everywhere flags is_gray; a " +
    "colored pixel clears the flag; corrupt rows degrade") {
    val halfBright = grayImage(16, 16)((x, _) => if (x < 8) 255 else 0)
    val colored = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x102030)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o); o.toByteArray
    }
    val rows = Multimodal.imageStats(Seq(
        (1L, "png", halfBright), (2L, "png", colored),
        (3L, "bin", "nope".getBytes("UTF-8")))
      .toDF("id", "kind", "data")).collect().map(r => r.id -> r).toMap
    val s1 = rows(1L)
    assert(s1.decoded && s1.nPixels == 256L && s1.lumaSum == 128L * 255)
    assert(s1.lumaMin == 0 && s1.lumaMax == 255 && s1.isGray)
    assert(s1.entropyMilli == 1000L) // two equal bins = exactly 1 bit
    val s2 = rows(2L)
    // 0x102030 luma = (299*16 + 587*32 + 114*48) / 1000 = 29, single bin
    assert(s2.decoded && !s2.isGray && s2.lumaMin == 29 && s2.lumaMax == 29 &&
      s2.entropyMilli == 0L)
    assert(!rows(3L).decoded && rows(3L).nPixels == 0L)
  }

  // ------------------------------------------------ audio fingerprinting

  private def wav16(samples: Array[Int], channels: Int = 1,
      rate: Float = 16000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = samples.length / channels
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(i * 2) = (samples(i) & 0xff).toByte
      pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm),
      new AudioFormat(rate, 16, channels, true, false), n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioFingerprint: a strictly descending 65-step energy staircase " +
    "sets every gradient bit; ascending sets none; format facts are real") {
    // window w (10 frames each) holds constant amplitude (65 - w) * 100:
    // every window mean is exact, strictly louder than its right neighbor
    val down = Array.tabulate(650)(f => (65 - f / 10) * 100)
    val up = Array.tabulate(650)(f => (1 + f / 10) * 100)
    val rows = Multimodal.audioFingerprint(Seq(
        (1L, "wav", wav16(down, rate = 44100f)), (2L, "wav", wav16(up)))
      .toDF("id", "kind", "data")).collect().map(r => r.id -> r).toMap
    assert(rows(1L).decoded && rows(1L).sampleRate == 44100 &&
      rows(1L).channels == 1 && rows(1L).nFrames == 650L)
    assert(rows(1L).afp.get == -1L) // all 64 bits
    assert(rows(2L).afp.get == 0L)  // the contentless code — monotone rise
  }

  test("audioFingerprint: stereo channels mix by sum (exact staircase " +
    "doubles cleanly to the mono fingerprint); refused formats and " +
    "truncation degrade to undecoded") {
    val down = Array.tabulate(650)(f => (65 - f / 10) * 100)
    val stereo = new Array[Int](1300)
    for (f <- 0 until 650) { stereo(2 * f) = down(f); stereo(2 * f + 1) = down(f) }
    val mono = Multimodal.audioFingerprintBatch(Iterator(
      Multimodal.MediaRow(0L, "wav", wav16(down)))).next()
    val both = Multimodal.audioFingerprintBatch(Iterator(
      Multimodal.MediaRow(0L, "wav", wav16(stereo, channels = 2)))).next()
    assert(both.channels == 2 && both.afp == mono.afp)
    val rows = Multimodal.audioFingerprint(Seq(
        (1L, "wav", wav16(down).take(20)),              // cut inside header
        (3L, "bin", "not audio".getBytes("UTF-8")))
      .toDF("id", "kind", "data")).collect()
    assert(rows.forall(r => !r.decoded && r.afp.isEmpty))
  }

  test("audioFingerprint decodes IEEE-float WAV onto the 16-bit lattice: " +
    "a float re-encode fingerprints identically to its PCM twin; clamp " +
    "and NaN samples are pinned") {
    // block-varying program (same family as the fixture's synth)
    val ints = Array.tabulate(1300)(f =>
      (((f / 20) * 2654435761L + 9) >>> 56).toInt % 97 * 30 + f % 7)
    val floats = ints.map(_ / 32768f) // exact in float: |v| < 2^15
    val pcm = Multimodal.audioFingerprintBatch(Iterator(
      Multimodal.MediaRow(0L, "wav", wav16(ints)))).next()
    val flt = Multimodal.audioFingerprintBatch(Iterator(
      Multimodal.MediaRow(0L, "wav",
        GenAudioFpFixture.floatWav(floats, rate = 16000)))).next()
    assert(flt.decoded && flt.sampleRate == 16000 && flt.nFrames == 1300L)
    assert(flt.afp == pcm.afp) // identical program => identical fingerprint
    // clamp + NaN edges: stats over a float clip with out-of-range samples
    val edge = Array[Float](0.5f, 1.5f, -2.0f, Float.NaN, 0f, 0.25f)
    val st = Multimodal.audioStats(Seq(
        (1L, "wav", GenAudioFpFixture.floatWav(edge)))
      .toDF("id", "kind", "data")).head()
    assert(st.decoded && st.nFrames == 6L)
    assert(st.peak == 32768L)            // -2.0 clamps to -32768
    assert(st.nClipped == 2L)            // 1.5 -> 32767, -2.0 -> -32768
    assert(st.nSilence == 2L)            // NaN -> 0 plus the literal 0
    assert(st.absSum == 16384L + 32767L + 32768L + 0L + 0L + 8192L)
  }

  test("audioStats: hand-checked silence, clipping, peak and duration on " +
    "a constructed clip; refused formats degrade") {
    val samples = Array.tabulate(100) { t =>
      if (t < 10) 0
      else if (t == 10) 32767
      else if (t == 11) -32768
      else 100
    }
    val rows = Multimodal.audioStats(Seq(
        (1L, "wav", wav16(samples, rate = 1000f)),
        (2L, "bin", "not audio".getBytes("UTF-8")))
      .toDF("id", "kind", "data")).collect().map(r => r.id -> r).toMap
    val s = rows(1L)
    assert(s.decoded && s.sampleRate == 1000 && s.nFrames == 100L)
    assert(s.durationMs == 100L)
    assert(s.nSilence == 10L && s.nClipped == 2L && s.peak == 32768L)
    assert(s.absSum == 32767L + 32768L + 88L * 100)
    assert(!rows(2L).decoded)
  }

  test("audioFingerprint -> hammingPairs: identical PCM re-encoded pairs " +
    "at hamming 0; an unrelated clip does not pair") {
    // block-varying (non-monotone) envelope so the fingerprint is nonzero
    def clip(seed: Int): Array[Int] = Array.tabulate(1300) { f =>
      (((f / 20) * 2654435761L + seed) >>> 56).toInt % 97 * 30 + f % 7
    }
    val a = clip(1)
    val media = Seq(
      (1L, "wav", wav16(a)),
      (2L, "wav", wav16(a, rate = 8000f)),   // same PCM, other rate header
      (3L, "wav", wav16(clip(99).map(v => 3100 - v)))) // unrelated
      .toDF("id", "kind", "data")
    val printed = Multimodal.audioFingerprint(media).toDF()
      .where(col("decoded")).select(col("id"), col("afp"))
    val pairs = graft.operators.Dedup.hammingPairs(printed, "id", "afp")
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("exifOrientation: II and MM TIFF layouts parse; absent, corrupt, " +
    "or out-of-range tags degrade to 1; oriented hashing pairs a rotated " +
    "re-encode with its upright copy across all 8 orientations") {
    val scene = Array.tabulate(20, 28) { (y, x) =>
      val r2 = (x - 14) * (x - 14) * 100 / 196 + (y - 10) * (y - 10) * 100 / 100
      val v = math.min(255, 30 + r2 + ((x / 7 + y / 5) * 37) % 48)
      (v << 16) | (v << 8) | v
    }
    val plain = GenVideoFixture.encodeJpeg(scene, 0.9f)
    assert(Multimodal.exifOrientation(plain) == 1)           // no APP1
    assert(Multimodal.exifOrientation("x".getBytes) == 1)    // not a JPEG
    (1 to 8).foreach { o =>
      assert(Multimodal.exifOrientation(
        GenImagePhashFixture.withExifOrientation(plain, o)) == o)
    }
    // out-of-range tag value and truncated APP1 both degrade to 1
    assert(Multimodal.exifOrientation(
      GenImagePhashFixture.withExifOrientation(plain, 9)) == 1)
    val truncated = GenImagePhashFixture.withExifOrientation(plain, 6).take(14)
    assert(Multimodal.exifOrientation(truncated) == 1)
    // MM (big-endian) layout: hand-build the same IFD big-endian
    val mm = {
      val b = new java.io.ByteArrayOutputStream()
      def be16(v: Int): Unit = { b.write((v >> 8) & 0xff); b.write(v & 0xff) }
      def be32(v: Int): Unit = { be16((v >> 16) & 0xffff); be16(v & 0xffff) }
      b.write('M'); b.write('M'); be16(42); be32(8)
      be16(1); be16(0x0112); be16(3); be32(1); be16(5); be16(0); be32(0)
      val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ b.toByteArray
      plain.take(2) ++ Array(0xff.toByte, 0xe1.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload ++ plain.drop(2)
    }
    assert(Multimodal.exifOrientation(mm) == 5)
    // end-to-end: every orientation's stored+tagged re-encode hashes into
    // near-dup range of the upright copy (JPEG artifacts allow hamming<=3)
    def stored(o: Int): Array[Array[Int]] = {
      // invert the display transform: find the stored array whose display
      // under o is `scene` — brute force via the generator's displayPx
      // (apply to candidates): for orientations 1-4 display dims match,
      // 5-8 transpose; search is overkill — displayPx is an involution
      // composition, so just apply the INVERSE orientation
      val inv = Map(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5, 6 -> 8, 7 -> 7, 8 -> 6)(o)
      GenImagePhashFixture.displayPx(scene, inv)
    }
    val upright = Multimodal.imageHash(Seq((0L, "jpg", plain))
      .toDF("id", "kind", "data")).head().dhash.get
    (2 to 8).foreach { o =>
      val jpeg = GenImagePhashFixture.withExifOrientation(
        GenVideoFixture.encodeJpeg(stored(o), 0.9f), o)
      val h = Multimodal.imageHash(Seq((o.toLong, "jpg", jpeg))
        .toDF("id", "kind", "data")).head().dhash.get
      assert(java.lang.Long.bitCount(upright ^ h) <= 3,
        s"orientation $o drifted to hamming ${java.lang.Long.bitCount(upright ^ h)}")
    }
  }

  test("parseAvMeta labels avif/avis ISO-BMFF movies by brand, not mp4") {
    val mp4 = GenAvFixture.mp4(0, 1000L, 2500L, 320, 240, moovFirst = true)
    assert(Multimodal.parseAvMeta(mp4).get.container == "mp4")
    val avis = mp4.clone()
    System.arraycopy("avis".getBytes("US-ASCII"), 0, avis, 8, 4)
    val m = Multimodal.parseAvMeta(avis).get
    assert(m.container == "avis" && m.width == 320 && m.durationMs == 2500L)
  }

  test("parseId3Tags: v2.3/v2.4, three text encodings, skip-by-size of " +
    "binary frames, NUL terminators; corrupt and untagged degrade") {
    val t1 = GenAudioTagsFixture.tagged(Seq(
      GenAudioTagsFixture.textFrame("TIT2", "A Title", 0, v24 = false),
      GenAudioTagsFixture.binaryFrame(v24 = false),
      GenAudioTagsFixture.textFrame("TPE1", "Ärtist", 1, v24 = false)),
      v24 = false)
    val m1 = Multimodal.parseId3Tags(t1).get
    assert(m1("TIT2") == "A Title" && m1("TPE1") == "Ärtist")
    val t2 = GenAudioTagsFixture.tagged(Seq(
      GenAudioTagsFixture.textFrame("TALB", "Großes Album", 3, v24 = true,
        nulTerm = true)), v24 = true)
    assert(Multimodal.parseId3Tags(t2).get("TALB") == "Großes Album")
    assert(Multimodal.parseId3Tags("no tag here".getBytes).isEmpty)
    assert(Multimodal.parseId3Tags(t1.take(9)).isEmpty)
    // a frame size past the tag end stops the walk; prior frames survive
    val corrupt = t1.clone()
    // second frame (APIC) starts after TIT2; blow up ITS size field:
    // TIT2 payload = 1 enc + 7 text = 8 -> APIC header at 10 + 10 + 8
    corrupt(10 + 10 + 8 + 4) = 0x7f.toByte
    val partial = Multimodal.parseId3Tags(corrupt).get
    assert(partial.get("TIT2").contains("A Title") && !partial.contains("TPE1"))
  }

  test("parseId3Tags: extended headers are skipped by size and " +
    "unsynchronised tags decode (v2.3 whole-tag, v2.4 per-frame and " +
    "global) — UTF-16 BOMs and 0xFF text bytes survive the round trip") {
    // v2.3: ext header + whole-tag unsync; BOM FF FE and ISO-8859-1 'ÿ'
    // both plant real FF bytes that the encode/decode must round-trip
    val t1 = GenAudioTagsFixture.tagged(Seq(
      GenAudioTagsFixture.textFrame("TIT2", "Nuit Grise", 1, v24 = false),
      GenAudioTagsFixture.textFrame("TPE1", "ÿell", 0, v24 = false)),
      v24 = false, ext = true, unsync = true)
    val m1 = Multimodal.parseId3Tags(t1).get
    assert(m1("TIT2") == "Nuit Grise" && m1("TPE1") == "ÿell")
    // v2.3: ext header alone (no unsync)
    val t2 = GenAudioTagsFixture.tagged(Seq(
      GenAudioTagsFixture.textFrame("TALB", "Plain", 0, v24 = false)),
      v24 = false, ext = true)
    assert(Multimodal.parseId3Tags(t2).get("TALB") == "Plain")
    // v2.4: ext header + per-frame unsync flag on a UTF-16 frame
    val t3 = GenAudioTagsFixture.tagged(Seq(
      GenAudioTagsFixture.textFrame("TALB", "Voilà", 1, v24 = true,
        unsyncFrame = true),
      GenAudioTagsFixture.textFrame("TPE1", "Quartet", 3, v24 = true)),
      v24 = true, ext = true)
    val m3 = Multimodal.parseId3Tags(t3).get
    assert(m3("TALB") == "Voilà" && m3("TPE1") == "Quartet")
    // v2.4: GLOBAL unsync header flag with the frame's own bit clear
    val f = GenAudioTagsFixture.textFrame("TIT2", "Søvn", 1, v24 = true)
    val enc = GenAudioTagsFixture.unsyncEnc(f.drop(10))
    val reframed = f.take(4) ++ Array(
      ((enc.length >> 21) & 0x7f).toByte, ((enc.length >> 14) & 0x7f).toByte,
      ((enc.length >> 7) & 0x7f).toByte, (enc.length & 0x7f).toByte) ++
      f.slice(8, 10) ++ enc
    val t4 = GenAudioTagsFixture.tagged(Seq(reframed), v24 = true, unsync = true)
    assert(Multimodal.parseId3Tags(t4).get("TIT2") == "Søvn")
    // truncated ext headers degrade, never throw
    assert(Multimodal.parseId3Tags(t1.take(12)).isEmpty)
    assert(Multimodal.parseId3Tags(t3.take(13)).isEmpty)
    // ID3v2.2: 3-char ids map to the modern names; 6-byte frame headers;
    // whole-tag unsync; UCS-2 BOMs survive
    val t5 = GenAudioTagsFixture.tagged22(Seq(
      GenAudioTagsFixture.textFrame22("TT2", "Vieux Morceau", 1),
      GenAudioTagsFixture.textFrame22("TP1", "Les Anciens", 0),
      GenAudioTagsFixture.textFrame22("TAL", "Archives", 0)), unsync = true)
    val m5 = Multimodal.parseId3Tags(t5).get
    assert(m5("TIT2") == "Vieux Morceau" && m5("TPE1") == "Les Anciens" &&
      m5("TALB") == "Archives")
    // v2.2 compression flag (0x40): the spec's advice is refuse the tag
    val t6 = t5.clone(); t6(5) = (t6(5) | 0x40).toByte
    assert(Multimodal.parseId3Tags(t6).isEmpty)
    (0 to t5.length by 3).foreach(k => Multimodal.parseId3Tags(t5.take(k)))
  }

  // ------------------------------------------------ AVI/MJPEG video decode

  /** A tiny MJPEG AVI via the fixture generator's independent RIFF
    * builder. */
  private def miniAvi(nFrames: Int, seed: Int, usPerFrame: Long = 100000L)
      : Array[Byte] =
    GenVideoFixture.avi(64, 48, usPerFrame,
      (0 until nFrames).map(t =>
        GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(seed, t), 0.85f)))

  test("parseAvi: header metadata, frame chunk table, word alignment; " +
    "corrupt payloads return None") {
    val bytes = miniAvi(7, seed = 5)
    val avi = Multimodal.parseAvi(bytes).get
    assert(avi.width == 64 && avi.height == 48)
    assert(avi.usPerFrame == 100000L && avi.declaredFrames == 7L)
    assert(avi.frames.size == 7)
    assert(avi.durationMs == 700L)
    // every frame chunk is a standalone JPEG (SOI marker) the JDK decodes
    avi.frames.foreach { case (off, len) =>
      assert((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd8)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        java.util.Arrays.copyOfRange(bytes, off, off + len)))
      assert(img.getWidth == 64 && img.getHeight == 48)
    }
    // at least one odd-sized chunk exercises RIFF's pad byte, else the
    // alignment path is untested — JPEG sizes vary, so assert it happened
    assert(avi.frames.exists(_._2 % 2 == 1),
      "no odd-size frame chunk; change the seed to cover the pad path")
    assert(Multimodal.parseAvi(bytes.take(60)).isEmpty)   // truncated
    assert(Multimodal.parseAvi("garbage!".getBytes).isEmpty)
    // parseAvMeta routes AVI to the real branch
    val m = Multimodal.parseAvMeta(bytes).get
    assert(m.container == "avi" && m.width == 64 && m.durationMs == 700L)
  }

  test("sampleFramesByTime emits REAL JPEG frame bytes for AVI payloads " +
    "(decoded = true), stubs elsewhere") {
    val rows = Seq(
      (1L, "video", miniAvi(12, seed = 3)),        // 1200 ms at 10 fps
      (2L, "video", "not a container".getBytes))
      .toDF("id", "kind", "data")
    val frames = Multimodal.sampleFramesByTime(rows, everyMs = 500L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getBoolean(3), r.getAs[Array[Byte]]("frame"))).toSeq
    val v1 = frames.filter(_._1 == 1L).sortBy(_._2)
    assert(v1.map(f => (f._2, f._3, f._4)) ==
      Seq((0, 0L, true), (1, 500L, true), (2, 1000L, true)))
    // each sampled frame decodes to the source frame covering its tick
    v1.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f._5))
      assert(img != null && img.getWidth == 64 && img.getHeight == 48)
    }
    // tick 1 (t=500ms) must be source frame 5 — byte-identical to a
    // standalone encode of that frame
    val expect5 = GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(3, 5), 0.85f)
    assert(v1(1)._5.sameElements(expect5))
    val v2 = frames.filter(_._1 == 2L)
    assert(v2.size == 1 && !v2.head._4 && v2.head._5.length == 16) // md5 stub
  }

  test("videoFrameHashes + frameSigPairs: re-encoded copy pairs on " +
    "diagonal 0, trimmed copy on a shifted diagonal, unrelated does not") {
    val src = (0 until 12).map(t => GenVideoFixture.framePx(21, t))
    val v1f = src.map(GenVideoFixture.encodeJpeg(_, 0.85f))
    val media = Seq(
      (1L, "video", GenVideoFixture.avi(64, 48, 100000L, v1f)),
      (2L, "video", GenVideoFixture.avi(64, 48, 100000L,
        src.map(GenVideoFixture.encodeJpeg(_, 0.62f)))), // re-encode
      (3L, "video", GenVideoFixture.avi(64, 48, 100000L, v1f.drop(5))), // trim
      (4L, "video", GenVideoFixture.avi(64, 48, 100000L,
        (0 until 10).map(t => GenVideoFixture.encodeJpeg(
          GenVideoFixture.framePx(77, t + 3), 0.85f)))), // unrelated
      (5L, "video", "garbage".getBytes))
      .toDF("id", "kind", "data")
    val hashed = Multimodal.videoFrameHashes(media, everyMs = 500L).toDF()
    val marker = hashed.where(col("id") === 5L).collect()
    assert(marker.length == 1 && !marker.head.getAs[Boolean]("decoded"))
    val pairs = graft.operators.Dedup.frameSigPairs(
        hashed.where(col("decoded")), "id", "frame_idx", "dhash",
        maxHamming = 3, minMatch = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(p => (p._1, p._2, p._3) -> p._4).toMap
    assert(pairs((1L, 2L, 0L)) == 3L) // all 3 sampled ticks match
    assert(pairs((1L, 3L, 1L)) == 2L) // trim of 5 frames = 1 tick shift
    assert(pairs((2L, 3L, 1L)) == 2L)
    assert(!pairs.keys.exists(k => k._1 == 4L || k._2 == 4L))
  }

  test("writeFrameSigIndex + incrementalFrameSigPairs: a new clip's " +
    "frames probe the persisted composite-key index; diagonals and " +
    "counts match the one-shot join; same-clip replay does not self-pair") {
    val src = (0 until 12).map(t => GenVideoFixture.framePx(21, t))
    val v1f = src.map(GenVideoFixture.encodeJpeg(_, 0.85f))
    def hashes(media: org.apache.spark.sql.DataFrame) =
      Multimodal.videoFrameHashes(media, everyMs = 500L).toDF()
        .where(col("decoded")).select(col("id"), col("frame_idx"), col("dhash"))
    val indexed = hashes(Seq(
      (1L, "video", GenVideoFixture.avi(64, 48, 100000L, v1f)))
      .toDF("id", "kind", "data"))
    val batch = hashes(Seq(
      (2L, "video", GenVideoFixture.avi(64, 48, 100000L,
        src.map(GenVideoFixture.encodeJpeg(_, 0.62f)))),   // re-encode
      (3L, "video", GenVideoFixture.avi(64, 48, 100000L, v1f.drop(5))), // trim
      (1L, "video", GenVideoFixture.avi(64, 48, 100000L, v1f))) // replay
      .toDF("id", "kind", "data"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-vididx").toString + "/idx"
    graft.operators.Dedup.writeFrameSigIndex(indexed, "id", "frame_idx",
      "dhash", path)
    val pairs = graft.operators.Dedup.incrementalFrameSigPairs(batch, "id",
        "frame_idx", "dhash", path, maxHamming = 3, minMatch = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(p => (p._1, p._2, p._3) -> p._4).toMap
    assert(pairs((2L, 1L, 0L)) == 3L)  // re-encode: every tick, diagonal 0
    assert(pairs((3L, 1L, -1L)) == 2L) // 5-frame trim: one tick behind
    assert(!pairs.keys.exists(k => k._1 == 1L), "replay must not self-pair")
  }

  test("composite frame keys ENFORCE their contract: a position at or " +
    "past PosBase, or a negative id, raises instead of silently aliasing " +
    "into another document's key space") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-vididx-bad").toString + "/idx"
    // pos >= PosBase: would alias into document id+1's key space
    val badPos = Seq((1L, graft.operators.Dedup.PosBase.toInt, 42L))
      .toDF("id", "frame_idx", "dhash")
    val e1 = intercept[Exception] {
      graft.operators.Dedup.writeFrameSigIndex(badPos, "id", "frame_idx",
        "dhash", path)
    }
    assert(exceptionChain(e1).exists(_.getMessage != null))
    // negative id: div rounds toward zero while pmod stays non-negative,
    // so id -1 pos 0 would DECODE as id 0 — must raise at compose time
    val badId = Seq((-1L, 0, 42L)).toDF("id", "frame_idx", "dhash")
    val e2 = intercept[Exception] {
      graft.operators.Dedup.writeFrameSigIndex(badId, "id", "frame_idx",
        "dhash", path + "2")
    }
    assert(exceptionChain(e2).exists(_.getMessage != null))
    // the probe side enforces the same contract
    graft.operators.Dedup.writeFrameSigIndex(
      Seq((1L, 0, 42L)).toDF("id", "frame_idx", "dhash"), "id", "frame_idx",
      "dhash", path + "3")
    val e3 = intercept[Exception] {
      graft.operators.Dedup.incrementalFrameSigPairs(badPos, "id",
        "frame_idx", "dhash", path + "3").collect()
    }
    assert(exceptionChain(e3).exists(_.getMessage != null))
    // in-contract rows still index and probe fine after the guard
    val ok = graft.operators.Dedup.incrementalFrameSigPairs(
      Seq((2L, 0, 42L), (2L, 1, 42L)).toDF("id", "frame_idx", "dhash"),
      "id", "frame_idx", "dhash", path + "3", minMatch = 1)
    assert(ok.collect().nonEmpty)
  }

  private def exceptionChain(t: Throwable): List[Throwable] =
    if (t == null) Nil else t :: exceptionChain(t.getCause)

  test("audioSeqSignatures: windowed signatures detect containment a " +
    "whole-clip fingerprint cannot; partial tail windows are dropped; " +
    "trim by whole windows shifts the alignment diagonal") {
    val spw = 4000 // 250 ms at 16 kHz
    def clip(n: Int, seed: Int): Array[Int] = Array.tabulate(n) { t =>
      val h = (t / 61L + seed * 131L) * 0x9E3779B97F4A7C15L
      ((((h >>> 33) % 97 + 97) % 97) * 300).toInt + (t % 13) * 7
    }
    val base = clip(spw * 4 + spw / 2, 5)
    val media = Seq(
      (1L, "wav", wav16(base)),
      (3L, "wav", wav16(base.drop(spw))),        // one window trimmed
      (9L, "bin", "not audio".getBytes))
      .toDF("id", "kind", "data")
    val rows = Multimodal.audioSeqSignatures(media, windowMs = 250L)
      .collect()
    val byId = rows.groupBy(_.id)
    assert(byId(1L).length == 4, "partial 0.5-window tail must be dropped")
    assert(byId(3L).length == 3)
    // the trimmed clip's window w IS the base clip's window w+1
    byId(3L).foreach { r =>
      val orig = byId(1L).find(_.window_idx == r.window_idx + 1).get
      assert(orig.sig == r.sig, s"window ${r.window_idx} misaligned")
    }
    assert(byId(9L).length == 1 && !byId(9L).head.decoded)
    // windows differ within a clip (signatures carry per-window content)
    assert(byId(1L).map(_.sig).distinct.length > 1)
    // the whole-clip fingerprint CANNOT pair these (containment blind):
    val whole = Multimodal.audioFingerprint(media).toDF()
      .where(col("decoded")).select(col("id"), col("afp"))
    val wholePairs = graft.operators.Dedup.hammingPairs(whole, "id", "afp")
      .count()
    val seqPairs = graft.operators.Dedup.frameSigPairs(
      Multimodal.audioSeqSignatures(media, 250L).toDF()
        .where(col("decoded")).select(col("id"), col("window_idx"), col("sig")),
      "id", "window_idx", "sig", maxHamming = 3, minMatch = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(p => (p._1, p._2, p._3) -> p._4).toMap
    assert(seqPairs((1L, 3L, 1L)) == 3L,
      s"sequence join must catch the trim: $seqPairs")
    assert(wholePairs == 0L || !seqPairs.isEmpty) // containment-blindness documented
  }

  test("videoStats: planted black and flat frames are counted at the " +
    "sampled ticks; undecodable payloads report decoded = false") {
    def solid(v: Int): Array[Array[Int]] =
      Array.fill(48, 64)((v << 16) | (v << 8) | v)
    // 10 frames at 10 fps, sampled at 500 ms -> ticks hit frames 0, 5, 9
    val frames = (0 until 10).map {
      case 5 => GenVideoFixture.encodeJpeg(solid(0), 0.85f)    // black
      case 9 => GenVideoFixture.encodeJpeg(solid(200), 0.85f)  // flat, bright
      case t => GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(9, t), 0.85f)
    }
    val media = Seq(
      (1L, "video", GenVideoFixture.avi(64, 48, 100000L, frames)),
      (2L, "video", "garbage".getBytes))
      .toDF("id", "kind", "data")
    val rows = Multimodal.videoStats(media, everyMs = 500L)
      .collect().map(r => r.id -> r).toMap
    val v = rows(1L)
    assert(v.decoded && v.nSampled == 3 && v.nDecoded == 3)
    assert(v.nBlack == 1)  // the solid-0 frame; solid-200 is flat but bright
    assert(v.nFlat == 2)   // both solid frames have ~zero entropy
    assert(v.nPixels == 3L * 64 * 48)
    assert(!rows(2L).decoded && rows(2L).nSampled == 0)
  }

  test("parseMp3Frames: whole-sequence frame walk — exact counts, summed " +
    "duration, VBR detection; trailing junk/truncation stop and report; " +
    "a mid-stream sample-rate change stops the walk") {
    // VBR: the summed duration disagrees with the CBR estimate
    val vbr = (0 until 30).toArray.flatMap(i =>
      GenMp3Fixture.frame(mpeg1 = true, if (i % 2 == 0) 96 else 192, 0, mono = false))
    val m = Multimodal.parseMp3Frames(vbr).get
    assert(m.nFrames == 30 && m.sampleRate == 44100 && m.channels == 2)
    assert(m.durationMs == 30L * 1152 * 1000 / 44100)
    assert(m.minKbps == 96 && m.maxKbps == 192 && m.vbr)
    // behind an ID3 tag, MPEG2 mono (576-sample frames)
    val m2 = Multimodal.parseMp3Frames(GenMp3Fixture.id3(64) ++
      (0 until 8).toArray.flatMap(_ =>
        GenMp3Fixture.frame(mpeg1 = false, 64, 0, mono = true))).get
    assert(m2.nFrames == 8 && m2.sampleRate == 22050 && m2.channels == 1 &&
      !m2.vbr && m2.durationMs == 8L * 576 * 1000 / 22050)
    // junk after 3 frames: stats over the prefix
    val threeThenJunk = (0 until 3).toArray.flatMap(_ =>
      GenMp3Fixture.frame(mpeg1 = true, 128, 0, mono = false)) ++
      Array.tabulate[Byte](50)(i => (i * 3).toByte)
    assert(Multimodal.parseMp3Frames(threeThenJunk).get.nFrames == 3)
    // a sample-rate change mid-stream = concatenated files, not one
    val concat = GenMp3Fixture.frame(mpeg1 = true, 128, 0, mono = false) ++
      GenMp3Fixture.frame(mpeg1 = true, 128, 1, mono = false)
    assert(Multimodal.parseMp3Frames(concat).get.nFrames == 1)
    // garbage refuses
    assert(Multimodal.parseMp3Frames("definitely not mpeg".getBytes).isEmpty)
    // every prefix degrades, never throws
    (0 to vbr.length by 7).foreach(k => Multimodal.parseMp3Frames(vbr.take(k)))
  }

  test("parseWebmBlocks: Cluster/SimpleBlock walk counts VIDEO blocks " +
    "and keyframes, excludes interleaved audio-track blocks, and times " +
    "by cluster base + signed relative ticks; metadata-only files and " +
    "garbage refuse") {
    val data = GenAvFixture.webmClusters(640, 360, 1000000L, Seq(
      (0L, Seq((0, true, 100), (40, false, 60), (80, false, 60))),
      (120L, Seq((0, true, 90), (40, false, 55)))))
    val w = Multimodal.parseWebmBlocks(data).get
    assert(w.videoTrack == 1 && w.nBlocks == 5 && w.nKeyframes == 2)
    assert(w.durationMs == 160L) // cluster 120 + rel 40, 1 ms ticks
    assert(w.totalBlockBytes == 100L + 60 + 60 + 90 + 55,
      s"audio blocks leaked into ${w.totalBlockBytes}")
    // negative relative timestamps resolve via the s16 sign
    val neg = GenAvFixture.webmClusters(64, 48, 1000000L,
      Seq((100L, Seq((-20, true, 10)))))
    assert(Multimodal.parseWebmBlocks(neg).get.durationMs == 80L)
    // a coarser TimestampScale rescales to ms
    val coarse = GenAvFixture.webmClusters(64, 48, 2000000L,
      Seq((10L, Seq((5, true, 10)))))
    assert(Multimodal.parseWebmBlocks(coarse).get.durationMs == 30L)
    // metadata-only webm (no TrackNumber, no clusters) refuses honestly
    assert(Multimodal.parseWebmBlocks(
      GenAvFixture.webm(640, 360, 1234f, 1000000L, 48000f, 2)).isEmpty)
    assert(Multimodal.parseWebmBlocks("not ebml at all".getBytes).isEmpty)
    // every prefix degrades, never throws
    (0 to data.length).foreach(k => Multimodal.parseWebmBlocks(data.take(k)))
  }

  test("parseOggPages: RFC 3533 page walk — CRC-verified pages, lacing " +
    "packet counts incl. 255-continuations, granule-position durations " +
    "(Vorbis PCM rate, Opus 48 kHz minus pre-skip), muxed-serial " +
    "filtering; corruption stops at the last good page") {
    val v = GenOggFixture.page(5L, 0, 0, 0x02,
        Seq(GenOggFixture.vorbisId(32000, 1))) ++
      GenOggFixture.page(5L, 1, 16000L, 0x04,
        Seq(Array.tabulate[Byte](300)(i => (i * 3).toByte),
          Array.tabulate[Byte](20)(i => (i * 7).toByte)))
    val o = Multimodal.parseOggPages(v).get
    assert(o.codec == "vorbis" && o.sampleRate == 32000 && o.channels == 1)
    assert(o.nPages == 2 && o.nPackets == 3) // id + 2 audio (one spans 255)
    assert(o.durationMs == 500L && o.totalPayloadBytes == 30L + 300 + 20)
    // opus: fixed 48 kHz granule clock, pre-skip subtracted
    val op = GenOggFixture.page(6L, 0, 0, 0x02,
        Seq(GenOggFixture.opusHead(2, 648, 24000))) ++
      GenOggFixture.page(6L, 1, 96648L, 0x04,
        Seq(Array.tabulate[Byte](44)(i => i.toByte)))
    val oo = Multimodal.parseOggPages(op).get
    assert(oo.codec == "opus" && oo.sampleRate == 48000)
    assert(oo.durationMs == 2000L) // (96648 - 648) / 48
    // a flipped byte voids that page's CRC: the walk ends before it
    val bad = v.clone()
    bad(v.length - 5) = (bad(v.length - 5) ^ 0x11).toByte
    val ob = Multimodal.parseOggPages(bad).get
    assert(ob.nPages == 1 && ob.durationMs == 0L)
    // not ogg / truncated prefixes degrade, never throw
    assert(Multimodal.parseOggPages("OggX nope".getBytes).isEmpty)
    (0 to v.length).foreach(k => Multimodal.parseOggPages(v.take(k)))
  }

  test("parseOggPages: a lying granule clock is refused, not reported — " +
    "CRC-valid pages with an implausible rate, a granule regression, a " +
    "negative granule, or a century-plus duration all take the stub branch") {
    def stream(rate: Int, granules: Seq[Long]): Array[Byte] =
      GenOggFixture.page(9L, 0, 0, 0x02,
        Seq(GenOggFixture.vorbisId(rate, 1))) ++
        granules.zipWithIndex.map { case (g, i) =>
          GenOggFixture.page(9L, i + 1L, g,
            if (i == granules.size - 1) 0x04 else 0,
            Seq(Array.tabulate[Byte](16)(j => (j * 3 + i).toByte)))
        }.reduce(_ ++ _)
    // the honest baseline parses
    assert(Multimodal.parseOggPages(stream(16000, Seq(8000L, 16000L)))
      .get.durationMs == 1000L)
    // ID header claims a non-audio rate: contradiction, refuse
    assert(Multimodal.parseOggPages(stream(0, Seq(8000L))).isEmpty)
    assert(Multimodal.parseOggPages(stream(900000, Seq(8000L))).isEmpty)
    // granule positions must be non-decreasing (RFC 3533) and non-negative
    assert(Multimodal.parseOggPages(stream(16000, Seq(16000L, 8000L))).isEmpty)
    assert(Multimodal.parseOggPages(stream(16000, Seq(-2L))).isEmpty)
    // a crafted near-2^63 granule: the old *1000 scaling wrapped Long and
    // reported garbage; now the divide-first form computes an honest
    // duration which the century gate then refuses
    assert(Multimodal.parseOggPages(
      stream(16000, Seq(Long.MaxValue - 1))).isEmpty)
    // just-under-a-century still reports (the gate is a ceiling, not a cap)
    val okGranule = 99L * 366 * 24 * 3600 * 16000
    assert(Multimodal.parseOggPages(stream(16000, Seq(okGranule)))
      .get.durationMs == okGranule / 16L)
  }

  test("parseTsPackets: 188-byte sync-lattice walk — packet/PID/PES/null " +
    "accounting and PCR-clock durations; lattice breaks stop the count; " +
    "garbage refuses") {
    val stream = (
      Seq(GenTsFixture.packet(0, pusi = true, 0)) ++
      (0 until 10).map(i => GenTsFixture.packet(42, pusi = i == 0, i,
        pcrBase = if (i == 0 || i == 9) 1000000L + i * 45000L else -1L)) ++
      Seq(GenTsFixture.packet(0x1fff, pusi = false, 0))
    ).toArray.flatten
    val t = Multimodal.parseTsPackets(stream).get
    assert(t.nPackets == 12 && t.nPids == 2 && t.nNull == 1)
    assert(t.nPes == 2) // the PAT's PUSI + the first PID-42 packet's
    assert(t.durationMs == 9L * 45000L / 90L) // 4500 ms of 90 kHz clock
    // a lattice break (garbage where sync must be) stops the count
    val broken = stream.take(188 * 3) ++
      Array.tabulate[Byte](400)(i => (i * 3 + 1).toByte)
    assert(Multimodal.parseTsPackets(broken).get.nPackets == 3)
    assert(Multimodal.parseTsPackets(
      Array.tabulate[Byte](300)(i => (i * 7 + 2).toByte)).isEmpty)
    (0 to stream.length by 11).foreach(k =>
      Multimodal.parseTsPackets(stream.take(k)))
  }

  // ------------------------------------------------ MP4 sample tables

  test("parseMp4: sample tables reconstruct per-frame byte ranges, " +
    "timestamps and keyframes across layouts (moov first/last, stco/co64, " +
    "1-per and N-per-chunk, uniform and non-uniform stts)") {
    val jpegs = (0 until 6).map(t =>
      GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(11, t), 0.85f))
    val durs = Seq(100L, 100L, 400L, 400L, 500L, 500L) // non-uniform
    for ((spc, moovFirst, co64) <- Seq((6, true, false), (2, false, true),
        (1, true, true), (4, false, false))) {
      val data = GenMp4Fixture.mp4(64, 48, 1000L, durs, jpegs,
        samplesPerChunk = spc, moovFirst = moovFirst, useCo64 = co64,
        syncEvery = Some(3))
      val t = Multimodal.parseMp4(data).get
      assert(t.width == 64 && t.height == 48 && t.codec == "jpeg")
      assert(t.timescale == 1000L && t.durationMs == 2000L)
      assert(t.frames.length == 6)
      // byte ranges point at the ACTUAL JPEG bytes
      t.frames.zip(jpegs).foreach { case ((off, len), j) =>
        assert(len == j.length)
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(data, off, off + len), j))
      }
      // timestamps are the cumulative stts deltas on the media scale
      assert(t.tsUs == IndexedSeq(0L, 100000L, 200000L, 600000L,
        1000000L, 1500000L))
      assert(t.keyframes == IndexedSeq(0, 3)) // samples 1 and 4, 0-based
    }
    // stss absent = every sample sync (empty marker)
    val noStss = GenMp4Fixture.mp4(64, 48, 1000L, durs, jpegs,
      samplesPerChunk = 6, moovFirst = true, useCo64 = false,
      syncEvery = None)
    assert(Multimodal.parseMp4(noStss).get.keyframes.isEmpty)
    // offsets past EOF refuse at the bounds check, metadata still parses
    val badOffs = GenMp4Fixture.mp4(64, 48, 1000L, durs, jpegs,
      samplesPerChunk = 6, moovFirst = true, useCo64 = false,
      syncEvery = None, offsetShift = 1L << 24)
    assert(Multimodal.parseMp4(badOffs).isEmpty)
    assert(Multimodal.parseAvMeta(badOffs).get.container == "mp4")
    // GenAvFixture's stbl-less mp4 (mvhd/tkhd only) has no frame tables
    assert(Multimodal.parseMp4(
      GenAvFixture.mp4(0, 1000L, 4321L, 640, 480, moovFirst = true)).isEmpty)
    // EDIT LIST: a 400 ms media_time offset edits the first frames out of
    // presentation and shifts the rest so t=0 is the edit point
    val edited = GenMp4Fixture.mp4(64, 48, 1000L, Seq.fill(6)(200L), jpegs,
      samplesPerChunk = 6, moovFirst = true, useCo64 = false,
      syncEvery = Some(3), editMediaTime = 400L)
    val te = Multimodal.parseMp4(edited).get
    assert(te.frames.length == 4, s"got ${te.frames.length} frames")
    assert(te.tsUs == IndexedSeq(0L, 200000L, 400000L, 600000L))
    assert(te.durationMs == 800L)
    // sample 4 (0-based 3) was the second sync point; after dropping two
    // leading samples it is shown index 1
    assert(te.keyframes == IndexedSeq(1))
    // the shown byte ranges are the LAST 4 source JPEGs
    te.frames.zip(jpegs.drop(2)).foreach { case ((off, len), j) =>
      assert(len == j.length && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(edited, off, off + len), j))
    }
    // an empty edit (media_time -1) alone leaves the table untouched
    // (initial-delay-only lists are ignored by the conservative subset):
    // patch the single entry's media_time to -1
    val neg = edited.clone()
    val ei = neg.indexOfSlice("elst".getBytes("US-ASCII"))
    // media_time sits at elst+16: fourcc(4) + ver/flags(4) + count(4) +
    // segment_duration(4) precede it in the v0 layout
    (0 until 4).foreach(k => neg(ei + 16 + k) = 0xff.toByte)
    val tn = Multimodal.parseMp4(neg).get
    assert(tn.frames.length == 6 && tn.durationMs == 1200L)
  }

  test("videoFrameHashes and videoStats treat MJPEG-in-MP4 like " +
    "AVI/MJPEG, honoring non-uniform stts timing (a constant-fps " +
    "estimate would sample different frames)") {
    // frames cover [0,100) [100,200) [200,1600) [1600,2600) ms: ticks at
    // 500 ms must hit source frames 0,2,2,2,3,3 — under a constant-fps
    // estimate (4 frames / 2.6 s = 650 ms each) tick 1 would hit frame 0
    val px = (0 until 4).map(t => GenVideoFixture.framePx(13, t))
    val jpegs = px.map(GenVideoFixture.encodeJpeg(_, 0.85f))
    val data = GenMp4Fixture.mp4(64, 48, 1000L,
      Seq(100L, 100L, 1400L, 1000L), jpegs,
      samplesPerChunk = 4, moovFirst = true, useCo64 = false,
      syncEvery = None)
    val media = Seq((1L, "video", data)).toDF("id", "kind", "data")
    val rows = Multimodal.videoFrameHashes(media, everyMs = 500L)
      .collect().sortBy(_.frame_idx)
    assert(rows.length == 6 && rows.forall(_.decoded))
    val expect = jpegs.map { j =>
      val p = GenVideoFixture.decodePx(j)
      GenImagePhashFixture.expectedDHash(p)
    }
    assert(rows.map(_.dhash.get).toSeq ==
      Seq(0, 2, 2, 2, 3, 3).map(expect(_)))
    // real frame bytes flow out of sampleFramesByTime for MP4 too
    val frames = Multimodal.sampleFramesByTime(media, everyMs = 500L)
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]]("frame")))
      .sortBy(_._1)
    assert(frames.map(_._1).toSeq == (0 until 6))
    assert(java.util.Arrays.equals(frames(1)._2, jpegs(2)))
    assert(java.util.Arrays.equals(frames(5)._2, jpegs(3)))
    // stats fold over the same schedule
    val st = Multimodal.videoStats(media, everyMs = 500L).collect().head
    assert(st.decoded && st.nSampled == 6 && st.nDecoded == 6)
    assert(st.nPixels == 6L * 64 * 48)
  }

  test("video samplers memoize repeated frame decodes: a low-fps clip " +
    "under a dense schedule decodes each DISTINCT sampled frame once, " +
    "with identical output to the unmemoized arithmetic") {
    // 3 source frames at 0.5 fps (2 s per frame), sampled every 100 ms:
    // 61 ticks over the 6 s duration, but only 3 distinct source frames
    val frames = (0 until 3).map(t =>
      GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(33, t), 0.85f))
    val media = Seq((1L, "video",
      GenVideoFixture.avi(64, 48, 2000000L, frames))).toDF("id", "kind", "data")
    Multimodal.FrameDecodeCounter.reset()
    val hashes = Multimodal.videoFrameHashes(media, everyMs = 100L).collect()
    val hashDecodes = Multimodal.FrameDecodeCounter.sum()
    assert(hashes.length == 61, s"expected 61 ticks, got ${hashes.length}")
    assert(hashDecodes == 3,
      s"decode work must be bounded by distinct frames, got $hashDecodes")
    // every tick's hash equals the per-tick (unmemoized) recompute: tick i
    // covers source frame min(i*100ms / 2000ms, 2)
    val expected = frames.map { jpeg =>
      val px = GenVideoFixture.decodePx(jpeg)
      (GenImagePhashFixture.expectedAHash(px), GenImagePhashFixture.expectedDHash(px))
    }
    hashes.foreach { h =>
      val fi = math.min(h.ts_ms / 2000L, 2L).toInt
      assert(h.decoded && h.ahash.contains(expected(fi)._1) &&
        h.dhash.contains(expected(fi)._2), s"tick ${h.frame_idx} drifted")
    }
    Multimodal.FrameDecodeCounter.reset()
    val stats = Multimodal.videoStats(media, everyMs = 100L).collect().head
    assert(Multimodal.FrameDecodeCounter.sum() == 3)
    assert(stats.nSampled == 61 && stats.nDecoded == 61)
    assert(stats.nPixels == 61L * 64 * 48)
  }

  test("audioSignals: ONE decode pass reproduces audioFingerprint and " +
    "audioStats bit-identically over the committed audio fixture") {
    val media = spark.read.parquet("fixtures/audio_fp.parquet")
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val sig = Multimodal.audioSignals(media).collect()
      .map(r => r.id -> r).toMap
    val fp = Multimodal.audioFingerprint(media).collect()
    val st = Multimodal.audioStats(media).collect()
    assert(fp.nonEmpty && fp.exists(_.decoded))
    fp.foreach { f =>
      val s = sig(f.id)
      assert((s.decoded, s.sampleRate, s.channels, s.nFrames, s.afp) ==
        (f.decoded, f.sampleRate, f.channels, f.nFrames, f.afp), s"fp ${f.id}")
    }
    st.foreach { t =>
      val s = sig(t.id)
      assert((s.decoded, s.durationMs, s.peak, s.absSum, s.nSilence,
        s.nClipped) == (t.decoded, t.durationMs, t.peak, t.absSum,
        t.nSilence, t.nClipped), s"stats ${t.id}")
    }
  }

  test("parseMp4Codecs / parseSpsDims: per-track fourcc with SPS-true " +
    "profile/level/dims for AVC; refusals degrade to fourcc-only; fuzz " +
    "never throws") {
    import GenMp4CodecFixture.{SpsParams, buildSps, expectedDims, avcC, mp4With}
    val p = SpsParams(100, 31, widthMbs = 80, heightUnits = 45)
    val sps = buildSps(p)
    val (ew, eh) = expectedDims(p)
    assert(Multimodal.parseSpsDims(sps).contains((100, 31, ew, eh)))
    // a non-SPS NAL refuses
    val notSps = sps.clone(); notSps(0) = 0x61.toByte
    assert(Multimodal.parseSpsDims(notSps).isEmpty)
    // bit flips degrade to Some-or-None, never throw
    for (i <- 1 until math.min(sps.length, 24); b <- 0 until 8) {
      val mut = sps.clone(); mut(i) = (mut(i) ^ (1 << b)).toByte
      Multimodal.parseSpsDims(mut)
    }
    val file = mp4With("avc1", avcC(sps))
    val tracks = Multimodal.parseMp4Codecs(file).get
    assert(tracks == Seq(Multimodal.Mp4CodecInfo(1, "avc1", isVideo = true,
      Some(100), Some(31), Some(ew), Some(eh))))
    // every prefix degrades (None or fewer tracks), never throws
    (0 to file.length).foreach(k => Multimodal.parseMp4Codecs(file.take(k)))
    assert(Multimodal.parseMp4Codecs("garbage".getBytes).isEmpty)
  }

  test("videoFrameSignals: ONE decode pass reproduces videoFrameHashes " +
    "and videoStats bit-identically — per-tick hashes, per-clip counters, " +
    "marker-row degrade — at half the decode count") {
    val frames = (0 until 4).map(t =>
      GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(47, t), 0.85f))
    val media = Seq(
      (1L, "video", GenVideoFixture.avi(64, 48, 500000L, frames)),
      (2L, "video", Array.tabulate[Byte](64)(i => (i * 7).toByte))) // junk
      .toDF("id", "kind", "data")
    Multimodal.FrameDecodeCounter.reset()
    val sig = Multimodal.videoFrameSignals(media, everyMs = 250L).collect()
    val sigDecodes = Multimodal.FrameDecodeCounter.sum()
    // equivalence to the two separate passes
    val hashes = Multimodal.videoFrameHashes(media, everyMs = 250L).collect()
    val stats = Multimodal.videoStats(media, everyMs = 250L)
      .collect().map(r => r.id -> r).toMap
    assert(Multimodal.FrameDecodeCounter.sum() == 3 * sigDecodes,
      "hashes + stats must decode twice what signals decodes once")
    assert(sig.map(r => (r.id, r.frame_idx, r.ts_ms, r.decoded, r.ahash,
        r.dhash)).sortBy(r => (r._1, r._2)).toSeq ==
      hashes.map(h => (h.id, h.frame_idx, h.ts_ms, h.decoded, h.ahash,
        h.dhash)).sortBy(r => (r._1, r._2)).toSeq)
    for (id <- Seq(1L, 2L)) {
      val rows = sig.filter(_.id == id)
      val st = stats(id)
      assert(rows.forall(_.parsed == st.decoded))
      assert(rows.count(r => r.parsed) == st.nSampled)
      assert(rows.count(_.decoded) == st.nDecoded)
      assert(rows.count(_.black) == st.nBlack)
      assert(rows.count(_.flat) == st.nFlat)
      assert(rows.map(_.lumaSum).sum == st.lumaSum)
      assert(rows.map(_.nPixels).sum == st.nPixels)
    }
    // the junk payload degrades to exactly one marker row
    assert(sig.count(_.id == 2L) == 1 && !sig.find(_.id == 2L).get.parsed)
  }
}
