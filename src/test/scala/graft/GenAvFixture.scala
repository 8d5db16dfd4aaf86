package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/multimodal_av.parquet` — committed
  * ground truth for the q_multimodal_av oracle, the audio/video sibling of
  * [[GenMultimodalFixture]]. Each row is a REAL container header the
  * engine must parse ([[graft.multimodal.Multimodal.parseAvMeta]]):
  *
  *  - WAV rows are written by the JDK's own `AudioSystem` WAVE encoder (an
  *    INDEPENDENT implementation, like ImageIO for the image fixture), at
  *    varying sample rates / channel counts / lengths;
  *  - MP4 rows are ISO-BMFF box trees built per 14496-12's published
  *    layouts (no JDK MP4 encoder exists): ftyp + moov(mvhd + audio trak +
  *    video trak) + mdat, exercising version-0 AND version-1
  *    mvhd/tkhd, moov-before-mdat AND moov-after-mdat (non-faststart)
  *    orders, and an audio trak FIRST so the parser must skip 0-width
  *    tracks;
  *  - corrupt rows (truncated mid-box, bad chunk size) carry the
  *    documented stub-formula ground truth — a 100 TB ingest will contain
  *    them and the decode must degrade, not throw.
  *
  * Run once: `sbt "Test/runMain graft.GenAvFixture"`, commit the parquet.
  * Deterministic: seeded content, fixed sizes, one output file. */
object GenAvFixture {

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** Identity transform matrix (9 x 32-bit fixed-point). */
  private val matrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
    be32(0) ++ be32(0x00010000L) ++ be32(0) ++
    be32(0) ++ be32(0) ++ be32(0x40000000L)

  private def mvhd(version: Int, timescale: Long, duration: Long): Array[Byte] = {
    val times = if (version == 1) be64(0) ++ be64(0) else be32(0) ++ be32(0)
    val dur = if (version == 1) be64(duration) else be32(duration)
    box("mvhd", Array[Byte](version.toByte, 0, 0, 0) ++ times ++
      be32(timescale) ++ dur ++
      be32(0x00010000L) ++ be16(0x0100) ++ new Array[Byte](10) ++ matrix ++
      new Array[Byte](24) ++ be32(2)) // pre_defined + next_track_ID
  }

  private def tkhd(version: Int, trackId: Long, w: Int, h: Int): Array[Byte] = {
    val times = if (version == 1) be64(0) ++ be64(0) else be32(0) ++ be32(0)
    val dur = if (version == 1) be64(0) else be32(0)
    box("tkhd", Array[Byte](version.toByte, 0, 0, 7) ++ times ++
      be32(trackId) ++ be32(0) ++ dur ++ new Array[Byte](8) ++
      be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ matrix ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16)) // 16.16 fixed-point
  }

  /** Package-visible so MultimodalSpec can drive the same independent box
    * builder against the parser. */
  private[graft] def mp4(version: Int, timescale: Long, duration: Long, w: Int, h: Int,
      moovFirst: Boolean): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200) ++
      "isomiso2".getBytes("US-ASCII"))
    // audio trak FIRST (width 0x0): the parser must skip it for dimensions
    val moov = box("moov", mvhd(version, timescale, duration) ++
      box("trak", tkhd(version, 1, 0, 0)) ++
      box("trak", tkhd(version, 2, w, h)))
    val mdat = box("mdat", Array.tabulate(64)(i => (i * 7).toByte))
    if (moovFirst) ftyp ++ moov ++ mdat else ftyp ++ mdat ++ moov
  }

  // ----- Matroska/WebM: EBML elements hand-built per the published layout

  private def ebmlId(id: Long): Array[Byte] = {
    // ids are stored as-is (marker bit included); emit minimal big-endian
    val len = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    (1 to len).map(j => ((id >> (8 * (len - j))) & 0xff).toByte).toArray
  }

  private def ebmlSize(n: Long): Array[Byte] = {
    // minimal vint with the length marker in the leading bits
    var len = 1
    while (n >= (1L << (7 * len)) - 1) len += 1 // all-ones is "unknown": avoid
    val v = n | (1L << (7 * len))
    (1 to len).map(j => ((v >> (8 * (len - j))) & 0xff).toByte).toArray
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ ebmlSize(payload.length.toLong) ++ payload

  private def ebmlUint(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    (1 to len).map(j => ((v >> (8 * (len - j))) & 0xff).toByte).toArray
  }

  private def ebmlFloat(f: Float): Array[Byte] =
    be32(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)

  /** Package-visible so MultimodalSpec can drive the independent builder
    * against the parser — like [[mp4]]. `unknownSegmentSize` emits the
    * streamed-file shape (size bits all ones, element runs to the end). */
  private[graft] def webm(w: Int, h: Int, durTicks: Float, tsScale: Long,
      sr: Float, ch: Int, docType: String = "webm",
      unknownSegmentSize: Boolean = false): Array[Byte] = {
    val header = el(0x1a45dfa3L,
      el(0x4286L, ebmlUint(1)) ++            // EBMLVersion
      el(0x4282L, docType.getBytes("US-ASCII")) ++
      el(0x4287L, ebmlUint(4)))              // DocTypeVersion
    val info = el(0x1549a966L,
      el(0x2ad7b1L, ebmlUint(tsScale)) ++ el(0x4489L, ebmlFloat(durTicks)))
    val videoTrack = el(0xaeL, el(0x83L, ebmlUint(1)) ++
      el(0xe0L, el(0xb0L, ebmlUint(w)) ++ el(0xbaL, ebmlUint(h))))
    val audioTrack = el(0xaeL, el(0x83L, ebmlUint(2)) ++
      el(0xe1L, el(0xb5L, ebmlFloat(sr)) ++ el(0x9fL, ebmlUint(ch))))
    val tracks = el(0x1654ae6bL, videoTrack ++ audioTrack)
    val segPayload = info ++ tracks
    val segment =
      if (unknownSegmentSize)
        ebmlId(0x18538067L) ++ Array(0xff.toByte) ++ segPayload
      else el(0x18538067L, segPayload)
    header ++ segment
  }

  /** The parser's own duration arithmetic, applied to the builder inputs —
    * the fixture's ground truth must be computed independently of the
    * parse but identically rounded. */
  private[graft] def webmDurationMs(durTicks: Float, tsScale: Long): Long =
    (durTicks.toDouble * tsScale / 1e6).toLong

  /** A WebM with CLUSTERS of SimpleBlocks — the per-frame layer the block
    * walk reads: per the published Matroska layout, each Cluster carries
    * a Timestamp (0xE7, cluster base in ticks) and SimpleBlocks (0xA3:
    * track vint + s16 relative timestamp + flags byte, bit 0x80 =
    * keyframe, then frame data). `videoBlocks` = per-cluster lists of
    * (relativeTicks, keyframe, payloadBytes); interleaved AUDIO blocks
    * (track 2) are written after every video block so the walk's
    * track filter is exercised. TrackNumber elements (0xD7) are written
    * here (the metadata-only [[webm]] omits them). */
  private[graft] def webmClusters(w: Int, h: Int, tsScale: Long,
      clusters: Seq[(Long, Seq[(Int, Boolean, Int)])],
      withAudioBlocks: Boolean = true): Array[Byte] = {
    val header = el(0x1a45dfa3L,
      el(0x4286L, ebmlUint(1)) ++
      el(0x4282L, "webm".getBytes("US-ASCII")) ++
      el(0x4287L, ebmlUint(4)))
    val info = el(0x1549a966L, el(0x2ad7b1L, ebmlUint(tsScale)))
    val videoTrack = el(0xaeL,
      el(0xd7L, ebmlUint(1)) ++ el(0x83L, ebmlUint(1)) ++
      el(0xe0L, el(0xb0L, ebmlUint(w)) ++ el(0xbaL, ebmlUint(h))))
    val audioTrack = el(0xaeL,
      el(0xd7L, ebmlUint(2)) ++ el(0x83L, ebmlUint(2)) ++
      el(0xe1L, el(0xb5L, ebmlFloat(48000f)) ++ el(0x9fL, ebmlUint(2))))
    val tracks = el(0x1654ae6bL, videoTrack ++ audioTrack)
    def simpleBlock(track: Int, rel: Int, key: Boolean, n: Int): Array[Byte] = {
      val payload = Array.tabulate[Byte](n)(i => ((i * 31 + n) & 0x7f).toByte)
      el(0xa3L, Array((0x80 | track).toByte,
        ((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
        (if (key) 0x80 else 0).toByte) ++ payload)
    }
    val clusterEls = clusters.toArray.flatMap { case (baseTicks, blocks) =>
      el(0x1f43b675L,
        el(0xe7L, ebmlUint(baseTicks)) ++
        blocks.toArray.flatMap { case (rel, key, n) =>
          simpleBlock(1, rel, key, n) ++
            (if (withAudioBlocks) simpleBlock(2, rel, key = true, 11)
             else Array.emptyByteArray)
        })
    }
    header ++ el(0x18538067L, info ++ tracks ++ clusterEls)
  }

  // ----- MP3: frame header per the published MPEG audio layout

  /** brIdx/srIdx index the standard Layer III tables; `id3Pad` prepends an
    * ID3v2 tag of that payload size (syncsafe length) the parser must
    * skip. */
  private[graft] def mp3(verBits: Int, brIdx: Int, srIdx: Int, mono: Boolean,
      audioBytes: Int, id3Pad: Int = 0): Array[Byte] = {
    val id3 =
      if (id3Pad <= 0) Array.empty[Byte]
      else "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0,
        ((id3Pad >> 21) & 0x7f).toByte, ((id3Pad >> 14) & 0x7f).toByte,
        ((id3Pad >> 7) & 0x7f).toByte, (id3Pad & 0x7f).toByte) ++
        new Array[Byte](id3Pad)
    val b1 = (0xe0 | (verBits << 3) | (1 << 1) | 1).toByte // Layer III, no CRC
    val b2 = ((brIdx << 4) | (srIdx << 2)).toByte
    val b3 = (if (mono) 0xc0 else 0x40).toByte // mode 3 = mono, 1 = joint
    val frames = new Array[Byte](audioBytes - 4)
    new scala.util.Random(77 + audioBytes).nextBytes(frames)
    id3 ++ Array(0xff.toByte, b1, b2, b3) ++ frames
  }

  private[graft] def mp3Kbps(verBits: Int, brIdx: Int): Int =
    if (verBits == 3)
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
    else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)

  private[graft] def mp3SampleRate(verBits: Int, srIdx: Int): Int = verBits match {
    case 3 => Array(44100, 48000, 32000)(srIdx)
    case 2 => Array(22050, 24000, 16000)(srIdx)
    case _ => Array(11025, 12000, 8000)(srIdx)
  }

  // ----- FLAC: STREAMINFO per the published bit layout

  private[graft] def flac(sr: Int, ch: Int, totalSamples: Long,
      streamInfoFirst: Boolean = true): Array[Byte] = {
    val packed = Array[Byte](
      ((sr >> 12) & 0xff).toByte,
      ((sr >> 4) & 0xff).toByte,
      (((sr & 0xf) << 4) | ((ch - 1) << 1) | (15 >> 4)).toByte, // 16-bit bps
      ((15 << 4) & 0xf0 | ((totalSamples >> 32) & 0xf)).toByte,
      (totalSamples >> 24).toByte, (totalSamples >> 16).toByte,
      (totalSamples >> 8).toByte, totalSamples.toByte)
    val streamInfo = be16(4096) ++ be16(4096) ++ // min/max block size
      Array[Byte](0, 0, 0, 0, 0, 0) ++           // min/max frame size
      packed ++ new Array[Byte](16)              // md5 of zeros
    val header =
      if (streamInfoFirst) Array[Byte](0x80.toByte, 0, 0, 34)
      else Array[Byte](0x84.toByte, 0, 0, 34) // wrong type: must stub
    "fLaC".getBytes("US-ASCII") ++ header ++ streamInfo ++
      Array.tabulate(48)(i => (i * 5).toByte)
  }

  // ----- animated WebP: RIFF chunks per the published container spec

  private def le24(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
  private def le32b(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    id.getBytes("US-ASCII") ++ le32b(payload.length.toLong) ++ payload ++ pad
  }

  /** Package-visible so MultimodalSpec can drive the independent builder
    * against the parser — like [[mp4]]/[[webm]]. Frame durations in ms;
    * `still = true` omits ANIM/ANMF (an image, which the AV parser must
    * NOT claim). Odd-length ANMF payloads exercise RIFF word alignment. */
  private[graft] def webpAnim(w: Int, h: Int, frameDursMs: Seq[Int],
      still: Boolean = false): Array[Byte] = {
    val vp8x = riffChunk("VP8X",
      Array[Byte](if (still) 0 else 2, 0, 0, 0) ++ le24(w - 1) ++ le24(h - 1))
    val anim = riffChunk("ANIM", le32b(0xffffffffL) ++ Array[Byte](0, 0))
    val frames = frameDursMs.zipWithIndex.map { case (d, fi) =>
      val bitstream = Array.tabulate(21 + fi)(j => (j * 11 + fi).toByte)
      riffChunk("ANMF", le24(0) ++ le24(0) ++ le24(w - 1) ++ le24(h - 1) ++
        le24(d) ++ Array[Byte](0) ++ bitstream)
    }.reduceOption(_ ++ _).getOrElse(Array.empty[Byte])
    val payload = "WEBP".getBytes("US-ASCII") ++ vp8x ++
      (if (still) Array.empty[Byte] else anim ++ frames)
    "RIFF".getBytes("US-ASCII") ++ le32b(payload.length.toLong) ++ payload
  }

  private def wav(sampleRate: Int, channels: Int, nFrames: Int, seed: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    new scala.util.Random(seed).nextBytes(pcm)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-av-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._
    // (media_id, kind, data, container, width, height, duration_ms, sample_rate, channels)
    val rows = (0 until 72).map { i =>
      def stub(kind: String, data: Array[Byte]) = {
        val n = data.length.toLong
        (i.toLong, kind, data, "opaque",
          16 + (n % 64).toInt, 16 + (n % 48).toInt, n % 10000L, 0, 0)
      }
      if (i >= 64) (i - 64) % 4 match {
        case 0 | 1 => // animated WebP: varying canvas, frame count, durations
          val (w, h) = (64 + (i * 13) % 1000, 48 + (i * 7) % 700)
          val durs = (0 until 2 + i % 5).map(j => 33 + ((i + j) * 29) % 400)
          val data = webpAnim(w, h, durs)
          (i.toLong, "video", data, "webp", w, h, durs.map(_.toLong).sum, 0, 0)
        case 2 => // STILL WebP: an image, not an AV payload — must stub
          stub("video", webpAnim(320, 240, Seq.empty, still = true))
        case _ => // ANIM chunk but zero ANMF frames: malformed — must stub
          stub("video", webpAnim(200, 100, Seq.empty))
      }
      else if (i >= 40) (i - 40) % 6 match {
        case 0 => // WebM/Matroska: varying geometry, timescale, doctype,
          // and the streamed unknown-size Segment shape
          val (w, h) = (320 + (i * 29) % 1600, 180 + (i * 17) % 900)
          val ts = Seq(1000000L, 500000L, 2000000L)((i / 6) % 3)
          val durT = 2345.5f + i * 13
          val sr = Seq(44100f, 48000f)((i / 6) % 2)
          val ch = 1 + i % 2
          val dt = if ((i - 40) % 12 == 6) "matroska" else "webm"
          val data = webm(w, h, durT, ts, sr, ch, docType = dt,
            unknownSegmentSize = (i - 40) % 12 == 0)
          (i.toLong, "video", data, dt, w, h, webmDurationMs(durT, ts),
            sr.toInt, ch)
        case 1 => // MP3, MPEG1 Layer III, bare frame stream
          val brIdx = 1 + (i * 7) % 14
          val srIdx = i % 3
          val mono = i % 2 == 0
          val nBytes = 4000 + i * 97
          val data = mp3(3, brIdx, srIdx, mono, nBytes)
          (i.toLong, "audio", data, "mp3", 0, 0,
            nBytes.toLong * 8L / mp3Kbps(3, brIdx), mp3SampleRate(3, srIdx),
            if (mono) 1 else 2)
        case 2 => // FLAC STREAMINFO: exact sample-count duration
          val sr = Seq(44100, 48000, 96000)((i / 6) % 3)
          val ch = 1 + i % 2
          val total = sr.toLong * (2 + i % 5) + i * 31
          val data = flac(sr, ch, total)
          (i.toLong, "audio", data, "flac", 0, 0, total * 1000L / sr, sr, ch)
        case 3 => // MP3 behind an ID3v2 tag, MPEG2 tables
          val brIdx = 1 + (i * 5) % 14
          val srIdx = i % 3
          val nBytes = 3000 + i * 83
          val data = mp3(2, brIdx, srIdx, mono = false, nBytes, id3Pad = 100 + i)
          (i.toLong, "audio", data, "mp3", 0, 0,
            nBytes.toLong * 8L / mp3Kbps(2, brIdx), mp3SampleRate(2, srIdx), 2)
        case 4 => // truncated WebM (cut mid-element): must stub, not throw
          val full = webm(640, 360, 9999f, 1000000L, 48000f, 2)
          stub("video", full.take(full.length / 2))
        case _ => // FLAC whose first block is not STREAMINFO: spec
          // violation, must stub
          stub("audio", flac(44100, 2, 123456L, streamInfoFirst = false))
      }
      else i % 4 match {
        case 0 => // MP4, varying geometry/timescale, both box orders/versions
          val (w, h) = (160 + (i * 37) % 1800, 120 + (i * 23) % 1000)
          val ts = Seq(600L, 1000L, 90000L)(i / 4 % 3)
          val dur = ts * (3 + i) + i * 11 // non-integral seconds
          val v = (i / 4) % 2
          val data = mp4(v, ts, dur, w, h, moovFirst = i % 8 == 0)
          (i.toLong, "video", data, "mp4", w, h, dur * 1000L / ts, 0, 0)
        case 1 => // WAV via the JDK encoder, varying rate/channels/length
          val sr = Seq(8000, 16000, 22050, 44100, 48000)(i / 4 % 5)
          val ch = 1 + (i / 4) % 2
          val nFrames = sr / 5 + i * 41 // ~0.2 s + jitter
          val data = wav(sr, ch, nFrames, 500 + i)
          val byteRate = sr * ch * 2
          (i.toLong, "audio", data, "wav", 0, 0,
            nFrames.toLong * ch * 2 * 1000L / byteRate, sr, ch)
        case 2 => // truncated MP4 (cut mid-moov): must stub, not throw
          val full = mp4(0, 1000L, 4321L, 640, 480, moovFirst = true)
          stub("video", full.take(full.length / 3))
        case _ => // seeded opaque bytes: the plain stub path
          val rnd = new scala.util.Random(2000 + i)
          val data = Array.ofDim[Byte](120 + i * 17)
          rnd.nextBytes(data)
          stub("video", data)
      }
    } ++ (72 until 76).map { i =>
      // OGG rows (r15): parseAvMeta routes OggS payloads through the
      // CRC-verified page walk — codec-labeled containers with
      // granule-position durations; corrupt CRCs and junk-behind-magic
      // stub (the CRC gate is what makes the routing oracle-safe)
      def stub(kind: String, data: Array[Byte]) = {
        val n = data.length.toLong
        (i.toLong, kind, data, "opaque",
          16 + (n % 64).toInt, 16 + (n % 48).toInt, n % 10000L, 0, 0)
      }
      (i - 72) match {
        case 0 =>
          val data = GenOggFixture.page(3L, 0, 0, 0x02,
              Seq(GenOggFixture.vorbisId(22050, 1))) ++
            GenOggFixture.page(3L, 1, 33075L, 0x04,
              Seq(Array.tabulate[Byte](64)(j => (j * 5).toByte)))
          (i.toLong, "audio", data, "ogg-vorbis", 0, 0, 1500L, 22050, 1)
        case 1 =>
          val data = GenOggFixture.page(4L, 0, 0, 0x02,
              Seq(GenOggFixture.opusHead(2, 312, 48000))) ++
            GenOggFixture.page(4L, 1, 24312L, 0x04,
              Seq(Array.tabulate[Byte](80)(j => (j * 11).toByte)))
          (i.toLong, "audio", data, "ogg-opus", 0, 0, 500L, 48000, 2)
        case 2 => // first page's CRC corrupted: not one valid page, stub
          val good = GenOggFixture.page(5L, 0, 0, 0x02,
            Seq(GenOggFixture.vorbisId(44100, 2)))
          stub("audio", good.updated(40, (good(40) ^ 0x0f).toByte))
        case _ => // junk behind the magic: stub
          stub("audio", "OggS".getBytes("US-ASCII") ++
            Array.tabulate[Byte](60)(j => (j * 17 + 1).toByte))
      }
    }
    val out = "fixtures/multimodal_av.parquet"
    rows.toDF("media_id", "kind", "data", "container", "width", "height",
        "duration_ms", "sample_rate", "channels")
      .coalesce(1).write.mode("overwrite").parquet(out + ".dir")
    val part = new java.io.File(out + ".dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    println(s"wrote $out with ${rows.size} rows")
    spark.stop()
  }
}
