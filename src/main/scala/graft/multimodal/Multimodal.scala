package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support for training-data pipelines: media payloads as
  * opaque `binary` columns with typed metadata, processed batch-at-a-time
  * inside partitions (the Scala analogue of `mapInPandas` — one iterator
  * per partition, vectorizable batch shape, no driver materialization).
  *
  * Metadata extraction is REAL, pure-JVM, and reads only container
  * headers: PNG IHDR, GIF logical screen descriptor, and the JPEG SOFn
  * frame header ([[parseDimensions]]); MP4/ISO-BMFF box walk (tkhd
  * width/height, mvhd duration), WAV/RIFF fmt+data chunks,
  * WebM/Matroska EBML elements (DocType, TimestampScale/Duration, video
  * PixelWidth/Height, audio SamplingFrequency/Channels), MP3 frame
  * headers (Layer III bitrate/sample-rate tables + the CBR duration
  * estimate), and FLAC STREAMINFO via [[parseAvMeta]] — no external
  * codec needed, the containers publish the metadata a curation pipeline
  * filters on. Unrecognized or corrupt payloads fall back to a
  * clearly-marked deterministic STUB branch; full pixel/sample DECODING
  * (not metadata) still needs codecs this environment does not ship, and
  * swapping a real one in changes only that branch of `decodeBatch`.
  */
object Multimodal {

  /** Container-header dimension sniffing, by magic bytes (the payload's
    * `kind` label is advisory — bytes decide):
    *  - PNG: 8-byte signature, then the IHDR chunk at a fixed offset —
    *    width/height are big-endian u32 at bytes 16/20.
    *  - GIF (87a/89a): logical screen descriptor — width/height are
    *    little-endian u16 at bytes 6/8.
    *  - JPEG: walk the marker segments from SOI to the first SOFn frame
    *    header (C0-CF minus C4/C8/CC); height/width are big-endian u16 at
    *    segment offsets +5/+7.
    *  - WebP (RIFF 64428-ish, per the public container spec): `RIFF....WEBP`
    *    magic, then the first chunk decides the flavor — `VP8 ` (lossy:
    *    14-bit LE dimensions behind the 9D 01 2A frame sync), `VP8L`
    *    (lossless: 14-bit-packed width-1/height-1 behind the 2F signature),
    *    `VP8X` (extended: LE24 canvas width-1/height-1). Web crawls are
    *    WebP-heavy, so this branch carries real coverage.
    *  - AVIF (ISO-BMFF, 14496-12 + AV1-AVIF): `ftyp` major brand
    *    avif/avis, then the box walk meta → iprp → ipco → `ispe`
    *    (image spatial extent: BE32 width/height after the FullBox head).
    *    Multi-item files (thumbnail + primary, image sequences) resolve
    *    the PRIMARY item's ispe through `pitm` → `ipma` property
    *    associations; single-item files (and malformed association
    *    tables) fall back to the first ispe in ipco.
    *  - BMP: `BM` magic, then the DIB header size discriminates
    *    BITMAPCOREHEADER (u16 dims) from BITMAPINFOHEADER+ (s32 dims;
    *    a negative height means top-down rows — magnitude reported).
    *  - TIFF (II little / MM big endian): first-IFD entry walk for
    *    ImageWidth (256) / ImageLength (257), SHORT and LONG value
    *    layouts; later IFDs (thumbnails) ignored.
    * Returns None for anything else — truncated streams, other containers —
    * which routes the row to the stub branch instead of throwing: a 100 TB
    * ingest WILL contain corrupt payloads and one must not kill the job. */
  def parseDimensions(data: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = data(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (data.length >= 24 && u8(0) == 0x89 && data(1) == 'P' &&
        data(2) == 'N' && data(3) == 'G' &&
        new String(data, 12, 4, java.nio.charset.StandardCharsets.US_ASCII) == "IHDR")
      Some((be32(16), be32(20)))
    else if (data.length >= 10 && data(0) == 'G' && data(1) == 'I' && data(2) == 'F' &&
        data(3) == '8' && (data(4) == '7' || data(4) == '9') && data(5) == 'a')
      Some((le16(6), le16(8)))
    else if (data.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 < data.length) {
        if (u8(i) != 0xff) return None // desynced marker stream
        var j = i + 1
        while (j < data.length - 1 && u8(j) == 0xff) j += 1 // skip fill bytes
        val marker = u8(j)
        if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before any SOF
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return if (j + 8 < data.length) Some((be16(j + 6), be16(j + 4))) else None
        if (j + 2 >= data.length) return None
        val len = be16(j + 1)
        if (len < 2) return None
        i = j + 1 + len
      }
      None
    }
    else if (data.length >= 16 && data(0) == 'R' && data(1) == 'I' &&
        data(2) == 'F' && data(3) == 'F' && data(8) == 'W' &&
        data(9) == 'E' && data(10) == 'B' && data(11) == 'P') {
      def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      new String(data, 12, 4, java.nio.charset.StandardCharsets.US_ASCII) match {
        // lossy: 3-byte frame tag, 9D 01 2A sync, then 14-bit LE dims
        case "VP8 " if data.length >= 30 && u8(23) == 0x9d &&
            u8(24) == 0x01 && u8(25) == 0x2a =>
          Some((le16(26) & 0x3fff, le16(28) & 0x3fff))
        // lossless: 2F signature, then width-1 / height-1 as two 14-bit
        // fields packed little-endian
        case "VP8L" if data.length >= 25 && u8(20) == 0x2f =>
          val b = u8(21).toLong | (u8(22).toLong << 8) |
            (u8(23).toLong << 16) | (u8(24).toLong << 24)
          Some((((b & 0x3fff) + 1).toInt, (((b >> 14) & 0x3fff) + 1).toInt))
        // extended: flags + reserved (4 bytes), then LE24 canvas dims - 1
        case "VP8X" if data.length >= 30 =>
          Some((le24(24) + 1, le24(27) + 1))
        case _ => None
      }
    }
    else if (data.length >= 26 && data(0) == 'B' && data(1) == 'M') {
      // BMP: DIB header size at offset 14 discriminates the layouts —
      // BITMAPCOREHEADER (12: u16 dims) vs BITMAPINFOHEADER+ (40/52/56/
      // 108/124: s32 dims, height NEGATIVE for top-down rows — the sign
      // encodes row order, not geometry, so report its magnitude)
      def le32s(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val dib = le32s(14)
      // closed set of published DIB header sizes, not `>= 40`: every
      // member is < 256, so bytes 15-17 must be NUL — which is also what
      // keeps a text payload that happens to start with "BM" from faking
      // a plausible header out of letter bytes
      val InfoSizes = Set(40, 52, 56, 64, 108, 124)
      if (dib == 12) Some((le16(18), le16(20)))
      else if (InfoSizes.contains(dib)) {
        val w = le32s(18)
        val h = le32s(22)
        if (w > 0 && h != 0 && h != Int.MinValue) Some((w, math.abs(h)))
        else None
      } else None
    }
    else if (data.length >= 8 &&
        ((data(0) == 'I' && data(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
         (data(0) == 'M' && data(1) == 'M' && u8(2) == 0 && u8(3) == 42))) {
      // TIFF: endian-tagged IFD walk for ImageWidth (256) / ImageLength
      // (257). Only the FIRST IFD is read (the primary image; thumbnails
      // live in later IFDs), entries are bounds-checked, and SHORT values
      // sit in the leading two bytes of the value field in FILE order.
      val le = data(0) == 'I'
      def rd16(i: Int): Int =
        if (le) le16(i) else be16(i)
      def rd32(i: Int): Long =
        if (le) (le16(i).toLong | (le16(i + 2).toLong << 16))
        else ((be16(i).toLong << 16) | be16(i + 2).toLong)
      val ifd = rd32(4)
      if (ifd < 8 || ifd + 2 > data.length) None
      else {
        val count = rd16(ifd.toInt)
        var w = -1L
        var h = -1L
        var e = 0
        while (e < count && (w < 0 || h < 0)) {
          val off = ifd + 2 + e.toLong * 12
          if (off + 12 > data.length) { e = count }
          else {
            val tag = rd16(off.toInt)
            if (tag == 256 || tag == 257) {
              val typ = rd16(off.toInt + 2)
              val n = rd32(off.toInt + 4)
              val v =
                if (typ == 3 && n == 1L) rd16(off.toInt + 8).toLong // SHORT
                else if (typ == 4 && n == 1L) rd32(off.toInt + 8)   // LONG
                else -1L
              if (v > 0 && v <= Int.MaxValue) {
                if (tag == 256) w = v else h = v
              }
            }
            e += 1
          }
        }
        if (w > 0 && h > 0) Some((w.toInt, h.toInt)) else None
      }
    }
    else if (data.length >= 16 && data(4) == 'f' && data(5) == 't' &&
        data(6) == 'y' && data(7) == 'p' && {
          val brand = new String(data, 8, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          brand == "avif" || brand == "avis"
        }) {
      // ISO-BMFF box walk bounded to the meta -> iprp -> ipco -> ispe path;
      // sizes read as Long so a hostile 32-bit size cannot wrap negative
      def findBox(from: Long, until: Long, name: String): Option[(Long, Long)] = {
        var i = from
        while (i + 8 <= until) {
          val sz0 = ((u8(i.toInt).toLong << 24) | (u8(i.toInt + 1) << 16) |
            (u8(i.toInt + 2) << 8) | u8(i.toInt + 3))
          val typ = new String(data, i.toInt + 4, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          val (payload, size) =
            if (sz0 == 1L) {
              if (i + 16 > until) return None
              var s = 0L
              var k = 0
              while (k < 8) { s = (s << 8) | u8(i.toInt + 8 + k); k += 1 }
              (i + 16, s)
            } else if (sz0 == 0L) (i + 8, until - i) // box runs to the end
            else (i + 8, sz0)
          if (size < 8 || i + size > until) return None
          if (typ == name) return Some((payload, i + size))
          i += size
        }
        None
      }
      // enumerate the children of a container box IN ORDER — ipma property
      // indexes are 1-based positions in ipco, so order is the contract
      def childBoxes(from: Long, until: Long): Seq[(String, Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var i = from
        var ok = true
        while (ok && i + 8 <= until) {
          val sz0 = ((u8(i.toInt).toLong << 24) | (u8(i.toInt + 1) << 16) |
            (u8(i.toInt + 2) << 8) | u8(i.toInt + 3))
          val typ = new String(data, i.toInt + 4, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          val (payload, size) =
            if (sz0 == 1L) {
              if (i + 16 > until) { ok = false; (0L, 0L) }
              else {
                var s = 0L; var k = 0
                while (k < 8) { s = (s << 8) | u8(i.toInt + 8 + k); k += 1 }
                (i + 16, s)
              }
            } else if (sz0 == 0L) (i + 8, until - i)
            else (i + 8, sz0)
          if (ok && size >= 8 && i + size <= until) {
            out += ((typ, payload, i + size)); i += size
          } else ok = false
        }
        out.toSeq
      }
      val end = data.length.toLong
      (for {
        (metaP, metaE) <- findBox(0L, end, "meta")
        // meta is a FullBox: 4 bytes version/flags before its children
        (iprpP, iprpE) <- findBox(metaP + 4, metaE, "iprp")
        (ipcoP, ipcoE) <- findBox(iprpP, iprpE, "ipco")
      } yield {
        val props = childBoxes(ipcoP, ipcoE)
        def ispeDims(p: Long, bE: Long): Option[(Int, Int)] =
          if (p + 12 <= bE && p + 12 <= end)
            Some((be32((p + 4).toInt), be32((p + 8).toInt)))
          else None
        // PRIMARY-ITEM selection (14496-12 §8.11.4 pitm + HEIF §9.3.2
        // ipma): a multi-item file (thumbnail + primary, `avis` sequences)
        // lists one ispe PER item in ipco, and "first ispe" can be the
        // thumbnail's — resolve pitm's item id through its ipma
        // associations to the primary item's own ispe instead
        val pitmId: Option[Long] =
          findBox(metaP + 4, metaE, "pitm").flatMap { case (p, e) =>
            if (p + 4 > e) None
            else if (u8(p.toInt) == 0) // FullBox version 0: u16 item id
              if (p + 6 <= e) Some(be16((p + 4).toInt).toLong) else None
            else if (p + 8 <= e) Some(be32((p + 4).toInt) & 0xffffffffL)
            else None
          }
        // the primary item's 1-based ipco property indexes, in file order
        def assocIdxs(itemId: Long): Option[Seq[Int]] =
          findBox(iprpP, iprpE, "ipma").flatMap { case (p, e) =>
            if (p + 8 > e) None
            else {
              val ver = u8(p.toInt)
              val wide = (u8(p.toInt + 3) & 1) != 0 // flags bit 0: 15-bit idx
              val idWidth = if (ver < 1) 2 else 4
              val n = be32((p + 4).toInt) & 0xffffffffL
              var i = p + 8
              var entry = 0L
              var found: Option[Seq[Int]] = None
              var ok = true // truncated entry => bail, fallback path below
              while (ok && found.isEmpty && entry < n && i < e) {
                if (i + idWidth + 1 > e) ok = false
                else {
                  val id =
                    if (ver < 1) be16(i.toInt).toLong
                    else be32(i.toInt) & 0xffffffffL
                  i += idWidth
                  val ac = u8(i.toInt); i += 1
                  val step = if (wide) 2 else 1
                  if (i + ac.toLong * step > e) ok = false
                  else {
                    val idxs = (0 until ac).map { a =>
                      if (wide) be16((i + a * 2).toInt) & 0x7fff
                      else u8((i + a).toInt) & 0x7f
                    }
                    i += ac.toLong * step
                    if (id == itemId) found = Some(idxs)
                    entry += 1
                  }
                }
              }
              found
            }
          }
        val viaPrimary = for {
          itemId <- pitmId
          idxs <- assocIdxs(itemId)
          (_, p, bE) <- idxs.iterator
            .flatMap(k => props.lift(k - 1)).find(_._1 == "ispe")
          d <- ispeDims(p, bE)
        } yield d
        // single-item files (no pitm/ipma, or a malformed one): the first
        // ispe in ipco is the only one — the pre-pitm behavior
        viaPrimary.orElse(props.collectFirst {
          case ("ispe", p, bE) => ispeDims(p, bE)
        }.flatten)
      }).flatten
    }
    else None
  }

  /** Container-level audio/video metadata ([[parseAvMeta]]). */
  final case class AvInfo(container: String, width: Int, height: Int,
      durationMs: Long, sampleRate: Int, channels: Int)

  /** Container-header metadata for video/audio payloads, by magic bytes —
    * the same philosophy as [[parseDimensions]]: the metadata a curation
    * pipeline FILTERS on (resolution, duration, sample rate, channel
    * count) lives in the container headers, readable pure-JVM with no
    * codec; only pixel/sample DECODING needs one.
    *  - MP4 / ISO-BMFF (14496-12): `ftyp` magic, then a top-level box walk
    *    to `moov`; `mvhd` carries timescale+duration (version 0 and 1
    *    layouts), each `trak`'s `tkhd` carries 16.16 fixed-point
    *    width/height — the first track with a nonzero width is the video
    *    track (audio tracks store 0x0). Handles moov-after-mdat files
    *    (no faststart) and 64-bit largesize boxes.
    *  - WAV / RIFF: `RIFF....WAVE` magic, then a chunk walk: `fmt ` carries
    *    channels + sample rate + byte rate, `data`'s size gives
    *    durationMs = bytes * 1000 / byteRate (exact integer division).
    *  - Animated WebP / RIFF: `RIFF....WEBP` with an `ANIM` chunk — the
    *    VP8X canvas plus the summed LE24 per-frame durations of every
    *    `ANMF` chunk; still WebPs are images ([[parseDimensions]]) and
    *    fall through to the stub here.
    *  - WebM / Matroska: EBML magic (0x1A45DFA3), then a variable-length-
    *    integer element walk per the published Matroska layout: the EBML
    *    header's DocType names the container ("webm"/"matroska"),
    *    Segment > Info carries TimestampScale (ns per tick, default 1e6)
    *    and the float Duration in ticks, Segment > Tracks > TrackEntry >
    *    Video carries PixelWidth/PixelHeight and > Audio carries
    *    SamplingFrequency/Channels. Unknown-size elements (all size bits
    *    set — streamed Segments) extend to the enclosing bound.
    *  - MP3: optional ID3v2 tag (syncsafe length) skipped, then the first
    *    MPEG audio frame header: version + Layer III bitrate/sample-rate
    *    table lookup, channel mode; durationMs estimated from the audio
    *    byte length at that (constant) bitrate — the standard CBR estimate.
    *  - FLAC: `fLaC` magic, then the mandatory first STREAMINFO metadata
    *    block: sample rate (20 bits), channels (3 bits + 1) and the 36-bit
    *    total-sample count give the exact duration.
    * Returns None for anything else — truncated/desynced streams route to
    * the stub branch instead of throwing, as in [[parseDimensions]]. The
    * stub branch is thus confined to genuinely opaque payloads; only
    * pixel/sample DECODING still needs an external codec. */
  def parseAvMeta(data: Array[Byte]): Option[AvInfo] = {
    def u8(i: Int): Int = data(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def fourcc(i: Int): String =
      new String(data, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk ISO-BMFF boxes in [from, until); apply f(type, payloadStart,
      * boxEnd) to each. Returns false on a malformed size (caller bails). */
    def walkBoxes(from: Long, until: Long)(f: (String, Long, Long) => Unit): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val size0 = be32(i.toInt)
        val typ = fourcc(i.toInt + 4)
        val (size, hdr) =
          if (size0 == 1L && i + 16 <= until) (be64(i.toInt + 8), 16L)
          else if (size0 == 0L) (until - i, 8L) // box extends to end
          else (size0, 8L)
        if (size < hdr || i + size > until) return false
        f(typ, i + hdr, i + size)
        i += size
      }
      true
    }

    if (data.length >= 16 && fourcc(4) == "ftyp") {
      // MP4: find moov (possibly after mdat), then mvhd + video trak's tkhd
      var timescale = 0L; var duration = 0L
      var width = 0; var height = 0
      var sawMoov = false
      val ok = walkBoxes(0L, data.length.toLong) { (typ, p, end) =>
        if (typ == "moov") {
          sawMoov = true
          // all FullBox field offsets below are relative to the PAYLOAD
          // start (version byte = payload+0), so they hold for 8- and
          // 16-byte box headers alike
          walkBoxes(p, end) { (t2, p2, e2) =>
            val q = p2.toInt
            if (t2 == "mvhd" && p2 + 4 <= e2) {
              val v = u8(q)
              if (v == 0 && e2 >= p2 + 20) {
                timescale = be32(q + 12); duration = be32(q + 16)
              } else if (v == 1 && e2 >= p2 + 32) {
                timescale = be32(q + 20); duration = be64(q + 24)
              }
            } else if (t2 == "trak") {
              walkBoxes(p2, e2) { (t3, p3, e3) =>
                val tq = p3.toInt
                if (t3 == "tkhd" && width == 0) {
                  val v = u8(tq)
                  // width/height are 16.16 fixed-point at the layout tail
                  if (v == 0 && e3 >= p3 + 84) {
                    width = (be32(tq + 76) >> 16).toInt
                    height = (be32(tq + 80) >> 16).toInt
                  } else if (v == 1 && e3 >= p3 + 96) {
                    width = (be32(tq + 88) >> 16).toInt
                    height = (be32(tq + 92) >> 16).toInt
                  }
                }
              }
            }
          }
        }
      }
      if (!ok || !sawMoov) None
      // AVIF image SEQUENCES (`avis` brand) are ISO-BMFF movies too: same
      // moov/mvhd/tkhd walk, but the container label should say what the
      // file IS — a consumer routing by container must not mistake an
      // animated AVIF for generic video-in-mp4
      else Some(AvInfo(
        if (data.length >= 12 &&
            Seq("avif", "avis").contains(fourcc(8))) fourcc(8) else "mp4",
        width, height,
        if (timescale > 0) duration * 1000L / timescale else 0L, 0, 0))
    } else if (data.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE") {
      var channels = 0; var sampleRate = 0L; var byteRate = 0L
      var dataLen = -1L
      var i = 12
      while (i + 8 <= data.length) {
        val id = fourcc(i)
        val size = le32(i + 4)
        if (id == "fmt " && size >= 16 && i + 24 <= data.length) {
          channels = le16(i + 10)
          sampleRate = le32(i + 12)
          byteRate = le32(i + 16)
        } else if (id == "data") dataLen = size
        // chunks are word-aligned: odd sizes carry a pad byte
        val step = 8L + size + (size & 1L)
        if (i + step > Int.MaxValue) return None
        i += step.toInt
      }
      if (sampleRate <= 0) None
      else Some(AvInfo("wav", 0, 0,
        if (dataLen >= 0 && byteRate > 0) dataLen * 1000L / byteRate else 0L,
        sampleRate.toInt, channels))
    } else if (data.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WEBP") {
      // animated WebP (the public container spec's ANIM/ANMF extension):
      // canvas from VP8X (LE24 width-1/height-1 behind 4 flag/reserved
      // bytes), total duration = sum of each ANMF frame's LE24 duration
      // (payload offset 12). A STILL WebP is an image, not an AV payload —
      // only files that actually carry animation frames resolve here; the
      // rest fall through to the stub like any other non-AV container.
      def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      var width = 0; var height = 0
      var sawAnim = false; var frames = 0; var durMs = 0L
      var i = 12
      while (i + 8 <= data.length) {
        val id = fourcc(i)
        val size = le32(i + 4)
        if (id == "VP8X" && size >= 10 && i + 18 <= data.length) {
          width = le24(i + 12) + 1
          height = le24(i + 15) + 1
        } else if (id == "ANIM") sawAnim = true
        else if (id == "ANMF" && size >= 16 && i + 24 <= data.length) {
          frames += 1
          durMs += le24(i + 20) // frame duration, ms, payload offset 12
        }
        val step = 8L + size + (size & 1L) // word-aligned like RIFF/WAVE
        if (i + step > Int.MaxValue) return None
        i += step.toInt
      }
      if (sawAnim && frames > 0) Some(AvInfo("webp", width, height, durMs, 0, 0))
      else None
    } else if (data.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ") {
      // AVI: header walk shared with the frame extractor ([[parseAvi]]) —
      // avih carries usPerFrame + totalFrames + canvas dims; duration uses
      // the ACTUAL movi frame-chunk count when present (the declared count
      // in a truncated file overstates what is decodable)
      parseAvi(data).map(a =>
        AvInfo("avi", a.width, a.height, a.durationMs, 0, 0))
    } else if (data.length >= 8 && be32(0) == 0x1a45dfa3L) {
      // Matroska/WebM EBML element walk
      var tsScale = 1000000L; var durTicks = 0.0
      var width = 0; var height = 0; var sampleRate = 0; var channels = 0
      var docType = ""
      var malformed = false
      // EBML unsigned integers are AT MOST 8 bytes; a longer element is a
      // corrupt/crafted stream whose shift-accumulate would overflow into
      // an arbitrary (possibly negative after .toInt) value that the stub
      // contract says must never surface as "real" metadata
      def uintAt(p: Int, end: Int): Long = {
        if (end - p > 8) { malformed = true; return 0L }
        var v = 0L; var j = p
        while (j < end) { v = (v << 8) | u8(j); j += 1 }
        v
      }
      def floatAt(p: Int, end: Int): Double = (end - p) match {
        case 4 => java.lang.Float.intBitsToFloat(be32(p).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(be64(p))
        case _ => 0.0
      }
      // element ids that nest (master elements the metadata lives under)
      val masters = Set(0x1a45dfa3L, 0x18538067L, 0x1549a966L, 0x1654ae6bL,
        0xaeL, 0xe0L, 0xe1L)
      // real Matroska nests ~5 deep; a crafted file of back-to-back nested
      // master ids could otherwise drive the recursion O(bytes) deep and
      // overflow the stack — a malformed-input crash a 100 TB ingest must
      // not have
      val maxDepth = 16
      def walk(from: Int, until: Int, depth: Int = 0): Boolean = {
        if (depth > maxDepth) return false
        var i = from
        while (i < until) {
          val b0 = u8(i)
          if (b0 == 0) return false
          val idLen = java.lang.Integer.numberOfLeadingZeros(b0) - 23
          if (idLen > 4 || i + idLen >= until) return false
          val id = uintAt(i, i + idLen) // ids keep their marker bit
          var p = i + idLen
          val s0 = u8(p)
          if (s0 == 0) return false
          val szLen = java.lang.Integer.numberOfLeadingZeros(s0) - 23
          if (szLen > 8 || p + szLen > until) return false
          var sz = (s0 & (0xff >>> szLen)).toLong
          var j = 1
          while (j < szLen) { sz = (sz << 8) | u8(p + j); j += 1 }
          p += szLen
          // all-ones size = unknown (streamed Segment): runs to the bound
          val end =
            if (sz == (1L << (7 * szLen)) - 1) until
            else if (p + sz > until) return false
            else (p + sz).toInt
          id match {
            case m if masters(m) => if (!walk(p, end, depth + 1)) return false
            case 0x4282L => // DocType
              docType = new String(data, p, end - p,
                java.nio.charset.StandardCharsets.US_ASCII)
            case 0x2ad7b1L => tsScale = uintAt(p, end)     // TimestampScale
            case 0x4489L => durTicks = floatAt(p, end)     // Duration
            case 0xb0L => if (width == 0) width = boundedInt(uintAt(p, end))
            case 0xbaL => if (height == 0) height = boundedInt(uintAt(p, end))
            case 0xb5L => // SamplingFrequency (float)
              if (sampleRate == 0) sampleRate = floatAt(p, end).toInt
            case 0x9fL => if (channels == 0) channels = boundedInt(uintAt(p, end))
            case _ => ()
          }
          i = end
        }
        true
      }
      // dimension/channel values past Int range are corrupt, not metadata
      def boundedInt(v: Long): Int =
        if (v > Int.MaxValue) { malformed = true; 0 } else v.toInt
      if (!walk(0, data.length) || malformed) None
      else Some(AvInfo(if (docType.nonEmpty) docType else "mkv",
        width, height, (durTicks * tsScale / 1e6).toLong, sampleRate, channels))
    } else if (data.length >= 42 && fourcc(0) == "fLaC") {
      // FLAC: the first metadata block is STREAMINFO by spec
      if ((u8(4) & 0x7f) != 0) None
      else {
        val si = 8 // STREAMINFO payload start (4 magic + 4 block header)
        val sr = (u8(si + 10) << 12) | (u8(si + 11) << 4) | (u8(si + 12) >> 4)
        val ch = ((u8(si + 12) >> 1) & 0x7) + 1
        val totalSamples = ((u8(si + 13) & 0x0f).toLong << 32) | be32(si + 14)
        if (sr <= 0) None
        else Some(AvInfo("flac", 0, 0, totalSamples * 1000L / sr, sr, ch))
      }
    } else if (data.length >= 10 &&
        ((data(0) == 'I' && data(1) == 'D' && data(2) == '3') ||
          (u8(0) == 0xff && (u8(1) & 0xe0) == 0xe0))) {
      // MP3: skip an ID3v2 tag (syncsafe 28-bit length), then the first
      // MPEG audio frame header
      val off =
        if (data(0) == 'I') 10 + (((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
          ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f))
        else 0
      if (off + 4 > data.length || u8(off) != 0xff || (u8(off + 1) & 0xe0) != 0xe0) None
      else {
        val b1 = u8(off + 1); val b2 = u8(off + 2); val b3 = u8(off + 3)
        val verBits = (b1 >> 3) & 3   // 3 = MPEG1, 2 = MPEG2, 0 = MPEG2.5
        val layerBits = (b1 >> 1) & 3 // 1 = Layer III
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 3
        val mode = (b3 >> 6) & 3
        if (layerBits != 1 || verBits == 1 || brIdx == 0 || brIdx == 15 || srIdx == 3) None
        else {
          val kbps =
            if (verBits == 3)
              Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
            else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
          val sr = verBits match {
            case 3 => Array(44100, 48000, 32000)(srIdx)
            case 2 => Array(22050, 24000, 16000)(srIdx)
            case _ => Array(11025, 12000, 8000)(srIdx)
          }
          val audioBytes = (data.length - off).toLong
          Some(AvInfo("mp3", 0, 0, audioBytes * 8L / kbps, sr,
            if (mode == 3) 1 else 2))
        }
      }
    } else if (data.length >= 27 && data(0) == 'O' && data(1) == 'g' &&
        data(2) == 'g' && data(3) == 'S') {
      // OGG: the CRC-verified page walk ([[parseOggPages]]) — the CRC
      // gate means text or garbage behind the 4-byte magic cannot fake a
      // stream, so this routing is safe for exact-oracle purposes (the
      // reason MPEG-TS does NOT route here: its sync byte 0x47 is the
      // letter 'G', ambiguous with text payloads — TS stays an
      // explicitly-invoked operator). Container labels the codec.
      parseOggPages(data).map(o =>
        AvInfo("ogg-" + (if (o.codec.isEmpty) "unknown" else o.codec),
          0, 0, o.durationMs, o.sampleRate, o.channels))
    } else None
  }

  /** A parsed AVI container: header metadata plus the (offset, length) of
    * every video-stream frame chunk in `movi` — for MJPEG files each chunk
    * is a complete JPEG image the JDK can decode. */
  final case class AviInfo(width: Int, height: Int, usPerFrame: Long,
      declaredFrames: Long, frames: IndexedSeq[(Int, Int)]) {
    def durationMs: Long =
      if (usPerFrame <= 0) 0L
      else (if (frames.nonEmpty) frames.length.toLong else declaredFrames) *
        usPerFrame / 1000L
  }

  /** Parse an AVI (RIFF) container per the published AVI 1.0 layout —
    * `RIFF....AVI ` magic, then a word-aligned chunk walk:
    * `LIST hdrl` > `avih` carries microseconds-per-frame, total frames and
    * the canvas dimensions; each `LIST strl` > `strh` names its stream
    * type (the Nth strl is stream N — `vids` marks the video stream, and
    * its scale/rate pair is the authoritative frame timing when avih's
    * usPerFrame is 0); `LIST movi` holds the frame data as `NNdc`/`NNdb`
    * chunks (N = 2-digit stream number), possibly nested in `rec ` lists.
    * Only the VIDEO stream's chunks are collected — for the MJPEG fourcc
    * family each is a standalone JPEG payload, which is what makes
    * pure-JVM video pixel decode possible (ImageIO decodes JPEG; no
    * external codec). Returns None for malformed sizes/truncation —
    * corrupt payloads must degrade to the stub branch, never throw.
    * `maxFrames` bounds the collected offset table against a crafted
    * million-chunk header bomb (the frame BYTES are not copied here). */
  def parseAvi(data: Array[Byte], maxFrames: Int = 1 << 20): Option[AviInfo] = {
    def u8(i: Int): Int = data(i) & 0xff
    def le32(i: Int): Long = (u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def fourcc(i: Int): String =
      new String(data, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (data.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return None
    var usPerFrame = 0L; var declaredFrames = 0L
    var width = 0; var height = 0
    var videoStream = -1; var nStreams = 0
    var scale = 0L; var rate = 0L
    val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var malformed = false
    // real AVI nests 3 deep (RIFF > LIST movi > LIST rec); a crafted file
    // of back-to-back LIST headers must not recurse O(bytes) deep
    def walk(from: Long, until: Long, inMovi: Boolean, depth: Int): Unit = {
      if (depth > 8) { malformed = true; return }
      var i = from
      while (i + 8 <= until && !malformed) {
        val id = fourcc(i.toInt)
        val size = le32(i.toInt + 4)
        val end = i + 8 + size
        if (end > until) { malformed = true; return }
        if (id == "LIST" && size >= 4) {
          val lt = fourcc(i.toInt + 8)
          if (lt == "hdrl" || lt == "strl")
            walk(i + 12, end, inMovi = false, depth + 1)
          else if (lt == "movi" || lt == "rec ")
            walk(i + 12, end, inMovi = true, depth + 1)
        } else if (id == "avih" && size >= 40) {
          val p = i.toInt + 8
          usPerFrame = le32(p)
          declaredFrames = le32(p + 16)
          width = le32(p + 32).toInt
          height = le32(p + 36).toInt
        } else if (id == "strh" && size >= 32) {
          val p = i.toInt + 8
          if (fourcc(p) == "vids" && videoStream < 0) {
            videoStream = nStreams
            scale = le32(p + 20)
            rate = le32(p + 24)
          }
          nStreams += 1
        } else if (inMovi && id.length == 4 &&
            id(0).isDigit && id(1).isDigit &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          val stream = (id(0) - '0') * 10 + (id(1) - '0')
          // before hdrl is parsed videoStream is unknown; stream 0 is the
          // overwhelmingly common video stream, but the walk is single-pass
          // top-to-bottom and hdrl precedes movi by spec, so videoStream is
          // set by the time frame chunks appear
          if (stream == videoStream && size > 0 && frames.size < maxFrames)
            frames += ((i.toInt + 8, size.toInt))
        }
        i = end + (size & 1L) // chunks are word-aligned: odd sizes pad
      }
    }
    walk(12L, data.length.toLong, inMovi = false, 0)
    if (malformed) return None
    // avih timing is authoritative; a zero usPerFrame falls back to the
    // video strh's rate/scale (fps = rate/scale => us = 1e6 * scale/rate)
    val us = if (usPerFrame > 0) usPerFrame
      else if (rate > 0 && scale > 0) scale * 1000000L / rate
      else 0L
    if (videoStream < 0 && frames.isEmpty && width == 0) None
    else Some(AviInfo(width, height, us, declaredFrames,
      frames.toIndexedSeq))
  }

  /** A parsed MP4/ISO-BMFF video track ([[parseMp4]]): geometry, the
    * sample-entry codec fourcc, and — from the stbl sample tables — the
    * exact per-sample (offset, length) byte range, per-sample DECODE
    * timestamp in µs, and the sync-sample (keyframe) indices.
    * `keyframes` empty means stss was absent, which per 14496-12 declares
    * EVERY sample a sync sample. */
  final case class Mp4Track(width: Int, height: Int, codec: String,
      timescale: Long, durationMs: Long, frames: IndexedSeq[(Int, Int)],
      tsUs: IndexedSeq[Long], keyframes: IndexedSeq[Int])

  /** Parse an MP4 / ISO-BMFF container DOWN TO THE SAMPLE TABLES, per the
    * published ISO/IEC 14496-12 layout — the frame-level treatment
    * [[parseAvMeta]]'s mvhd/tkhd walk stops short of. The box walk finds
    * `moov` (before or after `mdat` — no-faststart files work), picks the
    * first track whose `hdlr` handler is `vide`, and reconstructs from
    * its `stbl`:
    *  - per-sample BYTE RANGES: `stsc` (chunk → samples-per-chunk runs) ×
    *    `stco`/`co64` (chunk offsets) × `stsz`/fixed-size (sample sizes)
    *    — samples within a chunk are contiguous, so sample i's offset is
    *    its chunk's offset plus the sizes of the samples before it;
    *  - per-sample DECODE TIMESTAMPS: cumulative `stts` (count, delta)
    *    runs over the `mdhd` media timescale — honest non-uniform frame
    *    timing, not a constant-fps estimate;
    *  - KEYFRAMES: `stss` sync-sample numbers (1-based on disk);
    *  - EDIT LISTS: the first non-empty `edts`>`elst` entry's media_time
    *    (v0 and v1 layouts) becomes the presentation start offset —
    *    samples decoding before it are edited out of the table and the
    *    rest shift so presentation t=0 lands where the edit says (the
    *    common iPhone-style single-entry case; splicing lists beyond the
    *    first offset are deliberately not interpreted);
    *  - geometry from `tkhd` (16.16 fixed point), codec from `stsd`'s
    *    first sample-entry fourcc.
    * For MJPEG-in-MP4 (`jpeg`/`mjpa` sample entries) each sample is a
    * standalone JPEG the JDK decodes — same pure-JVM pixel path as
    * AVI/MJPEG. Same discipline as [[parseAvi]]: an OFFSET TABLE only
    * (no frame bytes copied), every table's entry count bounded by its
    * box size and `maxFrames`, every sample range bounds-checked against
    * the payload, malformed structure returns None (degrade to the stub
    * branch, never throw). */
  def parseMp4(data: Array[Byte], maxFrames: Int = 1 << 20): Option[Mp4Track] = {
    def u8(i: Int): Int = data(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String =
      new String(data, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (data.length < 16 || fourcc(4) != "ftyp") return None

    var malformed = false
    // real MP4 nests ~5 deep (moov>trak>mdia>minf>stbl); cap against a
    // crafted tower of nested boxes, as in parseAvi
    def walk(from: Long, until: Long, depth: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      if (depth > 8) { malformed = true; return }
      var i = from
      while (i + 8 <= until && !malformed) {
        val size0 = be32(i.toInt)
        val typ = fourcc(i.toInt + 4)
        val (size, hdr) =
          if (size0 == 1L && i + 16 <= until) (be64(i.toInt + 8), 16L)
          else if (size0 == 0L) (until - i, 8L)
          else (size0, 8L)
        if (size < hdr || i + size > until) { malformed = true; return }
        f(typ, (i + hdr).toInt, (i + size).toInt)
        i += size
      }
    }

    // one track's raw tables, filled during the walk
    var width = 0; var height = 0
    var timescale = 0L
    var isVideo = false
    var codec = ""
    var stts: Array[Long] = null   // (count, delta) pairs, flattened
    var sampleSizes: Array[Int] = null
    var fixedSize = 0L
    var sampleCount = 0L
    var stsc: Array[Long] = null   // (firstChunk, samplesPerChunk) pairs
    var chunkOffs: Array[Long] = null
    var stss: Array[Int] = null
    var editOffsetTicks = 0L // elst media_time of the first non-empty edit

    /** entryCount bounded by what the box can actually hold — a declared
      * count past the payload is a bomb/corruption, not data. */
    def boundedCount(declared: Long, p: Int, end: Int, entryBytes: Int): Int =
      if (declared < 0 || declared > (end - p).toLong / entryBytes ||
        declared > (1L << 24)) { malformed = true; 0 }
      else declared.toInt

    var best: Option[Mp4Track] = None

    def parseStbl(p0: Int, e0: Int): Unit = walk(p0, e0, 6) { (t, p, e) =>
      t match {
        case "stsd" if e >= p + 16 =>
          // ver/flags + entry_count, then entries of size(4)+format(4)
          if (be32(p + 4) >= 1 && e >= p + 16) codec = fourcc(p + 12)
        case "stts" if e >= p + 8 =>
          val n = boundedCount(be32(p + 4), p + 8, e, 8)
          stts = new Array[Long](2 * n)
          var k = 0
          while (k < n) {
            stts(2 * k) = be32(p + 8 + 8 * k)
            stts(2 * k + 1) = be32(p + 12 + 8 * k)
            k += 1
          }
        case "stsz" if e >= p + 12 =>
          fixedSize = be32(p + 4)
          sampleCount = be32(p + 8)
          if (fixedSize == 0L) {
            val n = boundedCount(sampleCount, p + 12, e, 4)
            sampleSizes = new Array[Int](n)
            var k = 0
            while (k < n) {
              val sz = be32(p + 12 + 4 * k)
              if (sz > Int.MaxValue) { malformed = true; return }
              sampleSizes(k) = sz.toInt
              k += 1
            }
          }
        case "stsc" if e >= p + 8 =>
          val n = boundedCount(be32(p + 4), p + 8, e, 12)
          stsc = new Array[Long](2 * n)
          var k = 0
          while (k < n) {
            stsc(2 * k) = be32(p + 8 + 12 * k)      // first_chunk, 1-based
            stsc(2 * k + 1) = be32(p + 12 + 12 * k) // samples_per_chunk
            k += 1
          }
        case "stco" if e >= p + 8 =>
          val n = boundedCount(be32(p + 4), p + 8, e, 4)
          chunkOffs = Array.tabulate(n)(k => be32(p + 8 + 4 * k))
        case "co64" if e >= p + 8 =>
          val n = boundedCount(be32(p + 4), p + 8, e, 8)
          chunkOffs = Array.tabulate(n)(k => be64(p + 8 + 8 * k))
        case "stss" if e >= p + 8 =>
          val n = boundedCount(be32(p + 4), p + 8, e, 4)
          stss = new Array[Int](n)
          var k = 0
          while (k < n) {
            val s = be32(p + 8 + 4 * k)
            if (s > Int.MaxValue) { malformed = true; return }
            stss(k) = s.toInt
            k += 1
          }
        case _ => ()
      }
    }

    def finishTrack(): Unit = {
      if (best.nonEmpty || !isVideo || malformed) return
      if (stts == null || stsc == null || chunkOffs == null ||
        (fixedSize == 0L && sampleSizes == null)) return
      val declared =
        if (fixedSize != 0L) sampleCount
        else sampleSizes.length.toLong
      val n = math.min(declared, maxFrames.toLong).toInt
      if (n <= 0 || timescale <= 0) return
      // ---- byte ranges: chunk-relative contiguity per 14496-12 8.7.4
      val frames = new Array[(Int, Int)](n)
      var sample = 0
      var chunk = 0 // 0-based; stsc firstChunk is 1-based
      var run = 0
      while (sample < n && chunk < chunkOffs.length) {
        while (run + 1 < stsc.length / 2 &&
          stsc(2 * (run + 1)) <= chunk + 1) run += 1
        val spc = stsc(2 * run + 1)
        if (spc <= 0) { malformed = true; return }
        var off = chunkOffs(chunk)
        var s = 0L
        while (s < spc && sample < n) {
          val sz = if (fixedSize != 0L) fixedSize else sampleSizes(sample).toLong
          if (sz <= 0 || off < 0 || off + sz > data.length) {
            malformed = true; return
          }
          frames(sample) = ((off.toInt, sz.toInt))
          off += sz
          sample += 1
          s += 1
        }
        chunk += 1
      }
      if (sample < n) { malformed = true; return } // fewer chunks than samples
      // ---- decode timestamps: cumulative stts deltas on the media scale
      val tsUs = new Array[Long](n)
      var t = 0L
      var k = 0
      var i = 0
      var left = if (stts.length >= 2) stts(0) else 0L
      while (i < n) {
        while (left <= 0 && 2 * (k + 1) < stts.length) {
          k += 1; left = stts(2 * k)
        }
        if (left <= 0) { malformed = true; return } // stts shorter than stsz
        tsUs(i) = t * 1000000L / timescale
        t += stts(2 * k + 1)
        left -= 1
        i += 1
      }
      // apply the edit-list presentation offset: samples decoding before
      // media_time are edited OUT of presentation (their bytes stay in
      // mdat but no schedule tick can land on them), the rest shift so
      // presentation time 0 = the edit's media_time. Bounded: the offset
      // can only shrink the table, never grow it.
      var firstShown = 0
      if (editOffsetTicks > 0) {
        val offUs = editOffsetTicks * 1000000L / timescale
        while (firstShown < n - 1 && tsUs(firstShown + 1) <= offUs)
          firstShown += 1
        var j = firstShown
        while (j < n) { tsUs(j) = math.max(0L, tsUs(j) - offUs); j += 1 }
      }
      val shownFrames = if (firstShown == 0) frames else
        java.util.Arrays.copyOfRange(frames, firstShown, n)
      val shownTs = if (firstShown == 0) tsUs else
        java.util.Arrays.copyOfRange(tsUs, firstShown, n)
      val durMs = math.max(0L,
        t * 1000L / timescale - editOffsetTicks * 1000L / timescale)
      val keys =
        if (stss == null) IndexedSeq.empty[Int]
        else stss.iterator.filter(s => s >= 1 && s <= n).map(_ - 1)
          .filter(_ >= firstShown).map(_ - firstShown).toIndexedSeq
      best = Some(Mp4Track(width, height, codec, timescale, durMs,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(shownFrames),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(shownTs), keys))
    }

    walk(0L, data.length.toLong, 0) { (typ, p, end) =>
      if (typ == "moov") walk(p, end, 1) { (t2, p2, e2) =>
        if (t2 == "trak" && best.isEmpty) {
          // reset per-track state
          width = 0; height = 0; timescale = 0L; isVideo = false
          codec = ""; stts = null; sampleSizes = null; fixedSize = 0L
          sampleCount = 0L; stsc = null; chunkOffs = null; stss = null
          editOffsetTicks = 0L
          walk(p2, e2, 2) { (t3, p3, e3) =>
            if (t3 == "tkhd" && e3 >= p3 + 4) {
              val v = u8(p3)
              if (v == 0 && e3 >= p3 + 84) {
                width = (be32(p3 + 76) >> 16).toInt
                height = (be32(p3 + 80) >> 16).toInt
              } else if (v == 1 && e3 >= p3 + 96) {
                width = (be32(p3 + 88) >> 16).toInt
                height = (be32(p3 + 92) >> 16).toInt
              }
            } else if (t3 == "edts") walk(p3, e3, 3) { (t4, p4, e4) =>
              // edit list: the common real-world case (iPhone-style
              // files) is ONE entry whose media_time shifts presentation
              // into the media timeline; take the first non-empty entry's
              // media_time as the presentation start offset. Empty edits
              // (media_time -1 = initial delay) and splicing lists are
              // ignored beyond that first offset — the conservative
              // subset that can only move timestamps, never invent them.
              if (t4 == "elst" && e4 >= p4 + 8) {
                val v = u8(p4)
                val cnt = be32(p4 + 4)
                val entry = if (v == 1) 20 else 12
                var k = 0
                var q = p4 + 8
                var found = false
                while (!found && k < cnt && q + entry <= e4) {
                  val mt = if (v == 1) be64(q + 8)
                    else (be32(q + 4) << 32) >> 32 // sign-extend s32
                  if (mt >= 0) { editOffsetTicks = mt; found = true }
                  q += entry; k += 1
                }
              }
            } else if (t3 == "mdia") walk(p3, e3, 3) { (t4, p4, e4) =>
              if (t4 == "mdhd" && e4 >= p4 + 4) {
                val v = u8(p4)
                if (v == 0 && e4 >= p4 + 16) timescale = be32(p4 + 12)
                else if (v == 1 && e4 >= p4 + 24) timescale = be32(p4 + 20)
              } else if (t4 == "hdlr" && e4 >= p4 + 12) {
                isVideo = fourcc(p4 + 8) == "vide"
              } else if (t4 == "minf") walk(p4, e4, 4) { (t5, p5, e5) =>
                if (t5 == "stbl") parseStbl(p5, e5)
              }
            }
          }
          finishTrack()
        }
      }
    }
    if (malformed) None else best
  }

  /** A uniform frame-table view over every container with pure-JVM frame
    * access — AVI/MJPEG ([[parseAvi]]) and MP4 sample tables
    * ([[parseMp4]]): per-frame byte ranges plus per-frame decode
    * timestamps, so ONE schedule walk serves both the constant-rate AVI
    * case and MP4's honest non-uniform `stts` timing. */
  final case class VideoFrameTable(container: String, width: Int,
      height: Int, frames: IndexedSeq[(Int, Int)], tsUs: IndexedSeq[Long],
      durationMs: Long) {
    /** Index of the source frame covering timestamp `us` — the LAST frame
      * whose decode time is <= us (what "the frame on screen at time t"
      * means), by binary search over the non-decreasing timestamps. */
    def frameAt(us: Long): Int = {
      var lo = 0
      var hi = frames.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (tsUs(mid) <= us) lo = mid else hi = mid - 1
      }
      lo
    }
  }

  /** Frame table of a video payload, whichever parseable container it is
    * in; None when neither container parses (or carries no usable frame
    * timing) — callers degrade to the stub branch. AVI timestamps expand
    * from the constant frame period, MP4's from the stts deltas, animated
    * WebP's from the cumulative ANMF durations. */
  def parseVideoFrameTable(data: Array[Byte], maxFrames: Int = 1 << 20)
      : Option[VideoFrameTable] =
    parseAvi(data, maxFrames) match {
      case Some(avi) if avi.frames.nonEmpty && avi.usPerFrame > 0 =>
        val ts = IndexedSeq.tabulate(avi.frames.length)(i =>
          i.toLong * avi.usPerFrame)
        Some(VideoFrameTable("avi", avi.width, avi.height, avi.frames, ts,
          avi.durationMs))
      case _ =>
        parseMp4(data, maxFrames) match {
          case Some(t) if t.frames.nonEmpty && t.durationMs > 0 =>
            Some(VideoFrameTable("mp4", t.width, t.height, t.frames,
              t.tsUs, t.durationMs))
          case _ =>
            parseWebpAnim(data, maxFrames) match {
              case Some(t) if t.frames.nonEmpty && t.durationMs > 0 => Some(t)
              case _ => None
            }
        }
    }

  /** RIFF-wrap a bare VP8L chunk (header + payload, as stored inside an
    * ANMF frame) into a standalone still `.webp` file — what the
    * schedule samplers hand to [[readImage]] / downstream consumers. */
  private[multimodal] def riffWrapVp8l(chunk: Array[Byte]): Array[Byte] = {
    val n = chunk.length + (chunk.length & 1)
    val out = new Array[Byte](12 + n)
    val sz = 4 + n
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    out(4) = (sz & 0xff).toByte; out(5) = ((sz >> 8) & 0xff).toByte
    out(6) = ((sz >> 16) & 0xff).toByte; out(7) = ((sz >> 24) & 0xff).toByte
    out(8) = 'W'; out(9) = 'E'; out(10) = 'B'; out(11) = 'P'
    System.arraycopy(chunk, 0, out, 12, chunk.length)
    out
  }

  /** Frame table for an ANIMATED WebP in the HONEST-DECODE SUBSET: every
    * ANMF frame must be full-canvas, no-blend (flags bit 1 set), and
    * carry a lossless `VP8L` payload — then each frame is a standalone
    * still image ([[Vp8lDecoder]] behind [[riffWrapVp8l]]) and no
    * compositing state exists to get wrong. Anything else — sub-canvas
    * patches, alpha-BLENDED frames (the spec leaves the blend color
    * space ambiguous and this environment has no libwebpdemux to pin it
    * against), lossy `VP8 ` frames — refuses the whole payload: the
    * metadata walk ([[parseAvMeta]]) still reports canvas and duration
    * for those. Timestamps are the cumulative per-frame ANMF durations
    * (non-uniform timing, like MP4's stts); a truncated tail stops at
    * the last whole chunk. Frames beyond `maxFrames` are not tabled but
    * still count toward the duration. */
  def parseWebpAnim(data: Array[Byte], maxFrames: Int = 1 << 20)
      : Option[VideoFrameTable] = {
    def cc(i: Int): String =
      if (i + 4 <= data.length)
        new String(data, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    def u8(i: Int): Int = data(i) & 0xff
    def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
    def le32(i: Int): Long = le24(i).toLong | (u8(i + 3).toLong << 24)
    if (data.length < 30 || cc(0) != "RIFF" || cc(8) != "WEBP") return None
    var i = 12
    var cw = 0
    var ch = 0
    var sawAnim = false
    val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    val starts = scala.collection.mutable.ArrayBuffer[Long]()
    var tUs = 0L
    var stop = false
    while (!stop && i + 8 <= data.length) {
      val id = cc(i)
      val size = le32(i + 4)
      if (size > Int.MaxValue - 8) return None
      val body = i + 8
      val end = body + size.toInt
      if (end > data.length) stop = true // truncated: last whole chunk
      else {
        id match {
          case "VP8X" if size >= 10 =>
            cw = le24(body + 4) + 1
            ch = le24(body + 7) + 1
          case "ANIM" => sawAnim = true
          case "VP8 " | "VP8L" => return None // a still, not an animation
          case "ANMF" if size >= 24 =>
            if (!sawAnim || cw == 0) return None
            val fx = le24(body) * 2
            val fy = le24(body + 3) * 2
            val fw = le24(body + 6) + 1
            val fh = le24(body + 9) + 1
            val dur = le24(body + 12)
            val flags = u8(body + 15)
            if (fx != 0 || fy != 0 || fw != cw || fh != ch ||
              (flags & 2) == 0) return None // outside the honest subset
            val sub = body + 16
            if (cc(sub) != "VP8L") return None
            val subSize = le32(sub + 4)
            if (subSize > Int.MaxValue - 8 ||
              sub + 8 + subSize > end) return None
            if (frames.length < maxFrames) {
              frames += ((sub, 8 + subSize.toInt))
              starts += tUs
            }
            tUs += dur.toLong * 1000L
          case _ => ()
        }
        i = end + (size.toInt & 1)
      }
    }
    if (frames.isEmpty || tUs <= 0) None
    else Some(VideoFrameTable("webp", cw, ch, frames.toIndexedSeq,
      starts.toIndexedSeq, tUs / 1000L))
  }

  /** One MP4 track's codec identity ([[parseMp4Codecs]]): the stsd sample
    * entry's fourcc plus, for AVC tracks, the Sequence Parameter Set's own
    * profile/level and TRUE coded dimensions. */
  final case class Mp4CodecInfo(track: Int, codec: String, isVideo: Boolean,
      profile: Option[Int], level: Option[Int],
      spsWidth: Option[Int], spsHeight: Option[Int])

  /** Per-track codec identity of an MP4 — the honest curation metadata
    * for the files whose PIXELS this engine deliberately refuses (H.264's
    * CAVLC coefficient tables cannot be verified offline — COVERAGE.md):
    * walk moov > trak > mdia > (hdlr, minf > stbl > stsd), report each
    * track's sample-entry fourcc, and for `avc1`/`avc2`/`avc3` entries
    * parse the avcC record's first SPS — Exp-Golomb syntax per the
    * published H.264 spec (fully algorithmic, no numeric tables): profile
    * and level from the SPS itself (the container's claim can lie; the
    * decoder configuration cannot), and the TRUE coded dimensions from
    * pic_width_in_mbs / pic_height_in_map_units minus the frame cropping
    * in chroma-dependent crop units (tkhd geometry is display intent;
    * the SPS is what a decoder allocates). High-profile chroma blocks,
    * scaling matrices, both pic_order_cnt layouts, interlaced
    * (frame_mbs_only = 0) heights, and emulation-prevention stripping are
    * handled; any SPS anomaly degrades that track to fourcc-only rather
    * than guessing. None when the payload is not an MP4. */
  def parseMp4Codecs(data: Array[Byte]): Option[Seq[Mp4CodecInfo]] = {
    def u8(i: Int): Int = data(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String =
      new String(data, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (data.length < 16 || fourcc(4) != "ftyp") return None
    var malformed = false
    def walk(from: Long, until: Long, depth: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      if (depth > 8) { malformed = true; return }
      var i = from
      while (i + 8 <= until && !malformed) {
        val size0 = be32(i.toInt)
        val typ = fourcc(i.toInt + 4)
        val (size, hdr) =
          if (size0 == 1L && i + 16 <= until) (be64(i.toInt + 8), 16L)
          else if (size0 == 0L) (until - i, 8L)
          else (size0, 8L)
        if (size < hdr || i + size > until) { malformed = true; return }
        f(typ, (i + hdr).toInt, (i + size).toInt)
        i += size
      }
    }
    val out = scala.collection.mutable.ArrayBuffer[Mp4CodecInfo]()
    walk(0, data.length, 0) { (t0, p0, e0) =>
      if (t0 == "moov") walk(p0, e0, 1) { (t1, p1, e1) =>
        if (t1 == "trak") {
          val track = out.length + 1
          var isVideo = false
          var codec = ""
          var avcC: Option[(Int, Int)] = None
          walk(p1, e1, 2) { (t2, p2, e2) =>
            if (t2 == "mdia") walk(p2, e2, 3) { (t3, p3, e3) =>
              t3 match {
                case "hdlr" if e3 >= p3 + 12 =>
                  isVideo = fourcc(p3 + 8) == "vide"
                case "minf" => walk(p3, e3, 4) { (t4, p4, e4) =>
                  if (t4 == "stbl") walk(p4, e4, 5) { (t5, p5, e5) =>
                    if (t5 == "stsd" && e5 >= p5 + 16 && be32(p5 + 4) >= 1) {
                      codec = fourcc(p5 + 12)
                      // visual sample entry: 8 (entry box header) + 78
                      // bytes of fixed fields before the child boxes
                      val entryEnd = math.min(e5.toLong,
                        p5 + 8L + be32(p5 + 8)).toInt
                      val kids = p5 + 8 + 8 + 78
                      if ((codec == "avc1" || codec == "avc2" ||
                        codec == "avc3") && kids < entryEnd)
                        walk(kids, entryEnd, 6) { (t6, p6, e6) =>
                          if (t6 == "avcC" && avcC.isEmpty)
                            avcC = Some((p6, e6))
                        }
                    }
                  }
                }
                case _ => ()
              }
            }
          }
          if (codec.nonEmpty) {
            val sps = avcC.flatMap { case (p, e) =>
              // AVCDecoderConfigurationRecord: version, profile, compat,
              // level, lengthSize, numSPS (low 5 bits), then u16-length SPS
              if (e < p + 8 || u8(p) != 1 || (u8(p + 5) & 0x1f) < 1) None
              else {
                val len = be16(p + 6)
                if (p + 8 + len > e || len < 4) None
                else parseSpsDims(
                  java.util.Arrays.copyOfRange(data, p + 8, p + 8 + len))
              }
            }
            out += Mp4CodecInfo(track, codec, isVideo,
              sps.map(_._1), sps.map(_._2), sps.map(_._3), sps.map(_._4))
          }
        }
      }
    }
    if (malformed || out.isEmpty) None else Some(out.toSeq)
  }

  /** Parse one SPS NAL's (profile, level, coded width, coded height) per
    * the published Exp-Golomb syntax; None on any anomaly (refuse, don't
    * guess). Package-visible for the spec's fuzzing. */
  private[graft] def parseSpsDims(nal: Array[Byte])
      : Option[(Int, Int, Int, Int)] = {
    object Truncated extends RuntimeException { override def fillInStackTrace(): Throwable = this }
    try {
      if (nal.length < 4 || (nal(0) & 0x1f) != 7) return None
      // strip emulation prevention: a 0x03 after two zero bytes is an
      // escape, not data
      val rbsp = new java.io.ByteArrayOutputStream()
      var zeros = 0
      var i = 1
      while (i < nal.length) {
        val b = nal(i) & 0xff
        if (zeros >= 2 && b == 3) zeros = 0
        else { rbsp.write(b); zeros = if (b == 0) zeros + 1 else 0 }
        i += 1
      }
      val d = rbsp.toByteArray
      var pos = 0
      var bit = 0
      def u(n: Int): Int = {
        var v = 0
        var k = 0
        while (k < n) {
          if (pos >= d.length) throw Truncated
          v = (v << 1) | ((d(pos) >> (7 - bit)) & 1)
          bit += 1
          if (bit == 8) { bit = 0; pos += 1 }
          k += 1
        }
        v
      }
      def ue(): Int = {
        var z = 0
        while (u(1) == 0) { z += 1; if (z > 31) throw Truncated }
        (1 << z) - 1 + (if (z == 0) 0 else u(z))
      }
      def se(): Int = {
        val k = ue()
        if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
      }
      val profile = u(8)
      u(8) // constraint flags + reserved
      val level = u(8)
      ue() // seq_parameter_set_id
      var chroma = 1
      var separateColour = false
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profile)) {
        chroma = ue()
        if (chroma > 3) throw Truncated
        if (chroma == 3) separateColour = u(1) == 1
        ue(); ue(); u(1) // bit depths, transform bypass
        if (u(1) == 1) { // seq_scaling_matrix_present
          val lists = if (chroma == 3) 12 else 8
          var k = 0
          while (k < lists) {
            if (u(1) == 1) { // scaling_list_present
              val size = if (k < 6) 16 else 64
              var last = 8
              var next = 8
              var j = 0
              while (j < size) {
                if (next != 0) next = (last + se() + 256) % 256
                if (next != 0) last = next
                j += 1
              }
            }
            k += 1
          }
        }
      }
      ue() // log2_max_frame_num_minus4
      ue() match { // pic_order_cnt_type
        case 0 => ue()
        case 1 =>
          u(1); se(); se()
          val n = ue()
          if (n > 255) throw Truncated
          var k = 0
          while (k < n) { se(); k += 1 }
        case _ => ()
      }
      ue(); u(1) // max_num_ref_frames, gaps allowed
      val wMbs = ue() + 1
      val hUnits = ue() + 1
      val fmo = u(1)
      if (fmo == 0) u(1) // mb_adaptive_frame_field_flag
      u(1) // direct_8x8_inference
      var (cl, cr, ct, cb) = (0, 0, 0, 0)
      if (u(1) == 1) { cl = ue(); cr = ue(); ct = ue(); cb = ue() }
      val chromaArray = if (separateColour) 0 else chroma
      val (cux, cuy) = chromaArray match {
        case 0 => (1, 2 - fmo)
        case 1 => (2, 2 * (2 - fmo))
        case 2 => (2, 2 - fmo)
        case _ => (1, 2 - fmo)
      }
      val w = wMbs * 16 - cux * (cl + cr)
      val h = (2 - fmo) * hUnits * 16 - cuy * (ct + cb)
      if (wMbs > 16384 || hUnits > 16384 || w <= 0 || h <= 0) None
      else Some((profile, level, w, h))
    } catch {
      case _: RuntimeException => None
    }
  }

  /** One payload's per-track codec rows ([[mp4CodecStats]]); unparseable
    * payloads report a single `parsed = false` marker row. */
  final case class Mp4CodecRow(id: Long, parsed: Boolean, track: Int,
      codec: String, isVideo: Boolean, profile: Option[Int],
      level: Option[Int], spsWidth: Option[Int], spsHeight: Option[Int])

  /** Per-track MP4 codec identity over a binary media frame — one narrow
    * mapPartitions, no shuffle, no sample decode: the honest gate a video
    * curation pass filters on (codec family, H.264 profile/level caps,
    * SPS-true dimensions) for payloads whose pixel decode is refused. */
  def mp4CodecStats(media: DataFrame): Dataset[Mp4CodecRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      parseMp4Codecs(r.data) match {
        case Some(tracks) => tracks.map(t =>
          Mp4CodecRow(r.id, parsed = true, t.track, t.codec, t.isVideo,
            t.profile, t.level, t.spsWidth, t.spsHeight))
        case None => Seq(Mp4CodecRow(r.id, parsed = false, 0, "",
          isVideo = false, None, None, None, None))
      }
    })
  }

  /** One MP3 payload's frame-SEQUENCE statistics ([[parseMp3Frames]]). */
  final case class Mp3FramesInfo(sampleRate: Int, channels: Int,
      nFrames: Long, durationMs: Long, minKbps: Int, maxKbps: Int,
      vbr: Boolean)

  /** Walk an MP3 payload's WHOLE MPEG-audio frame-header sequence — the
    * honest upgrade over [[parseAvMeta]]'s single-header CBR estimate: an
    * exact frame count, a duration summed from real per-frame sample
    * counts (1152 samples per MPEG1 Layer III frame, 576 for MPEG2/2.5),
    * and the bitrate range across frames, which detects VBR files (where
    * the CBR estimate can be arbitrarily wrong) without decoding a single
    * sample. Each header gives its own frame length (spf/8 × bitrate /
    * sampleRate + padding), so the walk is O(frames) with zero payload
    * copies. An optional leading ID3v2 tag is skipped by its syncsafe
    * size. The walk stops at the first non-frame byte (trailing junk,
    * APEv2 tags, truncation) and reports the frames seen — degrade-not-
    * crash, matching every parser here; None when not a single valid
    * Layer III header parses. A mid-stream sample-rate change also stops
    * the walk (two concatenated files, not one stream). */
  def parseMp3Frames(data: Array[Byte],
      maxFrames: Long = 1L << 22): Option[Mp3FramesInfo] = {
    def u8(i: Int): Int = data(i) & 0xff
    if (data.length < 4) return None
    var off =
      if (data.length >= 10 && data(0) == 'I' && data(1) == 'D' && data(2) == '3')
        10L + (((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
          ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f))
      else 0L
    var n = 0L
    var samples = 0L
    var sr0 = 0; var ch0 = 0
    var minK = Int.MaxValue; var maxK = 0
    var stop = false
    while (!stop && off + 4 <= data.length && n < maxFrames) {
      val p = off.toInt
      if (u8(p) != 0xff || (u8(p + 1) & 0xe0) != 0xe0) stop = true
      else {
        val b1 = u8(p + 1); val b2 = u8(p + 2); val b3 = u8(p + 3)
        val verBits = (b1 >> 3) & 3   // 3 = MPEG1, 2 = MPEG2, 0 = MPEG2.5
        val layerBits = (b1 >> 1) & 3 // 1 = Layer III
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 3
        val pad = (b2 >> 1) & 1
        val mode = (b3 >> 6) & 3
        if (layerBits != 1 || verBits == 1 || brIdx == 0 || brIdx == 15 ||
          srIdx == 3) stop = true
        else {
          val kbps =
            if (verBits == 3)
              Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
            else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
          val sr = verBits match {
            case 3 => Array(44100, 48000, 32000)(srIdx)
            case 2 => Array(22050, 24000, 16000)(srIdx)
            case _ => Array(11025, 12000, 8000)(srIdx)
          }
          val spf = if (verBits == 3) 1152 else 576
          if (sr0 == 0) { sr0 = sr; ch0 = if (mode == 3) 1 else 2 }
          else if (sr != sr0) stop = true // concatenated streams, not one
          if (!stop) {
            val frameLen = (spf / 8) * (kbps * 1000L) / sr + pad
            if (frameLen <= 4) stop = true
            else {
              n += 1
              samples += spf
              if (kbps < minK) minK = kbps
              if (kbps > maxK) maxK = kbps
              off += frameLen
            }
          }
        }
      }
    }
    if (n == 0 || sr0 <= 0) None
    else Some(Mp3FramesInfo(sr0, ch0, n, samples * 1000L / sr0,
      minK, maxK, minK != maxK))
  }

  /** One WebM/Matroska payload's block-walk result ([[parseWebmBlocks]]). */
  final case class WebmBlocksInfo(videoTrack: Long, nBlocks: Long,
      nKeyframes: Long, durationMs: Long, totalBlockBytes: Long)

  /** Walk a WebM/Matroska payload's Cluster/SimpleBlock structure — the
    * honest per-frame metadata for VP8/VP9 files whose PIXELS have no
    * pure-JVM codec: exact video-frame (block) counts, keyframe counts
    * (SimpleBlock flag 0x80 — keyframe density is the seek-ability /
    * re-encode-cost signal a video curation pass gates on), the last
    * block's presentation time (cluster Timestamp + the block's signed
    * 16-bit relative timestamp, scaled by TimestampScale), and the total
    * video payload bytes (with duration: the real bitrate, where the
    * container's declared Duration can lie). Blocks of non-video tracks
    * (audio muxed alongside) are excluded via the Tracks walk's
    * TrackNumber; when no video TrackEntry declares one, the walk refuses
    * rather than guessing. Same EBML discipline as [[parseAvMeta]]'s
    * walker: 8-byte integer bound, depth cap, unknown-size elements run
    * to the enclosing bound, malformed structure returns None. */
  def parseWebmBlocks(data: Array[Byte],
      maxBlocks: Long = 1L << 22): Option[WebmBlocksInfo] = {
    def u8(i: Int): Int = data(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    if (data.length < 8 || be32(0) != 0x1a45dfa3L) return None
    var malformed = false
    def uintAt(p: Int, end: Int): Long = {
      if (end - p > 8) { malformed = true; return 0L }
      var v = 0L; var j = p
      while (j < end) { v = (v << 8) | u8(j); j += 1 }
      v
    }
    var tsScale = 1000000L // ns per tick, Matroska default
    var videoTrack = -1L
    var curTrackNo = -1L
    var curIsVideo = false
    var nBlocks = 0L; var nKey = 0L
    var clusterTicks = 0L
    var lastTicks = Long.MinValue
    var totalBytes = 0L
    val masters = Set(0x1a45dfa3L, 0x18538067L, 0x1549a966L, 0x1654ae6bL,
      0xaeL, 0xe0L, 0x1f43b675L)
    val maxDepth = 16
    def walk(from: Int, until: Int, depth: Int): Boolean = {
      if (depth > maxDepth) return false
      var i = from
      while (i < until && nBlocks < maxBlocks) {
        val b0 = u8(i)
        if (b0 == 0) return false
        val idLen = java.lang.Integer.numberOfLeadingZeros(b0) - 23
        if (idLen > 4 || i + idLen >= until) return false
        val id = uintAt(i, i + idLen)
        var p = i + idLen
        val s0 = u8(p)
        if (s0 == 0) return false
        val szLen = java.lang.Integer.numberOfLeadingZeros(s0) - 23
        if (szLen > 8 || p + szLen > until) return false
        var sz = (s0 & (0xff >>> szLen)).toLong
        var j = 1
        while (j < szLen) { sz = (sz << 8) | u8(p + j); j += 1 }
        p += szLen
        val end =
          if (sz == (1L << (7 * szLen)) - 1) until
          else if (p + sz > until) return false
          else (p + sz).toInt
        id match {
          case 0xaeL => // TrackEntry: scope the number/type pair
            curTrackNo = -1L; curIsVideo = false
            if (!walk(p, end, depth + 1)) return false
            if (curIsVideo && videoTrack < 0 && curTrackNo > 0)
              videoTrack = curTrackNo
          case m if masters(m) =>
            if (!walk(p, end, depth + 1)) return false
          case 0xd7L => curTrackNo = uintAt(p, end) // TrackNumber
          case 0x83L => // TrackType: 1 = video
            if (uintAt(p, end) == 1L) curIsVideo = true
          case 0x2ad7b1L => tsScale = uintAt(p, end)
          case 0xe7L => clusterTicks = uintAt(p, end) // cluster Timestamp
          case 0xa3L => // SimpleBlock: track vint, s16 rel ts, flags
            if (end - p < 4) return false
            val t0 = u8(p)
            if (t0 == 0) return false
            val tLen = java.lang.Integer.numberOfLeadingZeros(t0) - 23
            if (tLen > 8 || p + tLen + 3 > end) return false
            var trk = (t0 & (0xff >>> tLen)).toLong
            var k = 1
            while (k < tLen) { trk = (trk << 8) | u8(p + k); k += 1 }
            if (videoTrack > 0 && trk == videoTrack) {
              val rel = ((u8(p + tLen) << 8) | u8(p + tLen + 1)).toShort.toLong
              val flags = u8(p + tLen + 2)
              nBlocks += 1
              if ((flags & 0x80) != 0) nKey += 1
              val ticks = clusterTicks + rel
              if (ticks > lastTicks) lastTicks = ticks
              totalBytes += end - (p + tLen + 3)
            }
          case _ => ()
        }
        if (malformed) return false
        i = end
      }
      true
    }
    if (!walk(0, data.length, 0) || malformed) None
    else if (videoTrack <= 0 || nBlocks == 0) None
    else Some(WebmBlocksInfo(videoTrack, nBlocks, nKey,
      if (lastTicks == Long.MinValue) 0L
      else lastTicks * tsScale / 1000000L, totalBytes))
  }

  /** One OGG payload's page-walk result ([[parseOggPages]]). */
  final case class OggInfo(codec: String, sampleRate: Int, channels: Int,
      nPages: Long, nPackets: Long, durationMs: Long, totalPayloadBytes: Long)

  /** Walk an OGG container's page structure per the published framing
    * spec (RFC 3533) — honest duration and packet accounting for
    * Vorbis/Opus payloads with zero sample decode: each page is `OggS` +
    * version + header-type + a signed 64-bit GRANULE POSITION + serial +
    * sequence + CRC + a lacing table whose 255-terminated runs delimit
    * packets. Duration comes from the LAST page's granule position — PCM
    * samples at the ID header's rate for Vorbis, the fixed 48 kHz clock
    * minus pre-skip for Opus (per RFC 7845) — which is the authoritative
    * value (tags can lie; granules cannot without breaking playback).
    * The codec and its parameters come from the first (BOS) page's ID
    * packet (`\\x01vorbis` / `OpusHead`). Only the FIRST bitstream's
    * serial is tracked (chained/muxed secondary streams are skipped,
    * not miscounted). Every page's CRC-32 (the spec's 0x04c11db7
    * non-reflected polynomial, CRC field zeroed during computation) is
    * VERIFIED — a corrupt page ends the walk at the last good page
    * boundary, and a payload with not one valid page refuses. The granule
    * clock itself is cross-checked (CRC only proves framing, not honesty):
    * granule positions must be non-negative and non-decreasing (RFC 3533),
    * the Vorbis ID header's rate must be a real audio rate (1 Hz..768
    * kHz), scaling is divide-first (a 63-bit granule times 1000 wraps),
    * and a duration past a century refuses — contradictions take the
    * stub branch instead of reporting a number off a lying header. */
  def parseOggPages(data: Array[Byte],
      maxPages: Long = 1L << 22): Option[OggInfo] = {
    def u8(i: Int): Int = data(i) & 0xff
    def le32(i: Int): Long = (u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def le64(i: Int): Long = le32(i) | (le32(i + 4) << 32)
    if (data.length < 27 || data(0) != 'O' || data(1) != 'g' ||
      data(2) != 'g' || data(3) != 'S') return None
    // CRC-32, polynomial 0x04c11db7, init 0, not reflected, no final xor
    // — the OGG framing spec's exact parameters
    val crcTable = Array.tabulate(256) { n =>
      var c = n << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      c
    }
    def pageCrc(from: Int, until: Int, crcAt: Int): Int = {
      var crc = 0
      var i = from
      while (i < until) {
        val b = if (i >= crcAt && i < crcAt + 4) 0 else u8(i)
        crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ b) & 0xff)
        i += 1
      }
      crc
    }
    var serial = -1L
    var codec = ""
    var rate = 0
    var channels = 0
    var preSkip = 0
    var nPages = 0L
    var nPackets = 0L
    var lastGranule = -1L
    var payloadBytes = 0L
    var pos = 0
    var stop = false
    var corrupt = false
    while (!stop && pos + 27 <= data.length && nPages < maxPages) {
      if (!(data(pos) == 'O' && data(pos + 1) == 'g' &&
        data(pos + 2) == 'g' && data(pos + 3) == 'S' && u8(pos + 4) == 0))
        stop = true
      else {
        val headerType = u8(pos + 5)
        val granule = le64(pos + 6)
        val pageSerial = le32(pos + 14)
        val nSegs = u8(pos + 26)
        val segTable = pos + 27
        if (segTable + nSegs > data.length) stop = true
        else {
          var bodyLen = 0
          var packetEnds = 0
          var k = 0
          while (k < nSegs) {
            val l = u8(segTable + k)
            bodyLen += l
            if (l < 255) packetEnds += 1
            k += 1
          }
          val body = segTable + nSegs
          val pageEnd = body + bodyLen
          if (pageEnd > data.length) stop = true
          else if (pageCrc(pos, pageEnd, pos + 22) != le32(pos + 22).toInt)
            stop = true // corrupt page: end at the last verified boundary
          else {
            if (serial == -1L && (headerType & 0x02) != 0) {
              serial = pageSerial
              // the BOS page's first packet is the codec ID header
              if (bodyLen >= 19 && data(body) == 'O' && data(body + 1) == 'p' &&
                new String(data, body, 8, java.nio.charset.StandardCharsets.US_ASCII) == "OpusHead") {
                codec = "opus"
                channels = u8(body + 9)
                preSkip = (u8(body + 10) | (u8(body + 11) << 8))
                rate = 48000 // the Opus granule clock is always 48 kHz
              } else if (bodyLen >= 30 && u8(body) == 1 &&
                new String(data, body + 1, 6, java.nio.charset.StandardCharsets.US_ASCII) == "vorbis") {
                codec = "vorbis"
                channels = u8(body + 11)
                rate = le32(body + 12).toInt
                // plausibility gate on the ID header's clock: granule
                // durations are only honest if the claimed rate is a real
                // audio rate (1 Hz..768 kHz); a lying header is a
                // contradiction, not a value — refuse the payload
                if (rate < 1 || rate > 768000) corrupt = true
              } else codec = "unknown"
            }
            if (pageSerial == serial) {
              nPages += 1
              nPackets += packetEnds
              payloadBytes += bodyLen
              // -1 = no packet finishes on this page; skip as unpositioned
              if (granule != -1L) {
                // RFC 3533: granule positions are non-decreasing across a
                // logical bitstream's pages — a regression or a negative
                // position (CRC-valid or not) is a corrupt/crafted stream;
                // refuse rather than report a duration off a lying clock
                if (granule < 0L || granule < lastGranule) corrupt = true
                else lastGranule = granule
              }
            }
            pos = pageEnd
          }
        }
      }
    }
    if (nPages == 0 || serial == -1L || corrupt) None
    else {
      // overflow-safe scaling (granule is a full signed 64-bit field, so
      // granule * 1000 can wrap even on a CRC-valid stream): divide first,
      // carry the remainder, and refuse durations past a century — no real
      // recording is that long, only a crafted granule
      val g =
        if (codec == "opus") math.max(0L, lastGranule - preSkip)
        else lastGranule
      val durMs =
        if (lastGranule < 0 || rate <= 0) 0L
        else g / rate * 1000L + g % rate * 1000L / rate
      if (durMs > 100L * 366 * 24 * 3600 * 1000) None
      else Some(OggInfo(codec, rate, channels, nPages, nPackets, durMs,
        payloadBytes))
    }
  }

  /** One MPEG-TS payload's packet-walk result ([[parseTsPackets]]). */
  final case class TsInfo(nPackets: Long, nPids: Int, nPes: Long,
      nNull: Long, durationMs: Long)

  /** Walk an MPEG transport stream's fixed 188-byte packet lattice per
    * the published ISO/IEC 13818-1 framing — the broadcast-capture
    * container a crawl corpus's `.ts` files arrive in: packet counts,
    * distinct PIDs (the stream-multiplex width), payload-unit starts
    * (PES/section count), null-stuffing packets (PID 0x1FFF — wasted
    * bandwidth a curation pass can gate on), and an honest duration from
    * the first/last PCR (the 33-bit 90 kHz program clock carried in
    * adaptation fields — the mux's own clock, not a tag). The walk stops
    * at the first byte that is not a sync (0x47) on the lattice —
    * truncation/garbage tails report the packets seen; not one valid
    * packet refuses. PCR wraparound (~26.5 h) is not unwrapped — a
    * single capture spanning a wrap reports only the post-wrap span. */
  def parseTsPackets(data: Array[Byte],
      maxPackets: Long = 1L << 24): Option[TsInfo] = {
    def u8(i: Int): Int = data(i) & 0xff
    if (data.length < 188 || u8(0) != 0x47) return None
    val pidSeen = new Array[Boolean](8192)
    var nPids = 0
    var nPackets = 0L
    var nPes = 0L
    var nNull = 0L
    var firstPcr = -1L
    var lastPcr = -1L
    var pos = 0
    var stop = false
    while (!stop && pos + 188 <= data.length && nPackets < maxPackets) {
      if (u8(pos) != 0x47) stop = true
      else {
        val b1 = u8(pos + 1); val b2 = u8(pos + 2); val b3 = u8(pos + 3)
        val pusi = (b1 & 0x40) != 0
        val pid = ((b1 & 0x1f) << 8) | b2
        val afc = (b3 >> 4) & 0x3
        nPackets += 1
        if (pid == 0x1fff) nNull += 1
        else {
          if (!pidSeen(pid)) { pidSeen(pid) = true; nPids += 1 }
          if (pusi) nPes += 1
        }
        if ((afc & 0x2) != 0) { // adaptation field present
          val afLen = u8(pos + 4)
          if (afLen >= 7 && pos + 11 < data.length &&
            (u8(pos + 5) & 0x10) != 0) { // PCR flag
            // 33-bit base at 90 kHz across bytes 6..10
            val base = (u8(pos + 6).toLong << 25) | (u8(pos + 7).toLong << 17) |
              (u8(pos + 8).toLong << 9) | (u8(pos + 9).toLong << 1) |
              ((u8(pos + 10) >> 7) & 1)
            if (firstPcr < 0) firstPcr = base
            lastPcr = base
          }
        }
        pos += 188
      }
    }
    if (nPackets == 0) None
    else Some(TsInfo(nPackets, nPids, nPes, nNull,
      if (firstPcr >= 0 && lastPcr > firstPcr)
        (lastPcr - firstPcr) / 90L
      else 0L))
  }

  /** One MPEG-TS payload's packet-walk row ([[tsPacketStats]]). */
  final case class TsStatsRow(id: Long, kind: String, nBytes: Long,
      parsed: Boolean, nPackets: Long, nPids: Int, nPes: Long,
      nNull: Long, durationMs: Long)

  /** MPEG-TS packet statistics over a binary media frame — a narrow
    * mapPartitions at the codec boundary like every decode here. */
  def tsPacketStats(media: DataFrame): Dataset[TsStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      parseTsPackets(r.data) match {
        case Some(t) => TsStatsRow(r.id, r.kind, r.data.length.toLong,
          parsed = true, t.nPackets, t.nPids, t.nPes, t.nNull, t.durationMs)
        case None => TsStatsRow(r.id, r.kind, r.data.length.toLong,
          parsed = false, 0L, 0, 0L, 0L, 0L)
      }
    })
  }

  /** One OGG payload's page-walk row ([[oggPageStats]]). */
  final case class OggStatsRow(id: Long, kind: String, nBytes: Long,
      parsed: Boolean, codec: String, sampleRate: Int, channels: Int,
      nPages: Long, nPackets: Long, durationMs: Long,
      totalPayloadBytes: Long)

  /** OGG page statistics over a binary media frame — a narrow
    * mapPartitions at the codec boundary like every decode here. */
  def oggPageStats(media: DataFrame): Dataset[OggStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      parseOggPages(r.data) match {
        case Some(o) => OggStatsRow(r.id, r.kind, r.data.length.toLong,
          parsed = true, o.codec, o.sampleRate, o.channels, o.nPages,
          o.nPackets, o.durationMs, o.totalPayloadBytes)
        case None => OggStatsRow(r.id, r.kind, r.data.length.toLong,
          parsed = false, "", 0, 0, 0L, 0L, 0L, 0L)
      }
    })
  }

  /** One WebM payload's block-walk row ([[webmBlockStats]]): unparseable
    * payloads report `parsed = false` with zeroed columns. */
  final case class WebmStatsRow(id: Long, kind: String, nBytes: Long,
      parsed: Boolean, videoTrack: Long, nBlocks: Long, nKeyframes: Long,
      durationMs: Long, totalBlockBytes: Long)

  /** WebM/Matroska block statistics over a binary media frame — a narrow
    * mapPartitions at the codec boundary like every decode here. */
  def webmBlockStats(media: DataFrame): Dataset[WebmStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      parseWebmBlocks(r.data) match {
        case Some(w) => WebmStatsRow(r.id, r.kind, r.data.length.toLong,
          parsed = true, w.videoTrack, w.nBlocks, w.nKeyframes,
          w.durationMs, w.totalBlockBytes)
        case None => WebmStatsRow(r.id, r.kind, r.data.length.toLong,
          parsed = false, 0L, 0L, 0L, 0L, 0L)
      }
    })
  }

  /** One MP3 payload's frame-walk row ([[mp3FrameStats]]): unparseable
    * payloads report `parsed = false` with zeroed columns — a curation
    * gate must see every row. */
  final case class Mp3StatsRow(id: Long, kind: String, nBytes: Long,
      parsed: Boolean, sampleRate: Int, channels: Int, nFrames: Long,
      durationMs: Long, minKbps: Int, maxKbps: Int, vbr: Boolean)

  /** MP3 frame-sequence statistics over a binary media frame — a narrow
    * mapPartitions at the codec boundary like every decode here. The VBR
    * flag and the honest summed duration are the curation signals the
    * single-header CBR estimate cannot provide. */
  def mp3FrameStats(media: DataFrame): Dataset[Mp3StatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      parseMp3Frames(r.data) match {
        case Some(m) => Mp3StatsRow(r.id, r.kind, r.data.length.toLong,
          parsed = true, m.sampleRate, m.channels, m.nFrames, m.durationMs,
          m.minKbps, m.maxKbps, m.vbr)
        case None => Mp3StatsRow(r.id, r.kind, r.data.length.toLong,
          parsed = false, 0, 0, 0L, 0L, 0, 0, vbr = false)
      }
    })
  }

  /** A media row: payload + envelope. */
  final case class MediaRow(id: Long, kind: String, data: Array[Byte])

  /** Typed metadata extracted by decode. */
  final case class MediaMeta(id: Long, kind: String, nBytes: Long,
      width: Int, height: Int, nFrames: Int)

  /** Wrap a string column as a binary media payload (UTF-8), standing in for
    * real image/audio bytes ingested from object storage. */
  def attachBinary(df: DataFrame, idCol: String, strCol: String, kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
      encode(col(strCol), "UTF-8").as("data"))

  /** Decode one partition's rows in a single pass (the shape a vectorized
    * codec call needs). Image containers (PNG/GIF/JPEG/...) get REAL
    * header-parsed dimensions ([[parseDimensions]], 1 frame); video
    * containers with sample-level tables (AVI chunk walks, MP4 sample
    * tables — [[parseVideoFrameTable]]) get REAL geometry and EXACT
    * per-frame counts. Only corrupt or genuinely opaque payloads take
    * the deterministic STUB branch: fake dimensions and frame counts
    * derived from the byte length. */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
    rows.map { r =>
      val n = r.data.length.toLong
      parseDimensions(r.data) match {
        case Some((w, h)) => MediaMeta(r.id, r.kind, n, w, h, 1)
        case None => parseVideoFrameTable(r.data) match {
          case Some(t) =>
            MediaMeta(r.id, r.kind, n, t.width, t.height, t.frames.length)
          case None =>
            val w = 16 + (n % 64).toInt
            val h = 16 + (n % 48).toInt
            val f = if (r.kind == "video") 1 + (n % 30).toInt else 1
            MediaMeta(r.id, r.kind, n, w, h, f)
        }
      }
    }

  /** Decode a media frame: binary column in, typed metadata out. */
  def decode(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeBatch)
  }

  /** Typed audio/video container metadata extracted by [[decodeAv]]. */
  final case class AvMeta(id: Long, kind: String, nBytes: Long,
      container: String, width: Int, height: Int, durationMs: Long,
      sampleRate: Int, channels: Int)

  /** Per-partition batch decode of one row's AV container metadata — the
    * audio/video sibling of [[decodeBatch]]: MP4, WAV, WebM/Matroska, MP3
    * and FLAC payloads get REAL header-parsed metadata ([[parseAvMeta]]);
    * anything else — genuinely opaque or corrupt payloads — takes the
    * deterministic stub branch (container "opaque"; width/height reuse the
    * image-stub formulas, duration = nBytes mod 10000 ms, no audio
    * parameters). */
  def decodeAvBatch(rows: Iterator[MediaRow]): Iterator[AvMeta] =
    rows.map { r =>
      val n = r.data.length.toLong
      parseAvMeta(r.data) match {
        case Some(m) => AvMeta(r.id, r.kind, n, m.container, m.width,
          m.height, m.durationMs, m.sampleRate, m.channels)
        case None => AvMeta(r.id, r.kind, n, "opaque",
          16 + (n % 64).toInt, 16 + (n % 48).toInt, n % 10000L, 0, 0)
      }
    }

  /** Decode audio/video container metadata: binary column in, typed
    * metadata out. */
  def decodeAv(media: DataFrame): Dataset[AvMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeAvBatch)
  }

  /** STUB byte-budget trim (kept for byte-size bookkeeping tests) — for
    * REAL pixel resizing use [[resizeImage]], which decodes, box-averages
    * and re-encodes. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("data",
      expr(s"substring(data, 1, $maxBytes)"))

  /** STUB frame sampling for video payloads: every stride-th byte stands in
    * for every stride-th frame. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      MediaRow(r.id, r.kind, r.data.grouped(stride).map(_.head).toArray)
    }).toDF()
  }

  /** One sampled frame row. For payloads with a parseable frame table
    * ([[parseVideoFrameTable]] — AVI/MJPEG chunks, MP4 sample tables)
    * `frame` holds the REAL bytes of the source frame covering `ts_ms`
    * (for the MJPEG codec family each is a standalone JPEG the JDK
    * decodes); for containers with no frame-level access (WebM payloads)
    * it is a deterministic md5 stub, while the parsed duration driving
    * the schedule, the row shape, and the narrow explode are the
    * production plumbing either way. */
  final case class FrameRow(id: Long, frame_idx: Int, ts_ms: Long,
      decoded: Boolean, frame: Array[Byte])

  /** TIME-based frame sampling: one row per `everyMs` of each payload's
    * REAL parsed duration ([[parseAvMeta]] — AVI/MP4/WebM/WAV/MP3/FLAC),
    * from t=0 through the last whole interval before the end; payloads
    * whose container cannot be parsed (or with zero duration) emit a
    * single frame at t=0. This is the contact-sheet/CLIP-embedding
    * sampling schedule a video curation pipeline runs before per-frame
    * scoring.
    *
    * Scale shape: a narrow per-row flatMap inside one mapPartitions at the
    * codec boundary — no shuffle, output rows proportional to total
    * duration, task memory bounded by one payload. Payloads with a frame
    * table ([[parseVideoFrameTable]] — AVI/MJPEG and MP4 sample tables)
    * emit REAL frame bytes (`decoded = true`): the frame covering the
    * schedule tick, i.e. the LAST frame whose decode timestamp is <= the
    * tick (for constant-rate AVI that is floor(ts * 1e6 / usPerFrame);
    * for MP4 it honors the non-uniform stts timing), clamped to the last
    * frame actually present. Other containers emit a deterministic stub
    * (md5 of (id, frame_idx) — H.264/VP9 have no pure-JVM codec); a real
    * decoder drops into the same row contract.
    *
    * `maxFrames` caps one payload's schedule: a corrupt container can
    * parse to an absurd duration (a crafted 32-bit mvhd at timescale 1
    * reaches ~136 years), and uncapped the frame count would overflow Int
    * — a wrapped-negative count silently emits ZERO rows where the
    * contract promises at least one — or explode the output; the default
    * allows ~12 days of video at 1 s cadence. */
  def sampleFramesByTime(media: DataFrame, everyMs: Long,
      maxFrames: Int = 1 << 20): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      parseVideoFrameTable(r.data, maxFrames) match {
        case Some(tab) =>
          val n = math.min(math.max(1L, tab.durationMs / everyMs + 1),
            maxFrames.toLong).toInt
          // ticks are increasing, so the covering-frame lookup is a
          // monotone pointer advance — O(ticks + frames) total, not a
          // binary search per tick
          var fp = 0
          (0 until n).iterator.map { i =>
            val ts = i * everyMs
            val us = ts * 1000L
            while (fp + 1 < tab.frames.length && tab.tsUs(fp + 1) <= us)
              fp += 1
            val (off, len) = tab.frames(fp)
            val raw = java.util.Arrays.copyOfRange(r.data, off, off + len)
            FrameRow(r.id, i, ts, decoded = true,
              if (tab.container == "webp") riffWrapVp8l(raw) else raw)
          }
        case _ =>
          val durMs = parseAvMeta(r.data).map(_.durationMs).getOrElse(0L)
          val n = math.min(math.max(1L, durMs / everyMs + 1),
            maxFrames.toLong).toInt
          val digest = java.security.MessageDigest.getInstance("MD5")
          (0 until n).iterator.map { i =>
            digest.reset()
            val stub = digest.digest(s"${r.id}/$i".getBytes("UTF-8"))
            FrameRow(r.id, i, i * everyMs, decoded = false, stub)
          }
      }
    }).toDF()
  }

  // ------------------------------------------------ perceptual image hashing

  /** One image's perceptual-hash row ([[imageHash]]). `width`/`height` come
    * from the header sniff ([[parseDimensions]]) whenever the container is
    * recognized — even when pixel decode is refused or fails; `decoded`
    * says whether pixels were actually decoded, and only decoded rows carry
    * hashes. */
  final case class ImageHashRow(id: Long, kind: String, nBytes: Long,
      decoded: Boolean, width: Int, height: Int,
      ahash: Option[Long], dhash: Option[Long])

  /** Integer luma of one packed sRGB pixel — the ITU-R BT.601 weights in
    * exact integer arithmetic ((299 r + 587 g + 114 b) / 1000, floor), so
    * every engine that agrees on the decoded pixels agrees on the hash
    * bit-for-bit. Range 0..255. */
  @inline private def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Box-average a w x h luma field (accessed row-at-a-time) onto a
    * gw x gh grid: pixel x lands in cell x*gw/w (the floor partition of
    * [0,w) into gw near-equal runs). Returns (sums, counts), row-major.
    * Cells can be EMPTY when the image is narrower than the grid — the
    * caller decides what an empty cell means. All-integer: no resampling
    * filter, no float accumulation, so the average is a pure function of
    * the decoded pixels. */
  private def gridSums(img: java.awt.image.BufferedImage, gw: Int, gh: Int,
      orientation: Int = 1): (Array[Long], Array[Long]) = {
    val w = img.getWidth
    val h = img.getHeight
    // EXIF orientations 5-8 transpose the DISPLAY geometry; the grid is
    // laid over display coordinates so two copies of one scene that differ
    // only in stored rotation land on the same cells. The transform runs
    // per COORDINATE, never copies pixels — memory stays O(width).
    val swap = orientation >= 5
    val dw = if (swap) h else w
    val dh = if (swap) w else h
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      // one bulk sRGB conversion per ROW: memory stays O(width) however
      // large the image, and the per-pixel getRGB call overhead is gone
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        // stored (x, y) -> display (dx, dy), per the published EXIF table
        val dx = orientation match {
          case 2 | 3 => w - 1 - x
          case 6 | 7 => h - 1 - y
          case 5 | 8 => y
          case _ => x
        }
        val dy = orientation match {
          case 3 | 4 => h - 1 - y
          case 7 | 8 => w - 1 - x
          case 5 | 6 => x
          case _ => y
        }
        val c = (dy.toLong * gh / dh).toInt * gw + (dx.toLong * gw / dw).toInt
        sums(c) += luma(row(x))
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    (sums, counts)
  }

  /** The EXIF orientation (1-8) of a JPEG payload, 1 (normal) when absent
    * or unparseable — a marker walk to APP1/"Exif\0\0", then the TIFF
    * header it embeds (II/MM endian, magic 42, IFD0 offset) and IFD0's
    * 12-byte entries looking for tag 0x0112 (SHORT, inline value). Every
    * read is bounds-checked; corrupt EXIF degrades to 1, never throws.
    * Real cameras write rotated sensor data with this tag instead of
    * rotating pixels — two copies of one photo that differ only in stored
    * rotation must hash as the near-duplicates they are. */
  def exifOrientation(data: Array[Byte]): Int = {
    def u8(i: Int): Int = data(i) & 0xff
    if (data.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return 1
    var i = 2
    while (i + 4 <= data.length && u8(i) == 0xff) {
      val marker = u8(i + 1)
      if (marker == 0xda || marker == 0xd9) return 1 // SOS/EOI: no APP1
      val len = (u8(i + 2) << 8) | u8(i + 3)
      if (len < 2 || i + 2 + len > data.length) return 1
      if (marker == 0xe1 && len >= 16 &&
          new String(data, i + 4, 6, java.nio.charset.StandardCharsets.US_ASCII)
            == "Exif\u0000\u0000") {
        val t = i + 10 // TIFF header start
        val big = u8(t) == 'M' && u8(t + 1) == 'M'
        val little = u8(t) == 'I' && u8(t + 1) == 'I'
        if (!big && !little) return 1
        def u16(p: Int): Int =
          if (big) (u8(p) << 8) | u8(p + 1) else u8(p) | (u8(p + 1) << 8)
        def u32(p: Int): Long =
          if (big) (u16(p).toLong << 16) | u16(p + 2)
          else u16(p).toLong | (u16(p + 2).toLong << 16)
        val end = i + 2 + len
        if (t + 8 > end || u16(t + 2) != 42) return 1
        val ifd = t + u32(t + 4)
        if (ifd < t || ifd + 2 > end) return 1
        val n = u16(ifd.toInt)
        var e = 0
        while (e < n) {
          val p = ifd.toInt + 2 + e * 12
          if (p + 12 > end) return 1
          if (u16(p) == 0x0112 && u16(p + 2) == 3 && u32(p + 4) == 1L) {
            val v = u16(p + 8)
            return if (v >= 1 && v <= 8) v else 1
          }
          e += 1
        }
        return 1
      }
      i += 2 + len
    }
    1
  }

  /** aHash (average hash): 8x8 box-averaged luma, bit y*8+x set iff the
    * cell's average >= the GLOBAL average — compared exactly as cross
    * products (sumCell * totalCount >= totalSum * cellCount), never as
    * floats. Empty cells (image narrower/shorter than 8) stay 0. */
  private def aHash64(sums: Array[Long], counts: Array[Long]): Long = {
    val totalSum = sums.sum
    val totalCnt = counts.sum
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0 && sums(i) * totalCnt >= totalSum * counts(i))
        bits |= 1L << i
      i += 1
    }
    bits
  }

  /** dHash (difference hash): 9x8 box-averaged luma, bit y*8+x set iff
    * cell (y,x) is strictly brighter than its right neighbor (y,x+1) —
    * cross-product compare; an empty cell counts as brightness 0. Gradient
    * structure survives global brightness/contrast shifts, which is why
    * dHash is the near-dup workhorse. */
  private def dHash64(sums: Array[Long], counts: Array[Long]): Long = {
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val a = y * 9 + x
        val b = a + 1
        val (sa, ca) = (sums(a), math.max(counts(a), 1L))
        val (sb, cb) = (sums(b), math.max(counts(b), 1L))
        if (sa * cb > sb * ca) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Largest pixel count [[imageHashBatch]] will decode. Two bounds meet
    * here: the cross-product hash compares stay inside Long
    * (255 * P^2 < 2^63 needs P < 2^27.5), and — the one that matters
    * operationally — a decode allocates O(pixels) heap, so a crafted
    * 100-gigapixel PNG (a 120-byte file) must be REFUSED BEFORE ImageIO
    * touches it or one hostile row OOMs the executor. [[parseDimensions]]
    * reads only the header, so the guard costs nothing. */
  val MaxHashPixels: Long = 1L << 26 // 67 Mpixel ~= 8k x 8k

  /** Per-partition batch pixel decode + perceptual hash — unlike
    * [[decodeBatch]] (headers only) this decodes ACTUAL PIXELS, via the
    * JDK's own ImageIO readers (PNG/JPEG/GIF/BMP) plus the pure-JVM
    * [[Vp8lDecoder]] for lossless WebP — no external codec.
    * The pipeline per row: header sniff ([[parseDimensions]]) first — an
    * unrecognized container, or one whose DECLARED dimensions exceed
    * [[MaxHashPixels]] (decompression-bomb defense), is reported
    * undecoded with whatever dimensions the header gave; then ImageIO
    * decode (a corrupt body that defeats the sniff degrades to undecoded
    * instead of killing the job); then 8x8/9x8 integer box-averaged luma
    * -> [[aHash64]]/[[dHash64]]. All arithmetic after decode is exact
    * integer math — the hash is a pure function of the decoded sRGB
    * pixels, reproducible across partitionings, JVMs, and engines. */
  /** Decode a STILL-image payload to pixels: the pure-JVM [[Vp8lDecoder]]
    * for lossless WebP (which ImageIO cannot read), else the JDK's own
    * ImageIO readers (PNG/JPEG/GIF/BMP). Returns null on failure — the
    * callers' degrade-to-undecoded contract. The VP8L path is gated by
    * its RIFF sniff (three fourcc compares on a non-WebP payload). */
  private[multimodal] def readImage(data: Array[Byte])
      : java.awt.image.BufferedImage =
    Vp8lDecoder.decode(data).getOrElse {
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      catch { case _: Exception => null }
    }

  def imageHashBatch(rows: Iterator[MediaRow]): Iterator[ImageHashRow] = {
    // ImageIO's default ImageInputStream spools through TEMP FILES — at
    // corpus scale that is an extra disk write per image; keep it in memory
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { r =>
      val n = r.data.length.toLong
      val dims = parseDimensions(r.data)
      val (w0, h0) = dims.getOrElse((0, 0))
      val tooBig = dims.exists { case (w, h) => w.toLong * h > MaxHashPixels }
      val img =
        if (dims.isEmpty || tooBig) null
        else readImage(r.data)
      if (img == null)
        ImageHashRow(r.id, r.kind, n, decoded = false, w0, h0, None, None)
      else {
        // hash over DISPLAY geometry: a camera's EXIF-rotated re-encode of
        // the same scene must land within near-dup range of the upright
        // copy. width/height stay the STORED dims (the container's claim,
        // consistent with the undecoded branch's header sniff).
        val o = exifOrientation(r.data)
        val (s8, c8) = gridSums(img, 8, 8, o)
        val (s9, c9) = gridSums(img, 9, 8, o)
        ImageHashRow(r.id, r.kind, n, decoded = true,
          img.getWidth, img.getHeight,
          Some(aHash64(s8, c8)), Some(dHash64(s9, c9)))
      }
    }
  }

  /** Perceptual image hashing over a binary media frame (id, kind, data):
    * (id, kind, nBytes, decoded, width, height, ahash, dhash). A narrow
    * mapPartitions at the codec boundary — no shuffle, task memory bounded
    * by one image row (O(width) beyond the payload itself thanks to
    * row-strip conversion), hostile payloads bounded by the
    * [[MaxHashPixels]] pre-check. Feed the result to
    * [[graft.operators.Dedup.hammingPairs]] on `dhash` for image near-dup
    * detection. */
  def imageHash(media: DataFrame): Dataset[ImageHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(imageHashBatch)
  }

  /** One sampled video frame's perceptual-hash row ([[videoFrameHashes]]).
    * `frame_idx` is the SCHEDULE index (tick i at t = i * everyMs), not
    * the source frame number — two videos sampled at the same cadence are
    * comparable position-by-position regardless of their native frame
    * rates. Undecodable payloads (non-AVI containers, corrupt files)
    * emit one `decoded = false` marker row so a curation pass never
    * silently drops media. */
  /** Diagnostic counter of ACTUAL pixel decodes in the video samplers —
    * per-JVM, test/ScaleProbe instrumentation only (asserts that the
    * last-frame memo bounds decode work by distinct sampled frames, not
    * schedule ticks). Never read on the hot path. */
  object FrameDecodeCounter {
    private val n = new java.util.concurrent.atomic.LongAdder
    private[multimodal] def increment(): Unit = n.increment()
    def sum(): Long = n.sum()
    def reset(): Unit = n.reset()
  }

  final case class VideoFrameHashRow(id: Long, frame_idx: Int, ts_ms: Long,
      decoded: Boolean, ahash: Option[Long], dhash: Option[Long])

  /** Per-frame perceptual hashes over video payloads — the video charter's
    * near-dup front end: [[parseVideoFrameTable]] extracts the frame byte
    * ranges (AVI/MJPEG chunks, MP4 sample tables — MJPEG-in-MP4 decodes
    * the same way), the schedule samples one frame per `everyMs` of real
    * duration (identical arithmetic to [[sampleFramesByTime]], honoring
    * MP4's non-uniform stts timing), each sampled JPEG
    * decodes through the [[imageHashBatch]] guard (header sniff,
    * [[MaxHashPixels]] bomb refusal, corrupt bodies degrade to an
    * undecoded row) onto the exact-integer aHash/dHash grids. Feed the
    * result to [[graft.operators.Dedup.frameSigPairs]] for video near-dup:
    * a re-encoded copy matches frame-by-frame at Hamming <= 3, a trimmed
    * copy matches on a shifted diagonal.
    *
    * Scale shape: one narrow mapPartitions at the codec boundary — no
    * shuffle, output rows proportional to sampled duration, task memory
    * bounded by one frame's pixels (row-strip luma conversion), never the
    * whole video's. */
  def videoFrameHashes(media: DataFrame, everyMs: Long,
      maxFrames: Int = 1 << 20): Dataset[VideoFrameHashRow] = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        parseVideoFrameTable(r.data, maxFrames) match {
          case Some(tab) =>
            val n = math.min(math.max(1L, tab.durationMs / everyMs + 1),
              maxFrames.toLong).toInt
            // the schedule's frame indices are non-decreasing (monotone
            // pointer over the timestamp table), so memoizing only the
            // LAST decoded frame bounds decode work by DISTINCT sampled
            // frames, not ticks — on a low-fps clip with a dense schedule
            // (everyMs shorter than the frame period) consecutive ticks
            // hit the same source frame repeatedly
            var fp = 0
            var lastFi = -1
            var lastA: Option[Long] = None
            var lastD: Option[Long] = None
            var lastOk = false
            (0 until n).iterator.map { i =>
              val ts = i * everyMs
              val us = ts * 1000L
              while (fp + 1 < tab.frames.length && tab.tsUs(fp + 1) <= us)
                fp += 1
              val fi = fp
              if (fi != lastFi) {
                lastFi = fi
                val (off, len) = tab.frames(fi)
                val raw = java.util.Arrays.copyOfRange(r.data, off, off + len)
                // animated-WebP frames are bare VP8L chunks: wrap into a
                // standalone still so the sniff/decode guard serves them
                val bytes =
                  if (tab.container == "webp") riffWrapVp8l(raw) else raw
                val dims = parseDimensions(bytes)
                val tooBig = dims.exists { case (w, h) => w.toLong * h > MaxHashPixels }
                val img =
                  if (dims.isEmpty || tooBig) null
                  else {
                    FrameDecodeCounter.increment()
                    readImage(bytes)
                  }
                if (img == null) { lastOk = false; lastA = None; lastD = None }
                else {
                  val (s8, c8) = gridSums(img, 8, 8)
                  val (s9, c9) = gridSums(img, 9, 8)
                  lastOk = true
                  lastA = Some(aHash64(s8, c8))
                  lastD = Some(dHash64(s9, c9))
                }
              }
              VideoFrameHashRow(r.id, i, ts, lastOk, lastA, lastD)
            }
          case _ =>
            Iterator.single(
              VideoFrameHashRow(r.id, 0, 0L, decoded = false, None, None))
        }
      }
    }
  }

  /** One video's quality-statistics row ([[videoStats]]) — the gating
    * signals a video-corpus curation pass filters on, aggregated over the
    * SAMPLED frames (the [[videoFrameHashes]] schedule): `nBlack` = frames
    * whose mean luma < 16 (dead camera, lead-in padding — integer
    * cross-product compare, lumaSum < 16 * framePixels), `nFlat` = frames
    * whose 256-bin luma entropy < 1000 millibits (solid color, test
    * pattern), plus the exact luma mass (`lumaSum`/`nPixels`) for a mean
    * without committing to a rounding. A clip that is mostly black or
    * flat is a gate candidate regardless of its container metadata. */
  final case class VideoStatsRow(id: Long, kind: String, nBytes: Long,
      decoded: Boolean, nSampled: Int, nDecoded: Int, nBlack: Int,
      nFlat: Int, lumaSum: Long, nPixels: Long)

  /** Per-video quality statistics over the sampled-frame schedule — the
    * video sibling of [[imageStats]]: one narrow mapPartitions at the
    * codec boundary, per-video O(1) aggregation state (each sampled frame
    * decodes, folds into counters, and is dropped before the next), no
    * shuffle, one output row per payload. Undecodable containers report
    * `decoded = false` with zeroed counters — a curation gate must see
    * every row. */
  def videoStats(media: DataFrame, everyMs: Long,
      maxFrames: Int = 1 << 20): Dataset[VideoStatsRow] = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val n = r.data.length.toLong
        parseVideoFrameTable(r.data, maxFrames) match {
          case Some(tab) =>
            val nSampled = math.min(math.max(1L, tab.durationMs / everyMs + 1),
              maxFrames.toLong).toInt
            var nDecoded = 0; var nBlack = 0; var nFlat = 0
            var lumaSum = 0L; var nPixels = 0L
            // last-frame memo (see videoFrameHashes): the schedule's frame
            // indices are non-decreasing, so caching one frame's fold
            // contribution bounds decode work by DISTINCT sampled frames
            var fp = 0
            var lastFi = -1
            var lastOk = false; var lastBlack = false; var lastFlat = false
            var lastSum = 0L; var lastTotal = 0L
            var i = 0
            while (i < nSampled) {
              val ts = i.toLong * everyMs
              val us = ts * 1000L
              while (fp + 1 < tab.frames.length && tab.tsUs(fp + 1) <= us)
                fp += 1
              val fi = fp
              if (fi != lastFi) {
                lastFi = fi
                lastOk = false; lastBlack = false; lastFlat = false
                lastSum = 0L; lastTotal = 0L
                val (off, len) = tab.frames(fi)
                val raw = java.util.Arrays.copyOfRange(r.data, off, off + len)
                // animated-WebP frames are bare VP8L chunks: wrap into a
                // standalone still so the sniff/decode guard serves them
                val bytes =
                  if (tab.container == "webp") riffWrapVp8l(raw) else raw
                val dims = parseDimensions(bytes)
                val tooBig = dims.exists { case (w, h) => w.toLong * h > MaxHashPixels }
                val img =
                  if (dims.isEmpty || tooBig) null
                  else {
                    FrameDecodeCounter.increment()
                    readImage(bytes)
                  }
                if (img != null) {
                  val w = img.getWidth
                  val h = img.getHeight
                  val hist = new Array[Long](256)
                  val row = new Array[Int](w)
                  var sum = 0L
                  var y = 0
                  while (y < h) {
                    img.getRGB(0, y, w, 1, row, 0, w)
                    var x = 0
                    while (x < w) {
                      val l = luma(row(x))
                      hist(l) += 1
                      sum += l
                      x += 1
                    }
                    y += 1
                  }
                  val total = w.toLong * h
                  var ent = 0.0
                  var b = 0
                  while (b < 256) {
                    if (hist(b) > 0) {
                      val p = hist(b).toDouble / total
                      ent -= p * (math.log(p) / math.log(2.0))
                    }
                    b += 1
                  }
                  lastOk = true
                  lastBlack = sum < 16L * total
                  lastFlat = math.floor(ent * 1000.0).toLong < 1000L
                  lastSum = sum
                  lastTotal = total
                }
              }
              if (lastOk) {
                nDecoded += 1
                if (lastBlack) nBlack += 1
                if (lastFlat) nFlat += 1
                lumaSum += lastSum
                nPixels += lastTotal
              }
              i += 1
            }
            VideoStatsRow(r.id, r.kind, n, decoded = true, nSampled,
              nDecoded, nBlack, nFlat, lumaSum, nPixels)
          case _ =>
            VideoStatsRow(r.id, r.kind, n, decoded = false, 0, 0, 0, 0, 0L, 0L)
        }
      }
    }
  }

  /** One schedule tick's combined near-dup + quality signals
    * ([[videoFrameSignals]]). `parsed` is container-level (an unparseable
    * payload emits a single `parsed = false` marker row); `decoded` is
    * frame-level, exactly [[VideoFrameHashRow]]'s flag. */
  final case class VideoFrameSignalRow(id: Long, frame_idx: Int, ts_ms: Long,
      parsed: Boolean, decoded: Boolean, ahash: Option[Long],
      dhash: Option[Long], black: Boolean, flat: Boolean,
      lumaSum: Long, nPixels: Long)

  /** ONE decode pass serving BOTH the video near-dup front end and the
    * quality gates — for pipelines (the multimodal flagship) that need
    * [[videoFrameHashes]] AND [[videoStats]] over the same corpus: each
    * sampled frame decodes ONCE and yields its perceptual hashes plus the
    * per-frame gating signals ([[VideoStatsRow]]'s black/flat/luma
    * definitions, bit-identical). The per-tick hash rows equal
    * [[videoFrameHashes]]' output column-for-column; grouping by id and
    * counting parsed/decoded/black/flat ticks reproduces [[videoStats]]'
    * counters exactly. Same schedule, same last-frame memo (decode work
    * bounded by DISTINCT sampled frames), same bomb guard, same
    * marker-row degrade; pixels are re-read per signal (three cheap
    * row-strip passes) but the JPEG entropy decode — the actual cost —
    * happens once instead of twice. */
  def videoFrameSignals(media: DataFrame, everyMs: Long,
      maxFrames: Int = 1 << 20): Dataset[VideoFrameSignalRow] = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        parseVideoFrameTable(r.data, maxFrames) match {
          case Some(tab) =>
            val n = math.min(math.max(1L, tab.durationMs / everyMs + 1),
              maxFrames.toLong).toInt
            var fp = 0
            var lastFi = -1
            var lastOk = false
            var lastA: Option[Long] = None
            var lastD: Option[Long] = None
            var lastBlack = false; var lastFlat = false
            var lastSum = 0L; var lastTotal = 0L
            (0 until n).iterator.map { i =>
              val ts = i * everyMs
              val us = ts * 1000L
              while (fp + 1 < tab.frames.length && tab.tsUs(fp + 1) <= us)
                fp += 1
              val fi = fp
              if (fi != lastFi) {
                lastFi = fi
                lastOk = false; lastA = None; lastD = None
                lastBlack = false; lastFlat = false
                lastSum = 0L; lastTotal = 0L
                val (off, len) = tab.frames(fi)
                val raw = java.util.Arrays.copyOfRange(r.data, off, off + len)
                // animated-WebP frames are bare VP8L chunks: wrap into a
                // standalone still so the sniff/decode guard serves them
                val bytes =
                  if (tab.container == "webp") riffWrapVp8l(raw) else raw
                val dims = parseDimensions(bytes)
                val tooBig = dims.exists { case (w, h) => w.toLong * h > MaxHashPixels }
                val img =
                  if (dims.isEmpty || tooBig) null
                  else {
                    FrameDecodeCounter.increment()
                    readImage(bytes)
                  }
                if (img != null) {
                  val (s8, c8) = gridSums(img, 8, 8)
                  val (s9, c9) = gridSums(img, 9, 8)
                  lastA = Some(aHash64(s8, c8))
                  lastD = Some(dHash64(s9, c9))
                  val w = img.getWidth
                  val h = img.getHeight
                  val hist = new Array[Long](256)
                  val row = new Array[Int](w)
                  var sum = 0L
                  var y = 0
                  while (y < h) {
                    img.getRGB(0, y, w, 1, row, 0, w)
                    var x = 0
                    while (x < w) {
                      val l = luma(row(x)); hist(l) += 1; sum += l; x += 1
                    }
                    y += 1
                  }
                  val total = w.toLong * h
                  var ent = 0.0
                  var b = 0
                  while (b < 256) {
                    if (hist(b) > 0) {
                      val p = hist(b).toDouble / total
                      ent -= p * (math.log(p) / math.log(2.0))
                    }
                    b += 1
                  }
                  lastOk = true
                  lastBlack = sum < 16L * total
                  lastFlat = math.floor(ent * 1000.0).toLong < 1000L
                  lastSum = sum
                  lastTotal = total
                }
              }
              VideoFrameSignalRow(r.id, i, ts, parsed = true, lastOk,
                lastA, lastD, lastBlack, lastFlat, lastSum, lastTotal)
            }
          case _ =>
            Iterator.single(VideoFrameSignalRow(r.id, 0, 0L, parsed = false,
              decoded = false, None, None, black = false, flat = false,
              0L, 0L))
        }
      }
    }
  }

  /** One image's quality-statistics row ([[imageStats]]) — the gating
    * signals an image-corpus curation pass filters on (too dark / blown
    * out / flat / grayscale / extreme aspect), all EXACT integers or
    * deterministic functions of exact integer histograms. `lumaSum` with
    * `nPixels` gives the mean without committing to a rounding;
    * `entropyMilli` is the Shannon entropy of the 256-bin luma histogram
    * in millibits (0 = flat single-tone, 8000 = perfectly uniform),
    * floored to an integer so the value is engine-portable. */
  final case class ImageStatsRow(id: Long, kind: String, nBytes: Long,
      decoded: Boolean, width: Int, height: Int, nPixels: Long,
      lumaSum: Long, lumaMin: Int, lumaMax: Int, isGray: Boolean,
      entropyMilli: Long)

  /** Per-partition image quality statistics — same decode guard as
    * [[imageHashBatch]] (header sniff, [[MaxHashPixels]] bomb refusal,
    * corrupt bodies degrade). One row-strip pass accumulates the 256-bin
    * luma histogram, min/max, and the exact channel-equality check
    * (`isGray` = every pixel has r == g == b — screenshots of text and
    * scanned documents commonly gate on it). Entropy comes from the
    * histogram: -Σ p·log2(p) over nonzero bins, computed in double from
    * exact Long counts in ascending bin order (deterministic), floored to
    * millibits. */
  def imageStatsBatch(rows: Iterator[MediaRow]): Iterator[ImageStatsRow] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { r =>
      val n = r.data.length.toLong
      val dims = parseDimensions(r.data)
      val (w0, h0) = dims.getOrElse((0, 0))
      val tooBig = dims.exists { case (w, h) => w.toLong * h > MaxHashPixels }
      val img =
        if (dims.isEmpty || tooBig) null
        else readImage(r.data)
      if (img == null)
        ImageStatsRow(r.id, r.kind, n, decoded = false, w0, h0, 0L, 0L, 0, 0,
          isGray = false, 0L)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](256)
        var gray = true
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            val rr = (p >> 16) & 0xff
            val gg = (p >> 8) & 0xff
            val bb = p & 0xff
            if (rr != gg || gg != bb) gray = false
            hist((299 * rr + 587 * gg + 114 * bb) / 1000) += 1
            x += 1
          }
          y += 1
        }
        val total = w.toLong * h
        var sum = 0L
        var mn = 255
        var mx = 0
        var ent = 0.0
        var i = 0
        while (i < 256) {
          val c = hist(i)
          if (c > 0) {
            sum += i.toLong * c
            if (i < mn) mn = i
            if (i > mx) mx = i
            val p = c.toDouble / total
            ent -= p * (math.log(p) / math.log(2.0))
          }
          i += 1
        }
        ImageStatsRow(r.id, r.kind, n, decoded = true, w, h, total,
          sum, mn, mx, gray, math.floor(ent * 1000.0).toLong)
      }
    }
  }

  /** Frame form of [[imageStatsBatch]] — narrow mapPartitions at the codec
    * boundary, the image-side sibling of the text quality battery. */
  def imageStats(media: DataFrame): Dataset[ImageStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(imageStatsBatch)
  }

  /** One resized image row ([[resizeImage]]): the payload re-encoded as
    * PNG at the scaled-to-fit dimensions, or passed through untouched when
    * it already fits (`resized = false`, original container preserved).
    * Undecodable payloads pass through with `decoded = false` — a resize
    * pass must not DROP rows, downstream filters decide. */
  final case class ResizedRow(id: Long, kind: String, decoded: Boolean,
      resized: Boolean, width: Int, height: Int, data: Array[Byte])

  /** REAL image resize (thumbnailing) — the upgrade of the byte-truncating
    * [[resize]] stub, possible with zero external codecs because the JDK
    * decodes PNG/JPEG/GIF/BMP and encodes PNG. Per row: the
    * [[imageHashBatch]] decode guard (header sniff first,
    * [[MaxHashPixels]] bomb refusal), then scale-to-fit inside
    * maxW x maxH preserving aspect (integer arithmetic:
    * outW = floor(w * maxH / h) on the height-constrained side, never
    * below 1), CHANNEL-WISE integer box-average onto the output grid (the
    * same floor-partition cells as the hash grids — each output pixel is
    * the floor mean of its source cell per channel, exact and
    * engine-reproducible; no resampling filter, no floats), PNG
    * re-encode. Images already inside the box pass through byte-identical
    * (no pointless re-encode; their container stays whatever it was).
    *
    * Scale: narrow mapPartitions at the codec boundary, task memory
    * O(source width + out dims) beyond the payload via row-strip reads. */
  def resizeImageBatch(rows: Iterator[MediaRow], maxW: Int, maxH: Int)
      : Iterator[ResizedRow] = {
    require(maxW > 0 && maxH > 0, s"resize box must be positive: $maxW x $maxH")
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { r =>
      val dims = parseDimensions(r.data)
      val tooBig = dims.exists { case (w, h) => w.toLong * h > MaxHashPixels }
      val img =
        if (dims.isEmpty || tooBig) null
        else readImage(r.data)
      if (img == null) {
        val (w0, h0) = dims.getOrElse((0, 0))
        ResizedRow(r.id, r.kind, decoded = false, resized = false, w0, h0, r.data)
      } else if (img.getWidth <= maxW && img.getHeight <= maxH)
        // pass-through stays BYTE-IDENTICAL by contract, EXIF tag and all —
        // an already-fitting photo keeps its original container, and any
        // orientation-aware consumer still sees the tag
        ResizedRow(r.id, r.kind, decoded = true, resized = false,
          img.getWidth, img.getHeight, r.data)
      else {
        val w = img.getWidth
        val h = img.getHeight
        // thumbnails bake the EXIF orientation in: the PNG re-encode
        // carries no tag, so an unoriented output would display rotated.
        // Fit computes over DISPLAY dims; accumulation maps each stored
        // pixel to its display cell (same per-coordinate transform as the
        // hash grids — no pixel copy, memory still O(source width)).
        val o = exifOrientation(r.data)
        val swap = o >= 5
        val dw = if (swap) h else w
        val dh = if (swap) w else h
        // scale to fit: the tighter axis pins to its bound, the other
        // scales by the same rational factor (floor, >= 1)
        val (outW, outH) =
          if (dw.toLong * maxH <= dh.toLong * maxW)
            (math.max(1, (dw.toLong * maxH / dh).toInt), maxH)
          else (maxW, math.max(1, (dh.toLong * maxW / dw).toInt))
        val rs = new Array[Long](outW * outH)
        val gs = new Array[Long](outW * outH)
        val bs = new Array[Long](outW * outH)
        val cn = new Array[Long](outW * outH)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
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
            val c = (dy.toLong * outH / dh).toInt * outW +
              (dx.toLong * outW / dw).toInt
            val p = row(x)
            rs(c) += (p >> 16) & 0xff
            gs(c) += (p >> 8) & 0xff
            bs(c) += p & 0xff
            cn(c) += 1
            x += 1
          }
          y += 1
        }
        val outImg = new java.awt.image.BufferedImage(outW, outH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < outW * outH) {
          val n = math.max(cn(i), 1L)
          outImg.setRGB(i % outW, i / outW,
            (((rs(i) / n).toInt & 0xff) << 16) |
            (((gs(i) / n).toInt & 0xff) << 8) |
            ((bs(i) / n).toInt & 0xff))
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(outImg, "png", bos)
        ResizedRow(r.id, "png", decoded = true, resized = true,
          outW, outH, bos.toByteArray)
      }
    }
  }

  /** Frame form of [[resizeImageBatch]]: (id, kind, data) in,
    * (id, kind, decoded, resized, width, height, data) out. */
  def resizeImage(media: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(resizeImageBatch(_, maxW, maxH))
  }

  // ------------------------------------------------ audio fingerprinting

  /** One audio payload's fingerprint row ([[audioFingerprint]]): format
    * facts from the REAL decode (sample rate, channels, frame count) plus
    * `afp`, the 64-bit temporal-energy fingerprint. Undecodable payloads
    * report `decoded = false` and no fingerprint. */
  final case class AudioFpRow(id: Long, kind: String, nBytes: Long,
      decoded: Boolean, sampleRate: Int, channels: Int, nFrames: Long,
      afp: Option[Long])

  /** The audio sibling of dHash: split the decoded sample stream into 65
    * equal time windows, take each window's mean absolute amplitude
    * (channels summed, floor integer division — deterministic, no floats),
    * and set bit i (0..63) iff window i is strictly LOUDER than window
    * i+1. Like dHash's gradient bits, the energy-envelope gradient
    * survives global volume scaling direction-wise and re-encoding of the
    * same PCM, which is what audio near-dup needs; 65 windows make every
    * bit a local comparison, so a small edit touches few bits.
    *
    * Decode is the JDK's own AudioSystem (WAV and AIFF containers, PCM
    * 8/16/24/32-bit plus IEEE-float 32/64-bit) or the pure-JVM
    * [[FlacDecoder]] for FLAC payloads — no external codec; 8-bit
    * WAV is unsigned per spec and gets centered, float samples map onto
    * the 16-bit integer lattice, and a lossless FLAC re-encode
    * fingerprints identically to its PCM twin (pairing at Hamming 0 in
    * the near-dup join — the compressed-vs-uncompressed duplicate case). Frame count is bounded by
    * min(header frame length, actually-available bytes / frame size): PCM
    * is stored 1:1, so unlike images there is no decompression bomb — a
    * lying header cannot make the decoder allocate more than the payload
    * that is already in the row — but the min keeps a truncated stream's
    * window assignment honest. Lossy encodings (MP3, a-law) take
    * the undecoded branch. */
  def audioFingerprintBatch(rows: Iterator[MediaRow]): Iterator[AudioFpRow] =
    rows.map { r =>
      val n = r.data.length.toLong
      decodeAudioFp(r.data) match {
        case Some((sr, ch, frames, fp)) =>
          AudioFpRow(r.id, r.kind, n, decoded = true, sr, ch, frames, Some(fp))
        case None =>
          AudioFpRow(r.id, r.kind, n, decoded = false, 0, 0, 0L, None)
      }
    }

  /** Map one IEEE-float sample's RAW BITS (already assembled little/big-
    * endian into `v`'s low 32 or 64 bits) onto the signed 16-bit integer
    * lattice: floor(f * 32768) clamped to [-32768, 32767], NaN -> 0.
    * Floor + clamp are deterministic IEEE ops, so the mapping — and every
    * fingerprint/stat downstream of it — is engine-portable. */
  @inline private def floatToLattice(v: Long, bits: Int): Long = {
    val f = if (bits == 32) java.lang.Float.intBitsToFloat(v.toInt).toDouble
      else java.lang.Double.longBitsToDouble(v)
    if (f.isNaN) 0L
    else math.max(-32768.0, math.min(32767.0, math.floor(f * 32768.0))).toLong
  }

  /** Open an audio payload as a PCM [[javax.sound.sampled.AudioInputStream]]:
    * FLAC decodes through the pure-JVM [[FlacDecoder]] (CONSTANT /
    * VERBATIM / FIXED / LPC subframes, CRC-verified frames, streamed one
    * FLAC frame at a time), everything else through the JDK's own
    * AudioSystem (WAV/AIFF). One adapter means fingerprints, quality
    * stats AND windowed sequence signatures all gain lossless-compressed
    * coverage through the exact streaming loops that serve PCM. Throws
    * for unsupported payloads — every caller catches and degrades. */
  private[multimodal] def openAudio(data: Array[Byte])
      : javax.sound.sampled.AudioInputStream =
    if (data.length >= 4 && data(0) == 'f' && data(1) == 'L' &&
        data(2) == 'a' && data(3) == 'C')
      FlacDecoder.audioInputStream(data).getOrElse(
        throw new javax.sound.sampled.UnsupportedAudioFileException(
          "unsupported FLAC stream"))
    else javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(data))

  /** (sampleRate, channels, frames, fingerprint) of a PCM or IEEE-float
    * WAV/AIFF payload or a FLAC payload ([[openAudio]]), or None for
    * anything neither decoder can read. */
  private[multimodal] def decodeAudioFp(data: Array[Byte])
      : Option[(Int, Int, Long, Long)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try openAudio(data)
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
      // IEEE-float WAV (format tag 3) decodes too: samples map onto the
      // 16-bit integer lattice (floor(f * 32768), clamped, NaN -> 0) so
      // every downstream window/stat stays exact integer arithmetic and a
      // float re-encode of the same program fingerprints like its PCM twin
      val isFloat = enc == AudioFormat.Encoding.PCM_FLOAT
      if (!(signed || unsigned || isFloat) || ch <= 0 || frameSize <= 0 ||
        !(if (isFloat) Seq(32, 64) else Seq(8, 16, 24, 32)).contains(bits) ||
        frameSize != ch * (bits / 8)) return None
      // honest frame count: the header's claim capped by the bytes that
      // are actually there (a truncated file must not skew the windows)
      val header = ais.getFrameLength
      val avail = ais.available().toLong / frameSize
      val nFrames = math.min(if (header > 0) header else Long.MaxValue, avail)
      if (nFrames <= 0) return None
      val bytesPer = bits / 8
      val big = fmt.isBigEndian
      val center = if (unsigned) 1L << (bits - 1) else 0L
      val sums = new Array[Long](65)
      val cnts = new Array[Long](65)
      val buf = new Array[Byte](frameSize * 1024)
      var frame = 0L
      var carry = 0 // bytes of a partial frame held over between reads
      var done = false
      while (!done && frame < nFrames) {
        val got = ais.read(buf, carry, buf.length - carry)
        if (got <= 0) done = true
        else {
          val total = carry + got
          val frames = total / frameSize
          var f = 0
          while (f < frames && frame < nFrames) {
            val base = f * frameSize
            var mixed = 0L
            var c = 0
            while (c < ch) {
              val off = base + c * bytesPer
              var v = 0L
              if (big) {
                // sign-extend from the leading byte, accumulate the rest
                v = buf(off).toLong
                var k = 1
                while (k < bytesPer) { v = (v << 8) | (buf(off + k) & 0xffL); k += 1 }
              } else {
                v = buf(off + bytesPer - 1).toLong
                var k = bytesPer - 2
                while (k >= 0) { v = (v << 8) | (buf(off + k) & 0xffL); k -= 1 }
              }
              // 8-bit PCM carries no sign bit convention of its own in
              // WAV — it is unsigned; center it (and any PCM_UNSIGNED)
              if (isFloat) v = floatToLattice(v, bits)
              else if (unsigned) v = (v & ((1L << bits) - 1)) - center
              mixed += v
              c += 1
            }
            val w = (frame * 65L / nFrames).toInt
            sums(w) += math.abs(mixed)
            cnts(w) += 1
            frame += 1
            f += 1
          }
          carry = total - frames * frameSize
          if (carry > 0) System.arraycopy(buf, frames * frameSize, buf, 0, carry)
        }
      }
      if (frame == 0) return None
      // floor means keep every later compare inside Long no matter how
      // long the clip is (cross products of raw sums could overflow)
      val mean = (0 until 65).map(i =>
        if (cnts(i) == 0) 0L else sums(i) / cnts(i))
      var bitsOut = 0L
      var i = 0
      while (i < 64) {
        if (mean(i) > mean(i + 1)) bitsOut |= 1L << i
        i += 1
      }
      Some((fmt.getSampleRate.toInt, ch, frame, bitsOut))
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** One audio payload's quality-statistics row ([[audioStats]]) — the
    * gating signals an audio-corpus curation pass filters on, all exact
    * integers: `durationMs` = frames*1000/rate (floor), `peak` = max
    * per-channel |sample|, `absSum` over every sample of every channel
    * (mean level without committing to a rounding), `nSilence` = frames
    * where EVERY channel is exactly 0 (digital silence — a dead upload or
    * padding), `nClipped` = frames where ANY channel sits at the format's
    * representable extreme (±full scale — hard clipping). */
  final case class AudioStatsRow(id: Long, kind: String, nBytes: Long,
      decoded: Boolean, sampleRate: Int, channels: Int, nFrames: Long,
      durationMs: Long, peak: Long, absSum: Long, nSilence: Long,
      nClipped: Long)

  /** Per-partition audio quality statistics — the audio sibling of
    * [[imageStatsBatch]], same PCM decode contract as
    * [[audioFingerprintBatch]] (WAV/AIFF/FLAC, integer PCM, honest frame
    * count, refuse-don't-crash). One streaming pass, O(buffer) memory. */
  def audioStatsBatch(rows: Iterator[MediaRow]): Iterator[AudioStatsRow] =
    rows.map { r =>
      val n = r.data.length.toLong
      decodeAudioStats(r.data) match {
        case Some(s) => s.copy(id = r.id, kind = r.kind, nBytes = n)
        case None => AudioStatsRow(r.id, r.kind, n, decoded = false,
          0, 0, 0L, 0L, 0L, 0L, 0L, 0L)
      }
    }

  private def decodeAudioStats(data: Array[Byte]): Option[AudioStatsRow] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try openAudio(data)
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
      val isFloat = enc == AudioFormat.Encoding.PCM_FLOAT // see decodeAudioFp
      if (!(signed || unsigned || isFloat) || ch <= 0 || frameSize <= 0 ||
        !(if (isFloat) Seq(32, 64) else Seq(8, 16, 24, 32)).contains(bits) ||
        frameSize != ch * (bits / 8)) return None
      val header = ais.getFrameLength
      val avail = ais.available().toLong / frameSize
      val nFrames = math.min(if (header > 0) header else Long.MaxValue, avail)
      if (nFrames <= 0) return None
      val bytesPer = bits / 8
      val big = fmt.isBigEndian
      val center = if (unsigned) 1L << (bits - 1) else 0L
      // representable extremes AFTER centering: [-2^(b-1), 2^(b-1)-1];
      // float samples live on the 16-bit lattice, so |f| >= 1.0 clamps to
      // exactly these extremes — the clipping gate falls out unchanged
      val hi = if (isFloat) 32767L else (1L << (bits - 1)) - 1
      val lo = if (isFloat) -32768L else -(1L << (bits - 1))
      val buf = new Array[Byte](frameSize * 1024)
      var frame = 0L
      var carry = 0
      var peak = 0L
      var absSum = 0L
      var nSilence = 0L
      var nClipped = 0L
      var done = false
      while (!done && frame < nFrames) {
        val got = ais.read(buf, carry, buf.length - carry)
        if (got <= 0) done = true
        else {
          val total = carry + got
          val frames = total / frameSize
          var f = 0
          while (f < frames && frame < nFrames) {
            val base = f * frameSize
            var allZero = true
            var clipped = false
            var c = 0
            while (c < ch) {
              val off = base + c * bytesPer
              var v = 0L
              if (big) {
                v = buf(off).toLong
                var k = 1
                while (k < bytesPer) { v = (v << 8) | (buf(off + k) & 0xffL); k += 1 }
              } else {
                v = buf(off + bytesPer - 1).toLong
                var k = bytesPer - 2
                while (k >= 0) { v = (v << 8) | (buf(off + k) & 0xffL); k -= 1 }
              }
              if (isFloat) v = floatToLattice(v, bits)
              else if (unsigned) v = (v & ((1L << bits) - 1)) - center
              val a = math.abs(v)
              if (a > peak) peak = a
              absSum += a
              if (v != 0L) allZero = false
              if (v == hi || v == lo) clipped = true
              c += 1
            }
            if (allZero) nSilence += 1
            if (clipped) nClipped += 1
            frame += 1
            f += 1
          }
          carry = total - frames * frameSize
          if (carry > 0) System.arraycopy(buf, frames * frameSize, buf, 0, carry)
        }
      }
      if (frame == 0) return None
      val rate = fmt.getSampleRate.toInt
      Some(AudioStatsRow(0L, "", 0L, decoded = true, rate, ch, frame,
        if (rate > 0) frame * 1000L / rate else 0L, peak, absSum,
        nSilence, nClipped))
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** One audio payload's COMBINED fingerprint + quality row
    * ([[audioSignals]]): [[AudioFpRow]]'s and [[AudioStatsRow]]'s fields,
    * bit-identical, from one decode pass. */
  final case class AudioSignalsRow(id: Long, kind: String, nBytes: Long,
      decoded: Boolean, sampleRate: Int, channels: Int, nFrames: Long,
      afp: Option[Long], durationMs: Long, peak: Long, absSum: Long,
      nSilence: Long, nClipped: Long)

  /** ONE decode pass serving BOTH the audio near-dup front end and the
    * quality gates — for pipelines (the multimodal flagship) that need
    * [[audioFingerprint]] AND [[audioStats]] over the same corpus: the
    * sample stream decodes ONCE and folds into the 65-window energy
    * envelope and the peak/absSum/silence/clipping counters in the same
    * per-frame walk. Same decode contract ([[openAudio]]: WAV/AIFF/FLAC,
    * integer PCM + IEEE-float lattice, honest frame counts), same
    * refuse-don't-crash degrade; fields equal the two separate operators'
    * outputs bit-for-bit (spec-asserted). */
  def audioSignals(media: DataFrame): Dataset[AudioSignalsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      decodeAudioSignals(r.data) match {
        case Some(s) => s.copy(id = r.id, kind = r.kind,
          nBytes = r.data.length.toLong)
        case None => AudioSignalsRow(r.id, r.kind, r.data.length.toLong,
          decoded = false, 0, 0, 0L, None, 0L, 0L, 0L, 0L, 0L)
      }
    })
  }

  private def decodeAudioSignals(data: Array[Byte]): Option[AudioSignalsRow] = {
    import javax.sound.sampled.AudioFormat
    val ais =
      try openAudio(data)
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
      val isFloat = enc == AudioFormat.Encoding.PCM_FLOAT
      if (!(signed || unsigned || isFloat) || ch <= 0 || frameSize <= 0 ||
        !(if (isFloat) Seq(32, 64) else Seq(8, 16, 24, 32)).contains(bits) ||
        frameSize != ch * (bits / 8)) return None
      val header = ais.getFrameLength
      val avail = ais.available().toLong / frameSize
      val nFrames = math.min(if (header > 0) header else Long.MaxValue, avail)
      if (nFrames <= 0) return None
      val bytesPer = bits / 8
      val big = fmt.isBigEndian
      val center = if (unsigned) 1L << (bits - 1) else 0L
      val hi = if (isFloat) 32767L else (1L << (bits - 1)) - 1
      val lo = if (isFloat) -32768L else -(1L << (bits - 1))
      val sums = new Array[Long](65)
      val cnts = new Array[Long](65)
      val buf = new Array[Byte](frameSize * 1024)
      var frame = 0L
      var carry = 0
      var peak = 0L
      var absSum = 0L
      var nSilence = 0L
      var nClipped = 0L
      var done = false
      while (!done && frame < nFrames) {
        val got = ais.read(buf, carry, buf.length - carry)
        if (got <= 0) done = true
        else {
          val total = carry + got
          val frames = total / frameSize
          var f = 0
          while (f < frames && frame < nFrames) {
            val base = f * frameSize
            var allZero = true
            var clipped = false
            var mixed = 0L
            var c = 0
            while (c < ch) {
              val off = base + c * bytesPer
              var v = 0L
              if (big) {
                v = buf(off).toLong
                var k = 1
                while (k < bytesPer) { v = (v << 8) | (buf(off + k) & 0xffL); k += 1 }
              } else {
                v = buf(off + bytesPer - 1).toLong
                var k = bytesPer - 2
                while (k >= 0) { v = (v << 8) | (buf(off + k) & 0xffL); k -= 1 }
              }
              if (isFloat) v = floatToLattice(v, bits)
              else if (unsigned) v = (v & ((1L << bits) - 1)) - center
              val a = math.abs(v)
              if (a > peak) peak = a
              absSum += a
              if (v != 0L) allZero = false
              if (v == hi || v == lo) clipped = true
              mixed += v
              c += 1
            }
            if (allZero) nSilence += 1
            if (clipped) nClipped += 1
            val w = (frame * 65L / nFrames).toInt
            sums(w) += math.abs(mixed)
            cnts(w) += 1
            frame += 1
            f += 1
          }
          carry = total - frames * frameSize
          if (carry > 0) System.arraycopy(buf, frames * frameSize, buf, 0, carry)
        }
      }
      if (frame == 0) return None
      val mean = (0 until 65).map(i =>
        if (cnts(i) == 0) 0L else sums(i) / cnts(i))
      var bitsOut = 0L
      var i = 0
      while (i < 64) {
        if (mean(i) > mean(i + 1)) bitsOut |= 1L << i
        i += 1
      }
      val rate = fmt.getSampleRate.toInt
      Some(AudioSignalsRow(0L, "", 0L, decoded = true, rate, ch, frame,
        Some(bitsOut), if (rate > 0) frame * 1000L / rate else 0L,
        peak, absSum, nSilence, nClipped))
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** Frame form of [[audioStatsBatch]]. */
  def audioStats(media: DataFrame): Dataset[AudioStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(audioStatsBatch)
  }

  /** Audio fingerprinting over a binary media frame (id, kind, data):
    * (id, kind, nBytes, decoded, sampleRate, channels, nFrames, afp). A
    * narrow mapPartitions at the codec boundary — no shuffle, O(1) state
    * beyond one read buffer per row (the stream is windowed on the fly,
    * never materialized). Feed `afp` to
    * [[graft.operators.Dedup.hammingPairs]] for audio near-dup pairs, the
    * same join that serves text SimHash and image dHash. */
  def audioFingerprint(media: DataFrame): Dataset[AudioFpRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(audioFingerprintBatch)
  }

  /** Text metadata parsed from an ID3v2 tag ([[audioTags]]). */
  final case class AudioTagRow(id: Long, kind: String, nBytes: Long,
      hasTags: Boolean, title: Option[String], artist: Option[String],
      album: Option[String])

  /** Parse the title/artist/album TEXT frames (TIT2/TPE1/TALB — or their
    * three-letter v2.2 ancestors TT2/TP1/TAL, mapped to the modern
    * names) of an ID3v2.2/2.3/2.4 tag — the metadata an audio-corpus curation pass groups,
    * caps, and dedups by (per-artist caps are the audio twin of
    * per-domain caps). Layout per the published id3.org spec: 10-byte
    * header (`ID3`, version, flags, syncsafe 28-bit size), then frames of
    * [4-char id, size (v2.4 syncsafe / v2.3 plain u32), 2 flag bytes,
    * payload]; a text frame's payload is one encoding byte (0 =
    * ISO-8859-1, 1 = UTF-16 with BOM, 2 = UTF-16BE, 3 = UTF-8) followed
    * by the string, optionally NUL-terminated. Every read is
    * bounds-checked; corrupt tags degrade to None, never throw. Frames
    * the parser does not understand are skipped by size — real tags carry
    * dozens of frame types, and a curation pass must not refuse a file
    * over an APIC art blob. */
  /** Reverse ID3v2 unsynchronisation over `[from, until)`: every on-disk
    * `FF 00` byte pair decodes back to the single `FF` the scheme
    * inserted the `00` after (so MPEG decoders never see a false sync
    * inside the tag). Output is at most the input's length — no
    * amplification is possible. */
  private def deunsync(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, until - from))
    var i = from
    while (i < until) {
      out.write(b(i))
      if ((b(i) & 0xff) == 0xff && i + 1 < until && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  def parseId3Tags(data: Array[Byte]): Option[Map[String, String]] = {
    if (data.length < 10 || data(0) != 'I' || data(1) != 'D' || data(2) != '3')
      return None
    val ver = data(3) & 0xff // 2 = v2.2, 3 = v2.3, 4 = v2.4
    if (ver < 2 || ver > 4) return None
    val flags = data(5) & 0xff
    val globalUnsync = (flags & 0x80) != 0
    // in v2.2 flag 0x40 means COMPRESSION, undefined scheme — the spec's
    // own advice is to ignore such a tag entirely; v2.3/2.4 use it for
    // the extended header handled below
    if (ver == 2 && (flags & 0x40) != 0) return None
    val hasExt = ver >= 3 && (flags & 0x40) != 0
    def ssz(b: Array[Byte], i: Int): Int =
      ((b(i) & 0x7f) << 21) | ((b(i + 1) & 0x7f) << 14) |
        ((b(i + 2) & 0x7f) << 7) | (b(i + 3) & 0x7f)
    val end = math.min(10L + ssz(data, 6), data.length.toLong).toInt
    // v2.3 unsynchronisation applies to the WHOLE tag body (frame headers
    // included), so decode it first and parse the decoded buffer; v2.4's
    // is per-frame (syncsafe frame sizes carry no false syncs by
    // construction) and each payload decodes at its frame below
    val buf =
      if (ver <= 3 && globalUnsync) deunsync(data, 10, end)
      else java.util.Arrays.copyOfRange(data, 10, math.max(10, end))
    def u8(i: Int): Int = buf(i) & 0xff
    var i = 0
    // extended header (flag 0x40): skip by its size field — v2.4's is
    // syncsafe and INCLUDES its own bytes (minimum 6), v2.3's is a plain
    // u32 EXCLUDING its own 4 size bytes (6 or 10 by spec)
    if (hasExt) {
      if (buf.length < 4) return None
      if (ver == 4) {
        val es = ssz(buf, 0)
        if (es < 6 || es > buf.length) return None
        i = es
      } else {
        val es = (u8(0).toLong << 24) | (u8(1) << 16) | (u8(2) << 8) | u8(3)
        if (es < 0 || 4L + es > buf.length) return None
        i = (4L + es).toInt
      }
    }
    // v2.2 frames are 6-byte headers (3-char id + 24-bit size) with the
    // three-letter ancestors of the text frames; map to the v2.3+ names
    val hdrLen = if (ver == 2) 6 else 10
    val idLen = if (ver == 2) 3 else 4
    val wanted =
      if (ver == 2) Map("TT2" -> "TIT2", "TP1" -> "TPE1", "TAL" -> "TALB")
      else Map("TIT2" -> "TIT2", "TPE1" -> "TPE1", "TALB" -> "TALB")
    val out = scala.collection.mutable.Map[String, String]()
    while (i + hdrLen <= buf.length) {
      val id = new String(buf, i, idLen, java.nio.charset.StandardCharsets.US_ASCII)
      if (!id.forall(c => c.isUpper || c.isDigit)) return wrap(out) // padding
      val size =
        if (ver == 4) ssz(buf, i + 4)
        else if (ver == 2) (u8(i + 3) << 16) | (u8(i + 4) << 8) | u8(i + 5)
        else ((u8(i + 4) << 24) | (u8(i + 5) << 16) | (u8(i + 6) << 8) | u8(i + 7))
      if (size < 0 || i + hdrLen + size > buf.length) return wrap(out)
      if (wanted.contains(id) && size >= 1) {
        val fmtFlags = if (ver == 2) 0 else u8(i + 9)
        val p = i + hdrLen
        // v2.4 per-frame unsynchronisation (format flag 0x02, implied for
        // every frame by the global header flag): decode the payload; the
        // frame size field counts the ON-DISK (synced) bytes either way
        val body0 =
          if (ver == 4 && ((fmtFlags & 0x02) != 0 || globalUnsync))
            deunsync(buf, p, p + size)
          else java.util.Arrays.copyOfRange(buf, p, p + size)
        // v2.4 data-length indicator (format flag 0x01): 4 syncsafe bytes
        // of pre-unsync length prefix the payload — skip, don't decode
        val dli = if (ver == 4 && (fmtFlags & 0x01) != 0) 4 else 0
        if (body0.length > dli) {
          val enc = body0(dli) & 0xff
          val body = java.util.Arrays.copyOfRange(body0, dli + 1, body0.length)
          val text = enc match {
            case 0 => new String(body, java.nio.charset.StandardCharsets.ISO_8859_1)
            case 1 => new String(body, java.nio.charset.StandardCharsets.UTF_16)
            case 2 => new String(body, java.nio.charset.StandardCharsets.UTF_16BE)
            case 3 => new String(body, java.nio.charset.StandardCharsets.UTF_8)
            case _ => ""
          }
          val clean = text.takeWhile(_ != '\u0000').trim
          if (clean.nonEmpty) out(wanted(id)) = clean
        }
      }
      i += hdrLen + size
    }
    wrap(out)
  }

  private def wrap(m: scala.collection.mutable.Map[String, String])
      : Option[Map[String, String]] =
    if (m.isEmpty) None else Some(m.toMap)

  /** ID3 text metadata over a binary media frame — a narrow mapPartitions
    * at the codec boundary like every decode here; payloads without a
    * parseable tag report `hasTags = false` with null text columns, so
    * downstream group-bys and caps see every row. */
  def audioTags(media: DataFrame): Dataset[AudioTagRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      parseId3Tags(r.data) match {
        case Some(t) => AudioTagRow(r.id, r.kind, r.data.length.toLong,
          hasTags = true, t.get("TIT2"), t.get("TPE1"), t.get("TALB"))
        case None => AudioTagRow(r.id, r.kind, r.data.length.toLong,
          hasTags = false, None, None, None)
      }
    })
  }

  /** One time-window's signature row ([[audioSeqSignatures]]). Undecodable
    * payloads emit a single `decoded = false` marker row. */
  final case class AudioSeqRow(id: Long, kind: String, nBytes: Long,
      decoded: Boolean, sampleRate: Int, channels: Int, window_idx: Int,
      sig: Option[Long])

  /** Windowed audio SEQUENCE signatures — the audio twin of per-frame
    * video hashes, for CONTAINMENT and partial-overlap detection that one
    * whole-clip fingerprint structurally cannot see (a 3-second jingle
    * inside an hour of audio dilutes the global energy envelope to
    * nothing): the sample stream splits into fixed `windowMs` time
    * windows, and each COMPLETE window gets its own 64-bit energy-gradient
    * signature (the [[audioFingerprintBatch]] recipe — 65 equal
    * sub-buckets, floor-mean absolute amplitude, bit i = bucket i strictly
    * louder than i+1 — applied per window; the trailing partial window is
    * dropped so every emitted signature is a pure function of exactly
    * `windowMs` of audio, and a copy trimmed by whole windows matches the
    * original's remaining windows bit-for-bit on a shifted diagonal).
    * Feed (id, window_idx, sig) to
    * [[graft.operators.Dedup.frameSigPairs]] /
    * [[graft.operators.Dedup.incrementalFrameSigPairs]] — the same
    * sequence-signature joins and persisted index that serve video frames.
    *
    * Decode contract identical to [[audioFingerprintBatch]]: WAV/AIFF/FLAC,
    * integer PCM 8/16/24/32 and IEEE-float 32/64 via the 16-bit lattice,
    * honest frame count, refuse-don't-crash. One O(buffer + 65) streaming
    * pass per row — window state never exceeds the 65 sub-bucket
    * accumulators however long the clip. */
  def audioSeqSignatures(media: DataFrame, windowMs: Long)
      : Dataset[AudioSeqRow] = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val n = r.data.length.toLong
      decodeAudioSeq(r.data, windowMs) match {
        case Some((sr, ch, sigs)) if sigs.nonEmpty =>
          sigs.iterator.zipWithIndex.map { case (sig, w) =>
            AudioSeqRow(r.id, r.kind, n, decoded = true, sr, ch, w, Some(sig))
          }
        case _ =>
          Iterator.single(AudioSeqRow(r.id, r.kind, n, decoded = false,
            0, 0, 0, None))
      }
    })
  }

  /** (sampleRate, channels, per-complete-window signatures) of a PCM or
    * IEEE-float payload, or None for anything AudioSystem cannot read. */
  private[multimodal] def decodeAudioSeq(data: Array[Byte], windowMs: Long)
      : Option[(Int, Int, IndexedSeq[Long])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try openAudio(data)
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
      val isFloat = enc == AudioFormat.Encoding.PCM_FLOAT
      if (!(signed || unsigned || isFloat) || ch <= 0 || frameSize <= 0 ||
        !(if (isFloat) Seq(32, 64) else Seq(8, 16, 24, 32)).contains(bits) ||
        frameSize != ch * (bits / 8)) return None
      val rate = fmt.getSampleRate.toInt
      if (rate <= 0) return None
      // frames per window, floor — a window shorter than its 65 buckets
      // cannot carry a meaningful gradient
      val spw = rate.toLong * windowMs / 1000L
      if (spw < 65) return None
      val header = ais.getFrameLength
      val avail = ais.available().toLong / frameSize
      val nFrames = math.min(if (header > 0) header else Long.MaxValue, avail)
      if (nFrames <= 0) return None
      val bytesPer = bits / 8
      val big = fmt.isBigEndian
      val center = if (unsigned) 1L << (bits - 1) else 0L
      val sigs = scala.collection.mutable.ArrayBuffer[Long]()
      val sums = new Array[Long](65)
      val cnts = new Array[Long](65)
      def flushWindow(): Unit = {
        val mean = (0 until 65).map(i =>
          if (cnts(i) == 0) 0L else sums(i) / cnts(i))
        var bitsOut = 0L
        var i = 0
        while (i < 64) {
          if (mean(i) > mean(i + 1)) bitsOut |= 1L << i
          i += 1
        }
        sigs += bitsOut
        java.util.Arrays.fill(sums, 0L)
        java.util.Arrays.fill(cnts, 0L)
      }
      val buf = new Array[Byte](frameSize * 1024)
      var frame = 0L
      var carry = 0
      var done = false
      while (!done && frame < nFrames) {
        val got = ais.read(buf, carry, buf.length - carry)
        if (got <= 0) done = true
        else {
          val total = carry + got
          val frames = total / frameSize
          var f = 0
          while (f < frames && frame < nFrames) {
            val base = f * frameSize
            var mixed = 0L
            var c = 0
            while (c < ch) {
              val off = base + c * bytesPer
              var v = 0L
              if (big) {
                v = buf(off).toLong
                var k = 1
                while (k < bytesPer) { v = (v << 8) | (buf(off + k) & 0xffL); k += 1 }
              } else {
                v = buf(off + bytesPer - 1).toLong
                var k = bytesPer - 2
                while (k >= 0) { v = (v << 8) | (buf(off + k) & 0xffL); k -= 1 }
              }
              if (isFloat) v = floatToLattice(v, bits)
              else if (unsigned) v = (v & ((1L << bits) - 1)) - center
              mixed += v
              c += 1
            }
            val inWin = frame % spw
            val b = (inWin * 65L / spw).toInt
            sums(b) += math.abs(mixed)
            cnts(b) += 1
            frame += 1
            if (inWin == spw - 1) flushWindow() // window complete
            f += 1
          }
          carry = total - frames * frameSize
          if (carry > 0) System.arraycopy(buf, frames * frameSize, buf, 0, carry)
        }
      }
      // the trailing PARTIAL window is dropped by design (no flush)
      Some((rate, ch, sigs.toIndexedSeq))
    } catch { case _: Exception => None }
    finally ais.close()
  }
}
