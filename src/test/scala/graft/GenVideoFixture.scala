package graft

import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/video_mjpeg.parquet` (payloads +
  * expected container metadata) and `fixtures/video_frames.parquet`
  * (expected per-sampled-frame perceptual hashes) — committed ground truth
  * for the q_video_meta / q_video_frames / q_video_neardup oracles.
  *
  * Each decodable row is a REAL AVI/MJPEG container hand-built per the
  * published AVI 1.0 RIFF layout (no JDK AVI writer exists): `LIST hdrl`
  * (avih + `LIST strl`(strh `vids`/`MJPG` + strf BITMAPINFOHEADER)) +
  * `LIST movi` of `00dc` chunks, each chunk one JPEG frame written by the
  * JDK's own ImageIO JPEG encoder at an explicit quality. Expected frame
  * hashes are computed HERE from the pixels ImageIO decodes back out of
  * each JPEG payload (JPEG is lossy — the drawn array is NOT the decoded
  * array), with the hash arithmetic re-implemented standalone in
  * [[GenImagePhashFixture]], never by calling the engine; the engine's
  * hash-match therefore proves container walk + frame extraction + JPEG
  * decode + integer box-average + bit extraction end to end.
  *
  * Planted relationships (asserted below, at the sampled-frame level):
  *  - video 2 re-encodes video 1's exact pixel frames at a lower JPEG
  *    quality — every sampled frame pair lands within dHash Hamming 3
  *    (the re-encoded-copy case, alignment diagonal 0);
  *  - video 3 is video 1 trimmed by 5 source frames (the same JPEG
  *    BYTES, shifted) — its sampled frames match video 1's on diagonal 1
  *    (the trimmed-copy case);
  *  - video 4 is unrelated — no sampled frame within Hamming 3 of any
  *    other video's;
  *  - rows 5/6 are corrupt (truncated AVI, garbage) — the degrade-to-
  *    undecoded contract.
  *
  * Run once: `sbt "Test/runMain graft.GenVideoFixture"`, commit both
  * parquets. Deterministic: seeded content, fixed sizes, explicit JPEG
  * quality, one output file each. */
object GenVideoFixture {

  // ---- RIFF/AVI byte builder (independent of the engine's parser)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cc(s: String): Array[Byte] = {
    require(s.length == 4); s.getBytes("US-ASCII")
  }

  /** A RIFF chunk: fourcc + LE32 size + payload + pad byte when odd. */
  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] =
    cc(fourcc) ++ le32(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)

  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(listType) ++ payload)

  /** Hand-built AVI/MJPEG: one video stream, `frames` = JPEG payloads. */
  def avi(w: Int, h: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = chunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10) ++ // HASINDEX-less
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(usPerFrame) ++ le32(1000000L) ++ // scale/rate
        le32(0) ++ le32(frames.length) ++ le32(0) ++ le32(0xffffffffL) ++
        le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ cc("MJPG") ++
        le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length) ++ body
  }

  // ---- JPEG encode at an explicit quality + decode back to pixels

  def encodeJpeg(px: Array[Array[Int]], quality: Float): Array[Byte] = {
    ImageIO.setUseCache(false)
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new IIOImage(GenImagePhashFixture.toImage(px), null, null), p)
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Decode a JPEG payload back to a pixel array — the pixels the engine
    * will see (JPEG is lossy; expected hashes must come from THESE). */
  def decodePx(bytes: Array[Byte]): Array[Array[Int]] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "generator produced an undecodable JPEG")
    Array.tabulate(img.getHeight, img.getWidth)((y, x) => img.getRGB(x, y) & 0xffffff)
  }

  /** Frame `t` of a synthetic clip: the seeded test card with a bright
    * rectangle moving deterministically — enough inter-frame change that
    * different timestamps hash far apart, enough structure that dHash is
    * robust to JPEG re-encoding. */
  def framePx(seed: Int, t: Int): Array[Array[Int]] = {
    val bg = GenImagePhashFixture.drawCard(64, 48, seed)
    val x0 = (t * 7) % 44
    val y0 = (t * 5) % 32
    GenImagePhashFixture.brighten(bg, x0, y0, x0 + 18, y0 + 14, 70)
  }

  final case class MediaRowF(media_id: Long, kind: String, data: Array[Byte],
      container: String, width: Int, height: Int, duration_ms: Long,
      n_frames: Int,
      s_n_sampled: Int, s_n_decoded: Int, s_n_black: Int, s_n_flat: Int,
      s_luma_sum: Long, s_n_pixels: Long)
  final case class FrameRowF(media_id: Long, frame_idx: Int, ts_ms: Long,
      decoded: Boolean, ahash: Option[Long], dhash: Option[Long])

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-video-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    val UsPerFrame = 100000L // 10 fps
    val EveryMs = 500L       // the oracle queries' sampling cadence

    // v1: 12 source frames at quality 0.85; v2 = same pixels, quality 0.62
    val srcPx = (0 until 12).map(t => framePx(seed = 21, t))
    val v1Frames = srcPx.map(encodeJpeg(_, 0.85f))
    val v2Frames = srcPx.map(encodeJpeg(_, 0.62f))
    // v3: v1 trimmed by 5 source frames — identical JPEG bytes, shifted
    val v3Frames = v1Frames.drop(5)
    // v4: unrelated clip, different seed and motion phase
    val v4Frames = (0 until 10).map(t => framePx(seed = 77, t + 3))
      .map(encodeJpeg(_, 0.85f))

    // v7: the quality-gate clip — a normal frame plus planted BLACK
    // (solid 0 -> mean luma < 16) and FLAT (solid gray -> entropy 0)
    // frames at the sampled ticks (frames 5 and 9 of a 10-frame clip)
    def solid(v: Int): Array[Array[Int]] =
      Array.fill(48, 64)((v << 16) | (v << 8) | v)
    val v7Frames = (0 until 10).map {
      case 5 => encodeJpeg(solid(0), 0.85f)
      case 9 => encodeJpeg(solid(128), 0.85f)
      case t => encodeJpeg(framePx(seed = 55, t), 0.85f)
    }

    val videos = Seq(
      (1L, 64, 48, v1Frames),
      (2L, 64, 48, v2Frames),
      (3L, 64, 48, v3Frames),
      (4L, 64, 48, v4Frames),
      (7L, 64, 48, v7Frames))

    /** The sampling schedule (independent re-statement of the published
      * contract): one tick per EveryMs of duration, source frame =
      * floor(ts / frame period) clamped to the last present frame. */
    def schedule(frames: Seq[Array[Byte]]): Seq[(Int, Long, Array[Byte])] = {
      val durMs = frames.length.toLong * UsPerFrame / 1000L
      val n = (durMs / EveryMs + 1).toInt
      (0 until n).map { i =>
        val ts = i * EveryMs
        val fi = math.min(ts * 1000L / UsPerFrame, frames.length - 1L).toInt
        (i, ts, frames(fi))
      }
    }

    /** Per-video expected quality stats over the sampled frames — the
      * published gate definitions (mean luma < 16 = black, entropy <
      * 1000 millibits = flat), re-implemented standalone over the pixels
      * decoded back out of each sampled JPEG. */
    def expectedVideoStats(frames: Seq[Array[Byte]])
        : (Int, Int, Int, Int, Long, Long) = {
      val sampled = schedule(frames).map(t => decodePx(t._3))
      var nBlack = 0; var nFlat = 0; var lumaSum = 0L; var nPixels = 0L
      sampled.foreach { px =>
        val (total, sum, _, _, _, entMilli) =
          GenImagePhashFixture.expectedStats(px)
        if (sum < 16L * total) nBlack += 1
        if (entMilli < 1000L) nFlat += 1
        lumaSum += sum; nPixels += total
      }
      (sampled.size, sampled.size, nBlack, nFlat, lumaSum, nPixels)
    }

    val mediaRows = videos.map { case (id, w, h, frames) =>
      val (ns, nd, nb, nf, ls, np) = expectedVideoStats(frames)
      MediaRowF(id, "video", avi(w, h, UsPerFrame, frames), "avi", w, h,
        frames.length.toLong * UsPerFrame / 1000L, frames.length,
        ns, nd, nb, nf, ls, np)
    }
    val frameRows = videos.flatMap { case (id, _, _, frames) =>
      schedule(frames).map { case (i, ts, jpeg) =>
        val px = decodePx(jpeg)
        FrameRowF(id, i, ts, decoded = true,
          Some(GenImagePhashFixture.expectedAHash(px)),
          Some(GenImagePhashFixture.expectedDHash(px)))
      }
    }

    // corrupt rows: truncated AVI and plain garbage — undecoded stubs.
    // Expected container metadata follows the documented decodeAv stub
    // formulas; expected frames are the single undecoded marker row.
    def stubMeta(id: Long, data: Array[Byte]): MediaRowF =
      MediaRowF(id, "video", data, "opaque",
        16 + (data.length % 64), 16 + (data.length % 48),
        data.length % 10000L, 0, 0, 0, 0, 0, 0L, 0L)
    val corrupt = Seq(
      stubMeta(5L, mediaRows.head.data.take(60)),
      stubMeta(6L, Array.tabulate[Byte](97)(i => (i * 13).toByte)))
    val corruptFrames = corrupt.map(m =>
      FrameRowF(m.media_id, 0, 0L, decoded = false, None, None))

    // ---- planted-relationship asserts (generator-side hash arithmetic)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val byId = frameRows.groupBy(_.media_id)
    // re-encoded copy: frame-by-frame within hamming 3 on diagonal 0
    byId(1L).zip(byId(2L)).foreach { case (a, b) =>
      val d = ham(a.dhash.get, b.dhash.get)
      require(d <= 3, s"re-encode drifted to hamming $d at tick ${a.frame_idx}")
    }
    // trimmed copy: v3 tick j holds the same BYTES as v1 tick j+1
    require(byId(3L).size == 2 && byId(1L).size == 3)
    byId(3L).foreach { b =>
      val a = byId(1L).find(_.frame_idx == b.frame_idx + 1).get
      require(a.dhash == b.dhash,
        s"trimmed copy not byte-aligned at tick ${b.frame_idx}")
    }
    // unrelated: no v4/v7 sampled frame within hamming 3 of videos 1-3
    // (v7's planted flat/black frames carry the all-zero dhash the banded
    // join excludes by contract, so they cannot pair regardless)
    for (b <- byId(4L) ++ byId(7L).filter(_.dhash.get != 0L);
         a <- byId(1L) ++ byId(2L) ++ byId(3L))
      require(ham(a.dhash.get, b.dhash.get) > 3,
        s"unrelated clip collides: v${a.media_id}#${a.frame_idx} vs v${b.media_id}#${b.frame_idx}")
    // no degenerate all-zero signatures among the near-dup clips
    frameRows.filter(_.media_id <= 4L)
      .foreach(f => require(f.dhash.get != 0L && f.ahash.get != 0L))
    // the gate clip planted exactly one black and two flat sampled frames
    locally {
      val m = mediaRows.find(_.media_id == 7L).get
      require(m.s_n_black == 1 && m.s_n_flat == 2,
        s"v7 gates drifted: black=${m.s_n_black} flat=${m.s_n_flat}")
    }

    def writeOne(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
      val part = new java.io.File(out + ".dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    }
    writeOne((mediaRows ++ corrupt).toDF(), "fixtures/video_mjpeg.parquet")
    writeOne((frameRows ++ corruptFrames).toDF(), "fixtures/video_frames.parquet")
    println(s"wrote ${mediaRows.size + corrupt.size} media rows, " +
      s"${frameRows.size + corruptFrames.size} frame rows")
    spark.stop()
  }
}
