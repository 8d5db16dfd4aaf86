package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/mp4_codecs.parquet` — committed ground
  * truth for the q_mp4_codecs oracle: per-track codec identity with
  * H.264 SPS-true profile/level/dimensions.
  *
  * The SPS payloads are written HERE by an independent Exp-Golomb writer
  * (the [[FlacTestEncoder]] discipline: a standalone re-statement of the
  * published syntax, never the engine's code), over CHOSEN parameters;
  * expected width/height come from those parameters through the published
  * crop formulas. Coverage: baseline/main/high profiles, the high-profile
  * chroma block, a present scaling matrix that must be skipped correctly,
  * both pic_order_cnt_type layouts, interlaced (frame_mbs_only = 0)
  * double-height with mb_adaptive, 4:2:2 and monochrome crop units, and
  * an SPS whose RBSP forces an emulation-prevention 0x03 the parser must
  * strip. Refusal rows: a truncated avcC (codec fourcc survives, SPS
  * refused), an HEVC entry (fourcc-only by design), the existing MJPEG
  * builder's 'jpeg' entry, and garbage.
  *
  * Run once: `sbt "Test/runMain graft.GenMp4CodecFixture"`, commit the
  * parquet. */
object GenMp4CodecFixture {
  import GenMp4Fixture.{be16, be32, box, cc, full}

  /** MSB-first bit writer with ue/se Exp-Golomb. */
  final class SpsWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def u(v: Int, k: Int): Unit = (k - 1 to 0 by -1).foreach { i =>
      acc = (acc << 1) | ((v >> i) & 1)
      n += 1
      if (n == 8) { out.write(acc); acc = 0; n = 0 }
    }
    def ue(v: Int): Unit = {
      val z = 32 - Integer.numberOfLeadingZeros(v + 1) - 1
      u(0, z); u(v + 1, z + 1)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits + emulation prevention + NAL header. */
    def nal(): Array[Byte] = {
      u(1, 1)
      while (n != 0) u(0, 1)
      val rbsp = out.toByteArray
      val esc = new java.io.ByteArrayOutputStream()
      esc.write(0x67) // nal_ref_idc 3, type 7 (SPS)
      var zeros = 0
      rbsp.foreach { b0 =>
        val b = b0 & 0xff
        if (zeros >= 2 && b <= 3) { esc.write(3); zeros = 0 }
        esc.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      esc.toByteArray
    }
  }

  final case class SpsParams(profile: Int, level: Int, chroma: Int = 1,
      scalingMatrix: Boolean = false, pocType: Int = 0, pocOffset: Int = 2,
      widthMbs: Int, heightUnits: Int, fmo: Int = 1,
      crop: (Int, Int, Int, Int) = (0, 0, 0, 0))

  def buildSps(p: SpsParams): Array[Byte] = {
    val w = new SpsWriter
    w.u(p.profile, 8)
    w.u(0, 8)          // constraint flags
    w.u(p.level, 8)
    w.ue(0)            // seq_parameter_set_id
    val highProfiles =
      Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
    if (highProfiles(p.profile)) {
      w.ue(p.chroma)
      if (p.chroma == 3) w.u(0, 1) // separate_colour_plane_flag
      w.ue(0); w.ue(0); w.u(0, 1)  // 8-bit depths, no transform bypass
      w.u(if (p.scalingMatrix) 1 else 0, 1)
      if (p.scalingMatrix) {
        // list 0 present with a real delta sequence, list 1 present but
        // ending in next_scale = 0 (use-default), the rest absent
        w.u(1, 1)
        (0 until 16).foreach(_ => w.se(1)) // nextScale walks 9, 10, ...
        w.u(1, 1)
        w.se(-8)                           // nextScale -> 0: default list
        (0 until 6).foreach(_ => w.u(0, 1))
      }
    }
    w.ue(4) // log2_max_frame_num_minus4
    w.ue(p.pocType)
    p.pocType match {
      case 0 => w.ue(4)
      case 1 =>
        w.u(0, 1); w.se(p.pocOffset); w.se(-2); w.ue(3)
        Seq(1, -1, 2).foreach(w.se)
      case _ => ()
    }
    w.ue(2); w.u(0, 1) // max_num_ref_frames, gaps flag
    w.ue(p.widthMbs - 1)
    w.ue(p.heightUnits - 1)
    w.u(p.fmo, 1)
    if (p.fmo == 0) w.u(1, 1) // mb_adaptive_frame_field_flag
    w.u(1, 1)                 // direct_8x8_inference
    val (cl, cr, ct, cb) = p.crop
    if (cl + cr + ct + cb > 0) {
      w.u(1, 1); w.ue(cl); w.ue(cr); w.ue(ct); w.ue(cb)
    } else w.u(0, 1)
    w.u(0, 1) // vui_parameters_present = 0
    w.nal()
  }

  /** Expected coded dimensions from the CHOSEN parameters (published crop
    * formulas, standalone). */
  def expectedDims(p: SpsParams): (Int, Int) = {
    val (cux, cuy) = p.chroma match {
      case 0 => (1, 2 - p.fmo)
      case 1 => (2, 2 * (2 - p.fmo))
      case 2 => (2, 2 - p.fmo)
      case _ => (1, 2 - p.fmo)
    }
    val (cl, cr, ct, cb) = p.crop
    (p.widthMbs * 16 - cux * (cl + cr),
      (2 - p.fmo) * p.heightUnits * 16 - cuy * (ct + cb))
  }

  def avcC(sps: Array[Byte]): Array[Byte] = box("avcC",
    Array[Byte](1, sps(1), sps(2), sps(3), 0xff.toByte, 0xe1.toByte),
    be16(sps.length), sps, Array[Byte](0)) // numPPS = 0

  /** Minimal MP4 with one video track whose stsd entry is `fourccName`
    * carrying the given child boxes. */
  def mp4With(fourccName: String, children: Array[Byte],
      extraTrak: Option[Array[Byte]] = None): Array[Byte] = {
    val entry = box(fourccName,
      Array.fill[Byte](6)(0), be16(1),
      be16(0), be16(0), Array.fill[Byte](12)(0),
      be16(320), be16(240), be32(0x00480000), be32(0x00480000),
      be32(0), be16(1), Array.fill[Byte](32)(0),
      be16(24), be16(0xffff), children)
    val stsd = full("stsd", 0, be32(1), entry)
    val stbl = box("stbl", stsd)
    val minf = box("minf", box("dinf", full("dref", 0, be32(1),
      full("url ", 1))), stbl)
    val hdlr = full("hdlr", 0, be32(0), cc("vide"),
      Array.fill[Byte](12)(0), "vh".getBytes("US-ASCII") :+ 0.toByte)
    val mdhd = full("mdhd", 0, be32(0), be32(0), be32(1000), be32(1000),
      be16(0x55c4), be16(0))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val tkhd = full("tkhd", 7, be32(0), be32(0), be32(1), be32(0), be32(1000),
      Array.fill[Byte](8)(0), be16(0), be16(0), be16(0), be16(0),
      be32(0x00010000), be32(0), be32(0), be32(0), be32(0x00010000),
      be32(0), be32(0), be32(0), be32(0x40000000),
      be32(320L << 16), be32(240L << 16))
    val trak = box("trak", tkhd, mdia)
    val moov = extraTrak.fold(box("moov", trak))(t2 => box("moov", trak, t2))
    box("ftyp", cc("isom"), be32(0)) ++ moov
  }

  final case class Row(media_id: Long, kind: String, data: Array[Byte],
      parsed: Boolean, track: Int, codec: String, is_video: Boolean,
      profile: Option[Int], level: Option[Int],
      sps_width: Option[Int], sps_height: Option[Int])

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-mp4-codec-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    def avcRow(id: Long, p: SpsParams): (Row, Array[Byte]) = {
      val sps = buildSps(p)
      val (w, h) = expectedDims(p)
      (Row(id, "mp4", mp4With("avc1", avcC(sps)), parsed = true, 1, "avc1",
        is_video = true, Some(p.profile), Some(p.level), Some(w), Some(h)),
        sps)
    }

    val cases = Seq(
      // 1: baseline 1080p (the classic 1088-coded, 8px bottom crop)
      1L -> SpsParams(66, 40, widthMbs = 120, heightUnits = 68,
        crop = (0, 0, 0, 4)),
      // 2: high profile 720p, explicit chroma block, no crop
      2L -> SpsParams(100, 31, widthMbs = 80, heightUnits = 45),
      // 3: high profile with a PRESENT scaling matrix to skip
      3L -> SpsParams(100, 30, scalingMatrix = true, widthMbs = 40,
        heightUnits = 23, crop = (0, 0, 0, 4)),
      // 4: interlaced main profile (frame_mbs_only = 0): double height,
      //    crop units doubled too
      4L -> SpsParams(77, 32, pocType = 1, widthMbs = 90, heightUnits = 34,
        fmo = 0, crop = (0, 0, 0, 2)),
      // 5: 4:2:2 (profile 122): CropUnitY = 1 at fmo = 1
      5L -> SpsParams(122, 41, chroma = 2, widthMbs = 45, heightUnits = 30,
        crop = (0, 2, 0, 3)),
      // 6: monochrome (chroma_format_idc 0): pixel-unit crops
      6L -> SpsParams(100, 21, chroma = 0, widthMbs = 20, heightUnits = 15,
        crop = (3, 2, 1, 1)))
    val avcRows = cases.map { case (id, p) => avcRow(id, p)._1 }

    // 7: an SPS whose RBSP REQUIRES emulation prevention: a huge
    // offset_for_non_ref_pic writes a 28-bit Exp-Golomb zero prefix —
    // at least three aligned zero bytes, so the writer MUST insert an
    // escape 0x03 the parser then strips
    def hasEscape(b: Array[Byte]): Boolean =
      b.sliding(3).exists(w => w(0) == 0 && w(1) == 0 && w(2) == 3)
    val emu = SpsParams(66, 10, pocType = 1, pocOffset = 1 << 27,
      widthMbs = 8, heightUnits = 8, crop = (1, 1, 0, 0))
    val emuRow = avcRow(7L, emu)._1

    val hevcRow = {
      val fakeHvcc = box("hvcC", Array.fill[Byte](23)(0))
      Row(8L, "mp4", mp4With("hev1", fakeHvcc), parsed = true, 1, "hev1",
        is_video = true, None, None, None, None)
    }
    val jpegRow = {
      val jp = (0 until 2).map(t =>
        GenVideoFixture.encodeJpeg(GenVideoFixture.framePx(5, t), 0.85f))
      Row(9L, "mp4", GenMp4Fixture.mp4(64, 48, 1000L, Seq(100L, 100L), jp,
        samplesPerChunk = 2, moovFirst = true, useCo64 = false,
        syncEvery = None), parsed = true, 1, "jpeg", is_video = true,
        None, None, None, None)
    }
    val truncatedAvcc = {
      // declared SPS length runs past the box: fourcc survives, SPS refuses
      val badAvcc = box("avcC",
        Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte),
        be16(1000), Array[Byte](0x67, 0x42))
      Row(10L, "mp4", mp4With("avc1", badAvcc), parsed = true, 1, "avc1",
        is_video = true, None, None, None, None)
    }
    val garbage = Row(11L, "bin",
      Array.tabulate[Byte](64)(i => (i * 13).toByte),
      parsed = false, 0, "", is_video = false, None, None, None, None)

    val rows = avcRows ++ Seq(emuRow, hevcRow, jpegRow, truncatedAvcc, garbage)

    // build-time assertion: the engine parser agrees with the chosen
    // parameters on every constructed SPS (including the emulation one)
    (cases.map(_._2) :+ emu).zipWithIndex.foreach { case (p, i) =>
      val got = graft.multimodal.Multimodal.parseSpsDims(buildSps(p))
      val (w, h) = expectedDims(p)
      require(got.contains((p.profile, p.level, w, h)),
        s"case $i: engine parsed $got, expected (${p.profile},${p.level},$w,$h)")
    }
    require(hasEscape(buildSps(emu)), "emulation case lost its 0x03")

    def writeOne(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
      val part = new java.io.File(out + ".dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(out + ".dir"))
    }
    writeOne(rows.toDF(), "fixtures/mp4_codecs.parquet")
    println(s"wrote fixtures/mp4_codecs.parquet with ${rows.size} rows")
    spark.stop()
  }
}
