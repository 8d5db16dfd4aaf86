package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/ts_packets.parquet` — committed ground
  * truth for the q_ts_packets oracle. Each parseable row is a REAL MPEG
  * transport stream hand-built per the ISO/IEC 13818-1 framing (fixed
  * 188-byte packets: sync byte, PUSI, 13-bit PIDs, adaptation fields
  * carrying 33-bit 90 kHz PCRs, null-stuffing packets); expected columns
  * are the packet/PID/PCR values the generator chose. A garbage tail
  * locks the stop-at-lattice-break contract. Run once:
  * `sbt "Test/runMain graft.GenTsFixture"`, commit the parquet. */
object GenTsFixture {

  /** One 188-byte packet. `pcrBase` >= 0 writes an adaptation field
    * carrying that PCR; payload is deterministic filler. */
  def packet(pid: Int, pusi: Boolean, cc: Int, pcrBase: Long = -1L): Array[Byte] = {
    val b = new Array[Byte](188)
    b(0) = 0x47
    b(1) = (((if (pusi) 1 else 0) << 6) | ((pid >> 8) & 0x1f)).toByte
    b(2) = (pid & 0xff).toByte
    val hasAf = pcrBase >= 0
    b(3) = ((((if (hasAf) 3 else 1) & 0x3) << 4) | (cc & 0xf)).toByte
    var p = 4
    if (hasAf) {
      b(4) = 7          // adaptation field length
      b(5) = 0x10       // PCR flag
      b(6) = ((pcrBase >> 25) & 0xff).toByte
      b(7) = ((pcrBase >> 17) & 0xff).toByte
      b(8) = ((pcrBase >> 9) & 0xff).toByte
      b(9) = ((pcrBase >> 1) & 0xff).toByte
      b(10) = (((pcrBase & 1) << 7) | 0x7e).toByte // ext hi bits reserved
      b(11) = 0         // PCR extension low byte
      p = 12
    }
    var i = p
    while (i < 188) { b(i) = ((i * 13 + pid) & 0x7f).toByte; i += 1 }
    b
  }

  final case class TsRowF(media_id: Long, kind: String, data: Array[Byte],
      parsed: Boolean, n_packets: Long, n_pids: Int, n_pes: Long,
      n_null: Long, duration_ms: Long)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-ts-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    // 1: a 2-program-ish mux — PAT (PID 0), PMT (256), video PES (257)
    // with PCRs spanning exactly 2 s of 90 kHz clock, audio (258), nulls
    val v1 = (
      Seq(packet(0, pusi = true, 0), packet(256, pusi = true, 0)) ++
      (0 until 20).map { i =>
        packet(257, pusi = i % 4 == 0, i,
          pcrBase = if (i % 5 == 0) 90000L + i * 9000L else -1L)
      } ++
      (0 until 8).map(i => packet(258, pusi = i % 2 == 0, i)) ++
      Seq(packet(0x1fff, pusi = false, 0), packet(0x1fff, pusi = false, 1))
    ).toArray.flatten
    // PCRs at i = 0,5,10,15 -> base 90000 .. 90000+15*9000 = 225000
    // span 135000 ticks / 90 = 1500 ms
    val v1Pes = 2 + (0 until 20).count(_ % 4 == 0) + (0 until 8).count(_ % 2 == 0)
    // 2: v1 with a >1-packet garbage tail — the sync-lattice break stops
    // the count at the last whole valid packet
    val v2 = v1 ++ Array.tabulate[Byte](250)(i => (i * 3 + 1).toByte)
    // 3: garbage (no sync at 0)
    val v3 = Array.tabulate[Byte](400)(i => (i * 29 + 11).toByte)

    val rows = Seq(
      TsRowF(1L, "ts", v1, parsed = true, 32L, 4, v1Pes.toLong, 2L, 1500L),
      TsRowF(2L, "ts", v2, parsed = true, 32L, 4, v1Pes.toLong, 2L, 1500L),
      TsRowF(3L, "bin", v3, parsed = false, 0L, 0, 0L, 0L, 0L))

    require(rows.head.n_packets == 2 + 20 + 8 + 2)

    def writeOne(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
      val part = new java.io.File(out + ".dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    }
    writeOne(rows.toDF(), "fixtures/ts_packets.parquet")
    println(s"wrote ${rows.size} ts rows")
    spark.stop()
  }
}
