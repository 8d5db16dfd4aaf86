package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for `fixtures/audio_seq_media.parquet` (payloads) and
  * `fixtures/audio_seq_windows.parquet` (expected per-window signatures) —
  * committed ground truth for the q_audio_seq / q_audio_seq_neardup
  * oracles, the audio twin of [[GenVideoFixture]].
  *
  * Signatures are computed HERE by applying [[GenAudioFpFixture]]'s
  * standalone fingerprint arithmetic to each complete 250 ms window of the
  * raw samples the generator synthesized (the engine's per-window bucket
  * partition `(f % spw) * 65 / spw` over window frames equals
  * [[GenAudioFpFixture.expectedFp]]'s `f * 65 / n` over the window slice
  * with n = spw — the published recipe, re-stated independently).
  *
  * Planted relationships (asserted at build time):
  *  - clip 2 is clip 1's program re-encoded as IEEE-FLOAT WAV
  *    (f = v / 32768, exact in float) — the lattice maps it back onto the
  *    identical integers, so every window signature matches bit-for-bit
  *    on alignment diagonal 0 (the re-encoded-copy case ACROSS sample
  *    formats);
  *  - clip 3 is clip 1 trimmed by exactly one window of samples — its
  *    windows match clip 1's on diagonal 1 (the contained/trimmed case
  *    a whole-clip fingerprint cannot see);
  *  - clip 4 is unrelated — no window within Hamming 3 of clips 1-3;
  *  - clip 5 is corrupt (cut inside the header) — the undecoded marker.
  *
  * Run once: `sbt "Test/runMain graft.GenAudioSeqFixture"`, commit both
  * parquets. Deterministic: seeded synthesis, fixed rate/window. */
object GenAudioSeqFixture {

  val Rate = 16000
  val WindowMs = 250L
  val Spw: Int = (Rate.toLong * WindowMs / 1000L).toInt // 4000

  /** Expected per-complete-window signatures of a sample array. */
  def expectedSeq(samples: Array[Int]): Seq[Long] =
    samples.grouped(Spw).filter(_.length == Spw)
      .map(w => GenAudioFpFixture.expectedFp(w.map(_.toLong))).toSeq

  final case class MediaRowA(media_id: Long, kind: String, data: Array[Byte])
  final case class WindowRowA(media_id: Long, window_idx: Int,
      decoded: Boolean, sig: Option[Long])

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-audio-seq-fixture").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    import spark.implicits._

    // block-hashed envelope at ~bucket granularity (61 samples ~ one of
    // the 65 sub-buckets of a 4000-frame window) so every window's
    // gradient bits are pseudo-random and windows differ from each other
    // — GenAudioFpFixture.synth's envelope is too slow-moving here (its
    // 512-frame blocks were sized for whole-clip fingerprints)
    def clip(nSamples: Int, seed: Int): Array[Int] =
      Array.tabulate(nSamples) { t =>
        // full-width golden-ratio mix, high bits taken — a narrow product
        // would leave every block's envelope near-identical
        val h = (t / 61L + seed * 131L) * 0x9E3779B97F4A7C15L
        val env = (((h >>> 33) % 97 + 97) % 97).toInt
        math.max(-32768, math.min(32767, env * 300 + (t % 13) * 7))
      }
    // 4.5 windows of samples: 4 complete windows + a dropped partial tail
    val base = clip(Spw * 4 + Spw / 2, seed = 31)
    val baseFloat = base.map(_ / 32768f)
    val trimmed = base.drop(Spw) // exactly one window removed
    val unrelated = clip(Spw * 3, seed = 77)

    val media = Seq(
      MediaRowA(1L, "wav", GenAudioFpFixture.wavBytes(Array(base), Rate.toFloat)),
      MediaRowA(2L, "wav", GenAudioFpFixture.floatWav(baseFloat, Rate)),
      MediaRowA(3L, "wav", GenAudioFpFixture.wavBytes(Array(trimmed), Rate.toFloat)),
      MediaRowA(4L, "wav", GenAudioFpFixture.wavBytes(Array(unrelated), Rate.toFloat)),
      MediaRowA(5L, "wav",
        GenAudioFpFixture.wavBytes(Array(base), Rate.toFloat).take(20)))

    def rows(id: Long, samples: Array[Int]): Seq[WindowRowA] =
      expectedSeq(samples).zipWithIndex.map { case (s, w) =>
        WindowRowA(id, w, decoded = true, Some(s))
      }
    // the float clip's lattice values ARE the base integers (v/32768f is
    // exact in float, floor(f * 32768) = v) — same expected signatures
    val windows = rows(1L, base) ++ rows(2L, base).map(_.copy(media_id = 2L)) ++
      rows(3L, trimmed) ++ rows(4L, unrelated) :+
      WindowRowA(5L, 0, decoded = false, None)

    // ---- planted-relationship asserts
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val byId = windows.filter(_.decoded).groupBy(_.media_id)
    require(byId(1L).size == 4 && byId(3L).size == 3 && byId(4L).size == 3)
    require(byId(1L).map(_.sig) == byId(2L).map(_.sig),
      "float re-encode must signature-match the PCM clip")
    byId(3L).foreach { r =>
      require(byId(1L)(r.window_idx + 1).sig == r.sig,
        s"trim misaligned at window ${r.window_idx}")
    }
    for (u <- byId(4L); a <- byId(1L) ++ byId(3L))
      require(ham(u.sig.get, a.sig.get) > 3,
        s"unrelated clip collides at v${a.media_id}#${a.window_idx}")
    windows.filter(_.decoded).foreach(r => require(r.sig.get != 0L,
      s"zero signature at ${r.media_id}#${r.window_idx} would drop from the join"))
    // distinct windows within one clip (the diagonal grouping is only
    // meaningful when windows are not all identical)
    require(byId(1L).map(_.sig).distinct.size > 1)

    def writeOne(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
      val part = new java.io.File(out + ".dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, new java.io.File(out).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out + ".dir"))
    }
    writeOne(media.toDF(), "fixtures/audio_seq_media.parquet")
    writeOne(windows.toDF(), "fixtures/audio_seq_windows.parquet")
    println(s"wrote ${media.size} media rows, ${windows.size} window rows")
    spark.stop()
  }
}
