package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for large-scale vector corpora.
  *
  * Scalar int8 quantization shrinks a float32 embedding column 4x, which at
  * 100 TB is usually the difference between an in-memory ANN working set and
  * a disk-bound one (IVF/ADC pipelines re-rank the top candidates against
  * the full-precision vectors, which stay in cold storage).
  *
  * Scale design: the per-dimension [min, max] calibration is a two-phase
  * hash aggregate over (dim) — 64..4096 groups regardless of corpus size —
  * and joins back as a broadcast, so the corpus itself is never shuffled.
  * All arithmetic is plain IEEE double + integer floor/clamp, bit-portable
  * across engines (the DuckDB oracle reproduces codes exactly).
  */
object Quantize {

  /** Per-(id, dim) int8 codes for a double-array embedding column:
    * code = least(floor((x - lo_dim) / (hi_dim - lo_dim) * 256), 255),
    * 0 when the dimension is constant. `dim` is 1-based. Codes are exact
    * integers in [0, 255]; decode as lo + (code + 0.5) / 256 * (hi - lo). */
  def int8(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val ex = df.select(id.as("id"), posexplode(vec).as(Seq("pos", "x")))
      .select(col("id"), (col("pos") + 1).as("dim"), col("x"))
    val stats = ex.groupBy(col("dim")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    ex.join(broadcast(stats), Seq("dim"))
      .select(col("id"), col("dim").cast("long").as("dim"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 256).cast("long"),
            lit(255L)))
          .as("code"))
  }

  // ------------------------------------------------------ product quantization

  /** Train PQ codebooks (Jégou et al., TPAMI 2011): split the `dim`-dim
    * space into `m` subspaces of dim/m dims and run one distributed
    * k-means per subspace ([[AnnSearch.kmeans]] — deterministic
    * hash-minimal init, sampled training via `trainPct`). Returns m
    * codebooks of `nCodes` codewords each.
    *
    * Why PQ at 100 TB: a 768-dim float32 embedding is 3 KB; its PQ code is
    * m bytes (8–16). The ANN working set for a trillion vectors drops from
    * ~3 PB to ~10 TB — the difference between a disk-bound scan and an
    * in-memory one. Recall comes back via exact re-rank of the ADC
    * shortlist against the full-precision vectors in cold storage
    * ([[pqSearch]]).
    *
    * Build cost: m × (iters + 1) small aggregate jobs over the (sampled)
    * training projection — an index-build step, not a serving path. */
  def pqTrain(emb: DataFrame, id: Column, vec: Column, m: Int,
      nCodes: Int = 256, iters: Int = 5, trainPct: Int = 100): Seq[Seq[Seq[Double]]] = {
    val first = emb.select(vec.as("v")).limit(1).collect()
    require(first.nonEmpty, "pqTrain: empty input")
    val dim = first(0).getSeq[Double](0).size
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = emb.select(id.cast("string").as("id"),
        slice(vec, s * dsub + 1, dsub).as("v"))
      AnnSearch.kmeans(sub, "id", col("v"), nCodes, iters, trainPct)
    }
  }

  /** (id, codes) — each vector's m-byte PQ code from one native kernel
    * call ([[graft.functions.NativeKernels.pqEncode]]); a narrow codegen'd
    * map, no shuffle. Encode once, persist, probe many. */
  def pqEncode(df: DataFrame, id: Column, vec: Column,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    df.select(id.as("id"),
      graft.functions.NativeKernels.pqEncode(vec, codebooks).as("codes"))

  /** The query's ADC lookup table: squared L2 between the query's subspace
    * slice and every codeword — m × nCodes doubles, computed once on the
    * driver and shipped inside the scoring kernel. */
  def pqLut(q: Seq[Double], codebooks: Seq[Seq[Seq[Double]]]): Seq[Seq[Double]] = {
    val dsub = codebooks.head.head.size
    codebooks.zipWithIndex.map { case (cb, s) =>
      val qs = q.slice(s * dsub, (s + 1) * dsub)
      cb.map { cw =>
        var sum = 0.0
        var i = 0
        val n = math.min(qs.size, cw.size)
        while (i < n) { val d = qs(i) - cw(i); sum += d * d; i += 1 }
        sum
      }
    }
  }

  /** Approximate top-k by ADC over a PQ-codes frame: one codegen'd kernel
    * read per row, TakeOrdered global top-k (ascending distance, ties to
    * the lower id) — never a global sort. The ranking key is the distance
    * rounded to 6 decimals (the [[AnnSearch.bruteCosineTopK]] determinism
    * contract: stable across engines and replans). */
  def pqAdcTopK(codes: DataFrame, id: Column, codesCol: Column,
      codebooks: Seq[Seq[Seq[Double]]], q: Seq[Double], k: Int): DataFrame =
    codes.select(id.as("id"),
        round(graft.functions.NativeKernels.pqAdcDist(codesCol, pqLut(q, codebooks)), 6)
          .as("adc"))
      .orderBy(col("adc"), col("id")).limit(k)

  /** The production PQ recipe: ADC shortlist of `shortlist` candidates
    * over the codes, then EXACT L2 re-rank of only those ids against the
    * full-precision vectors. The shortlist is k-bounded, so the re-rank
    * join broadcasts it into the vector scan; recall is tunable via
    * `shortlist` (probe [[recallProbe]]-style against brute force to
    * size it). */
  def pqSearch(emb: DataFrame, id: Column, vec: Column,
      codebooks: Seq[Seq[Seq[Double]]], q: Seq[Double], k: Int,
      shortlist: Int = 100): DataFrame = {
    val enc = pqEncode(emb, id, vec, codebooks)
    val cand = pqAdcTopK(enc, col("id"), col("codes"), codebooks, q,
      math.max(k, shortlist)).select(col("id"))
    val qc = array(q.map(lit): _*)
    emb.select(id.as("id"), vec.as("v"))
      .join(broadcast(cand), "id")
      .select(col("id"),
        round(graft.functions.NativeKernels.l2Dist(col("v"), qc), 6).as("dist"))
      .orderBy(col("dist"), col("id")).limit(k)
  }
}
