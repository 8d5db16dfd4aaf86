package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column transforms that precede indexing at corpus scale.
  *
  * The one implemented here is Johnson–Lindenstrauss random projection
  * (Achlioptas, JCSS 2003: dense ±1 entries scaled by 1/√k preserve
  * pairwise L2 distances within (1±ε) at k = O(ε⁻²·ln n)) — the standard
  * cost reducer in front of ANN indexing, k-means, and SemDedup when the
  * upstream encoder emits wide vectors: every downstream distance is
  * O(dim), so halving dim halves the dominant term of index build AND
  * query.
  *
  * The sign matrix is not sampled — it derives from the repo's portable
  * md5 convention ([[Sampling.hashPct]]'s contract): sign(j, i) = +1 when
  * the first 8 hex chars of md5("{seed}{j}:{i}") are even, else −1. That
  * makes the projection a pure function of (seed, j, i), reproducible
  * across engines, partitionings, and reruns — any engine with md5 can
  * regenerate the exact matrix (the DuckDB oracle does), and two clusters
  * projecting the same corpus with the same seed agree bit-for-bit on the
  * signs. Sign quality matches iid ±1 for JL purposes: md5 bits are
  * uniform and independent across distinct inputs.
  *
  * Scale posture: the matrix is k×inDim driver-side integers (64×1024 =
  * 65k entries — trivially bounded), shipped once inside the codegen'd
  * [[graft.functions.NativeKernels.randomProject]] kernel; the projection
  * itself is a narrow per-row map — no shuffle, no UDF, whole-stage
  * codegen.
  */
object Embeddings {

  /** The engine-portable ±1 sign matrix (outDim rows × inDim cols):
    * sign(j, i) = 1 − 2·(int(md5("{seed}{j}:{i}")[0,8)) mod 2). */
  def projectionSigns(outDim: Int, inDim: Int,
      seed: String = ""): Seq[Seq[Int]] = {
    require(outDim > 0 && inDim > 0,
      s"projection dims must be positive: $outDim x $inDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        md.reset()
        val hex = md.digest(s"$seed$j:$i".getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
      }
    }
  }

  /** JL projection of `vec` (array<double>, inDim) to array<double>
    * (outDim): y_j = (Σ_i sign(j,i)·x_i) / √outDim. */
  def randomProjection(vec: Column, inDim: Int, outDim: Int,
      seed: String = ""): Column =
    graft.functions.NativeKernels.randomProject(vec,
      projectionSigns(outDim, inDim, seed))

  /** Frame form: (id, vector) with `vector` the projected array. */
  def project(df: DataFrame, id: Column, vec: Column, inDim: Int,
      outDim: Int, seed: String = ""): DataFrame =
    df.select(id.as("id"),
      randomProjection(vec.cast("array<double>"), inDim, outDim, seed)
        .as("vector"))
}
