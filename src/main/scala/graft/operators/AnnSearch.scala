package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SimKernels

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a single scan with a codegen'd
  * dot-product expression and a TakeOrderedAndProject top-k; embarrassingly
  * parallel and shuffle-free, linear in corpus size.
  *
  * Scale path: LSH-bucketed search — an 8-bit sign signature partitions the
  * corpus into 256 buckets; the query probes only its own bucket (multi-probe
  * = flip low-confidence bits for better recall). [[signature8]] uses
  * axis-aligned hyperplanes (sign of the first 8 coordinates), which keeps
  * the ORACLE-checked values trivially bit-deterministic across engines;
  * [[signatureRandom]] is the production-recall variant — seeded random
  * hyperplanes over all coordinates, still fully deterministic (splitmix64
  * from the seed, no RNG state). The plan (signature -> bucket
  * equi-filter/join -> exact re-rank) is identical for both.
  */
object AnnSearch {

  /** 8-bit axis-hyperplane signature of a double-array column (1-indexed). */
  def signature8(v: Column): Column =
    (0 until 8).map { j =>
      when(element_at(v, j + 1) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Scala mirror of [[signature8]] for a driver-side query vector. */
  def signature8(v: Seq[Double]): Long =
    (0 until 8).map(j => if (v(j) >= 0.0) 1L << j else 0L).sum

  // ---------------------------------------- seeded random hyperplanes

  /** One hyperplane component, derived from (seed, bit, i) through the
    * splitmix64 finalizer and mapped to [-1, 1). Deterministic given the
    * seed — NO RNG state — so executors, the driver mirror, and any other
    * engine reproduce the identical hyperplanes; unlike axis-aligned
    * signature8 it uses ALL coordinates, giving unbiased bucket occupancy
    * on embeddings whose leading dimensions are correlated. */
  private def planeComponent(seed: Long, bit: Int, i: Int): Double = {
    var z = seed + 0x9e3779b97f4a7c15L * (bit * 8191L + i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11) * (2.0 / (1L << 53)) - 1.0
  }

  /** Seeded random-hyperplane signature: bit j = sign(v . h_j) with h_j
    * pseudo-random from `seed`. The hyperplanes inline as literal arrays, so
    * the signature is a single codegen'd projection — same plan shape as
    * [[signature8]] (signature -> bucket equi-filter/join -> exact
    * re-rank), better recall at scale. */
  def signatureRandom(v: Column, dim: Int, nBits: Int = 8, seed: Long = 42L): Column =
    (0 until nBits).map { j =>
      val h = array((0 until dim).map(i => lit(planeComponent(seed, j, i))): _*)
      when(SimKernels.dot(v, h) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Driver-side mirror of [[signatureRandom]] for a query vector. The dot
    * product accumulates left-to-right exactly like the column kernel, so
    * signatures agree bit-for-bit. */
  def signatureRandom(v: Seq[Double], nBits: Int, seed: Long): Long =
    (0 until nBits).map { j =>
      val dot = v.indices.foldLeft(0.0)((acc, i) =>
        acc + v(i) * planeComponent(seed, j, i))
      if (dot >= 0.0) 1L << j else 0L
    }.sum

  /** The literal hyperplane matrix (nBits rows x dim columns) behind
    * [[signatureRandom]] — exposed so an oracle can inline the IDENTICAL
    * double literals and reproduce signatures bit-for-bit in another
    * engine. */
  def planes(dim: Int, nBits: Int, seed: Long): Seq[Seq[Double]] =
    (0 until nBits).map(j => (0 until dim).map(i => planeComponent(seed, j, i)))

  /** Multi-probe bucket list: the query's own bucket first, then the
    * `probes - 1` most promising perturbations — signatures with the bits
    * flipped whose hyperplane dot products have the smallest magnitude (the
    * planes the query nearly straddles; a true neighbor on the other side
    * of such a plane lands in exactly one of these buckets). Perturbation
    * sets are ranked by the summed |dot| of their flipped bits, the
    * standard multi-probe score, enumerated exhaustively (2^nBits subsets —
    * driver-side, nBits <= 16). Deterministic given (q, seed): probing is a
    * pure function, so the same query always probes the same buckets on any
    * cluster. */
  def probeBuckets(q: Seq[Double], nBits: Int, seed: Long, probes: Int): Seq[Long] = {
    require(nBits <= 16, s"probe enumeration is 2^nBits driver-side; nBits=$nBits")
    val base = signatureRandom(q, nBits, seed)
    if (probes <= 1) return Seq(base)
    val absDot = (0 until nBits).map { j =>
      math.abs(q.indices.foldLeft(0.0)((acc, i) =>
        acc + q(i) * planeComponent(seed, j, i)))
    }
    val ranked = (1 until (1 << nBits)).map { mask =>
      val score = (0 until nBits).collect {
        case b if (mask & (1 << b)) != 0 => absDot(b)
      }.sum
      (score, mask)
    }.sortBy { case (s, m) => (s, m) }.take(probes - 1)
    base +: ranked.map { case (_, mask) => base ^ mask.toLong }
  }

  /** LSH top-k over the seeded random-hyperplane signature with multi-probe:
    * compute each row's bucket in one codegen'd projection, keep only rows
    * in the query's probe buckets (an `isin` over `probes` literals — a
    * narrow pushed filter, no shuffle), exact cosine re-rank inside. At
    * 100 TB the filter prunes ~(1 - probes/2^nBits) of the corpus before
    * any ranking work; recall rises with `probes` at linear extra cost. */
  def lshTopK(emb: DataFrame, id: String, vec: Column, dim: Int, q: Seq[Double],
      k: Int, nBits: Int = 8, seed: Long = 42L, probes: Int = 0): DataFrame = {
    // 0 = unset: resolve from the session conf (deployment knob), default 1
    val nProbes =
      if (probes != 0) probes
      else emb.sparkSession.conf.get(graft.api.Knobs.AnnProbes, "1").toInt
    val sigs = probeBuckets(q, nBits, seed, nProbes)
    val inBuckets = emb
      .withColumn("__sig", signatureRandom(vec, dim, nBits, seed))
      .where(col("__sig").isin(sigs: _*)).drop("__sig")
    bruteCosineTopK(inBuckets, id, vec, q, k)
  }

  /** Brute-force cosine top-k (query vector as literal array), cosine rounded
    * to 6 decimals and used as the (deterministic) ranking key. */
  def bruteCosineTopK(emb: DataFrame, id: String, vec: Column,
      q: Seq[Double], k: Int): DataFrame = {
    val qc = array(q.map(lit): _*)
    // native codegen'd kernel: bit-identical to SimKernels.cosineSim
    // (same sequential accumulation), compiled loop instead of interpreted
    // higher-order functions
    emb.select(col(id), round(graft.functions.NativeKernels.cosineSim(vec, qc), 6).as("cos"))
      .orderBy(col("cos").desc, col(id))
      .limit(k)
  }

  // ------------------------------------------------------------------ IVF

  /** Index of the nearest centroid (L2), ties to the lowest index — at
    * scale this is the partitioning key that keeps each probe local.
    * Dispatches on k: small lists inline as a composed literal projection
    * (trivially oracle-portable — the DuckDB twin inlines the same
    * literals); above [[ComposedClusterMaxK]] the native
    * [[graft.functions.NativeKernels.nearestCentroid]] kernel takes over —
    * one reference-object call whose generated-code size is independent of
    * k, where the composed form would inline k×dim literal AST nodes and
    * trip Janino method-size limits at production k = O(√N). The two are
    * bit-identical (spec'd), so the switch point is invisible in results. */
  def ivfCluster(vec: Column, centroids: Seq[Seq[Double]]): Column =
    if (centroids.size <= ComposedClusterMaxK) ivfClusterComposed(vec, centroids)
    else graft.functions.NativeKernels.nearestCentroid(vec, centroids)

  /** Largest centroid count assigned via inlined literals; beyond this the
    * constant-size native kernel is used. 16 centroids × 64 dims ≈ 1k
    * literal nodes — comfortably inside codegen limits. */
  val ComposedClusterMaxK = 16

  /** The composed-literal formulation — k×dim inlined literal nodes. */
  private[graft] def ivfClusterComposed(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val ds = centroids.map(c => SimKernels.l2Dist(vec, array(c.map(lit): _*)))
    (array_position(array(ds: _*), array_min(array(ds: _*))) - 1).cast("int")
  }

  /** Distributed Lloyd's k-means for the IVF coarse quantizer. Spark-shaped
    * end to end: initial centroids are the k hash-minimal vectors (md5 of
    * the id — a deterministic, partitioning-independent sample, the same
    * trick as [[graft.operators.Sampling]]); each iteration assigns every
    * vector to its nearest centroid with the codegen'd [[ivfCluster]]
    * literal projection (no shuffle) and recomputes means with ONE
    * two-phase aggregate over (cluster, dimension) exploded coordinates —
    * k·dim partial sums, map-side combined; the driver collects only the
    * k·dim aggregate rows (like every other calibration read). An empty
    * cluster keeps its previous centroid.
    *
    * Centroid quality only affects probe RECALL, never correctness:
    * [[ivfTopK]]'s re-rank is exact inside the probed buckets and probing
    * every bucket equals brute force for ANY centroid list (spec'd). FP
    * caveat: per-cluster sums accumulate in partition order, so centroids
    * are deterministic per partitioning, not bit-portable across engines —
    * acceptable for an index-build step whose output only steers pruning.
    *
    * At 100 TB, train on a sample: `trainPct < 100` applies the
    * deterministic hash sampler ([[graft.operators.Sampling.sample]] — a
    * narrow pushed filter) before the iteration loop, so `iters` scans run
    * over trainPct% of the corpus; quantizers converge on samples long
    * before full passes pay off, and the final ASSIGNMENT of all vectors
    * (inside [[ivfTopK]]) always sees the full corpus. */
  def kmeans(emb: DataFrame, id: String, vec: Column, k: Int,
      iters: Int = 10, trainPct: Int = 100): Seq[Seq[Double]] = {
    val train = if (trainPct >= 100) emb
      else Sampling.sample(emb, col(id), trainPct)
    // Project once and cache: the init scan populates the cache and every
    // Lloyd iteration reads it back — without this, each of the `iters`
    // aggregates re-reads and re-projects the training corpus from source
    // (iters extra full scans at index-build scale).
    val projected = train
      .select(col(id).cast("string").as("i"), vec.as("v")).cache()
    try {
      var centroids: Seq[Seq[Double]] = projected
        .orderBy(md5(col("i")), col("i")).limit(k)
        .collect().map(_.getSeq[Double](1).toSeq).toSeq
      for (_ <- 1 to iters) {
        val sums = projected.select(ivfCluster(col("v"), centroids).as("c"),
            posexplode(col("v")).as(Seq("d", "x")))
          .groupBy("c", "d").agg(sum("x").as("s"), count(lit(1)).as("n"))
          .collect().map(r => ((r.getInt(0), r.getInt(1)),
            (r.getDouble(2), r.getLong(3))))
          .toMap
        centroids = centroids.zipWithIndex.map { case (old, c) =>
          old.indices.map { d =>
            sums.get((c, d)).map { case (s, n) => s / n }.getOrElse(old(d))
          }
        }
      }
      centroids
    } finally projected.unpersist()
  }

  /** Driver-side L2 between two vectors (shorter length wins) — the
    * probe-selection arithmetic shared by every nearest-centroid probe
    * (IVF, IVF-PQ, rebuild). A determinism contract: the DuckDB oracles
    * mirror this exact sequential accumulation, so there is ONE copy. */
  private[graft] def l2Seq(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.size, b.size)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** The query's `nProbe` nearest centroid indices, ties to the lower
    * index — the shared probe-set rule. */
  private[graft] def probeCentroids(q: Seq[Double],
      centroids: Seq[Seq[Double]], nProbe: Int): Seq[Int] =
    centroids.indices.sortBy(i => (l2Seq(q, centroids(i)), i)).take(nProbe)

  /** IVF top-k: assign every vector to its nearest centroid, probe only the
    * query's `nProbe` nearest centroid buckets, exact cosine re-rank inside
    * the probed buckets. Build `centroids` with [[kmeans]] (or pass any
    * fixed list — the plan shape and exactness guarantees are identical). */
  def ivfTopK(emb: DataFrame, id: String, vec: Column, centroids: Seq[Seq[Double]],
      q: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val probed = probeCentroids(q, centroids, nProbe)
    val assigned = emb.withColumn("cluster", ivfCluster(vec, centroids))
      .where(col("cluster").isin(probed: _*))
    bruteCosineTopK(assigned, id, vec, q, k)
  }
}
