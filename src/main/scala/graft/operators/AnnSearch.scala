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

  /** Index of the nearest centroid (L2), ties to the lowest index. The
    * centroid list is small (O(sqrt N) in practice) and inlined as
    * literals, so assignment is a single codegen'd projection — at scale
    * this is the partitioning key that keeps each probe local. */
  def ivfCluster(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val ds = centroids.map(c => SimKernels.l2Dist(vec, array(c.map(lit): _*)))
    (array_position(array(ds: _*), array_min(array(ds: _*))) - 1).cast("int")
  }

  /** IVF top-k: assign every vector to its nearest centroid, probe only the
    * query's `nProbe` nearest centroid buckets, exact cosine re-rank inside
    * the probed buckets. `centroids` would come from k-means in a real
    * pipeline; any fixed list works for the plan shape. */
  def ivfTopK(emb: DataFrame, id: String, vec: Column, centroids: Seq[Seq[Double]],
      q: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val probed = centroids.indices.sortBy(i => (l2(q, centroids(i)), i)).take(nProbe)
    val assigned = emb.withColumn("cluster", ivfCluster(vec, centroids))
      .where(col("cluster").isin(probed: _*))
    bruteCosineTopK(assigned, id, vec, q, k)
  }
}
