package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes: the serving-path complement to [[AnnSearch]].
  *
  * The on-the-fly paths (`lshTopK` / `ivfTopK`) recompute signatures or
  * centroid assignments over the full corpus per query — the right shape for
  * a one-shot batch job, the wrong one for a served index answering many
  * queries. The index build here pays that scan ONCE and writes the corpus
  * `partitionBy(bucket)`; the query path filters on the partition column, so
  * Catalyst prunes at FILE LISTING time and only ~probes/2^nBits (LSH) or
  * nProbe/k (IVF) of the stored corpus is ever read — no signature
  * recomputation, no full scan, just the probed directories.
  *
  * Answers are identical to the on-the-fly paths by construction: the stored
  * bucket is the same [[AnnSearch.signatureRandom]] / [[AnnSearch.ivfCluster]]
  * value the on-the-fly path computes, and the exact cosine re-rank inside
  * the probed buckets is shared ([[AnnSearch.bruteCosineTopK]]).
  *
  * Index parameters (nBits/seed/dim, or the centroid list) are the caller's
  * contract: pass the same values at build and query time, as with any
  * offline-built index. The reference has no persisted-index counterpart —
  * this is part of the large-scale pipeline suite (SURVEY.md §6).
  */
object AnnIndex {

  /** Partition-directory column name for the bucket key. */
  val BucketCol = "bucket"

  /** Build a persisted LSH index: one full scan computing the seeded
    * random-hyperplane signature, written as one directory per bucket
    * (2^nBits directories). Vectors land in exactly one bucket, so the
    * index is the corpus size, not a replicated copy. */
  def buildLsh(emb: DataFrame, id: String, vec: Column, dim: Int, path: String,
      nBits: Int = 8, seed: Long = 42L): Unit =
    emb.select(col(id), vec.as("vec"),
        AnnSearch.signatureRandom(vec, dim, nBits, seed).as(BucketCol))
      // co-locate each bucket before the partitioned write: without this,
      // EVERY task writes a file into every bucket directory it touches —
      // O(tasks x buckets) small files; with it, one task owns a bucket's
      // rows and each directory gets one well-sized file (AQE coalesces
      // the shuffle where buckets are small)
      .repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)

  /** Query a persisted LSH index with multi-probe: the probe buckets become
    * a partition-column `isin` filter, pruned at file listing — only
    * `probes` of the 2^nBits directories are read. Identical answers to
    * [[AnnSearch.lshTopK]] with the same (nBits, seed, probes). */
  def lshTopK(spark: SparkSession, path: String, id: String, q: Seq[Double],
      k: Int, nBits: Int = 8, seed: Long = 42L, probes: Int = 0): DataFrame = {
    // 0 = unset: resolve from the session conf, like AnnSearch.lshTopK
    val nProbes =
      if (probes != 0) probes
      else spark.conf.get(graft.api.Knobs.AnnProbes, "1").toInt
    val sigs = AnnSearch.probeBuckets(q, nBits, seed, nProbes)
    val probed = spark.read.parquet(path)
      .where(col(BucketCol).isin(sigs: _*))
    AnnSearch.bruteCosineTopK(probed, id, col("vec"), q, k)
  }

  /** Build a persisted IVF index: one full scan assigning each vector to its
    * nearest centroid (the [[AnnSearch.ivfCluster]] kernel — constant-size
    * codegen at any k), one directory per cluster. Build `centroids` with
    * [[AnnSearch.kmeans]]. */
  def buildIvf(emb: DataFrame, id: String, vec: Column,
      centroids: Seq[Seq[Double]], path: String): Unit =
    emb.select(col(id), vec.as("vec"),
        AnnSearch.ivfCluster(vec, centroids).as(BucketCol))
      .repartition(col(BucketCol)) // see buildLsh: one task per bucket
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)

  /** Query a persisted IVF index: the query's nProbe nearest centroids
    * become the pruned partition set. Identical answers to
    * [[AnnSearch.ivfTopK]] with the same centroid list. */
  def ivfTopK(spark: SparkSession, path: String, id: String,
      centroids: Seq[Seq[Double]], q: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val probed = centroids.indices.sortBy(i => (l2(q, centroids(i)), i)).take(nProbe)
    val df = spark.read.parquet(path)
      .where(col(BucketCol).isin(probed: _*))
    AnnSearch.bruteCosineTopK(df, id, col("vec"), q, k)
  }
}
