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
  * Indexes are SELF-DESCRIBING: the build writes its parameters
  * (nBits/seed/dim, or the centroid list) to `_graft_meta.json` beside the
  * parquet (the `_` prefix keeps it out of Spark's file listing, like
  * `_SUCCESS`), and the query path loads them — so a served index cannot be
  * probed with stale parameters: omitted parameters resolve from the
  * metadata, and an explicit override that disagrees with it fails loudly
  * instead of silently probing the wrong buckets (which would collapse
  * recall with no error). The reference has no persisted-index counterpart —
  * this is part of the large-scale pipeline suite (SURVEY.md §6).
  */
object AnnIndex {

  /** Partition-directory column name for the bucket key. */
  val BucketCol = "bucket"

  /** Index-parameter sidecar file name. */
  val MetaFile = "_graft_meta.json"

  final case class LshMeta(dim: Int, nBits: Int, seed: Long)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Write the sidecar through the Hadoop FS API, so the index works on any
    * filesystem a 1000-executor cluster would use, not just local disk. */
  private def writeMeta(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, path: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(mapper.readTree(in)) finally in.close()
    }
  }

  /** Build a persisted LSH index: one full scan computing the seeded
    * random-hyperplane signature, written as one directory per bucket
    * (2^nBits directories) plus the (dim, nBits, seed) sidecar. Vectors
    * land in exactly one bucket, so the index is the corpus size, not a
    * replicated copy. */
  def buildLsh(emb: DataFrame, id: String, vec: Column, dim: Int, path: String,
      nBits: Int = 8, seed: Long = 42L): Unit = {
    emb.select(col(id), vec.as("vec"),
        AnnSearch.signatureRandom(vec, dim, nBits, seed).as(BucketCol))
      // co-locate each bucket before the partitioned write: without this,
      // EVERY task writes a file into every bucket directory it touches —
      // O(tasks x buckets) small files; with it, one task owns a bucket's
      // rows and each directory gets one well-sized file (AQE coalesces
      // the shuffle where buckets are small)
      .repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)
    // after the parquet commit (overwrite clears the directory first)
    writeMeta(emb.sparkSession, path,
      s"""{"kind": "lsh", "dim": $dim, "nBits": $nBits, "seed": $seed}""")
  }

  /** The LSH index's stored build parameters, or None for a pre-sidecar
    * index. */
  def readLshMeta(spark: SparkSession, path: String): Option[LshMeta] =
    readMeta(spark, path).map { n =>
      require(n.path("kind").asText() == "lsh",
        s"index at $path is a ${n.path("kind").asText()} index, not LSH")
      LshMeta(n.path("dim").asInt(), n.path("nBits").asInt(), n.path("seed").asLong())
    }

  /** Grow a persisted LSH index with a new vector batch — the ANN twin of
    * the incremental-dedup ingestion loop ([[graft.operators.Dedup]]
    * `writeBandIndex(append = true)`): the batch is signed with the
    * index's OWN stored parameters (no caller parameters to diverge) and
    * appended into the bucket directories; existing data is never
    * re-signed or rewritten, and queries see old and new vectors alike
    * through the same pruned probe. Appending to a path that is not a
    * metadata-carrying LSH index fails loudly. */
  def appendLsh(emb: DataFrame, id: String, vec: Column, path: String): Unit = {
    val meta = readLshMeta(emb.sparkSession, path).getOrElse(
      throw new IllegalArgumentException(
        s"no LSH index metadata at $path — build with buildLsh first"))
    emb.select(col(id), vec.as("vec"),
        AnnSearch.signatureRandom(vec, meta.dim, meta.nBits, meta.seed).as(BucketCol))
      .repartition(col(BucketCol)) // one well-sized file per touched bucket
      .write.mode("append").partitionBy(BucketCol).parquet(path)
  }

  /** Query a persisted LSH index with multi-probe: the probe buckets become
    * a partition-column `isin` filter, pruned at file listing — only
    * `probes` of the 2^nBits directories are read. Identical answers to
    * [[AnnSearch.lshTopK]] with the same (nBits, seed, probes).
    *
    * nBits/seed default to the index's own sidecar metadata (0 = unset);
    * an explicit value that DISAGREES with the sidecar throws — probing
    * with stale parameters silently collapses recall, the one failure mode
    * a served index must not have. Pre-sidecar indexes (no metadata file)
    * require both values, as before. */
  def lshTopK(spark: SparkSession, path: String, id: String, q: Seq[Double],
      k: Int, nBits: Int = 0, seed: Long = 0L, probes: Int = 0): DataFrame = {
    val meta = readLshMeta(spark, path)
    def resolve[T](name: String, given: T, unset: T, stored: Option[T]): T =
      (given, stored) match {
        case (`unset`, Some(m)) => m
        case (`unset`, None) => throw new IllegalArgumentException(
          s"index at $path has no metadata sidecar — pass $name explicitly")
        case (g, Some(m)) =>
          require(g == m, s"$name = $g disagrees with the index's stored " +
            s"$name = $m (path $path) — probing with stale parameters " +
            "silently returns wrong buckets")
          g
        case (g, None) => g
      }
    val useBits = resolve("nBits", nBits, 0, meta.map(_.nBits))
    val useSeed = resolve("seed", seed, 0L, meta.map(_.seed))
    // 0 = unset: resolve from the session conf, like AnnSearch.lshTopK
    val nProbes =
      if (probes != 0) probes
      else spark.conf.get(graft.api.Knobs.AnnProbes, "1").toInt
    val sigs = AnnSearch.probeBuckets(q, useBits, useSeed, nProbes)
    val probed = spark.read.parquet(path)
      .where(col(BucketCol).isin(sigs: _*))
    AnnSearch.bruteCosineTopK(probed, id, col("vec"), q, k)
  }

  /** Build a persisted IVF index: one full scan assigning each vector to its
    * nearest centroid (the [[AnnSearch.ivfCluster]] kernel — constant-size
    * codegen at any k), one directory per cluster, plus the centroid-list
    * sidecar. Build `centroids` with [[AnnSearch.kmeans]]. */
  def buildIvf(emb: DataFrame, id: String, vec: Column,
      centroids: Seq[Seq[Double]], path: String): Unit = {
    emb.select(col(id), vec.as("vec"),
        AnnSearch.ivfCluster(vec, centroids).as(BucketCol))
      .repartition(col(BucketCol)) // see buildLsh: one task per bucket
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)
    // Double.toString round-trips exactly through Jackson's parse, so the
    // stored centroids compare bit-equal with the build's list
    val cs = centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeMeta(emb.sparkSession, path, s"""{"kind": "ivf", "centroids": $cs}""")
  }

  /** The IVF index's stored centroid list, or None for a pre-sidecar index. */
  def readIvfCentroids(spark: SparkSession, path: String): Option[Seq[Seq[Double]]] =
    readMeta(spark, path).map { n =>
      require(n.path("kind").asText() == "ivf",
        s"index at $path is a ${n.path("kind").asText()} index, not IVF")
      import scala.jdk.CollectionConverters._
      n.path("centroids").elements().asScala
        .map(c => c.elements().asScala.map(_.asDouble()).toSeq).toSeq
    }

  /** Grow a persisted IVF index with a new vector batch, assigned with the
    * index's OWN stored centroids — see [[appendLsh]]. The coarse
    * quantizer is intentionally frozen (the standard served-IVF contract:
    * re-training centroids means rebuilding the index; appending must not
    * silently shift cluster boundaries under existing data). */
  def appendIvf(emb: DataFrame, id: String, vec: Column, path: String): Unit = {
    val cs = readIvfCentroids(emb.sparkSession, path).getOrElse(
      throw new IllegalArgumentException(
        s"no IVF index metadata at $path — build with buildIvf first"))
    emb.select(col(id), vec.as("vec"),
        AnnSearch.ivfCluster(vec, cs).as(BucketCol))
      .repartition(col(BucketCol))
      .write.mode("append").partitionBy(BucketCol).parquet(path)
  }

  /** Query a persisted IVF index: the query's nProbe nearest centroids
    * become the pruned partition set. Identical answers to
    * [[AnnSearch.ivfTopK]] with the same centroid list.
    *
    * `centroids` defaults to the index's sidecar metadata (empty = unset);
    * an explicit list that disagrees with the sidecar throws — see
    * [[lshTopK]] on why stale parameters must fail loudly. */
  def ivfTopK(spark: SparkSession, path: String, id: String,
      q: Seq[Double], k: Int, nProbe: Int,
      centroids: Seq[Seq[Double]] = Seq.empty): DataFrame = {
    val stored = readIvfCentroids(spark, path)
    val cs = (centroids, stored) match {
      case (Seq(), Some(m)) => m
      case (Seq(), None) => throw new IllegalArgumentException(
        s"index at $path has no metadata sidecar — pass centroids explicitly")
      case (g, Some(m)) =>
        require(g == m, s"the given centroid list disagrees with the index's " +
          s"stored one (path $path) — probing with stale centroids silently " +
          "returns wrong buckets")
        g
      case (g, None) => g
    }
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val probed = cs.indices.sortBy(i => (l2(q, cs(i)), i)).take(nProbe)
    val df = spark.read.parquet(path)
      .where(col(BucketCol).isin(probed: _*))
    AnnSearch.bruteCosineTopK(df, id, col("vec"), q, k)
  }
}
