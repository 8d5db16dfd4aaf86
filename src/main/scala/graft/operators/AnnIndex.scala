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
  *
  * Layout: `path/bucket=B/batch=N/part-*.parquet`. The bucket level is the
  * probe-pruning key; the batch level ([[IndexIO]]) is what makes streaming
  * appends replay-idempotent (a re-delivered micro-batch dynamic-overwrites
  * its own directories instead of appending a second copy — a duplicated
  * vector would rank TWICE in a served probe) and gives [[compact]] its
  * commit bookkeeping.
  */
object AnnIndex {

  /** Partition-directory column name for the bucket key. */
  val BucketCol = "bucket"

  /** Index-parameter sidecar file name. */
  val MetaFile = IndexIO.MetaFile

  final case class LshMeta(dim: Int, nBits: Int, seed: Long)

  private def readMeta(spark: SparkSession, path: String) =
    IndexIO.readMeta(spark, path)

  /** Build a persisted LSH index: one full scan computing the seeded
    * random-hyperplane signature, written as one directory per bucket
    * (2^nBits directories) plus the (dim, nBits, seed) sidecar. Vectors
    * land in exactly one bucket, so the index is the corpus size, not a
    * replicated copy. */
  def buildLsh(emb: DataFrame, id: String, vec: Column, dim: Int, path: String,
      nBits: Int = 8, seed: Long = 42L): Unit = {
    emb.select(col(id), vec.as("vec"),
        AnnSearch.signatureRandom(vec, dim, nBits, seed).as(BucketCol),
        lit(-1L).as(IndexIO.BatchCol))
      // co-locate each bucket before the partitioned write: without this,
      // EVERY task writes a file into every bucket directory it touches —
      // O(tasks x buckets) small files; with it, one task owns a bucket's
      // rows and each directory gets one well-sized file (AQE coalesces
      // the shuffle where buckets are small)
      .repartition(col(BucketCol))
      // static overwrite clears the whole path, including any stale batch
      // directories and sidecar from a previous index
      .write.mode("overwrite").partitionBy(BucketCol, IndexIO.BatchCol).parquet(path)
    // after the parquet commit (overwrite clears the directory first)
    IndexIO.writeMeta(emb.sparkSession, path,
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

  /** Append a vector batch to a persisted index of EITHER flavor: the
    * sidecar's `kind` decides between [[appendLsh]] and [[appendIvf]] —
    * self-describing indexes exist precisely so ingestion code need not
    * carry build-time parameters (or even know the flavor). A crashed
    * compaction swap is repaired first ([[IndexIO.recoverSwap]]), so an
    * index stranded at `__old` is restored instead of read as absent. */
  def append(emb: DataFrame, id: String, vec: Column, path: String,
      batchId: Option[Long] = None): Unit = {
    IndexIO.recoverSwap(emb.sparkSession, path)
    IndexIO.readMeta(emb.sparkSession, path).map(_.path("kind").asText()) match {
      case Some("lsh") => appendLsh(emb, id, vec, path, batchId)
      case Some("ivf") => appendIvf(emb, id, vec, path, batchId)
      case Some("ivfpq") => appendIvfPq(emb, id, vec, path, batchId)
      case Some(other) => throw new IllegalArgumentException(
        s"index sidecar at $path has unrecognized kind '$other' — " +
          "expected 'lsh', 'ivf', or 'ivfpq'")
      case None => throw new IllegalArgumentException(
        s"no index sidecar at $path — build with buildLsh/buildIvf/buildIvfPq first")
    }
  }

  /** Grow a persisted LSH index with a new vector batch — the ANN twin of
    * the incremental-dedup ingestion loop ([[graft.operators.Dedup]]
    * `writeBandIndex(append = true)`): the batch is signed with the
    * index's OWN stored parameters (no caller parameters to diverge) and
    * appended into the bucket directories; existing data is never
    * re-signed or rewritten, and queries see old and new vectors alike
    * through the same pruned probe. Appending to a path that is not a
    * metadata-carrying LSH index fails loudly.
    *
    * `batchId` (set by the streaming ingestion loop) makes the append
    * REPLAY-IDEMPOTENT: the batch's rows land in its own `batch=<id>`
    * partition directories via dynamic partition overwrite, so an
    * at-least-once re-delivery rewrites the same directories with the same
    * rows — served answers are unchanged by crash recovery. A batchId a
    * compaction already folded into the base no-ops (see [[compact]]). */
  def appendLsh(emb: DataFrame, id: String, vec: Column, path: String,
      batchId: Option[Long] = None): Unit = {
    val meta = readLshMeta(emb.sparkSession, path).getOrElse(
      throw new IllegalArgumentException(
        s"no LSH index metadata at $path — build with buildLsh first"))
    if (IndexIO.alreadyCompacted(emb.sparkSession, path, batchId)) return
    IndexIO.writeBatch(
      emb.select(col(id), vec.as("vec"),
          AnnSearch.signatureRandom(vec, meta.dim, meta.nBits, meta.seed).as(BucketCol))
        .repartition(col(BucketCol)), // one well-sized file per touched bucket
      path, batchId, Seq(BucketCol))
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
    * require both values, as before.
    *
    * Served-probe contract: the k-row answer is computed EAGERLY inside a
    * bounded retry on stale-file failures ([[IndexIO.retryStale]]), so a
    * probe that races a concurrent [[compact]]'s atomic swap re-lists and
    * succeeds instead of surfacing a FileNotFound to the caller — answers
    * before and after a compaction are identical, so any attempt's result
    * is THE result. Eager execution is the right cost model here too: the
    * result is <= k rows, and a serving path should not hand back a lazy
    * plan that re-scans the index every time the caller touches it. */
  def lshTopK(spark: SparkSession, path: String, id: String, q: Seq[Double],
      k: Int, nBits: Int = 0, seed: Long = 0L, probes: Int = 0): DataFrame =
    executeProbe(spark)(lshTopKPlan(spark, path, id, q, k, nBits, seed, probes))

  /** The lazy probe plan behind [[lshTopK]] — package-visible so specs can
    * assert on the scan (partition pruning, probe-set filter). */
  private[graft] def lshTopKPlan(spark: SparkSession, path: String, id: String,
      q: Seq[Double], k: Int, nBits: Int = 0, seed: Long = 0L,
      probes: Int = 0): DataFrame = {
    requireIndexPath(spark, path)
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
        AnnSearch.ivfCluster(vec, centroids).as(BucketCol),
        lit(-1L).as(IndexIO.BatchCol))
      .repartition(col(BucketCol)) // see buildLsh: one task per bucket
      .write.mode("overwrite").partitionBy(BucketCol, IndexIO.BatchCol).parquet(path)
    // Double.toString round-trips exactly through Jackson's parse, so the
    // stored centroids compare bit-equal with the build's list
    val cs = centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    IndexIO.writeMeta(emb.sparkSession, path, s"""{"kind": "ivf", "centroids": $cs}""")
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
    * silently shift cluster boundaries under existing data). `batchId`
    * makes the append replay-idempotent — see [[appendLsh]]. */
  def appendIvf(emb: DataFrame, id: String, vec: Column, path: String,
      batchId: Option[Long] = None): Unit = {
    val cs = readIvfCentroids(emb.sparkSession, path).getOrElse(
      throw new IllegalArgumentException(
        s"no IVF index metadata at $path — build with buildIvf first"))
    if (IndexIO.alreadyCompacted(emb.sparkSession, path, batchId)) return
    IndexIO.writeBatch(
      emb.select(col(id), vec.as("vec"),
          AnnSearch.ivfCluster(vec, cs).as(BucketCol))
        .repartition(col(BucketCol)),
      path, batchId, Seq(BucketCol))
  }

  /** Query a persisted IVF index: the query's nProbe nearest centroids
    * become the pruned partition set. Identical answers to
    * [[AnnSearch.ivfTopK]] with the same centroid list.
    *
    * `centroids` defaults to the index's sidecar metadata (empty = unset);
    * an explicit list that disagrees with the sidecar throws — see
    * [[lshTopK]] on why stale parameters must fail loudly. Executes
    * eagerly inside the same bounded stale-listing retry as [[lshTopK]],
    * so probes racing a [[compact]] swap never surface a transient
    * failure. */
  def ivfTopK(spark: SparkSession, path: String, id: String,
      q: Seq[Double], k: Int, nProbe: Int,
      centroids: Seq[Seq[Double]] = Seq.empty): DataFrame =
    executeProbe(spark)(ivfTopKPlan(spark, path, id, q, k, nProbe, centroids))

  /** The lazy probe plan behind [[ivfTopK]] — see [[lshTopKPlan]]. */
  private[graft] def ivfTopKPlan(spark: SparkSession, path: String, id: String,
      q: Seq[Double], k: Int, nProbe: Int,
      centroids: Seq[Seq[Double]] = Seq.empty): DataFrame = {
    requireIndexPath(spark, path)
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
    val probed = AnnSearch.probeCentroids(q, cs, nProbe)
    val df = spark.read.parquet(path)
      .where(col(BucketCol).isin(probed: _*))
    AnnSearch.bruteCosineTopK(df, id, col("vec"), q, k)
  }

  /** Embedding-space incremental near-duplicate detection: which vectors of
    * a NEW batch are near-identical (cosine >= minCos) to a vector already
    * in the persisted LSH index — the ANN twin of
    * [[Dedup.incrementalPairs]], for corpora deduped by embedding rather
    * than shingles. The batch is signed with the index's OWN stored
    * parameters and BROADCAST into the bucket-partitioned index read,
    * joined on the bucket key: the stored corpus is never re-signed and
    * never shuffled — per batch, one columnar scan of (id, vec, bucket)
    * with exact cosine verification inside the join. Candidate recall is
    * the LSH banding contract: a true near-dup shares the bucket unless it
    * straddles a hyperplane (near-identical vectors rarely do; lower nBits
    * at build time trades probe cost for recall).
    *
    * Output: (a = batch id, b = indexed id, cos rounded to 6 — the
    * [[AnnSearch.bruteCosineTopK]] determinism contract). `excludeBatch`
    * is the streaming replay guard shared with the dedup loops: on a
    * re-delivered micro-batch the first attempt's own rows are excluded
    * from the candidate read. Compose with [[append]] for the
    * admit-only-novel ingestion loop. */
  def incrementalNearDup(batch: DataFrame, id: String, vec: Column,
      path: String, minCos: Double,
      excludeBatch: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    IndexIO.recoverSwap(spark, path)
    val meta = readLshMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no LSH index metadata at $path — build with buildLsh first"))
    val signed = batch.select(col(id).as("a"), vec.as("va"),
      AnnSearch.signatureRandom(vec, meta.dim, meta.nBits, meta.seed)
        .cast("long").as("__bk"))
    nearDupAgainstIndex(signed, id, path, minCos, excludeBatch)
  }

  /** The cross-pair half of [[incrementalNearDup]], over an ALREADY-SIGNED
    * batch frame (columns a, va, __bk) — package-visible so the streaming
    * loop, which needs the signed frame for its in-batch self-join too,
    * signs each micro-batch exactly once. */
  private[graft] def nearDupAgainstIndex(signed: DataFrame, id: String,
      path: String, minCos: Double, excludeBatch: Option[Long]): DataFrame = {
    val idx = IndexIO.excludeBatch(
        signed.sparkSession.read.parquet(path), excludeBatch)
      .select(col(id).as("b"), col("vec").cast("array<double>").as("vb"),
        col(BucketCol).cast("long").as("__bk"))
    // Broadcast the batch ONLY while its optimizer size estimate stays
    // under the session's broadcast threshold. A streaming micro-batch is
    // usually tiny and the hint skips a shuffle of the (much larger)
    // index side — but the hint OVERRIDES autoBroadcastJoinThreshold, so
    // an unconditional one turns a caller handing a corpus-sized "batch"
    // (bulk backfill through the incremental path) into a forced
    // driver-memory-sized broadcast at 100x scale. Over-threshold batches
    // take the planner's choice (shuffle join, AQE re-plan to broadcast
    // at runtime if the real size turns out small — the TfIdf vocab-join
    // rationale).
    val threshold =
      signed.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val batch =
      if (threshold > 0 &&
          signed.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold)
        broadcast(signed)
      else signed
    batch.join(idx, Seq("__bk"))
      .where(col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(graft.functions.NativeKernels.cosineSim(col("va"), col("vb")), 6)
          .as("cos"))
      .where(col("cos") >= minCos)
  }

  // ------------------------------------------------------------------ IVF-PQ

  /** Build a persisted IVF-PQ index (the FAISS-default shape at corpus
    * scale): each vector is assigned to its nearest coarse centroid (the
    * partition-pruning key, as in [[buildIvf]]) and stored as its m-byte PQ
    * code ([[graft.functions.NativeKernels.pqEncode]]) — the
    * FULL-PRECISION VECTOR IS NOT STORED. At 100 TB this is the point: a
    * 768-dim float corpus is ~3 KB/vector; its IVF-PQ index is m bytes +
    * one int per vector, small enough to serve from memory, while the full
    * vectors stay in the source table for the caller's exact re-rank of
    * the probe's shortlist ([[Quantize.pqSearch]] shape). Train both
    * stages on a sample: `centroids` via [[AnnSearch.kmeans]], `codebooks`
    * via [[Quantize.pqTrain]]. Because no vectors are stored, [[rebuild]]
    * (re-train from stored vectors) and [[recallProbe]] (needs true
    * distances) do not apply to this flavor — gauge recall against the
    * source table instead. */
  def buildIvfPq(emb: DataFrame, id: String, vec: Column,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      path: String): Unit = {
    emb.select(col(id),
        graft.functions.NativeKernels.pqEncode(vec, codebooks).as("codes"),
        AnnSearch.ivfCluster(vec, centroids).as(BucketCol),
        lit(-1L).as(IndexIO.BatchCol))
      .repartition(col(BucketCol)) // see buildLsh: one task per bucket
      .write.mode("overwrite").partitionBy(BucketCol, IndexIO.BatchCol).parquet(path)
    val cs = centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    val cb = codebooks.map(_.map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    IndexIO.writeMeta(emb.sparkSession, path,
      s"""{"kind": "ivfpq", "centroids": $cs, "codebooks": $cb}""")
  }

  /** The IVF-PQ index's stored (centroids, codebooks), or None for a
    * pre-sidecar index. */
  def readIvfPqMeta(spark: SparkSession, path: String)
      : Option[(Seq[Seq[Double]], Seq[Seq[Seq[Double]]])] =
    readMeta(spark, path).map { n =>
      require(n.path("kind").asText() == "ivfpq",
        s"index at $path is a ${n.path("kind").asText()} index, not IVF-PQ")
      import scala.jdk.CollectionConverters._
      val cents = n.path("centroids").elements().asScala
        .map(c => c.elements().asScala.map(_.asDouble()).toSeq).toSeq
      val books = n.path("codebooks").elements().asScala
        .map(_.elements().asScala
          .map(c => c.elements().asScala.map(_.asDouble()).toSeq).toSeq).toSeq
      (cents, books)
    }

  /** Grow a persisted IVF-PQ index: the batch is encoded and assigned with
    * the index's OWN stored codebooks and centroids (both frozen, as in
    * [[appendIvf]] — re-training either means rebuilding). `batchId` makes
    * the append replay-idempotent — see [[appendLsh]]. */
  def appendIvfPq(emb: DataFrame, id: String, vec: Column, path: String,
      batchId: Option[Long] = None): Unit = {
    val (cs, books) = readIvfPqMeta(emb.sparkSession, path).getOrElse(
      throw new IllegalArgumentException(
        s"no IVF-PQ index metadata at $path — build with buildIvfPq first"))
    if (IndexIO.alreadyCompacted(emb.sparkSession, path, batchId)) return
    IndexIO.writeBatch(
      emb.select(col(id),
          graft.functions.NativeKernels.pqEncode(vec, books).as("codes"),
          AnnSearch.ivfCluster(vec, cs).as(BucketCol))
        .repartition(col(BucketCol)),
      path, batchId, Seq(BucketCol))
  }

  /** Query a persisted IVF-PQ index: the query's nProbe nearest centroids
    * prune the partition listing (as in [[ivfTopK]]); inside the probed
    * buckets each stored CODE is scored by ADC against the query's lookup
    * table ([[Quantize.pqLut]] — m×nCodes doubles built once on the
    * driver) and the top-k by (rounded distance, id) returned. Distances
    * are PQ approximations; for exact ranks, re-rank the returned ids
    * against the full-precision source vectors ([[Quantize.pqSearch]]
    * shape). Executes eagerly under the stale-listing retry like the other
    * flavors. */
  def ivfPqTopK(spark: SparkSession, path: String, id: String,
      q: Seq[Double], k: Int, nProbe: Int): DataFrame =
    executeProbe(spark)(ivfPqTopKPlan(spark, path, id, q, k, nProbe))

  /** The lazy probe plan behind [[ivfPqTopK]] — see [[lshTopKPlan]]. */
  private[graft] def ivfPqTopKPlan(spark: SparkSession, path: String,
      id: String, q: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    requireIndexPath(spark, path)
    val (cs, books) = readIvfPqMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"index at $path has no metadata sidecar — IVF-PQ probes need the " +
          "stored codebooks"))
    val probed = AnnSearch.probeCentroids(q, cs, nProbe)
    spark.read.parquet(path)
      .where(col(BucketCol).isin(probed: _*))
      .select(col(id),
        round(graft.functions.NativeKernels.pqAdcDist(
          col("codes"), Quantize.pqLut(q, books)), 6).as("adc"))
      .orderBy(col("adc"), col(id)).limit(k)
  }

  /** Recall@k gauge for an IVF-PQ index, measured against the SOURCE
    * table — the maintenance loop [[recallProbe]] cannot provide for this
    * flavor, because the index stores only codes and ground truth needs
    * true distances. `source` must hold the full-precision vectors
    * (including the indexed ids); `sampleN` of the INDEX's stored ids
    * (hash-minimal — deterministic) are re-issued as queries, ground truth
    * is exact L2 top-k from one scan of `source` (all queries broadcast),
    * and the served side is the normal pruned ADC probe. The reading
    * captures BOTH loss sources at once — coarse-quantizer drift (wrong
    * bucket pruned) and PQ distortion (wrong ADC rank inside the bucket) —
    * which is what a serving operator actually experiences. When it sags:
    * more nProbe buys back bucket loss; retraining codebooks/centroids
    * and rebuilding ([[buildIvfPq]]) buys back distortion. */
  def ivfPqRecallProbe(spark: SparkSession, path: String, source: DataFrame,
      id: String, vec: Column, k: Int, nProbe: Int,
      sampleN: Int = 32): Double = {
    val queries = IndexIO.retryStale() {
      requireIndexPath(spark, path)
      spark.read.parquet(path)
        .select(col(id).cast("string").as("qid"))
        .orderBy(md5(col("qid")), col("qid")).limit(sampleN)
        .collect().map(_.getString(0))
    }
    if (queries.isEmpty) return 1.0
    val src = source.select(col(id).as("__sid"),
      col(id).cast("string").as("__qid"), vec.as("__v"))
    val qvs = src.where(col("__qid").isin(queries: _*))
      .select(col("__qid"), col("__v"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1).toSeq))
    // sampled ids absent from the source (e.g. appended after the source
    // snapshot) simply drop out of the sample
    if (qvs.isEmpty) return 1.0
    // ground truth from ONE scan: every sample query broadcasts into the
    // source (the [[recallProbe]] shape — per-query scans would re-read a
    // corpus-sized table sampleN times); ties on distance break by the
    // NATIVE id, matching the served probe's ordering
    import org.apache.spark.sql.expressions.Window
    val qdf = spark.createDataFrame(qvs.toSeq).toDF("qid", "qv")
    val w = Window.partitionBy(col("qid")).orderBy(col("d"), col("__sid"))
    val truth = src.crossJoin(broadcast(qdf))
      .select(col("qid"), col("__sid"), col("__qid"),
        round(graft.functions.NativeKernels.l2Dist(col("__v"), col("qv")), 6)
          .as("d"))
      .withColumn("r", row_number().over(w)).where(col("r") <= k)
      .select(col("qid"), col("__qid")).collect()
      .groupBy(_.getString(0))
      .map { case (q, rs) => q -> rs.map(_.getString(1)).toSet }
    val recalls = qvs.map { case (qid, qv) =>
      val served = ivfPqTopK(spark, path, id, qv, k, nProbe)
        .select(col(id).cast("string")).collect().map(_.getString(0)).toSet
      val t = truth.getOrElse(qid, Set.empty)
      if (t.isEmpty) 1.0 else served.intersect(t).size.toDouble / t.size
    }
    recalls.sum / recalls.length
  }

  /** Compact a grown index (LSH or IVF): fold every appended batch back
    * into the `batch=-1` base, restoring the build path's one-well-sized-
    * file-per-bucket discipline. Per-batch appends write one file per
    * touched bucket per batch; after thousands of micro-batches each bucket
    * directory holds thousands of small files and LISTING comes to dominate
    * the probe — eroding exactly the file-pruning advantage the index
    * exists for. Answers are unchanged (same rows, same buckets; only file
    * boundaries move).
    *
    * The rewrite lands in a temp sibling and swaps in atomically
    * ([[IndexIO.swapDirs]]): a crash at any point leaves either the old or
    * the new index fully intact. The sidecar is preserved, with
    * `compactedThrough` set to the highest folded batchId so a committed
    * batch re-delivered ACROSS the compaction no-ops instead of re-adding
    * its rows.
    *
    * `through` bounds the fold to batchIds <= it, leaving newer batch
    * partitions untouched. Offline (streams stopped cleanly, the default
    * `None` = fold everything) every batch is committed and foldable; the
    * streaming ingestion loop ([[graft.streaming.StreamOps
    * .annIndexAppendStream]] with `compactEvery`) compacts from INSIDE
    * batch N's `foreachBatch` and must pass `through = N - 1`: only
    * batches before the current one are checkpoint-committed, and the
    * current batch's own partition has to survive so an at-least-once
    * re-delivery still dynamic-overwrites it (and, on the dedup twins,
    * still finds it to EXCLUDE from the candidate read — folded-in rows
    * would match the replayed batch against itself).
    *
    * Serving probes ride through the swap: [[lshTopK]]/[[ivfTopK]] execute
    * under a bounded stale-listing retry, so a probe that listed files
    * just before the swap re-lists and answers — answers before and after
    * are identical, so which side of the swap a probe lands on is
    * unobservable. */
  /** A probe against a missing index root throws FileNotFoundException —
    * NOT the "no sidecar" IllegalArgumentException — so the retry wrapper
    * classifies the mid-swap window (the root is briefly absent between
    * [[IndexIO.swapDirs]]'s two renames) as transient and re-probes; a
    * genuinely absent index exhausts the bound and surfaces as FNF. */
  private def requireIndexPath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      throw new java.io.FileNotFoundException(s"no index at $path")
  }

  /** Materialize a probe plan under the bounded stale-listing retry and
    * re-wrap the (<= k) rows as a local DataFrame: the plan is re-BUILT on
    * each attempt (the thunk re-lists the index's files), which is what
    * makes the retry effective — re-running the same stale plan would just
    * fail on the same vanished files. */
  private def executeProbe(spark: SparkSession)(plan: => DataFrame): DataFrame =
    IndexIO.retryStale() {
      val df = plan
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    }

  /** Measured recall@k of the SERVED index against brute force, on a
    * deterministic sample of its own stored vectors — the maintenance
    * gauge for quantizer drift: the IVF coarse quantizer is frozen by
    * design ([[appendIvf]]), so appends whose distribution has drifted
    * from the build-time training set scatter true neighbors across
    * buckets the probe never visits, and recall sags SILENTLY (answers
    * stay plausible, nothing errors). Run this periodically; when it
    * sags, [[rebuild]].
    *
    * `sampleN` stored vectors (hash-minimal ids — deterministic and
    * partitioning-independent) are re-issued as queries; ground truth for
    * ALL of them comes from ONE corpus scan (the queries broadcast into
    * it, the same shape as the streaming ANN batch), served answers from
    * the normal pruned probes. Works on either index flavor (`nProbe` =
    * IVF probe count, or LSH multi-probe buckets). Returns mean
    * |served ∩ truth| / k over the sample.
    *
    * Live-index caveat: the gauge reads the index twice (truth scan, then
    * per-query probes); batches committed BETWEEN the two appear in the
    * served answers but not in the truth set and deflate the reading
    * slightly. Against a heavily-appending index, treat readings as a
    * trend across runs, not a single-sample alarm — or pause ingestion
    * for an exact gauge. */
  def recallProbe(spark: SparkSession, path: String, id: String, k: Int,
      nProbe: Int, sampleN: Int = 32): Double = {
    // the sample and ground-truth scans ride through a concurrent
    // compaction swap exactly like the served probes — recall is the one
    // action documented safe to run against a live, compacting index
    val (queries, truth, kind) = IndexIO.retryStale() {
      requireIndexPath(spark, path)
      val kind = IndexIO.readMeta(spark, path).map(_.path("kind").asText())
        .getOrElse(throw new IllegalArgumentException(
          s"no index sidecar at $path — recallProbe needs a self-describing index"))
      require(kind != "ivfpq", "recallProbe needs the stored full-precision " +
        "vectors for ground truth; an IVF-PQ index stores only codes — gauge " +
        "recall against the source table instead")
      // keep the NATIVE id for ordering: the served side's tie-break
      // (bruteCosineTopK) orders by the id's native type, and a
      // string-cast tie-break here would disagree on tied cosines
      // (common among near-duplicate vectors) — reporting false sag on a
      // healthy index
      val stored = spark.read.parquet(path)
        .select(col(id).as("__oid"), col(id).cast("string").as("__qid"),
          col("vec").cast("array<double>").as("v"))
      val queries = stored
        .orderBy(md5(col("__qid")), col("__qid")).limit(sampleN)
        .collect().map(r => (r.getString(1), r.getSeq[Double](2)))
      if (queries.isEmpty) (queries, Map.empty[String, Set[String]], kind)
      else {
        // ground truth: one scan, all sample queries broadcast against it
        import org.apache.spark.sql.expressions.Window
        val qdf = spark.createDataFrame(queries.toSeq).toDF("qid", "qv")
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("__oid"))
        val truth = stored.crossJoin(broadcast(qdf))
          .select(col("qid"), col("__oid"), col("__qid"),
            round(graft.functions.NativeKernels.cosineSim(col("v"), col("qv")), 6)
              .as("cos"))
          .withColumn("r", row_number().over(w)).where(col("r") <= k)
          .select(col("qid"), col("__qid")).collect()
          .groupBy(_.getString(0))
          .map { case (q, rs) => q -> rs.map(_.getString(1)).toSet }
        (queries, truth, kind)
      }
    }
    if (queries.isEmpty) return 1.0
    val recalls = queries.map { case (qid, qv) =>
      val served = (kind match {
        case "lsh" => lshTopK(spark, path, id, qv, k, probes = nProbe)
        case "ivf" => ivfTopK(spark, path, id, qv, k, nProbe)
        case other => throw new IllegalArgumentException(
          s"index sidecar at $path has unrecognized kind '$other'")
      }).select(col(id).cast("string")).collect().map(_.getString(0)).toSet
      val t = truth(qid)
      if (t.isEmpty) 1.0 else served.intersect(t).size.toDouble / t.size
    }
    recalls.sum / recalls.length
  }

  /** Re-train the IVF coarse quantizer from the CURRENT stored vectors and
    * atomically swap in the re-bucketed index — the recovery action when
    * [[recallProbe]] reports drift-induced sag. The centroid count is
    * preserved; every stored vector is re-assigned and the batch
    * partitions fold into the base (a rebuild subsumes a [[compact]]), so
    * run it like an offline compaction: ingestion streams stopped cleanly.
    * Served probes ride through the swap via their stale-listing retry;
    * answers change only in the way a rebuild exists to change them
    * (buckets reflect today's distribution, `compactedThrough` advances so
    * a batch replayed across the rebuild no-ops). */
  def rebuild(spark: SparkSession, path: String, id: String,
      iters: Int = 10, trainPct: Int = 100): Unit = {
    IndexIO.recoverSwap(spark, path)
    val old = readIvfCentroids(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no IVF index metadata at $path — rebuild re-trains an IVF quantizer"))
    val df = spark.read.parquet(path)
    val maxBatch = df.agg(max(col(IndexIO.BatchCol).cast("long"))).head.getLong(0)
    val through = math.max(maxBatch, IndexIO.compactedThrough(spark, path))
    val cents = AnnSearch.kmeans(df, id, col("vec"), old.size, iters, trainPct)
    val tmp = path + "__compacting"
    df.select(col(id), col("vec"),
        AnnSearch.ivfCluster(col("vec"), cents).as(BucketCol),
        lit(-1L).as(IndexIO.BatchCol))
      .repartition(col(BucketCol)) // see buildLsh: one task per bucket
      .write.mode("overwrite").partitionBy(BucketCol, IndexIO.BatchCol).parquet(tmp)
    val cs = cents.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    IndexIO.writeMeta(spark, tmp,
      s"""{"kind": "ivf", "centroids": $cs, "compactedThrough": $through}""")
    IndexIO.swapDirs(spark, path, tmp)
  }

  def compact(spark: SparkSession, path: String,
      through: Option[Long] = None): Unit = {
    // a compact re-run after a crashed swap must first restore the index
    // (path may be stranded at __old with a complete __compacting beside it)
    IndexIO.recoverSwap(spark, path)
    val df = spark.read.parquet(path)
    val maxBatch = df.agg(max(col(IndexIO.BatchCol).cast("long"))).head.getLong(0)
    val fold = math.min(through.getOrElse(maxBatch), maxBatch)
    val tmp = path + "__compacting"
    val b = col(IndexIO.BatchCol).cast("long")
    df.withColumn(IndexIO.BatchCol, when(b <= fold, lit(-1L)).otherwise(b))
      .repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol, IndexIO.BatchCol).parquet(tmp)
    IndexIO.writeMeta(spark, tmp,
      IndexIO.metaWithCompactedThrough(spark, path, fold))
    IndexIO.swapDirs(spark, path, tmp)
  }
}
