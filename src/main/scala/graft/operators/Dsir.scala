package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
  * "Data Selection for Language Models via Importance Resampling") — the
  * standard recipe for tilting a raw web crawl toward a small high-quality
  * target corpus: fit two bag-of-hashed-n-gram unigram models (one on the
  * raw corpus, one on the target), weight every raw document by the
  * log-likelihood ratio of its features under the two models, then sample
  * the training set with Gumbel-top-k so the kept set follows the
  * importance distribution instead of just its mode.
  *
  * Scale design (100 TB): the feature space is HASHED to a bounded bucket
  * count `buckets` (the paper uses 10k), so both fitted "models" are
  * ≤ `buckets`-row frames — broadcast-safe by construction. Fitting is one
  * `groupBy(bucket)` over the exploded feature stream (map-side partial
  * counts shuffle at most `buckets` rows per task); model totals are
  * unpartitioned windows over that bucket aggregate — ≤ `buckets` rows,
  * never the corpus — so the whole log-ratio table is ONE lineage with a
  * single corpus scan behind it. Scoring broadcast-joins that tiny table
  * back to the feature stream and reduces per document (one shuffle keyed
  * by the document id). Selection never sorts the corpus through one
  * task: [[resample]] is a global top-k (`TakeOrdered`, per-partition
  * heaps + a k-row driver merge). Every hash is the engine-portable md5
  * prefix from [[Sampling.hashPpm]]'s family, so weights — and the kept
  * set — are reproducible across engines, partitionings, and reruns.
  */
object Dsir {

  /** Hard cap on the hashed feature space: the fitted models and the
    * broadcast log-ratio table are `buckets`-row frames, so the parameter
    * bounds driver and executor memory. 2^20 buckets ≈ 24 MB broadcast —
    * far past the paper's 10k default. */
  val MaxBuckets: Int = 1 << 20

  /** Word unigram + bigram features of a token-array column, duplicates
    * kept (these are COUNT features, not a set). The bigram join uses a
    * single space, matching [[graft.functions.NativeKernels.wordShingles2]]
    * minus its distinct. */
  def features(tokens: Column): Column = {
    val bigrams = when(size(tokens) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(tokens, lit(1), size(tokens) - 1),
        slice(tokens, lit(2), size(tokens) - 1),
        (a, b) => concat(a, lit(" "), b)))
    concat(tokens, bigrams)
  }

  /** Portable hash bucket in [0, buckets): first 8 hex chars of the md5 of
    * the feature string, mod `buckets` — the [[Sampling.hashPpm]] contract
    * generalized to an arbitrary modulus, so a DuckDB/Trino twin computes
    * the identical bucket from the identical bytes. */
  def bucket(feature: Column, buckets: Int): Column =
    pmod(conv(substring(md5(feature), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** The exploded hashed-feature stream (id, b): one row per feature
    * OCCURRENCE, plus one null-bucket row per FEATURELESS document
    * (explode_outer) — so the scoring aggregate covers every document in
    * one pass and no re-attach join (a second corpus scan) is ever
    * needed. Narrow (projection + explode), no shuffle. */
  private def featureStream(df: DataFrame, id: Column, tokens: Column,
      buckets: Int): DataFrame =
    Dedup.spread(df) // under-split sources: don't tokenize on one core
      .select(id.as("id"), explode_outer(features(tokens)).as("__g"))
      .select(col("id"), bucket(col("__g"), buckets).as("b"))

  /** The per-bucket log-likelihood-ratio table from a joined count frame
    * (b, cr, ct) with nullable sides (a full outer join of the two
    * models' bucket counts). Totals are unpartitioned windows — legal
    * here and only here, because the frame is ≤ 2·buckets rows by
    * construction. Rows whose bucket never occurs in the RAW corpus are
    * dropped after totals (they can never be looked up by a raw
    * document); absent-in-target buckets take the add-one smoothing
    * floor `ln(1 / (target_total + buckets))`. */
  private def llrTable(joined: DataFrame, buckets: Int): DataFrame = {
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bkts = lit(buckets.toDouble)
    joined
      .withColumn("__tr",
        sum(coalesce(col("cr"), lit(0L))).over(all).cast("double"))
      .withColumn("__tt",
        sum(coalesce(col("ct"), lit(0L))).over(all).cast("double"))
      .where(col("cr").isNotNull)
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("__tt") + bkts))
          - log((col("cr") + lit(1.0)) / (col("__tr") + bkts))).as("llr"))
  }

  /** Shared scoring tail: LEFT-join the per-bucket log-ratio (a
    * ≤ buckets-row broadcast) back to the raw feature stream and reduce
    * per document. The stream carries a null-bucket row for featureless
    * documents (see [[featureStream]]), so one aggregate covers the whole
    * corpus — `count(b)` skips the null marker, the null llr sums away to
    * the 0-weight contract. Every real bucket is in the table by
    * construction (it came from the raw counts), so the left join loses
    * nothing else. */
  private def score(rawFeats: DataFrame, llr: DataFrame): DataFrame =
    rawFeats.join(broadcast(llr), Seq("b"), "left")
      .groupBy("id")
      .agg(count(col("b")).as("n_feats"),
        coalesce(sum("llr"), lit(0.0)).as("weight"))

  /** Importance weights of `raw` documents against a separate `target`
    * corpus — the paper's setting (target = a small curated corpus, raw =
    * the crawl). Returns (id, n_feats, weight) for EVERY raw document
    * (featureless documents weight 0). `weight` is
    * `sum over feature occurrences of ln p_target(bucket) - ln p_raw(bucket)`
    * with add-one smoothing on both models; a larger weight means the
    * document looks more like the target than like the crawl. */
  def weightsAgainst(raw: DataFrame, rawId: Column, rawTokens: Column,
      target: DataFrame, targetTokens: Column,
      buckets: Int = 10000): DataFrame = {
    require(buckets >= 2 && buckets <= MaxBuckets,
      s"buckets must be in [2, $MaxBuckets]: $buckets")
    // cached: consumed by the raw bucket counts AND the scoring join's
    // probe side (see weights below)
    val rawFeats = graft.util.CacheScope.register(
      featureStream(raw, rawId, rawTokens, buckets).cache())
    val rawCnt = rawFeats.where(col("b").isNotNull)
      .groupBy("b").agg(count(lit(1)).as("cr"))
    val tgtCnt = featureStream(target, lit(0L), targetTokens, buckets)
      .where(col("b").isNotNull)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    // full outer: the target total must count target-only buckets too
    score(rawFeats, llrTable(rawCnt.join(tgtCnt, Seq("b"), "full"), buckets))
  }

  /** Importance weights in the single-frame form: the target corpus is
    * the subset of `df` where `isTarget` holds (the tagged-union shape a
    * SQL oracle can express). Both models fit in ONE pass over the
    * feature stream — a conditional aggregate per bucket — and every
    * target bucket is a raw bucket by construction, so no outer join is
    * needed. */
  def weights(df: DataFrame, id: Column, tokens: Column, isTarget: Column,
      buckets: Int = 10000): DataFrame = {
    require(buckets >= 2 && buckets <= MaxBuckets,
      s"buckets must be in [2, $MaxBuckets]: $buckets")
    // cached: the feature stream feeds BOTH the bucket-count aggregate
    // (the broadcast model side) and the scoring join's probe side in one
    // plan — without the cache the tokenize + feature-hash pass runs
    // twice (the model stage materializes the cache; the probe reads it)
    val feats = graft.util.CacheScope.register(Dedup.spread(df)
      .select(id.as("id"), isTarget.as("__t"),
        explode_outer(features(tokens)).as("__g"))
      .select(col("id"), col("__t"), bucket(col("__g"), buckets).as("b"))
      .cache())
    val cnt = feats.where(col("b").isNotNull)
      .groupBy("b").agg(count(lit(1)).as("cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
    score(feats.select("id", "b"), llrTable(cnt, buckets))
  }

  /** A fitted DSIR model: the per-bucket log-likelihood-ratio table plus
    * the two model totals. `llr` is driver-resident — bounded by
    * [[MaxBuckets]] (≤ ~25 MB at the cap, ~160 KB at the paper-default
    * 10k), the same vocabulary-bounded-model discipline as
    * [[QualityClassifier.NbModel]]. The totals make scoring OPEN-WORLD:
    * a bucket never seen at fit time (new vocabulary in a later corpus)
    * contributes [[DsirModel.floor]] — both models' add-one smoothing
    * floors — instead of being silently dropped. */
  case class DsirModel(buckets: Int, rawTotal: Double, tgtTotal: Double,
      llr: Map[Long, Double]) {
    /** Contribution of a bucket absent from the fitted table:
      * `ln(1/(tgtTotal+buckets)) - ln(1/(rawTotal+buckets))`. */
    def floor: Double =
      math.log(1.0 / (tgtTotal + buckets)) -
        math.log(1.0 / (rawTotal + buckets))
  }

  /** Fit the model in the single-frame tag form (target = rows where
    * `isTarget`). One corpus pass: the conditional bucket-count aggregate
    * collects (≤ `buckets` rows, see [[DsirModel]]); llr and totals are
    * derived driver-side from the exact integer counts, so refitting is
    * bit-identical. */
  def fit(df: DataFrame, tokens: Column, isTarget: Column,
      buckets: Int = 10000): DsirModel = {
    require(buckets >= 2 && buckets <= MaxBuckets,
      s"buckets must be in [2, $MaxBuckets]: $buckets")
    val cnt = Dedup.spread(df)
      .select(isTarget.as("__t"),
        explode(features(tokens)).as("__g"))
      .select(col("__t"), bucket(col("__g"), buckets).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    fromCounts(buckets, cnt)
  }

  /** Fit against a separate target corpus (the paper's setting). Two
    * aggregates, merged driver-side — target-only buckets count toward
    * the target total but are dropped from the table (a raw document can
    * never look them up; open-world scoring floors them anyway). */
  def fitAgainst(raw: DataFrame, rawTokens: Column, target: DataFrame,
      targetTokens: Column, buckets: Int = 10000): DsirModel = {
    require(buckets >= 2 && buckets <= MaxBuckets,
      s"buckets must be in [2, $MaxBuckets]: $buckets")
    def counts(df: DataFrame, tokens: Column): Map[Long, Long] =
      Dedup.spread(df).select(explode(features(tokens)).as("__g"))
        .select(bucket(col("__g"), buckets).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawCnt = counts(raw, rawTokens)
    val tgtCnt = counts(target, targetTokens)
    fromCounts(buckets,
      rawCnt.toSeq.map { case (b, cr) => (b, cr, tgtCnt.getOrElse(b, 0L)) },
      tgtTotalOverride = Some(tgtCnt.values.sum))
  }

  /** The shared driver-side tail: totals + per-bucket llr from exact
    * integer counts. */
  private def fromCounts(buckets: Int, cnt: Seq[(Long, Long, Long)],
      tgtTotalOverride: Option[Long] = None): DsirModel = {
    val rawTotal = cnt.map(_._2).sum.toDouble
    val tgtTotal = tgtTotalOverride.getOrElse(cnt.map(_._3).sum).toDouble
    val llr = cnt.map { case (b, cr, ct) =>
      b -> (math.log((ct + 1.0) / (tgtTotal + buckets)) -
        math.log((cr + 1.0) / (rawTotal + buckets)))
    }.toMap
    DsirModel(buckets, rawTotal, tgtTotal, llr)
  }

  /** Score a corpus against a FITTED model: (id, n_feats, weight) for
    * every document, unseen buckets at [[DsirModel.floor]], featureless
    * documents at weight 0 — one narrow feature pass, a broadcast join
    * against the ≤ buckets-row table, one id-keyed reduce. This is the
    * train-once/score-many form the persisted model serves; on the SAME
    * corpus the model was fitted on it reproduces [[weights]] to
    * summation-order (every bucket is then in the table). */
  def scoreWith(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      id: Column, tokens: Column, model: DsirModel): DataFrame = {
    import spark.implicits._
    val llrDf = model.llr.toSeq.toDF("b", "llr")
    featureStream(df, id, tokens, model.buckets)
      .join(broadcast(llrDf), Seq("b"), "left")
      .groupBy("id")
      .agg(count(col("b")).as("n_feats"),
        sum(when(col("b").isNull, lit(0.0))
          .otherwise(coalesce(col("llr"), lit(model.floor))))
          .as("weight"))
  }

  /** Persist a fitted model: the llr table as parquet (b, llr) plus the
    * [[IndexIO.MetaFile]] sidecar carrying kind/buckets/totals — the
    * same directory-plus-sidecar discipline as the ANN indexes and the
    * NB/BPE models. */
  def save(spark: org.apache.spark.sql.SparkSession, model: DsirModel,
      path: String): Unit = {
    import spark.implicits._
    model.llr.toSeq.toDF("b", "llr")
      .repartition(1) // ≤ buckets rows — one file
      .write.mode("overwrite").parquet(path)
    IndexIO.writeMeta(spark, path,
      s"""{"kind":"dsir","buckets":${model.buckets},""" +
        s""""raw_total":${model.rawTotal},"tgt_total":${model.tgtTotal}}""")
  }

  /** Load a model persisted by [[save]]; fails fast on a missing or
    * foreign-kind sidecar. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): DsirModel = {
    val meta = IndexIO.readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no model sidecar at $path"))
    val kind = meta.path("kind").asText("")
    require(kind == "dsir",
      s"the sidecar at $path names kind '$kind', not a dsir model")
    val llr = spark.read.parquet(path).select(col("b"), col("llr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    DsirModel(meta.path("buckets").asInt(), meta.path("raw_total").asDouble(),
      meta.path("tgt_total").asDouble(), llr)
  }

  /** Deterministic Gumbel noise in the id: `-ln(-ln(u))` with
    * `u = (hashPpm(id) + 0.5) / 1e6` — the engine-portable stand-in for
    * the paper's fresh Gumbel draws, so a rerun (or another engine)
    * selects the identical set. */
  def gumbel(id: Column): Column =
    -log(-log((Sampling.hashPpm(id).cast("double") + lit(0.5)) / lit(1e6)))

  /** Gumbel-top-k importance resampling: keep the k documents maximizing
    * `weight / temperature + Gumbel(id)` — sampling without replacement
    * proportional to `exp(weight / temperature)` (the Gumbel-max trick;
    * Vieira 2014), degenerating to hard top-k as temperature → 0. A
    * global TakeOrdered: per-partition heaps, k-row driver merge, no
    * corpus sort. The selection key is kept (`sel_key`) so the chosen set
    * is auditable; it is rounded to 6 decimals BEFORE ordering (id as the
    * tiebreak) so the kept set is bit-portable across engines — the
    * transcendental key is the one place a last-ulp `ln` difference could
    * otherwise flip a selection at the k-boundary. */
  def resample(scored: DataFrame, id: Column, weight: Column, k: Int,
      temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    scored
      .withColumn("sel_key",
        round(weight / lit(temperature) + gumbel(id), 6))
      .orderBy(col("sel_key").desc, id)
      .limit(k)
  }
}
