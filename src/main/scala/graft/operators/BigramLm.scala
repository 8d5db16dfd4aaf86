package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted bigram language models: fit on a TRUSTED corpus once, score
  * any other corpus against the stored model — the deployment shape of the
  * CCNet perplexity filter (Wenzek et al. 2020 train their LM on
  * Wikipedia and score Common Crawl with it), where
  * [[TfIdf.bigramQuality]] is the one-shot self-scored form of the same
  * signal.
  *
  * Unlike the NB/DSIR models (vocabulary-capped / bucket-bounded weight
  * maps that fit on the driver), a bigram table is quadratic-ish in
  * vocabulary and CANNOT be a driver-side map at corpus scale. The model
  * therefore persists as parquet TABLES under one directory —
  * `<path>/bigrams` (a, b, lp) and `<path>/unigrams` (w, lb) — plus the
  * [[IndexIO.MetaFile]] sidecar (kind/lambda/totals/floor), and scoring
  * JOINS the stored tables instead of broadcasting a map: Catalyst
  * broadcasts them while their size estimate stays under
  * `autoBroadcastJoinThreshold` and falls back to a shuffled join beyond
  * it — the same adaptive posture as [[TfIdf.corpusFreqQuality]]'s vocab
  * join, and the only posture that survives a 100 TB training corpus.
  *
  * Probability model (λ = lambdaPpm/1e6, counts from the FIT corpus,
  * T = total tokens, V = vocabulary size):
  *  - bigram seen:     p = λ·c(a,b)/ch(a) + (1−λ)·c(b)/T   (lp, stored)
  *  - bigram unseen,
  *    word b seen:     p = (1−λ)·c(b)/T                    (lb, stored)
  *  - word b unseen:   p = (1−λ)·1/(T+V)                   (floor, sidecar)
  * The unseen-bigram case is the interpolation with an exactly-zero
  * bigram factor, and the unseen-word floor sits strictly below every
  * seen word's backoff (1/(T+V) < 1/T ≤ c(b)/T), so OOV text always
  * scores worse than in-vocabulary text. Every factor is one fixed-order
  * IEEE expression over exact integer counts; ln() carries the usual
  * ≤1-ulp libm spread, which the round-6 scored output absorbs (the
  * [[TfIdf.bigramQuality]] determinism contract).
  */
object BigramLm {

  /** Fit a bigram LM on `docs` and persist it at `path`. One
    * map-side-combined shuffle for the bigram counts, head totals derived
    * from that already-reduced frame, one more for the unigram counts;
    * the corpus total and vocabulary reduce to one scalar row. Nothing
    * driver-sized: the stored tables stream out of the aggregates. */
  def fit(spark: SparkSession, docs: DataFrame, tokens: Column,
      path: String, lambdaPpm: Long = 750000L): Unit = {
    require(lambdaPpm > 0 && lambdaPpm < 1000000L,
      s"lambdaPpm must be in (0, 1e6): $lambdaPpm")
    val lam = lambdaPpm.toDouble / 1000000.0
    val ts = Dedup.spread(docs).select(tokens.as("ts"))
    val uni = ts.select(explode_outer(col("ts")).as("w"))
      .where(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("cu"))
      .persist()
    try {
      val tot = uni.agg(sum("cu"), count(lit(1))).collect()(0)
      val t = if (tot.isNullAt(0)) 0L else tot.getLong(0)
      val v = tot.getLong(1)
      require(t > 0, "cannot fit a bigram LM on an empty/token-less corpus")
      val bigrams = ts.select(explode_outer(
          arrays_zip(
            slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
            slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0)))))
          .as("__bg"))
        .where(col("__bg").isNotNull)
        .select(col("__bg.0").as("a"), col("__bg.1").as("b"))
      val bigCnt = bigrams.groupBy("a", "b").agg(count(lit(1)).as("cb"))
      val headCnt = bigCnt.groupBy("a").agg(sum("cb").as("ch"))
      bigCnt.join(headCnt, "a")
        .join(uni.withColumnRenamed("w", "b"), "b")
        .select(col("a"), col("b"),
          log(lit(lam) * (col("cb").cast("double") / col("ch")) +
            lit(1.0 - lam) * (col("cu").cast("double") / lit(t.toDouble)))
            .as("lp"))
        .write.mode("overwrite").parquet(s"$path/bigrams")
      uni.select(col("w"),
          log(lit(1.0 - lam) * (col("cu").cast("double") / lit(t.toDouble)))
            .as("lb"))
        .write.mode("overwrite").parquet(s"$path/unigrams")
      val floor = math.log((1.0 - lam) * (1.0 / (t + v).toDouble))
      IndexIO.writeMeta(spark, path,
        s"""{"kind":"bigram_lm","lambda_ppm":$lambdaPpm,""" +
          s""""total_tokens":$t,"vocab":$v,"floor_lp":$floor}""")
    } finally uni.unpersist()
  }

  /** Score `df` against the model persisted at `path`:
    * (doc_id, n_bigrams, n_oov, logq) where n_oov counts bigrams that
    * missed the stored bigram table (backoff or floor applied) and logq
    * is the round-6 mean log-probability — the same output contract as
    * [[TfIdf.bigramQuality]] plus the OOV diagnostic. Documents with
    * fewer than 2 tokens emit no row.
    *
    * Plan: the document bigram stream left-joins the stored bigram table
    * on (a, b) and the stored unigram table on the successor, coalescing
    * hit → backoff → floor — two threshold-governed equi-joins and one
    * doc-keyed aggregation; the corpus is never collected or sorted. */
  def score(spark: SparkSession, df: DataFrame, id: Column, tokens: Column,
      path: String): DataFrame = {
    val meta = IndexIO.readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no model sidecar at $path"))
    val kind = meta.path("kind").asText("")
    require(kind == "bigram_lm",
      s"the sidecar at $path names kind '$kind', not a bigram_lm model")
    val floor = meta.path("floor_lp").asDouble()
    val big = spark.read.parquet(s"$path/bigrams")
    val uni = spark.read.parquet(s"$path/unigrams")
    Dedup.spread(df).select(id.as("doc_id"), tokens.as("ts"))
      .select(col("doc_id"), explode_outer(
        arrays_zip(
          slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
          slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0)))))
        .as("__bg"))
      .where(col("__bg").isNotNull)
      .select(col("doc_id"), col("__bg.0").as("a"), col("__bg.1").as("b"))
      .join(big, Seq("a", "b"), "left")
      .join(uni.withColumnRenamed("w", "b"), Seq("b"), "left")
      .select(col("doc_id"), col("lp").isNull.as("__miss"),
        coalesce(col("lp"), col("lb"), lit(floor)).as("__p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__miss"), 1L).otherwise(0L)).as("n_oov"),
        round(sum(col("__p")) / count(lit(1)), 6).as("logq"))
  }
}
