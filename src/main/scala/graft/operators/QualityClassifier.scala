package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned document-quality scoring: binomial Naive Bayes over word
  * tokens, trained from labeled seed sets — the classifier-filter stage of
  * GPT-3/CCNet-style curation (score every crawl document by similarity to
  * a trusted corpus vs a junk corpus, then gate or temperature-sample on
  * the score) in a fully distributed, deterministic form. Complements the
  * heuristic signals ([[graft.functions.TextKernels]] stats,
  * [[TfIdf.corpusFreqQuality]]): those need no labels; this learns
  * whatever separates YOUR seed sets.
  *
  * Scale design (100 TB): training is ONE map-side-combined
  * (token, label) count aggregate — the only driver materialization is
  * the vocabulary-bounded weight table (capped at `maxVocab` by absolute
  * log-likelihood ratio, deterministic tie-break), never the corpus.
  * Scoring explodes tokens against the BROADCAST weight table and sums
  * per document — one hash shuffle keyed by the document id, map-side
  * combined.
  *
  * Determinism: weights are pure functions of integer counts; scores sum
  * doubles in partition order, so they are deterministic per partitioning
  * (the [[AnnSearch.kmeans]] caveat) — stable enough for gating, not
  * bit-portable across engines, which is why the oracle-checked quality
  * queries stay on the rational-arithmetic signals. */
object QualityClassifier {

  /** A trained model: `prior` = ln(N_pos/N_neg) over DOCUMENTS, `weights`
    * = per-token Laplace-smoothed log-likelihood ratios
    * ln(P(t|pos)) - ln(P(t|neg)). */
  final case class NbModel(prior: Double, weights: Map[String, Double])

  /** Train from a labeled frame: `tokens` is a word-array column (e.g.
    * [[graft.functions.NativeKernels.wordTokens]]), `label` a boolean
    * column — true = the trusted/positive seed set. Duplicate tokens in a
    * document count multiply (standard multinomial NB). */
  def train(docs: DataFrame, tokens: Column, label: Column,
      maxVocab: Int = 65536): NbModel = {
    val base = docs.select(tokens.as("__t"), label.as("__l"))
    val nDocs = base.groupBy("__l").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val nPos = nDocs.getOrElse(true, 0L)
    val nNeg = nDocs.getOrElse(false, 0L)
    require(nPos > 0 && nNeg > 0,
      s"both classes need documents (pos=$nPos, neg=$nNeg)")
    val counts = base
      .select(explode(col("__t")).as("t"), col("__l"))
      .groupBy("t")
      .agg(sum(when(col("__l"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("__l"), 0L).otherwise(1L)).as("cn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totPos = counts.map(_._2).sum
    val totNeg = counts.map(_._3).sum
    val v = counts.length.toLong
    val weights = counts.map { case (t, cp, cn) =>
      t -> (math.log((cp + 1.0) / (totPos + v)) -
        math.log((cn + 1.0) / (totNeg + v)))
    }
    // vocabulary cap: keep the most DISCRIMINATIVE tokens (highest |llr|),
    // ties to the lexicographically smaller token — deterministic
    val kept =
      if (weights.length <= maxVocab) weights
      else weights.sortBy { case (t, w) => (-math.abs(w), t) }.take(maxVocab)
    NbModel(math.log(nPos.toDouble / nNeg), kept.toMap)
  }

  /** (id, score) per document: the prior plus the summed weights of its
    * tokens (unseen/capped-out tokens contribute 0; a token-less document
    * scores the bare prior). Higher = more like the positive seed set;
    * gate on a threshold or feed [[Sampling.byRate]] as an acceptance
    * curve. */
  def score(df: DataFrame, id: Column, tokens: Column,
      model: NbModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = model.weights.toSeq.toDF("t", "__llr")
    df.select(id.as("id"), explode_outer(tokens).as("t"))
      .join(broadcast(w), Seq("t"), "left")
      .groupBy("id")
      .agg((sum(coalesce(col("__llr"), lit(0.0))) + model.prior).as("score"))
  }
}
