package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document characteristic-term extraction (tf·idf top-k) — the
  * "what is this document about" feature a corpus-curation pipeline uses
  * for topic balancing and near-topic dedup triage.
  *
  * The idf factor is the rational ratio N/df, not log(N/df): log is a
  * transcendental whose last ulp differs across libm implementations, while
  * integer multiply and one correctly-rounded IEEE division are bit-exact
  * in every engine — a hard requirement for the cross-engine oracle gate.
  * (The rankings differ from log-idf in general; this is this library's
  * documented scoring definition, not an approximation of another one.)
  *
  * Scale design (100 TB): one shuffle for the (doc, term) counts (map-side
  * combined), one shuffle keyed on term to attach document frequencies, one
  * window keyed on doc for the top-k rank — each a plain hash shuffle on a
  * high-cardinality key, nothing global. The corpus-size N joins in as a
  * broadcast 1-row frame (no driver collect in the plan).
  */
object TfIdf {

  /** Top-k terms per document: (doc_id, term, tf, score, rank) where
    * score = tf * N / df, rank 1..k by (score desc, term asc). */
  def topTerms(docs: DataFrame, id: Column, tokens: Column, k: Int): DataFrame = {
    // token array materialized below an explode_OUTER + not-null guard —
    // same rationale as Contamination.sharedShingleCounts: a plain explode
    // of the composed expression lets InferFiltersFromGenerate push the
    // whole tokenization below the spread repartition onto the raw scan
    // (single-core on an under-split source), and the Generate's lambda
    // re-derives the expression per element. Null token ELEMENTS (which
    // wordTokens never produces) are dropped rather than counted as a term.
    val words = Dedup.spread(docs).select(id.as("doc_id"), tokens.as("ts"))
      .select(col("doc_id"), explode_outer(col("ts")).as("term"))
      .where(col("term").isNotNull)
    // (doc, term) counts feed BOTH the document-frequency aggregate and
    // the scoring join: cached, or the whole tokenize + count subtree runs
    // once per consumer (a second full corpus pass). Distinct-terms-per-
    // doc sized, far below the occurrence stream it reduces.
    val tf = graft.util.CacheScope.register(
      words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).cache())
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"),
        col("score"), col("rank").cast("long").as("rank"))
  }

  /** Language-model quality proxy in its unigram/rational form: the mean
    * CORPUS frequency of a document's tokens, in parts per million
    * (`freq_ppm` = sum(cnt(tok)) / n_tokens / total_tokens * 1e6).
    *
    * Perplexity-based filtering (the CCNet recipe) ranks documents by how
    * "expected" their text is under a reference LM and drops both tails —
    * junk (rare-token soup scores low) and boilerplate (scores
    * extreme-high). This is that signal's degenerate unigram form, scored
    * against the corpus itself: no external model, deterministic, and — as
    * with the rational idf above — free of log-space transcendentals, so
    * the score is bit-exact across engines (integer count sums, then one
    * fixed-order IEEE expression). This is the library's documented scoring
    * definition, not an approximation of a specific perplexity value.
    *
    * Scale design: one shuffle for the vocabulary counts (map-side
    * combined, result CACHED — it feeds both the corpus-total aggregate
    * and the scoring join, and is vocabulary-sized, not corpus-sized), the
    * scoring join broadcasts the vocab into the token stream WHILE ITS
    * SIZE ESTIMATE stays under `autoBroadcastJoinThreshold` (corpus tokens
    * never shuffle for it then; there is deliberately no explicit hint —
    * the vocabulary is corpus-derived and unbounded, and a
    * threshold-exceeding vocab falling back to a shuffled join is the
    * right adaptive behavior, not a bug), then one doc-keyed aggregation;
    * the corpus total joins as a broadcast 1-row frame. Two corpus
    * tokenize passes total (vocab build + scoring stream). Zero-token
    * documents have no defined score and emit no row. */
  /** The bigram upgrade of [[corpusFreqQuality]]: per-document mean
    * log-probability under a Jelinek-Mercer-interpolated bigram language
    * model fit on the corpus itself — the actual SHAPE of CCNet's
    * perplexity filter (Wenzek et al. 2020 §4.2), where the unigram form
    * above is its degenerate approximation. For a document
    * w_1..w_m (m >= 2):
    *
    *   logq = mean_i ln( λ·c(w_{i-1},w_i)/ch(w_{i-1})
    *                   + (1−λ)·c(w_i)/T )
    *
    * with c = corpus bigram/unigram counts, ch(w) = count of w as a bigram
    * HEAD (so the bigram factor is a proper conditional that sums to 1
    * over the successor vocabulary), T = total corpus tokens, and
    * λ = `lambdaPpm`/1e6. Self-scored on the training corpus every factor
    * is positive, so no further smoothing is needed; junk text (rare
    * continuations) scores very negative, boilerplate scores near 0.
    * Higher = more expected. Returns (doc_id, n_bigrams, logq) with logq
    * ROUNDED to 6 decimals; documents with fewer than 2 tokens have no
    * bigram and emit no row.
    *
    * Determinism: counts are exact integers and each factor is one
    * fixed-order IEEE expression, but ln() can differ by 1 ulp across
    * libm implementations and the per-document sum adds in partition
    * order — the round-6 output absorbs that spread (the
    * [[QualityClassifier]]/[[Dsir]] discipline), it is not bit-exact
    * before rounding.
    *
    * Scale design (100 TB): the log-probability is attached to the
    * DISTINCT-bigram table first — bigram counts (one map-side-combined
    * shuffle), head totals derived FROM that table (a second aggregate of
    * the already-reduced frame, never the corpus), unigram counts joined
    * on the successor, corpus total as a broadcast 1-row frame — so the
    * expensive per-occurrence work is ONE equi-join of the document
    * bigram stream against that table (threshold-governed broadcast,
    * exactly as [[corpusFreqQuality]]'s vocab join) plus one doc-keyed
    * aggregation. Nothing driver-sized, nothing global. */
  def bigramQuality(docs: DataFrame, id: Column, tokens: Column,
      lambdaPpm: Long = 750000L): DataFrame = {
    require(lambdaPpm > 0 && lambdaPpm < 1000000L,
      s"lambdaPpm must be in (0, 1e6): $lambdaPpm")
    val lam = lambdaPpm.toDouble / 1000000.0
    // (doc_id, a, b) per bigram occurrence; the token array materializes
    // above the spread repartition (see topTerms on why)
    // ONE tokenize pass, eager-cached: the bigram stream is consumed
    // twice (its count aggregate and the final scoring join) and the
    // unigram stream once more — without the cache the corpus pays the
    // tokenize kernel three times (see corpusFreqQuality).
    val toks = graft.util.CacheScope.eager(
      Dedup.spread(docs).select(id.as("doc_id"), tokens.as("ts")))
    val bigrams = toks
      .select(col("doc_id"), explode_outer(
        arrays_zip(
          slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
          slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0)))))
        .as("__bg"))
      .where(col("__bg").isNotNull)
      .select(col("doc_id"), col("__bg.0").as("a"), col("__bg.1").as("b"))
    val words = toks
      .select(explode_outer(col("ts")).as("w"))
      .where(col("w").isNotNull)
    val uni = graft.util.CacheScope.register(
      words.groupBy("w").agg(count(lit(1)).as("cu")).cache())
    val total = uni.agg(sum("cu").as("t_tok"))
    val bigCnt = graft.util.CacheScope.register(
      bigrams.groupBy("a", "b").agg(count(lit(1)).as("cb")).cache())
    val headCnt = bigCnt.groupBy("a").agg(sum("cb").as("ch"))
    // per-DISTINCT-bigram log-probability, each factor in fixed IEEE order
    val logp = bigCnt.join(headCnt, "a")
      .join(uni.withColumnRenamed("w", "b"), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"),
        log(lit(lam) * (col("cb").cast("double") / col("ch")) +
          lit(1.0 - lam) * (col("cu").cast("double") / col("t_tok")))
          .as("__lp"))
    bigrams.join(logp, Seq("a", "b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__lp")) / count(lit(1)), 6).as("logq"))
  }

  def corpusFreqQuality(docs: DataFrame, id: Column, tokens: Column): DataFrame = {
    // explode_outer + not-null guard: see topTerms on why the token array
    // materializes above the spread repartition. The token frame is
    // tokenized ONCE and eager-cached: both consumers below (vocabulary
    // aggregate, scoring stream) would otherwise each pay the full corpus
    // tokenize pass — the cache trades one columnar write + two reads for
    // the second pass, the same call the winnowing operators make for
    // their fingerprint frames.
    val toks = graft.util.CacheScope.eager(
      Dedup.spread(docs).select(id.as("doc_id"), tokens.as("ts")))
    val words = toks
      .select(col("doc_id"), explode_outer(col("ts")).as("tok"))
      .where(col("tok").isNotNull)
    // cache lifetime: LRU-shed MEMORY_AND_DISK, same policy as the minhash
    // signature frames — without it the whole tokenize+count subtree runs
    // once per consumer (a third full corpus pass for the 1-row total)
    val vocab = graft.util.CacheScope.register(
      words.groupBy("tok").agg(count(lit(1)).as("cnt")).cache())
    val total = vocab.agg(sum("cnt").as("total"))
    words.join(vocab, "tok")
      .groupBy("doc_id").agg(sum("cnt").as("sum_cnt"), count(lit(1)).as("n_tok"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(col("sum_cnt").cast("double") * 1000000.0 / col("n_tok") / col("total"), 6)
          .as("freq_ppm"))
  }
}
