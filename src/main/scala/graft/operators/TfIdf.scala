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
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
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
  def corpusFreqQuality(docs: DataFrame, id: Column, tokens: Column): DataFrame = {
    // explode_outer + not-null guard: see topTerms on why the token array
    // materializes above the spread repartition
    val words = Dedup.spread(docs).select(id.as("doc_id"), tokens.as("ts"))
      .select(col("doc_id"), explode_outer(col("ts")).as("tok"))
      .where(col("tok").isNotNull)
    // cache lifetime: LRU-shed MEMORY_AND_DISK, same policy as the minhash
    // signature frames — without it the whole tokenize+count subtree runs
    // once per consumer (a third full corpus pass for the 1-row total)
    val vocab = words.groupBy("tok").agg(count(lit(1)).as("cnt")).cache()
    val total = vocab.agg(sum("cnt").as("total"))
    words.join(vocab, "tok")
      .groupBy("doc_id").agg(sum("cnt").as("sum_cnt"), count(lit(1)).as("n_tok"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(col("sum_cnt").cast("double") * 1000000.0 / col("n_tok") / col("total"), 6)
          .as("freq_ppm"))
  }
}
