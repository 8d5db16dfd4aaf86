package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher quality-rule filter (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", §A1.1) —
  * the classic rule battery every later corpus pipeline (MassiveText,
  * RefinedWeb, Dolma) starts from: document-length and word-shape bounds,
  * symbol and bullet/ellipsis occupancy, alphabetic-word density, and a
  * minimal stop-word requirement.
  *
  * Every rule here is an EXACT integer comparison (`3·n_words ≤ n_chars`
  * instead of `mean ≥ 3.0`), so the verdicts are bit-portable across
  * engines — the [[graft.functions.TextKernels]] determinism discipline —
  * and the whole battery is one narrow codegen projection per document:
  * no shuffle, no UDFs, nothing driver-side. At 100 TB this runs as a
  * scan-speed filter ahead of the expensive dedup/classifier stages.
  *
  * Thresholds are the published Gopher values; `minWords`/`maxWords` are
  * parameters because the 50/100k defaults assume web pages, not code or
  * chat turns.
  */
object QualityRules {

  /** The Gopher stop-word probe set: a real document mentions at least
    * [[MinStopWords]] of these function words. A PARAMETER on every
    * entry point because the published set assumes English web prose —
    * a code or non-English corpus substitutes its own probe words. */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val MinStopWords = 2

  /** The per-rule verdict columns over a raw `text` column, in declaration
    * order: (name, predicate). Tokenization matches
    * [[graft.functions.TextKernels.wordTokens]] (whitespace split); line
    * rules split on '\n'. */
  private def verdicts(text: Column, minWords: Long, maxWords: Long,
      stopWords: Seq[String]): Seq[(String, Column)] = {
    val w = graft.functions.TextKernels.wordTokens(text)
    val nWords = size(w).cast("long")
    // sum of word lengths, NOT length(text): whitespace runs must not
    // count toward the mean word length
    val nChars = aggregate(w, lit(0L), (a, x) => a + length(x).cast("long"))
    val nSymbols = (regexp_count(text, lit("#")) +
      regexp_count(text, lit("\\.\\.\\.|…"))).cast("long")
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines,
      l => trim(l).rlike("^([\\*•‣◦-]\\s|\\d+[.)]\\s)"))).cast("long")
    val ellipsisLines = size(filter(lines,
      l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val stopHits = stopWords
      .map(sw => when(array_contains(w, sw), 1).otherwise(0))
      .reduce(_ + _)
    Seq(
      "ok_words" -> (nWords >= minWords && nWords <= maxWords),
      // exact rational thresholds: integer cross-multiplication, no doubles
      "ok_word_len" ->
        (lit(3L) * nWords <= nChars && nChars <= lit(10L) * nWords),
      "ok_symbols" -> (lit(10L) * nSymbols <= nWords),
      "ok_alpha" -> (lit(5L) * alphaWords >= lit(4L) * nWords),
      "ok_bullets" -> (lit(10L) * bulletLines <= lit(9L) * nLines),
      "ok_ellipsis" -> (lit(10L) * ellipsisLines <= lit(3L) * nLines),
      "ok_stop" -> (stopHits >= MinStopWords))
  }

  /** Per-document rule verdicts + the conjunction, as one narrow
    * projection: (id, n_words, ok_words, ok_word_len, ok_symbols,
    * ok_alpha, ok_bullets, ok_ellipsis, ok_stop, pass). */
  def gopher(df: DataFrame, id: Column, text: Column,
      minWords: Long = 50L, maxWords: Long = 100000L,
      stopWords: Seq[String] = StopWords): DataFrame = {
    val vs = verdicts(text, minWords, maxWords, stopWords)
    val nWords =
      size(graft.functions.TextKernels.wordTokens(text)).cast("long")
    df.select(id.as("id") +: nWords.as("n_words") +:
      vs.map { case (n, c) => c.as(n) }: _*)
      .withColumn("pass", vs.map(_._1).map(col).reduce(_ && _))
  }

  /** The `pass` conjunction as a single scalar predicate — the form a
    * WHERE clause or a [[graft.streaming.StreamOps.curationStream]] gate
    * uses directly. */
  def gopherPass(text: Column, minWords: Long = 50L,
      maxWords: Long = 100000L,
      stopWords: Seq[String] = StopWords): Column =
    verdicts(text, minWords, maxWords, stopWords).map(_._2).reduce(_ && _)

  /** The filter form: rows whose document passes every rule, original
    * columns intact — a plain WHERE over the inline verdict (a pure
    * projection of the row), never a join. */
  def gopherFilter(df: DataFrame, text: Column, minWords: Long = 50L,
      maxWords: Long = 100000L,
      stopWords: Seq[String] = StopWords): DataFrame =
    df.where(gopherPass(text, minWords, maxWords, stopWords))
}
