package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide EXACT duplicate-span removal (Lee et al., ACL 2022,
  * "Deduplicating Training Data Makes Language Models Better" — the
  * ExactSubstr variant, at word-token granularity): find every n-token
  * window whose exact text occurs ≥ `minCount` times ACROSS the corpus,
  * merge overlapping hits into maximal spans per document, and cut the
  * covered tokens out — leaving each document's unique prose intact.
  *
  * This is the memorization killer the near-dup operators cannot be:
  * MinHash/SimHash drop whole near-identical DOCUMENTS, and winnowing
  * reports aligned spans between PAIRS, but boilerplate (license headers,
  * navigation chrome, quoted tweets) repeats across thousands of
  * otherwise-unrelated pages and must be removed WITHIN documents by
  * corpus-global frequency — exactly this operator.
  *
  * Scale design (100 TB): the reference implementation builds one giant
  * suffix array; here the same predicate (an n-token window repeats) is a
  * `groupBy(gram)` over the sliding windows — Spark's scan-sort-shuffle
  * machinery replaces the suffix array the way SURVEY §7 replaces the
  * reference's hand-built trees. Window extraction is a narrow
  * projection + posexplode; the duplicate-gram set comes from one
  * map-side-combined aggregation (HAVING count ≥ minCount prunes it to
  * the boilerplate tail, a tiny fraction of distinct grams); the
  * back-join is a plain equi-join on the gram; island merging and text
  * reassembly are per-document windows/aggregates — partitioned by id,
  * bounded by document length, never corpus-wide. No driver-side state,
  * no UDFs, no collect.
  */
object SpanDedup {

  /** Sliding n-token windows of a token-array column as (pos, gram) pairs:
    * `gram = tokens[pos..pos+n)` joined by single spaces, one window per
    * start position (stride 1, exactly Lee et al.'s every-suffix probe at
    * token granularity). Documents shorter than n yield no windows. */
  private def windows(df: DataFrame, id: Column, tokens: Column,
      n: Int): DataFrame =
    df.select(id.as("id"),
        when(size(tokens) < n, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), size(tokens) - lit(n)),
            i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
          .as("__w"))
      .select(col("id"), posexplode(col("__w")).as(Seq("pos", "gram")))

  /** The duplicate windows (id, pos): every window whose gram text occurs
    * at least `minCount` times corpus-wide. One aggregation to find the
    * repeated grams, one equi-join to locate their occurrences. */
  private def duplicateWindows(df: DataFrame, id: Column, tokens: Column,
      n: Int, minCount: Long): DataFrame = {
    val win = windows(df, id, tokens, n)
    val dupGrams = win.groupBy("gram").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .select("gram")
    win.join(dupGrams, Seq("gram")).select("id", "pos")
  }

  /** Maximal duplicated spans per document: (id, span_start, span_end,
    * n_windows) with token-index bounds `[span_start, span_end)`.
    * Overlapping or exactly-adjacent duplicate windows merge into one
    * span (two abutting windows cover one contiguous duplicated region),
    * so spans are disjoint with ≥ 1 unique token between them. The
    * gaps-and-islands pass is a lag + running-sum window partitioned by
    * the document — windows are fixed-length, so the running maximum of
    * span ends is simply the previous start + n, and a new island begins
    * exactly when `pos > prev_pos + n`. */
  def spans(df: DataFrame, id: Column, tokens: Column, n: Int = 8,
      minCount: Long = 2L): DataFrame = {
    require(n >= 2, s"window length must be >= 2 tokens: $n")
    require(minCount >= 2, s"minCount below 2 marks everything: $minCount")
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val run = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    duplicateWindows(df, id, tokens, n, minCount)
      .withColumn("__brk",
        when(col("pos") > lag(col("pos"), 1).over(byDoc) + lit(n), 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__brk")).over(run))
      .groupBy("id", "__isl")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("id", "span_start", "span_end", "n_windows")
  }

  /** Cut every duplicated span out of every document: (id, n_tokens,
    * n_removed, text_clean) for ALL input rows — documents made entirely
    * of boilerplate come back with empty `text_clean`, untouched
    * documents come back verbatim (modulo the whitespace-token
    * round-trip). Coverage is computed per POSITION (explode each
    * duplicate window into the ≤ n positions it covers, distinct), so the
    * cut is exact even where spans from different repeated grams
    * interleave; reassembly is a per-document sorted aggregate — bounded
    * by document length, shuffled by id only. */
  def removeSpans(df: DataFrame, id: Column, tokens: Column, n: Int = 8,
      minCount: Long = 2L): DataFrame = {
    require(n >= 2, s"window length must be >= 2 tokens: $n")
    require(minCount >= 2, s"minCount below 2 removes everything: $minCount")
    val covered = duplicateWindows(df, id, tokens, n, minCount)
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val toks = df.select(id.as("id"), posexplode(tokens).as(Seq("p", "tok")))
    // removed = total - kept, so the expensive covered-position subtree
    // (the corpus-wide gram shuffle) is consumed exactly once
    val kept = toks.join(covered, Seq("id", "p"), "left_anti")
      .groupBy("id")
      .agg(count(lit(1)).as("__n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            s => s.getField("tok"))).as("text_clean"))
    df.select(id.as("id"), size(tokens).cast("long").as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
