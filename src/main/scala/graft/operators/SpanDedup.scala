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
  * `groupBy` over the sliding windows — Spark's scan-sort-shuffle
  * machinery replaces the suffix array the way SURVEY §7 replaces the
  * reference's hand-built trees. The shuffle key is the window's 128-bit
  * md5 fingerprint, NOT the n-token string: the corpus-wide aggregate and
  * the occurrence back-join move 16-byte binaries instead of ~n-word
  * strings (3-4× less shuffle at n = 8, and a far smaller aggregate hash
  * table), the same fingerprint-equality discipline as
  * [[Dedup.exactGroups]]. Two distinct grams colliding in 128 bits
  * (≈ D²/2¹²⁹ for D distinct windows — ~10⁻¹³ even at 10⁸ TB-scale
  * corpora) is the only way a non-repeated window can be marked; windows
  * with equal text always fingerprint equal, so no true duplicate is ever
  * missed. Window extraction is a narrow projection + posexplode; the
  * duplicate-fingerprint set comes from one map-side-combined aggregation
  * (HAVING count ≥ minCount prunes it to the boilerplate tail, a tiny
  * fraction of distinct windows); island merging is a per-document
  * window over duplicate windows only; the cut itself is a narrow map
  * (the [[graft.functions.NativeKernels.cutSpans]] two-pointer kernel)
  * over each document's ≤ len/(n+1)+1 merged spans — no per-token
  * explode, no (id, position) shuffle, no per-document collect/sort.
  * No driver-side state, no UDFs, no collect.
  */
object SpanDedup {

  /** Sliding n-token windows of a token-array column as
    * (pos, fingerprint) pairs: the fingerprint is the md5 of
    * `tokens[pos..pos+n)` joined by single spaces, one window per start
    * position (stride 1, exactly Lee et al.'s every-suffix probe at token
    * granularity). The gram string is never even built — the native
    * kernel streams token bytes straight into the digest — and only the
    * 16-byte fingerprint is exploded and shuffled. Documents shorter than
    * n yield no windows. */
  private def windows(df: DataFrame, id: Column, tokens: Column,
      n: Int): DataFrame =
    Dedup.spread(df) // under-split sources: don't fingerprint on one core
      .select(id.as("id"),
        graft.functions.NativeKernels.windowFingerprints(tokens, n).as("__w"))
      .select(col("id"), posexplode(col("__w")).as(Seq("pos", "f")))

  /** The duplicate windows (id, pos): every window whose text occurs at
    * least `minCount` times corpus-wide (by fingerprint equality — see
    * the object doc for the 2⁻¹²⁸ bound). One aggregation to find the
    * repeated fingerprints, one equi-join to locate their occurrences;
    * both shuffles carry 16-byte keys. */
  private def duplicateWindows(df: DataFrame, id: Column, tokens: Column,
      n: Int, minCount: Long): DataFrame = {
    // cached: the window stream feeds BOTH the repeated-fingerprint
    // aggregate and the occurrence join — one tokenize + fingerprint pass
    // instead of two (the aggregate materializes the cache first)
    val win = graft.util.CacheScope.register(windows(df, id, tokens, n).cache())
    val dupF = win.groupBy("f").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .select("f")
    win.join(dupF, Seq("f")).select("id", "pos")
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
    * round-trip). The merged spans of [[spans]] are disjoint, so covered
    * tokens = Σ span lengths and the cut is one two-pointer pass of the
    * native kernel over each document's sorted span list — the heavy
    * corpus-wide fingerprint subtree is consumed once, and the only
    * per-document state joined back is the ≤ len/(n+1)+1 merged spans. */
  def removeSpans(df: DataFrame, id: Column, tokens: Column, n: Int = 8,
      minCount: Long = 2L): DataFrame = {
    require(n >= 2, s"window length must be >= 2 tokens: $n")
    require(minCount >= 2, s"minCount below 2 removes everything: $minCount")
    val perDoc = spans(df, id, tokens, n, minCount)
      .groupBy("id")
      .agg(sort_array(collect_list(struct(
        col("span_start").cast("long").as("s"),
        col("span_end").cast("long").as("e")))).as("__spans"))
    val noSpans = array().cast("array<struct<s:bigint,e:bigint>>")
    df.select(id.as("id"), tokens.as("__toks"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(col("__spans"), noSpans).as("__spans"),
        col("__toks"))
      .select(col("id"), col("n_tokens"),
        // a null token array explodes to zero kept rows, so the exploded
        // form reported n_removed = n_tokens there (whatever size(null)
        // evaluates to under the session's ANSI setting) — mirror it
        when(col("__toks").isNull, col("n_tokens"))
          .otherwise(aggregate(col("__spans"), lit(0L),
            (acc, s) => acc + s.getField("e") - s.getField("s")))
          .as("n_removed"),
        coalesce(
          graft.functions.NativeKernels.cutSpans(col("__toks"), col("__spans")),
          lit("")).as("text_clean"))
  }
}
