package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus profiling with MERGEABLE sketches — the bookkeeping layer a
  * 100 TB curation pipeline runs continuously: per-group document counts,
  * byte/token volume, and distinct-cardinality sketches (vocabulary size,
  * unique-document count) that can be UNIONED across batches, shards, and
  * days without ever rescanning the data that produced them. Exact
  * `count(distinct ...)` does not compose this way — two exact counts of
  * two batches say nothing about their union — which is why the profile
  * carries DataSketches HLL (cardinality, compact, fixed-size) and Theta
  * (cardinality + SET ALGEBRA: intersection/difference, enabling
  * cross-corpus overlap estimates) binaries alongside the exact additive
  * counters. All sketch kernels are Spark's own codegen'd DataSketches
  * aggregates (`hll_sketch_agg` / `theta_sketch_agg` and their union
  * folds) — one shuffle on the group key, map-side partials, no UDFs.
  *
  * Identity convention: a document's sketch identity is `md5(text)` (the
  * repo's exact-dedup fingerprint — collision odds ~D²/2¹²⁹); vocabulary
  * identity is the token string itself.
  */
object Profile {

  /** Per-group profile of one frame: `keys...`, exact additive counters
    * (`n_docs`, `n_chars`, `n_tokens`), exact distincts (`n_distinct_docs`
    * unique fingerprints, `n_vocab` distinct tokens), and the mergeable
    * sketch twins (`doc_hll`, `vocab_hll`, `doc_theta` binaries). The
    * exact distincts cost an extra shuffle each and do NOT merge across
    * profiles — they exist for oracle checks and small-corpus reporting;
    * at ingestion scale call [[partialProfile]] per batch and fold with
    * [[mergeProfiles]], which touches only counters and sketches. */
  def profile(df: DataFrame, keys: Seq[Column], text: Column,
      tokens: Column): DataFrame = {
    val base = Dedup.spread(df).select(
      keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") } ++ Seq(
        md5(encode(text, "UTF-8")).as("__fp"),
        length(text).cast("long").as("__chars"),
        tokens.as("__toks")): _*)
      .withColumn("__ntoks", coalesce(size(col("__toks")).cast("long"), lit(0L)))
    val keyCols = keys.indices.map(i => col(s"__k$i"))
    // vocabulary distincts need the exploded token stream; the sketch side
    // aggregates it in the same pass as the exact count
    val vocab = base.select(keyCols :+ explode_outer(col("__toks")).as("__t"): _*)
      .groupBy(keyCols: _*)
      .agg(count_distinct(col("__t")).as("n_vocab"),
        hll_sketch_agg(col("__t")).as("vocab_hll"))
    val counters = base.groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("n_chars"),
        sum(col("__ntoks")).as("n_tokens"),
        count_distinct(col("__fp")).as("n_distinct_docs"),
        hll_sketch_agg(col("__fp")).as("doc_hll"),
        theta_sketch_agg(col("__fp")).as("doc_theta"))
    joinOnKeysNullSafe(counters, vocab, keys.size)
  }

  /** Inner-join two per-key aggregates NULL-SAFELY on the `__k*` columns —
    * a plain equi-join inserts IsNotNull on its keys and a null-keyed
    * group (documents with no language tag, say) would silently vanish
    * from the profile. Both sides are aggregates of the same frame, so
    * every key exists on both. */
  private def joinOnKeysNullSafe(left: DataFrame, right: DataFrame,
      nKeys: Int): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    val cond = (0 until nKeys)
      .map(i => col(s"l.__k$i") <=> col(s"r.__k$i"))
      .reduceOption(_ && _).getOrElse(lit(true))
    l.join(r, cond)
      .select((0 until nKeys).map(i => col(s"l.__k$i").as(s"__k$i")) ++
        left.columns.filterNot(_.startsWith("__k")).map(c => col(s"l.$c")) ++
        right.columns.filterNot(_.startsWith("__k")).map(c => col(s"r.$c")): _*)
  }

  /** The ingestion-scale per-batch profile: counters + sketches only (no
    * exact distincts — nothing here needs a second shuffle or fails to
    * merge). Append each batch's rows to one parquet dir; fold any subset
    * with [[mergeProfiles]]. */
  def partialProfile(df: DataFrame, keys: Seq[Column], text: Column,
      tokens: Column): DataFrame = {
    val base = Dedup.spread(df).select(
      keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") } ++ Seq(
        md5(encode(text, "UTF-8")).as("__fp"),
        length(text).cast("long").as("__chars"),
        tokens.as("__toks")): _*)
      .withColumn("__ntoks", coalesce(size(col("__toks")).cast("long"), lit(0L)))
    val keyCols = keys.indices.map(i => col(s"__k$i"))
    val vocab = base.select(keyCols :+ explode_outer(col("__toks")).as("__t"): _*)
      .groupBy(keyCols: _*)
      .agg(hll_sketch_agg(col("__t")).as("vocab_hll"))
    val counters = base.groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("n_chars"),
        sum(col("__ntoks")).as("n_tokens"),
        hll_sketch_agg(col("__fp")).as("doc_hll"),
        theta_sketch_agg(col("__fp")).as("doc_theta"))
    joinOnKeysNullSafe(counters, vocab, keys.size)
  }

  /** Fold a frame of [[partialProfile]] rows (multiple batches' profiles
    * unioned or read back from parquet) into one profile per key: counters
    * add, sketches union — the whole fold reads ONLY profile rows, never
    * the corpus. Output carries the estimated distincts
    * (`est_distinct_docs`, `est_vocab`, rounded to whole counts) plus the
    * still-mergeable union sketches. */
  def mergeProfiles(profiles: DataFrame, nKeys: Int): DataFrame = {
    val keyCols = (0 until nKeys).map(i => col(s"__k$i"))
    profiles.groupBy(keyCols: _*)
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_tokens")).as("n_tokens"),
        hll_union_agg(col("doc_hll")).as("doc_hll"),
        theta_union_agg(col("doc_theta")).as("doc_theta"),
        hll_union_agg(col("vocab_hll")).as("vocab_hll"))
      .select(keyCols ++ Seq(
        col("n_docs"), col("n_chars"), col("n_tokens"),
        round(hll_sketch_estimate(col("doc_hll"))).cast("long")
          .as("est_distinct_docs"),
        round(hll_sketch_estimate(col("vocab_hll"))).cast("long")
          .as("est_vocab"),
        col("doc_hll"), col("doc_theta"), col("vocab_hll")): _*)
  }

  /** The profile TIME SERIES behind a stored partial-profile dir: one row
    * per (batch, key) with that batch's OWN counters and sketch estimates
    * plus the CUMULATIVE-through-batch fold — "how did the corpus grow,
    * and how much of each batch was new?" — computed entirely from
    * profile rows, never rescanning the corpus. A batch that appended
    * several partial rows per key (multiple shards) folds first; the
    * cumulative side is a running window union of the batch sketches
    * ordered by `batchCol` (exact additive sums for the counters).
    *
    * Scale shape: the input is PROFILE rows — O(batches x keys), bounded
    * by bookkeeping cardinality, not corpus size — so the per-key window
    * is a small shuffle however big the corpus was. `delta_est_docs` =
    * cumulative-distinct growth vs the previous batch: near-zero marks a
    * batch of already-seen documents (a stalled or looping crawl) without
    * any dedup join. */
  def profileSeries(profiles: DataFrame, nKeys: Int,
      batchCol: String = "batch_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = (0 until nKeys).map(i => col(s"__k$i"))
    val perBatch = profiles
      .groupBy((col(batchCol).as("batch") +: keyCols): _*)
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_tokens")).as("n_tokens"),
        hll_union_agg(col("doc_hll")).as("doc_hll"),
        theta_union_agg(col("doc_theta")).as("doc_theta"),
        hll_union_agg(col("vocab_hll")).as("vocab_hll"))
    val w = Window.partitionBy(keyCols: _*).orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBatch.select(keyCols ++ Seq(
        col("batch"),
        col("n_docs"), col("n_chars"), col("n_tokens"),
        round(theta_sketch_estimate(col("doc_theta"))).cast("long")
          .as("est_distinct_docs"),
        round(hll_sketch_estimate(col("vocab_hll"))).cast("long")
          .as("est_vocab"),
        sum(col("n_docs")).over(w).as("cum_n_docs"),
        sum(col("n_chars")).over(w).as("cum_n_chars"),
        sum(col("n_tokens")).over(w).as("cum_n_tokens"),
        round(theta_sketch_estimate(theta_union_agg(col("doc_theta")).over(w)))
          .cast("long").as("cum_est_distinct_docs"),
        round(hll_sketch_estimate(hll_union_agg(col("vocab_hll")).over(w)))
          .cast("long").as("cum_est_vocab")): _*)
      .withColumn("delta_est_docs",
        col("cum_est_distinct_docs") -
          coalesce(lag(col("cum_est_distinct_docs"), 1).over(
            Window.partitionBy(keyCols: _*).orderBy(col("batch"))), lit(0L)))
  }

  /** Estimated set relations between two corpora from their document
    * fingerprints — ONE ROW: |A|, |B|, |A ∩ B|, |A ∪ B|, and the Jaccard
    * estimate — computed from two theta sketches, so each corpus is
    * scanned once and the intersection costs NO join (the cross-corpus
    * question "how much of crawl B do we already have?" without shuffling
    * either side). Estimates are DataSketches Theta accuracy (~1-2% at
    * default lgK); for exact overlap on small frames use
    * [[Contamination]] / exact dedup instead. */
  def overlap(a: DataFrame, textA: Column, b: DataFrame, textB: Column): DataFrame = {
    val sa = Dedup.spread(a).select(md5(encode(textA, "UTF-8")).as("fp"))
      .agg(theta_sketch_agg(col("fp")).as("s")).select(col("s").as("sa"))
    val sb = Dedup.spread(b).select(md5(encode(textB, "UTF-8")).as("fp"))
      .agg(theta_sketch_agg(col("fp")).as("s")).select(col("s").as("sb"))
    sa.crossJoin(sb) // 1 row x 1 row
      .select(
        round(theta_sketch_estimate(col("sa"))).cast("long").as("est_a"),
        round(theta_sketch_estimate(col("sb"))).cast("long").as("est_b"),
        round(theta_sketch_estimate(theta_intersection(col("sa"), col("sb"))))
          .cast("long").as("est_intersection"),
        round(theta_sketch_estimate(theta_union(col("sa"), col("sb"))))
          .cast("long").as("est_union"))
      .withColumn("est_jaccard",
        when(col("est_union") === 0L, lit(0.0))
          .otherwise(col("est_intersection").cast("double") / col("est_union")))
  }
}
