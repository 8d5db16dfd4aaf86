package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: how many distinct shingles does each training
  * document share with the union of an eval/benchmark set's shingles?
  *
  * Scale design (100 TB): benchmark sets are tiny relative to the corpus,
  * so the eval shingle union builds once and BROADCASTS into the corpus
  * scan — the corpus itself is never shuffled by the join; the per-document
  * count is a two-phase hash aggregate over the matched rows only.
  */
object Contamination {

  /** (id, n_shingles, n_shared) for every non-eval document with at least
    * one shingle: its distinct-shingle count and how many of those appear
    * in the eval set's shingle union. `shingles` must be a distinct-element
    * array column (e.g. TextKernels.wordShingles2). Both counts come from
    * ONE aggregation over a left join against the broadcast eval set, so
    * the corpus is scanned once and never shuffled by the join. The usual
    * contamination rule is the RATIO n_shared / n_shingles (an absolute
    * count mis-fires on corpora with a shared common vocabulary); documents
    * with zero shingles emit no row — left-join the doc list for a full
    * listing. */
  def sharedShingleCounts(docs: DataFrame, id: Column, shingles: Column,
      isEval: Column): DataFrame = {
    // Materialize the shingle array in its own projection below the
    // explode (a composed shingle expression handed straight to explode()
    // is re-derived inside the Generate's lambda per element access), and
    // use explode_OUTER + an explicit not-null guard instead of explode:
    // for a plain explode, InferFiltersFromGenerate synthesizes a
    // `size(gs) > 0` predicate whose pushdown drags the ENTIRE shingle
    // expression below the spread repartition onto the raw scan — on an
    // under-split source that serializes the corpus tokenization onto one
    // core (measured 11.5s vs 1s at sf0.1). No filter is inferred for an
    // outer generate, and a predicate on the GENERATED column cannot be
    // pushed below the Generate, so the guard stays where the work is
    // already parallel.
    // NOT cached (optimization r16 note): the two consumers below filter
    // on is_eval — a plain column predicate Catalyst pushes below the
    // shingle projection onto the scan — so they shingle DISJOINT row
    // subsets and together cost one corpus pass; caching the array frame
    // would shingle every row once AND pay the columnar write/read on
    // top (measured slower).
    val sh = Dedup.spread(docs)
      .select(id.as("id"), isEval.as("is_eval"), shingles.as("gs"))
      .select(col("id"), col("is_eval"), explode_outer(col("gs")).as("g"))
      .where(col("g").isNotNull)
    val evalSet = sh.where(col("is_eval")).select(col("g")).distinct()
      .withColumn("hit", lit(1))
    sh.where(!col("is_eval"))
      .join(broadcast(evalSet), Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_shared"))
  }

  /** The removal step decontamination exists for: drop every non-eval
    * document whose shared-shingle RATIO reaches `minRatio`, return the
    * survivors with their original columns intact. Documents with zero
    * shingles share nothing with the eval set and are kept. Eval rows
    * themselves are excluded from the output — the result is the cleaned
    * TRAINING corpus.
    *
    * Scale design: [[sharedShingleCounts]] scans the corpus once against
    * the broadcast eval union; the flagged-id set is then joined back
    * `left_anti` on the id. Flagged documents are near-copies of a
    * fixed-size benchmark, so the flagged set is bounded by eval-set
    * similarity, not corpus size — AQE turns the anti-join into a
    * broadcast at runtime; the corpus itself is never shuffled. */
  def decontaminate(docs: DataFrame, id: Column, shingles: Column,
      isEval: Column, minRatio: Double): DataFrame = {
    val flagged = sharedShingleCounts(docs, id, shingles, isEval)
      .where(col("n_shared").cast("double") /
        greatest(col("n_shingles"), lit(1L)) >= minRatio)
      .select(col("id").as("__contam_id"))
    docs.where(!isEval).join(flagged, id === col("__contam_id"), "left_anti")
  }

  /** Two-table convenience: clean `docs` against a SEPARATE benchmark
    * table — the shape eval sets actually ship in. `evalShingles` is the
    * shingle expression over `eval`'s rows (its id is irrelevant — only
    * the shingle union matters); semantics and plan are [[decontaminate]]
    * over the tagged union. Eval rows get synthetic negative ids, but the
    * separation that MATTERS is the `__ceval` tag, not the id space: a
    * corpus keyed by a signed hash (xxhash64 ids are negative for half the
    * hash space) can collide with a synthetic eval id, and that is
    * harmless — eval rows are selected by tag everywhere
    * ([[sharedShingleCounts]] filters on it, and the flagged-id set joined
    * back anti is derived from non-eval rows only), so a collision never
    * mixes an eval row's shingles into a corpus document or vice versa. */
  def decontaminateAgainst(docs: DataFrame, id: Column, shingles: Column,
      eval: DataFrame, evalShingles: Column, minRatio: Double): DataFrame = {
    val tagged = docs.select(id.as("__cid"), shingles.as("__csh"),
        lit(false).as("__ceval"))
      .unionByName(eval.select(
        (-monotonically_increasing_id() - 1).as("__cid"),
        evalShingles.as("__csh"), lit(true).as("__ceval")))
    val flagged = sharedShingleCounts(tagged, col("__cid"), col("__csh"),
        col("__ceval"))
      .where(col("n_shared").cast("double") /
        greatest(col("n_shingles"), lit(1L)) >= minRatio)
      .select(col("id").as("__contam_id"))
    docs.join(flagged, id === col("__contam_id"), "left_anti")
  }
}
