package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents in id order and
  * chunk the token stream into fixed-size context windows. Each document is
  * assigned its global token start offset and the chunk (context window)
  * its first token lands in — the bookkeeping a packed-pretraining data
  * loader needs.
  *
  * Scale design (100 TB): a global running sum ordered by id would plan as
  * a single-partition Window — a non-starter. This is instead the classic
  * two-phase distributed prefix sum:
  *   1. bucket rows by id range; per-bucket running sums are a Window
  *      partitioned BY BUCKET (parallel, streaming, no global sort);
  *   2. aggregate one total per bucket (map-side combined), prefix-sum the
  *      tiny bucket-total frame (|buckets| rows — the only single-partition
  *      step, on kilobytes), and broadcast-join the bucket base offsets
  *      back.
  * Wall-clock is two narrow passes + one broadcast join regardless of
  * corpus size; bucket count scales with the cluster, not the data.
  */
object Packing {

  /** (id, start, chunk) for every row: `start` = sum of `tokens` over all
    * rows with smaller `id`; `chunk` = start DIV chunkSize.
    *
    * `id` must be non-negative and numeric (dense or sparse — bucket skew
    * from sparse ids only shifts work between buckets). One driver-side
    * max(id) calibration read sizes the buckets. */
  def packOffsets(df: DataFrame, id: Column, tokens: Column,
                  chunkSize: Long, buckets: Int = 256): DataFrame = {
    val maxRow = df.agg(max(id.cast("long"))).head
    if (maxRow.isNullAt(0)) // empty input: no offsets, correct schema
      return df.select(id.cast("long").as("id"), tokens.cast("long").as("n_tok"),
        lit(0L).as("start"), lit(0L).as("chunk")).where(lit(false))
    val maxId = maxRow.getLong(0)
    val span = math.max(1L, maxId / buckets + 1)
    val base = df.select(id.cast("long").as("id"), tokens.cast("long").as("n_tok"))
      .withColumn("__bk", expr(s"id DIV ${span}L"))
    val local = base.withColumn("__cum",
      sum("n_tok").over(Window.partitionBy("__bk").orderBy("id")))
    val offsets = base.groupBy("__bk").agg(sum("n_tok").as("__tot"))
      .withColumn("__off", coalesce(
        sum("__tot").over(Window.orderBy("__bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bk", "__off")
    local.join(broadcast(offsets), "__bk")
      .withColumn("start", col("__off") + col("__cum") - col("n_tok"))
      .withColumn("chunk", expr(s"start DIV ${chunkSize}L"))
      .select("id", "n_tok", "start", "chunk")
  }

  /** Select documents under a global token budget, best quality first —
    * the assemble-the-training-mix primitive: rank every document by
    * (quality DESC, id ASC) and keep the longest prefix whose token sum
    * fits `budget`. Output: (id, n_tok, q, cum_tok) for each kept row,
    * cum_tok = the running total through this document in that order.
    * Rows whose quality is null or NaN are EXCLUDED from selection (they
    * have no place in a quality ordering and must not consume budget).
    *
    * Scale design: the same two-phase distributed prefix sum as
    * [[packOffsets]], but bucketed EQUI-DEPTH on the SORT KEY (q DESC,
    * id ASC). One `approxQuantile` calibration pass derives the quality
    * boundaries; a boundary value that recurs (a quality distribution
    * massed into one level — constant scores, a dominant default) is
    * sub-split by id quantiles within that level, so the boundary set is
    * quantiles of (q, id) PAIRS and every bucket's window holds ~1/buckets
    * of the data REGARDLESS of the quality distribution (the uniform-width
    * quantization this replaces collapsed a massed distribution into one
    * bucket-sized window). Bucket membership is a pure threshold function
    * of (q, id) against the pair-boundary literals — deterministic, shared
    * by both prefix-sum phases, monotone along the sort order, so
    * bucket-then-(q DESC, id) still concatenates to exactly the global
    * order. No global sort; the only single-partition step is the
    * |buckets|-row offsets frame. */
  def budgetSelect(df: DataFrame, id: Column, tokens: Column, quality: Column,
      budget: Long, buckets: Int = 256): DataFrame = {
    val bucketed = budgetBuckets(df, id, tokens, quality, buckets)
    val local = bucketed.withColumn("__cum",
      sum("n_tok").over(Window.partitionBy("__bk").orderBy(col("q").desc, col("id"))))
    val offsets = bucketed.groupBy("__bk").agg(sum("n_tok").as("__tot"))
      .withColumn("__off", coalesce(
        sum("__tot").over(Window.orderBy("__bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bk", "__off")
    local.join(broadcast(offsets), "__bk")
      .withColumn("cum_tok", col("__off") + col("__cum"))
      .where(col("cum_tok") <= budget)
      .select("id", "n_tok", "q", "cum_tok")
  }

  /** [[budgetSelect]]'s cleaned, bucketed base frame: (id, n_tok, q, __bk)
    * with null/NaN quality filtered and the equi-depth (q, id)-pair bucket
    * assigned — package-visible so specs can assert bucket balance. */
  private[graft] def budgetBuckets(df: DataFrame, id: Column, tokens: Column,
      quality: Column, buckets: Int): DataFrame = {
    val base = df.select(id.cast("long").as("id"), tokens.cast("long").as("n_tok"),
        quality.cast("double").as("q"))
      .where(col("q").isNotNull && !isnan(col("q")))
    val empty = base.withColumn("__bk", lit(0L))
    // one calibration pass: quality quantiles at 1/buckets .. (b-1)/buckets
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val qBounds =
      if (probs.isEmpty) Array.empty[Double]
      else base.stat.approxQuantile("q", probs, 0.25 / buckets)
    if (probs.nonEmpty && qBounds.isEmpty) return empty // no non-null rows
    // a quality level spanning >= 2 quantile positions is "heavy": split it
    // by id quantiles within the level (one grouped percentile_approx pass
    // over the heavy levels only)
    val mult = qBounds.groupBy(identity).map { case (v, a) => (v, a.length) }
    val heavy = mult.filter(_._2 >= 2)
    val idBounds: Map[Double, Seq[Long]] =
      if (heavy.isEmpty) Map.empty
      else {
        val kmax = heavy.values.max
        val idProbs = (1 to kmax).map(_.toDouble / (kmax + 1))
        base.where(col("q").isin(heavy.keys.toSeq: _*))
          .groupBy("q")
          .agg(percentile_approx(col("id"), lit(idProbs.toArray),
            lit(10000)).as("ib"))
          .collect()
          .map { r =>
            val v = r.getDouble(0)
            val all = r.getSeq[Long](1)
            val k = heavy(v)
            // evenly-spaced k of the kmax within-level id quantiles
            val picked = (1 to k).map(j =>
              all(math.min(all.size - 1, j * (kmax + 1) / (k + 1) - 1)))
            v -> picked
          }.toMap
      }
    // boundary pairs in (q DESC, id ASC) sort order; a light level's pair
    // uses id = MIN_VALUE so its equal-quality rows all land AFTER it
    // (equal qualities stay together, as before)
    val pairs: Seq[(Double, Long)] = mult.toSeq.flatMap { case (v, k) =>
      if (k >= 2) idBounds(v).map(i => (v, i)) else Seq((v, Long.MinValue))
    }
    val bk: Column =
      if (pairs.isEmpty) lit(0L)
      else {
        // bucket = |boundaries preceding (q, id) in sort order|: monotone
        // along (q DESC, id ASC), ties on q resolved by the id component
        val arr = array(pairs.map { case (v, i) =>
          struct(lit(v).as("bq"), lit(i).as("bi")) }: _*)
        size(filter(arr, p => p.getField("bq") > col("q") ||
          (p.getField("bq") === col("q") && p.getField("bi") <= col("id"))))
          .cast("long")
      }
    base.withColumn("__bk", bk)
  }

  /** PER-DOCUMENT chunking with overlap — the training/RAG chunker, the
    * within-document complement to [[packOffsets]]'s cross-document
    * binning: split each document's token sequence into windows of
    * `chunkSize` tokens starting every `chunkSize - overlap` tokens (the
    * final window may be shorter; a document shorter than one window
    * yields a single chunk). One row per (id, chunk_idx) with the
    * space-joined chunk text and its token span.
    *
    * Scale design: a pure narrow per-row map + posexplode — no shuffle, no
    * window; chunk counts derive from each row alone, so the operator
    * streams at 100 TB. Deterministic: chunk boundaries are arithmetic on
    * token positions. */
  def chunkTokens(df: DataFrame, id: Column, tokens: Column,
                  chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap $overlap out of [0, chunkSize) for chunkSize $chunkSize")
    val stride = chunkSize - overlap
    val n = size(tokens)
    // starts: 0, stride, 2*stride, ... while start < n (>= 1 chunk per
    // non-empty doc); explicit guard — sequence(0, -1) would DESCEND
    val nChunks = when(n <= 0, lit(0))
      .otherwise(floor((n - 1).cast("double") / stride).cast("int") + 1)
    val chunks = when(nChunks <= 0, array().cast("array<string>")).otherwise(
      org.apache.spark.sql.functions.transform(
        sequence(lit(0), nChunks - 1),
        c => concat_ws(" ", slice(tokens, c * stride + 1, lit(chunkSize)))))
    df.select(id.as("id"), lit(stride).as("__stride"), n.as("__n"),
        posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * col("__stride")).cast("long").as("tok_start"),
        least(col("chunk_idx") * col("__stride") + chunkSize, col("__n"))
          .cast("long").as("tok_end"),
        col("chunk_text"))
  }
}
