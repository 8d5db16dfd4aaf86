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
    val maxId = df.agg(max(id.cast("long"))).head.getLong(0)
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
    *
    * Scale design: the same two-phase distributed prefix sum as
    * [[packOffsets]], but bucketed on QUANTIZED QUALITY (one min/max
    * calibration read sizes `buckets` uniform levels; floor quantization
    * is order-preserving, and equal qualities land in the same bucket, so
    * bucket-then-(q DESC, id) concatenates to exactly the global order).
    * No global sort, no single-partition window over the data — the only
    * single-partition step is the |buckets|-row offsets frame. A quality
    * distribution massed into one level degrades that bucket's window to
    * the mass's size (the id-sparsity caveat of [[packOffsets]], in
    * quality space); raise `buckets` or pre-spread the metric. */
  def budgetSelect(df: DataFrame, id: Column, tokens: Column, quality: Column,
      budget: Long, buckets: Int = 256): DataFrame = {
    val mm = df.agg(min(quality.cast("double")), max(quality.cast("double"))).head
    val (qmin, qmax) = (mm.getDouble(0), mm.getDouble(1))
    val width = math.max((qmax - qmin) / buckets, 1e-12)
    val base = df.select(id.cast("long").as("id"), tokens.cast("long").as("n_tok"),
        quality.cast("double").as("q"))
      .withColumn("__bk", least(
        floor((lit(qmax) - col("q")) / width).cast("long"), lit(buckets - 1L)))
    val local = base.withColumn("__cum",
      sum("n_tok").over(Window.partitionBy("__bk").orderBy(col("q").desc, col("id"))))
    val offsets = base.groupBy("__bk").agg(sum("n_tok").as("__tot"))
      .withColumn("__off", coalesce(
        sum("__tot").over(Window.orderBy("__bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bk", "__off")
    local.join(broadcast(offsets), "__bk")
      .withColumn("cum_tok", col("__off") + col("__cum"))
      .where(col("cum_tok") <= budget)
      .select("id", "n_tok", "q", "cum_tok")
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
