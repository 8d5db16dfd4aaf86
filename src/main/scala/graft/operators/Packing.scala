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
}
