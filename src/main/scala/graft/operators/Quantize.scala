package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for large-scale vector corpora.
  *
  * Scalar int8 quantization shrinks a float32 embedding column 4x, which at
  * 100 TB is usually the difference between an in-memory ANN working set and
  * a disk-bound one (IVF/ADC pipelines re-rank the top candidates against
  * the full-precision vectors, which stay in cold storage).
  *
  * Scale design: the per-dimension [min, max] calibration is a two-phase
  * hash aggregate over (dim) — 64..4096 groups regardless of corpus size —
  * and joins back as a broadcast, so the corpus itself is never shuffled.
  * All arithmetic is plain IEEE double + integer floor/clamp, bit-portable
  * across engines (the DuckDB oracle reproduces codes exactly).
  */
object Quantize {

  /** Per-(id, dim) int8 codes for a double-array embedding column:
    * code = least(floor((x - lo_dim) / (hi_dim - lo_dim) * 256), 255),
    * 0 when the dimension is constant. `dim` is 1-based. Codes are exact
    * integers in [0, 255]; decode as lo + (code + 0.5) / 256 * (hi - lo). */
  def int8(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val ex = df.select(id.as("id"), posexplode(vec).as(Seq("pos", "x")))
      .select(col("id"), (col("pos") + 1).as("dim"), col("x"))
    val stats = ex.groupBy(col("dim")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    ex.join(broadcast(stats), Seq("dim"))
      .select(col("id"), col("dim").cast("long").as("dim"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 256).cast("long"),
            lit(255L)))
          .as("code"))
  }
}
