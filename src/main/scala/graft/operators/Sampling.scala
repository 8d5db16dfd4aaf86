package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Random sampling (`df.sample`) is useless for a reproducible corpus: the
  * kept set changes with partitioning, seed plumbing, and engine. These
  * operators instead key every keep/drop decision on a content hash of the
  * row id, so the same row makes the same decision on any cluster, any
  * partitioning, any engine — and re-running an incremental pipeline keeps
  * the sample consistent across corpus versions (a row's fate never depends
  * on which other rows are present).
  *
  * Scale design (100 TB): `sample` is a pure narrow filter (no shuffle, full
  * codegen, pushes past column pruning). `stratified` shuffles once on the
  * stratum key — the same shuffle a groupBy on that key would pay — and the
  * per-stratum window is a streaming rank over the sorted partition, no
  * buffering beyond the run. Skewed strata (one language = 90 % of the
  * corpus) stream through a single partition's sort; for that shape, bound
  * the stratum cardinality first or pre-split hot strata by a salt on the
  * hash prefix.
  */
object Sampling {

  /** Portable hash bucket in [0, 100): the first 6 hex chars of md5(id) as
    * an integer, mod 100. md5 of the decimal string renders identically in
    * every engine, so the bucket — and the sample — is engine-independent. */
  def hashPct(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long"), lit(100L))

  /** Keep ~pct % of rows, deterministically by id hash. */
  def sample(df: DataFrame, id: Column, pct: Int): DataFrame =
    df.where(hashPct(id) < pct)

  /** Stratified sample: keep floor(frac * |stratum|) rows per stratum,
    * chosen in deterministic hash order (md5 of the id, id as tiebreak).
    * Guarantees exact per-stratum quotas — the proportional mix survives
    * sampling even when strata are heavily imbalanced. */
  def stratified(df: DataFrame, stratum: Column, id: Column, frac: Double): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(id.cast("string")), id)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__quota", floor(count(lit(1)).over(Window.partitionBy(stratum)) * frac))
      .where(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Source/domain mixing: keep a per-group percentage of rows (hash-keyed,
    * deterministic), e.g. up-weight curated sources and down-weight crawl.
    * Groups absent from `rates` fall back to `defaultPct`. A narrow filter
    * like `sample` — the rate lookup is a literal CASE, no join. */
  def mix(df: DataFrame, group: Column, id: Column,
          rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (g, p)) =>
      when(group === g, lit(p)).otherwise(acc)
    }
    df.where(hashPct(id) < rate)
  }
}
