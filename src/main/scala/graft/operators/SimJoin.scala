package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SimKernels, TextKernels}

/** Batch similarity JOIN between two (possibly different) corpora — the
  * two-sided generalization of [[Dedup.minhashPairs]]: banded MinHash keys
  * on both sides, candidate pairs from the band-bucket equi-join, exact
  * Jaccard verification. Never an all-pairs product: the only join is the
  * equi-join on (band, key).
  */
object SimJoin {

  /** (leftId, rightId, j) for all cross-corpus pairs with shingle-set
    * Jaccard >= minJ. Column contracts: both inputs provide (id, shingle
    * set) via the given id column name and shingle expression. */
  def jaccardJoin(left: DataFrame, leftId: String, leftShingles: Column,
      right: DataFrame, rightId: String, rightShingles: Column,
      minJ: Double): DataFrame = {
    def banded(df: DataFrame, id: String, shingles: Column, side: String): DataFrame = {
      val sh = df.select(col(id).as(s"${side}_id"), shingles.as(s"${side}_g"))
      sh.select(col(s"${side}_id"), col(s"${side}_g"),
        posexplode(graft.functions.NativeKernels.bandKeys(col(s"${side}_g"),
          Dedup.NumHashes, Dedup.NumBands, Dedup.RowsPerBand))
          .as(Seq("band", "bv")))
    }
    val l = graft.util.CacheScope.register(
      banded(left, leftId, leftShingles, "l").cache())
    val r = graft.util.CacheScope.register(
      banded(right, rightId, rightShingles, "r").cache())
    val cand = l.join(r, Seq("band", "bv"))
      .select(col("l_id"), col("r_id"), col("l_g"), col("r_g"))
      .dropDuplicates("l_id", "r_id")
    cand.select(col("l_id"), col("r_id"),
        SimKernels.jaccardSimDistinct(col("l_g"), col("r_g")).as("j"))
      .where(col("j") >= minJ)
  }
}
