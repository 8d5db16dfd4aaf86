package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins: when one join key carries a disproportionate
  * share of the large side's rows, a plain shuffle join sends that key's
  * entire volume to one reducer. Salting splits each hot key into
  * `saltFactor` sub-keys on the large side and replicates the small side's
  * matching rows across all sub-keys, so the hot key's work spreads over
  * `saltFactor` tasks.
  *
  * Spark's AQE skew-join handles post-shuffle partition splitting
  * automatically (spark.sql.adaptive.skewJoin, on by default in Spark 4);
  * explicit salting remains the tool when the skew is IN the key itself
  * (AQE cannot split one key's hash bucket across reducers for aggregate
  * joins). Result is identical to the unsalted join — verified by test.
  */
object SkewJoin {

  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      (pmod(hash(monotonically_increasing_id()), lit(saltFactor))).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
