package graft

import org.apache.spark.sql.functions._

import graft.functions.SimKernels
import graft.plans.MultiTopM

/** The custom multi-top-M operator must return EXACTLY the rows of the
  * composed per-facet `orderBy(d, id).limit(m)` plans, from one scan. */
class MultiTopMSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def ordersDists = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    (o, col("o_orderkey"), Seq(
      SimKernels.absDist(col("o_totalprice"), lit(150000.0)),
      abs(unix_micros(col("o_orderdate").cast("timestamp")) -
        lit(862_704_000_000_000L)).cast("double"),
      SimKernels.jaccardDistDistinct(SimKernels.tokenize(col("o_orderpriority"), "-"),
        array(lit("1"), lit("URGENT")))))
  }

  test("matches the composed per-facet orderBy.limit exactly (numeric + jaccard facets)") {
    val (o, id, dists) = ordersDists
    val m = 37
    val fused = MultiTopM(o, id, dists, m)
      .orderBy(col("facet"), col("d"), col("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val composed = dists.zipWithIndex.flatMap { case (d, i) =>
      o.select(id.as("id"), d.cast("double").as("d"))
        .na.drop(Seq("d"))
        .orderBy(col("d"), col("id")).limit(m)
        .collect().map(r => (i, r.getLong(0), r.getDouble(1)))
    }
    assert(fused == composed)
  }

  test("string ids survive the unsafe-row boundary (copied, not aliased)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fused = MultiTopM(docs, concat(lit("doc-"), col("doc_id")),
      Seq(col("n_chars").cast("double")), 10)
      .orderBy(col("d"), col("id"))
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    val composed = docs
      .select(concat(lit("doc-"), col("doc_id")).as("id"), col("n_chars").cast("double").as("d"))
      .orderBy(col("d"), col("id")).limit(10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(fused == composed)
    assert(fused.forall(_._1.startsWith("doc-")))
  }

  test("property: equals composed plans on random data with ties (20 rounds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // deterministic rounds
    (1 to 20).foreach { round =>
      val n = 1 + rnd.nextInt(200)
      val m = 1 + rnd.nextInt(n + 20) // sometimes m > n
      // coarse distance grid so ties are common (the tie-break is the point)
      val rows = (0 until n).map(i =>
        (rnd.nextLong(), rnd.nextInt(5).toDouble, rnd.nextInt(3).toDouble))
      val df = rows.toDF("id", "x", "y").repartition(1 + rnd.nextInt(7))
      val fused = MultiTopM(df, col("id"), Seq(col("x"), col("y")), m)
        .orderBy(col("facet"), col("d"), col("id"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      val composed = Seq("x", "y").zipWithIndex.flatMap { case (c, i) =>
        df.select(col("id"), col(c).as("d")).orderBy(col("d"), col("id")).limit(m)
          .collect().map(r => (i, r.getLong(0), r.getDouble(1)))
      }
      assert(fused == composed, s"round $round: n=$n m=$m")
    }
  }

  test("plans as ONE scan through the custom exec node") {
    val (o, id, dists) = ordersDists
    val plan = MultiTopM(o, id, dists, 10).queryExecution.executedPlan.toString
    assert(plan.contains("MultiTopM"), plan.take(400)) // exec prints without the Exec suffix
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      "all facets must come from a single scan:\n" + plan.take(800))
  }
}
