package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted inner join equals the plain join on heavily skewed keys") {
    // 90% of the large side shares one hot key
    val rnd = new scala.util.Random(5)
    val large = (0 until 20000).map { i =>
      val k = if (rnd.nextDouble() < 0.9) "hot" else s"k${rnd.nextInt(50)}"
      (i.toLong, k)
    }.toDF("row_id", "k")
    val small = (Seq("hot") ++ (0 until 50).map(i => s"k$i")).zipWithIndex
      .map { case (k, v) => (k, v) }.toDF("k", "dim")

    val plain = large.join(small, Seq("k"))
      .select("row_id", "dim").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", 8)
      .select("row_id", "dim").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(salted == plain)
    assert(plain.size == 20000)
  }
}
