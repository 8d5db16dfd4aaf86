package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.SimKernels._

/** Kernel unit + property tests (seeded randomness, evaluated through Spark
  * so the tested artifact is the real Catalyst expression, not a Scala
  * re-implementation). */
class KernelSpec extends SparkTestBase {
  import spark.implicits._

  private def eval1(c: Column): Any =
    spark.range(1).select(c.as("r")).head.get(0)

  private def d1(c: Column): Double = eval1(c).asInstanceOf[Double]

  private def arr(xs: String*): Column = array(xs.map(lit): _*)

  // --- Jaccard ---------------------------------------------------------

  test("jaccardSim: null array scores 0, not null (regression, VERDICT r1 #2)") {
    val df = Seq((Some(Seq("a", "b")), Option.empty[Seq[String]])).toDF("a", "b")
    val r = df.select(jaccardSim(col("a"), col("b")).as("s")).head.getDouble(0)
    assert(r == 0.0)
  }

  test("jaccardSim: identical sets 1, disjoint 0, empty-vs-empty 0") {
    assert(d1(jaccardSim(arr("x", "y"), arr("x", "y"))) == 1.0)
    assert(d1(jaccardSim(arr("x"), arr("y"))) == 0.0)
    assert(d1(jaccardSim(array().cast("array<string>"), array().cast("array<string>"))) == 0.0)
  }

  test("jaccardSim: in [0,1] and symmetric on random token sets") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 50).map { _ =>
      def set() = Seq.fill(rnd.nextInt(6))(s"t${rnd.nextInt(8)}")
      (set(), set())
    }
    val df = rows.toDF("a", "b")
    val rs = df.select(jaccardSim(col("a"), col("b")).as("ab"),
      jaccardSim(col("b"), col("a")).as("ba")).collect()
    rs.foreach { r =>
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(ab >= 0.0 && ab <= 1.0)
      assert(ab == ba)
    }
  }

  // --- decay -----------------------------------------------------------

  test("decaySim: 1 at d=0, strictly decreasing in d, jaccard quirk d=1 -> 0") {
    assert(d1(decaySim(lit(0.0), 0.05, lit(2.0))) == 1.0)
    val a = d1(decaySim(lit(1.0), 0.05, lit(2.0)))
    val b = d1(decaySim(lit(2.0), 0.05, lit(2.0)))
    assert(a > b && b > 0.0)
    assert(d1(decaySimJaccard(lit(1.0), 0.05, lit(2.0))) == 0.0)
    assert(d1(decaySimJaccard(lit(0.5), 0.05, lit(2.0))) > 0.0)
  }

  test("decaySim: non-positive or null scale guards to 1") {
    val ref = math.exp(-0.05 * 3.0)
    assert(math.abs(d1(decaySim(lit(3.0), 0.05, lit(0.0))) - ref) < 1e-15)
    assert(math.abs(d1(decaySim(lit(3.0), 0.05, lit(null).cast("double"))) - ref) < 1e-15)
  }

  // --- tokenize / qgrams ----------------------------------------------

  test("tokenize: literal (non-regex) delimiters | + . work (ADVICE fix)") {
    assert(eval1(tokenize(lit("a|b|c"), "|")) == Seq("a", "b", "c"))
    assert(eval1(tokenize(lit("a+b"), "+")) == Seq("a", "b"))
    assert(eval1(tokenize(lit("a.b"), ".")) == Seq("a", "b"))
  }

  test("tokenize: trims, drops empties, dedupes") {
    assert(eval1(tokenize(lit(" a , ,b,a,"), ",")) == Seq("a", "b"))
  }

  test("qgrams: empty string -> empty set (ADVICE fix); short string -> whole; length contract") {
    assert(eval1(qgrams(lit(""), 3)) == Seq())
    assert(eval1(qgrams(lit("ab"), 3)) == Seq("ab"))
    assert(eval1(qgrams(lit("abcd"), 3)) == Seq("abc", "bcd"))
    val g = eval1(qgrams(lit("hello world"), 3)).asInstanceOf[scala.collection.Seq[String]]
    assert(g.distinct == g && g.size <= "hello world".length - 2)
    assert(g.forall(_.length == 3))
  }

  // --- spatial ---------------------------------------------------------

  test("geoDistDeg: 3-4-5 triangle") {
    assert(d1(geoDistDeg(lit(0.0), lit(0.0), lit(3.0), lit(4.0))) == 5.0)
  }

  test("haversineDeg: zero at same point, ~180 at antipodes, no NaN (clamp, ADVICE fix)") {
    assert(d1(haversineDeg(lit(12.3), lit(45.6), lit(12.3), lit(45.6))) == 0.0)
    val anti = d1(haversineDeg(lit(0.0), lit(0.0), lit(180.0), lit(0.0)))
    assert(!anti.isNaN && math.abs(anti - 180.0) < 1e-9)
    val near = d1(haversineDeg(lit(10.0), lit(20.0), lit(-170.0), lit(-20.0)))
    assert(!near.isNaN && near <= 180.0 + 1e-9)
  }

  // --- Lp over arrays --------------------------------------------------

  test("Lp distances: l1 >= l2 >= chebyshev, zero for equal arrays, known values") {
    val a = array(lit(1.0), lit(2.0), lit(3.0))
    val b = array(lit(4.0), lit(0.0), lit(3.0))
    val l1 = d1(l1Dist(a, b)); val l2 = d1(l2Dist(a, b)); val li = d1(chebyshevDist(a, b))
    assert(l1 == 5.0 && math.abs(l2 - math.sqrt(13.0)) < 1e-15 && li == 3.0)
    assert(l1 >= l2 && l2 >= li)
    assert(d1(l1Dist(a, a)) == 0.0 && d1(l2Dist(a, a)) == 0.0 && d1(chebyshevDist(a, a)) == 0.0)
  }

  test("cosineSim: 1 for parallel, 0 for orthogonal, 0 for zero vector") {
    val a = array(lit(1.0), lit(2.0))
    assert(math.abs(d1(cosineSim(a, array(lit(2.0), lit(4.0)))) - 1.0) < 1e-15)
    assert(d1(cosineSim(array(lit(1.0), lit(0.0)), array(lit(0.0), lit(1.0)))) == 0.0)
    assert(d1(cosineSim(a, array(lit(0.0), lit(0.0)))) == 0.0)
  }
}
