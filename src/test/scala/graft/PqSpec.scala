package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeKernels
import graft.operators.{AnnSearch, Quantize}

/** Product quantization: encode/ADC kernel exactness, composed-twin
  * bit-identity, train determinism, and the shortlist-re-rank recall
  * contract. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  // two subspaces of 2 dims, 3 codewords each
  private val books: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0)),
    Seq(Seq(1.0, 1.0), Seq(-1.0, -1.0), Seq(0.0, 0.0)))

  test("pqEncode picks the per-subspace nearest codeword, first index wins ties") {
    val df = Seq(
      (1L, Seq(0.9, 0.1, 1.1, 0.9)),   // sub0 -> cw1, sub1 -> cw0
      (2L, Seq(0.1, 0.9, -0.9, -1.2)), // sub0 -> cw2, sub1 -> cw1
      (3L, Seq(0.0, 0.0, 0.0, 0.0)),   // sub0 -> cw0 (exact), sub1 -> cw2
      (4L, Seq(0.5, 0.0, 0.0, 0.0)))   // sub0: cw0 and cw1 equidistant -> cw0
      .toDF("id", "v")
    val got = Quantize.pqEncode(df, col("id"), col("v"), books)
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) == Seq(1, 0) && got(2L) == Seq(2, 1))
    assert(got(3L) == Seq(0, 2) && got(4L) == Seq(0, 2))
  }

  test("pqEncode is bit-identical to composed per-subspace nearestCentroid slices") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cw = Seq(Seq.fill(8)(0.25), Seq.fill(8)(-0.25),
      (0 until 8).map(j => if (j % 2 == 0) 0.5 else -0.5).toSeq, Seq.fill(8)(0.0))
    val books64 = Seq.fill(8)(cw)
    val native = Quantize.pqEncode(e, col("vec_id"), col("v"), books64)
    val composed = e.select(col("vec_id").as("id"),
      array((0 until 8).map(s =>
        NativeKernels.nearestCentroid(slice(col("v"), s * 8 + 1, 8), cw)): _*)
        .as("codes"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("pqAdcDist reads the LUT: exact sum over subspace codes; corrupt code throws") {
    val lut = Seq(Seq(1.0, 4.0, 9.0), Seq(16.0, 25.0, 36.0))
    val df = Seq((1L, Seq(0, 0)), (2L, Seq(1, 2)), (3L, Seq(2, 1))).toDF("id", "codes")
    val got = df.select(col("id"), NativeKernels.pqAdcDist(col("codes"), lut).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == math.sqrt(1.0 + 16.0))
    assert(got(2L) == math.sqrt(4.0 + 36.0))
    assert(got(3L) == math.sqrt(9.0 + 25.0))
    val bad = Seq((9L, Seq(0, 7))).toDF("id", "codes")
      .select(NativeKernels.pqAdcDist(col("codes"), lut).as("d"))
    val err = intercept[Exception] { bad.collect() }
    assert(err.getMessage != null)
  }

  test("pqLut holds squared sub-distances and pqAdcTopK ranks by their sum") {
    // vectors placed AT codewords: ADC distance equals the true L2 exactly,
    // so the approximate ranking must equal brute force
    val df = Seq(
      (1L, Seq(0.0, 0.0, 1.0, 1.0)),
      (2L, Seq(1.0, 0.0, -1.0, -1.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "v")
    val q = Seq(0.1, 0.0, 1.0, 0.9)
    val lut = Quantize.pqLut(q, books)
    assert(math.abs(lut(0)(0) - (0.1 * 0.1)) < 1e-12) // q sub0 vs cw0
    assert(math.abs(lut(1)(0) - (0.0 + 0.1 * 0.1)) < 1e-12)
    val enc = Quantize.pqEncode(df, col("id"), col("v"), books)
    val top = Quantize.pqAdcTopK(enc, col("id"), col("codes"), books, q, 3)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSeq == Seq(1L, 3L, 2L))
    // exact distances, since every vector sits on its codewords
    assert(math.abs(top(0)._2 - math.sqrt(0.01 + 0.01)) < 1e-6)
  }

  test("pqTrain: deterministic codebooks, m dividing dim enforced, " +
    "and pqSearch re-rank returns the exact top-k when the shortlist covers it") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val books1 = Quantize.pqTrain(e, col("vec_id"), col("v"), m = 4,
      nCodes = 8, iters = 2)
    val books2 = Quantize.pqTrain(e, col("vec_id"), col("v"), m = 4,
      nCodes = 8, iters = 2)
    assert(books1 == books2) // deterministic init + fixed iterations
    assert(books1.size == 4 && books1.forall(_.size == 8) &&
      books1.forall(_.forall(_.size == 16)))
    intercept[IllegalArgumentException] {
      Quantize.pqTrain(e, col("vec_id"), col("v"), m = 7)
    }
    // shortlist = corpus size -> re-rank IS brute force
    val q = e.where(col("vec_id") === 0).head.getSeq[Double](1).toSeq
    val corpus = e.where(col("vec_id") =!= 0)
    val n = corpus.count().toInt
    val got = Quantize.pqSearch(corpus, col("vec_id"), col("v"), books1, q,
      k = 5, shortlist = n).as[(Long, Double)].collect().toSeq
    val qc = array(q.map(lit): _*)
    val brute = corpus.select(col("vec_id"),
        round(NativeKernels.l2Dist(col("v"), qc), 6).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got == brute)
  }
}
