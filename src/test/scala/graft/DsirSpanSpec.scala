package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, SpanDedup}

/** Round-13 operators: DSIR importance weighting/resampling and
  * corpus-global exact duplicate-span removal. */
class DsirSpanSpec extends SparkTestBase {
  import spark.implicits._

  private val w = graft.functions.NativeKernels.wordTokens(col("text"))

  // ------------------------------------------------------------------ dsir

  test("dsir: target-like raw documents outweigh off-target ones") {
    val docs = Seq(
      (1L, "good clean prose text", true),
      (2L, "good clean prose text", true),
      (3L, "spam junk garbage words", false),
      (4L, "good clean prose text", false)).toDF("doc_id", "text", "tgt")
    val got = Dsir.weights(docs, col("doc_id"), w, col("tgt"), buckets = 256)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // 4 unigrams + 3 bigrams per document
    assert(got.values.forall(_._2 == 7L))
    assert(got(4L)._3 > got(3L)._3,
      s"target-like doc must outweigh spam doc: $got")
    // identical text => identical weight, regardless of the tag
    assert(got(4L)._3 == got(1L)._3)
  }

  test("dsir: featureless documents come back with n_feats 0 and weight 0") {
    val docs = Seq((1L, "some shared text here", true), (2L, "", false),
      (3L, "   ", false)).toDF("doc_id", "text", "tgt")
    val got = Dsir.weights(docs, col("doc_id"), w, col("tgt"), buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L) == ((2L, 0L, 0.0)) && got(3L) == ((3L, 0L, 0.0)))
  }

  test("dsir: single-frame tag form agrees with the two-corpus form") {
    val docs = (1L to 40L).map { i =>
      (i, (1L to 6L).map(j => s"w${(i * 7 + j * 13) % 19}").mkString(" "),
        i % 3 == 0)
    }.toDF("doc_id", "text", "tgt")
    val tagged = Dsir.weights(docs, col("doc_id"), w, col("tgt"),
        buckets = 128)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val against = Dsir.weightsAgainst(docs, col("doc_id"), w,
        docs.where(col("tgt")), w, buckets = 128)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(tagged.keySet == against.keySet)
    for (id <- tagged.keySet) {
      assert(tagged(id)._2 == against(id)._2)
      assert(math.abs(tagged(id)._3 - against(id)._3) < 1e-9,
        s"doc $id: ${tagged(id)._3} vs ${against(id)._3}")
    }
  }

  test("dsir: resample at near-zero temperature degenerates to hard " +
    "top-k, deterministically") {
    val scored = (1L to 10L).map(i => (i, i.toDouble))
      .toDF("id", "weight")
    def pick(): Set[Long] =
      Dsir.resample(scored, col("id"), col("weight"), k = 3,
          temperature = 1e-6)
        .select("id").as[Long].collect().toSet
    assert(pick() == Set(8L, 9L, 10L))
    assert(pick() == pick())
    // k past the corpus keeps everything
    assert(Dsir.resample(scored, col("id"), col("weight"), 99).count() == 10)
  }

  test("dsir: scoreWith(fit) reproduces weights on the fitted corpus and " +
    "save/load round-trips the model exactly") {
    val docs = (1L to 30L).map { i =>
      (i, (1L to 5L).map(j => s"t${(i * 11 + j * 3) % 17}").mkString(" "),
        i % 3 == 0)
    }.toDF("doc_id", "text", "tgt")
    val m = Dsir.fit(docs, w, col("tgt"), buckets = 128)
    val direct = Dsir.weights(docs, col("doc_id"), w, col("tgt"),
        buckets = 128)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val scored = Dsir.scoreWith(spark, docs, col("doc_id"), w, m)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(scored.keySet == direct.keySet)
    for (id <- direct.keySet) {
      assert(scored(id)._2 == direct(id)._2)
      assert(math.abs(scored(id)._3 - direct(id)._3) < 1e-9,
        s"doc $id: ${scored(id)._3} vs ${direct(id)._3}")
    }
    val path = java.nio.file.Files
      .createTempDirectory("graft-dsir-model").toString + "/m"
    Dsir.save(spark, m, path)
    assert(Dsir.load(spark, path) == m)
    // a foreign-kind sidecar fails fast
    graft.operators.IndexIO.writeMeta(spark, path, """{"kind":"lsh"}""")
    intercept[IllegalArgumentException](Dsir.load(spark, path))
  }

  test("dsir: buckets unseen at fit time take the smoothing floor; " +
    "featureless documents still score 0") {
    val empty = Dsir.DsirModel(64, 100.0, 50.0, Map.empty)
    val docs = Seq((1L, "aa bb cc"), (2L, "")).toDF("doc_id", "text")
    val got = Dsir.scoreWith(spark, docs, col("doc_id"), w, empty)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // 3 unigrams + 2 bigrams, every bucket unseen
    assert(got(1L)._2 == 5L)
    assert(math.abs(got(1L)._3 - 5 * empty.floor) < 1e-12, got(1L))
    assert(got(2L) == ((2L, 0L, 0.0)))
  }

  // ----------------------------------------------------------- span dedup

  private val sharedRun = Seq(
    (1L, "x1 x2 c1 c2 c3 c4 c5 c6 y1 y2"),
    (2L, "z1 c1 c2 c3 c4 c5 c6 z2"),
    (3L, "u1 u2 u3 u4 u5")).toDF("doc_id", "text")

  test("spans: a shared run merges its overlapping windows into one " +
    "maximal span per document") {
    val got = SpanDedup.spans(sharedRun, col("doc_id"), w, n = 4,
        minCount = 2L)
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // c1..c6 = three duplicated 4-windows per doc, one merged span each
    assert(got.toSeq == Seq((1L, 2, 8, 3L), (2L, 1, 7, 3L)))
  }

  test("spans: distant repeats stay separate islands; adjacency merges") {
    val docs = Seq(
      (1L, "c1 c2 c3 c4 m1 m2 m3 m4 m5 c1 c2 c3 c4"), // repeats of its own
      (2L, "e1 e2 e3 e4 f1 f2 f3 f4"), // dup windows at pos 0 and 4: abut
      (3L, "e1 e2 e3 e4 g5 g6 g7 g8"),
      (4L, "h1 h2 f1 f2 f3 f4")).toDF("doc_id", "text")
    val got = SpanDedup.spans(docs, col("doc_id"), w, n = 4, minCount = 2L)
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
      .map(r => (r._1, r._2, r._3))
    assert(got.contains((1L, 0, 4)) && got.contains((1L, 9, 13)),
      s"distant repeats must be two islands: ${got.toSeq}")
    // doc 2's two duplicated windows at pos 0 and pos 4 abut (gap == n):
    // one contiguous duplicated region [0, 8)
    assert(got.contains((2L, 0, 8)), s"abutting windows must merge: ${got.toSeq}")
  }

  test("spans: minCount above the corpus frequency flags nothing") {
    assert(SpanDedup.spans(sharedRun, col("doc_id"), w, n = 4,
      minCount = 3L).count() == 0)
  }

  test("removeSpans: cuts covered tokens, keeps unique prose, returns " +
    "every document") {
    val docs = sharedRun.union(Seq(
      (4L, "d1 d2 d3 d4 d5"), (5L, "d1 d2 d3 d4 d5")).toDF("doc_id", "text"))
    val got = SpanDedup.removeSpans(docs, col("doc_id"), w, n = 4,
        minCount = 2L)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 10L, 6L, "x1 x2 y1 y2")))
    assert(got(2L) == ((2L, 8L, 6L, "z1 z2")))
    // untouched document comes back verbatim
    assert(got(3L) == ((3L, 5L, 0L, "u1 u2 u3 u4 u5")))
    // all-boilerplate documents empty out but are NOT dropped
    assert(got(4L) == ((4L, 5L, 5L, "")) && got(5L) == ((5L, 5L, 5L, "")))
  }
}
