package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic corpus: ~n docs over `langs` languages, exact dups
  // planted every 10th doc (so distinct-doc < doc count), shared small
  // vocabulary plus a per-doc unique token
  private def corpus(n: Int, offset: Long = 0L) =
    (0 until n).map { i =>
      val lang = Seq("en", "de", "fr")(i % 3)
      val dupOf = if (i % 10 == 9) i - 1 else i
      (offset + i, lang, s"common words w${dupOf % 7} unique$dupOf tail")
    }.toDF("doc_id", "lang", "text")

  private val words = graft.functions.NativeKernels.wordTokens(col("text"))

  test("profile: exact counters and distincts are right; HLL estimates " +
    "track the exact distincts within sketch accuracy") {
    val docs = corpus(3000)
    val got = Profile.profile(docs, Seq(col("lang")), col("text"), words)
      .collect().map(r => r.getAs[String]("__k0") -> r).toMap
    assert(got.keySet == Set("en", "de", "fr"))
    assert(got("en").getAs[Long]("n_docs") == 1000)
    // 10% of docs are exact dups of their predecessor (same lang: i and
    // i-1 differ by 1 mod 3... they do NOT share lang, so every doc text
    // within one lang is distinct unless the dup pair lands in-lang —
    // compute the truth directly instead of assuming
    val truth = docs.groupBy("lang")
      .agg(count_distinct(col("text")).as("d"),
        sum(length(col("text")).cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (l <- Seq("en", "de", "fr")) {
      assert(got(l).getAs[Long]("n_distinct_docs") == truth(l)._1)
      assert(got(l).getAs[Long]("n_chars") == truth(l)._2)
      val est = Profile.mergeProfiles(
          Profile.partialProfile(docs.where(col("lang") === l),
            Seq(col("lang")), col("text"), words), 1)
        .head()
      val estD = est.getAs[Long]("est_distinct_docs")
      assert(math.abs(estD - truth(l)._1).toDouble / truth(l)._1 < 0.05,
        s"$l: HLL estimate $estD vs exact ${truth(l)._1}")
    }
  }

  test("partial profiles MERGE: per-batch sketches folded through parquet " +
    "equal the one-shot profile's counters, and the union estimate tracks " +
    "the exact union — without rescanning any batch") {
    val batches = Seq(corpus(1200, 0), corpus(1200, 10000), corpus(1200, 20000))
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      Profile.partialProfile(b, Seq(col("lang")), col("text"), words)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(s"$dir/p")
    }
    val merged = Profile.mergeProfiles(spark.read.parquet(s"$dir/p"), 1)
      .collect().map(r => r.getAs[String]("__k0") -> r).toMap
    val all = batches.reduce(_ union _)
    val truth = all.groupBy("lang")
      .agg(count(lit(1)).as("n"), count_distinct(col("text")).as("d"),
        sum(length(col("text")).cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (l <- Seq("en", "de", "fr")) {
      assert(merged(l).getAs[Long]("n_docs") == truth(l)._1)
      assert(merged(l).getAs[Long]("n_chars") == truth(l)._3)
      val est = merged(l).getAs[Long]("est_distinct_docs")
      // the three batches duplicate each other's texts heavily (same
      // generator): the union's distinct count is far below the counter
      // sum, and only a true sketch UNION can know that
      assert(math.abs(est - truth(l)._2).toDouble / truth(l)._2 < 0.05,
        s"$l: merged estimate $est vs exact union ${truth(l)._2}")
      assert(truth(l)._2 < truth(l)._1, "fixture must overlap across batches")
    }
    // vocabulary estimate tracks too
    val exactVocab = all.where(col("lang") === "en")
      .select(explode(words).as("t")).agg(count_distinct(col("t"))).head.getLong(0)
    val estVocab = merged("en").getAs[Long]("est_vocab")
    assert(math.abs(estVocab - exactVocab).toDouble / exactVocab < 0.05,
      s"vocab estimate $estVocab vs exact $exactVocab")
  }

  test("profileSeries: per-batch AND cumulative rows from the same stored " +
    "partials — counters exact, cumulative distinct tracks the true " +
    "union, delta flags a batch of already-seen documents") {
    // batch 1 is a genuinely NEW corpus (distinct texts); batch 2 repeats
    // batch 1's documents exactly, so its cumulative growth must be ~zero
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val lang = Seq("en", "de", "fr")(i % 3)
      val dupOf = if (i % 10 == 9) i - 1 else i
      (i.toLong, lang, s"$tag words w${dupOf % 7} unique$dupOf tail")
    }.toDF("doc_id", "lang", "text")
    val batches = Seq(mk(900, "alpha"), mk(900, "beta"), mk(900, "beta"))
    val dir = java.nio.file.Files.createTempDirectory("graft-series").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      Profile.partialProfile(b, Seq(col("lang")), col("text"), words)
        .withColumn("batch_id", lit(i.toLong))
        .write.mode(if (i == 0) "overwrite" else "append").parquet(s"$dir/p")
    }
    val series = Profile.profileSeries(spark.read.parquet(s"$dir/p"), 1)
      .collect()
      .map(r => (r.getAs[String]("__k0"), r.getAs[Long]("batch")) -> r).toMap
    assert(series.size == 9) // 3 langs x 3 batches
    val en = batches.head.where(col("lang") === "en")
    val enDocs = en.count()
    val enDistinct = en.select(col("text")).distinct().count()
    for (b <- 0L to 2L) {
      val r = series(("en", b))
      assert(r.getAs[Long]("n_docs") == enDocs)
      assert(r.getAs[Long]("cum_n_docs") == enDocs * (b + 1))
      val est = r.getAs[Long]("est_distinct_docs")
      assert(math.abs(est - enDistinct).toDouble / enDistinct < 0.05)
    }
    // cumulative distincts: batch 0 -> d0; batch 1 adds a NEW corpus
    // (distinct roughly doubles); batch 2 repeats batch 1 (no growth)
    val cum = (0L to 2L).map(b => series(("en", b)).getAs[Long]("cum_est_distinct_docs"))
    assert(math.abs(cum(0) - enDistinct).toDouble / enDistinct < 0.05)
    assert(math.abs(cum(1) - 2 * enDistinct).toDouble / (2 * enDistinct) < 0.05)
    assert(cum(2) == cum(1), "repeat batch must not grow the cumulative sketch")
    assert(series(("en", 2L)).getAs[Long]("delta_est_docs") == 0L)
    assert(series(("en", 1L)).getAs[Long]("delta_est_docs") > 0L)
  }

  test("profile: a NULL group key keeps its group (the aggregate join is " +
    "null-safe — untagged documents must not vanish from the report)") {
    val docs = Seq(
      (1L, "en", "hello world"),
      (2L, null.asInstanceOf[String], "untagged document one"),
      (3L, null.asInstanceOf[String], "untagged document two"))
      .toDF("doc_id", "lang", "text")
    val got = Profile.profile(docs, Seq(col("lang")), col("text"), words)
      .collect().map(r => Option(r.getAs[String]("__k0")) -> r).toMap
    assert(got.keySet == Set(Some("en"), None))
    assert(got(None).getAs[Long]("n_docs") == 2)
    assert(got(None).getAs[Long]("n_distinct_docs") == 2)
    assert(got(None).getAs[Long]("n_vocab") == 4) // untagged document one two
  }

  test("overlap: theta-sketch set algebra estimates |A|, |B|, the planted " +
    "intersection, and Jaccard without any join; disjoint corpora " +
    "estimate ~zero overlap") {
    val a = (0 until 4000).map(i => (i.toLong, s"document alpha $i")).toDF("id", "text")
    val b = (2000 until 6000).map(i => (i.toLong, s"document alpha $i")).toDF("id", "text")
    val r = Profile.overlap(a, col("text"), b, col("text")).head()
    def near(got: Long, want: Long): Boolean =
      math.abs(got - want).toDouble / want < 0.05
    assert(near(r.getAs[Long]("est_a"), 4000), r.toString)
    assert(near(r.getAs[Long]("est_b"), 4000), r.toString)
    assert(near(r.getAs[Long]("est_intersection"), 2000), r.toString)
    assert(near(r.getAs[Long]("est_union"), 6000), r.toString)
    assert(math.abs(r.getAs[Double]("est_jaccard") - 2000.0 / 6000) < 0.02)
    val disjoint = Profile.overlap(a, col("text"),
      (0 until 1000).map(i => (i.toLong, s"beta $i")).toDF("id", "text"),
      col("text")).head()
    assert(disjoint.getAs[Long]("est_intersection") == 0L ||
      disjoint.getAs[Long]("est_intersection") < 20L)
  }
}
