package graft

import org.apache.spark.sql.functions._

import graft.engine.SimSearchEngine
import graft.engine.SimSearchEngine.{Catalog, SearchSpec}
import graft.operators._
import graft.sources.CsvMount
import graft.sources.CsvMount.MountSpec

class ExactFlagAndIvfSpec extends SparkTestBase {
  import spark.implicits._

  test("exact flag: tight candidate lists mark provably-exact results true, starved ones false") {
    // two facets over disjoint value ranges; with m = 2 out of 20 entities,
    // every candidate misses one facet's list, so scores sit below tau
    val f0 = (0 until 20).map(i => (i.toLong, math.abs(i - 0.0))).toDF("id", "d")
    val f1 = (0 until 20).map(i => (i.toLong, math.abs(i - 19.0))).toDF("id", "d")
    val facets = Seq(
      BoundFacet("a", f0, Seq(0.5)), BoundFacet("b", f1, Seq(0.5)))
    val starved = RankAggregate.topKDetailed(spark, facets, 2, 2)
      .select("exact").collect().map(_.getBoolean(0))
    assert(starved.forall(_ == false), "disjoint tiny candidate lists cannot prove exactness")

    // with m covering the whole table there are no unseen entities -> exact
    val full = RankAggregate.topKDetailed(spark, facets, 2, 20)
      .select("exact").collect().map(_.getBoolean(0))
    assert(full.forall(_ == true))
  }

  test("golden detailed search reports exact=true (candidates cover the fixture's top-5)") {
    val catalog = new Catalog(Seq(
      MountSpec("numerical_topk", "sample.csv", "article_id", Seq("positive_sentiment")),
      MountSpec("numerical_topk", "sample.csv", "article_id", Seq("negative_sentiment"))
    ).map(CsvMount.mount(spark, "/root/reference/data/gdelt", _)))
    val res = SimSearchEngine.search(spark, catalog, 5, Seq(
      SearchSpec("positive_sentiment", 2.5, Seq(0.6)),
      SearchSpec("negative_sentiment", 3.5, Seq(0.4))), detailed = true)
    // m = 5000 > 1000 rows: candidate lists exhaust the data -> provably exact
    assert(res.select("exact").collect().forall(_.getBoolean(0)))
  }

  test("IVF: probing all buckets equals brute force; fewer probes trade recall") {
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 200).map(i => i.toLong -> Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    val df = vecs.toDF("id", "v")
    val centroids = vecs.take(8).map(_._2) // k-means stand-in, deterministic
    val q = vecs(42)._2
    val brute = AnnSearch.bruteCosineTopK(df, "id", col("v"), q, 10)
      .collect().map(_.getLong(0)).toSeq
    val all = AnnSearch.ivfTopK(df, "id", col("v"), centroids, q, 10, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(all == brute, "probing every bucket must equal brute force")
    val one = AnnSearch.ivfTopK(df, "id", col("v"), centroids, q, 10, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    assert(one.subsetOf(df.withColumn("c", AnnSearch.ivfCluster(col("v"), centroids))
      .collect().map(_.getLong(0)).toSet))
    assert(one.nonEmpty && one.size <= 10)
  }

  test("seeded random hyperplanes: column/driver signatures agree; seeds repartition") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.AnnSearch
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dim = emb.select(size(col("v"))).head.getInt(0)
    // the column expression and the driver mirror must produce the SAME
    // signature for every vector (the bucket probe depends on it)
    val rows = emb.limit(64)
      .select(col("vec_id"), col("v"),
        AnnSearch.signatureRandom(col("v"), dim, 8, seed = 7L).as("sig"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(r.getLong(2) == AnnSearch.signatureRandom(v, 8, 7L),
        s"signature mismatch for vec ${r.getLong(0)}")
    }
    // signatures are deterministic per seed and differ across seeds
    val sigs7 = rows.map(_.getLong(2)).toSeq
    val sigs9 = emb.limit(64)
      .select(AnnSearch.signatureRandom(col("v"), dim, 8, seed = 9L))
      .collect().map(_.getLong(0)).toSeq
    assert(sigs7 != sigs9, "different seeds must induce different bucketings")
    assert(sigs7.distinct.size > 1, "random hyperplanes must spread buckets")
    // an identical vector lands in the same bucket as the query (recall of
    // an exact duplicate is 1 by construction)
    val q = rows.head.getSeq[Double](1)
    assert(AnnSearch.signatureRandom(q, 8, 7L) == rows.head.getLong(2))
  }

  test("engine similarity matrix: k x k, symmetric ids, self-similarity 1") {
    val catalog = new Catalog(Seq(
      MountSpec("numerical_topk", "sample.csv", "article_id", Seq("positive_sentiment"))
    ).map(CsvMount.mount(spark, "/root/reference/data/gdelt", _)))
    val m = SimSearchEngine.similarityMatrix(spark, catalog, 4,
      Seq(SearchSpec("positive_sentiment", 2.5, Seq(1.0)))).collect()
    assert(m.length == 16)
    val self = m.filter(r => r.getString(0) == r.getString(1))
    assert(self.length == 4 && self.forall(_.getDouble(2) == 1.0))
  }
}
