package graft

import org.apache.spark.sql.functions._

import graft.api.{AttributeSpec, Facet, SimOp}
import graft.engine.SimSearchEngine
import graft.engine.SimSearchEngine.{Catalog, SearchSpec}
import graft.sources.CsvMount
import graft.sources.CsvMount.MountSpec

class EngineEdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("mount: WKT single-column spatial attribute (F8 end-to-end)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wkt")
    java.nio.file.Files.writeString(dir.resolve("geo.csv"),
      """id,geom
        |a,POINT(10.0 20.0)
        |b,POINT (11.5 21.5)
        |c,not a point
        |d,POINT(-170.0 -80.0)
        |""".stripMargin)
    val f = CsvMount.mount(spark, dir.toString,
      MountSpec("spatial_knn", "geo.csv", "id", Seq("geom")))
    // unparseable row 'c' is dropped by the NOT-NULL guard (P4)
    assert(f.df.count() == 3)
    val res = SimSearchEngine.search(spark, new Catalog(Seq(f)), 2,
      Seq(SearchSpec("geom", "POINT(10.1 20.1)", Seq(1.0)))).collect()
    assert(res.map(_.getString(res.head.fieldIndex("id"))).toSeq == Seq("a", "b"))
  }

  test("A2: k > K_MAX rejected for multi-attribute queries, allowed for singletons") {
    val f1 = Facet(AttributeSpec("x", SimOp.Numerical),
      (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "value"))
    val f2 = Facet(AttributeSpec("y", SimOp.Numerical),
      (1 to 100).map(i => (i.toLong, -i.toDouble)).toDF("id", "value"))
    val catalog = new Catalog(Seq(f1, f2))
    intercept[IllegalArgumentException] {
      SimSearchEngine.search(spark, catalog, 51, Seq(
        SearchSpec("x", 5.0, Seq(0.5)), SearchSpec("y", -5.0, Seq(0.5))))
    }
    // singleton path: no K_MAX cap, no inflation
    assert(SimSearchEngine.search(spark, catalog, 60,
      Seq(SearchSpec("x", 5.0, Seq(1.0)))).count() == 60)
  }

  test("P6: non-queryable attributes are rejected") {
    val f = Facet(AttributeSpec("hidden", SimOp.Numerical, queryable = false),
      Seq((1L, 1.0)).toDF("id", "value"))
    intercept[IllegalArgumentException] {
      SimSearchEngine.search(spark, new Catalog(Seq(f)), 1,
        Seq(SearchSpec("hidden", 1.0, Seq(1.0))))
    }
  }

  test("A4: z-normalized mount transforms data and query consistently") {
    val f = CsvMount.mount(spark, "/root/reference/data/gdelt",
      MountSpec("numerical_topk", "sample.csv", "article_id",
        Seq("positive_sentiment"), normalized = Some("z")))
    val st = f.spec.stats.get
    // mounted values are z-scores: mean ~ 0, stddev ~ 1
    val r = f.df.agg(avg(col("value")), stddev_samp(col("value"))).head
    assert(math.abs(r.getDouble(0)) < 1e-9 && math.abs(r.getDouble(1) - 1.0) < 1e-9)
    // searching with a RAW query value normalizes it with the same stats:
    // the top result for q = mean is the entity whose value is closest to
    // the mean, and with k=1 the scale self-calibrates to d_1 so the top
    // score is exactly round(exp(-0.05), 6)
    val res = SimSearchEngine.search(spark, new Catalog(Seq(f)), 1,
      Seq(SearchSpec("positive_sentiment", st.avg, Seq(1.0)))).collect()
    val expectedId = f.df
      .orderBy(abs(col("value")), col("id")).select(col("id")).head.getString(0)
    assert(res.length == 1)
    assert(res.head.get(res.head.fieldIndex("id")) == expectedId)
    val expScore = BigDecimal(math.exp(-0.05))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res.head.getDouble(res.head.fieldIndex("score")) == expScore)
  }

  test("P5: max_lines caps ingestion") {
    val f = CsvMount.mount(spark, "/root/reference/data/gdelt",
      MountSpec("numerical_topk", "sample.csv", "article_id",
        Seq("positive_sentiment"), maxLines = Some(10)))
    assert(f.df.count() <= 10)
  }
}
