package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.engine.SimSearchEngine
import graft.engine.SimSearchEngine.{Catalog, SearchSpec}
import graft.sources.CsvMount
import graft.sources.CsvMount.MountSpec

/** Golden replay of the reference's committed standalone fixture:
  * mounts data/gdelt/sample.csv per sources.json, runs search.json, and
  * compares ids + ranks exactly and aggregate scores to 1e-9 against
  * search_results.json (FIXTURES.md §2 comparison policy).
  */
class GdeltGoldenSpec extends SparkTestBase {

  private val gdelt = "/root/reference/data/gdelt"

  test("GDELT golden: search.json reproduces search_results.json (both weight combos)") {
    val specs = Seq(
      MountSpec("spatial_knn", "sample.csv", "article_id",
        Seq("longitude", "latitude"), aliasColumn = Some("position")),
      MountSpec("categorical_topk", "sample.csv", "article_id",
        Seq("persons"), tokenDelimiter = ";"),
      MountSpec("temporal_topk", "sample.csv", "article_id", Seq("timestamp")),
      MountSpec("numerical_topk", "sample.csv", "article_id", Seq("positive_sentiment")),
      MountSpec("numerical_topk", "sample.csv", "article_id", Seq("negative_sentiment")))
    val catalog = new Catalog(specs.map(CsvMount.mount(spark, gdelt, _)))
    assert(catalog.size == 5)

    val res = SimSearchEngine.search(spark, catalog, 5, Seq(
        SearchSpec("persons", Seq("joe biden", "donald trump"), Seq(1.0, 0.8)),
        SearchSpec("timestamp", "2019-11-04 08:45:00", Seq(1.0, 0.4)),
        SearchSpec("position", "POINT(-74.94 42.15)", Seq(1.0, 0.7))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(1), r.getDouble(2)))
      .groupBy(_._1)

    val golden = new ObjectMapper()
      .readTree(new java.io.File(s"$gdelt/standalone/search_results.json"))
    assert(golden.size() == 2)
    (0 until 2).foreach { combo =>
      val exp = golden.get(combo).get("rankedResults")
      val got = res(combo.toLong).sortBy(_._2)
      assert(got.size == exp.size(), s"combo $combo size")
      (0 until exp.size()).foreach { i =>
        val e = exp.get(i)
        val (_, rank, id, score) = got(i)
        assert(id == e.get("id").asText(), s"combo $combo rank ${i + 1} id")
        assert(rank == e.get("rank").asLong(), s"combo $combo rank ${i + 1}")
        // our engine rounds the aggregate score to 6 decimals by design
        assert(math.abs(score - e.get("score").asDouble()) < 5e-7,
          s"combo $combo rank ${i + 1} score $score vs ${e.get("score").asDouble()}")
      }
    }
  }

  test("mount: numerical ingest stats present; datetime chain parses compact format") {
    val f = CsvMount.mount(spark, gdelt,
      MountSpec("numerical_topk", "sample.csv", "article_id", Seq("positive_sentiment")))
    val st = f.spec.stats.get
    assert(st.count > 900 && st.min >= 0.0 && st.max > st.min && st.stddev > 0)

    val t = CsvMount.mount(spark, gdelt,
      MountSpec("temporal_topk", "sample.csv", "article_id", Seq("timestamp")))
    val ms = t.df.where(org.apache.spark.sql.functions.col("id") === "20190201151500-2748")
      .head.getDouble(1)
    // 2019-02-01 15:15:00 UTC epoch ms
    assert(ms == 1549034100000.0)
  }

  test("mount: WKT point parsing and driver-side twins") {
    assert(CsvMount.parseWktPoint("POINT(-74.94 42.15)") == Some((-74.94, 42.15)))
    assert(CsvMount.parseWktPoint("POINT ( -74.94   42.15 )") == Some((-74.94, 42.15)))
    assert(CsvMount.parseWktPoint("LINESTRING(0 0, 1 1)") == None)
    assert(CsvMount.parseDatetimeMs("20190201151500") == Some(1.5490341e12))
    assert(CsvMount.parseDatetimeMs("2019-02-01T15:15:00") == Some(1.5490341e12))
    assert(CsvMount.parseDatetimeMs("not a date") == None)
  }
}
