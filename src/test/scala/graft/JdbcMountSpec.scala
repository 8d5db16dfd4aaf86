package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.engine.SimSearchEngine
import graft.engine.SimSearchEngine.{Catalog, SearchSpec}
import graft.sources.JdbcMount
import graft.sources.JdbcMount.JdbcSpec

/** S7/S8 against a real embedded Derby database (the Derby jars ship with
  * Spark), including a pushdown check on the physical plan. */
class JdbcMountSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE items (item_id INT NOT NULL, price DOUBLE, tags VARCHAR(100))")
    val ins = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setInt(1, i)
      ins.setDouble(2, i * 10.0)
      ins.setString(3, if (i % 2 == 0) "red,round" else "blue,square")
      ins.addBatch()
    }
    ins.executeBatch()
    conn.close()
  }

  private def numFacet = JdbcMount.mount(spark,
    JdbcSpec(url, "items", "ITEM_ID", "PRICE", "numerical_topk"))

  test("S7: numerical facet over JDBC answers a top-k query") {
    val catalog = new Catalog(Seq(numFacet))
    val res = SimSearchEngine.search(spark, catalog, 5,
      Seq(SearchSpec("PRICE", 503.0, Seq(1.0)))).collect()
    assert(res.length == 5)
    // nearest to 503 is item 50 (500.0)
    assert(res.map(_.get(res.head.fieldIndex("id"))).head == 50)
  }

  test("S7: categorical facet over JDBC with token split") {
    val f = JdbcMount.mount(spark,
      JdbcSpec(url, "items", "ITEM_ID", "TAGS", "categorical_topk"))
    val catalog = new Catalog(Seq(f))
    val res = SimSearchEngine.search(spark, catalog, 3,
      Seq(SearchSpec("TAGS", Seq("red", "round"), Seq(1.0)))).collect()
    assert(res.length == 3)
    // perfect matches score 1.0 (decay of distance 0)
    assert(res.head.getDouble(res.head.fieldIndex("score")) == 1.0)
  }

  test("P2/P4: filters and NOT-NULL guards push down into the JDBC scan") {
    val plan = numFacet.df.where(col("value") > 400.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("IsNotNull"), plan.take(500))
  }

  test("mount request routing: mixed csv/jdbc sources, clear error for restapi") {
    // the reference's multi-source request shape
    // (data/gdelt/service/simsearch-multiple-sources.py:11)
    val req = s"""{
      "sources": [
        {"name": "db", "type": "jdbc", "url": "$url", "username": "u", "password": "p"},
        {"name": "files", "type": "csv", "directory": "/tmp/data/"},
        {"name": "es", "type": "restapi", "url": "http://example.invalid/idx/_search"}
      ],
      "search": [
        {"operation": "numerical_topk", "source": "db", "dataset": "items",
         "key_column": "ITEM_ID", "search_column": "PRICE"},
        {"operation": "categorical_topk", "source": "files", "dataset": "d.csv",
         "key_column": "id", "search_column": "tags"}
      ]
    }"""
    val tmp = java.nio.file.Files.createTempFile("graft-mount", ".json")
    java.nio.file.Files.write(tmp, req.getBytes("UTF-8"))
    try {
      val parsed = graft.engine.RequestParser.parseMountRequest(tmp.toString)
      assert(parsed.csv.map(_._1) == Seq("files"))
      assert(parsed.jdbc.size == 1)
      val j = parsed.jdbc.head
      assert(j.url == url && j.table == "items" && j.keyColumn == "ITEM_ID" &&
        j.valueColumn == "PRICE" && j.user.contains("u") && j.password.contains("p"))
      // a jdbc spec parsed from the request actually mounts and answers
      // (credentials stripped: Derby maps user "u" to schema U, and `items`
      // lives in the default APP schema of this embedded test database)
      val res = SimSearchEngine.search(spark,
        new Catalog(Seq(JdbcMount.mount(spark, j.copy(user = None, password = None)))),
        3, Seq(SearchSpec("PRICE", 503.0, Seq(1.0)))).collect()
      assert(res.length == 3)

      // a search entry against the restapi source routes to a RestMount
      // (ES flavor: the URL does not end /simsearch/api/search), and an
      // entry naming an undeclared source still fails clearly
      val es = req.replace(""""source": "files"""", """"source": "es"""")
      java.nio.file.Files.write(tmp, es.getBytes("UTF-8"))
      val withRest = graft.engine.RequestParser.parseMountRequest(tmp.toString)
      assert(withRest.rest.size == 1)
      assert(withRest.rest.head.valueColumn == "tags" &&
        !withRest.rest.head.source.isSimSearchInstance)
      val bad = req.replace(""""source": "files"""", """"source": "nosuch"""")
      java.nio.file.Files.write(tmp, bad.getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        graft.engine.RequestParser.parseMountRequest(tmp.toString)
      }
      assert(e.getMessage.contains("undeclared"))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("S8: ingest-on-mount caches the typed facet") {
    val f = JdbcMount.mount(spark,
      JdbcSpec(url, "items", "ITEM_ID", "PRICE", "numerical_topk", ingest = true))
    assert(f.df.storageLevel.useMemory)
    assert(f.df.count() == 100)
  }
}
