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

  test("S8: ingest-on-mount caches the typed facet") {
    val f = JdbcMount.mount(spark,
      JdbcSpec(url, "items", "ITEM_ID", "PRICE", "numerical_topk", ingest = true))
    assert(f.df.storageLevel.useMemory)
    assert(f.df.count() == 100)
  }
}
