package graft

import org.apache.spark.sql.SparkSession

import graft.engine.{OutputWriter, RequestParser, SimSearchEngine, SimSql}
import graft.engine.SimSearchEngine.Catalog
import graft.sources.CsvMount

/** End-to-end demo on the reference's GDELT fixture: mount the committed
  * sources.json, run the committed search.json, show the ranked results and
  * similarity matrix, then run one SQL-dialect query. A user of the
  * reference engine follows the same three steps (mount -> search -> output).
  *
  * Run: sbt "runMain graft.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val gdelt = "/root/reference/data/gdelt"
    val (dirs, mountSpecs) = RequestParser.parseMount(s"$gdelt/standalone/sources.json")
    val dataDir = "/root/reference/" + dirs.values.head.stripPrefix("./")
    val catalog = new Catalog(mountSpecs.map { case (_, spec) => CsvMount.mount(spark, dataDir, spec) })
    println(s"mounted attributes: ${catalog.list.map(_._1).mkString(", ")}")

    val (k, algorithm, specs, _) = RequestParser.parseSearch(s"$gdelt/standalone/search.json")
    println(s"search: k=$k algorithm=$algorithm over ${specs.map(_.column).mkString(", ")}")
    val res = SimSearchEngine.search(spark, catalog, k, specs)
    println(OutputWriter.toTabular(res.orderBy("combo", "rank")))

    println("\nsimilarity matrix (combo 0 weights):")
    val matrix = SimSearchEngine.similarityMatrix(spark, catalog, k, specs)
    println(OutputWriter.toTabular(matrix, 25))

    println("\nSQL dialect:")
    val sql = """SELECT *, negative_sentiment
                 WHERE persons ~= 'joe biden, donald trump'
                 AND timestamp ~= '2019-11-04 08:45:00' LIMIT 3"""
    println(OutputWriter.toTabular(SimSql.run(spark, catalog, sql)))
    spark.stop()
  }
}
