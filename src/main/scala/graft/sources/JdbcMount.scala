package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{AttributeSpec, Facet, SimOp}
import graft.functions.SimKernels

/** JDBC sources (S7 in-situ / S8 ingest-on-mount) — the rebuild of the
  * reference's JdbcConnector / SimSearchJdbcQuery
  * (reference: insitu/JdbcConnector.java:1-224,
  * insitu/SimSearchJdbcQuery.java:119-177, Coordinator.java:588-603).
  *
  * The reference ships per-dialect SQL templates (PostgreSQL pg_trgm,
  * PostGIS kNN, jsonb token sets) because it must push the similarity
  * computation INTO the database; on Spark the facet is a `spark.read.jdbc`
  * frame and the similarity kernels run in Spark, so one implementation
  * covers every dialect. What still pushes down to the database: column
  * pruning (P1), boolean pre-filters (P2/P3) and IS NOT NULL guards (P4) —
  * Catalyst's JDBC pushdown emits them into the remote WHERE clause.
  *
  * S7 (in-situ): the returned facet frame stays lazy — every query re-reads
  * the table. S8 (ingest): pass ingest=true to cache the typed facet after
  * the first scan, the Spark analogue of pulling the column into memory.
  */
object JdbcMount {

  final case class JdbcSpec(
      url: String,
      table: String,
      keyColumn: String,
      valueColumn: String,
      operation: String,
      driver: Option[String] = None,
      user: Option[String] = None,
      password: Option[String] = None,
      tokenDelimiter: String = ",",
      qgram: Int = 3,
      ingest: Boolean = false)

  def mount(spark: SparkSession, spec: JdbcSpec): Facet = {
    val reader0 = spark.read.format("jdbc")
      .option("url", spec.url)
      .option("dbtable", spec.table)
    val reader1 = spec.driver.fold(reader0)(d => reader0.option("driver", d))
    val reader2 = spec.user.fold(reader1)(u => reader1.option("user", u))
    val reader = spec.password.fold(reader2)(p => reader2.option("password", p))
    val raw = reader.load()
    val id = col(spec.keyColumn).as("id")
    val v = col(spec.valueColumn)

    val (op, valueExpr) = spec.operation match {
      case "numerical_topk"   => (SimOp.Numerical, v.cast("double"))
      case "temporal_topk"    => (SimOp.Temporal, v.cast("timestamp").cast("double") * 1000.0) // epoch ms
      case "categorical_topk" => (SimOp.Categorical, SimKernels.tokenize(v, spec.tokenDelimiter))
      case "textual_topk"     => (SimOp.Textual, v.cast("string"))
      case other => throw new IllegalArgumentException(s"unsupported JDBC operation $other")
    }
    // P1/P4: prune to (key, value) and drop NULLs — both push into the
    // remote query (SELECT key, value ... WHERE value IS NOT NULL).
    var df = raw.select(id, valueExpr.as("value")).na.drop(Seq("id", "value"))
    if (spec.ingest) df = df.cache() // S8
    Facet(AttributeSpec(spec.valueColumn, op, spec.tokenDelimiter, spec.qgram), df)
  }
}
