package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimKernels

/** The declared query inventory: one entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-oracle SQL twin (same column names, same
  * deterministic ordering) for the driver's hash-match correctness gate.
  *
  * Determinism contract shared by every query/oracle pair:
  *  - every ORDER BY ends with the entity id, so ties break identically;
  *  - distance expressions use only IEEE-exact ops (abs/diff, integer
  *    epoch-microseconds, exact small-int ratios for Jaccard, sqrt) or are
  *    rounded to 6 decimals before being output/ordered on, so a 1-ulp
  *    difference between Java's and DuckDB's exp() cannot flip the result.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** DuckDB SQL for the same trimmed/distinct/non-empty tokenization that
    * SimKernels.tokenize performs. */
  private def sqlTokens(col: String, delim: String): String =
    s"list_distinct(list_filter(list_transform(string_split($col, '$delim'), x -> trim(x)), x -> x <> ''))"

  /** DuckDB SQL for SimKernels.qgrams(col, 3). */
  private def sqlQgrams3(col: String): String =
    s"list_distinct([substr($col, i, 3) for i in range(1, greatest(length($col) - 2, 1) + 1)])"

  /** DuckDB SQL Jaccard similarity of two (already-distinct) lists, as DOUBLE. */
  private def sqlJaccard(a: String, b: String): String =
    s"(CASE WHEN len(list_distinct(list_concat($a, $b))) = 0 THEN 0.0::DOUBLE " +
      s"ELSE len(list_intersect($a, $b))::DOUBLE / len(list_distinct(list_concat($a, $b))) END)"

  // ----------------------------------------------------------------------
  // Q1 numerical_topk (+ R4 singleton, F1 abs distance, A2 top-k)
  // reference: ingested/NumericalSimSearch.java:89-391
  // ----------------------------------------------------------------------
  private val numTopk: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        SimKernels.absDist(col("c_acctbal"), lit(5000.0)).as("dist"))
      .orderBy(col("dist"), col("c_custkey"))
      .limit(10)

  private val numTopkSql =
    """SELECT c_custkey, c_acctbal, abs(c_acctbal - 5000.0) AS dist
      |FROM customer ORDER BY dist, c_custkey LIMIT 10""".stripMargin

  // F12: the "max" query keyword resolves to the attribute max
  // (reference: SearchHandler.java:131-153)
  private val numTopkMax: (SparkSession, String) => DataFrame = (s, dir) => {
    val c = t(s, dir, "customer")
    val qv = c.agg(max(col("c_acctbal"))).head.getDouble(0)
    c.select(col("c_custkey"),
        SimKernels.absDist(col("c_acctbal"), lit(qv)).as("dist"))
      .orderBy(col("dist"), col("c_custkey"))
      .limit(10)
  }

  private val numTopkMaxSql =
    """SELECT c_custkey, abs(c_acctbal - (SELECT max(c_acctbal) FROM customer)) AS dist
      |FROM customer ORDER BY dist, c_custkey LIMIT 10""".stripMargin

  // ----------------------------------------------------------------------
  // Q2 temporal_topk — epoch-microsecond distance, exact integer arithmetic
  // reference: ingested/IndexSimSearch.java:267-268, temporal/DateTimeParser.java
  // ----------------------------------------------------------------------
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by default;
    * read it as a nanosecond long and floor-divide to microseconds — exactly
    * what DuckDB's truncating TIMESTAMP_NS -> TIMESTAMP read does, so the
    * integer distances match bit-for-bit. */
  private val temporalTopk: (SparkSession, String) => DataFrame = (s, dir) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val qUs = java.time.LocalDateTime.parse("2024-03-15T12:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    t(s, dir, "events")
      .selectExpr("event_id", s"abs(ts DIV 1000 - ${qUs}L) AS dist_us")
      .orderBy(col("dist_us"), col("event_id"))
      .limit(20)
  }

  private val temporalTopkSql =
    """SELECT event_id, abs(epoch_us(ts) - epoch_us(TIMESTAMP '2024-03-15 12:00:00')) AS dist_us
      |FROM events ORDER BY dist_us, event_id LIMIT 20""".stripMargin

  // ----------------------------------------------------------------------
  // Q3 categorical_topk — token-set Jaccard, exact small-int ratios
  // reference: ingested/CategoricalSimSearch.java:91-323
  // ----------------------------------------------------------------------
  private val catTopk: (SparkSession, String) => DataFrame = (s, dir) => {
    val toks = SimKernels.tokenize(col("p_name"), " ")
    val qarr = array(lit("red"), lit("widget"))
    t(s, dir, "part")
      .select(col("p_partkey"), SimKernels.jaccardSim(toks, qarr).as("sim"))
      .orderBy(col("sim").desc, col("p_partkey"))
      .limit(10)
  }

  private val catTopkSql = {
    val toks = sqlTokens("p_name", " ")
    s"""WITH tk AS (SELECT p_partkey, $toks AS toks FROM part)
       |SELECT p_partkey, ${sqlJaccard("toks", "['red','widget']")} AS sim
       |FROM tk ORDER BY sim DESC, p_partkey LIMIT 10""".stripMargin
  }

  // ----------------------------------------------------------------------
  // Q4 textual_topk — q-gram Jaccard over documents
  // reference: IndexSimSearch.java:234-248, SearchHandler.java:635-700
  // ----------------------------------------------------------------------
  private val textQuery = "spark join stream order"

  private val textTopk: (SparkSession, String) => DataFrame = (s, dir) => {
    val qGrams = textQuery.sliding(3).toSeq.distinct
    t(s, dir, "documents")
      .select(col("doc_id"),
        SimKernels.jaccardSim(SimKernels.qgrams(col("text"), 3),
          array(qGrams.map(lit): _*)).as("sim"))
      .orderBy(col("sim").desc, col("doc_id"))
      .limit(10)
  }

  private val textTopkSql = {
    val g  = sqlQgrams3("text")
    val qg = sqlQgrams3(s"'$textQuery'")
    s"""WITH d AS (SELECT doc_id, $g AS g FROM documents), q AS (SELECT $qg AS qg)
       |SELECT doc_id, ${sqlJaccard("g", "qg")} AS sim
       |FROM d, q ORDER BY sim DESC, doc_id LIMIT 10""".stripMargin
  }

  // ----------------------------------------------------------------------
  // Q5 spatial_knn — planar Euclidean distance in degrees over a synthetic
  // (lon, lat) pair derived with IEEE-exact arithmetic from customer columns
  // reference: ingested/SpatialSimSearch.java:88-143, measure/SpatialDistance.java:36-60
  // ----------------------------------------------------------------------
  private val spatialKnn: (SparkSession, String) => DataFrame = (s, dir) => {
    // pmod (floored mod) matches DuckDB's fmod semantics on negative values
    val lon = pmod(col("c_acctbal"), lit(360.0)) - lit(180.0)
    val lat = (col("c_custkey") * lit(13L) % lit(180L)).cast("double") - lit(90.0)
    t(s, dir, "customer")
      .select(col("c_custkey"),
        SimKernels.geoDistDeg(lon, lat, lit(10.0), lit(20.0)).as("dist"))
      .orderBy(col("dist"), col("c_custkey"))
      .limit(10)
  }

  private val spatialKnnSql =
    """WITH g AS (SELECT c_custkey,
      |  (fmod(c_acctbal, 360.0::DOUBLE) - 180.0) - 10.0 AS dx,
      |  (((c_custkey * 13) % 180)::DOUBLE - 90.0) - 20.0 AS dy FROM customer)
      |SELECT c_custkey, sqrt(dx * dx + dy * dy) AS dist
      |FROM g ORDER BY dist, c_custkey LIMIT 10""".stripMargin

  // ----------------------------------------------------------------------
  // registry
  // ----------------------------------------------------------------------
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_num_topk"      -> numTopk,
    "q_num_topk_max"  -> numTopkMax,
    "q_temporal_topk" -> temporalTopk,
    "q_cat_topk"      -> catTopk,
    "q_text_topk"     -> textTopk,
    "q_spatial_knn"   -> spatialKnn,
  )

  val oracles: Map[String, String] = Map(
    "q_num_topk"      -> numTopkSql,
    "q_num_topk_max"  -> numTopkMaxSql,
    "q_temporal_topk" -> temporalTopkSql,
    "q_cat_topk"      -> catTopkSql,
    "q_text_topk"     -> textTopkSql,
    "q_spatial_knn"   -> spatialKnnSql,
  )
}
