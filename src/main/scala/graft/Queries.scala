package graft

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SimKernels, TextKernels}
import graft.operators.{AnnSearch, BoundFacet, Dedup, FacetSearch, RankAggregate}

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

  /** The events table with `ts` normalized to epoch MICROSECONDS (`ts_us`,
    * long). The generated parquet has shipped `ts` as both
    * TIMESTAMP(NANOS) — which Spark 4 reads only as a nanosecond long,
    * behind the legacy conf — and TIMESTAMP(MICROS, isAdjustedToUTC=false),
    * which it reads as TIMESTAMP_NTZ. Sniff the resolved type and converge
    * on the value DuckDB's `epoch_us(ts)` yields for the SAME file in both
    * generations (its TIMESTAMP_NS read truncates to µs; its naive
    * timestamps are wall-clock, hence the pinned-UTC session cast here), so
    * every temporal query stays representation-independent and the oracles
    * hash-match bit-for-bit. */
  private def eventsTsUs(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = t(s, dir, "events")
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev.withColumn("ts_us", expr("ts DIV 1000").cast("long"))
      case _ =>
        // the NTZ -> timestamp cast is timezone-aware; pin UTC only for
        // the ANALYSIS of this frame (the zone is baked into the resolved
        // cast), then restore — a session-wide mutation would make every
        // other timezone-sensitive query in the session order-dependent
        val key = "spark.sql.session.timeZone"
        val prev = s.conf.get(key)
        s.conf.set(key, "UTC")
        try ev.withColumn("ts_us",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
            .cast("long"))
        finally s.conf.set(key, prev)
    }
  }

  /** Spread an under-split source across the cluster before expensive
    * per-row compute (shared guard — see [[graft.operators.Dedup.spread]]). */
  private def spread(df: DataFrame): DataFrame = Dedup.spread(df)

  /** Build a persisted index at most once per JVM per path. A served index
    * is built once and probed many times; the declared index queries must
    * stay self-contained for the correctness gate (a fresh JVM builds, then
    * probes — the gate value-checks the whole cycle), but re-running one in
    * the SAME JVM (bench reps) must measure the probe, not re-pay the
    * build+commit cycle it exists to amortize. Process-local on purpose:
    * nothing on disk is ever trusted across JVMs, so a stale index cannot
    * leak into a fresh run. */
  private val builtOnce = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def buildIndexOnce(path: String)(build: => Unit): Unit =
    builtOnce.computeIfAbsent(path, _ => { build; java.lang.Boolean.TRUE })

  /** DuckDB SQL for the same trimmed/distinct/non-empty tokenization that
    * SimKernels.tokenize performs. */
  private def sqlTokens(col: String, delim: String): String =
    s"list_distinct(list_filter(list_transform(string_split($col, '$delim'), x -> trim(x)), x -> x <> ''))"

  /** DuckDB SQL for SimKernels.qgrams(col, q). */
  private def sqlQgramsN(col: String, q: Int): String =
    s"list_distinct([substr($col, i, $q) for i in range(1, greatest(length($col) - ${q - 1}, 1) + 1)])"

  private def sqlQgrams3(col: String): String = sqlQgramsN(col, 3)

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
  /** Epoch-microsecond distances over [[eventsTsUs]]'s normalized `ts_us`
    * — exact integer arithmetic in both engines. */
  private val temporalTopk: (SparkSession, String) => DataFrame = (s, dir) => {
    val qUs = java.time.LocalDateTime.parse("2024-03-15T12:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    eventsTsUs(s, dir)
      .selectExpr("event_id", s"abs(ts_us - ${qUs}L) AS dist_us")
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
      .select(col("p_partkey"), SimKernels.jaccardSimDistinct(toks, qarr).as("sim"))
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
    spread(t(s, dir, "documents"))
      .select(col("doc_id"),
        SimKernels.jaccardSimDistinct(SimKernels.qgrams(col("text"), 3),
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
  // R1–R5 + A1 + A2: multi-facet rank aggregation over orders
  // (numerical o_totalprice, temporal o_orderdate, categorical
  // o_orderpriority tokens), with dynamic per-facet scale calibration.
  // reference: ranking/ThresholdRanking.java:189-289, RankAggregator.java:236-259
  // ----------------------------------------------------------------------
  private def d(v: Double): String = v.toString + "::DOUBLE"

  private val orderQDateUs: Long = java.time.LocalDateTime
    .parse("1997-06-15T00:00:00").toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  /** The three order facets over ONE cached codegen'd distance projection.
    * Returned both as the shared frame + SharedFacet columns (for the
    * MultiTopM paths) and buildable as per-facet BoundFacets below.
    *
    * Candidate generation strategy is m-dependent (measured, DebugAB):
    * the fused MultiTopM scan wins when m << rows-per-partition (the 100 TB
    * shape, and the k=5 calibration here); at m = 10000 ~ 2x the local
    * partition row count the bounded heaps cannot prune, so the aggregation
    * queries keep the per-facet TakeOrderedAndProject passes over the cache. */
  private def orderShared(s: SparkSession, dir: String, combos: Seq[Seq[Double]])
      : (DataFrame, Column, Seq[RankAggregate.SharedFacet]) = {
    val o = spread(t(s, dir, "orders")).select(col("o_orderkey"),
      SimKernels.absDist(col("o_totalprice"), lit(150000.0)).as("d0"),
      abs(unix_micros(col("o_orderdate").cast("timestamp")) - lit(orderQDateUs))
        .cast("double").as("d1"),
      SimKernels.jaccardDistDistinct(SimKernels.tokenize(col("o_orderpriority"), "-"),
        array(lit("1"), lit("URGENT"))).as("d2")).cache()
      .pipe(graft.util.CacheScope.register(_))
    val fs = Seq(
      RankAggregate.SharedFacet("o_totalprice", col("d0"), combos.map(_(0))),
      RankAggregate.SharedFacet("o_orderdate", col("d1"), combos.map(_(1))),
      RankAggregate.SharedFacet("o_orderpriority", col("d2"), combos.map(_(2)),
        jaccard = true))
    (o, col("o_orderkey"), fs)
  }

  private def orderFacets(s: SparkSession, dir: String,
      combos: Seq[Seq[Double]]): Seq[BoundFacet] = {
    val (o, id, fs) = orderShared(s, dir, combos)
    fs.zipWithIndex.map { case (f, i) =>
      BoundFacet(f.name, o.select(id.as("id"), col(s"d$i").as("d")),
        f.weightPerCombo, f.decay, f.scale, f.jaccard)
    }
  }

  /** SQL fragments (id, d) mirroring [[orderFacets]]; element = (sql, isJaccard). */
  private val orderFacetSqls: Seq[(String, Boolean)] = Seq(
    ("SELECT o_orderkey AS id, abs(o_totalprice - 150000.0) AS d FROM orders", false),
    (s"SELECT o_orderkey AS id, abs(epoch_us(o_orderdate) - epoch_us(TIMESTAMP '1997-06-15 00:00:00'))::DOUBLE AS d FROM orders", false),
    (s"SELECT o_orderkey AS id, (1.0::DOUBLE - ${sqlJaccard(sqlTokens("o_orderpriority", "-"), "['1','URGENT']")}) AS d FROM orders", true))

  /** Decayed-similarity SQL for a facet distance `dExpr`, mirroring
    * SimKernels.decaySim / decaySimJaccard with scale subquery `scSub`. */
  private def sqlDecay(dExpr: String, scSub: String, jaccard: Boolean): String = {
    val e = s"exp(-0.05::DOUBLE * $dExpr / $scSub)"
    if (jaccard) s"(CASE WHEN $dExpr = 1.0 THEN 0.0::DOUBLE ELSE $e END)" else e
  }

  /** Generated DuckDB mirror of RankAggregate.topK over SQL facet fragments.
    * Same candidate semantics (top-M per facet ordered by (d, id)), same
    * k-th-distance scale guard, same left-associative weighted score, same
    * (rounded score desc, id) ranking. */
  private def rankAggSql(facetSqls: Seq[(String, Boolean)], combos: Seq[Seq[Double]],
      k: Int, m: Int, idOut: String): String = {
    val n = facetSqls.size
    val ctes = facetSqls.zipWithIndex.map { case ((fs, _), i) =>
      s"f$i AS ($fs),\nc$i AS (SELECT id FROM f$i ORDER BY d, id LIMIT $m),\n" +
        s"sc$i AS (SELECT CASE WHEN max(d) IS NULL OR max(d) <= 0 THEN 1.0::DOUBLE ELSE max(d) END AS sc " +
        s"FROM (SELECT d FROM f$i ORDER BY d, id LIMIT $k))"
    }
    val candU = (0 until n).map(i => s"SELECT id FROM c$i").mkString(" UNION ALL ")
    val joins = facetSqls.zipWithIndex.map { case ((_, jac), i) =>
      val sim = sqlDecay("d", s"(SELECT sc FROM sc$i)", jac)
      s"LEFT JOIN (SELECT id, $sim AS s FROM f$i) j$i ON j$i.id = cand.id"
    }
    val sCols = (0 until n).map(i => s"coalesce(j$i.s, 0.0::DOUBLE) AS s_$i").mkString(", ")
    val comboSelects = combos.zipWithIndex.map { case (ws, c) =>
      val num = ws.zipWithIndex.map { case (w, i) => s"${d(w)} * s_$i" }.mkString(" + ")
      val den = ws.map(d).mkString(" + ")
      s"SELECT $c::BIGINT AS combo, id, round(($num) / ($den), 6) AS score FROM pivoted"
    }.mkString(" UNION ALL ")
    s"""WITH ${ctes.mkString(",\n")},
       |cand AS (SELECT DISTINCT id FROM ($candU)),
       |pivoted AS (SELECT cand.id, $sCols FROM cand ${joins.mkString("\n")}),
       |combos AS ($comboSelects)
       |SELECT combo, id AS $idOut, score, rank::BIGINT AS rank FROM (
       |  SELECT combo, id, score, row_number() OVER (PARTITION BY combo ORDER BY score DESC, id) AS rank FROM combos
       |) WHERE rank <= $k""".stripMargin
  }

  private val combos1 = Seq(Seq(0.4, 0.35, 0.25))
  private val combos2 = Seq(Seq(0.4, 0.35, 0.25), Seq(0.2, 0.3, 0.5))

  private val multiFacet: (SparkSession, String) => DataFrame = (s, dir) => {
    // fused shared-source scoring (optimization r16): the three facets are
    // distance columns over ONE cached projection, so phase 2 is a single
    // broadcast-semi pass instead of 3 scans + union + pivot aggregate —
    // bit-identical results (OperatorSpec asserts row-for-row vs topK)
    val (o, oid, fs) = orderShared(s, dir, combos1)
    RankAggregate.topKSharedScan(s, o, oid, fs, 10, 10000)
      .withColumnRenamed("id", "o_orderkey")
  }

  private val multiFacetSql = rankAggSql(orderFacetSqls, combos1, 10, 10000, "o_orderkey")

  // R5 multi-weight: every weight combination evaluated in one pass
  // (reference: RankAggregator.java:104-129)
  private val multiWeight: (SparkSession, String) => DataFrame = (s, dir) => {
    val (o, oid, fs) = orderShared(s, dir, combos2)
    RankAggregate.topKSharedScan(s, o, oid, fs, 10, 10000)
      .withColumnRenamed("id", "o_orderkey")
  }

  private val multiWeightSql = rankAggSql(orderFacetSqls, combos2, 10, 10000, "o_orderkey")

  // ----------------------------------------------------------------------
  // A5 similarity matrix: k x k pairwise weighted similarity over the top-k
  // result entities (reference: engine/processor/ResultMatrix.java:62-124)
  // ----------------------------------------------------------------------
  private val simMatrix: (SparkSession, String) => DataFrame = (s, dir) => {
    val (o, oid, fs) = orderShared(s, dir, combos1)
    val k = 5
    // calibrate all three facet scales in ONE fused MultiTopM scan, then
    // hand them to topKShared so the aggregation does not recompute them
    val kth = graft.plans.MultiTopM(o, oid, fs.map(_.dist), k)
      .groupBy(col("facet")).agg(max(col("d")).as("dk"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val scales = fs.indices.map { i =>
      val dk = kth.getOrElse(i, 0.0)
      if (dk <= 0.0) 1.0 else dk
    }
    val cal = fs.zip(scales).map { case (f, sc) => f.copy(scale = Some(sc)) }
    // k <= K_MAX = 50 ids: collect them once so the k x k matrix job filters
    // the value scan directly instead of re-executing the whole rank-agg DAG
    // as a join input (the reference's ResultMatrix also works off the
    // already-materialized ranked list, ResultMatrix.java:62-71); fused
    // shared-source scoring (optimization r16, see multiFacet)
    val ids = RankAggregate.topKSharedScan(s, o, oid, cal, k, 1000 * k)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    val vals = t(s, dir, "orders").select(col("o_orderkey").as("id"),
      col("o_totalprice").as("v0"),
      unix_micros(col("o_orderdate").cast("timestamp")).cast("double").as("v1"),
      SimKernels.tokenize(col("o_orderpriority"), "-").as("v2"))
    val tv = vals.where(col("id").isin(ids: _*))
    val pa = tv.select(col("id").as("lid"), col("v0").as("a0"), col("v1").as("a1"), col("v2").as("a2"))
    val pb = tv.select(col("id").as("rid"), col("v0").as("b0"), col("v1").as("b1"), col("v2").as("b2"))
    val s0 = exp(lit(-0.05) * abs(col("a0") - col("b0")) / lit(scales(0)))
    val s1 = exp(lit(-0.05) * abs(col("a1") - col("b1")) / lit(scales(1)))
    val dj = SimKernels.jaccardDistDistinct(col("a2"), col("b2"))
    val s2 = when(dj === 1.0, lit(0.0)).otherwise(exp(lit(-0.05) * dj / lit(scales(2))))
    val ws = combos1.head
    pa.crossJoin(pb).select(col("lid"), col("rid"),
        round((lit(ws(0)) * s0 + lit(ws(1)) * s1 + lit(ws(2)) * s2) / lit(ws.sum), 6).as("sim"))
      .orderBy(col("lid"), col("rid"))
  }

  private val simMatrixSql = {
    val k = 5
    val topkSql = rankAggSql(orderFacetSqls, combos1, k, 1000 * k, "id")
    val jac = sqlJaccard("a.v2", "b.v2")
    val ws = combos1.head
    val s0 = sqlDecay("abs(a.v0 - b.v0)", "(SELECT sc FROM sc0)", jaccard = false)
    val s1 = sqlDecay("abs(a.v1 - b.v1)", "(SELECT sc FROM sc1)", jaccard = false)
    val s2 = sqlDecay(s"(1.0::DOUBLE - $jac)", "(SELECT sc FROM sc2)", jaccard = true)
    // splice the top-k CTEs: reuse everything up to the final SELECT
    val withBody = topkSql.substring("WITH ".length, topkSql.indexOf(",\ncand AS"))
    s"""WITH $withBody,
       |cand AS (SELECT DISTINCT id FROM (SELECT id FROM c0 UNION ALL SELECT id FROM c1 UNION ALL SELECT id FROM c2)),
       |pivoted AS (SELECT cand.id,
       |  coalesce(j0.s, 0.0::DOUBLE) AS s_0, coalesce(j1.s, 0.0::DOUBLE) AS s_1, coalesce(j2.s, 0.0::DOUBLE) AS s_2
       |  FROM cand
       |  LEFT JOIN (SELECT id, ${sqlDecay("d", "(SELECT sc FROM sc0)", false)} AS s FROM f0) j0 ON j0.id = cand.id
       |  LEFT JOIN (SELECT id, ${sqlDecay("d", "(SELECT sc FROM sc1)", false)} AS s FROM f1) j1 ON j1.id = cand.id
       |  LEFT JOIN (SELECT id, ${sqlDecay("d", "(SELECT sc FROM sc2)", true)} AS s FROM f2) j2 ON j2.id = cand.id),
       |tk AS (SELECT id FROM (
       |  SELECT id, row_number() OVER (ORDER BY round((${d(ws(0))} * s_0 + ${d(ws(1))} * s_1 + ${d(ws(2))} * s_2) / (${ws.map(d).mkString(" + ")}), 6) DESC, id) AS rank
       |  FROM pivoted) WHERE rank <= $k),
       |vals AS (SELECT o_orderkey AS id, o_totalprice AS v0, epoch_us(o_orderdate)::DOUBLE AS v1, ${sqlTokens("o_orderpriority", "-")} AS v2 FROM orders),
       |tv AS (SELECT vals.* FROM vals JOIN tk ON vals.id = tk.id)
       |SELECT a.id AS lid, b.id AS rid,
       |  round((${d(ws(0))} * $s0 + ${d(ws(1))} * $s1 + ${d(ws(2))} * $s2) / (${ws.map(d).mkString(" + ")}), 6) AS sim
       |FROM tv a, tv b ORDER BY lid, rid""".stripMargin
  }

  // ----------------------------------------------------------------------
  // A3 ingest statistics (reference: numerical/DoubleNumReader.java:24-56;
  // we compute the true avg, NOT the reference's (max-min)/count bug —
  // documented divergence)
  // ----------------------------------------------------------------------
  private val ingestStats: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "customer").agg(
      count(col("c_acctbal")).as("cnt"),
      min(col("c_acctbal")).as("min_bal"),
      max(col("c_acctbal")).as("max_bal"),
      round(avg(col("c_acctbal")), 6).as("avg_bal"),
      round(stddev_samp(col("c_acctbal")), 6).as("std_bal"))

  private val ingestStatsSql =
    """SELECT count(c_acctbal) AS cnt, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
      |round(avg(c_acctbal), 6) AS avg_bal, round(stddev_samp(c_acctbal), 6) AS std_bal
      |FROM customer""".stripMargin

  // ----------------------------------------------------------------------
  // A4 z-normalization applied to data and query value
  // (reference: numerical/ZNormal.java:23-26, SearchHandler.java:454-461)
  // ----------------------------------------------------------------------
  private val normTopk: (SparkSession, String) => DataFrame = (s, dir) => {
    val c = t(s, dir, "customer")
    val row = c.agg(avg(col("c_acctbal")), stddev_samp(col("c_acctbal"))).head
    val (m, sd) = (row.getDouble(0), row.getDouble(1))
    val z = (col("c_acctbal") - lit(m)) / lit(sd)
    val zq = (5000.0 - m) / sd
    c.select(col("c_custkey"), round(z, 6).as("z"),
        round(abs(z - lit(zq)), 6).as("dist"))
      .orderBy(col("dist"), col("c_custkey"))
      .limit(10)
  }

  private val normTopkSql =
    """WITH st AS (SELECT avg(c_acctbal) AS m, stddev_samp(c_acctbal) AS sd FROM customer)
      |SELECT c_custkey, round((c_acctbal - m) / sd, 6) AS z,
      |  round(abs((c_acctbal - m) / sd - (5000.0 - m) / sd), 6) AS dist
      |FROM customer, st ORDER BY dist, c_custkey LIMIT 10""".stripMargin

  // ----------------------------------------------------------------------
  // R7 weight auto-estimation: p-th percentile of the facet's decayed scores
  // with p = 100 - 100k/n, via explicit deterministic linear interpolation
  // (reference: weights/Estimator.java:145-189, RankAggregator.java:167-192)
  // ----------------------------------------------------------------------
  private val weightEst: (SparkSession, String) => DataFrame = (s, dir) => {
    val k = 10
    val c = t(s, dir, "customer")
    val dist = c.select(col("c_custkey").as("id"),
      SimKernels.absDist(col("c_acctbal"), lit(5000.0)).as("d"))
    val sc = FacetSearch.kthDistanceScale(dist, k)
    val scores = dist.select(col("id"), SimKernels.decaySim(col("d"), 0.05, lit(sc)).as("s"))
    val n = scores.count()
    val p = 1.0 - 10.0 / n
    val idx = p * (n - 1)
    val lo = math.floor(idx).toLong
    val frac = idx - math.floor(idx)
    // the two interpolation rows sit at ascending ranks lo+1 and lo+2 with
    // lo ~ n-11, i.e. inside the top (n-lo) rows from the END — a
    // shuffle-free TakeOrdered heap on the inverted order fetches them;
    // ranking the whole facet through a global single-partition window
    // (the naive formulation) sorts 100% of the data to read 2 rows
    val tail = scores.orderBy(col("s").desc, col("id").desc)
      .limit((n - lo).toInt)
      .select(col("s")).collect().map(_.getDouble(0)).reverse
    val est = if (tail.length < 2) tail(0) else tail(0) + (tail(1) - tail(0)) * frac
    s.range(1).select(round(lit(est), 6).as("weight"))
  }

  private val weightEstSql =
    s"""WITH f AS (SELECT c_custkey AS id, abs(c_acctbal - 5000.0) AS d FROM customer),
       |sc AS (SELECT CASE WHEN max(d) IS NULL OR max(d) <= 0 THEN 1.0::DOUBLE ELSE max(d) END AS sc
       |       FROM (SELECT d FROM f ORDER BY d, id LIMIT 10)),
       |s AS (SELECT id, exp(-0.05::DOUBLE * d / (SELECT sc FROM sc)) AS s FROM f),
       |o AS (SELECT s, row_number() OVER (ORDER BY s, id) AS rn FROM s),
       |par AS (SELECT (1.0::DOUBLE - 10.0::DOUBLE / count(*)) * (count(*) - 1) AS idx FROM s),
       |sel AS (SELECT CAST(floor(idx) AS BIGINT) AS lo, idx - floor(idx) AS frac FROM par)
       |SELECT round(slo + (coalesce(shi, slo) - slo) * frac, 6) AS weight FROM (
       |  SELECT (SELECT s FROM o, sel WHERE rn = lo + 1) AS slo,
       |         (SELECT s FROM o, sel WHERE rn = lo + 2) AS shi,
       |         (SELECT frac FROM sel) AS frac)""".stripMargin

  // ----------------------------------------------------------------------
  // LLM-data-pipeline operators over documents / embeddings
  // ----------------------------------------------------------------------

  /** DuckDB mirror of TextKernels.wordTokens. */
  private def sqlWords(col: String): String =
    s"list_filter(list_transform(string_split($col, ' '), x -> trim(x)), x -> x <> '')"

  /** DuckDB mirror of TextKernels.wordShingles2 over a token-list column. */
  private def sqlShingles2(w: String): String =
    s"list_distinct([$w[i] || ' ' || $w[i+1] for i in range(1, greatest(len($w) - 1, 0) + 1)])"

  private def sqlFingerprint(col: String): String =
    s"md5(trim(regexp_replace(lower($col), '[^a-z0-9]+', ' ', 'g')))"

  // -- near-duplicate detection: banded MinHash + LSH bucket join + exact
  //    Jaccard verify (threshold 0.8 cleanly separates the corpus: planted
  //    near-dups sit at j>=0.9, the background at j<=0.25)
  private val dedupMinhash: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = t(s, dir, "documents")
    val shingles = graft.functions.NativeKernels.wordShingles2(col("text"))
    Dedup.minhashPairs(docs, "doc_id", shingles, 0.8)
      .orderBy(col("a"), col("b"))
  }

  /** DuckDB CTE chain mirroring Dedup.minhashPairs over any shingle CTE
    * chain ending in `sh(doc_id, g)`; the final CTE is `prs(a, b, j)`.
    * `candPred` decides which (x, y) band collisions become candidates:
    * the default self-join half-matrix, or a batch-vs-corpus split for the
    * incremental-index mirror. */
  private def minhashPairsCtes(shingleCtes: String, minJ: Double,
      candPred: String = "x.doc_id < y.doc_id"): String = {
    val sigs = (0 until Dedup.NumHashes)
      .map(i => s"list_min(list_transform(hv, h -> substr(h, ${i + 1}, 8))) AS s_$i").mkString(",\n  ")
    val bands = (0 until Dedup.NumBands).map { b =>
      val parts = (0 until Dedup.RowsPerBand).map(r => s"s_${b * Dedup.RowsPerBand + r}")
      s"md5(${parts.mkString(" || '|' || ")}) AS b$b"
    }.mkString(", ")
    val bandEq = (0 until Dedup.NumBands).map(b => s"x.b$b = y.b$b").mkString(" OR ")
    s"""$shingleCtes,
       |hv AS (SELECT doc_id, list_transform(g, x -> md5(x)) AS hv FROM sh),
       |sig AS (SELECT doc_id,
       |  $sigs
       |FROM hv),
       |band AS (SELECT doc_id, $bands FROM sig),
       |cand AS (SELECT x.doc_id AS a, y.doc_id AS b FROM band x, band y
       |         WHERE ($candPred) AND ($bandEq)),
       |prs AS (SELECT c.a, c.b, ${sqlJaccard("sa.g", "sb.g")} AS j
       |FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
       |WHERE ${sqlJaccard("sa.g", "sb.g")} >= $minJ)""".stripMargin
  }

  /** DuckDB mirror of Dedup.minhashPairs over any shingle CTE chain ending
    * in `sh(doc_id, g)`. */
  private def minhashPairsSql(shingleCtes: String, minJ: Double): String =
    s"""WITH ${minhashPairsCtes(shingleCtes, minJ)}
       |SELECT a, b, j FROM prs ORDER BY a, b""".stripMargin

  private val dedupMinhashSql = minhashPairsSql(
    s"""tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |sh AS (SELECT doc_id, ${sqlShingles2("w")} AS g FROM tk)""".stripMargin, 0.8)

  // -- CROSS-corpus near-dup pairs: odd-id docs as the "training" side vs
  //    even-id docs as the "benchmark" side — the near-dup-level
  //    contamination check. The oracle is the shared minhash CTE chain
  //    with the candidate predicate switched from the self-join
  //    half-matrix to the cross split.
  private val dedupCross: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = t(s, dir, "documents")
    val sh = graft.functions.NativeKernels.wordShingles2(col("text"))
    Dedup.minhashPairsBetween(
        docs.where(col("doc_id") % 2 === 1), "doc_id", sh,
        docs.where(col("doc_id") % 2 === 0), "doc_id", sh, 0.8)
      .orderBy(col("a"), col("b"))
  }

  private val dedupCrossSql =
    s"""WITH ${minhashPairsCtes(
      s"""tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
         |sh AS (SELECT doc_id, ${sqlShingles2("w")} AS g FROM tk)""".stripMargin,
      0.8, candPred = "x.doc_id % 2 = 1 AND y.doc_id % 2 = 0")}
       |SELECT a, b, j FROM prs ORDER BY a, b""".stripMargin

  // -- INCREMENTAL near-dup dedup against a persisted band index (the
  //    production ingestion shape): the even-id half of the corpus is
  //    indexed ONCE (writeBandIndex: exploded band keys + shingle sets as
  //    parquet), then a BOUNDED batch — a fixed odd-id slice, honoring
  //    incrementalPairs' micro-batch contract (its batch side carries an
  //    unconditional broadcast hint, so a corpus-sized "batch" would risk
  //    the broadcast ceiling at larger SFs; a fixed id range stays
  //    fixed-size as the corpus grows) — arrives as the new batch and
  //    dedups against the stored index; the indexed corpus is never
  //    re-hashed. The oracle expresses the same batch x corpus band join
  //    directly over `documents`; results match because the index holds
  //    exactly the corpus half's band keys and shingles.
  private val dedupIncr: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = t(s, dir, "documents")
    val shingles = graft.functions.NativeKernels.wordShingles2(col("text"))
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-bandidx-" + dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
    buildIndexOnce(path)(
      Dedup.writeBandIndex(docs.where(col("doc_id") % 2 === 0), "doc_id", shingles, path))
    Dedup.incrementalPairs(
        docs.where(col("doc_id") % 2 === 1 && col("doc_id").between(200, 459)),
        "doc_id", shingles, path, 0.8)
      .orderBy(col("a"), col("b"))
  }

  private val dedupIncrSql =
    s"""WITH ${minhashPairsCtes(
      s"""tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
         |sh AS (SELECT doc_id, ${sqlShingles2("w")} AS g FROM tk)""".stripMargin, 0.8,
      candPred = "x.doc_id % 2 = 1 AND x.doc_id BETWEEN 200 AND 459 AND y.doc_id % 2 = 0")}
       |SELECT a, b, j FROM prs ORDER BY a, b""".stripMargin

  // -- n-gram Jaccard near-dup: same banded MinHash pipeline over character
  //    10-gram shingles of the 200-char head window (catches near-dups that
  //    word shingles miss when whitespace/punctuation differ). Char-gram
  //    dedup is a short-text technique, and gram width must span word
  //    boundaries: full-document grams are ~20x the shingle volume of word
  //    shingles, and sub-word grams (q<=5) are shared by nearly all
  //    documents of a small-vocabulary corpus, flooding the LSH bands with
  //    spurious candidates (measured 86x candidate blowup at q=5 here).
  //    The word-shingle pipeline (q_dedup_minhash) remains the
  //    full-document path.
  private val dedupNgram: (SparkSession, String) => DataFrame = (s, dir) =>
    Dedup.minhashPairs(t(s, dir, "documents"), "doc_id",
      SimKernels.qgrams(substring(col("text"), 1, 200), 10), 0.8)
      .orderBy(col("a"), col("b"))

  private val dedupNgramSql = minhashPairsSql(
    s"sh AS (SELECT doc_id, ${sqlQgramsN("substr(text, 1, 200)", 10)} AS g FROM documents)", 0.8)

  // -- PARTIAL-overlap pairs by winnowing fingerprints (MOSS): catches a
  //    long passage copied into an otherwise-different document — the
  //    containment case whole-doc Jaccard dilutes away. Exact integer
  //    48-bit md5-prefix hashes; shared-fingerprint counts are integers,
  //    so both engines hash-match bit-for-bit.
  private val winnowQ: (SparkSession, String) => DataFrame = (s, dir) =>
    Dedup.winnowPairs(t(s, dir, "documents"), "doc_id", col("text"))
      .orderBy(col("a"), col("b"))

  /** DuckDB 48-bit integer from the first 12 hex chars of an md5 string
    * expression (the established manual hex digit sum — see sqlHashPct). */
  private def sqlHex12(m: String): String = {
    val terms = (1 to 12).map { i =>
      s"(instr('0123456789abcdef', substr($m, $i, 1)) - 1) * ${math.pow(16, 12 - i).toLong}"
    }
    s"(${terms.mkString(" + ")})"
  }

  private val winnowSql =
    s"""WITH g AS (SELECT doc_id,
       |  [substr(text, i, 16) for i in range(1, greatest(length(text) - 15, 0) + 1)] AS grams
       |  FROM documents),
       |h AS (SELECT doc_id, list_transform(grams, x -> md5(x)) AS ms FROM g
       |      WHERE len(grams) > 0),
       |hs AS (SELECT doc_id, list_transform(ms, m -> ${sqlHex12("m")}) AS hv FROM h),
       |wn AS (SELECT doc_id, list_distinct(
       |  [list_min(list_slice(hv, i, i + 7)) for i in range(1, greatest(len(hv) - 7, 1) + 1)]) AS fps
       |  FROM hs),
       |fp AS (SELECT doc_id, unnest(fps) AS fp FROM wn),
       |rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY fp) WHERE df <= 20),
       |kept AS (SELECT doc_id, fp FROM fp WHERE fp IN (SELECT fp FROM rare)),
       |pr AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
       |       FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
       |       GROUP BY x.doc_id, y.doc_id HAVING count(*) >= 10)
       |SELECT a, b, shared FROM pr ORDER BY a, b""".stripMargin

  // -- winnowing SPANS: the triage output behind q_winnow's counts — WHICH
  //    passage of a matches which passage of b (1-based inclusive char
  //    bounds). Same fingerprint chain with positions riding through;
  //    matches merge into runs along alignment diagonals (d = pa - pb).
  //    All-integer arithmetic end to end, so both engines hash-match.
  private val winnowSpansQ: (SparkSession, String) => DataFrame = (s, dir) =>
    Dedup.winnowSpans(t(s, dir, "documents"), "doc_id", col("text"))
      .orderBy(col("a"), col("b"), col("a_start"), col("b_start"))

  private val winnowSpansSql = {
    def sl = "list_slice(hv, i, i + 7)"
    s"""WITH g AS (SELECT doc_id,
       |  [substr(text, i, 16) for i in range(1, greatest(length(text) - 15, 0) + 1)] AS grams
       |  FROM documents),
       |h AS (SELECT doc_id, list_transform(grams, x -> md5(x)) AS ms FROM g
       |      WHERE len(grams) > 0),
       |hs AS (SELECT doc_id, list_transform(ms, m -> ${sqlHex12("m")}) AS hv FROM h),
       |wn AS (SELECT doc_id,
       |  [{'fp': list_min($sl), 'pos': i + list_position($sl, list_min($sl)) - 1}
       |   for i in range(1, greatest(len(hv) - 7, 1) + 1)] AS fps
       |  FROM hs),
       |-- DISTINCT here mirrors Spark's array_distinct over (fp, pos)
       |-- structs (DuckDB's list_distinct does not support struct lists)
       |occ AS (SELECT DISTINCT doc_id, s.fp AS fp, s.pos AS pos
       |        FROM (SELECT doc_id, unnest(fps) AS s FROM wn)),
       |rare AS (SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS df
       |                         FROM occ GROUP BY fp) WHERE df <= 20),
       |kept AS (SELECT doc_id, fp, pos FROM occ WHERE fp IN (SELECT fp FROM rare)),
       |m AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb,
       |        x.pos - y.pos AS d
       |      FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id),
       |r AS (SELECT a, b, d, pa, pb,
       |        CASE WHEN pa - lag(pa) OVER (PARTITION BY a, b, d ORDER BY pa) > 24
       |          THEN 1 ELSE 0 END AS nr
       |      FROM m),
       |rr AS (SELECT a, b, d, pa, pb,
       |        sum(nr) OVER (PARTITION BY a, b, d ORDER BY pa ROWS UNBOUNDED PRECEDING) AS run
       |      FROM r),
       |sp AS (SELECT a, b, min(pa) AS a_start, max(pa) + 15 AS a_end,
       |        min(pb) AS b_start, max(pb) + 15 AS b_end, count(*) AS n_fp
       |      FROM rr GROUP BY a, b, d, run HAVING count(*) >= 3)
       |SELECT a, b, a_start::INTEGER AS a_start, a_end::INTEGER AS a_end,
       |  b_start::INTEGER AS b_start, b_end::INTEGER AS b_end, n_fp::BIGINT AS n_fp
       |FROM sp ORDER BY a, b, a_start, b_start""".stripMargin
  }

  // -- near-dup CLUSTERING: pairwise hits -> transitive dedup groups
  //    (connected components, min-reachable-id as the cluster label). The
  //    pair source is the char-10-gram MinHash pipeline above; the cluster
  //    step is Dedup.clusters (distributed min-label propagation).
  private val dedupCluster: (SparkSession, String) => DataFrame = (s, dir) => {
    val pairs = Dedup.minhashPairs(t(s, dir, "documents"), "doc_id",
      SimKernels.qgrams(substring(col("text"), 1, 200), 10), 0.8)
    Dedup.clusters(pairs)
      .select(col("n").cast("long").as("doc_id"), col("c").cast("long").as("cluster"))
      .orderBy(col("doc_id"))
  }

  /** Transitive closure of the pair graph by recursive CTE: every node's
    * cluster is the least node it can reach (DuckDB mirrors the min-label
    * fixpoint exactly). */
  private val dedupClusterSql =
    s"""WITH RECURSIVE ${minhashPairsCtes(
      s"sh AS (SELECT doc_id, ${sqlQgramsN("substr(text, 1, 200)", 10)} AS g FROM documents)", 0.8)},
       |edges AS (SELECT a AS x, b AS y FROM prs UNION SELECT b AS x, a AS y FROM prs),
       |r AS (SELECT x AS n, y AS m FROM edges
       |      UNION SELECT r.n, e.y FROM r JOIN edges e ON r.m = e.x)
       |SELECT n::BIGINT AS doc_id, least(n, min(m))::BIGINT AS cluster
       |FROM r GROUP BY n ORDER BY doc_id""".stripMargin

  // -- the DISTRIBUTED clustering branch under the same oracle: identical
  //    semantics to q_dedup_cluster, but localEdgeLimit = 0 forces the
  //    min-label-propagation loop (join + map-side min aggregation per
  //    round, sum-convergence test, periodic checkpoint) instead of the
  //    driver union-find fast path every small-SF query otherwise takes —
  //    so the 100 TB code path itself is hash-gated, not just spec'd.
  private val dedupClusterDist: (SparkSession, String) => DataFrame = (s, dir) => {
    val pairs = Dedup.minhashPairs(t(s, dir, "documents"), "doc_id",
      SimKernels.qgrams(substring(col("text"), 1, 200), 10), 0.8)
    Dedup.clusters(pairs, localEdgeLimit = 0L)
      .select(col("n").cast("long").as("doc_id"), col("c").cast("long").as("cluster"))
      .orderBy(col("doc_id"))
  }

  // -- cluster KEEPER SELECTION by quality: near-dup removal has to pick
  //    which copy of each duplicate group survives, and production
  //    pipelines keep the best copy, not the smallest id — here the
  //    LONGEST text (the most complete version of a templated page),
  //    ties broken by id. Integer length keeps the ordering bit-portable
  //    across engines. One row per cluster: keeper + size + kept length.
  private val dedupKeepBest: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashPairs(docs, "doc_id",
      SimKernels.qgrams(substring(col("text"), 1, 200), 10), 0.8)
    val members = Dedup.clusters(pairs)
      .select(col("n").cast("long").as("doc_id"), col("c").cast("long").as("cluster"))
    members.join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")),
        Seq("doc_id"))
      // argmax by (len, -id): max(struct) partial-aggregates map-side, so
      // a pathological million-member boilerplate cluster sends one
      // candidate per map partition, never a window over every member
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("len"), (-col("doc_id")).as("nid"))).as("m"))
      .select(col("cluster"), col("n_members"),
        (-col("m.nid")).cast("long").as("keeper"), col("m.len").as("kept_len"))
      .orderBy(col("cluster"))
  }

  private val dedupKeepBestSql =
    s"""WITH RECURSIVE ${minhashPairsCtes(
      s"sh AS (SELECT doc_id, ${sqlQgramsN("substr(text, 1, 200)", 10)} AS g FROM documents)", 0.8)},
       |edges AS (SELECT a AS x, b AS y FROM prs UNION SELECT b AS x, a AS y FROM prs),
       |r AS (SELECT x AS n, y AS m FROM edges
       |      UNION SELECT r.n, e.y FROM r JOIN edges e ON r.m = e.x),
       |cl AS (SELECT n::BIGINT AS doc_id, least(n, min(m))::BIGINT AS cluster
       |       FROM r GROUP BY n),
       |mm AS (SELECT cl.cluster, cl.doc_id, length(d.text)::BIGINT AS len
       |       FROM cl JOIN documents d USING (doc_id))
       |SELECT cluster, n_members, doc_id AS keeper, len AS kept_len FROM (
       |  SELECT cluster, doc_id, len,
       |    count(*) OVER (PARTITION BY cluster) AS n_members,
       |    row_number() OVER (PARTITION BY cluster ORDER BY len DESC, doc_id ASC) AS rn
       |  FROM mm) t WHERE rn = 1 ORDER BY cluster""".stripMargin

  // -- the curation DECISION LOGIC as a batch query — the driver-gated
  //    value check of the streaming admit rule
  //    ([[graft.streaming.StreamOps.curationBatch]]'s one-batch form):
  //    quality gate -> exact keep-min -> greedy near-dup drop of the
  //    larger pair side. The loop's replay/index mechanics are spec'd in
  //    StreamOpsSpec; this row pins the decision arithmetic to DuckDB
  //    over the planted-duplicate corpus.
  private val curationQ: (SparkSession, String) => DataFrame = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = withPlantedDups(t(s, dir, "documents"))
    val q = docs.where(length(col("text")) >= 60)
    val w = Window.partitionBy("fp")
    val exactDrops = q
      .select(col("doc_id"), TextKernels.fingerprint(col("text")).as("fp"))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .where(col("doc_id") =!= col("keeper")).select(col("doc_id"))
    val s1 = q.join(exactDrops, Seq("doc_id"), "left_anti")
    val nearDrops = Dedup.minhashPairs(s1, "doc_id",
        graft.functions.NativeKernels.wordShingles2(col("text")), 0.9)
      .select(col("b").as("doc_id")).distinct()
    s1.join(nearDrops, Seq("doc_id"), "left_anti")
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  // lazy: plantedDupsSql is declared further down the object body, and a
  // strict val here would capture its pre-initialization null
  private lazy val curationSql = {
    val shingleCtes =
      s"""tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM s1),
         |sh AS (SELECT doc_id, ${sqlShingles2("w")} AS g FROM tk)""".stripMargin
    s"""WITH dd AS ($plantedDupsSql),
       |q AS (SELECT doc_id, text FROM dd WHERE length(text) >= 60),
       |fk AS (SELECT doc_id,
       |  min(doc_id) OVER (PARTITION BY ${sqlFingerprint("text")}) AS keeper FROM q),
       |s1 AS (SELECT q.doc_id, q.text FROM q JOIN fk USING (doc_id)
       |       WHERE q.doc_id = fk.keeper),
       |${minhashPairsCtes(shingleCtes, 0.9)}
       |SELECT doc_id FROM s1 WHERE doc_id NOT IN (SELECT b FROM prs)
       |ORDER BY doc_id""".stripMargin
  }

  // -- token-budget corpus selection (the assemble-the-training-mix
  //    primitive): keep the best documents, quality-ordered, until the
  //    global token budget fills. Quality metric here = n_chars (integer,
  //    engine-portable ordering); tokens = whitespace word count. The
  //    operator's two-phase prefix sum means no global sort at scale.
  private val tokenBudget: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.Packing.budgetSelect(t(s, dir, "documents"),
        col("doc_id"), size(graft.functions.NativeKernels.wordTokens(col("text"))),
        col("n_chars"), 12000L)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val tokenBudgetSql =
    s"""WITH d AS (SELECT doc_id, len(${sqlWords("text")}) AS n_tok, n_chars
       |           FROM documents),
       |r AS (SELECT doc_id, n_tok, n_chars::DOUBLE AS q,
       |  sum(n_tok) OVER (ORDER BY n_chars DESC, doc_id) AS cum_tok FROM d)
       |SELECT doc_id, n_tok::BIGINT AS n_tok, q, cum_tok::BIGINT AS cum_tok
       |FROM r WHERE cum_tok <= 12000 ORDER BY doc_id""".stripMargin

  // -- deterministic sampling (hash-keyed keep/drop; engine-portable)
  /** DuckDB mirror of Sampling.hashPct: integer value of the first 6 hex
    * chars of md5(id), mod 100 — spelled as an explicit base-16 digit sum
    * (instr over the hex alphabet), all integer arithmetic. */
  private def sqlHashPct(idExpr: String): String = {
    val terms = (1 to 6).map { i =>
      s"(instr('0123456789abcdef', substr(md5(($idExpr)::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 6 - i).toLong}"
    }
    s"((${terms.mkString(" + ")}) % 100)"
  }

  private val sampleHash: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.Sampling.sample(t(s, dir, "documents"), col("doc_id"), 37)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  private val sampleHashSql =
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${sqlHashPct("doc_id")} < 37 ORDER BY doc_id""".stripMargin

  // -- per-row RATE sampling (the quality-temperature mix): acceptance rate
  //    computed from the row itself — here a length-derived curve — against
  //    the deterministic portable hash. Both engines compute the identical
  //    integer rate and the identical hash bucket, so the kept set matches
  //    exactly.
  private val sampleWeighted: (SparkSession, String) => DataFrame = (s, dir) => {
    val rate = least(lit(100L), expr("length(text) DIV 4").cast("long"))
    graft.operators.Sampling.byRate(t(s, dir, "documents"), col("doc_id"), rate)
      .select(col("doc_id"), rate.as("rate"))
      .orderBy(col("doc_id"))
  }

  private val sampleWeightedSql =
    s"""SELECT doc_id, least(100, length(text) // 4)::BIGINT AS rate
       |FROM documents
       |WHERE ${sqlHashPct("doc_id")} < least(100, length(text) // 4)
       |ORDER BY doc_id""".stripMargin

  // -- deterministic train/val/test split: ppm-resolution hash against the
  //    cumulative 98/1/1 boundaries — pure integer comparisons, identical
  //    in both engines; per-split counts prove the assignment AND the mass
  private val splitQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.Sampling.splitByHash(t(s, dir, "documents"),
        col("doc_id"), Seq(("train", 0.98), ("val", 0.01), ("test", 0.01)))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  /** DuckDB mirror of Sampling.hashPpm (8 hex digits, mod 1e6). */
  private def sqlHashPpm(idExpr: String): String = sqlHashMod(idExpr, 1000000L)

  /** DuckDB twin of the generalized md5-prefix bucket hash
    * ([[graft.operators.Dsir.bucket]], [[graft.operators.Sampling.hashPpm]]):
    * the first 8 hex chars of md5 as an integer, mod `m`. */
  private def sqlHashMod(idExpr: String, m: Long): String = {
    val terms = (1 to 8).map { i =>
      s"(instr('0123456789abcdef', substr(md5(($idExpr)::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}"
    }
    s"((${terms.mkString(" + ")}) % $m)"
  }

  private val splitSql =
    s"""SELECT doc_id,
       |  CASE WHEN ${sqlHashPpm("doc_id")} < 980000 THEN 'train'
       |       WHEN ${sqlHashPpm("doc_id")} < 990000 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  private val sampleStratified: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.Sampling.stratified(
        t(s, dir, "documents"), col("lang"), col("doc_id"), 0.3)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  private val sampleStratifiedSql =
    """WITH r AS (SELECT doc_id, lang,
      |  row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
      |  count(*) OVER (PARTITION BY lang) AS cnt FROM documents)
      |SELECT doc_id, lang FROM r WHERE rn <= floor(cnt * 0.3) ORDER BY doc_id""".stripMargin

  // -- source/domain mixing: per-source keep rates, deterministic
  private val sourceMix: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.Sampling.mix(t(s, dir, "documents"),
        col("source"), col("doc_id"), Map("src0" -> 90, "src1" -> 10), 50)
      .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("source"))

  private val sourceMixSql =
    s"""SELECT source, count(*) AS cnt FROM documents
       |WHERE ${sqlHashPct("doc_id")} <
       |  (CASE WHEN source = 'src0' THEN 90 WHEN source = 'src1' THEN 10 ELSE 50 END)
       |GROUP BY source ORDER BY source""".stripMargin

  // -- sequence packing: concat-then-chunk offsets (2048-token windows)
  private val packChunks: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.Packing.packOffsets(t(s, dir, "documents"),
        col("doc_id"), size(graft.functions.NativeKernels.wordTokens(col("text"))), 2048L)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val packChunksSql =
    s"""WITH tk AS (SELECT doc_id, len(${sqlWords("text")}) AS n_tok FROM documents),
       |c AS (SELECT doc_id, n_tok, sum(n_tok) OVER (ORDER BY doc_id) AS cum FROM tk)
       |SELECT doc_id, n_tok::BIGINT AS n_tok, (cum - n_tok)::BIGINT AS start,
       |  ((cum - n_tok) // 2048)::BIGINT AS chunk FROM c ORDER BY doc_id""".stripMargin

  // -- per-document characteristic terms (tf·idf top-3, ratio-idf variant)
  private val tfidfQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.TfIdf.topTerms(t(s, dir, "documents"), // topTerms spreads internally
        col("doc_id"), graft.functions.NativeKernels.wordTokens(col("text")), 3)
      .orderBy(col("doc_id"), col("rank"))

  private val tfidfSql =
    s"""WITH w AS (SELECT doc_id, unnest(${sqlWords("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |sc AS (SELECT doc_id, term, tf, tf * n_docs / df AS score,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY tf * n_docs / df DESC, term) AS rk
       |  FROM tf JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, term, tf::BIGINT AS tf, score, rk::BIGINT AS rank
       |FROM sc WHERE rk <= 3 ORDER BY doc_id, rank""".stripMargin

  // -- unigram LM quality proxy (the CCNet perplexity-filter signal in its
  //    rational, bit-portable form): mean corpus frequency of each doc's
  //    tokens in ppm — junk scores low, boilerplate extreme-high; both
  //    tails are what a perplexity filter drops. Integer count sums, then
  //    ONE fixed-order IEEE expression, so both engines hash-match.
  private val lmQualityQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.TfIdf.corpusFreqQuality(t(s, dir, "documents"),
        col("doc_id"), graft.functions.NativeKernels.wordTokens(col("text")))
      .orderBy(col("doc_id"))

  private val lmQualitySql =
    s"""WITH tk AS (SELECT doc_id, unnest(${sqlWords("text")}) AS tok FROM documents),
       |vocab AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
       |tot AS (SELECT sum(cnt)::BIGINT AS total FROM vocab),
       |agg AS (SELECT t.doc_id, sum(v.cnt)::BIGINT AS sum_cnt, count(*) AS n_tok
       |        FROM tk t JOIN vocab v USING (tok) GROUP BY t.doc_id)
       |SELECT doc_id, round(CAST(sum_cnt AS DOUBLE) * 1000000.0 / n_tok / total, 6) AS freq_ppm
       |FROM agg, tot ORDER BY doc_id""".stripMargin

  // -- interpolated bigram LM quality (the CCNet perplexity filter in its
  //    proper bigram shape): per-doc mean ln of the Jelinek-Mercer mix of
  //    corpus bigram-conditional and unigram probabilities, λ = 0.75.
  //    Counts are exact integers, each factor one fixed-order IEEE
  //    expression, and round-6 absorbs the ≤1-ulp ln()/summation-order
  //    spread (the q_nb_quality discipline). DuckDB zips parallel unnests
  //    of the two shifted token slices for the same bigram stream.
  private val lmBigramQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.TfIdf.bigramQuality(t(s, dir, "documents"),
        col("doc_id"), graft.functions.NativeKernels.wordTokens(col("text")))
      .orderBy(col("doc_id"))

  private val lmBigramSql =
    s"""WITH tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |uni AS (SELECT u AS w, count(*)::BIGINT AS cu
       |        FROM (SELECT unnest(w) AS u FROM tk) GROUP BY u),
       |tot AS (SELECT sum(cu)::BIGINT AS t FROM uni),
       |bg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM tk),
       |bgc AS (SELECT a, b, count(*)::BIGINT AS cb FROM bg GROUP BY a, b),
       |hc AS (SELECT a, sum(cb)::BIGINT AS ch FROM bgc GROUP BY a),
       |lp AS (SELECT bgc.a, bgc.b,
       |  ln(0.75 * (CAST(cb AS DOUBLE) / ch) + 0.25 * (CAST(cu AS DOUBLE) / t)) AS lp
       |  FROM bgc JOIN hc USING (a) JOIN uni ON bgc.b = uni.w, tot)
       |SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
       |  round(sum(lp.lp) / count(*), 6) AS logq
       |FROM bg JOIN lp ON bg.a = lp.a AND bg.b = lp.b
       |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  // -- the PERSISTED-model form of the bigram LM (the actual CCNet
  //    deployment: fit on a trusted subset, score everything): the model
  //    fits ONCE per JVM on the lang='en' documents and persists as
  //    parquet tables + sidecar; scoring left-joins the stored tables
  //    with hit -> unigram-backoff -> OOV-floor coalescing, so off-target
  //    documents exercise all three probability branches. DuckDB replays
  //    fit AND score from the same CTEs.
  private val lmModelQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val w = graft.functions.NativeKernels.wordTokens(col("text"))
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-lmmodel-" + dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
    buildIndexOnce(path)(graft.operators.BigramLm.fit(s,
      t(s, dir, "documents").where(col("lang") === "en"), w, path))
    graft.operators.BigramLm.score(s, t(s, dir, "documents"),
        col("doc_id"), w, path)
      .orderBy(col("doc_id"))
  }

  private val lmModelSql =
    s"""WITH tk AS (SELECT doc_id, lang, ${sqlWords("text")} AS w FROM documents),
       |funi AS (SELECT u AS w, count(*)::BIGINT AS cu
       |         FROM (SELECT unnest(w) AS u FROM tk WHERE lang = 'en') GROUP BY u),
       |ftot AS (SELECT sum(cu)::BIGINT AS t, count(*)::BIGINT AS v FROM funi),
       |fbg AS (SELECT unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b
       |        FROM tk WHERE lang = 'en'),
       |fbgc AS (SELECT a, b, count(*)::BIGINT AS cb FROM fbg GROUP BY a, b),
       |fhc AS (SELECT a, sum(cb)::BIGINT AS ch FROM fbgc GROUP BY a),
       |lp AS (SELECT fbgc.a, fbgc.b,
       |  ln(0.75 * (CAST(cb AS DOUBLE) / ch) + 0.25 * (CAST(cu AS DOUBLE) / t)) AS lp
       |  FROM fbgc JOIN fhc USING (a) JOIN funi ON fbgc.b = funi.w, ftot),
       |lb AS (SELECT w, ln(0.25 * (CAST(cu AS DOUBLE) / t)) AS lb FROM funi, ftot),
       |fl AS (SELECT ln(0.25 * (1.0 / (t + v))) AS f FROM ftot),
       |bg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM tk)
       |SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
       |  sum(CASE WHEN lp.lp IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       |  round(sum(coalesce(lp.lp, lb.lb, (SELECT f FROM fl))) / count(*), 6) AS logq
       |FROM bg LEFT JOIN lp ON bg.a = lp.a AND bg.b = lp.b
       |        LEFT JOIN lb ON bg.b = lb.w
       |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  // -- CCNet head/middle/tail: bucket every document by which corpus-wide
  //    tertile of the LM-quality signal it falls in (Wenzek et al. 2020
  //    §4.3 keeps head+middle and drops tail). Score = the proven-portable
  //    freq_ppm double scaled by 1000 and FLOORED to a long ("milli-ppm")
  //    — floor of an exact *1000.0 product is bit-identical in both
  //    engines, unlike a round whose half-way rule could differ. Low
  //    freq_ppm = rare/junk tokens = high perplexity = CCNet's tail, so
  //    the ascending-score labels run tail -> middle -> head. Both engines
  //    derive the tertile thresholds from the same distinct-score
  //    cumulative counts with pure-integer boundary ranks.
  private val pplBucketsQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val scored = graft.operators.TfIdf.corpusFreqQuality(t(s, dir, "documents"),
        col("doc_id"), graft.functions.NativeKernels.wordTokens(col("text")))
      .select(col("doc_id"),
        floor(col("freq_ppm") * lit(1000.0)).cast("long").as("score"))
    graft.operators.Sampling.quantileBuckets(scored, col("score"),
        Seq(333333L, 666667L), Seq("tail", "middle", "head"))
      .select(col("doc_id"), col("score"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  private val pplBucketsSql =
    s"""WITH tk AS (SELECT doc_id, unnest(${sqlWords("text")}) AS tok FROM documents),
       |vocab AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
       |tot AS (SELECT sum(cnt)::BIGINT AS total FROM vocab),
       |agg AS (SELECT t.doc_id, sum(v.cnt)::BIGINT AS sum_cnt, count(*) AS n_tok
       |        FROM tk t JOIN vocab v USING (tok) GROUP BY t.doc_id),
       |scored AS (SELECT doc_id,
       |  CAST(floor(round(CAST(sum_cnt AS DOUBLE) * 1000000.0 / n_tok / total, 6) * 1000.0) AS BIGINT) AS score
       |  FROM agg, tot),
       |dist AS (SELECT score AS s, count(*) AS c FROM scored GROUP BY score),
       |cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cc,
       |               sum(c) OVER () AS n FROM dist),
       |thr AS (SELECT
       |  min(CASE WHEN cc >= (n * 333333 + 999999) // 1000000 THEN s END) AS t0,
       |  min(CASE WHEN cc >= (n * 666667 + 999999) // 1000000 THEN s END) AS t1
       |  FROM cum)
       |SELECT doc_id, score,
       |  CASE WHEN score <= t0 THEN 'tail'
       |       WHEN score <= t1 THEN 'middle' ELSE 'head' END AS bucket
       |FROM scored, thr ORDER BY doc_id""".stripMargin

  // -- PII / pattern scrubbing: match counts + masked length. The corpus is
  //    synthetic lowercase prose, so the email/URL counts exercise the
  //    zero path while the keyword pattern exercises real matches.
  private val ScrubKw = "(key|hash|table)"

  private val scrubQ: (SparkSession, String) => DataFrame = (s, dir) =>
    spread(t(s, dir, "documents")).select(
        col("doc_id"),
        TextKernels.scrubCount(col("text"), TextKernels.EmailPattern).cast("long").as("n_email"),
        TextKernels.scrubCount(col("text"), TextKernels.UrlPattern).cast("long").as("n_url"),
        TextKernels.scrubCount(col("text"), ScrubKw).cast("long").as("n_kw"),
        length(TextKernels.scrub(col("text"), ScrubKw, "<X>")).cast("long").as("masked_len"))
      .orderBy(col("doc_id"))

  private val scrubSql =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]+'))::BIGINT AS n_email,
       |  len(regexp_extract_all(text, 'https?://[^ ]+'))::BIGINT AS n_url,
       |  len(regexp_extract_all(text, '$ScrubKw'))::BIGINT AS n_kw,
       |  length(regexp_replace(text, '$ScrubKw', '<X>', 'g'))::BIGINT AS masked_len
       |FROM documents ORDER BY doc_id""".stripMargin

  // -- compression-ratio quality signal: deflate(size)/raw(size) per doc.
  //    DuckDB has no deflate function, so the oracle joins a COMMITTED
  //    fixture of zlib-computed (n_raw, n_deflate) keyed by md5(text)
  //    (fixtures/compress_ratio_zlib.parquet, regenerated by
  //    tools/make_compress_fixture.py) — an independent implementation of
  //    the same RFC1950 level-6 stream java.util.zip.Deflater(6) emits;
  //    byte counts verified identical. Value-level kernel behavior is
  //    additionally locked by NativeKernelSpec.
  private val compressRatioQ: (SparkSession, String) => DataFrame = (s, dir) =>
    spread(t(s, dir, "documents"))
      .select(col("doc_id"),
        round(graft.functions.NativeKernels.compressRatio(col("text")), 6)
          .as("deflate_ratio"))
      .orderBy(col("doc_id"))

  // the zlib fixture lives in the repo; resolve its ABSOLUTE path at
  // runtime so the oracle SQL works from any checkout location (the
  // driver's DuckDB process may not share our cwd)
  private val compressFixture: String = {
    val rel = java.nio.file.Paths.get("fixtures", "compress_ratio_zlib.parquet")
    val fromCwd = rel.toAbsolutePath
    val p = if (java.nio.file.Files.exists(fromCwd)) fromCwd
      else sys.env.get("GRAFT_REPO_ROOT")
        .map(r => java.nio.file.Paths.get(r).resolve(rel).toAbsolutePath)
        .getOrElse(fromCwd)
    p.toString.replace("'", "''")
  }

  private val compressRatioSql =
    s"""SELECT d.doc_id,
      |  round(CAST(f.n_deflate AS DOUBLE) / greatest(CAST(f.n_raw AS DOUBLE), 1.0), 6)
      |    AS deflate_ratio
      |FROM documents d
      |JOIN '$compressFixture' f
      |  ON md5(d.text) = f.text_md5
      |ORDER BY d.doc_id""".stripMargin

  // -- exact-duplicate groups + per-document fingerprints. The synthetic
  //    corpus contains NO exact duplicates (a 0-row oracle would prove only
  //    that both engines find nothing), so every 50th document is
  //    re-inserted under a shifted id: the groups found are exactly those
  //    plants, keeper = the original id.
  private val PlantOffset = 1000000L

  private def withPlantedDups(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.unionByName(base.where(col("doc_id") % 50 === 0)
      .select((col("doc_id") + PlantOffset).as("doc_id"), col("text")))
  }

  private val plantedDupsSql =
    s"""SELECT doc_id, text FROM documents
       |UNION ALL SELECT doc_id + $PlantOffset AS doc_id, text
       |FROM documents WHERE doc_id % 50 = 0""".stripMargin

  private val dedupExact: (SparkSession, String) => DataFrame = (s, dir) =>
    Dedup.exactGroups(spread(withPlantedDups(t(s, dir, "documents"))),
      "doc_id", col("text")).orderBy(col("fp"))

  private val dedupExactSql =
    s"""SELECT fp, count(*) AS cnt, min(doc_id) AS keeper
       |FROM (SELECT doc_id, ${sqlFingerprint("text")} AS fp FROM ($plantedDupsSql))
       |GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin

  // -- line/paragraph-level exact dedup (the C4/RefinedWeb boilerplate
  //    strip, [[Dedup.lineDedup]]). The corpus is single-line docs with no
  //    repeated lines, so the fixture synthesizes multi-paragraph PAGES
  //    (doc_id % 40, texts joined in doc_id order) and brands every page
  //    with the same header/footer boilerplate — the classic input: the
  //    operator must keep each boilerplate line only at its minimum
  //    (page, position) occurrence (page 0) and every unique prose line
  //    where it stood.
  private val PageHeader = "subscribe to the newsletter"
  private val PageFooter = "all rights reserved"

  private val dedupLines: (SparkSession, String) => DataFrame = (s, dir) => {
    val pages = t(s, dir, "documents")
      .groupBy((col("doc_id") % 40).as("page_id"))
      .agg(concat_ws("\n", lit(PageHeader),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))),
        lit(PageFooter)).as("text"))
    Dedup.lineDedup(pages, "page_id", col("text")).orderBy(col("page_id"))
  }

  private val dedupLinesSql =
    s"""WITH pages AS (
       |  SELECT doc_id % 40 AS page_id,
       |    '$PageHeader' || chr(10) || string_agg(text, chr(10) ORDER BY doc_id)
       |      || chr(10) || '$PageFooter' AS text
       |  FROM documents GROUP BY 1
       |), lines AS (
       |  SELECT page_id, unnest(ls) AS line, unnest(range(len(ls))) AS pos
       |  FROM (SELECT page_id, string_split(text, chr(10)) AS ls FROM pages)
       |), kept AS (
       |  SELECT page_id, pos, line FROM (
       |    SELECT page_id, pos, line,
       |      row_number() OVER (PARTITION BY line ORDER BY page_id, pos) AS rn
       |    FROM lines WHERE trim(line) <> '') t WHERE rn = 1
       |  UNION ALL
       |  SELECT page_id, pos, line FROM lines WHERE trim(line) = '')
       |SELECT page_id, count(*) AS n_kept,
       |  string_agg(line, chr(10) ORDER BY pos) AS text
       |FROM kept GROUP BY page_id ORDER BY page_id""".stripMargin

  // -- df-capped variant (the RefinedWeb policy): the 40-page boilerplate
  //    exceeds maxDf = 39 and is dropped EVERYWHERE — page 0 loses its
  //    header/footer too, unlike keep-first above.
  private val dedupLinesDf: (SparkSession, String) => DataFrame = (s, dir) => {
    val pages = t(s, dir, "documents")
      .groupBy((col("doc_id") % 40).as("page_id"))
      .agg(concat_ws("\n", lit(PageHeader),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))),
        lit(PageFooter)).as("text"))
    Dedup.lineDedup(pages, "page_id", col("text"), maxDf = 39L)
      .orderBy(col("page_id"))
  }

  private val dedupLinesDfSql =
    s"""WITH pages AS (
       |  SELECT doc_id % 40 AS page_id,
       |    '$PageHeader' || chr(10) || string_agg(text, chr(10) ORDER BY doc_id)
       |      || chr(10) || '$PageFooter' AS text
       |  FROM documents GROUP BY 1
       |), lines AS (
       |  SELECT page_id, unnest(ls) AS line, unnest(range(len(ls))) AS pos
       |  FROM (SELECT page_id, string_split(text, chr(10)) AS ls FROM pages)
       |), firsts AS (
       |  SELECT page_id, pos, line FROM (
       |    SELECT page_id, pos, line,
       |      row_number() OVER (PARTITION BY line ORDER BY page_id, pos) AS rn,
       |      count(DISTINCT page_id) OVER (PARTITION BY line) AS df
       |    FROM lines WHERE trim(line) <> '') t WHERE rn = 1 AND df <= 39
       |  UNION ALL
       |  SELECT page_id, pos, line FROM lines WHERE trim(line) = '')
       |SELECT page_id, count(*) AS n_kept,
       |  string_agg(line, chr(10) ORDER BY pos) AS text
       |FROM firsts GROUP BY page_id ORDER BY page_id""".stripMargin

  // -- INCREMENTAL exact dedup against a persisted fingerprint index: the
  //    full corpus is fingerprint-indexed once, then the planted copies
  //    arrive as a new batch — each one's keeper is its original document,
  //    found by one equi-join against the stored (fp, id) table; the
  //    corpus text is never re-read.
  private val dedupIncrExact: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = t(s, dir, "documents")
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-fpidx-" + dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
    buildIndexOnce(path)(
      Dedup.writeFingerprintIndex(docs, "doc_id", col("text"), path))
    val batch = docs.where(col("doc_id") % 50 === 0)
      .select((col("doc_id") + PlantOffset).as("doc_id"), col("text"))
    Dedup.incrementalExact(batch, "doc_id", col("text"), path)
      .orderBy(col("id"))
  }

  private val dedupIncrExactSql =
    s"""WITH fps AS (SELECT doc_id, ${sqlFingerprint("text")} AS fp FROM documents)
       |SELECT b.doc_id + $PlantOffset AS id, b.fp, min(c.doc_id) AS keeper
       |FROM fps b JOIN fps c ON b.fp = c.fp
       |WHERE b.doc_id % 50 = 0
       |GROUP BY b.doc_id, b.fp ORDER BY id""".stripMargin

  private val fingerprintQ: (SparkSession, String) => DataFrame = (s, dir) =>
    spread(t(s, dir, "documents"))
      .select(col("doc_id"), TextKernels.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val fingerprintSql =
    s"""SELECT doc_id, ${sqlFingerprint("text")} AS fp FROM documents ORDER BY doc_id""".stripMargin

  // -- 16-bit SimHash fingerprints (near-dup by small hamming distance)
  private val simhashQ: (SparkSession, String) => DataFrame = (s, dir) =>
    spread(t(s, dir, "documents"))
      .select(col("doc_id"),
        TextKernels.simhash16(graft.functions.NativeKernels.wordTokens(col("text"))).as("simhash"))
      .orderBy(col("doc_id"))

  private val simhashSql = {
    val bits = (0 until 16).map { j =>
      val contrib = s"list_sum(list_transform(hs, h -> CASE WHEN instr('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1 >= 8 THEN 1 ELSE -1 END))"
      s"(CASE WHEN $contrib > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |h AS (SELECT doc_id, list_transform(list_distinct(w), t -> md5(t)) AS hs FROM tk)
       |SELECT doc_id, ($bits)::BIGINT AS simhash FROM h ORDER BY doc_id""".stripMargin
  }

  // -- SimHash near-dup PAIRS: 64-bit fingerprints as 4 x 16-bit bands,
  //    band-bucket join (pigeonhole: hamming <= 3 collides on >= 1 band),
  //    hamming verify via bit_count(xor). Complements q_dedup_minhash:
  //    SimHash hamming tracks weighted-feature overlap and verifies with
  //    one integer op per candidate instead of an array intersection.
  private val simhashPairsQ: (SparkSession, String) => DataFrame = (s, dir) =>
    Dedup.simhashPairs(t(s, dir, "documents"), "doc_id",
      graft.functions.NativeKernels.wordTokens(col("text")), maxHamming = 3)
      .orderBy(col("a"), col("b"))

  private val simhashPairsSql = {
    // 64 signed bit-sums: bit j of a token's md5 = bit (j%4) of hex nibble
    // (j/4); sum over distinct tokens of (2*bit - 1)
    def bitSum(j: Int) = {
      val nib = s"(instr('0123456789abcdef', substr(h, ${j / 4 + 1}, 1)) - 1)"
      s"list_sum(list_transform(hs, h -> (($nib // ${1 << (j % 4)}) % 2) * 2 - 1))"
    }
    val bands = (0 until 4).map { b =>
      (0 until 16).map(j => s"(CASE WHEN ${bitSum(b * 16 + j)} > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString("(", " + ", s") AS b$b")
    }.mkString(",\n  ")
    val bandEq = (0 until 4).map(b => s"x.b$b = y.b$b").mkString(" OR ")
    val ham = (0 until 4).map(b => s"bit_count(xor(x.b$b, y.b$b)::BIGINT)").mkString(" + ")
    // the all-zero fingerprint (contentless doc) is excluded, mirroring
    // Dedup.simhashPairs' guard against the empty-doc all-pairs blowup
    s"""WITH tk AS (SELECT doc_id, list_distinct(${sqlWords("text")}) AS w FROM documents),
       |hv AS (SELECT doc_id, list_transform(w, t -> md5(t)) AS hs FROM tk),
       |bd0 AS (SELECT doc_id,
       |  $bands
       |FROM hv),
       |bd AS (SELECT * FROM bd0 WHERE NOT (b0 = 0 AND b1 = 0 AND b2 = 0 AND b3 = 0))
       |SELECT a, b, hamming FROM (
       |  SELECT x.doc_id AS a, y.doc_id AS b, ($ham)::BIGINT AS hamming
       |  FROM bd x JOIN bd y ON x.doc_id < y.doc_id AND ($bandEq))
       |WHERE hamming <= 3 ORDER BY a, b""".stripMargin
  }

  // -- benchmark decontamination: what FRACTION of each training document's
  //    distinct word 2-shingles appears in the UNION of an eval set's
  //    shingles (eval set = a FIXED list of docs, doc_id < 10)? A ratio,
  //    not an absolute count: on a shared-vocabulary corpus every doc
  //    shares SOME shingles (background ratio here ~0.42-0.47), while true
  //    eval near-copies sit at >= 0.7. And a FIXED eval set, not a corpus
  //    percentage: benchmarks do not grow with the corpus, and a
  //    percentage-sized eval union eventually covers the whole shingle
  //    space, flagging everything. The eval shingle union is small by
  //    nature, so it broadcasts into the corpus scan.
  private[graft] val ContamEvalMax = 10
  private[graft] val ContamRatio = 0.7

  private val contaminationQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val counts = graft.operators.Contamination.sharedShingleCounts(
        t(s, dir, "documents"), col("doc_id"),
        graft.functions.NativeKernels.wordShingles2(col("text")),
        col("doc_id") < ContamEvalMax)
      .withColumnRenamed("id", "doc_id")
    val ns = coalesce(col("n_shingles"), lit(0L))
    val nh = coalesce(col("n_shared"), lit(0L))
    t(s, dir, "documents").where(col("doc_id") >= ContamEvalMax).select(col("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        ns.cast("long").as("n_shingles"),
        nh.cast("long").as("n_shared"),
        round(nh.cast("double") / greatest(ns, lit(1L)), 6).as("ratio"),
        when(nh.cast("double") / greatest(ns, lit(1L)) >= ContamRatio, 1L).otherwise(0L)
          .cast("long").as("contaminated"))
      .orderBy(col("doc_id"))
  }

  private val contaminationSql =
    s"""WITH tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |sh AS (SELECT doc_id, unnest(${sqlShingles2("w")}) AS g FROM tk),
       |ev AS (SELECT DISTINCT g AS eg FROM sh WHERE doc_id < $ContamEvalMax),
       |ct AS (SELECT doc_id, count(*) AS n_shingles, count(eg) AS n_shared
       |       FROM sh LEFT JOIN ev ON sh.g = ev.eg
       |       WHERE doc_id >= $ContamEvalMax GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(ct.n_shingles, 0)::BIGINT AS n_shingles,
       |  coalesce(ct.n_shared, 0)::BIGINT AS n_shared,
       |  round(coalesce(ct.n_shared, 0)::DOUBLE / greatest(coalesce(ct.n_shingles, 0), 1), 6) AS ratio,
       |  (CASE WHEN coalesce(ct.n_shared, 0)::DOUBLE / greatest(coalesce(ct.n_shingles, 0), 1) >= $ContamRatio
       |        THEN 1 ELSE 0 END)::BIGINT AS contaminated
       |FROM documents d LEFT JOIN ct ON d.doc_id = ct.doc_id
       |WHERE d.doc_id >= $ContamEvalMax ORDER BY d.doc_id""".stripMargin

  // -- decontamination REMOVAL: the cleaned training corpus — every non-eval
  //    document whose eval-shingle ratio stays under the threshold, original
  //    columns intact (n_chars proves the row really is the source row, not
  //    a re-derived id list). Same constants as q_contamination, so the two
  //    queries pin the measure and the removal against one oracle pair.
  private val decontaminateQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.Contamination.decontaminate(
        t(s, dir, "documents"), col("doc_id"),
        graft.functions.NativeKernels.wordShingles2(col("text")),
        col("doc_id") < ContamEvalMax, ContamRatio)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  private val decontaminateSql =
    s"""WITH tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |sh AS (SELECT doc_id, unnest(${sqlShingles2("w")}) AS g FROM tk),
       |ev AS (SELECT DISTINCT g AS eg FROM sh WHERE doc_id < $ContamEvalMax),
       |ct AS (SELECT doc_id, count(*) AS n_sh, count(eg) AS n_hit
       |       FROM sh LEFT JOIN ev ON sh.g = ev.eg
       |       WHERE doc_id >= $ContamEvalMax GROUP BY doc_id),
       |bad AS (SELECT doc_id FROM ct
       |        WHERE n_hit::DOUBLE / greatest(n_sh, 1) >= $ContamRatio)
       |SELECT d.doc_id, length(d.text)::BIGINT AS n_chars FROM documents d
       |WHERE d.doc_id >= $ContamEvalMax
       |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)
       |ORDER BY d.doc_id""".stripMargin

  // -- text quality statistics
  private val enStops = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  private val textStats: (SparkSession, String) => DataFrame = (s, dir) => {
    val w = graft.functions.NativeKernels.wordTokens(col("text"))
    val stopArr = array(enStops.map(lit): _*)
    spread(t(s, dir, "documents")).select(col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        size(array_distinct(w)).cast("long").as("n_distinct"),
        round(aggregate(w, lit(0), (a, x) => a + length(x)).cast("double") / size(w), 6)
          .as("avg_token_len"),
        round(size(filter(w, x => array_contains(stopArr, x))).cast("double") / size(w), 6)
          .as("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  private val textStatsSql = {
    val stops = enStops.map(x => s"'$x'").mkString("[", ",", "]")
    s"""WITH tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents)
       |SELECT doc_id, len(w)::BIGINT AS n_tokens, len(list_distinct(w))::BIGINT AS n_distinct,
       |  round(list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w), 6) AS avg_token_len,
       |  round(len(list_filter(w, x -> list_contains($stops, x)))::DOUBLE / len(w), 6) AS stop_ratio
       |FROM tk ORDER BY doc_id""".stripMargin
  }

  // -- language identification: stopword-hit argmax with fixed tie-break
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> enStops,
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "auf", "zu", "den"),
    "es" -> Seq("el", "los", "las", "de", "y", "en", "es", "por", "con", "del"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une", "avec", "pour", "dans", "au"))

  private val langId: (SparkSession, String) => DataFrame = (s, dir) => {
    val wd = array_distinct(graft.functions.NativeKernels.wordTokens(col("text")))
    val scores = langStops.map { case (l, ws) =>
      l -> size(array_intersect(wd, array(ws.map(lit): _*)))
    }
    // argmax with ties broken by list order (en > de > es > fr)
    val pred = scores.zipWithIndex.init.foldRight(lit(scores.last._1)) {
      case (((l, sc), i), els) =>
        val geRest = scores.drop(i + 1).map(o => sc >= o._2).reduce(_ && _)
        when(geRest, lit(l)).otherwise(els)
    }
    spread(t(s, dir, "documents")).select(
        col("doc_id") +: pred.as("lang_pred") +:
          scores.map { case (l, sc) => sc.cast("long").as(s"s_$l") }: _*)
      .orderBy(col("doc_id"))
  }

  private val langIdSql = {
    def arr(ws: Seq[String]) = ws.map(x => s"'$x'").mkString("[", ",", "]")
    val scoreCols = langStops.map { case (l, ws) =>
      s"len(list_intersect(wd, ${arr(ws)}))::BIGINT AS s_$l"
    }.mkString(",\n  ")
    val langs = langStops.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(s"'${langs.last}'") {
      case ((l, i), els) =>
        val geRest = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"CASE WHEN $geRest THEN '$l' ELSE $els END"
    }
    s"""WITH tk AS (SELECT doc_id, list_distinct(${sqlWords("text")}) AS wd FROM documents),
       |sc AS (SELECT doc_id,
       |  $scoreCols
       |FROM tk)
       |SELECT doc_id, $pred AS lang_pred, s_en, s_de, s_es, s_fr FROM sc ORDER BY doc_id""".stripMargin
  }

  // -- BPE-ish token counting via regex (word / number / punctuation runs)
  private val tokenCount: (SparkSession, String) => DataFrame = (s, dir) =>
    spread(t(s, dir, "documents"))
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_bpe"))
      .orderBy(col("doc_id"))

  private val tokenCountSql =
    """SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_bpe
      |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------------------
  // similarity search over embeddings (brute-force baseline + LSH bucket)
  // ----------------------------------------------------------------------
  private def queryVec(s: SparkSession, dir: String): Seq[Double] =
    t(s, dir, "embeddings").where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0)

  private val annCosine: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    AnnSearch.bruteCosineTopK(e.where(col("vec_id") =!= 0), "vec_id", col("v"),
      queryVec(s, dir), 10)
  }

  private val annCosineSql =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cos
      |FROM embeddings, q WHERE vec_id <> 0
      |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin

  // -- Johnson–Lindenstrauss random projection (64 -> 16): the dense-±1
  //    Achlioptas construction with the sign matrix derived from the
  //    portable md5 convention, so DuckDB regenerates the EXACT matrix
  //    (range(16) × range(64) + the md5-digit parity) and replays the
  //    projection: y_j = sum_i sign(j,i)·x_i / sqrt(16). Sum order differs
  //    between engines (DuckDB group-sum vs the kernel's ascending-i loop);
  //    round-6 absorbs the ulp spread: the closest pre-rounded value to a
  //    .5e-6 boundary measures 1.4e-12 (sf0.001; 4.2e-11 / 1.9e-11 at
  //    sf0.01/0.1) against a ≤1e-14 64-term summation-order spread.
  private val randProjQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    graft.operators.Embeddings.project(e, col("vec_id"), col("v"), 64, 16)
      .select(col("id").as("vec_id") +:
        (0 until 16).map(j =>
          round(element_at(col("vector"), j + 1), 6).as(s"y$j")): _*)
      .orderBy(col("vec_id"))
  }

  private val randProjSql = {
    val hashTerms = (1 to 8).map { c =>
      s"(instr('0123456789abcdef', substr(md5(j::VARCHAR || ':' || i::VARCHAR), $c, 1)) - 1) * ${math.pow(16, 8 - c).toLong}"
    }.mkString(" + ")
    val dims = (0 until 16).map { j =>
      s"round(max(CASE WHEN j = $j THEN dot END) / sqrt(16), 6) AS y$j"
    }.mkString(",\n  ")
    s"""WITH ex AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
       |             unnest(range(len(embedding))) AS i FROM embeddings),
       |s AS (SELECT j, i,
       |        CASE WHEN (($hashTerms) % 2) = 0 THEN 1.0 ELSE -1.0 END AS sg
       |      FROM range(16) t1(j), range(64) t2(i)),
       |p AS (SELECT vec_id, j, sum(sg * x) AS dot
       |      FROM ex JOIN s USING (i) GROUP BY vec_id, j)
       |SELECT vec_id,
       |  $dims
       |FROM p GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  private def sqlSig8(v: String): String =
    (0 until 8).map(j => s"(CASE WHEN $v[${j + 1}] >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("(", " + ", ")::BIGINT")

  private val annLsh: (SparkSession, String) => DataFrame = (s, dir) => {
    val qv = queryVec(s, dir)
    val qsig = AnnSearch.signature8(qv)
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("sig", AnnSearch.signature8(col("v")))
      .where(col("sig") === lit(qsig) && col("vec_id") =!= 0)
    AnnSearch.bruteCosineTopK(e, "vec_id", col("v"), qv, 5)
  }

  private val annLshSql =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv, ${sqlSig8("(embedding::DOUBLE[])")} AS qsig
       |           FROM embeddings WHERE vec_id = 0),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v, ${sqlSig8("(embedding::DOUBLE[])")} AS sig FROM embeddings)
       |SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cos
       |FROM e, q WHERE sig = qsig AND vec_id <> 0
       |ORDER BY cos DESC, vec_id LIMIT 5""".stripMargin

  // -- multi-probe LSH over the production seeded-random-hyperplane
  //    signature (AnnSearch.signatureRandom): each row's 8-bit bucket is one
  //    codegen'd projection; the query probes its own bucket plus the 3
  //    lowest-|dot| bit-flip perturbations. The oracle reproduces the
  //    ENTIRE path in SQL — identical hyperplane double literals (inlined
  //    from AnnSearch.planes), the same left-to-right dot accumulation
  //    (list_reduce), the same (score, mask) probe ranking — so the
  //    production bucket key itself is value-level verified, not just the
  //    axis-aligned signature8 stand-in.
  private val annLshMp: (SparkSession, String) => DataFrame = (s, dir) => {
    val qv = queryVec(s, dir)
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .where(col("vec_id") =!= 0)
    AnnSearch.lshTopK(e, "vec_id", col("v"), 64, qv,
      5, nBits = 8, seed = 42L, probes = 4)
  }

  /** The multi-probe LSH oracle, parameterized by signature width: DuckDB
    * inlines the IDENTICAL hyperplane literals (AnnSearch.planes) and
    * reproduces the base signature, the summed-|dot| probe ranking, the
    * bucket filter, and the exact cosine re-rank in SQL. */
  private def annMpSql(nBits: Int, probes: Int): String = {
    val hs = AnnSearch.planes(64, nBits, 42L)
      .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val jHi = nBits + 1          // range(1, jHi) = hyperplane indices
    val mHi = 1 << nBits         // range(1, mHi) = non-empty flip masks
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |h(hs) AS (SELECT $hs::DOUBLE[][]),
       |qd AS (SELECT [list_reduce([qv[i] * hs[j][i] for i in range(1, 65)],
       |               (a, b) -> a + b) for j in range(1, $jHi)] AS dots FROM q, h),
       |b AS (SELECT list_sum([CASE WHEN dots[j] >= 0 THEN (1::BIGINT << (j-1))
       |               ELSE 0::BIGINT END for j in range(1, $jHi)])::BIGINT AS base,
       |             dots FROM qd),
       |mk AS (SELECT m::BIGINT AS m,
       |              list_sum([CASE WHEN ((m >> (j-1)) & 1) = 1 THEN abs(dots[j])
       |                ELSE 0.0 END for j in range(1, $jHi)]) AS score
       |       FROM range(1, $mHi) t(m), b),
       |pr AS (SELECT base AS sig FROM b
       |       UNION ALL
       |       SELECT xor(base, m) FROM b,
       |         (SELECT m FROM mk ORDER BY score, m LIMIT ${probes - 1})),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
       |es AS (SELECT vec_id, v,
       |         list_sum([CASE WHEN list_reduce([v[i] * hs[j][i] for i in range(1, 65)],
       |             (a, b) -> a + b) >= 0 THEN (1::BIGINT << (j-1))
       |           ELSE 0::BIGINT END for j in range(1, $jHi)])::BIGINT AS sig
       |       FROM e, h)
       |SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cos
       |FROM es, q WHERE sig IN (SELECT sig FROM pr)
       |ORDER BY cos DESC, vec_id LIMIT 5""".stripMargin
  }

  private val annLshMpSql = annMpSql(8, 4)

  // -- Persisted bucketed LSH index end-to-end (the served-index path):
  //    build writes the corpus partitionBy(bucket), the query reads ONLY the
  //    probed partition directories. Answers are identical to the on-the-fly
  //    multi-probe path by construction, so the q_ann_lsh_mp oracle applies
  //    verbatim — the driver gate value-checks the whole build+probe cycle.
  private val annIdx: (SparkSession, String) => DataFrame = (s, dir) => {
    val qv = queryVec(s, dir)
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .where(col("vec_id") =!= 0)
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-annidx-" + dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
    // nBits = 6 (64 directories): at this corpus size more buckets would
    // pay pure file-committer overhead; the pruning ratio (probes/2^nBits)
    // and the plan shape are identical at any width
    buildIndexOnce(path)(
      graft.operators.AnnIndex.buildLsh(e, "vec_id", col("v"), 64, path, nBits = 6))
    // nBits/seed come from the index's own metadata sidecar — no caller
    // parameters to go stale
    graft.operators.AnnIndex.lshTopK(s, path, "vec_id", qv, 5, probes = 4)
  }

  // -- IVF ANN: nearest-centroid assignment, 2-probe, exact cosine re-rank.
  //    Centroids are fixed exactly-representable literals (k-means would
  //    produce them in a real pipeline; any fixed list exercises the same
  //    partition-pruned plan shape).
  private val ivfCentroids: Seq[Seq[Double]] = Seq(
    Seq.fill(64)(0.25),
    Seq.fill(64)(-0.25),
    (0 until 64).map(j => if (j % 2 == 0) 0.5 else -0.5).toSeq,
    (0 until 64).map(j => if (j < 32) 0.5 else -0.5).toSeq)

  private val annIvf: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    AnnSearch.ivfTopK(e.where(col("vec_id") =!= 0), "vec_id", col("v"),
      ivfCentroids, queryVec(s, dir), 10, 2)
  }

  // -- Persisted IVF index end-to-end: buildIvf writes one directory per
  //    cluster; the query prunes to the 2 probed clusters. Answers are
  //    identical to the on-the-fly ivfTopK by construction, so the
  //    q_ann_ivf oracle applies verbatim.
  private val annIvfIdx: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .where(col("vec_id") =!= 0)
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-ivfidx-" + dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
    buildIndexOnce(path)(
      graft.operators.AnnIndex.buildIvf(e, "vec_id", col("v"), ivfCentroids, path))
    // centroids come from the index's own metadata sidecar
    graft.operators.AnnIndex.ivfTopK(s, path, "vec_id", queryVec(s, dir), 10, 2)
  }

  // -- Product quantization ADC search: encode every vector to m=8 sub-codes
  //    (4 codewords × 8 dims each — exactly-representable literals; a
  //    trained pqTrain codebook would slot in unchanged), then rank by the
  //    asymmetric distance read from the query's lookup table. The oracle
  //    re-derives the encoding AND the ADC sum from the same literals, so
  //    the hash match pins the whole encode -> LUT -> scan -> top-k cycle.
  private val pqCodebooks: Seq[Seq[Seq[Double]]] = {
    val cw = Seq(
      Seq.fill(8)(0.25),
      Seq.fill(8)(-0.25),
      (0 until 8).map(j => if (j % 2 == 0) 0.5 else -0.5).toSeq,
      Seq.fill(8)(0.0))
    Seq.fill(8)(cw)
  }

  // Shared oracle-SQL fragments for the PQ/IVF family — ONE copy each: the
  // encode arithmetic, literal rendering, and probe selection are
  // determinism contracts, and a fix applied to one inlined copy but not
  // another would silently desynchronize the oracles.
  private def sqlVecLit(c: Seq[Double]) =
    c.map(x => if (x == math.floor(x)) s"${x.toLong}.0" else x.toString)
      .mkString("([", ", ", "]::DOUBLE[])")
  /** L2 between 64-dim vector expr `v` and a centroid literal. */
  private def sqlCentroidL2(v: String, c: Seq[Double]) =
    s"sqrt(list_sum([($v[k] - ${sqlVecLit(c)}[k]) * ($v[k] - ${sqlVecLit(c)}[k]) for k in range(1, 65)]))"
  /** Distances of `v` to every [[ivfCentroids]] entry, as a list literal. */
  private def sqlCentroidDists(v: String) =
    ivfCentroids.map(c => sqlCentroidL2(v, c)).mkString("[", ", ", "]")
  /** Squared L2 between dims [s*8+1, s*8+8] of `v` and codeword `c`. */
  private def sqlSubSq(v: String, s: Int, c: Seq[Double]) =
    s"list_sum([($v[${s * 8} + k] - ${sqlVecLit(c)}[k]) * ($v[${s * 8} + k] - ${sqlVecLit(c)}[k]) for k in range(1, 9)])"
  /** PQ code for subspace s: first-index argmin over sqrt'd distances. */
  private def sqlPqCode(v: String, s: Int) = {
    val ds = pqCodebooks(s).map(c => s"sqrt(${sqlSubSq(v, s, c)})")
      .mkString("[", ", ", "]")
    s"(list_position($ds, list_aggregate($ds, 'min')) - 1)"
  }
  /** The query's ADC LUT row for subspace s (squared, no sqrt). */
  private def sqlPqLutRow(s: Int) =
    pqCodebooks(s).map(c => sqlSubSq("qv", s, c)).mkString("[", ", ", "]")

  private val pqTopk: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val enc = graft.operators.Quantize.pqEncode(
      e.where(col("vec_id") =!= 0), col("vec_id"), col("v"), pqCodebooks)
    graft.operators.Quantize.pqAdcTopK(enc, col("id"), col("codes"),
        pqCodebooks, queryVec(s, dir), 10)
      .withColumnRenamed("id", "vec_id")
  }

  private val pqTopkSql = {
    val codeCols = (0 until 8).map(s => s"${sqlPqCode("v", s)} AS c$s").mkString(",\n  ")
    val lutCols = (0 until 8).map(s => s"${sqlPqLutRow(s)} AS l$s").mkString(",\n  ")
    val adc = (0 until 8).map(s => s"l$s[c$s + 1]").mkString(" + ")
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |lut AS (SELECT
       |  $lutCols
       |FROM q),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
       |enc AS (SELECT vec_id,
       |  $codeCols
       |FROM e)
       |SELECT vec_id, round(sqrt($adc), 6) AS adc
       |FROM enc, lut ORDER BY adc, vec_id LIMIT 10""".stripMargin
  }

  // -- Embedding-space INCREMENTAL near-dup: an odd-id batch checked against
  //    the persisted LSH index of the even-id corpus — the ANN twin of
  //    q_dedup_incr. The oracle reproduces the production random-hyperplane
  //    signature from the identical literals (the annMpSql machinery) for
  //    BOTH sides, joins on the shared bucket, and verifies exact cosine.
  private val annIncr: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-annincr-" + dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
    buildIndexOnce(path)(
      graft.operators.AnnIndex.buildLsh(e.where(col("vec_id") % 2 === 0),
        "vec_id", col("v"), 64, path, nBits = 8))
    graft.operators.AnnIndex.incrementalNearDup(
        e.where(col("vec_id") % 2 === 1), "vec_id", col("v"), path, 0.2)
      .orderBy(col("a"), col("b"))
  }

  private val annIncrSql = {
    val hs = AnnSearch.planes(64, 8, 42L)
      .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"""WITH h(hs) AS (SELECT $hs::DOUBLE[][]),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |es AS (SELECT vec_id, v,
       |         list_sum([CASE WHEN list_reduce([v[i] * hs[j][i] for i in range(1, 65)],
       |             (a, b) -> a + b) >= 0 THEN (1::BIGINT << (j-1))
       |           ELSE 0::BIGINT END for j in range(1, 9)])::BIGINT AS sig
       |       FROM e, h)
       |SELECT x.vec_id AS a, y.vec_id AS b,
       |  round(list_cosine_similarity(x.v, y.v), 6) AS cos
       |FROM es x JOIN es y ON x.sig = y.sig
       |WHERE x.vec_id % 2 = 1 AND y.vec_id % 2 = 0
       |  AND round(list_cosine_similarity(x.v, y.v), 6) >= 0.2
       |ORDER BY a, b""".stripMargin
  }

  // -- Persisted IVF-PQ index end-to-end: buildIvfPq stores only (id, codes)
  //    partitioned by coarse cluster; the probe prunes to the 2 nearest
  //    clusters and ADC-ranks the stored codes against the query's LUT. The
  //    oracle composes the IVF assignment/probe arithmetic (q_ann_ivf) with
  //    the PQ encode/ADC arithmetic (q_pq_topk) from the same literals.
  private val pqIvfIdx: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .where(col("vec_id") =!= 0)
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-ivfpqidx-" + dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
    buildIndexOnce(path)(
      graft.operators.AnnIndex.buildIvfPq(e, "vec_id", col("v"),
        ivfCentroids, pqCodebooks, path))
    // centroids AND codebooks come from the index's own metadata sidecar
    graft.operators.AnnIndex.ivfPqTopK(s, path, "vec_id", queryVec(s, dir), 10, 2)
  }

  private val pqIvfIdxSql = {
    val codeCols = (0 until 8).map(s => s"${sqlPqCode("v", s)} AS c$s").mkString(",\n  ")
    val lutCols = (0 until 8).map(s => s"${sqlPqLutRow(s)} AS l$s").mkString(",\n  ")
    val adc = (0 until 8).map(s => s"l$s[c$s + 1]").mkString(" + ")
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT idx FROM (
       |    SELECT unnest([0, 1, 2, 3]) AS idx, unnest(${sqlCentroidDists("qv")}) AS pd FROM q)
       |  ORDER BY pd, idx LIMIT 2),
       |lut AS (SELECT
       |  $lutCols
       |FROM q),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
       |asn AS (SELECT vec_id, v,
       |  (list_position(${sqlCentroidDists("v")}, list_aggregate(${sqlCentroidDists("v")}, 'min')) - 1) AS cluster FROM e),
       |enc AS (SELECT vec_id,
       |  $codeCols
       |FROM asn WHERE cluster IN (SELECT idx FROM probe))
       |SELECT vec_id, round(sqrt($adc), 6) AS adc
       |FROM enc, lut ORDER BY adc, vec_id LIMIT 10""".stripMargin
  }

  private val annIvfSql = {
    // centroid literals are inlined (DuckDB cannot correlate an outer column
    // into a list comprehension inside a subquery)
    def ds(v: String) = sqlCentroidDists(v)
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT idx FROM (
       |    SELECT unnest([0, 1, 2, 3]) AS idx, unnest(${ds("qv")}) AS pd FROM q)
       |  ORDER BY pd, idx LIMIT 2),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
       |asn AS (SELECT vec_id, v,
       |  (list_position(${ds("v")}, list_aggregate(${ds("v")}, 'min')) - 1) AS cluster FROM e)
       |SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cos
       |FROM asn, q WHERE cluster IN (SELECT idx FROM probe)
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  // -- embedding near-duplicate pairs, LSH-bucketed (same-signature join)
  private val dedupEmbedding: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("sig", AnnSearch.signature8(col("v")))
    val a = e.select(col("vec_id").as("a"), col("v").as("va"), col("sig"))
    val b = e.select(col("vec_id").as("b"), col("v").as("vb"), col("sig"))
    a.join(b, Seq("sig"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), round(graft.functions.NativeKernels.cosineSim(col("va"), col("vb")), 6).as("cos"))
      .where(col("cos") >= 0.4)
      .orderBy(col("a"), col("b"))
  }

  private val dedupEmbeddingSql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, ${sqlSig8("(embedding::DOUBLE[])")} AS sig FROM embeddings)
       |SELECT x.vec_id AS a, y.vec_id AS b, round(list_cosine_similarity(x.v, y.v), 6) AS cos
       |FROM e x JOIN e y ON x.sig = y.sig AND x.vec_id < y.vec_id
       |WHERE round(list_cosine_similarity(x.v, y.v), 6) >= 0.4
       |ORDER BY a, b""".stripMargin

  // -- SemDeDup (Abbas et al., arXiv:2303.09540): coarse-cluster the
  //    embeddings, near-dup compare WITHIN clusters only, keep the min id
  //    per duplicate component. Same fixed exactly-representable centroids
  //    as the IVF queries (a trained k-means would produce them in a real
  //    pipeline; any fixed list exercises the same assignment + in-cluster
  //    join + component shapes), same rounded-cosine threshold as
  //    q_dedup_embedding.
  private val semDedupQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    graft.operators.SemDedup.dedup(e, col("vec_id"), col("v"), ivfCentroids, 0.4)
      .select(col("vec_id"),
        AnnSearch.ivfCluster(col("v"), ivfCentroids).cast("long").as("cluster"))
      .orderBy(col("vec_id"))
  }

  private val semDedupSql = {
    def ds(v: String) = sqlCentroidDists(v)
    s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |asn AS (SELECT vec_id, v,
       |  (list_position(${ds("v")}, list_aggregate(${ds("v")}, 'min')) - 1) AS cluster FROM e),
       |p AS (SELECT x.vec_id AS pa, y.vec_id AS pb
       |      FROM asn x JOIN asn y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |      WHERE round(list_cosine_similarity(x.v, y.v), 6) >= 0.4),
       |edges AS (SELECT pa AS x, pb AS y FROM p UNION SELECT pb, pa FROM p),
       |r AS (SELECT x AS n, y AS m FROM edges
       |      UNION SELECT r.n, e2.y FROM r JOIN edges e2 ON r.m = e2.x),
       |losers AS (SELECT n FROM r GROUP BY n HAVING least(n, min(m)) <> n)
       |SELECT vec_id, cluster::BIGINT AS cluster FROM asn
       |WHERE vec_id NOT IN (SELECT n FROM losers) ORDER BY vec_id""".stripMargin
  }

  // ----------------------------------------------------------------------
  // Q9 pivot-equivalent multi-metric search (F5 Lp metrics): weighted
  // decayed multi-metric top-k with exact scoring — the semantics of the
  // reference's RR*-tree distance-browsing search, realized as per-metric
  // candidate generation + exact re-rank (SURVEY.md §7.4; reference:
  // pivoting/rtree/MultiMetricSimilaritySearch.java:69-131, exactDistance
  // :298-312). Scale calibration is the deterministic k-th distance; the
  // reference derives epsilon thresholds from an UNSEEDED random sample
  // (PivotAllocation.java:169-247, Collections.shuffle), so its own pivot
  // fixture is irreproducible by design — documented divergence.
  // ----------------------------------------------------------------------
  private val pivotMultimetric: (SparkSession, String) => DataFrame = (s, dir) => {
    // both metric distances in ONE cached projection (the orderShared
    // pattern): phase-1 top-M and phase-2 exact scoring would otherwise
    // re-read + re-cast the embedding parquet once per facet per phase
    val qc = array(queryVec(s, dir).map(lit): _*)
    val base = spread(t(s, dir, "embeddings"))
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .select(col("id"),
        graft.functions.NativeKernels.l2Dist(col("v"), qc).as("d0"),
        graft.functions.NativeKernels.l1Dist(col("v"), qc).as("d1"))
      .cache()
      .pipe(graft.util.CacheScope.register(_))
    val f0 = base.select(col("id"), col("d0").as("d"))
    val f1 = base.select(col("id"), col("d1").as("d"))
    RankAggregate.topK(s,
      Seq(BoundFacet("euclidean", f0, Seq(0.6)), BoundFacet("manhattan", f1, Seq(0.4))),
      10, 10000)
      .withColumnRenamed("id", "vec_id")
  }

  private val pivotMultimetricSql = {
    val qSub = "(SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q"
    val l2 = "sqrt(list_sum([(v[i] - qv[i]) * (v[i] - qv[i]) for i in range(1, 65)]))"
    val l1 = "list_sum([abs(v[i] - qv[i]) for i in range(1, 65)])"
    def facet(d: String) =
      s"SELECT vec_id AS id, $d AS d FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e, $qSub"
    rankAggSql(Seq((facet(l2), false), (facet(l1), false)),
      Seq(Seq(0.6, 0.4)), 10, 10000, "vec_id")
  }

  // ----------------------------------------------------------------------
  // multimodal: binary payload + partition-batched decode pipeline. Two row
  // sources through ONE decode pass: the sf-scaled documents as opaque
  // payloads (the stub branch: UTF-8 text matches no image magic), and the
  // committed fixture of REAL PNG/JPEG/GIF bytes whose encoded width/height
  // the engine must recover by parsing container headers
  // (Multimodal.parseDimensions) — the fixture stores what ImageIO actually
  // wrote, so the hash-match proves the parser, not a formula.
  // ----------------------------------------------------------------------
  private val MediaIdOffset = 5000000L

  private val multimodalFixture: String = {
    val rel = java.nio.file.Paths.get("fixtures", "multimodal_media.parquet")
    val fromCwd = rel.toAbsolutePath
    val p = if (java.nio.file.Files.exists(fromCwd)) fromCwd
      else sys.env.get("GRAFT_REPO_ROOT")
        .map(r => java.nio.file.Paths.get(r).resolve(rel).toAbsolutePath)
        .getOrElse(fromCwd)
    p.toString.replace("'", "''")
  }

  private val multimodalMeta: (SparkSession, String) => DataFrame = (s, dir) => {
    val docsMedia = spread(t(s, dir, "documents")).select(
      col("doc_id").as("id"),
      when(col("doc_id") % 2 === 1, lit("video")).otherwise(lit("image")).as("kind"),
      encode(col("text"), "UTF-8").as("data"))
    val fixtureMedia = s.read.parquet(multimodalFixture)
      .select((col("media_id") + MediaIdOffset).as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.decode(docsMedia.unionByName(fixtureMedia)).toDF()
      .select(col("id").as("media_id"), col("kind"), col("nBytes").as("n_bytes"),
        col("width"), col("height"), col("nFrames").as("n_frames"))
      .orderBy(col("media_id"))
  }

  private val multimodalMetaSql =
    s"""SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 1 THEN 'video' ELSE 'image' END AS kind,
      |  octet_length(encode(text))::BIGINT AS n_bytes,
      |  (16 + octet_length(encode(text)) % 64)::INTEGER AS width,
      |  (16 + octet_length(encode(text)) % 48)::INTEGER AS height,
      |  (CASE WHEN doc_id % 2 = 1 THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END)::INTEGER AS n_frames
      |FROM documents
      |UNION ALL
      |SELECT media_id + $MediaIdOffset AS media_id, kind,
      |  octet_length(data)::BIGINT AS n_bytes, width, height, n_frames
      |FROM '$multimodalFixture'
      |ORDER BY media_id""".stripMargin

  // -- audio/video container metadata: the AV sibling of q_multimodal_meta.
  //    One decodeAv pass over two row sources: the sf-scaled documents as
  //    opaque payloads (UTF-8 text matches no container magic -> the
  //    documented stub branch, expressed as formulas in the oracle), and
  //    the committed fixture of REAL MP4 box trees (v0/v1 mvhd+tkhd, both
  //    moov orders, audio trak first) and JDK-AudioSystem-written WAVs,
  //    whose stored columns are what the writer actually encoded — the
  //    hash-match proves the box/chunk walkers, not a formula. Corrupt
  //    fixture rows prove the degrade-to-stub contract.
  private val multimodalAvFixture: String = {
    val rel = java.nio.file.Paths.get("fixtures", "multimodal_av.parquet")
    val fromCwd = rel.toAbsolutePath
    val p = if (java.nio.file.Files.exists(fromCwd)) fromCwd
      else sys.env.get("GRAFT_REPO_ROOT")
        .map(r => java.nio.file.Paths.get(r).resolve(rel).toAbsolutePath)
        .getOrElse(fromCwd)
    p.toString.replace("'", "''")
  }

  private val multimodalAv: (SparkSession, String) => DataFrame = (s, dir) => {
    val docsMedia = spread(t(s, dir, "documents")).select(
      col("doc_id").as("id"),
      when(col("doc_id") % 2 === 1, lit("video")).otherwise(lit("audio")).as("kind"),
      encode(col("text"), "UTF-8").as("data"))
    val fixtureMedia = s.read.parquet(multimodalAvFixture)
      .select((col("media_id") + MediaIdOffset).as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.decodeAv(docsMedia.unionByName(fixtureMedia)).toDF()
      .select(col("id").as("media_id"), col("kind"), col("nBytes").as("n_bytes"),
        col("container"), col("width"), col("height"),
        col("durationMs").as("duration_ms"),
        col("sampleRate").as("sample_rate"), col("channels"))
      .orderBy(col("media_id"))
  }

  // -- time-based frame sampling over the SAME media frame as
  //    q_multimodal_av: the schedule comes from each payload's parsed (or
  //    stub) duration at a 150 ms cadence, the stub frame bytes are
  //    md5(id/idx) — DuckDB recomputes the duration arithmetic, the
  //    per-row frame count, and the digest hex, so the whole parse ->
  //    schedule -> emit path is hash-checked.
  private val frameSampleQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val docsMedia = spread(t(s, dir, "documents")).select(
      col("doc_id").as("id"),
      when(col("doc_id") % 2 === 1, lit("video")).otherwise(lit("audio")).as("kind"),
      encode(col("text"), "UTF-8").as("data"))
    val fixtureMedia = s.read.parquet(multimodalAvFixture)
      .select((col("media_id") + MediaIdOffset).as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal
      .sampleFramesByTime(docsMedia.unionByName(fixtureMedia), 150L)
      .select(col("id").as("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("ts_ms"), lower(hex(col("frame"))).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val frameSampleSql =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, 0::BIGINT AS dur  -- text: unparseable, 1 frame
       |  FROM documents
       |  UNION ALL
       |  SELECT media_id + $MediaIdOffset AS media_id,
       |    (CASE WHEN container = 'opaque' THEN 0 ELSE duration_ms END)::BIGINT AS dur
       |  FROM '$multimodalAvFixture'),
       |n AS (SELECT media_id, unnest(range(0, dur // 150 + 1)) AS i FROM m)
       |SELECT media_id, i::BIGINT AS frame_idx, (i * 150)::BIGINT AS ts_ms,
       |  md5(media_id::VARCHAR || '/' || i::VARCHAR) AS frame_md5
       |FROM n ORDER BY media_id, frame_idx""".stripMargin

  private val multimodalAvSql =
    s"""SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 1 THEN 'video' ELSE 'audio' END AS kind,
      |  octet_length(encode(text))::BIGINT AS n_bytes,
      |  'opaque' AS container,
      |  (16 + octet_length(encode(text)) % 64)::INTEGER AS width,
      |  (16 + octet_length(encode(text)) % 48)::INTEGER AS height,
      |  (octet_length(encode(text)) % 10000)::BIGINT AS duration_ms,
      |  0::INTEGER AS sample_rate, 0::INTEGER AS channels
      |FROM documents
      |UNION ALL
      |SELECT media_id + $MediaIdOffset AS media_id, kind,
      |  octet_length(data)::BIGINT AS n_bytes, container, width, height,
      |  duration_ms, sample_rate, channels
      |FROM '$multimodalAvFixture'
      |ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------------
  // perceptual image hashing + image near-dup: REAL pixel decode (the
  // JDK's own ImageIO readers — no external codec) -> integer box-averaged
  // luma -> aHash/dHash. The committed fixture stores hashes the GENERATOR
  // computed from the pixel arrays it drew BEFORE lossless encoding
  // (round-trip asserted at build time), so the hash-match proves
  // decode + grid average + bit extraction, not a formula replay; corrupt
  // and decompression-bomb rows prove the degrade-to-undecoded contract.
  // Near-dup pairs: the banded-Hamming join over dHash — exhaustive at
  // hamming <= 3 by pigeonhole — against DuckDB's all-pairs
  // bit_count(xor) twin over the stored signatures.
  // ----------------------------------------------------------------------
  private lazy val imagePhashFixture: String = fixturePath("image_phash.parquet")

  private val imagePhash: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(imagePhashFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.imageHash(media).toDF()
      .select(col("id").as("media_id"), col("kind"),
        col("nBytes").as("n_bytes"), col("decoded"),
        col("width"), col("height"), col("ahash"), col("dhash"))
      .orderBy(col("media_id"))
  }

  private val imagePhashSql =
    s"""SELECT media_id, kind, octet_length(data)::BIGINT AS n_bytes,
      |  decoded, width, height, ahash, dhash
      |FROM '$imagePhashFixture'
      |ORDER BY media_id""".stripMargin

  private val imageNearDup: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(imagePhashFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val hashed = graft.multimodal.Multimodal.imageHash(media).toDF()
      .where(col("decoded"))
      .select(col("id"), col("dhash"))
    graft.operators.Dedup.hammingPairs(hashed, "id", "dhash", maxHamming = 3)
      .orderBy(col("a"), col("b"))
  }

  private val imageNearDupSql =
    s"""WITH h AS (
      |  SELECT media_id, dhash FROM '$imagePhashFixture'
      |  WHERE decoded AND dhash IS NOT NULL AND dhash <> 0)
      |SELECT x.media_id AS a, y.media_id AS b,
      |  bit_count(xor(x.dhash, y.dhash))::BIGINT AS hamming
      |FROM h x JOIN h y ON x.media_id < y.media_id
      |WHERE bit_count(xor(x.dhash, y.dhash)) <= 3
      |ORDER BY a, b""".stripMargin

  // -- REAL image resize: decode -> channel-wise integer box-average onto
  //    the scale-to-fit grid -> PNG re-encode; already-fitting and
  //    undecodable payloads pass through byte-identical. Verified
  //    pixel-wise without assuming encoder bit-stability: the engine
  //    re-decodes ITS OWN resized output through imageHash, and the oracle
  //    compares against hashes the generator computed from the pixel
  //    arrays it downscaled INDEPENDENTLY — a hash match proves the
  //    resampling arithmetic, not the PNG byte stream.
  private val imageResize: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(imagePhashFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val rz = graft.multimodal.Multimodal.resizeImage(media, 32, 32).toDF()
    val rehash = graft.multimodal.Multimodal.imageHash(
        rz.select(col("id"), col("kind"), col("data"))).toDF()
      .select(col("id"), col("ahash"), col("dhash"))
    rz.select(col("id"), col("resized"), col("width"), col("height"))
      .join(rehash, Seq("id"))
      .select(col("id").as("media_id"), col("resized"),
        col("width"), col("height"), col("ahash"), col("dhash"))
      .orderBy(col("media_id"))
  }

  private val imageResizeSql =
    s"""SELECT media_id, r_resized AS resized, r_width AS width,
      |  r_height AS height, r_ahash AS ahash, r_dhash AS dhash
      |FROM '$imagePhashFixture'
      |ORDER BY media_id""".stripMargin

  // -- image quality stats: the gating signals (dark/blown-out/flat/
  //    grayscale/extreme-aspect) from the REAL decode, exact integers or
  //    deterministic integer-histogram entropy; expected values computed
  //    by the generator from the drawn pixels.
  private val imageStats: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(imagePhashFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.imageStats(media).toDF()
      .select(col("id").as("media_id"), col("decoded"),
        col("nPixels").as("n_pixels"), col("lumaSum").as("luma_sum"),
        col("lumaMin").as("luma_min"), col("lumaMax").as("luma_max"),
        col("isGray").as("is_gray"), col("entropyMilli").as("entropy_milli"))
      .orderBy(col("media_id"))
  }

  private val imageStatsSql =
    s"""SELECT media_id, decoded, s_n_pixels AS n_pixels,
      |  s_luma_sum AS luma_sum, s_luma_min AS luma_min,
      |  s_luma_max AS luma_max, s_is_gray AS is_gray,
      |  s_entropy_milli AS entropy_milli
      |FROM '$imagePhashFixture'
      |ORDER BY media_id""".stripMargin

  // -- incremental image near-dup: the base cards (media_id < 100) hash
  //    ONCE into a persisted banded-Hamming index; the later-arriving
  //    batch (the planted perturbed/re-encoded copies, media_id >= 100)
  //    checks against the stored signatures without the corpus being
  //    re-decoded — the production ingestion shape, same discipline as
  //    q_dedup_incr for MinHash. DuckDB mirrors the cross split over the
  //    stored fixture signatures.
  private val imageIncr: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(imagePhashFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    def hashed(pred: Column) = graft.multimodal.Multimodal.imageHash(media)
      .toDF().where(col("decoded") && pred).select(col("id"), col("dhash"))
    // per-process suffix: Verify and Bench can run concurrently as
    // separate JVMs, and an overwrite index build must not race a reader
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-hamidx-imgfx-${ProcessHandle.current().pid()}").getAbsolutePath
    buildIndexOnce(path)(
      graft.operators.Dedup.writeHammingIndex(
        hashed(col("id") < 100), "id", "dhash", path))
    graft.operators.Dedup.incrementalHammingPairs(
        hashed(col("id") >= 100), "id", "dhash", path, maxHamming = 3)
      .orderBy(col("a"), col("b"))
  }

  private val imageIncrSql =
    s"""WITH h AS (
      |  SELECT media_id, dhash FROM '$imagePhashFixture'
      |  WHERE decoded AND dhash IS NOT NULL AND dhash <> 0)
      |SELECT x.media_id AS a, y.media_id AS b,
      |  bit_count(xor(x.dhash, y.dhash))::BIGINT AS hamming
      |FROM h x JOIN h y ON x.media_id >= 100 AND y.media_id < 100
      |WHERE bit_count(xor(x.dhash, y.dhash)) <= 3
      |ORDER BY a, b""".stripMargin

  // -- windowed audio SEQUENCE signatures + containment near-dup: the
  //    audio twin of the video frame family — fixed 250 ms windows each
  //    carry their own energy-gradient signature, so a clip trimmed by
  //    whole windows (or re-encoded as IEEE-float) matches the original on
  //    an alignment diagonal, which one whole-clip fingerprint cannot see.
  //    Expected signatures computed by the generator from the raw samples
  //    it synthesized; the float clip proves lattice equivalence ACROSS
  //    sample formats under the hash gate.
  private lazy val audioSeqMediaFixture: String = fixturePath("audio_seq_media.parquet")
  private lazy val audioSeqWindowsFixture: String = fixturePath("audio_seq_windows.parquet")

  private val audioSeq: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(audioSeqMediaFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.audioSeqSignatures(media, windowMs = 250L)
      .toDF()
      .select(col("id").as("media_id"), col("window_idx"), col("decoded"),
        col("sig"))
      .orderBy(col("media_id"), col("window_idx"))
  }

  private val audioSeqSql =
    s"""SELECT media_id, window_idx, decoded, sig
      |FROM '$audioSeqWindowsFixture'
      |ORDER BY media_id, window_idx""".stripMargin

  private val audioSeqNearDup: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(audioSeqMediaFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val sigs = graft.multimodal.Multimodal.audioSeqSignatures(media, 250L)
      .toDF().where(col("decoded"))
      .select(col("id"), col("window_idx"), col("sig"))
    graft.operators.Dedup.frameSigPairs(sigs, "id", "window_idx", "sig",
        maxHamming = 3, minMatch = 2)
      .orderBy(col("a"), col("b"), col("d"))
  }

  private val audioSeqNearDupSql =
    s"""WITH f AS (
      |  SELECT media_id, window_idx, sig FROM '$audioSeqWindowsFixture'
      |  WHERE decoded AND sig IS NOT NULL AND sig <> 0),
      |m AS (
      |  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
      |    x.window_idx AS pa, y.window_idx AS pb
      |  FROM f x JOIN f y ON x.media_id < y.media_id
      |  WHERE bit_count(xor(x.sig, y.sig)) <= 3)
      |SELECT a, b, (pa - pb)::BIGINT AS d, count(*)::BIGINT AS n_match
      |FROM m GROUP BY a, b, pa - pb
      |HAVING count(*) >= 2
      |ORDER BY a, b, d""".stripMargin

  // -- ID3v2 text metadata: the grouping keys an audio curation pass
  //    caps and dedups by (per-artist caps are the audio twin of
  //    per-domain caps) — REAL v2.3/v2.4 tag parsing across the three
  //    published text encodings, unknown binary frames skipped by size,
  //    corrupt/untagged payloads degrading to null columns.
  private lazy val audioTagsFixture: String = fixturePath("audio_tags.parquet")

  private val audioTags: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(audioTagsFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.audioTags(media).toDF()
      .select(col("id").as("media_id"), col("hasTags").as("has_tags"),
        col("title"), col("artist"), col("album"))
      .orderBy(col("media_id"))
  }

  private val audioTagsSql =
    s"""SELECT media_id, has_tags, title, artist, album
      |FROM '$audioTagsFixture'
      |ORDER BY media_id""".stripMargin

  // -- incremental VIDEO near-dup: clips 1/4/7 index their sampled-frame
  //    dHashes ONCE under composite (clip, position) keys in the persisted
  //    Hamming index; the later-arriving batch (the re-encoded clip 2 and
  //    trimmed clip 3) probes the stored frames — the stored corpus is
  //    never re-decoded — and pairs group per alignment diagonal exactly
  //    like frameSigPairs. DuckDB mirrors the batch/index split over the
  //    stored per-frame signatures.
  private val videoIncr: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(videoFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    def hashed(pred: Column) = graft.multimodal.Multimodal
      .videoFrameHashes(media, everyMs = 500L).toDF()
      .where(col("decoded") && pred)
      .select(col("id"), col("frame_idx"), col("dhash"))
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-hamidx-vidfx-${ProcessHandle.current().pid()}").getAbsolutePath
    buildIndexOnce(path)(
      graft.operators.Dedup.writeFrameSigIndex(
        hashed(col("id") =!= 2L && col("id") =!= 3L),
        "id", "frame_idx", "dhash", path))
    graft.operators.Dedup.incrementalFrameSigPairs(
        hashed(col("id") === 2L || col("id") === 3L),
        "id", "frame_idx", "dhash", path, maxHamming = 3, minMatch = 2)
      .orderBy(col("a"), col("b"), col("d"))
  }

  private val videoIncrSql =
    s"""WITH f AS (
      |  SELECT media_id, frame_idx, dhash FROM '$videoFramesFixture'
      |  WHERE decoded AND dhash IS NOT NULL AND dhash <> 0),
      |m AS (
      |  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
      |    x.frame_idx AS pa, y.frame_idx AS pb
      |  FROM f x JOIN f y
      |    ON x.media_id IN (2, 3) AND y.media_id NOT IN (2, 3)
      |    AND x.media_id <> y.media_id
      |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 3)
      |SELECT a, b, (pa - pb)::BIGINT AS d, count(*)::BIGINT AS n_match
      |FROM m GROUP BY a, b, pa - pb
      |HAVING count(*) >= 2
      |ORDER BY a, b, d""".stripMargin

  // ----------------------------------------------------------------------
  // corpus profile: per-language counters + distincts, the bookkeeping
  // frame of Profile.profile. The oracle checks the EXACT columns
  // (counters and count-distincts are SQL); the mergeable HLL/Theta
  // sketch twins computed in the same pass are proven by ProfileSpec
  // (estimate vs exact, batch merge == one-shot, theta overlap algebra) —
  // DuckDB's approximate distincts use a different algorithm, so the
  // estimates can never be hash-gated.
  // ----------------------------------------------------------------------
  private val corpusProfile: (SparkSession, String) => DataFrame = (s, dir) => {
    graft.operators.Profile.profile(t(s, dir, "documents"), Seq(col("lang")),
        col("text"), graft.functions.NativeKernels.wordTokens(col("text")))
      .select(col("__k0").as("lang"), col("n_docs"), col("n_chars"),
        col("n_tokens"), col("n_distinct_docs"), col("n_vocab"))
      .orderBy(col("lang"))
  }

  private val corpusProfileSql =
    s"""WITH tk AS (SELECT lang, text, md5(text) AS fp,
      |    ${sqlWords("text")} AS w FROM documents),
      |v AS (SELECT lang, count(DISTINCT t.x) AS n_vocab
      |      FROM tk, unnest(w) AS t(x) GROUP BY lang)
      |SELECT tk.lang, count(*) AS n_docs,
      |  sum(length(text))::BIGINT AS n_chars,
      |  sum(len(w))::BIGINT AS n_tokens,
      |  count(DISTINCT fp) AS n_distinct_docs,
      |  any_value(v.n_vocab) AS n_vocab
      |FROM tk JOIN v USING (lang)
      |GROUP BY tk.lang ORDER BY tk.lang""".stripMargin

  // -- cross-corpus overlap via theta sketches: UNDER THE HASH GATE at the
  //    tested SFs because a DataSketches Theta sketch is EXACT until it
  //    exceeds its nominal k = 4096 retained entries (sf0.01 halves hold
  //    <1k distinct fingerprints) — so the sketch estimates, intersection
  //    and union land on exact integers DuckDB reproduces with plain set
  //    SQL. At corpus scale the same operator degrades gracefully to
  //    ~1-2% estimates; ProfileSpec covers that regime.
  private val corpusOverlap: (SparkSession, String) => DataFrame = (s, dir) => {
    // doc_id < 2000 bounds the UNION below theta's k = 4096 exactness
    // limit at EVERY test SF (sf0.1's full halves union to 4992 distinct
    // fingerprints, where the sketch honestly estimates and the hash gate
    // would flag its own accuracy contract); the operator's estimate
    // regime is ProfileSpec's job, the gate checks the exact regime
    val docs = t(s, dir, "documents").where(col("doc_id") < 2000)
    graft.operators.Profile.overlap(
        docs.where(col("doc_id") % 2 === 1), col("text"),
        docs.where(col("doc_id") % 2 === 0), col("text"))
      .select(col("est_a"), col("est_b"), col("est_intersection"),
        col("est_union"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  private val corpusOverlapSql =
    s"""WITH a AS (SELECT DISTINCT md5(text) AS f FROM documents WHERE doc_id % 2 = 1 AND doc_id < 2000),
      |b AS (SELECT DISTINCT md5(text) AS f FROM documents WHERE doc_id % 2 = 0 AND doc_id < 2000),
      |i AS (SELECT count(*)::BIGINT AS n FROM a JOIN b USING (f)),
      |u AS (SELECT count(*)::BIGINT AS n FROM (SELECT f FROM a UNION SELECT f FROM b))
      |SELECT (SELECT count(*) FROM a)::BIGINT AS est_a,
      |  (SELECT count(*) FROM b)::BIGINT AS est_b,
      |  (SELECT n FROM i) AS est_intersection,
      |  (SELECT n FROM u) AS est_union,
      |  round((SELECT n FROM i)::DOUBLE / (SELECT n FROM u), 6) AS est_jaccard""".stripMargin

  // -- profile TIME SERIES: per-batch + cumulative fold of partial
  //    profiles, computed from profile rows only. UNDER THE HASH GATE for
  //    the same reason as q_corpus_overlap: theta sketches are exact below
  //    k = 4096 retained entries (the largest cumulative group at sf0.1 is
  //    'en' with 2059 distinct docs), so every estimate lands on the exact
  //    integer DuckDB computes with windowed set SQL. The HLL vocab
  //    estimates stay out of the projection (approximate at these
  //    cardinalities); ProfileSpec covers them.
  private val profileSeriesQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = t(s, dir, "documents")
    val parts = (0 until 3).map { b =>
      graft.operators.Profile.partialProfile(
          docs.where(col("doc_id") % 3 === b),
          Seq(col("lang")), col("text"),
          graft.functions.NativeKernels.wordTokens(col("text")))
        .withColumn("batch_id", lit(b.toLong))
    }.reduce(_ unionByName _)
    graft.operators.Profile.profileSeries(parts, 1)
      .select(col("__k0").as("lang"), col("batch"), col("n_docs"),
        col("n_chars"), col("n_tokens"), col("est_distinct_docs"),
        col("cum_n_docs"), col("cum_n_chars"), col("cum_n_tokens"),
        col("cum_est_distinct_docs"), col("delta_est_docs"))
      .orderBy(col("lang"), col("batch"))
  }

  private val profileSeriesSql =
    s"""WITH tk AS (
      |  SELECT lang, doc_id % 3 AS batch, md5(text) AS fp,
      |    length(text)::BIGINT AS chars, len(${sqlWords("text")})::BIGINT AS ntoks
      |  FROM documents),
      |pb AS (
      |  SELECT lang, batch, count(*)::BIGINT AS n_docs,
      |    sum(chars)::BIGINT AS n_chars, sum(ntoks)::BIGINT AS n_tokens,
      |    count(DISTINCT fp)::BIGINT AS est_distinct_docs
      |  FROM tk GROUP BY 1, 2),
      |cum AS (
      |  SELECT p.lang, p.batch, count(DISTINCT t.fp)::BIGINT AS cdd
      |  FROM pb p JOIN tk t ON t.lang = p.lang AND t.batch <= p.batch
      |  GROUP BY 1, 2)
      |SELECT pb.lang, pb.batch, pb.n_docs, pb.n_chars, pb.n_tokens,
      |  pb.est_distinct_docs,
      |  (sum(pb.n_docs) OVER w)::BIGINT AS cum_n_docs,
      |  (sum(pb.n_chars) OVER w)::BIGINT AS cum_n_chars,
      |  (sum(pb.n_tokens) OVER w)::BIGINT AS cum_n_tokens,
      |  cum.cdd AS cum_est_distinct_docs,
      |  cum.cdd - coalesce(lag(cum.cdd) OVER
      |    (PARTITION BY pb.lang ORDER BY pb.batch), 0) AS delta_est_docs
      |FROM pb JOIN cum ON cum.lang = pb.lang AND cum.batch = pb.batch
      |WINDOW w AS (PARTITION BY pb.lang ORDER BY pb.batch
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY pb.lang, pb.batch""".stripMargin

  // -- image dedup GROUPS: perceptual-hash pairs -> transitive closure ->
  //    one row per image with its cluster keeper (min member id) — the
  //    visual twin of q_dedup_cluster, composing imageHash -> hammingPairs
  //    -> Dedup.clusters. DuckDB closes the same pair set (over stored
  //    signatures) with a recursive CTE.
  private val imageCluster: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(imagePhashFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val hashed = graft.multimodal.Multimodal.imageHash(media).toDF()
      .where(col("decoded")).select(col("id"), col("dhash"))
    graft.operators.Dedup.clusters(
        graft.operators.Dedup.hammingPairs(hashed, "id", "dhash", 3))
      .select(col("n").cast("long").as("media_id"),
        col("c").cast("long").as("cluster"))
      .orderBy(col("media_id"))
  }

  private val imageClusterSql =
    s"""WITH RECURSIVE h AS (
      |  SELECT media_id, dhash FROM '$imagePhashFixture'
      |  WHERE decoded AND dhash IS NOT NULL AND dhash <> 0),
      |prs AS (
      |  SELECT x.media_id AS a, y.media_id AS b
      |  FROM h x JOIN h y ON x.media_id < y.media_id
      |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 3),
      |edges AS (SELECT a AS x, b AS y FROM prs UNION SELECT b AS x, a AS y FROM prs),
      |r AS (SELECT x AS n, y AS m FROM edges
      |      UNION SELECT r.n, e.y FROM r JOIN edges e ON r.m = e.x)
      |SELECT n::BIGINT AS media_id, least(n, min(m))::BIGINT AS cluster
      |FROM r GROUP BY n ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------------
  // audio fingerprinting + audio near-dup: REAL PCM decode (the JDK's own
  // AudioSystem — WAV container, 8/16-bit, mono/stereo) -> 65-window
  // integer energy envelope -> 64 gradient bits, the audio sibling of
  // dHash, verified the same way: the committed fixture stores
  // fingerprints the GENERATOR computed from the raw samples it
  // synthesized BEFORE encoding (round-trip asserted at build time), and
  // near-dup pairs reuse the SAME banded-Hamming join image dHash and text
  // SimHash go through.
  // ----------------------------------------------------------------------
  private lazy val audioFpFixture: String = fixturePath("audio_fp.parquet")

  private val audioFp: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(audioFpFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.audioFingerprint(media).toDF()
      .select(col("id").as("media_id"), col("kind"),
        col("nBytes").as("n_bytes"), col("decoded"),
        col("sampleRate").as("sample_rate"), col("channels"),
        col("nFrames").as("n_frames"), col("afp"))
      .orderBy(col("media_id"))
  }

  private val audioFpSql =
    s"""SELECT media_id, kind, octet_length(data)::BIGINT AS n_bytes,
      |  decoded, sample_rate, channels, n_frames, afp
      |FROM '$audioFpFixture'
      |ORDER BY media_id""".stripMargin

  // -- audio quality stats: duration, peak, digital-silence and hard-clip
  //    frame counts from the REAL PCM decode — exact integers, expected
  //    values computed by the generator from the synthesized samples.
  private val audioStats: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(audioFpFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.audioStats(media).toDF()
      .select(col("id").as("media_id"), col("decoded"),
        col("durationMs").as("duration_ms"), col("peak"),
        col("absSum").as("abs_sum"), col("nSilence").as("n_silence"),
        col("nClipped").as("n_clipped"))
      .orderBy(col("media_id"))
  }

  private val audioStatsSql =
    s"""SELECT media_id, decoded, s_duration_ms AS duration_ms,
      |  s_peak AS peak, s_abs_sum AS abs_sum,
      |  s_n_silence AS n_silence, s_n_clipped AS n_clipped
      |FROM '$audioFpFixture'
      |ORDER BY media_id""".stripMargin

  private val audioNearDup: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(audioFpFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val printed = graft.multimodal.Multimodal.audioFingerprint(media).toDF()
      .where(col("decoded"))
      .select(col("id"), col("afp"))
    graft.operators.Dedup.hammingPairs(printed, "id", "afp", maxHamming = 3)
      .orderBy(col("a"), col("b"))
  }

  private val audioNearDupSql =
    s"""WITH h AS (
      |  SELECT media_id, afp FROM '$audioFpFixture'
      |  WHERE decoded AND afp IS NOT NULL AND afp <> 0)
      |SELECT x.media_id AS a, y.media_id AS b,
      |  bit_count(xor(x.afp, y.afp))::BIGINT AS hamming
      |FROM h x JOIN h y ON x.media_id < y.media_id
      |WHERE bit_count(xor(x.afp, y.afp)) <= 3
      |ORDER BY a, b""".stripMargin

  // ----------------------------------------------------------------------
  // REAL video decode: AVI/MJPEG containers hand-built by the generator
  // per the published RIFF layout, each movi chunk a JDK-encoded JPEG.
  // q_video_meta proves the container walk (avih/strh/movi) through
  // decodeAv; q_video_frames proves frame extraction + JPEG pixel decode +
  // the exact-integer hash grids against hashes the generator computed
  // from the pixels it decoded back out of its own JPEG payloads (JPEG is
  // lossy — drawn pixels are NOT the ground truth, decoded ones are);
  // q_video_neardup proves the sequence-signature join: a re-encoded copy
  // pairs on alignment diagonal 0, a trimmed copy on a shifted diagonal,
  // against DuckDB's all-pairs bit_count(xor) twin over the stored
  // per-frame signatures. Corrupt rows prove the degrade-to-undecoded
  // contract end to end.
  // ----------------------------------------------------------------------
  private lazy val videoFixture: String = fixturePath("video_mjpeg.parquet")
  private lazy val videoFramesFixture: String = fixturePath("video_frames.parquet")

  private val videoMeta: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(videoFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.decodeAv(media).toDF()
      .select(col("id").as("media_id"), col("container"),
        col("width"), col("height"), col("durationMs").as("duration_ms"))
      .orderBy(col("media_id"))
  }

  private val videoMetaSql =
    s"""SELECT media_id, container, width, height, duration_ms
      |FROM '$videoFixture'
      |ORDER BY media_id""".stripMargin

  private val videoFrames: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(videoFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.videoFrameHashes(media, everyMs = 500L).toDF()
      .select(col("id").as("media_id"), col("frame_idx"), col("ts_ms"),
        col("decoded"), col("ahash"), col("dhash"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val videoFramesSql =
    s"""SELECT media_id, frame_idx, ts_ms, decoded, ahash, dhash
      |FROM '$videoFramesFixture'
      |ORDER BY media_id, frame_idx""".stripMargin

  private val videoNearDup: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(videoFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val hashed = graft.multimodal.Multimodal
      .videoFrameHashes(media, everyMs = 500L).toDF()
      .where(col("decoded"))
      .select(col("id"), col("frame_idx"), col("dhash"))
    graft.operators.Dedup.frameSigPairs(hashed, "id", "frame_idx", "dhash",
        maxHamming = 3, minMatch = 2)
      .orderBy(col("a"), col("b"), col("d"))
  }

  private val videoNearDupSql =
    s"""WITH f AS (
      |  SELECT media_id, frame_idx, dhash FROM '$videoFramesFixture'
      |  WHERE decoded AND dhash IS NOT NULL AND dhash <> 0),
      |m AS (
      |  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
      |    x.frame_idx AS pa, y.frame_idx AS pb
      |  FROM f x JOIN f y ON x.media_id < y.media_id
      |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 3)
      |SELECT a, b, (pa - pb)::BIGINT AS d, count(*)::BIGINT AS n_match
      |FROM m GROUP BY a, b, pa - pb
      |HAVING count(*) >= 2
      |ORDER BY a, b, d""".stripMargin

  // -- video quality gates: black/flat sampled-frame counts and exact luma
  //    mass per clip — the curation signals (dead camera, test pattern)
  //    from the REAL frame decode; expected values computed by the
  //    generator from the pixels it decoded back out of its own JPEGs.
  private val videoStats: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(videoFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.videoStats(media, everyMs = 500L).toDF()
      .select(col("id").as("media_id"), col("decoded"),
        col("nSampled").as("n_sampled"), col("nDecoded").as("n_decoded"),
        col("nBlack").as("n_black"), col("nFlat").as("n_flat"),
        col("lumaSum").as("luma_sum"), col("nPixels").as("n_pixels"))
      .orderBy(col("media_id"))
  }

  private val videoStatsSql =
    s"""SELECT media_id, container = 'avi' AS decoded,
      |  s_n_sampled AS n_sampled, s_n_decoded AS n_decoded,
      |  s_n_black AS n_black, s_n_flat AS n_flat,
      |  s_luma_sum AS luma_sum, s_n_pixels AS n_pixels
      |FROM '$videoFixture'
      |ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------------
  // MP4 / ISO-BMFF sample tables: the same four proofs as the AVI family,
  // over containers hand-built by GenMp4Fixture with FULL
  // stts/stsz/stsc/stco/co64/stss tables and 'jpeg' (MJPEG-in-MP4)
  // samples — the most common real-world video container, now with
  // honest per-frame byte ranges and NON-UNIFORM decode timestamps
  // (fixture clip 7's frames span 100 ms to 1.4 s each; the schedule
  // must map ticks by cumulative stts time, which a constant-fps
  // estimate gets wrong). Layout coverage: moov before AND after mdat,
  // stco and co64, 1/2/N samples per chunk, stss present and absent.
  // q_mp4_meta proves mvhd/tkhd metadata on stbl-bearing files plus the
  // two-layer degrade (row 5's boxes parse but its stco offsets run off
  // the payload — metadata real, frame path refuses; row 6's moov is
  // truncated — both stub); q_mp4_frames proves byte-range + timestamp
  // reconstruction through JPEG pixel decode onto the exact-integer hash
  // grids; q_mp4_neardup proves the sequence join over MP4 the same way
  // the AVI twin does (re-encode in a DIFFERENT physical layout pairs on
  // diagonal 0, trim on diagonal 1); q_mp4_stats proves the quality-gate
  // fold over the sample-table schedule.
  // ----------------------------------------------------------------------
  private lazy val mp4Fixture: String = fixturePath("video_mp4.parquet")
  private lazy val mp4FramesFixture: String = fixturePath("video_mp4_frames.parquet")

  private val mp4Meta: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(mp4Fixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.decodeAv(media).toDF()
      .select(col("id").as("media_id"), col("container"),
        col("width"), col("height"), col("durationMs").as("duration_ms"))
      .orderBy(col("media_id"))
  }

  private val mp4MetaSql =
    s"""SELECT media_id, container, width, height, duration_ms
      |FROM '$mp4Fixture'
      |ORDER BY media_id""".stripMargin

  private val mp4Frames: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(mp4Fixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.videoFrameHashes(media, everyMs = 500L).toDF()
      .select(col("id").as("media_id"), col("frame_idx"), col("ts_ms"),
        col("decoded"), col("ahash"), col("dhash"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val mp4FramesSql =
    s"""SELECT media_id, frame_idx, ts_ms, decoded, ahash, dhash
      |FROM '$mp4FramesFixture'
      |ORDER BY media_id, frame_idx""".stripMargin

  private val mp4NearDup: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(mp4Fixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val hashed = graft.multimodal.Multimodal
      .videoFrameHashes(media, everyMs = 500L).toDF()
      .where(col("decoded"))
      .select(col("id"), col("frame_idx"), col("dhash"))
    graft.operators.Dedup.frameSigPairs(hashed, "id", "frame_idx", "dhash",
        maxHamming = 3, minMatch = 2)
      .orderBy(col("a"), col("b"), col("d"))
  }

  private val mp4NearDupSql =
    s"""WITH f AS (
      |  SELECT media_id, frame_idx, dhash FROM '$mp4FramesFixture'
      |  WHERE decoded AND dhash IS NOT NULL AND dhash <> 0),
      |m AS (
      |  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
      |    x.frame_idx AS pa, y.frame_idx AS pb
      |  FROM f x JOIN f y ON x.media_id < y.media_id
      |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 3)
      |SELECT a, b, (pa - pb)::BIGINT AS d, count(*)::BIGINT AS n_match
      |FROM m GROUP BY a, b, pa - pb
      |HAVING count(*) >= 2
      |ORDER BY a, b, d""".stripMargin

  private val mp4Stats: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(mp4Fixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.videoStats(media, everyMs = 500L).toDF()
      .select(col("id").as("media_id"), col("decoded"),
        col("nSampled").as("n_sampled"), col("nDecoded").as("n_decoded"),
        col("nBlack").as("n_black"), col("nFlat").as("n_flat"),
        col("lumaSum").as("luma_sum"), col("nPixels").as("n_pixels"))
      .orderBy(col("media_id"))
  }

  private val mp4StatsSql =
    s"""SELECT media_id, frames_ok AS decoded,
      |  s_n_sampled AS n_sampled, s_n_decoded AS n_decoded,
      |  s_n_black AS n_black, s_n_flat AS n_flat,
      |  s_luma_sum AS luma_sum, s_n_pixels AS n_pixels
      |FROM '$mp4Fixture'
      |ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------------
  // Animated WebP through the container-agnostic video path (honest
  // subset: full-canvas, no-blend, VP8L frames — each a standalone still
  // the pure-JVM Vp8lDecoder reads; sub-canvas patches, alpha-BLENDED and
  // lossy frames refuse to the one-marker-row undecoded branch, their
  // metadata still served by parseAvMeta). Frame payloads are REAL libwebp
  // encoder output over generator-known pixels; expected hashes come from
  // those known pixels through the standalone grid arithmetic, over an
  // independent re-statement of the cumulative-ANMF-duration schedule.
  // q_webp_anim_neardup proves the sequence join: a one-frame-trimmed
  // twin pairs on alignment diagonal 1, exactly like the AVI/MP4 cases.
  // ----------------------------------------------------------------------
  private lazy val webpAnimFixture: String = fixturePath("webp_anim.parquet")
  private lazy val webpAnimFramesFixture: String =
    fixturePath("webp_anim_frames.parquet")

  private val webpAnimFrames: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(webpAnimFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.videoFrameHashes(media, everyMs = 100L).toDF()
      .select(col("id").as("media_id"), col("frame_idx"), col("ts_ms"),
        col("decoded"), col("ahash"), col("dhash"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val webpAnimFramesSql =
    s"""SELECT media_id, frame_idx, ts_ms, decoded, ahash, dhash
      |FROM '$webpAnimFramesFixture'
      |ORDER BY media_id, frame_idx""".stripMargin

  private val webpAnimNearDup: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(webpAnimFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    val hashed = graft.multimodal.Multimodal
      .videoFrameHashes(media, everyMs = 100L).toDF()
      .where(col("decoded"))
      .select(col("id"), col("frame_idx"), col("dhash"))
    graft.operators.Dedup.frameSigPairs(hashed, "id", "frame_idx", "dhash",
        maxHamming = 3, minMatch = 2)
      .orderBy(col("a"), col("b"), col("d"))
  }

  private val webpAnimNearDupSql =
    s"""WITH f AS (
      |  SELECT media_id, frame_idx, dhash FROM '$webpAnimFramesFixture'
      |  WHERE decoded AND dhash IS NOT NULL AND dhash <> 0),
      |m AS (
      |  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
      |    x.frame_idx AS pa, y.frame_idx AS pb
      |  FROM f x JOIN f y ON x.media_id < y.media_id
      |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 3)
      |SELECT a, b, (pa - pb)::BIGINT AS d, count(*)::BIGINT AS n_match
      |FROM m GROUP BY a, b, pa - pb
      |HAVING count(*) >= 2
      |ORDER BY a, b, d""".stripMargin

  // ----------------------------------------------------------------------
  // Per-track MP4 codec identity: the stsd sample-entry fourcc plus, for
  // AVC tracks, the SPS's own profile/level and TRUE coded dimensions
  // (Exp-Golomb per the published syntax — fully algorithmic, the honest
  // curation surface for files whose pixel decode is refused; tkhd
  // geometry is display intent, the SPS is what a decoder allocates).
  // Fixture SPS payloads come from an independent test writer over chosen
  // parameters (profiles incl. the high-profile chroma block, a present
  // scaling matrix, both pic_order_cnt layouts, interlaced double-height,
  // 4:2:2 and monochrome crop units, a forced emulation-prevention byte);
  // expected dims from those parameters through the published formulas.
  // ----------------------------------------------------------------------
  private lazy val mp4CodecsFixture: String = fixturePath("mp4_codecs.parquet")

  private val mp4Codecs: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(mp4CodecsFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.mp4CodecStats(media).toDF()
      .select(col("id").as("media_id"), col("parsed"), col("track"),
        col("codec"), col("isVideo").as("is_video"), col("profile"),
        col("level"), col("spsWidth").as("sps_width"),
        col("spsHeight").as("sps_height"))
      .orderBy(col("media_id"), col("track"))
  }

  private val mp4CodecsSql =
    s"""SELECT media_id, parsed, track, codec, is_video, profile, level,
      |  sps_width, sps_height
      |FROM '$mp4CodecsFixture'
      |ORDER BY media_id, track""".stripMargin

  // ----------------------------------------------------------------------
  // MP3 frame-header sequence walk: exact frame counts, duration summed
  // from real per-frame sample counts (1152 / 576), bitrate range and the
  // VBR flag — the honest upgrade over the single-header CBR estimate
  // (the fixture's VBR row is constructed so the two disagree), with zero
  // sample decode. Trailing junk and mid-frame truncation stop the walk
  // and report the frames seen; garbage refuses.
  // ----------------------------------------------------------------------
  private lazy val mp3Fixture: String = fixturePath("audio_mp3.parquet")

  private val mp3Frames: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(mp3Fixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.mp3FrameStats(media).toDF()
      .select(col("id").as("media_id"), col("parsed"),
        col("sampleRate").as("sample_rate"), col("channels"),
        col("nFrames").as("n_frames"), col("durationMs").as("duration_ms"),
        col("minKbps").as("min_kbps"), col("maxKbps").as("max_kbps"),
        col("vbr"))
      .orderBy(col("media_id"))
  }

  private val mp3FramesSql =
    s"""SELECT media_id, parsed, sample_rate, channels, n_frames,
      |  duration_ms, min_kbps, max_kbps, vbr
      |FROM '$mp3Fixture'
      |ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------------
  // WebM/Matroska Cluster/SimpleBlock walk: honest per-frame metadata for
  // VP8/VP9 payloads whose PIXELS have no pure-JVM codec — exact video
  // block counts, keyframe density (the seek-ability gate), duration
  // from the last block's cluster-base + signed relative timestamp
  // through TimestampScale, and total video payload bytes (with
  // duration: real bitrate). Interleaved audio-track blocks are excluded
  // via TrackNumber; metadata-only files refuse rather than guess.
  // ----------------------------------------------------------------------
  private lazy val webmFixture: String = fixturePath("webm_blocks.parquet")

  private val webmBlocks: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(webmFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.webmBlockStats(media).toDF()
      .select(col("id").as("media_id"), col("parsed"),
        col("videoTrack").as("video_track"), col("nBlocks").as("n_blocks"),
        col("nKeyframes").as("n_keyframes"),
        col("durationMs").as("duration_ms"),
        col("totalBlockBytes").as("total_block_bytes"))
      .orderBy(col("media_id"))
  }

  private val webmBlocksSql =
    s"""SELECT media_id, parsed, video_track, n_blocks, n_keyframes,
      |  duration_ms, total_block_bytes
      |FROM '$webmFixture'
      |ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------------
  // OGG page walk (RFC 3533): honest duration + packet accounting for
  // Vorbis/Opus payloads with zero sample decode — granule positions are
  // the authoritative clock (tags can lie; granules cannot without
  // breaking playback), CRC-verified page by page with stop-at-last-good
  // truncation semantics, muxed secondary bitstreams filtered by serial.
  // ----------------------------------------------------------------------
  private lazy val oggFixture: String = fixturePath("ogg_pages.parquet")

  private val oggPages: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(oggFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.oggPageStats(media).toDF()
      .select(col("id").as("media_id"), col("parsed"), col("codec"),
        col("sampleRate").as("sample_rate"), col("channels"),
        col("nPages").as("n_pages"), col("nPackets").as("n_packets"),
        col("durationMs").as("duration_ms"),
        col("totalPayloadBytes").as("total_payload_bytes"))
      .orderBy(col("media_id"))
  }

  private val oggPagesSql =
    s"""SELECT media_id, parsed, codec, sample_rate, channels, n_pages,
      |  n_packets, duration_ms, total_payload_bytes
      |FROM '$oggFixture'
      |ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------------
  // MPEG-TS packet walk (ISO/IEC 13818-1): broadcast-capture accounting —
  // packet counts on the fixed 188-byte sync lattice, distinct PIDs,
  // payload-unit starts, null-stuffing waste, and an honest duration
  // from the first/last 90 kHz PCR (the mux's own clock). A garbage tail
  // stops the count at the lattice break.
  // ----------------------------------------------------------------------
  private lazy val tsFixture: String = fixturePath("ts_packets.parquet")

  private val tsPackets: (SparkSession, String) => DataFrame = (s, _) => {
    val media = s.read.parquet(tsFixture)
      .select(col("media_id").as("id"), col("kind"), col("data"))
    graft.multimodal.Multimodal.tsPacketStats(media).toDF()
      .select(col("id").as("media_id"), col("parsed"),
        col("nPackets").as("n_packets"), col("nPids").as("n_pids"),
        col("nPes").as("n_pes"), col("nNull").as("n_null"),
        col("durationMs").as("duration_ms"))
      .orderBy(col("media_id"))
  }

  private val tsPacketsSql =
    s"""SELECT media_id, parsed, n_packets, n_pids, n_pes, n_null,
      |  duration_ms
      |FROM '$tsFixture'
      |ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------------------
  // q_pipeline_mm — the MULTIMODAL flagship: the text charter has
  // q_pipeline proving operator COMPOSITION end-to-end; this is its
  // multimodal twin, one oracle-gated query chaining every modality's
  // curation stages the way a real media-corpus pass runs them:
  //   audio      decode -> near-dup keep-lowest-id (a FLAC re-encode of a
  //              WAV pairs at Hamming 0 and is dropped) -> digital-silence
  //              gate (>= 10% all-zero frames drops the clip);
  //   audio_tag  ID3 parse -> PER-ARTIST CAP 1 through the real salted
  //              capPerKey operator (hash order — the twin replays
  //              md5-order in SQL; the fixture plants two clips by one
  //              artist so the cap demonstrably bites);
  //   image      decode+hash -> dHash near-dup keep-lowest -> minimum-
  //              resolution gate (width*height >= 1024);
  //   video      AVI and MP4 fixtures UNIONED (ids offset) through ONE
  //              container-agnostic pass -> frame-sequence near-dup
  //              (re-encodes and trims drop) -> quality gate (mostly
  //              black/flat sampled frames drop the clip).
  // The DuckDB twin replays the full chain from the fixtures' STORED
  // expected columns, so a hash match proves the composition logic AND
  // every per-operator decode it rides on.
  // ----------------------------------------------------------------------
  private val pipelineMm: (SparkSession, String) => DataFrame = (s, _) => {
    val M = graft.multimodal.Multimodal
    // The four modality chains are INDEPENDENT until the final union, and
    // each serializes on its own eager decode materializations — so they
    // are built on concurrent driver threads (CacheScope.parallel, the
    // guide's overlap-independent-jobs pattern): the audio, image and
    // video decode jobs back-fill each other's idle executors instead of
    // running one after another. Results are unchanged (same plans, same
    // union); only the construction-time jobs overlap. Drop-sets feed
    // left_anti joins, which ignore duplicate build rows, so no distinct
    // pass is spent on them (optimization r16: 3 exchanges + aggregates
    // removed vs the r15 shape).
    val chains = graft.util.CacheScope.parallel(Seq(
      () => {
        // audio: ONE decode pass (audioSignals = fingerprint + stats,
        // bit-identical) feeds both the near-dup join and the silence
        // gate. Lazily cached: the hammingPairs carrier-histogram probe
        // right below is the first consumer and materializes the cache
        // in its own (mandatory) job — the former dedicated eager count
        // was a second full pass bookkeeping job (r17, VERDICT item 3).
        val am = s.read.parquet(audioFpFixture)
          .select(col("media_id").as("id"), col("kind"), col("data"))
        val asig = graft.util.CacheScope.register(
          M.audioSignals(am).toDF().where(col("decoded")).cache())
        val aDrop = graft.operators.Dedup.hammingPairs(
            asig.select(col("id"), col("afp")), "id", "afp", maxHamming = 3)
          .select(col("b").as("id"))
        asig
          .join(aDrop, Seq("id"), "left_anti")
          .where(col("nSilence") * 10 < col("nFrames"))
          .select(lit("audio").as("modality"), col("id").as("media_id"))
      },
      () => {
        // audio tags: per-artist cap 1 (the salted-rank operator), untagged
        // rows pass through (a cap cannot apply without a key)
        val tm = s.read.parquet(audioTagsFixture)
          .select(col("media_id").as("id"), col("kind"), col("data"))
        val tags = M.audioTags(tm).toDF()
        graft.operators.Sampling.capPerKey(
            tags.where(col("artist").isNotNull), col("artist"), col("id"), 1L)
          .select(col("id"))
          .unionByName(tags.where(col("artist").isNull).select(col("id")))
          .select(lit("audio_tag").as("modality"), col("id").as("media_id"))
      },
      () => {
        // image: hash -> near-dup keep-lowest -> resolution gate
        val im = s.read.parquet(imagePhashFixture)
          .select(col("media_id").as("id"), col("kind"), col("data"))
        val ih = M.imageHash(im).toDF().where(col("decoded"))
        val iDrop = graft.operators.Dedup.hammingPairs(
            ih.select(col("id"), col("dhash")), "id", "dhash", maxHamming = 3)
          .select(col("b").as("id"))
        ih.join(iDrop, Seq("id"), "left_anti")
          .where(col("width") * col("height") >= 1024)
          .select(lit("image").as("modality"), col("id").as("media_id"))
      },
      () => {
        // video: AVI + MP4 through one container-agnostic pass
        val vm = s.read.parquet(videoFixture)
          .select(col("media_id").as("id"), col("kind"), col("data"))
          .unionByName(s.read.parquet(mp4Fixture)
            .select((col("media_id") + 100).as("id"), col("kind"), col("data")))
        // ONE decode pass serves both the near-dup hashes and the quality
        // gate (videoFrameSignals = videoFrameHashes + videoStats signals,
        // bit-identical). Lazily cached: frameSigPairs' histogram probe
        // below is the first consumer and materializes the cache in its
        // own job (see the audio chain's note).
        val vsig = graft.util.CacheScope.register(
          M.videoFrameSignals(vm, everyMs = 500L).toDF().cache())
        val vh = vsig.where(col("decoded"))
          .select(col("id"), col("frame_idx"), col("dhash"))
        val vDrop = graft.operators.Dedup.frameSigPairs(vh, "id", "frame_idx",
            "dhash", maxHamming = 3, minMatch = 2)
          .select(col("b").as("id"))
        vsig.groupBy(col("id"))
          .agg(max(col("parsed")).as("parsed"),
            sum(when(col("black"), 1).otherwise(0)).as("nBlack"),
            sum(when(col("flat"), 1).otherwise(0)).as("nFlat"),
            sum(when(col("parsed"), 1).otherwise(0)).as("nSampled"))
          .where(col("parsed"))
          .join(vDrop, Seq("id"), "left_anti")
          .where(lit(2) * (col("nBlack") + col("nFlat")) <= col("nSampled"))
          .select(lit("video").as("modality"), col("id").as("media_id"))
      }))
    chains.reduce(_ unionByName _)
      .orderBy(col("modality"), col("media_id"))
  }

  private val pipelineMmSql =
    s"""WITH a_h AS (
      |  SELECT media_id, afp, n_frames, s_n_silence
      |  FROM '$audioFpFixture' WHERE decoded),
      |a_drop AS (
      |  SELECT DISTINCT y.media_id
      |  FROM a_h x JOIN a_h y ON x.media_id < y.media_id
      |  WHERE x.afp <> 0 AND y.afp <> 0
      |    AND bit_count(xor(x.afp, y.afp)) <= 3),
      |a_keep AS (
      |  SELECT media_id FROM a_h
      |  WHERE media_id NOT IN (SELECT media_id FROM a_drop)
      |    AND s_n_silence * 10 < n_frames),
      |t AS (SELECT media_id, artist FROM '$audioTagsFixture'),
      |t_keep AS (
      |  SELECT media_id FROM (
      |    SELECT media_id, row_number() OVER (PARTITION BY artist
      |      ORDER BY md5(CAST(media_id AS VARCHAR)), media_id) AS rn
      |    FROM t WHERE artist IS NOT NULL) WHERE rn <= 1
      |  UNION ALL SELECT media_id FROM t WHERE artist IS NULL),
      |i_h AS (
      |  SELECT media_id, dhash, width, height
      |  FROM '$imagePhashFixture' WHERE decoded),
      |i_drop AS (
      |  SELECT DISTINCT y.media_id
      |  FROM i_h x JOIN i_h y ON x.media_id < y.media_id
      |  WHERE x.dhash <> 0 AND y.dhash <> 0
      |    AND bit_count(xor(x.dhash, y.dhash)) <= 3),
      |i_keep AS (
      |  SELECT media_id FROM i_h
      |  WHERE media_id NOT IN (SELECT media_id FROM i_drop)
      |    AND width * height >= 1024),
      |v_f AS (
      |  SELECT media_id, frame_idx, dhash FROM '$videoFramesFixture'
      |  WHERE decoded AND dhash <> 0
      |  UNION ALL
      |  SELECT media_id + 100, frame_idx, dhash FROM '$mp4FramesFixture'
      |  WHERE decoded AND dhash <> 0),
      |v_m AS (
      |  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
      |    x.frame_idx AS pa, y.frame_idx AS pb
      |  FROM v_f x JOIN v_f y ON x.media_id < y.media_id
      |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 3),
      |v_drop AS (
      |  SELECT DISTINCT b AS media_id FROM (
      |    SELECT a, b, pa - pb AS d, count(*) AS c
      |    FROM v_m GROUP BY a, b, pa - pb HAVING count(*) >= 2)),
      |v_s AS (
      |  SELECT media_id, s_n_sampled, s_n_black, s_n_flat
      |  FROM '$videoFixture' WHERE container = 'avi'
      |  UNION ALL
      |  SELECT media_id + 100, s_n_sampled, s_n_black, s_n_flat
      |  FROM '$mp4Fixture' WHERE frames_ok),
      |v_keep AS (
      |  SELECT media_id FROM v_s
      |  WHERE media_id NOT IN (SELECT media_id FROM v_drop)
      |    AND 2 * (s_n_black + s_n_flat) <= s_n_sampled)
      |SELECT modality, media_id FROM (
      |  SELECT 'audio' AS modality, media_id FROM a_keep
      |  UNION ALL SELECT 'audio_tag', media_id FROM t_keep
      |  UNION ALL SELECT 'image', media_id FROM i_keep
      |  UNION ALL SELECT 'video', media_id FROM v_keep)
      |ORDER BY modality, media_id""".stripMargin

  // ----------------------------------------------------------------------
  // WARC ingestion + HTML extraction: the crawl-capture front door of the
  // training-data pipeline. The committed fixture holds three WARC files
  // (plain, per-record-gzip, corrupt-tail) the GENERATOR wrote from known
  // fields, and a parquet twin of those writer-side fields — so the
  // hash-match proves the record framing, the gzip member walk, the HTTP
  // split, the degrade-past-corruption contract, and the tag/entity
  // stripper recovering the prose the generator embedded.
  // ----------------------------------------------------------------------
  private def fixturePath(name: String): String = {
    val rel = java.nio.file.Paths.get("fixtures", name)
    val fromCwd = rel.toAbsolutePath
    val p = if (java.nio.file.Files.exists(fromCwd)) fromCwd
      else sys.env.get("GRAFT_REPO_ROOT")
        .map(r => java.nio.file.Paths.get(r).resolve(rel).toAbsolutePath)
        .getOrElse(fromCwd)
    p.toString.replace("'", "''")
  }

  private val warcRead: (SparkSession, String) => DataFrame = (s, _) => {
    graft.sources.Warc.read(s, fixturePath("warc"))
      .select(col("url"), col("warcType").as("warc_type"),
        col("httpStatus").as("http_status"),
        col("httpContentType").as("http_content_type"),
        length(col("body")).cast("long").as("n_body_bytes"), col("date"))
      .orderBy(col("url"), col("warc_type"))
  }

  private val warcReadSql =
    s"""SELECT url, warc_type, http_status, http_content_type, n_body_bytes, date
      |FROM '${fixturePath("warc_expected.parquet")}'
      |ORDER BY url, warc_type""".stripMargin

  private val htmlText: (SparkSession, String) => DataFrame = (s, _) => {
    graft.sources.Warc.pages(s, fixturePath("warc"))
      .select(col("url"), col("text"))
      .orderBy(col("url"))
  }

  private val htmlTextSql =
    s"""SELECT url, page_text AS text
      |FROM '${fixturePath("warc_expected.parquet")}'
      |WHERE page_text IS NOT NULL
      |ORDER BY url""".stripMargin

  // -- URL-level dedup: canonicalize crawl URLs (case, default ports,
  //    fragments, trailing slash, tracking params, parameter order) and
  //    collapse re-crawls by normalized URL — the pre-content dedup pass.
  //    URLs are SYNTHESIZED from doc_id by identical arithmetic in both
  //    engines; the DuckDB twin re-implements the normalization with ITS
  //    OWN regex/list functions, so the match proves the canonicalization
  //    semantics, not a shared formula.
  private val urlDedup: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = t(s, dir, "documents")
    val url = concat(
      when(col("doc_id") % 3 === 0, lit("HTTP://CrAwl.Example.COM:80"))
        .when(col("doc_id") % 3 === 1, lit("https://Sub.Example.org:443"))
        .otherwise(lit("https://cdn.example.net:8443")),
      lit("/docs/"), (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 2 === 0, lit("?utm_source=feed&b=2&a=1&fbclid=XYZ"))
        .otherwise(lit("?z=9&utm_medium=email")),
      when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
    docs.select(col("doc_id"),
        graft.functions.TextKernels.normalizeUrl(url).as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("url_norm"))
  }

  private val urlDedupSql =
    """WITH u AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://CrAwl.Example.COM:80'
      |          WHEN doc_id % 3 = 1 THEN 'https://Sub.Example.org:443'
      |          ELSE 'https://cdn.example.net:8443' END)
      |    || '/docs/' || CAST(doc_id % 50 AS VARCHAR)
      |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1&fbclid=XYZ'
      |             ELSE '?z=9&utm_medium=email' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM u),
      |comp AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(
      |      lower(regexp_extract(nf, '^([^:/?#]+://[^/?#]*)', 1)),
      |      '^(http://[^/?#]*):80$', '\1'),
      |      '^(https://[^/?#]*):443$', '\1') AS pre,
      |    regexp_replace(nf, '^[^:/?#]+://[^/?#]*', '') AS rest
      |  FROM parts),
      |norm AS (
      |  SELECT doc_id, pre ||
      |    (CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = '/'
      |          THEN '/'
      |          ELSE regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/$', '') END) ||
      |    (CASE WHEN len(q) > 0 THEN '?' || array_to_string(q, '&') ELSE '' END)
      |    AS url_norm
      |  FROM (
      |    SELECT doc_id, pre, rest,
      |      list_sort(list_filter(string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
      |        x -> x <> '' AND NOT regexp_matches(x,
      |          '^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_eid|ref|ref_src)='))) AS q
      |    FROM comp))
      |SELECT url_norm, count(*)::BIGINT AS n_docs, min(doc_id) AS keeper
      |FROM norm GROUP BY url_norm ORDER BY url_norm""".stripMargin

  // -- per-domain cap: the anti-domination pass — at most `cap` docs per
  //    host, chosen in the deterministic (md5(id), id) hash order the
  //    sampling operators share. Spark ranks through the salted two-level
  //    decomposition (Sampling.capPerKey — no whole-domain single-task
  //    sort); the DuckDB twin uses a plain per-domain row_number, proving
  //    the decomposition picks the identical set.
  private val DomainCapN = 60L

  private val domainCap: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = t(s, dir, "documents")
    val url = concat(
      when(col("doc_id") % 3 === 0, lit("HTTP://CrAwl.Example.COM:80"))
        .when(col("doc_id") % 3 === 1, lit("https://www.Sub.Example.org:443"))
        .otherwise(lit("https://cdn.example.net:8443")),
      lit("/docs/"), col("doc_id").cast("string"))
    val withDomain = docs.select(col("doc_id"),
      graft.functions.TextKernels.urlHost(url).as("domain"))
    graft.operators.Sampling.capPerKey(withDomain, col("domain"),
        col("doc_id"), DomainCapN)
      .select(col("doc_id"), col("domain"))
      .orderBy(col("doc_id"))
  }

  private val domainCapSql =
    s"""WITH u AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'crawl.example.com'
      |         WHEN doc_id % 3 = 1 THEN 'sub.example.org'
      |         ELSE 'cdn.example.net' END AS domain
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, domain, row_number() OVER (
      |    PARTITION BY domain ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM u)
      |SELECT doc_id, domain FROM r WHERE rn <= $DomainCapN
      |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------------------
  // events: batch twins of the streaming operators — tumbling-window
  // aggregation and gap-based sessionization (exact integer arithmetic on
  // epoch microseconds, so both engines hash-match bit-for-bit)
  // ----------------------------------------------------------------------
  private val WindowUs = 600L * 1000000L // 10 minutes

  private val windowAgg: (SparkSession, String) => DataFrame = (s, dir) => {
    eventsTsUs(s, dir)
      .selectExpr(s"ts_us DIV $WindowUs * $WindowUs AS window_start_us",
        "event_type", "value")
      .groupBy(col("window_start_us"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 6).as("sum_value"))
      .orderBy(col("window_start_us"), col("event_type"))
  }

  private val windowAggSql =
    s"""SELECT epoch_us(ts) // $WindowUs * $WindowUs AS window_start_us, event_type,
       |  count(*) AS cnt, round(sum("value"), 6) AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds 30 minutes; output per-user session counts and
    * bounds. Window functions (lag + running sum) — identical ANSI
    * semantics in Spark and DuckDB. */
  private val sessionize: (SparkSession, String) => DataFrame = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val e = eventsTsUs(s, dir)
      .selectExpr("event_id", "user_id", "ts_us")
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L)
          .when(lag(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    e.groupBy(col("user_id"))
      .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"),
        min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
      .orderBy(col("user_id"))
  }

  /** Latest-per-key compaction (CDC / keep-newest-version): one row per
    * user — the event with the maximum (ts, event_id). Implemented as a
    * two-phase max(struct) aggregate (map-side combine; the shuffle carries
    * one row per key per partition), NOT a row_number window (which would
    * shuffle every event). event_id uniqueness makes the struct ordering —
    * and therefore the surviving row — deterministic. */
  private val compactQ: (SparkSession, String) => DataFrame = (s, dir) => {
    eventsTsUs(s, dir)
      .selectExpr("user_id", "named_struct('ts_us', ts_us, 'event_id', event_id, 'value', value) AS rec")
      .groupBy(col("user_id"))
      .agg(max(col("rec")).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"),
        col("m.ts_us").as("ts_us"), col("m.value").as("value"))
      .orderBy(col("user_id"))
  }

  // the window orders on epoch_us(ts), NOT raw ts: the parquet column is
  // TIMESTAMP(NANOS), and a nano-resolution ORDER BY could break ties
  // differently from the Spark side's microsecond-truncated ts DIV 1000
  private val compactSql =
    """SELECT user_id, event_id, ts_us, value FROM (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  // -- int8 embedding quantization: per-dim [min,max] calibration (64-group
  //    aggregate, broadcast back), exact integer codes. See operators/Quantize.
  private val quantizeQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    graft.operators.Quantize.int8(e, col("vec_id"), col("v"))
      .select(col("id").as("vec_id"), col("dim"), col("code"))
      .orderBy(col("vec_id"), col("dim"))
  }

  private val quantizeSql =
    """WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |                   unnest(embedding::DOUBLE[]) AS x FROM embeddings),
      |st AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM ex GROUP BY dim)
      |SELECT vec_id, dim::BIGINT AS dim,
      |  (CASE WHEN hi = lo THEN 0
      |        ELSE least(floor((x - lo) / (hi - lo) * 256), 255) END)::BIGINT AS code
      |FROM ex JOIN st USING (dim) ORDER BY vec_id, dim""".stripMargin

  private val sessionizeSql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL THEN 1
      |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000 THEN 1
      |         ELSE 0 END AS new_sess
      |  FROM events),
      |s AS (SELECT user_id, ts_us,
      |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS sess_id FROM e)
      |SELECT user_id, max(sess_id)::BIGINT AS n_sessions, count(*) AS n_events,
      |  min(ts_us) AS first_us, max(ts_us) AS last_us
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------------------
  // F4 haversine-degrees spatial knn (pivot-path metric): transcendental
  // ops differ by ulps across engines, so the distance is rounded to 6
  // decimals and used as the ordering key on both sides
  // ----------------------------------------------------------------------
  private val haversineKnn: (SparkSession, String) => DataFrame = (s, dir) => {
    val lon = pmod(col("c_acctbal"), lit(360.0)) - lit(180.0)
    val lat = (col("c_custkey") * lit(13L) % lit(180L)).cast("double") - lit(90.0)
    t(s, dir, "customer")
      .select(col("c_custkey"),
        round(SimKernels.haversineDeg(lon, lat, lit(10.0), lit(20.0)), 6).as("dist"))
      .orderBy(col("dist"), col("c_custkey"))
      .limit(10)
  }

  private val haversineKnnSql =
    """WITH g AS (SELECT c_custkey,
      |  fmod(c_acctbal, 360.0::DOUBLE) - 180.0 AS lon,
      |  ((c_custkey * 13) % 180)::DOUBLE - 90.0 AS lat FROM customer),
      |h AS (SELECT c_custkey,
      |  radians(20.0 - lat) / 2 AS dlat, radians(10.0 - lon) / 2 AS dlon,
      |  radians(lat) AS rlat FROM g),
      |a AS (SELECT c_custkey,
      |  sin(dlat) * sin(dlat) + cos(rlat) * cos(radians(20.0::DOUBLE)) * sin(dlon) * sin(dlon) AS a FROM h)
      |SELECT c_custkey, round(degrees(2.0 * asin(least(sqrt(a), 1.0::DOUBLE))), 6) AS dist
      |FROM a ORDER BY dist, c_custkey LIMIT 10""".stripMargin

  // ----------------------------------------------------------------------
  // F5 Chebyshev (L-inf) top-k over embeddings — max of exact abs diffs,
  // order-independent, so values match bit-for-bit without rounding
  // ----------------------------------------------------------------------
  private val chebyshevTopk: (SparkSession, String) => DataFrame = (s, dir) => {
    val e = spread(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qc = array(queryVec(s, dir).map(lit): _*)
    e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), SimKernels.chebyshevDist(col("v"), qc).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)
  }

  private val chebyshevTopkSql =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0)
      |SELECT vec_id, list_aggregate([abs(v[i] - qv[i]) for i in range(1, 65)], 'max') AS dist
      |FROM e, q ORDER BY dist, vec_id LIMIT 10""".stripMargin

  // ----------------------------------------------------------------------
  // F11 word2vec transform with a deterministic synthetic dictionary:
  // vector(term) = the 16 md5 hex nibbles of the term (exact small ints),
  // so the per-dimension mean sums integers exactly in any order; the
  // output is rounded to 6 decimals to absorb the divide-then-sum vs
  // sum-then-divide ulp difference between engine and oracle.
  // ----------------------------------------------------------------------
  private val word2vecQ: (SparkSession, String) => DataFrame = (s, dir) => {
    // tokenize once: the token frame feeds the dictionary distinct, the
    // component stream, AND transform's final ntok join — three corpus
    // tokenize passes without the eager cache
    val docs = graft.util.CacheScope.eager(spread(t(s, dir, "documents"))
      .select(col("doc_id").as("id"), graft.functions.NativeKernels.wordTokens(col("text")).as("tokens")))
    val dict = docs.select(explode(col("tokens")).as("term")).distinct()
      .select(col("term"), org.apache.spark.sql.functions.transform(
        sequence(lit(1), lit(16)),
        j => (conv(substring(md5(col("term")), j, lit(1)), 16, 10)).cast("double")).as("vector"))
    val out = graft.operators.Word2Vec.transform(docs, dict, 16)
    out.select(col("id").as("doc_id") +:
        (0 until 16).map(j => round(element_at(col("vector"), j + 1), 6).as(s"v$j")): _*)
      .orderBy(col("doc_id"))
  }

  private val word2vecSql = {
    val dims = (0 until 16).map { j =>
      s"round(list_sum(list_transform(w, t -> (instr('0123456789abcdef', substr(md5(t), ${j + 1}, 1)) - 1)::DOUBLE)) / len(w), 6) AS v$j"
    }.mkString(",\n  ")
    s"""WITH tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents)
       |SELECT doc_id,
       |  $dims
       |FROM tk ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------------------
  // text quality scoring: repetition ratio (most frequent token share),
  // char-bigram entropy, punctuation ratio — the classic training-data
  // quality filters, all as pure expressions
  // ----------------------------------------------------------------------
  private val qualityQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val w = graft.functions.NativeKernels.wordTokens(col("text"))
    // both signals were quadratic composed HOFs (re-filter the full list
    // once per distinct element — 39 s of the sf0.1 bench in this one
    // query); the native one-pass hash counts produce the identical
    // integers, and the entropy fold below stays in Spark SQL over the
    // counts (first-appearance order, the engine's own `/` and `log2`),
    // so both columns are bit-equal to the composed forms and the oracle.
    // Empty token arrays keep the composed form's NULL rep_ratio
    // (array_max over an empty array).
    val rep = when(size(w) > lit(0),
      graft.functions.NativeKernels.topNgramFrac(w, 1))
      .otherwise(lit(null).cast("double"))
    val n = greatest(length(col("text")) - 1, lit(1)).cast("double")
    val ent = -aggregate(
      org.apache.spark.sql.functions.transform(
        graft.functions.NativeKernels.charBigramCounts(col("text")),
        c => c.cast("double")),
      lit(0.0), (acc, c) => acc + c / n * log2(c / n))
    val punct = (length(col("text")) -
      length(regexp_replace(col("text"), "[a-z0-9 ]", ""))).cast("double") / length(col("text"))
    spread(t(s, dir, "documents"))
      .select(col("doc_id"), rep.as("rep_ratio"),
        round(ent, 6).as("bigram_entropy"), punct.as("alnum_ratio"))
      .orderBy(col("doc_id"))
  }

  private val qualitySql =
    """WITH tk AS (SELECT doc_id, text, list_filter(list_transform(string_split(text, ' '), x -> trim(x)), x -> x <> '') AS w FROM documents),
      |g AS (SELECT doc_id, text, w, [substr(text, i, 2) for i in range(1, greatest(length(text) - 1, 1) + 1)] AS grams FROM tk)
      |SELECT doc_id,
      |  list_max(list_transform(list_distinct(w), t -> len(list_filter(w, x -> x = t))))::DOUBLE / len(w) AS rep_ratio,
      |  round(-list_sum(list_transform(list_distinct(grams),
      |    gr -> len(list_filter(grams, x -> x = gr))::DOUBLE / len(grams) * log2(len(list_filter(grams, x -> x = gr))::DOUBLE / len(grams)))), 6) AS bigram_entropy,
      |  (length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')))::DOUBLE / length(text) AS alnum_ratio
      |FROM g ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------------------
  // PII scrub preset: deterministic PII shapes (email/card/SSN/phone/IP)
  // are INJECTED from doc_id so both engines build the identical dirty
  // string, then masked by the shared TextKernels.PiiPatterns list — the
  // oracle SQL is GENERATED from the same pattern strings, so the match
  // proves java.util.regex and RE2 run the identical automata in the
  // identical order
  // ----------------------------------------------------------------------
  private val PiiInjectTail =
    " card 4111 1111 1111 1111 ssn 123-45-6789 tel 555-123-4567 or +442071234567 end"

  private val scrubPiiQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val dirty = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@mail.example.com from 10.20."),
      (col("doc_id") % 256).cast("string"), lit(".9"), lit(PiiInjectTail))
    spread(t(s, dir, "documents"))
      .select(col("doc_id"), TextKernels.scrubPii(dirty).as("clean"))
      .orderBy(col("doc_id"))
  }

  private val scrubPiiSql = {
    val dirty = "text || ' contact user' || doc_id || " +
      "'@mail.example.com from 10.20.' || (doc_id % 256) || '.9' || " +
      s"'$PiiInjectTail'"
    val masked = TextKernels.PiiPatterns.foldLeft(dirty) {
      case (acc, (p, r)) => s"regexp_replace($acc, '$p', '$r', 'g')"
    }
    s"""SELECT doc_id, $masked AS clean FROM documents ORDER BY doc_id"""
  }

  // ----------------------------------------------------------------------
  // unicode cleaning: decomposed combining sequences and control bytes are
  // INJECTED deterministically (Scala \\u literals on the engine side,
  // chr() on the oracle side — identical UTF-8 either way), then cleaned
  // by TextKernels.cleanText (native NFC kernel + shared control-char
  // class). NFC is the UAX #15 algorithm in both the JDK and DuckDB, so
  // the composed output hash-matches byte-for-byte.
  // ----------------------------------------------------------------------
  private val cleanTextQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val dirty = concat(col("text"),
      lit(" caf"), lit("e\u0301"),          // e + combining acute -> composed
      lit(" \u0007bell\rcr\ttab"),        // BEL + CR stripped, TAB kept
      lit(" A\u030Angstro\u0308m"))        // combining ring / diaeresis
    spread(t(s, dir, "documents"))
      .select(col("doc_id"), TextKernels.cleanText(dirty).as("clean"))
      .orderBy(col("doc_id"))
  }

  private val cleanTextSql =
    s"""SELECT doc_id,
       |  regexp_replace(nfc_normalize(
       |    text || ' caf' || 'e' || chr(769) ||
       |    ' ' || chr(7) || 'bell' || chr(13) || 'cr' || chr(9) || 'tab' ||
       |    ' A' || chr(778) || 'ngstro' || chr(776) || 'm'),
       |    '${TextKernels.ControlCharPattern}', '', 'g') AS clean
       |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------------------
  // Gopher rule battery: every verdict is an exact integer comparison
  // (cross-multiplied thresholds), so booleans hash-match bit-for-bit
  // ----------------------------------------------------------------------
  // the synthetic corpus's own function-word probe set (the published
  // English set never fires on it, which would leave ok_stop/pass without
  // variance to verify) — shared verbatim by query and oracle
  private val GopherProbeWords = Seq("the", "a", "value", "table")

  private val gopherQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.QualityRules.gopher(
        spread(t(s, dir, "documents")), col("doc_id"), col("text"),
        stopWords = GopherProbeWords)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val gopherSql = {
    val stops = GopherProbeWords
      .map(sw => s"list_contains(w, '$sw')::INT").mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, text, ${sqlWords("text")} AS w FROM documents),
       |m AS (SELECT doc_id, text, w,
       |  len(w)::BIGINT AS n_words,
       |  coalesce(list_sum(list_transform(w, x -> length(x))), 0)::BIGINT AS n_chars,
       |  (len(regexp_extract_all(text, '#')) +
       |   len(regexp_extract_all(text, '\\.\\.\\.|…')))::BIGINT AS n_sym,
       |  len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha,
       |  len(string_split(text, chr(10)))::BIGINT AS n_lines,
       |  len(list_filter(string_split(text, chr(10)),
       |    l -> regexp_matches(trim(l), '^([\\*•‣◦-]\\s|\\d+[.)]\\s)')))::BIGINT AS n_bullet,
       |  len(list_filter(string_split(text, chr(10)),
       |    l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$$')))::BIGINT AS n_ell,
       |  ($stops) AS n_stop
       |  FROM tk)
       |SELECT doc_id, n_words,
       |  (n_words >= 50 AND n_words <= 100000) AS ok_words,
       |  (3 * n_words <= n_chars AND n_chars <= 10 * n_words) AS ok_word_len,
       |  (10 * n_sym <= n_words) AS ok_symbols,
       |  (5 * n_alpha >= 4 * n_words) AS ok_alpha,
       |  (10 * n_bullet <= 9 * n_lines) AS ok_bullets,
       |  (10 * n_ell <= 3 * n_lines) AS ok_ellipsis,
       |  (n_stop >= 2) AS ok_stop,
       |  ((n_words >= 50 AND n_words <= 100000) AND
       |   (3 * n_words <= n_chars AND n_chars <= 10 * n_words) AND
       |   (10 * n_sym <= n_words) AND (5 * n_alpha >= 4 * n_words) AND
       |   (10 * n_bullet <= 9 * n_lines) AND (10 * n_ell <= 3 * n_lines) AND
       |   (n_stop >= 2)) AS pass
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------------------
  // learned quality classifier: multinomial NB trained on the corpus's own
  // language label (lang='en' as the trusted class), then every document
  // scored — QualityClassifier.train + score under the same hash gate as
  // the heuristic signals. Determinism: weights are ln() of exact integer
  // ratios (Java vs DuckDB ln differ ≤1 ulp; a document sums ≤ ~70 of
  // them, so round-6 absorbs both that and summation order), and the
  // maxVocab=16 cap BINDS (31-token vocab) with measured |llr| boundary
  // gaps ≥ 1.2e-4 at sf0.001/0.01/0.1 — no tie risk at the TakeOrdered
  // cut; exact count ties inside the cap break on the token in both
  // engines.
  // ----------------------------------------------------------------------
  private val nbQualityQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = spread(t(s, dir, "documents"))
    val w = graft.functions.NativeKernels.wordTokens(col("text"))
    val model = graft.operators.QualityClassifier.train(
      docs, w, col("lang") === "en", maxVocab = 16)
    graft.operators.QualityClassifier
      .score(docs, col("doc_id"), w, model)
      .select(col("id").as("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"))
  }

  private val nbQualitySql =
    s"""WITH tk AS (SELECT doc_id, lang = 'en' AS l, ${sqlWords("text")} AS w FROM documents),
       |cls AS (SELECT sum(CASE WHEN l THEN 1 ELSE 0 END)::BIGINT AS np,
       |               sum(CASE WHEN l THEN 0 ELSE 1 END)::BIGINT AS nn FROM tk),
       |cnt AS (SELECT t, sum(CASE WHEN l THEN 1 ELSE 0 END)::BIGINT AS cp,
       |               sum(CASE WHEN l THEN 0 ELSE 1 END)::BIGINT AS cn
       |        FROM (SELECT l, unnest(w) AS t FROM tk) GROUP BY t),
       |tot AS (SELECT sum(cp)::BIGINT AS tp, sum(cn)::BIGINT AS tn,
       |               count(*)::BIGINT AS v FROM cnt),
       |wt AS (SELECT t, ln((cp + 1.0) / (tp + v)) - ln((cn + 1.0) / (tn + v)) AS llr
       |       FROM cnt, tot ORDER BY abs(llr) DESC, t LIMIT 16),
       |ex AS (SELECT doc_id, unnest(w) AS t FROM tk),
       |sc AS (SELECT ex.doc_id, sum(wt.llr) AS s
       |       FROM ex LEFT JOIN wt ON ex.t = wt.t GROUP BY ex.doc_id)
       |SELECT tk.doc_id,
       |  round((SELECT ln(np::DOUBLE / nn) FROM cls) + coalesce(sc.s, 0.0), 6) AS score
       |FROM tk LEFT JOIN sc ON tk.doc_id = sc.doc_id ORDER BY tk.doc_id""".stripMargin

  // ----------------------------------------------------------------------
  // DSIR importance weighting + Gumbel-top-k resampling (Xie et al. 2023):
  // hashed unigram+bigram bucket models (64 buckets here so the oracle
  // exercises real collisions), per-document log-likelihood-ratio weights,
  // deterministic Gumbel selection keyed on the portable ppm id-hash
  // ----------------------------------------------------------------------
  private val dsirBuckets = 64

  private val dsirQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.Dsir.weights(
        t(s, dir, "documents"), col("doc_id"),
        graft.functions.NativeKernels.wordTokens(col("text")),
        col("lang") === "en", buckets = dsirBuckets)
      .select(col("id").as("doc_id"), col("n_feats"),
        round(col("weight"), 6).as("weight"))
      .orderBy(col("doc_id"))

  /** Shared oracle prelude: the hashed-feature stream and the two bucket
    * models (CTEs `tk`, `fb`, `cnt`, `tot`, `lr`, `dw`). */
  private def dsirSqlPrelude: String =
    s"""WITH tk AS (SELECT doc_id, lang = 'en' AS tgt, ${sqlWords("text")} AS w FROM documents),
       |ft AS (SELECT doc_id, tgt, unnest(list_concat(w,
       |  [w[i] || ' ' || w[i+1] for i in range(1, greatest(len(w) - 1, 0) + 1)])) AS g FROM tk),
       |fb AS (SELECT doc_id, tgt, ${sqlHashMod("g", dsirBuckets)} AS b FROM ft),
       |cnt AS (SELECT b, count(*)::BIGINT AS cr,
       |               sum(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS ct FROM fb GROUP BY b),
       |tot AS (SELECT sum(cr)::DOUBLE AS tr, sum(ct)::DOUBLE AS tt FROM cnt),
       |lr AS (SELECT b, ln((ct + 1.0) / (tt + $dsirBuckets))
       |             - ln((cr + 1.0) / (tr + $dsirBuckets)) AS llr FROM cnt, tot),
       |dw AS (SELECT fb.doc_id, count(*)::BIGINT AS n_feats, sum(lr.llr) AS s
       |       FROM fb JOIN lr USING(b) GROUP BY fb.doc_id)""".stripMargin

  private val dsirSql =
    s"""$dsirSqlPrelude
       |SELECT tk.doc_id, coalesce(dw.n_feats, 0)::BIGINT AS n_feats,
       |  round(coalesce(dw.s, 0.0), 6) AS weight
       |FROM tk LEFT JOIN dw ON tk.doc_id = dw.doc_id ORDER BY tk.doc_id""".stripMargin

  private val dsirSelectQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val scored = graft.operators.Dsir.weights(
      t(s, dir, "documents"), col("doc_id"),
      graft.functions.NativeKernels.wordTokens(col("text")),
      col("lang") === "en", buckets = dsirBuckets)
    graft.operators.Dsir
      .resample(scored, col("id"), col("weight"), k = 50, temperature = 2.0)
      .select(col("id").as("doc_id"), col("sel_key"))
      .orderBy(col("doc_id"))
  }

  private val dsirSelectSql =
    s"""$dsirSqlPrelude,
       |sel AS (SELECT tk.doc_id,
       |    round(coalesce(dw.s, 0.0) / 2.0
       |      - ln(-ln((${sqlHashPpm("tk.doc_id")} + 0.5) / 1000000.0)), 6) AS sel_key
       |  FROM tk LEFT JOIN dw ON tk.doc_id = dw.doc_id
       |  ORDER BY sel_key DESC, tk.doc_id LIMIT 50)
       |SELECT doc_id, sel_key FROM sel ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------------------
  // corpus-wide exact duplicate-span discovery + removal (Lee et al. 2022
  // ExactSubstr at word granularity): 8-token windows repeated >= 2 times
  // anywhere in the corpus, merged to maximal spans, then cut out of the
  // text — the boilerplate/memorization pass near-dup operators can't do
  // ----------------------------------------------------------------------
  private val spanN = 8

  private val dedupSpansQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.SpanDedup.spans(
        t(s, dir, "documents"), col("doc_id"),
        graft.functions.NativeKernels.wordTokens(col("text")),
        n = spanN, minCount = 2L)
      .select(col("id").as("doc_id"),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"), col("n_windows"))
      .orderBy(col("doc_id"), col("span_start"))

  /** Shared oracle prelude: sliding windows and their corpus-duplicated
    * occurrences (CTEs `tk`, `win`, `dup`). */
  private def spanSqlPrelude: String =
    s"""WITH tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |win AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM
       |  (SELECT doc_id, unnest([{'pos': i, 'g': array_to_string(w[(i+1):(i+$spanN)], ' ')}
       |     for i in range(0, greatest(len(w) - ${spanN - 1}, 0))]) AS u FROM tk)),
       |dup AS (SELECT doc_id, pos FROM win
       |  JOIN (SELECT g FROM win GROUP BY g HAVING count(*) >= 2) USING (g))""".stripMargin

  private val dedupSpansSql =
    s"""$spanSqlPrelude,
       |brk AS (SELECT doc_id, pos, CASE WHEN pos >
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $spanN
       |  THEN 1 ELSE 0 END AS b FROM dup),
       |isl AS (SELECT doc_id, pos, sum(b) OVER
       |  (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS i FROM brk)
       |SELECT doc_id, min(pos)::BIGINT AS span_start,
       |  (max(pos) + $spanN)::BIGINT AS span_end, count(*)::BIGINT AS n_windows
       |FROM isl GROUP BY doc_id, i ORDER BY doc_id, span_start""".stripMargin

  private val dedupSubstrQ: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.operators.SpanDedup.removeSpans(
        t(s, dir, "documents"), col("doc_id"),
        graft.functions.NativeKernels.wordTokens(col("text")),
        n = spanN, minCount = 2L)
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
        col("text_clean"))
      .orderBy(col("doc_id"))

  private val dedupSubstrSql =
    s"""$spanSqlPrelude,
       |cov AS (SELECT DISTINCT doc_id, pos + j AS p
       |  FROM dup CROSS JOIN range(0, $spanN) AS t(j)),
       |tkx AS (SELECT doc_id, unnest(w) AS tok,
       |  unnest([i for i in range(0, len(w))]) AS p FROM tk),
       |kept AS (SELECT tkx.doc_id, tkx.p, tkx.tok FROM tkx
       |  LEFT JOIN cov ON tkx.doc_id = cov.doc_id AND tkx.p = cov.p
       |  WHERE cov.p IS NULL),
       |cl AS (SELECT doc_id, array_to_string(array_agg(tok ORDER BY p), ' ') AS text_clean
       |  FROM kept GROUP BY doc_id),
       |rm AS (SELECT doc_id, count(*)::BIGINT AS n_removed FROM cov GROUP BY doc_id)
       |SELECT tk.doc_id, len(tk.w)::BIGINT AS n_tokens,
       |  coalesce(rm.n_removed, 0)::BIGINT AS n_removed,
       |  coalesce(cl.text_clean, '') AS text_clean
       |FROM tk LEFT JOIN rm ON tk.doc_id = rm.doc_id
       |LEFT JOIN cl ON tk.doc_id = cl.doc_id ORDER BY tk.doc_id""".stripMargin

  // ----------------------------------------------------------------------
  // repetition-based quality signals (the classic corpus-filter rules:
  // top-bigram occupancy + duplicate-5-gram fraction) — narrow per-row
  // maps, no shuffle; integer-ratio doubles, engine-portable bit-for-bit
  // ----------------------------------------------------------------------
  private val repetitionQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val w = graft.functions.NativeKernels.wordTokens(col("text"))
    spread(t(s, dir, "documents"))
      .select(col("doc_id"),
        round(TextKernels.topBigramFraction(w), 6).as("top_bigram_frac"),
        round(TextKernels.dupNgramFraction(w, 5), 6).as("dup_5gram_frac"))
      .orderBy(col("doc_id"))
  }

  private val repetitionSql =
    """WITH tk AS (SELECT doc_id, list_filter(list_transform(string_split(text, ' '), x -> trim(x)), x -> x <> '') AS w FROM documents),
      |g AS (SELECT doc_id,
      |  [w[i] || ' ' || w[i+1] for i in range(1, greatest(len(w) - 1, 0) + 1)] AS g2,
      |  [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
      |     for i in range(1, greatest(len(w) - 4, 0) + 1)] AS g5 FROM tk)
      |SELECT doc_id,
      |  round(CASE WHEN len(g2) <= 0 THEN 0.0 ELSE
      |    list_max(list_transform(list_distinct(g2), t -> len(list_filter(g2, x -> x = t))))::DOUBLE / len(g2) END, 6) AS top_bigram_frac,
      |  round(CASE WHEN len(g5) <= 0 THEN 0.0 ELSE
      |    1.0 - len(list_distinct(g5))::DOUBLE / len(g5) END, 6) AS dup_5gram_frac
      |FROM g ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------------------
  // per-document token chunking with overlap (the training/RAG chunker):
  // 32-token windows every 24 tokens — a narrow map + posexplode, no
  // shuffle; boundaries are integer arithmetic, engine-portable exactly
  // ----------------------------------------------------------------------
  private val chunkQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val w = graft.functions.NativeKernels.wordTokens(col("text"))
    graft.operators.Packing.chunkTokens(
        spread(t(s, dir, "documents")).select(col("doc_id"), w.as("w")),
        col("doc_id"), col("w"), chunkSize = 32, overlap = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val chunkSql =
    """WITH tk AS (SELECT doc_id, list_filter(list_transform(string_split(text, ' '), x -> trim(x)), x -> x <> '') AS w FROM documents),
      |c AS (SELECT doc_id, w, len(w) AS n,
      |  CASE WHEN len(w) <= 0 THEN 0 ELSE floor((len(w) - 1) / 24.0)::INT + 1 END AS k FROM tk),
      |u AS (SELECT doc_id, unnest([{'i': i, 's': i*24, 'e': least(i*24+32, n),
      |  't': array_to_string(w[(i*24+1):least(i*24+32, n)], ' ')} for i in range(0, k)]) AS ch FROM c)
      |SELECT doc_id, ch.i AS chunk_idx, ch.s AS tok_start, ch.e AS tok_end, ch.t AS chunk_text
      |FROM u ORDER BY doc_id, chunk_idx""".stripMargin

  // ----------------------------------------------------------------------
  // batch similarity JOIN (two-sided): a 50-document query corpus joined
  // against the full corpus by shingle Jaccard >= 0.8 through band-bucket
  // candidates (never all-pairs)
  // ----------------------------------------------------------------------
  private val simJoinQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = spread(t(s, dir, "documents"))
    val queries = docs.where(col("doc_id") < 50)
    val sh = graft.functions.NativeKernels.wordShingles2(col("text"))
    graft.operators.SimJoin
      .jaccardJoin(queries, "doc_id", sh, docs, "doc_id", sh, 0.8)
      .orderBy(col("l_id"), col("r_id"))
  }

  private val simJoinSql = {
    val sigs = (0 until Dedup.NumHashes)
      .map(i => s"list_min(list_transform(hv, h -> substr(h, ${i + 1}, 8))) AS s_$i").mkString(",\n  ")
    val bands = (0 until Dedup.NumBands).map { b =>
      val parts = (0 until Dedup.RowsPerBand).map(r => s"s_${b * Dedup.RowsPerBand + r}")
      s"md5(${parts.mkString(" || '|' || ")}) AS b$b"
    }.mkString(", ")
    val bandEq = (0 until Dedup.NumBands).map(b => s"l.b$b = r.b$b").mkString(" OR ")
    s"""WITH tk AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |sh AS (SELECT doc_id, ${sqlShingles2("w")} AS g FROM tk),
       |hv AS (SELECT doc_id, list_transform(g, x -> md5(x)) AS hv FROM sh),
       |sig AS (SELECT doc_id, $sigs FROM hv),
       |band AS (SELECT doc_id, $bands FROM sig),
       |cand AS (SELECT DISTINCT l.doc_id AS l_id, r.doc_id AS r_id
       |         FROM band l, band r WHERE l.doc_id < 50 AND ($bandEq))
       |SELECT c.l_id, c.r_id, ${sqlJaccard("sl.g", "sr.g")} AS j
       |FROM cand c JOIN sh sl ON sl.doc_id = c.l_id JOIN sh sr ON sr.doc_id = c.r_id
       |WHERE ${sqlJaccard("sl.g", "sr.g")} >= 0.8 ORDER BY l_id, r_id""".stripMargin
  }

  // ----------------------------------------------------------------------
  // end-to-end training-data pipeline: the LLM operators COMPOSED —
  // quality filter -> exact-dup removal (keep min doc_id per fingerprint)
  // -> near-dup removal (connected components over the verified MinHash
  // pairs; keep each component's min-id representative — pair-local "drop
  // the higher id" would keep extra members of a group whose pairs all
  // point at larger ids) -> benchmark decontamination (drop the eval set
  // itself and every doc whose shared-shingle RATIO n_shared/n_shingles
  // reaches ContamRatio) -> per-survivor token count. Every stage is the
  // same operator the standalone queries verify individually.
  // ----------------------------------------------------------------------
  private val pipelineQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = spread(t(s, dir, "documents"))
    val w = graft.functions.NativeKernels.wordTokens(col("text"))
    // cached: the quality gate feeds BOTH the exact-dedup keeper aggregate
    // and the survivor semi-join's left side — one tokenize+filter pass
    // instead of two (the keeper aggregate materializes it as the semi
    // join's build stage, so the probe side reads a warm cache)
    val quality = graft.util.CacheScope.register(docs
      .select(col("doc_id"), col("text"), size(w).cast("long").as("n_tokens"))
      .where(col("n_tokens") >= 40)
      .cache())
    val keepers = quality
      .select(col("doc_id"), TextKernels.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // genuine composition: near-dup detection runs over the exact-dedup
    // SURVIVORS, so a document is only dropped for near-duplicating a
    // document that itself survived the earlier stages. Cached: the
    // subtree (filter + fingerprint groupBy + semi join) feeds the MinHash
    // stage several times — including its partition probe, which
    // materializes AQE stages — and must compute once. Cache lifetime
    // follows the RankAggregate rationale: the returned frame is lazy and
    // still references the entry, so it cannot be unpersisted here;
    // entries are MEMORY_AND_DISK and shed via LRU in long sessions.
    val survivors = graft.util.CacheScope.register(
      quality.join(keepers, Seq("doc_id"), "left_semi").cache())
    val shingles = graft.functions.NativeKernels.wordShingles2(col("text"))
    val pairs = Dedup.minhashPairs(survivors, "doc_id", shingles, 0.8)
    val nearDupLosers = Dedup.clusters(pairs)
      .where(col("c") < col("n")).select(col("n").as("doc_id"))
    // decontamination runs against the FULL corpus's eval set (the
    // benchmark is external to the pipeline's survivorship); ratio rule —
    // see the q_contamination note
    val contaminated = graft.operators.Contamination.sharedShingleCounts(
        docs, col("doc_id"), shingles, col("doc_id") < ContamEvalMax)
      .where(col("n_shared").cast("double") / col("n_shingles") >= ContamRatio)
      .select(col("id").as("doc_id"))
    survivors
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .where(col("doc_id") >= ContamEvalMax)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  private val pipelineSql = {
    val qualityPred = s"len(${sqlWords("text")}) >= 40"
    // exact-dedup survivors of the quality stage, self-contained so the
    // pairs CTE chain (which cannot see the outer CTEs) can reuse it
    val survivorsSub =
      s"""(SELECT doc_id, text, len(${sqlWords("text")})::BIGINT AS n_tokens
         | FROM documents WHERE $qualityPred
         |   AND doc_id IN (
         |     SELECT min(doc_id) FROM (
         |       SELECT doc_id, ${sqlFingerprint("text")} AS fp
         |       FROM documents WHERE $qualityPred)
         |     GROUP BY fp))""".stripMargin
    val pairs = minhashPairsSql(
      s"""tk0 AS (SELECT doc_id, ${sqlWords("text")} AS w FROM $survivorsSub sv0),
         |sh AS (SELECT doc_id, ${sqlShingles2("w")} AS g FROM tk0)""".stripMargin, 0.8)
    s"""WITH RECURSIVE pairs AS ($pairs),
       |survivors AS (SELECT * FROM $survivorsSub sv),
       |edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b AS x, a AS y FROM pairs),
       |r AS (SELECT x AS n, y AS m FROM edges
       |      UNION SELECT r.n, e.y FROM r JOIN edges e ON r.m = e.x),
       |losers AS (SELECT n AS doc_id FROM r GROUP BY n HAVING min(m) < n),
       |tkc AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |shc AS (SELECT doc_id, unnest(${sqlShingles2("w")}) AS g FROM tkc),
       |ev AS (SELECT DISTINCT g AS eg FROM shc WHERE doc_id < $ContamEvalMax),
       |contam AS (SELECT doc_id FROM (
       |  SELECT doc_id, count(*) AS n_shingles, count(eg) AS n_shared
       |  FROM shc LEFT JOIN ev ON shc.g = ev.eg
       |  WHERE doc_id >= $ContamEvalMax GROUP BY doc_id)
       |  WHERE n_shared::DOUBLE / n_shingles >= $ContamRatio)
       |SELECT doc_id, n_tokens FROM survivors
       |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
       |  AND doc_id >= $ContamEvalMax
       |  AND doc_id NOT IN (SELECT doc_id FROM contam)
       |ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------------------
  // salted skew join: the hot-key mitigation must be RESULT-INVARIANT —
  // the oracle is the plain unsalted join + aggregate
  // ----------------------------------------------------------------------
  private val skewJoinQ: (SparkSession, String) => DataFrame = (s, dir) => {
    val li = spread(t(s, dir, "lineitem"))
      .select(col("l_orderkey").as("k"), col("l_quantity").cast("long").as("qty"))
    val od = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"))
    graft.operators.SkewJoin.saltedInnerJoin(li, od, "k", 8)
      .groupBy(pmod(col("cust"), lit(10)).as("cust_mod"))
      .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("qty_sum"))
      .orderBy(col("cust_mod"))
  }

  private val skewJoinSql =
    """SELECT o_custkey % 10 AS cust_mod, count(*)::BIGINT AS cnt,
      |  sum(l_quantity::BIGINT)::BIGINT AS qty_sum
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin

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
    "q_multifacet"    -> multiFacet,
    "q_multiweight"   -> multiWeight,
    "q_sim_matrix"    -> simMatrix,
    "q_ingest_stats"  -> ingestStats,
    "q_norm_topk"     -> normTopk,
    "q_weight_est"    -> weightEst,
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_cross"   -> dedupCross,
    "q_dedup_ngram"   -> dedupNgram,
    "q_winnow"        -> winnowQ,
    "q_winnow_spans"  -> winnowSpansQ,
    "q_dedup_exact"   -> dedupExact,
    "q_dedup_lines"   -> dedupLines,
    "q_dedup_lines_df" -> dedupLinesDf,
    "q_dedup_incr"    -> dedupIncr,
    "q_dedup_incr_exact" -> dedupIncrExact,
    "q_fingerprint"   -> fingerprintQ,
    "q_simhash"       -> simhashQ,
    "q_text_stats"    -> textStats,
    "q_lang_id"       -> langId,
    "q_token_count"   -> tokenCount,
    "q_ann_cosine"    -> annCosine,
    "q_rand_proj"     -> randProjQ,
    "q_ann_lsh"       -> annLsh,
    "q_ann_lsh_mp"    -> annLshMp,
    "q_ann_idx"       -> annIdx,
    "q_ann_ivf"       -> annIvf,
    "q_ann_ivf_idx"   -> annIvfIdx,
    "q_pq_topk"       -> pqTopk,
    "q_pq_ivf_idx"    -> pqIvfIdx,
    "q_ann_incr"      -> annIncr,
    "q_skew_join"     -> skewJoinQ,
    "q_pipeline"      -> pipelineQ,
    "q_dedup_embedding" -> dedupEmbedding,
    "q_semdedup"      -> semDedupQ,
    "q_pivot_multimetric" -> pivotMultimetric,
    "q_multimodal_meta" -> multimodalMeta,
    "q_multimodal_av" -> multimodalAv,
    "q_frame_sample"  -> frameSampleQ,
    "q_image_phash"   -> imagePhash,
    "q_image_neardup" -> imageNearDup,
    "q_image_incr"    -> imageIncr,
    "q_image_resize"  -> imageResize,
    "q_image_stats"   -> imageStats,
    "q_corpus_profile" -> corpusProfile,
    "q_corpus_overlap" -> corpusOverlap,
    "q_profile_series" -> profileSeriesQ,
    "q_image_cluster" -> imageCluster,
    "q_audio_fp"      -> audioFp,
    "q_audio_stats"   -> audioStats,
    "q_audio_neardup" -> audioNearDup,
    "q_video_meta"    -> videoMeta,
    "q_video_frames"  -> videoFrames,
    "q_video_neardup" -> videoNearDup,
    "q_video_stats"   -> videoStats,
    "q_video_incr"    -> videoIncr,
    "q_mp4_meta"      -> mp4Meta,
    "q_mp4_frames"    -> mp4Frames,
    "q_mp4_neardup"   -> mp4NearDup,
    "q_mp4_stats"     -> mp4Stats,
    "q_webp_anim_frames"  -> webpAnimFrames,
    "q_mp4_codecs"    -> mp4Codecs,
    "q_webp_anim_neardup" -> webpAnimNearDup,
    "q_pipeline_mm"   -> pipelineMm,
    "q_mp3_frames"    -> mp3Frames,
    "q_webm_blocks"   -> webmBlocks,
    "q_ogg_pages"     -> oggPages,
    "q_ts_packets"    -> tsPackets,
    "q_audio_seq"     -> audioSeq,
    "q_audio_tags"    -> audioTags,
    "q_audio_seq_neardup" -> audioSeqNearDup,
    "q_warc_read"     -> warcRead,
    "q_html_text"     -> htmlText,
    "q_url_dedup"     -> urlDedup,
    "q_domain_cap"    -> domainCap,
    "q_window_agg"    -> windowAgg,
    "q_sessionize"    -> sessionize,
    "q_haversine_knn" -> haversineKnn,
    "q_chebyshev_topk" -> chebyshevTopk,
    "q_word2vec"      -> word2vecQ,
    "q_quality"       -> qualityQ,
    "q_nb_quality"    -> nbQualityQ,
    "q_dsir"          -> dsirQ,
    "q_dsir_select"   -> dsirSelectQ,
    "q_dedup_spans"   -> dedupSpansQ,
    "q_dedup_substr"  -> dedupSubstrQ,
    "q_scrub_pii"     -> scrubPiiQ,
    "q_gopher"        -> gopherQ,
    "q_clean_text"    -> cleanTextQ,
    "q_repetition"    -> repetitionQ,
    "q_chunk"         -> chunkQ,
    "q_sim_join"      -> simJoinQ,
    "q_dedup_cluster" -> dedupCluster,
    "q_dedup_cluster_dist" -> dedupClusterDist,
    "q_dedup_keep_best" -> dedupKeepBest,
    "q_curation"      -> curationQ,
    "q_token_budget"  -> tokenBudget,
    "q_sample_hash"   -> sampleHash,
    "q_split"         -> splitQ,
    "q_sample_weighted" -> sampleWeighted,
    "q_sample_stratified" -> sampleStratified,
    "q_source_mix"    -> sourceMix,
    "q_pack_chunks"   -> packChunks,
    "q_tfidf"         -> tfidfQ,
    "q_lm_quality"    -> lmQualityQ,
    "q_lm_bigram"     -> lmBigramQ,
    "q_lm_model"      -> lmModelQ,
    "q_ppl_buckets"   -> pplBucketsQ,
    "q_scrub"         -> scrubQ,
    "q_simhash_pairs" -> simhashPairsQ,
    "q_contamination" -> contaminationQ,
    "q_decontaminate" -> decontaminateQ,
    "q_compact"       -> compactQ,
    "q_quantize"      -> quantizeQ,
    "q_compress_ratio" -> compressRatioQ,
  )

  val oracles: Map[String, String] = Map(
    "q_num_topk"      -> numTopkSql,
    "q_num_topk_max"  -> numTopkMaxSql,
    "q_temporal_topk" -> temporalTopkSql,
    "q_cat_topk"      -> catTopkSql,
    "q_text_topk"     -> textTopkSql,
    "q_spatial_knn"   -> spatialKnnSql,
    "q_multifacet"    -> multiFacetSql,
    "q_multiweight"   -> multiWeightSql,
    "q_sim_matrix"    -> simMatrixSql,
    "q_ingest_stats"  -> ingestStatsSql,
    "q_norm_topk"     -> normTopkSql,
    "q_weight_est"    -> weightEstSql,
    "q_dedup_minhash" -> dedupMinhashSql,
    "q_dedup_cross"   -> dedupCrossSql,
    "q_dedup_ngram"   -> dedupNgramSql,
    "q_winnow"        -> winnowSql,
    "q_winnow_spans"  -> winnowSpansSql,
    "q_dedup_exact"   -> dedupExactSql,
    "q_dedup_lines"   -> dedupLinesSql,
    "q_dedup_lines_df" -> dedupLinesDfSql,
    "q_dedup_incr"    -> dedupIncrSql,
    "q_dedup_incr_exact" -> dedupIncrExactSql,
    "q_fingerprint"   -> fingerprintSql,
    "q_simhash"       -> simhashSql,
    "q_text_stats"    -> textStatsSql,
    "q_lang_id"       -> langIdSql,
    "q_token_count"   -> tokenCountSql,
    "q_ann_cosine"    -> annCosineSql,
    "q_rand_proj"     -> randProjSql,
    "q_ann_lsh"       -> annLshSql,
    "q_ann_lsh_mp"    -> annLshMpSql,
    "q_ann_idx"       -> annMpSql(6, 4), // index build+probe == on-the-fly multi-probe at 6 bits
    "q_ann_ivf"       -> annIvfSql,
    "q_ann_ivf_idx"   -> annIvfSql, // persisted IVF index == on-the-fly ivfTopK
    "q_pq_topk"       -> pqTopkSql,
    "q_pq_ivf_idx"    -> pqIvfIdxSql,
    "q_ann_incr"      -> annIncrSql,
    "q_skew_join"     -> skewJoinSql,
    "q_pipeline"      -> pipelineSql,
    "q_dedup_embedding" -> dedupEmbeddingSql,
    "q_semdedup"      -> semDedupSql,
    "q_pivot_multimetric" -> pivotMultimetricSql,
    "q_multimodal_meta" -> multimodalMetaSql,
    "q_multimodal_av" -> multimodalAvSql,
    "q_frame_sample"  -> frameSampleSql,
    "q_image_phash"   -> imagePhashSql,
    "q_image_neardup" -> imageNearDupSql,
    "q_image_incr"    -> imageIncrSql,
    "q_image_resize"  -> imageResizeSql,
    "q_image_stats"   -> imageStatsSql,
    "q_corpus_profile" -> corpusProfileSql,
    "q_corpus_overlap" -> corpusOverlapSql,
    "q_image_cluster" -> imageClusterSql,
    "q_audio_fp"      -> audioFpSql,
    "q_audio_stats"   -> audioStatsSql,
    "q_profile_series" -> profileSeriesSql,
    "q_video_meta"    -> videoMetaSql,
    "q_video_frames"  -> videoFramesSql,
    "q_video_neardup" -> videoNearDupSql,
    "q_video_stats"   -> videoStatsSql,
    "q_video_incr"    -> videoIncrSql,
    "q_mp4_meta"      -> mp4MetaSql,
    "q_mp4_frames"    -> mp4FramesSql,
    "q_mp4_neardup"   -> mp4NearDupSql,
    "q_mp4_stats"     -> mp4StatsSql,
    "q_webp_anim_frames"  -> webpAnimFramesSql,
    "q_mp4_codecs"    -> mp4CodecsSql,
    "q_webp_anim_neardup" -> webpAnimNearDupSql,
    "q_pipeline_mm"   -> pipelineMmSql,
    "q_mp3_frames"    -> mp3FramesSql,
    "q_webm_blocks"   -> webmBlocksSql,
    "q_ogg_pages"     -> oggPagesSql,
    "q_ts_packets"    -> tsPacketsSql,
    "q_audio_seq"     -> audioSeqSql,
    "q_audio_tags"    -> audioTagsSql,
    "q_audio_seq_neardup" -> audioSeqNearDupSql,
    "q_audio_neardup" -> audioNearDupSql,
    "q_warc_read"     -> warcReadSql,
    "q_html_text"     -> htmlTextSql,
    "q_url_dedup"     -> urlDedupSql,
    "q_domain_cap"    -> domainCapSql,
    "q_window_agg"    -> windowAggSql,
    "q_sessionize"    -> sessionizeSql,
    "q_haversine_knn" -> haversineKnnSql,
    "q_chebyshev_topk" -> chebyshevTopkSql,
    "q_word2vec"      -> word2vecSql,
    "q_quality"       -> qualitySql,
    "q_nb_quality"    -> nbQualitySql,
    "q_dsir"          -> dsirSql,
    "q_dsir_select"   -> dsirSelectSql,
    "q_dedup_spans"   -> dedupSpansSql,
    "q_dedup_substr"  -> dedupSubstrSql,
    "q_scrub_pii"     -> scrubPiiSql,
    "q_gopher"        -> gopherSql,
    "q_clean_text"    -> cleanTextSql,
    "q_repetition"    -> repetitionSql,
    "q_chunk"         -> chunkSql,
    "q_sim_join"      -> simJoinSql,
    "q_dedup_cluster" -> dedupClusterSql,
    "q_dedup_cluster_dist" -> dedupClusterSql,
    "q_dedup_keep_best" -> dedupKeepBestSql,
    "q_curation"      -> curationSql,
    "q_token_budget"  -> tokenBudgetSql,
    "q_sample_hash"   -> sampleHashSql,
    "q_split"         -> splitSql,
    "q_sample_weighted" -> sampleWeightedSql,
    "q_sample_stratified" -> sampleStratifiedSql,
    "q_source_mix"    -> sourceMixSql,
    "q_pack_chunks"   -> packChunksSql,
    "q_tfidf"         -> tfidfSql,
    "q_lm_quality"    -> lmQualitySql,
    "q_lm_bigram"     -> lmBigramSql,
    "q_lm_model"      -> lmModelSql,
    "q_ppl_buckets"   -> pplBucketsSql,
    "q_scrub"         -> scrubSql,
    "q_simhash_pairs" -> simhashPairsSql,
    "q_contamination" -> contaminationSql,
    "q_decontaminate" -> decontaminateSql,
    "q_compact"       -> compactSql,
    "q_quantize"      -> quantizeSql,
    "q_compress_ratio" -> compressRatioSql,
  )
}
