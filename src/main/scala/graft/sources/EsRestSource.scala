package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.SimOp

/** Elasticsearch in-situ source (SURVEY §2 S9/Q7): per-facet top-M
  * similarity search pushed down to an ES-compatible REST endpoint as a
  * `function_score` decay (numbers/dates/geo) or `match` (keywords/text)
  * query — the reference's DSL templates reproduced verbatim
  * (reference: engine/processor/insitu/ElasticSearchRestQuery.java:123-158,
  * manager/insitu/HttpRestConnector.java).
  *
  * The source yields its ranked top-M stream, PLUS the reference's
  * random-access step (ranking/randomaccess/NumericalValueFinder.java:25-41
  * — an "HTTP connection to a REST API" value finder): candidates a mixed
  * query discovers outside the M-list are completed by re-running the same
  * scoring query restricted to their ids ([[lookupRaw]]), so mixed queries
  * rank exactly. Only an ES-only query keeps the pure-NRA list semantics
  * (nothing else discovers candidates there).
  *
  * The client (DSL construction, hit parsing, filter wrapping) is fully
  * real; the test suite drives it against a stub HTTP server because the
  * build environment has no Elasticsearch deployment.
  */
object EsRestSource {

  /** The ES search-request body for one similarity operation. Scale/decay
    * constants are the reference's: scale "1" (numeric), "1d" (temporal),
    * "100m" (spatial), decay 0.99999; categorical/textual use `match`.
    * Column names and the query value are JSON-escaped before templating —
    * the emitted DSL shape is the reference's, but a value containing a
    * quote must not yield a malformed request body. */
  /** The scoring core shared by the top-M query and the random-access
    * lookup: `function_score` decay for numbers/dates/geo, `match` for
    * keywords/text. */
  private def coreQuery(op: SimOp, valCol: String, value: String): String = {
    def decay(scale: String) =
      s"""{"function_score": {"query": {"exists": { "field": "$valCol" }},""" +
        s""""exp": {"$valCol": {"origin": "$value","scale": "$scale","decay" : 0.99999}}}}"""
    op match {
      case SimOp.Numerical => decay("1")
      case SimOp.Temporal => decay("1d")
      case SimOp.Spatial => decay("100m")
      case SimOp.Categorical | SimOp.Textual =>
        s"""{ "match": { "$valCol": "$value" } }"""
    }
  }

  def buildQuery(op: SimOp, keyCol0: String, valCol0: String, value0: String,
      size: Int, filter: Option[String] = None): String = {
    val (keyCol, valCol, value) = (RestClient.jsonEscape(keyCol0),
      RestClient.jsonEscape(valCol0), RestClient.jsonEscape(value0))
    val core = coreQuery(op, valCol, value)
    // the reference admits only object/array filter contexts and IGNORES
    // anything else with a notice (ElasticSearchRestQuery.java:147-153)
    val wrapped = filter match {
      case Some(f) if f.matches("\\[[^\\[]*\\]|\\{(.*?)\\}") =>
        s"""{"bool": {"must": [$core], "filter": $f}}"""
      case Some(_) =>
        System.err.println("NOTICE: Unsupported boolean filters specified in this query will be ignored.")
        core
      case None => core
    }
    s"""{"_source": ["$keyCol", "$valCol"], "query": $wrapped,"size": $size}"""
  }

  /** The index's `max_result_window` setting (default 10000) — the
    * reference discovers it at mount time and clamps every request's size
    * to it (HttpRestConnector.getMaxResultCount); a real ES rejects any
    * `size` above the window with HTTP 400. Absent/unreadable settings
    * fall back to the ES default. */
  def maxResultWindow(baseUrl: String, index: String,
      headers: Map[String, String] = Map.empty): Int =
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(RestClient.get(s"$baseUrl/$index/_settings", headers))
      val w = root.findValue("max_result_window")
      if (w == null) 10000 else w.asText().toInt
    } catch { case _: java.io.IOException => 10000 }

  /** POST one _search body and parse the hits into (id, value, score). */
  private def searchHits(baseUrl: String, index: String, body: String,
      keyCol: String, valCol: String,
      headers: Map[String, String]): Seq[(String, String, Double)] = {
    val resp = RestClient.post(s"$baseUrl/$index/_search", body, headers)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hits = mapper.readTree(resp).path("hits").path("hits")
    hits.elements().asScala.map { h =>
      val src = h.path("_source")
      (src.path(keyCol).asText(), src.path(valCol).asText(),
        h.path("_score").asDouble())
    }.toSeq
  }

  /** Execute the top-M similarity query against `<baseUrl>/<index>/_search`
    * and parse the hits into (id, value, score) rows, ES-ranked (score
    * descending — ES already orders hits by relevance). The request size is
    * clamped to the index's max_result_window (`window`; pass the value
    * from [[maxResultWindow]], discovered once at mount time). */
  def topM(spark: SparkSession, baseUrl: String, index: String, op: SimOp,
      keyCol: String, valCol: String, value: String, m: Int,
      filter: Option[String] = None,
      headers: Map[String, String] = Map.empty,
      window: Int = 10000): DataFrame = {
    val body = buildQuery(op, keyCol, valCol, value, math.min(m, window), filter)
    val rows = searchHits(baseUrl, index, body, keyCol, valCol, headers)
    import spark.implicits._
    rows.toDF("id", "value", "score")
  }

  /** Max ids per lookup request (mirrors the JDBC IN-list chunking; well
    * under ES's 65536 terms-clause ceiling and any sane result window). */
  private val LookupChunk = 1000

  /** The random-access request body: the SAME scoring core as the top-M
    * query, restricted to specific candidate ids via a `terms` clause on
    * the key field, composed with any user filter context. Filter context
    * never contributes to `_score`, so looked-up scores are exactly
    * comparable with the main ranked list's. */
  def buildLookupQuery(op: SimOp, keyCol0: String, valCol0: String,
      value0: String, ids: Seq[String], filter: Option[String] = None): String = {
    val (keyCol, valCol, value) = (RestClient.jsonEscape(keyCol0),
      RestClient.jsonEscape(valCol0), RestClient.jsonEscape(value0))
    val core = coreQuery(op, valCol, value)
    val terms = ids.map(i => "\"" + RestClient.jsonEscape(i) + "\"")
      .mkString(s"""{"terms": {"$keyCol": [""", ",", "]}}")
    // same admission rule as [[buildQuery]]: only object/array filter
    // contexts compose; junk was already rejected with a notice there.
    // An ARRAY-form filter is spliced element-wise after the terms clause:
    // ES rejects an array nested INSIDE a bool filter array, so
    // `[terms, [f1, f2]]` would make the lookup step fail on exactly the
    // filters the main query accepted — `[terms, f1, f2]` is the composed
    // form of the same filter context.
    val filters = filter match {
      case Some(f) if f.matches("\\[[^\\[]*\\]") =>
        val inner = f.trim.stripPrefix("[").stripSuffix("]").trim
        if (inner.isEmpty) s"[$terms]" else s"[$terms, $inner]"
      case Some(f) if f.matches("\\{(.*?)\\}") => s"[$terms, $f]"
      case _ => s"[$terms]"
    }
    s"""{"_source": ["$keyCol", "$valCol"], "query": """ +
      s"""{"bool": {"must": [$core], "filter": $filters}},"size": ${ids.size}}"""
  }

  /** Random-access score retrieval for a bounded candidate id set — the
    * rebuild of the reference's `IValueFinder` over an HTTP/REST source
    * (reference: ranking/randomaccess/NumericalValueFinder.java:25-41,
    * "JDBC connection to a DBMS or HTTP connection to a REST API"; also
    * Categorical/Spatial ValueFinder). Fires one chunked terms-query per
    * [[LookupChunk]] ids and returns RAW (id, score) rows — callers
    * normalize match scores against the main list's top (see [[facet]]).
    * A candidate failing the filter (or absent from the index) yields no
    * row, i.e. similarity 0, matching the missing-value contract. */
  def lookupRaw(spark: SparkSession, baseUrl: String, index: String, op: SimOp,
      keyCol: String, valCol: String, value: String, ids: Seq[Any],
      filter: Option[String] = None,
      headers: Map[String, String] = Map.empty): DataFrame = {
    require(ids.nonEmpty, "random-access lookup needs at least one id")
    val rows = ids.map(_.toString).grouped(LookupChunk).flatMap { chunk =>
      val body = buildLookupQuery(op, keyCol, valCol, value, chunk, filter)
      searchHits(baseUrl, index, body, keyCol, valCol, headers)
    }.toSeq
    import spark.implicits._
    rows.map { case (id, _, score) => (id, score) }.toDF("id", "score")
  }

  /** The ES attribute as a facet for a MIXED query (in-situ + ingested
    * attributes aggregated together): its ranked list becomes a pre-scored
    * [[graft.operators.BoundFacet]] WITH random access — rank aggregation
    * completes the list by re-running the same scoring query restricted to
    * the candidate ids it misses ([[lookupRaw]], the reference's
    * `IValueFinder` step over REST sources), so a mixed query whose true
    * top-k member sits outside the ES M-list still ranks exactly. An
    * ES-only query (no other facet to discover candidates) keeps the NRA
    * list semantics, as does any value-less source.
    *
    * Score comparability: the decay operations (Numerical/Temporal/
    * Spatial) already yield `function_score` values in (0, 1], directly
    * comparable with ingested facets' decayed similarities. A `match`
    * query's BM25 _score is UNBOUNDED (routinely 2-15), so for
    * Categorical/Textual the list is max-normalized (score / top score)
    * into (0, 1] — otherwise the ES facet would swamp every ingested
    * facet regardless of weights. Looked-up rows normalize against the
    * SAME top as the main list (a filter-context restriction never alters
    * `_score`, and any doc scoring above the M-th would already be IN the
    * list), so both row sources share one scale. */
  def facet(spark: SparkSession, baseUrl: String, index: String, op: SimOp,
      keyCol: String, valCol: String, value: String, m: Int,
      weightPerCombo: Seq[Double], filter: Option[String] = None,
      headers: Map[String, String] = Map.empty,
      window: Int = 10000): graft.operators.BoundFacet = {
    import org.apache.spark.sql.functions.{broadcast, col, max, when}
    val ranked = topM(spark, baseUrl, index, op, keyCol, valCol, value, m,
      filter, headers, window)
    lazy val top = ranked.agg(max(col("score")).as("top"))
    def normalize(df: DataFrame): DataFrame = op match {
      case SimOp.Categorical | SimOp.Textual =>
        df.crossJoin(broadcast(top))
          .select(col("id"),
            when(col("top") > 0, col("score") / col("top")).otherwise(0.0).as("d"))
      case _ => df.select(col("id"), col("score").as("d"))
    }
    graft.operators.BoundFacet(valCol, normalize(ranked), weightPerCombo,
      preScored = true,
      lookup = Some(ids => normalize(lookupRaw(spark, baseUrl, index, op,
        keyCol, valCol, value, ids, filter, headers))))
  }
}
