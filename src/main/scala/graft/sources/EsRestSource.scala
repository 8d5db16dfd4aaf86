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
  * Like the reference, the ES path allows NO random access: the source
  * yields its ranked top-M stream only, so rank aggregation over an ES
  * facet scores unseen entities as 0 (the NRA lower-bound semantics the
  * reference enforces for in-situ REST sources, SearchHandler.java:296-307).
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
  def buildQuery(op: SimOp, keyCol0: String, valCol0: String, value0: String,
      size: Int, filter: Option[String] = None): String = {
    val (keyCol, valCol, value) = (RestClient.jsonEscape(keyCol0),
      RestClient.jsonEscape(valCol0), RestClient.jsonEscape(value0))
    def decay(scale: String) =
      s"""{"function_score": {"query": {"exists": { "field": "$valCol" }},""" +
        s""""exp": {"$valCol": {"origin": "$value","scale": "$scale","decay" : 0.99999}}}}"""
    val core = op match {
      case SimOp.Numerical => decay("1")
      case SimOp.Temporal => decay("1d")
      case SimOp.Spatial => decay("100m")
      case SimOp.Categorical | SimOp.Textual =>
        s"""{ "match": { "$valCol": "$value" } }"""
    }
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
    val resp = RestClient.post(s"$baseUrl/$index/_search", body, headers)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hits = mapper.readTree(resp).path("hits").path("hits")
    val rows = hits.elements().asScala.map { h =>
      val src = h.path("_source")
      (src.path(keyCol).asText(), src.path(valCol).asText(),
        h.path("_score").asDouble())
    }.toSeq
    import spark.implicits._
    rows.toDF("id", "value", "score")
  }

  /** The ES attribute as a facet for a MIXED query (in-situ + ingested
    * attributes aggregated together): its ranked list becomes a pre-scored
    * no-random-access [[graft.operators.BoundFacet]] — candidates outside
    * the list score 0, the reference's NRA restriction for REST sources.
    *
    * Score comparability: the decay operations (Numerical/Temporal/
    * Spatial) already yield `function_score` values in (0, 1], directly
    * comparable with ingested facets' decayed similarities. A `match`
    * query's BM25 _score is UNBOUNDED (routinely 2-15), so for
    * Categorical/Textual the list is max-normalized (score / top score)
    * into (0, 1] — otherwise the ES facet would swamp every ingested
    * facet regardless of weights. */
  def facet(spark: SparkSession, baseUrl: String, index: String, op: SimOp,
      keyCol: String, valCol: String, value: String, m: Int,
      weightPerCombo: Seq[Double], filter: Option[String] = None,
      headers: Map[String, String] = Map.empty,
      window: Int = 10000): graft.operators.BoundFacet = {
    import org.apache.spark.sql.functions.{broadcast, col, max, when}
    val ranked = topM(spark, baseUrl, index, op, keyCol, valCol, value, m,
      filter, headers, window)
    val scored = op match {
      case SimOp.Categorical | SimOp.Textual =>
        val top = ranked.agg(max(col("score")).as("top"))
        ranked.crossJoin(broadcast(top))
          .select(col("id"),
            when(col("top") > 0, col("score") / col("top")).otherwise(0.0).as("d"))
      case _ => ranked.select(col("id"), col("score").as("d"))
    }
    graft.operators.BoundFacet(valCol, scored, weightPerCombo, preScored = true)
  }
}
