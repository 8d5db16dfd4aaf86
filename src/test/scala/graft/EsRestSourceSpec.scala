package graft

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.api.SimOp
import graft.sources.EsRestSource

/** The ES in-situ client (S9/Q7) against a stub _search endpoint: the DSL
  * the client emits must match the reference's templates, and the hit
  * parsing must yield the ranked (id, value, score) frame. The stub stands
  * in for Elasticsearch (none exists in the build env); the client under
  * test is the real one. */
class EsRestSourceSpec extends SparkTestBase {

  private val mapper = new ObjectMapper()

  /** Start a stub ES endpoint capturing request bodies and returning a
    * canned hits payload. Returns (port, receivedBodies, stop). */
  private def stubEs(hitsJson: String): (Int, java.util.List[String], () => Unit) = {
    val received = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/articles/_search", (x: HttpExchange) => {
      received.add(new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      val out = hitsJson.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(200, out.length)
      x.getResponseBody.write(out)
      x.close()
    })
    server.start()
    (server.getAddress.getPort, received, () => server.stop(0))
  }

  private val cannedHits =
    """{"hits": {"total": {"value": 3}, "hits": [
      |  {"_id": "a1", "_score": 0.97, "_source": {"article_id": "a1", "positive_sentiment": "3.9"}},
      |  {"_id": "a2", "_score": 0.85, "_source": {"article_id": "a2", "positive_sentiment": "3.1"}},
      |  {"_id": "a3", "_score": 0.41, "_source": {"article_id": "a3", "positive_sentiment": "1.2"}}
      |]}}""".stripMargin

  test("numerical/temporal/spatial queries emit the reference's function_score decay DSL") {
    val (port, received, stop) = stubEs(cannedHits)
    try {
      val df = EsRestSource.topM(spark, s"http://127.0.0.1:$port", "articles",
        SimOp.Numerical, "article_id", "positive_sentiment", "3.95", 50)
      val rows = df.collect().map(r => (r.getString(0), r.getDouble(2)))
      assert(rows.toSeq == Seq(("a1", 0.97), ("a2", 0.85), ("a3", 0.41)))

      val q = mapper.readTree(received.get(0))
      assert(q.get("size").asInt() == 50)
      assert(q.get("_source").get(0).asText() == "article_id")
      val exp = q.get("query").get("function_score").get("exp").get("positive_sentiment")
      assert(exp.get("origin").asText() == "3.95" && exp.get("scale").asText() == "1")
      assert(math.abs(exp.get("decay").asDouble() - 0.99999) < 1e-12)

      // temporal and spatial differ only in the scale unit
      val qt = mapper.readTree(EsRestSource.buildQuery(
        SimOp.Temporal, "article_id", "timestamp", "2019-11-04 08:45:00", 10))
      assert(qt.get("query").get("function_score").get("exp")
        .get("timestamp").get("scale").asText() == "1d")
      val qs = mapper.readTree(EsRestSource.buildQuery(
        SimOp.Spatial, "article_id", "position", "POINT(-74.94 42.15)", 10))
      assert(qs.get("query").get("function_score").get("exp")
        .get("position").get("scale").asText() == "100m")
    } finally stop()
  }

  test("categorical/textual queries emit match; object filters wrap in bool/filter; junk filters are ignored") {
    val q = mapper.readTree(EsRestSource.buildQuery(
      SimOp.Categorical, "article_id", "persons", "joe biden", 25))
    assert(q.get("query").get("match").get("persons").asText() == "joe biden")

    val f = """{"term": {"source": "cnn"}}"""
    val qf = mapper.readTree(EsRestSource.buildQuery(
      SimOp.Textual, "article_id", "persons", "joe biden", 25, Some(f)))
    val b = qf.get("query").get("bool")
    assert(b.get("must").get(0).get("match") != null)
    assert(b.get("filter").get("term").get("source").asText() == "cnn")

    // non-object/array filter: ignored with a notice, not injected
    val qj = mapper.readTree(EsRestSource.buildQuery(
      SimOp.Textual, "article_id", "persons", "joe biden", 25, Some("source = cnn")))
    assert(qj.get("query").get("match") != null && qj.get("query").get("bool") == null)
  }

  test("request size clamps to max_result_window; settings discovery parses the index setting") {
    val (port, received, stop) = stubEs(cannedHits)
    val server2 = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server2.createContext("/articles/_settings", (x: HttpExchange) => {
      val out = ("""{"articles": {"settings": {"index": """ +
        """{"max_result_window": "2500", "number_of_shards": "1"}}}}""")
        .getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(200, out.length); x.getResponseBody.write(out); x.close()
    })
    server2.start()
    try {
      val window = EsRestSource.maxResultWindow(
        s"http://127.0.0.1:${server2.getAddress.getPort}", "articles")
      assert(window == 2500)
      // unreachable settings endpoint -> ES default
      assert(EsRestSource.maxResultWindow("http://127.0.0.1:1", "articles") == 10000)

      EsRestSource.topM(spark, s"http://127.0.0.1:$port", "articles",
        SimOp.Numerical, "article_id", "positive_sentiment", "3.95", 50000,
        window = window)
      val q = mapper.readTree(received.get(received.size() - 1))
      assert(q.get("size").asInt() == 2500, "size must clamp to the window")
    } finally { stop(); server2.stop(0) }
  }

  test("quotes in the query value are escaped, not spliced raw into the body") {
    val q = mapper.readTree(EsRestSource.buildQuery(
      SimOp.Textual, "article_id", "persons", """say "hello" \now""", 5))
    assert(q.get("query").get("match").get("persons").asText() == """say "hello" \now""")
  }

  test("mixed query: an ES facet aggregates with a local facet; an id the " +
    "index does not know yields no lookup row => similarity 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ranked: a1 .97, a2 .85, a3 .41; a4 exists only locally — its lookup
    // finds nothing, so its ES contribution is 0 (missing-value contract)
    val (port, _, stop) = scoringStub(Seq("a1" -> 0.97, "a2" -> 0.85, "a3" -> 0.41))
    try {
      val esFacet = EsRestSource.facet(spark, s"http://127.0.0.1:$port", "articles",
        SimOp.Numerical, "article_id", "positive_sentiment", "3.95", 50, Seq(0.5))
      val local = graft.operators.BoundFacet("local",
        Seq(("a1", 4.0), ("a2", 0.0), ("a4", 1.0)).toDF("id", "d"),
        Seq(0.5), scale = Some(1.0))
      val got = graft.operators.RankAggregate
        .topK(spark, Seq(local, esFacet), 10, 10)
        .select("id", "score").as[(String, Double)].collect().toMap
      // a2: local sim exp(-0.05*0) = 1, ES 0.85 -> (0.5*1 + 0.5*0.85)
      assert(got("a2") == 0.925)
      // a3: ES only (0.41/2); a4: local only (exp(-0.05)/2)
      assert(got("a3") == 0.205)
      assert(got.keySet == Set("a1", "a2", "a3", "a4"))
    } finally stop()
  }

  test("match-query facets are max-normalized into (0,1]; decay facets pass through") {
    // BM25-like unbounded scores for a match (Textual) query
    val bm25Hits =
      """{"hits": {"hits": [
        |  {"_score": 8.4, "_source": {"article_id": "a1", "persons": "x"}},
        |  {"_score": 4.2, "_source": {"article_id": "a2", "persons": "y"}},
        |  {"_score": 2.1, "_source": {"article_id": "a3", "persons": "z"}}
        |]}}""".stripMargin
    val (port, _, stop) = stubEs(bm25Hits)
    try {
      val f = EsRestSource.facet(spark, s"http://127.0.0.1:$port", "articles",
        SimOp.Textual, "article_id", "persons", "joe", 10, Seq(1.0))
      val got = f.dist.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got("a1") == 1.0 && got("a2") == 0.5 && got("a3") == 0.25)
      // decay ops keep the raw (already (0,1]) function_score values
      val fd = EsRestSource.facet(spark, s"http://127.0.0.1:$port", "articles",
        SimOp.Numerical, "article_id", "persons", "1", 10, Seq(1.0))
      val gd = fd.dist.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(gd("a1") == 8.4) // pass-through (stub score; real decay <= 1)
    } finally stop()
  }

  /** A stub that actually SERVES queries over a tiny corpus: the main
    * ranked query returns the top-`size` ids by score; a lookup body (bool
    * + terms filter on article_id) returns exactly the requested ids'
    * scores — what a real ES does for a filter-context restriction. */
  private def scoringStub(corpus: Seq[(String, Double)])
      : (Int, java.util.List[String], () => Unit) = {
    val received = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val byId = corpus.toMap
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/articles/_search", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      received.add(body)
      val root = mapper.readTree(body)
      val terms = root.path("query").path("bool").path("filter").path(0)
        .path("terms").path("article_id")
      val hits =
        if (terms.isArray) {
          import scala.jdk.CollectionConverters._
          terms.elements().asScala.map(_.asText()).toSeq
            .flatMap(id => byId.get(id).map(id -> _))
        } else {
          val size = root.path("size").asInt(10)
          corpus.sortBy(-_._2).take(size)
        }
      val out = hits.map { case (id, s) =>
        s"""{"_score": $s, "_source": {"article_id": "$id", "v": "x"}}"""
      }.mkString("""{"hits": {"hits": [""", ",", "]}}").getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(200, out.length)
      x.getResponseBody.write(out)
      x.close()
    })
    server.start()
    (server.getAddress.getPort, received, () => server.stop(0))
  }

  test("Q7: random access completes the ES list — a mixed-query candidate " +
    "outside the M-list gets its exact looked-up score (IValueFinder parity)") {
    import spark.implicits._
    // ES knows a1 .9, a2 .8, a3 .7; the facet's bounded list holds only the
    // top 2, so a3's ES knowledge exists ONLY via the terms lookup
    val (port, received, stop) = scoringStub(Seq("a1" -> 0.9, "a2" -> 0.8, "a3" -> 0.7))
    try {
      val esFacet = EsRestSource.facet(spark, s"http://127.0.0.1:$port", "articles",
        SimOp.Numerical, "article_id", "v", "5", m = 2, Seq(0.5))
      assert(esFacet.dist.count() == 2, "the bounded list must hold m = 2 rows")
      val local = graft.operators.BoundFacet("local",
        Seq(("a3", 0.0)).toDF("id", "d"), Seq(0.5), scale = Some(1.0))
      val got = graft.operators.RankAggregate
        .topK(spark, Seq(local, esFacet), 3, 10)
        .select("id", "score").as[(String, Double)].collect().toMap
      // a3: local 1.0 (d = 0), ES 0.7 via lookup -> 0.85. Pure NRA would
      // have scored it 0.5 (ES contribution 0) — the old round-8 semantics.
      assert(got("a3") == 0.85, s"lookup did not complete the ES list: $got")
      assert(got("a1") == 0.45 && got("a2") == 0.4)
      // the wire shows a second, terms-restricted request for exactly a3
      val lookupBodies = received.asInstanceOf[java.util.List[String]]
      import scala.jdk.CollectionConverters._
      val termsReqs = lookupBodies.asScala.filter(_.contains("\"terms\""))
      assert(termsReqs.size == 1)
      val tq = mapper.readTree(termsReqs.head)
      assert(tq.path("query").path("bool").path("filter").path(0)
        .path("terms").path("article_id").path(0).asText() == "a3")
      // the scoring core rides along so the lookup scores on the SAME basis
      assert(tq.path("query").path("bool").path("must").path(0)
        .path("function_score").isObject)
    } finally stop()
  }

  test("Q7: looked-up match scores normalize against the MAIN list's top, " +
    "sharing one scale; user filter contexts compose into the lookup") {
    import spark.implicits._
    val (port, _, stop) = scoringStub(Seq("a1" -> 8.0, "a2" -> 4.0, "a3" -> 2.0))
    try {
      val esFacet = EsRestSource.facet(spark, s"http://127.0.0.1:$port", "articles",
        SimOp.Textual, "article_id", "v", "joe", m = 2, Seq(1.0))
      // main list max-normalized: a1 1.0, a2 0.5
      val listScores = esFacet.dist.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(listScores == Map("a1" -> 1.0, "a2" -> 0.5))
      // lookup of a3 (BM25 2.0) normalizes by the main top 8.0, not by its
      // own chunk's max — one scale across both row sources
      val looked = esFacet.lookup.get(Seq("a3")).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(looked == Map("a3" -> 0.25), looked.toString)
      // filter context composes: terms AND the user's object filter
      val body = EsRestSource.buildLookupQuery(SimOp.Textual, "article_id", "v",
        "joe", Seq("a3"), Some("""{"term": {"source": "cnn"}}"""))
      val q = mapper.readTree(body)
      assert(q.path("query").path("bool").path("filter").path(0).path("terms").isObject)
      assert(q.path("query").path("bool").path("filter").path(1).path("term")
        .path("source").asText() == "cnn")
      // an ARRAY-form filter splices element-wise after the terms clause —
      // ES rejects an array nested inside a bool filter array, so the main
      // query's accepted array filter must not fail at the lookup step
      val arr = EsRestSource.buildLookupQuery(SimOp.Textual, "article_id", "v",
        "joe", Seq("a3"),
        Some("""[{"term": {"source": "cnn"}}, {"term": {"lang": "en"}}]"""))
      val fa = mapper.readTree(arr).path("query").path("bool").path("filter")
      assert(fa.isArray && fa.size == 3, arr)
      assert(fa.path(0).path("terms").isObject)
      assert(fa.path(1).path("term").path("source").asText() == "cnn")
      assert(fa.path(2).path("term").path("lang").asText() == "en")
      // degenerate empty array filter stays a bare terms clause
      val emptyF = EsRestSource.buildLookupQuery(SimOp.Textual, "article_id", "v",
        "joe", Seq("a3"), Some("[]"))
      assert(mapper.readTree(emptyF).path("query").path("bool").path("filter").size == 1)
    } finally stop()
  }

  test("a non-200 endpoint raises instead of returning an empty frame") {
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/articles/_search", (x: HttpExchange) => {
      val out = """{"error": "index_not_found"}""".getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(404, out.length); x.getResponseBody.write(out); x.close()
    })
    server.start()
    try {
      val e = intercept[java.io.IOException] {
        EsRestSource.topM(spark, s"http://127.0.0.1:${server.getAddress.getPort}",
          "articles", SimOp.Numerical, "article_id", "v", "1", 5)
      }
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }
}
