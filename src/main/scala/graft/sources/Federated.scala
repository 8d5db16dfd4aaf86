package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Federated similarity search (SURVEY §2 S10/Q8): fan a search request out
  * to remote graft REST instances and rank-merge their responses — the
  * rebuild of the reference's federated SimSearch source, which forwards
  * the query to other SimSearch deployments and aggregates the partial
  * ranked lists.
  *
  * Semantics: for a HORIZONTALLY sharded corpus (each entity's attributes
  * live wholly in one instance), every globally-top-k entity is in its own
  * shard's local top-k, so the merge (union -> sort by (score desc, id) ->
  * take k) is EXACT — provided all shards score on a COMMON decay scale.
  * That common scale is pinned automatically: [[search]] runs a two-phase
  * negotiation by default (collect per-shard top-k candidate distances,
  * pin the global single-instance calibration scale, re-score), so a
  * sharded deployment is exact out of the box; explicit per-facet `scale`
  * values in the request skip the negotiation, and peers without the
  * `/calibrate` endpoint degrade to the reference's approximate
  * self-calibrated merge with a notice.
  *
  * Scale design: the coordinator handles only ranked lists (<= k x combos
  * rows per instance, k <= 50) — never shard data; all heavy work stays
  * inside the remote instances' own Spark plans.
  */
object Federated {

  /** `extraHeaders` carries additional auth (e.g. HTTP basic credentials
    * from a restapi mount declaration) alongside the api_key header. A
    * mount declared with only username/password has no api_key — sending
    * an empty `api_key` header would make the peer 401 the request, so
    * the header is omitted entirely when the key is blank. */
  final case class Instance(baseUrl: String, apiKey: String,
      extraHeaders: Map[String, String] = Map.empty) {
    def headers: Map[String, String] =
      (if (apiKey.nonEmpty) Map("api_key" -> apiKey)
       else Map.empty[String, String]) ++ extraHeaders
  }

  /** A remote instance's attribute as a facet for a LOCAL mixed query —
    * the reference's federated in-situ path: POST the singleton query
    * template `{k=M, queries:[{column, value, weights:[1.0]}]}` (reference:
    * insitu/SimSearchRestQuery.java:92) and wrap the returned ranked list
    * as a pre-scored no-random-access BoundFacet. The remote's scores are
    * decayed similarities in (0,1], directly comparable with local facets;
    * entities outside the list score 0 (the reference's NRA restriction
    * for federated sources, SearchHandler.java:296-307). `valueJson` is
    * the JSON literal for the query value (e.g. `"\"max\""` or
    * `"[\"a\",\"b\"]"`). */
  def facet(spark: SparkSession, instance: Instance, column: String,
      valueJson: String, m: Int,
      weightPerCombo: Seq[Double]): graft.operators.BoundFacet = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("k", m.toString)
    val q = root.putArray("queries").addObject()
    q.put("column", column)
    q.set("value", mapper.readTree(valueJson))
    q.putArray("weights").add("1.0")
    val resp = mapper.readTree(RestClient.post(s"${instance.baseUrl}/search",
      mapper.writeValueAsString(root), instance.headers))
    require(resp.isArray && resp.size() >= 1,
      s"federated instance ${instance.baseUrl} returned no result list: ${resp.toString.take(200)}")
    val rows = resp.get(0).get("rankedResults").elements().asScala
      .map(n => (n.get("id").asText(), n.get("score").asDouble())).toSeq
    import spark.implicits._
    graft.operators.BoundFacet(column, rows.toDF("id", "d"),
      weightPerCombo, preScored = true)
  }

  /** Run `searchJson` (the reference's search-request shape) against every
    * instance IN PARALLEL and merge: per weight combination, union the
    * ranked lists, keep each id's best score, rank by (score desc, id),
    * take k. Output columns: (combo, rank, id, score) — the engine's
    * shape. Any failing instance, and any instance whose response is not
    * an array of the same combo count as the others, raises — a silent
    * partial merge would misreport the global ranking.
    *
    * EXACT BY DEFAULT: when the request pins no per-facet `scale` values,
    * a two-phase negotiation first asks every shard for its local top-k
    * candidate distances per facet (`/calibrate`) and pins the GLOBAL
    * calibration scale — k times the k-th smallest of the merged distance
    * lists, which is exactly the scale a single instance over the union
    * corpus would compute, since the union's k smallest distances are
    * contained in the union of the per-shard k smallest. Every shard then
    * scores on that one common scale and the rank merge is exact,
    * matching the unsharded deployment score for score (FederatedSpec).
    * When any peer lacks `/calibrate` (e.g. a reference instance), the
    * merge falls back to the reference's one-phase behavior — each shard
    * self-calibrates and the result is approximate — with a NOTICE, not a
    * failure. `negotiate = false` forces the one-phase mode. */
  def search(spark: SparkSession, instances: Seq[Instance], searchJson: String,
      negotiate: Boolean = true): DataFrame = {
    require(instances.nonEmpty, "federated search needs at least one instance")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = mapper.readTree(searchJson)
    val needsScale = Option(parsed.get("queries")).toSeq
      .flatMap(_.elements().asScala)
      .exists(q => q.get("scale") == null)
    val body =
      if (negotiate && needsScale && instances.size > 1)
        negotiateScales(mapper, instances, searchJson)
      else searchJson
    searchPinned(spark, instances, mapper, body)
  }

  /** Phase 1: collect per-shard calibration distances and pin global
    * scales into the request. Returns the original request untouched when
    * any shard cannot calibrate. */
  private def negotiateScales(mapper: com.fasterxml.jackson.databind.ObjectMapper,
      instances: Seq[Instance], searchJson: String): String = {
    val calibs = instances.map { i =>
      scala.util.Try(mapper.readTree(
        RestClient.post(s"${i.baseUrl}/calibrate", searchJson, i.headers)))
    }
    if (calibs.exists(_.isFailure)) {
      System.err.println("NOTICE: a federated instance does not support " +
        "/calibrate; falling back to per-shard self-calibration " +
        "(approximate merge, the reference behavior).")
      return searchJson
    }
    // facets are keyed by QUERY INDEX (two specs over the same column have
    // different distance distributions and must not collapse); a peer
    // whose /calibrate predates index keying cannot be matched soundly —
    // degrade to self-calibration like a /calibrate-less peer
    val allFacets = calibs.flatMap(
      _.get.path("facets").elements().asScala.toSeq)
    if (allFacets.exists(f => f.get("index") == null)) {
      System.err.println("NOTICE: a federated instance speaks a pre-index " +
        "/calibrate dialect; falling back to per-shard self-calibration " +
        "(approximate merge, the reference behavior).")
      return searchJson
    }
    val merged: Map[Int, Seq[Double]] = allFacets
      .map(f => f.get("index").asInt() ->
        f.get("distances").elements().asScala.map(_.asDouble()).toSeq)
      .groupBy(_._1).map { case (i, ls) => i -> ls.flatMap(_._2) }
    val root = mapper.readTree(searchJson)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val k = root.get("k").asText().toInt
    root.get("queries").elements().asScala.zipWithIndex.foreach { case (q, i) =>
      if (q.get("scale") == null) merged.get(i).filter(_.nonEmpty).foreach { ds =>
        // the single-instance formula: k * d_k, with the degenerate
        // all-zero-distance guard (SimSearchEngine calibration)
        val dk = ds.sorted.take(k).last
        q.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("scale", if (dk <= 0.0) 1.0 else k * dk)
      }
    }
    mapper.writeValueAsString(root)
  }

  private def searchPinned(spark: SparkSession, instances: Seq[Instance],
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      searchJson: String): DataFrame = {
    val k = mapper.readTree(searchJson).get("k").asText().toInt
    // fan-out: the shards run their Spark plans concurrently, so the
    // coordinator pays max(shard latency), not the sum
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val responses = Await.result(
      Future.sequence(instances.map(i => Future(
        mapper.readTree(RestClient.post(s"${i.baseUrl}/search", searchJson,
          i.headers))))),
      scala.concurrent.duration.Duration.Inf)
    responses.zip(instances).foreach { case (r, i) =>
      if (!r.isArray)
        throw new java.io.IOException(
          s"federated instance ${i.baseUrl} returned a non-array response: ${r.toString.take(200)}")
    }
    val nCombos = responses.head.size()
    responses.zip(instances).foreach { case (r, i) =>
      if (r.size() != nCombos)
        throw new java.io.IOException(
          s"federated instance ${i.baseUrl} returned ${r.size()} combos, expected $nCombos")
    }
    val rows = (0 until nCombos).flatMap { c =>
      val merged = responses
        .flatMap(_.get(c).get("rankedResults").elements().asScala
          .map(n => (n.get("id").asText(), n.get("score").asDouble())))
        .groupBy(_._1).map { case (id, vs) => (id, vs.map(_._2).max) }.toSeq
      merged.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, score), i) => (c.toLong, (i + 1).toLong, id, score)
      }
    }
    import spark.implicits._
    rows.toDF("combo", "rank", "id", "score")
  }
}
