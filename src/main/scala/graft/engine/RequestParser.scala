package graft.engine

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.engine.SimSearchEngine.SearchSpec
import graft.sources.CsvMount.MountSpec

/** JSON request parsing for the reference's mount/search request shapes
  * (§1.3 of SURVEY.md; reference: request/MountRequest.java,
  * request/SearchRequest.java) — the committed fixture files replay
  * directly through this parser.
  */
object RequestParser {

  private val mapper = new ObjectMapper()

  private def readFile(path: String): JsonNode =
    mapper.readTree(new java.io.File(path))

  /** Parse a mount request (sources.json shape). Returns
    * (sourceName -> directory, (sourceName, mount spec) pairs) so that a
    * multi-source request resolves each dataset against ITS OWN source
    * directory. Only csv sources are materialized here; jdbc sources map to
    * JdbcMount (S7/S8). */
  def parseMount(path: String): (Map[String, String], Seq[(String, MountSpec)]) = {
    val root = readFile(path)
    val dirs = root.get("sources").elements().asScala.map { s =>
      s.get("name").asText() -> s.get("directory").asText()
    }.toMap
    val specs = root.get("search").elements().asScala.map { m =>
      def opt(field: String): Option[String] =
        Option(m.get(field)).map(_.asText()).filter(_.nonEmpty)
      val searchCols = m.get("search_column") match {
        case a if a.isArray => a.elements().asScala.map(_.asText()).toSeq
        case v => Seq(v.asText())
      }
      m.get("source").asText() -> MountSpec(
        operation = m.get("operation").asText(),
        dataset = m.get("dataset").asText(),
        keyColumn = m.get("key_column").asText(),
        searchColumns = searchCols,
        aliasColumn = opt("alias_column"),
        separator = opt("separator").getOrElse(","),
        tokenDelimiter = opt("token_delimiter").getOrElse(";"),
        header = opt("header").forall(_.toBoolean),
        qgram = opt("qgram").map(_.toInt).getOrElse(3),
        normalized = opt("normalized"),
        maxLines = opt("max_lines").map(_.toInt))
    }.toSeq
    (dirs, specs)
  }

  /** Parse a search request (search.json shape): (k, algorithm, specs,
    * extraColumns). Values may be strings or arrays (token sets); weights
    * are decimal strings, one per combination. */
  def parseSearch(path: String): (Int, String, Seq[SearchSpec], Seq[String]) = {
    val root = readFile(path)
    val k = root.get("k").asText().toInt
    val algorithm = Option(root.get("algorithm")).map(_.asText()).getOrElse("threshold")
    val extras = Option(root.get("output"))
      .flatMap(o => Option(o.get("extra_columns")))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    val specs = root.get("queries").elements().asScala.map { q =>
      val value: Any = q.get("value") match {
        case a if a.isArray => a.elements().asScala.map(_.asText()).toSeq
        case v if v.isNumber => v.asDouble()
        case v => v.asText()
      }
      val weights = Option(q.get("weights"))
        .map(_.elements().asScala.map(_.asText().toDouble).toSeq).getOrElse(Seq.empty)
      SearchSpec(q.get("column").asText(), value, weights,
        decay = Option(q.get("decay")).map(_.asDouble())
          .getOrElse(graft.functions.SimKernels.DefaultDecay),
        scale = Option(q.get("scale")).map(_.asDouble()))
    }.toSeq
    (k, algorithm, specs, extras)
  }
}
