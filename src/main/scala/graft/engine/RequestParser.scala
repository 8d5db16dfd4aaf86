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

  /** A fully-routed mount request: csv datasets resolved against their
    * source directories, jdbc datasets routed to [[graft.sources.JdbcMount]]
    * specs (the reference's multi-source request shape mixes both —
    * data/gdelt/service/simsearch-multiple-sources.py:11). */
  final case class MountRequest(
      dirs: Map[String, String],
      csv: Seq[(String, MountSpec)],
      jdbc: Seq[graft.sources.JdbcMount.JdbcSpec])

  /** Parse a mount request (sources.json shape), routing each search entry
    * to its source's mount path: csv -> (directory, MountSpec), jdbc ->
    * JdbcSpec (S7/S8). A search entry referencing a source of any other
    * type (restapi/simsearch are declared out of scope) fails with a clear
    * message instead of an NPE on the missing `directory` field. */
  def parseMountRequest(path: String): MountRequest = {
    val root = readFile(path)
    val sources = root.get("sources").elements().asScala.toSeq
    def srcType(s: JsonNode): String =
      Option(s.get("type")).map(_.asText()).getOrElse("csv")
    def srcOpt(s: JsonNode, field: String): Option[String] =
      Option(s.get(field)).map(_.asText()).filter(_.nonEmpty)
    val dirs = sources.filter(srcType(_) == "csv").map { s =>
      val name = s.get("name").asText()
      name -> srcOpt(s, "directory").getOrElse(
        throw new IllegalArgumentException(s"csv source '$name' has no directory"))
    }.toMap
    val jdbcSources = sources.filter(srcType(_) == "jdbc")
      .map(s => s.get("name").asText() -> s).toMap
    val typeOf = sources.map(s => s.get("name").asText() -> srcType(s)).toMap

    val csvSpecs = scala.collection.mutable.ArrayBuffer[(String, MountSpec)]()
    val jdbcSpecs = scala.collection.mutable.ArrayBuffer[graft.sources.JdbcMount.JdbcSpec]()
    root.get("search").elements().asScala.foreach { m =>
      def opt(field: String): Option[String] =
        Option(m.get(field)).map(_.asText()).filter(_.nonEmpty)
      val searchCols = m.get("search_column") match {
        case a if a.isArray => a.elements().asScala.map(_.asText()).toSeq
        case v => Seq(v.asText())
      }
      val src = m.get("source").asText()
      if (dirs.contains(src)) {
        csvSpecs += src -> MountSpec(
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
      } else jdbcSources.get(src) match {
        case Some(j) =>
          jdbcSpecs += graft.sources.JdbcMount.JdbcSpec(
            url = srcOpt(j, "url").getOrElse(
              throw new IllegalArgumentException(s"jdbc source '$src' has no url")),
            table = m.get("dataset").asText(),
            keyColumn = opt("key_column").getOrElse("id"),
            valueColumn = searchCols.head,
            operation = m.get("operation").asText(),
            driver = srcOpt(j, "driver"),
            user = srcOpt(j, "username"),
            password = srcOpt(j, "password"),
            tokenDelimiter = opt("token_delimiter").getOrElse(","),
            qgram = opt("qgram").map(_.toInt).getOrElse(3))
        case None => throw new IllegalArgumentException(
          s"search entry references source '$src' of unsupported type " +
            s"'${typeOf.getOrElse(src, "undeclared")}' (supported: csv, jdbc)")
      }
    }
    MountRequest(dirs, csvSpecs.toSeq, jdbcSpecs.toSeq)
  }

  /** Back-compat view of [[parseMountRequest]]: the csv part only. */
  def parseMount(path: String): (Map[String, String], Seq[(String, MountSpec)]) = {
    val r = parseMountRequest(path)
    (r.dirs, r.csv)
  }

  /** Parse AND mount a whole request — the one mount-routing implementation
    * shared by the REST /index and /append handlers and the standalone
    * terminal. */
  def mountAll(spark: org.apache.spark.sql.SparkSession, path: String): Seq[graft.api.Facet] = {
    val req = parseMountRequest(path)
    req.csv.map { case (source, spec) =>
      graft.sources.CsvMount.mount(spark, req.dirs(source), spec)
    } ++ req.jdbc.map(graft.sources.JdbcMount.mount(spark, _))
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
