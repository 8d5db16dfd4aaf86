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
  * Two execution paths, chosen by capability:
  *
  *  - **In-situ pushdown (Q6 at scale)** — for operations whose distance is
  *    expressible in portable SQL (numerical always; temporal where the
  *    dialect has an epoch expression), the per-query top-M is composed as a
  *    remote statement `SELECT key AS id, ABS(value - q) AS d FROM table
  *    WHERE value IS NOT NULL [AND filter] ORDER BY d, id LIMIT m` — the
  *    Spark analogue of the reference's per-dialect templates
  *    (insitu/SimSearchJdbcQuery.java:119-177,374-382). Only M rows ever
  *    cross the wire per query, so the plan survives a 100× remote table.
  *    [[mountInSitu]] wires this as an engine
  *    [[graft.engine.SimSearchEngine.InSituFacet]].
  *
  *  - **Spark-side kernels** — ingest=true mounts, and operations whose
  *    similarity needs more than portable SQL (categorical/textual Jaccard —
  *    the reference needs DB extensions like pg_trgm/jsonb for those), load
  *    the (id, value) frame and run the [[SimKernels]] in Spark. Column
  *    pruning (P1), boolean pre-filters (P2/P3) and IS NOT NULL guards (P4)
  *    still push into the remote WHERE via Catalyst.
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

  /** @param keepRaw also retain the remote table's raw columns (minus any
    *   literally named id/value) alongside the typed (id, value) pair, so a
    *   query-time boolean filter written against REMOTE column names — the
    *   form the pushed path forwards verbatim — evaluates on the local
    *   kernel path too. Used by [[mountInSitu]]'s local twin. */
  def mount(spark: SparkSession, spec: JdbcSpec, keepRaw: Boolean = false): Facet = {
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
    // remote query (SELECT key, value ... WHERE value IS NOT NULL). Extra
    // raw columns (keepRaw) are referenced only by query-time filters, so
    // Catalyst still prunes them out of the remote scan when unused.
    val extras = if (!keepRaw) Seq.empty
      else raw.columns.toSeq
        .filterNot(c => c.equalsIgnoreCase("id") || c.equalsIgnoreCase("value"))
        .map(col)
    var df = raw.select(id +: valueExpr.as("value") +: extras: _*)
      .na.drop(Seq("id", "value"))
    if (spec.ingest) df = df.cache() // S8
    Facet(AttributeSpec(spec.valueColumn, op, spec.tokenDelimiter, spec.qgram), df)
  }

  /** Per-dialect row-limit syntax for the pushed top-M statement (the
    * reference keeps one SQL template per supported DBMS,
    * insitu/SimSearchJdbcQuery.java:374-382). Default is the SQL-standard
    * FETCH FIRST (Derby, Oracle 12c+, DB2, H2). */
  private def limitClause(url: String, m: Int): String = {
    val u = url.toLowerCase
    if (u.startsWith("jdbc:postgresql") || u.startsWith("jdbc:mysql") ||
        u.startsWith("jdbc:mariadb") || u.startsWith("jdbc:sqlite")) s"LIMIT $m"
    else if (u.startsWith("jdbc:sqlserver")) s"OFFSET 0 ROWS FETCH NEXT $m ROWS ONLY"
    else s"FETCH FIRST $m ROWS ONLY"
  }

  /** Dialect spelling of "this column as a double" — `CAST(x AS DOUBLE)` is
    * NOT portable: Postgres only knows DOUBLE PRECISION, MySQL < 8.0.17 and
    * SQLite reject AS DOUBLE outright, Oracle's IEEE type is BINARY_DOUBLE.
    * MySQL/MariaDB use `(x + 0e0)` (a double-literal addition), valid on
    * every released version and yielding true double arithmetic. */
  private def numericCastExpr(url: String, column: String): String = {
    val u = url.toLowerCase
    if (u.startsWith("jdbc:postgresql")) s"CAST($column AS DOUBLE PRECISION)"
    else if (u.startsWith("jdbc:mysql") || u.startsWith("jdbc:mariadb")) s"($column + 0e0)"
    else if (u.startsWith("jdbc:sqlite")) s"CAST($column AS REAL)"
    else if (u.startsWith("jdbc:sqlserver")) s"CAST($column AS FLOAT)"
    else if (u.startsWith("jdbc:oracle")) s"CAST($column AS BINARY_DOUBLE)"
    else s"CAST($column AS DOUBLE)" // SQL standard: Derby, H2, DB2
  }

  /** Dialect expression converting a SQL timestamp column to epoch
    * milliseconds — the unit the temporal kernel scores in. None = the
    * dialect has no portable expression; the mount falls back to the
    * Spark-side kernel path.
    *
    * Time-zone contract: Postgres EXTRACT(EPOCH) and MySQL UNIX_TIMESTAMP
    * interpret a zone-less DATETIME/timestamp in the CONNECTION's session
    * time zone — deployments must pin it to UTC on the JDBC URL
    * (`?serverTimezone=UTC` / `options=-c%20TimeZone%3DUTC`) for remote
    * distances to equal the Spark-side epoch-ms kernel, which parses in
    * UTC. MySQL's UNIX_TIMESTAMP keeps the fractional-seconds part when the
    * column declares one (it returns DECIMAL for fsp > 0), so no precision
    * is lost versus Postgres' fraction-preserving EXTRACT. */
  private def epochMsExpr(url: String, column: String): Option[String] = {
    val u = url.toLowerCase
    if (u.startsWith("jdbc:postgresql"))
      Some(s"(EXTRACT(EPOCH FROM $column) * 1000)")
    else if (u.startsWith("jdbc:mysql") || u.startsWith("jdbc:mariadb"))
      Some(s"(UNIX_TIMESTAMP($column) * 1000.0)")
    else if (u.startsWith("jdbc:sqlserver"))
      // DATEDIFF_BIG (2016+): BIGINT milliseconds, no 2038 overflow, keeps
      // the datetime2 millisecond precision
      Some(s"DATEDIFF_BIG(MILLISECOND, '1970-01-01', $column)")
    else if (u.startsWith("jdbc:oracle")) {
      // timestamp - timestamp yields INTERVAL DAY TO SECOND; EXTRACT(SECOND)
      // keeps the fractional part, so sub-second precision survives
      val d = s"($column - TIMESTAMP '1970-01-01 00:00:00')"
      Some(s"((EXTRACT(DAY FROM $d) * 86400 + EXTRACT(HOUR FROM $d) * 3600 + " +
        s"EXTRACT(MINUTE FROM $d) * 60 + EXTRACT(SECOND FROM $d)) * 1000)")
    }
    else None
  }

  /** The id tie-break term of the pushed ORDER BY. For string keys the
    * remote's default collation (Postgres locale-aware, MySQL
    * case-insensitive) need not match Spark's binary UTF-8 order, so the
    * candidate list could differ from [[graft.operators.FacetSearch.topM]]
    * on distance ties at the M boundary — force a binary collation where
    * the dialect has one. Derby/H2/DB2 default to Unicode-codepoint order
    * (UCS_BASIC), which already equals UTF-8 byte order, and non-string
    * keys compare numerically everywhere, so those keep the plain ordinal. */
  private def idOrderTerm(url: String, keyColumn: String, keyIsString: Boolean): String = {
    val u = url.toLowerCase
    if (!keyIsString) "1"
    else if (u.startsWith("jdbc:postgresql")) s"""$keyColumn COLLATE "C""""
    else if (u.startsWith("jdbc:mysql") || u.startsWith("jdbc:mariadb")) s"BINARY $keyColumn"
    else if (u.startsWith("jdbc:sqlserver")) s"$keyColumn COLLATE Latin1_General_BIN2"
    else "1"
  }

  /** Whether this spec's per-query distance top-M can be composed as a
    * remote SQL statement. Categorical/textual Jaccard cannot — the
    * reference needs DB-side extensions (pg_trgm, jsonb) there; those
    * operations keep the Spark-side kernel path. */
  def supportsPushdown(spec: JdbcSpec): Boolean = spec.operation match {
    case "numerical_topk" => true
    case "temporal_topk"  => epochMsExpr(spec.url, spec.valueColumn).isDefined
    case _                => false
  }

  /** The remote top-M statement: distance + NOT-NULL guard + optional user
    * filter + ORDER BY (d, id) + dialect LIMIT, all evaluated in the
    * database. The user filter references the REMOTE table's columns (the
    * reference forwards in-situ filters verbatim to the source,
    * SearchHandler.java:707-713). Ordinal ORDER BY (2, 1) keeps the
    * statement portable across dialects that reject expression aliases in
    * ORDER BY, and the (d, id) tie-break makes the candidate list
    * deterministic — bit-identical to [[graft.operators.FacetSearch.topM]].
    */
  /** The remote distance expression for a pushed query: (value SQL, query
    * literal), shared by the top-M statement and the random-access lookup. */
  private def distParts(spec: JdbcSpec, value: Any): (String, String) = {
    def numLit(v: Any): String = v match {
      case "max" => s"(SELECT MAX(${numericCastExpr(spec.url, spec.valueColumn)}) FROM ${spec.table})" // F12
      case d: Double => d.toString
      case i: Int    => i.toDouble.toString
      case s: String => s.trim.toDouble.toString
      case bad => throw new IllegalArgumentException(s"bad numeric query $bad")
    }
    spec.operation match {
      case "numerical_topk" => (numericCastExpr(spec.url, spec.valueColumn), numLit(value))
      case "temporal_topk" =>
        val epochMs = value match {
          case s: String => CsvMount.parseDatetimeMs(s).getOrElse(
            throw new IllegalArgumentException(s"unparseable datetime $s"))
          case d: Double => d
          case other => throw new IllegalArgumentException(s"bad temporal query $other")
        }
        (epochMsExpr(spec.url, spec.valueColumn).get, epochMs.toString)
      case other => throw new IllegalArgumentException(
        s"operation $other has no SQL pushdown (use the Spark-side mount)")
    }
  }

  private[graft] def topMSql(spec: JdbcSpec, value: Any, m: Int,
      filter: Option[String], keyIsString: Boolean = false): String = {
    val (valueExpr, queryLit) = distParts(spec, value)
    val where = (s"${spec.valueColumn} IS NOT NULL" +: filter.map(f => s"($f)").toSeq)
      .mkString(" AND ")
    s"SELECT ${spec.keyColumn} AS id, ABS($valueExpr - $queryLit) AS d " +
      s"FROM ${spec.table} WHERE $where " +
      s"ORDER BY 2, ${idOrderTerm(spec.url, spec.keyColumn, keyIsString)} " +
      limitClause(spec.url, m)
  }

  /** Max ids per remote IN list (the classic dialect-safe bound). */
  private val LookupChunk = 1000

  /** One id as a SQL literal: numbers inline, anything else quoted with
    * doubled single-quotes. */
  private def idLit(v: Any): String = v match {
    case null => "NULL"
    case _: Int | _: Long | _: Short | _: Byte | _: Double | _: Float |
         _: java.math.BigDecimal => v.toString
    case other => "'" + other.toString.replace("'", "''") + "'"
  }

  /** The remote multi-value retrieval fired during random access — the
    * rebuild of the reference's `sqlMultiValuesRetrievalTemplate`
    * (insitu/SimSearchJdbcQuery.java:177, used at :216,332): fetch exact
    * (id, distance) rows for specific candidate ids, chunked into
    * [[LookupChunk]]-id IN lists. The facet's boolean filter applies here
    * too, so a candidate failing it contributes no row (score 0), matching
    * the local kernel path. */
  def lookupSql(spec: JdbcSpec, value: Any, ids: Seq[Any],
      filter: Option[String]): String = {
    val (valueExpr, queryLit) = distParts(spec, value)
    val where = (Seq(s"${spec.valueColumn} IS NOT NULL",
      s"${spec.keyColumn} IN (${ids.map(idLit).mkString(", ")})") ++
      filter.map(f => s"($f)")).mkString(" AND ")
    s"SELECT ${spec.keyColumn} AS id, ABS($valueExpr - $queryLit) AS d " +
      s"FROM ${spec.table} WHERE $where"
  }

  /** Remote VALUE retrieval for a bounded id set — the reference's
    * multi-value retrieval template with the value column in the SELECT
    * list (insitu/SimSearchJdbcQuery.java:175-177, incl. its
    * EXTRACT(EPOCH ...) temporal shape): (id, value) typed exactly like an
    * ingested mount (numerical = double, temporal = epoch ms), so the
    * similarity matrix's pairwise kernels apply unchanged. */
  def valuesFrame(spark: SparkSession, spec: JdbcSpec, ids: Seq[Any]): DataFrame = {
    require(ids.nonEmpty, "value retrieval needs at least one id")
    val valueExpr = spec.operation match {
      case "numerical_topk" => numericCastExpr(spec.url, spec.valueColumn)
      case "temporal_topk"  => epochMsExpr(spec.url, spec.valueColumn).getOrElse(
        throw new IllegalArgumentException(
          s"no epoch expression for ${spec.url} — temporal values not retrievable"))
      case other => throw new IllegalArgumentException(
        s"operation $other has no pushed value retrieval")
    }
    ids.grouped(LookupChunk).map { chunk =>
      val sql = s"SELECT ${spec.keyColumn} AS id, $valueExpr AS v " +
        s"FROM ${spec.table} WHERE ${spec.valueColumn} IS NOT NULL AND " +
        s"${spec.keyColumn} IN (${chunk.map(idLit).mkString(", ")})"
      val reader0 = spark.read.format("jdbc")
        .option("url", spec.url).option("query", sql)
      val reader1 = spec.driver.fold(reader0)(d => reader0.option("driver", d))
      val reader2 = spec.user.fold(reader1)(u => reader1.option("user", u))
      val reader = spec.password.fold(reader2)(p => reader2.option("password", p))
      reader.load().toDF("id", "value").withColumn("value", col("value").cast("double"))
    }.reduce(_ union _)
  }

  /** Execute the random-access lookup for a bounded candidate id set
    * (<= K_MAX * INFLATION_FACTOR * |facets| by construction). */
  def lookupFrame(spark: SparkSession, spec: JdbcSpec, value: Any,
      ids: Seq[Any], filter: Option[String]): DataFrame = {
    require(ids.nonEmpty, "random-access lookup needs at least one id")
    ids.grouped(LookupChunk).map { chunk =>
      val reader0 = spark.read.format("jdbc")
        .option("url", spec.url)
        .option("query", lookupSql(spec, value, chunk, filter))
      val reader1 = spec.driver.fold(reader0)(d => reader0.option("driver", d))
      val reader2 = spec.user.fold(reader1)(u => reader1.option("user", u))
      val reader = spec.password.fold(reader2)(p => reader2.option("password", p))
      reader.load().toDF("id", "d").withColumn("d", col("d").cast("double"))
    }.reduce(_ union _)
  }

  /** Execute the pushed top-M as a Spark JDBC read of [[topMSql]]. The
    * result is at most m rows of (id, d); a positional rename absorbs
    * dialect case-folding (Derby/Oracle return ID/D). */
  def topMFrame(spark: SparkSession, spec: JdbcSpec, value: Any, m: Int,
      filter: Option[String], keyIsString: Boolean = false): DataFrame = {
    val reader0 = spark.read.format("jdbc")
      .option("url", spec.url)
      .option("query", topMSql(spec, value, m, filter, keyIsString))
    val reader1 = spec.driver.fold(reader0)(d => reader0.option("driver", d))
    val reader2 = spec.user.fold(reader1)(u => reader1.option("user", u))
    val reader = spec.password.fold(reader2)(p => reader2.option("password", p))
    reader.load().toDF("id", "d").withColumn("d", col("d").cast("double"))
  }

  /** S7 with query-time pushdown: mount as an engine in-situ facet whose
    * `build` ships [[topMSql]] to the database — M rows per query cross the
    * wire instead of the whole column. The returned [[graft.operators.BoundFacet]]
    * is distance-based (preScored = false): the engine calibrates the decay
    * scale and estimates weights from the bounded list exactly as it does
    * for ingested facets, and the attached random-access [[lookupFrame]]
    * completes the list with exact distances for any mixed-query candidate
    * the M rows miss — so per-condition queries answer identically to the
    * Spark-side kernel path. A LAZY local twin (a keep-raw [[mount]], never
    * evaluated unless used) rides along as `local`: the engine routes
    * residual-filtered queries through it — a cross-attribute filter applied
    * AFTER the remote `LIMIT M` could starve the top-k, since eligible rows
    * ranked below M remotely never cross the wire — and the catalog serves
    * it for projection / filter references to this attribute. */
  def mountInSitu(spark: SparkSession, spec: JdbcSpec)
      : graft.engine.SimSearchEngine.InSituFacet = {
    require(supportsPushdown(spec),
      s"operation ${spec.operation} has no SQL pushdown for ${spec.url}")
    val twin = mount(spark, spec, keepRaw = true)
    val keyIsString =
      twin.df.schema("id").dataType == org.apache.spark.sql.types.StringType
    graft.engine.SimSearchEngine.InSituFacet(spec.valueColumn, spec.operation,
      (s, m) => graft.operators.BoundFacet(spec.valueColumn,
        topMFrame(spark, spec, s.value, m, s.filter, keyIsString),
        Seq(1.0), s.decay, scale = None, jaccard = false, preScored = false,
        lookup = Some(ids => lookupFrame(spark, spec, s.value, ids, s.filter))),
      values = Some(ids => valuesFrame(spark, spec, ids)),
      local = Some(twin))
  }
}
