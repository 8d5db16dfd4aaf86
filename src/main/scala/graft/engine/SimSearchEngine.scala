package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{Algorithm, Facet, Limits, Normalizer, SimOp}
import graft.functions.SimKernels
import graft.operators.{BoundFacet, FacetSearch, RankAggregate}
import graft.sources.CsvMount

/** The search front-end over a mounted catalog — the rebuild of the
  * reference's SearchHandler (reference: engine/SearchHandler.java:193-752).
  *
  * Execution (SURVEY.md §7.2): one distance stream per queried attribute,
  * per-facet top-M candidates, exact scoring of the candidate union, global
  * top-k per weight combination.
  */
object SimSearchEngine {

  /** One per-attribute query condition
    * (reference: request/SearchSpecs.java:8-26).
    * `value`: Double ("max" via string keyword F12), String (temporal /
    * textual / WKT point), or Seq[String] (token set).
    * `weights`: one entry per weight combination (R5). */
  final case class SearchSpec(
      column: String,
      value: Any,
      weights: Seq[Double],
      decay: Double = SimKernels.DefaultDecay,
      scale: Option[Double] = None,
      filter: Option[String] = None)

  /** An in-situ (no-random-access) mounted attribute — an ES index or a
    * remote federated instance reached over REST (S9/S10, reference:
    * Coordinator.java:325-359). No (id, value) frame exists locally; the
    * attribute's entire per-query knowledge is the pre-scored ranked list
    * its `build` function fetches at search time (the NRA restriction the
    * reference enforces for REST sources, SearchHandler.java:296-307).
    * `build(spec, m)` returns a preScored [[BoundFacet]] with placeholder
    * weights `Seq(1.0)`; [[search]] substitutes the real per-combo weights. */
  final case class InSituFacet(
      name: String,
      operation: String,
      build: (SearchSpec, Int) => graft.operators.BoundFacet,
      /** Random-access VALUE retrieval for sources that support it (S7
        * JDBC pushdown — the reference's single/multi-value retrieval
        * templates, insitu/SimSearchJdbcQuery.java:175-177): fetch the
        * typed (id, value) rows for a bounded id set, enabling the
        * similarity matrix (A5) over in-situ attributes. None = no value
        * access (REST NRA sources) — the matrix rejects those clearly. */
      values: Option[Seq[Any] => org.apache.spark.sql.DataFrame] = None,
      /** A LAZY Spark-side kernel twin of the in-situ attribute, where one
        * exists (S7 JDBC pushdown: the remote table is scannable, so the
        * twin is just an unevaluated JDBC frame). [[search]] routes
        * residual-filtered queries through it — the pushed `LIMIT M`
        * bounds the remote list BEFORE a cross-attribute filter could
        * apply, so filtering the bounded list can starve the top-k — and
        * [[Catalog.get]] serves it for projection / filter references.
        * None for REST sources, which genuinely have no scannable values
        * (the reference's hard NRA restriction). */
      local: Option[Facet] = None)

  /** Mounted-attribute catalog with listing (A8), append (the reference's
    * /append endpoint) and removal (A9). Holds both ingested facets
    * ((id, value) frames) and in-situ REST attributes. */
  final class Catalog(initial: Seq[Facet],
      initialInSitu: Seq[InSituFacet] = Seq.empty) {
    /** Per-instance settings — one per catalog, like the reference's
      * per-api_key Coordinator (InstanceSettings.java). */
    val settings = new graft.api.InstanceSettings
    // @volatile: the REST service handles requests on a pool, so a mount
    // on one thread must be visible to a search on another. Mutation is
    // reference-swap of immutable maps — a concurrent reader sees either
    // the old or the new catalog, never a torn one.
    @volatile private var facets: Map[String, Facet] =
      initial.map(f => f.spec.name -> f).toMap
    @volatile private var inSitu: Map[String, InSituFacet] =
      initialInSitu.map(f => f.name -> f).toMap
    def get(name: String): Facet = facets.getOrElse(name,
      // pushed-JDBC in-situ attributes carry a lazy Spark-side twin, so
      // projection and boolean filters referencing them keep working
      // exactly as they did on the pre-pushdown mount path
      inSitu.get(name).flatMap(_.local).getOrElse(
        throw new IllegalArgumentException(
          if (inSitu.contains(name))
            s"attribute $name is mounted in-situ (REST) — it has no local " +
              "values; it can be queried but not projected/filtered locally"
          else s"attribute $name is not mounted")))
    def getInSitu(name: String): Option[InSituFacet] = inSitu.get(name)
    /** (name, operation) in the reference's operation vocabulary
      * (numerical_topk, ..., pivot_based; dictionaries list as such). */
    def list: Seq[(String, String)] =
      (facets.values.map { f =>
        val op = (f.spec.op, f.spec.queryable) match {
          case (_, false)                 => "dictionary"
          case (SimOp.Numerical, _)       => "numerical_topk"
          case (SimOp.Temporal, _)        => "temporal_topk"
          case (SimOp.Categorical, _)     => "categorical_topk"
          case (SimOp.Textual, _)         => "textual_topk"
          case (SimOp.Spatial, _)         => "spatial_knn"
          case (SimOp.Metric(_), _)       => "pivot_based"
        }
        f.spec.name -> op
      } ++ inSitu.values.map(f => f.name -> f.operation)).toSeq.sorted
    // mutators synchronize: += on a volatile var is read-modify-write, and
    // the REST pool can run two /append handlers at once — without the
    // lock one mount silently loses. Reads stay lock-free (volatile
    // reference to an immutable map); mounts are rare, contention is nil.
    def add(f: Facet): Unit = synchronized { facets += (f.spec.name -> f) }
    def add(f: InSituFacet): Unit = synchronized { inSitu += (f.name -> f) }
    /** @return whether the attribute was mounted (callers surface 404 on false) */
    def remove(name: String): Boolean = synchronized {
      val had = facets.contains(name) || inSitu.contains(name)
      facets -= name
      inSitu -= name
      had
    }
    def size: Int = facets.size + inSitu.size
    /** Vector dictionaries mounted into this catalog — kept so a LATER
      * mount request (/append) can transform_by a dictionary declared in an
      * earlier one, matching the reference's per-coordinator dictionary
      * registry (Coordinator findIdentifier over all mounted datasets). */
    @volatile private var dictStore: Map[String, DataFrame] = Map.empty
    def dicts: Map[String, DataFrame] = dictStore
    def addDicts(d: Map[String, DataFrame]): Unit =
      synchronized { dictStore ++= d }
    /** URL prefix for result entity identifiers, read off a mounted name
      * dictionary (reference: SearchResponseFormat — prefixURL comes from
      * the non-queryable names dataset). Deterministic under multiple
      * prefixed dictionaries: the lexicographically first attribute wins. */
    def namePrefix: Option[String] =
      facets.values.toSeq
        .filter(f => !f.spec.queryable && f.spec.prefixURL.isDefined)
        .sortBy(_.spec.name).headOption.flatMap(_.spec.prefixURL)
  }

  /** Format result ids as URL identifiers when the catalog mounts a name
    * dictionary with prefixURL (reference: Assistant.formatURL, minus its
    * hardcoded 12-character ATOKA truncation — documented divergence). */
  def applyIdPrefix(catalog: Catalog, ranked: DataFrame): DataFrame =
    catalog.namePrefix match {
      case Some(p) =>
        ranked.withColumn("id", concat(lit(p), col("id").cast("string")))
      case None => ranked
    }

  val KMax = Limits.KMax                     // reference: Constants.java:42
  val InflationFactor = Limits.InflationFactor // reference: Constants.java:44

  /** Build the (id, d) distance stream for one facet/query pair, applying
    * the facet's boolean pre-filter (P2 — works on ingested data here,
    * unlike the reference which ignores it with a notice,
    * SearchHandler.java:707-713). */
  private def distStream(f: Facet, spec: SearchSpec): DataFrame = {
    val base = spec.filter.map(f.df.where).getOrElse(f.df)
    val v = col("value")
    val d: Column = f.spec.op match {
      case SimOp.Numerical =>
        val q = spec.value match {
          // F12: "max" reads the facet frame, whose values are ALREADY in
          // the mount-time-normalized space — do not re-normalize it
          case "max" =>
            val row = f.df.agg(max(v)).head
            if (row.isNullAt(0)) throw new IllegalArgumentException(
              s"attribute ${f.spec.name} has no values — cannot resolve " +
                """the "max" query keyword""")
            row.getDouble(0)
          case other =>
            val q0 = other match {
              case x: Double => x
              case x: Int => x.toDouble
              case x: String => x.toDouble
              case bad => throw new IllegalArgumentException(s"bad numeric query $bad")
            }
            // normalize the RAW query value with the mount-time transform (A4)
            (f.spec.normalizer, f.spec.stats) match {
              case (Normalizer.Z, Some(st)) => if (st.stddev == 0) 0.0 else (q0 - st.avg) / st.stddev
              case (Normalizer.Unity, Some(st)) => if (st.max == st.min) 0.0 else (q0 - st.avg) / (st.max - st.min)
              case _ => q0
            }
        }
        SimKernels.absDist(v, lit(q))
      case SimOp.Temporal =>
        val q = spec.value match {
          case s: String => CsvMount.parseDatetimeMs(s)
            .getOrElse(throw new IllegalArgumentException(s"unparseable datetime ${spec.value}"))
          case x: Double => x
          case other => throw new IllegalArgumentException(s"bad temporal query $other")
        }
        SimKernels.absDist(v, lit(q))
      case SimOp.Categorical =>
        val toks = spec.value match {
          case xs: Seq[_] => xs.map(_.toString)
          case s: String => s.split(java.util.regex.Pattern.quote(f.spec.tokenDelim))
            .map(_.trim).filter(_.nonEmpty).distinct.toSeq
          case other => throw new IllegalArgumentException(s"bad token-set query $other")
        }
        SimKernels.jaccardDistDistinct(v, array(toks.map(lit): _*))
      case SimOp.Textual =>
        val q = spec.value.toString
        val qGrams = (if (q.length < f.spec.qgram) Seq(q)
          else q.sliding(f.spec.qgram).toSeq).distinct
        SimKernels.jaccardDistDistinct(SimKernels.qgrams(v, f.spec.qgram), array(qGrams.map(lit): _*))
      case SimOp.Spatial =>
        val (qLon, qLat) = spec.value match {
          case s: String => CsvMount.parseWktPoint(s)
            .getOrElse(throw new IllegalArgumentException(s"unparseable WKT ${spec.value}"))
          case (a: Double, b: Double) => (a, b)
          case other => throw new IllegalArgumentException(s"bad spatial query $other")
        }
        SimKernels.geoDistDeg(v.getField("lon"), v.getField("lat"), lit(qLon), lit(qLat))
      case SimOp.Metric(mname) => // Q9: pivot_based coordinate attribute
        // the attribute's queryTransform (set at mount) types string query
        // values the same way the DATA was typed: word2vec for transformed
        // keyword attributes, datetime-chain for temporal coordinates,
        // numeric parse otherwise — so "20191104084500" on a timestamp
        // pivot becomes epoch-ms, never the raw 2.0e13 numeral
        def viaTransform(ts: Seq[String]): Seq[Double] =
          f.spec.queryTransform.map(_(ts)).getOrElse(
            throw new IllegalArgumentException(
              s"attribute ${f.spec.name} takes a numeric vector query"))
        val qvec: Seq[Double] = spec.value match {
          case d: Double => Seq(d)
          case i: Int => Seq(i.toDouble)
          case vs: Seq[_] if vs.nonEmpty && vs.forall(x =>
              x.isInstanceOf[Double] || x.isInstanceOf[Int]) =>
            vs.map { case d: Double => d; case i: Int => i.toDouble }
          case vs: Seq[_] =>
            // a JSON array arrives as strings — numbers read as the vector,
            // anything else is a keyword set for the dictionary transform
            val strs = vs.map(_.toString)
            if (strs.nonEmpty &&
                strs.forall(p => scala.util.Try(p.trim.toDouble).isSuccess))
              strs.map(_.trim.toDouble)
            else viaTransform(strs)
          case s: String if CsvMount.parseWktPoint(s).isDefined =>
            val (lon, lat) = CsvMount.parseWktPoint(s).get
            Seq(lon, lat)
          case s: String if f.spec.queryTransform.isDefined =>
            viaTransform(s.split(java.util.regex.Pattern.quote(f.spec.tokenDelim))
              .map(_.trim).filter(_.nonEmpty).toSeq)
          case s: String => // comma-separated vector literal, or a datetime
            // for a 1-dim epoch-ms coordinate mounted without a transform
            val parts = s.split(",").map(_.trim).toSeq
            if (parts.forall(p => scala.util.Try(p.toDouble).isSuccess))
              parts.map(_.toDouble)
            else CsvMount.parseDatetimeMs(s).map(Seq(_)).getOrElse(
              throw new IllegalArgumentException(s"unparseable metric query $s"))
          case other => throw new IllegalArgumentException(s"bad metric query $other")
        }
        val qc = array(qvec.map(lit): _*)
        mname match {
          case "euclidean" => graft.functions.NativeKernels.l2Dist(v, qc)
          case "manhattan" => graft.functions.NativeKernels.l1Dist(v, qc)
          case "chebyshev" => SimKernels.chebyshevDist(v, qc)
          case "haversine" =>
            require(qvec.size == 2, s"haversine query needs (lon, lat), got $qvec")
            SimKernels.haversineDeg(element_at(v, 1), element_at(v, 2),
              lit(qvec(0)), lit(qvec(1)))
          case other => throw new IllegalArgumentException(s"unsupported metric $other")
        }
      case other => throw new IllegalArgumentException(s"unsupported op $other")
    }
    base.select(col("id"), d.as("d"))
  }

  /** Top-k multi-attribute search. Returns (combo, rank, id, score).
    *
    * Scale calibration: when no explicit scale is given, the decay scale of
    * each facet is set to k * (k-th candidate distance). The reference's
    * code reads as plain k-th distance (NumericalSimSearch.java:244-246),
    * but its committed golden fixture (data/gdelt/standalone/
    * search_results.json) is only reproduced — to 1e-9, on every score of
    * both weight combinations — by k * d_k; we match the fixture's
    * observable behavior and document the divergence from the code-as-read.
    */
  /** R7: weight auto-estimation for a facet with no user weights — the p-th
    * percentile of the facet's decayed candidate scores with
    * p = 100 - 100k/n, linearly interpolated
    * (reference: weights/Estimator.java:145-189 proc(k), invoked from
    * RankAggregator.java:167-192). */
  def estimateWeight(scored: DataFrame, k: Int): Double = {
    val n = scored.count()
    if (n == 0) return 1.0
    val p = math.max(0.0, 1.0 - k.toDouble / n)
    val idx = p * (n - 1)
    val lo = math.floor(idx).toLong
    val frac = idx - math.floor(idx)
    val tail = weightTail(scored, n, lo).collect().map(_.getDouble(0)).reverse
    val est = if (tail.length < 2) tail(0) else tail(0) + (tail(1) - tail(0)) * frac
    math.min(1.0, math.max(1e-9, est))
  }

  /** The two interpolation rows sit at ascending ranks lo+1 and lo+2, i.e.
    * inside the top (n-lo) ~ k+1 rows from the END of the (s, id) order. A
    * shuffle-free TakeOrdered heap on the inverted order fetches exactly
    * that tail; ranking the whole facet through an unpartitioned Window
    * (the naive formulation) would sort 100% of the data into ONE task to
    * read 2 rows — the plan PlanSpec asserts can never come back. */
  private[graft] def weightTail(scored: DataFrame, n: Long, lo: Long): DataFrame =
    scored.orderBy(col("s").desc, col("id").desc)
      .limit((n - lo).toInt)
      .select(col("s"))

  /** P3: cross-attribute residual boolean filter — restrict the searchable
    * entities to those satisfying `filter` over the referenced mounted
    * attributes. The reference can only push such filters to in-situ
    * sources and IGNORES them on ingested data with a notice
    * (SearchHandler.java:707-713); we apply them uniformly by semi-joining
    * an eligible-id set built from the referenced facets. */
  private def eligibleIds(catalog: Catalog, filter: String): DataFrame = {
    val referenced = catalog.list.map(_._1).filter(name =>
      java.util.regex.Pattern.compile(s"\\b${java.util.regex.Pattern.quote(name)}\\b")
        .matcher(filter).find())
    require(referenced.nonEmpty, s"filter references no mounted attribute: $filter")
    // FULL OUTER join across the referenced attributes: an entity missing
    // one attribute must still be judged by the predicate (its value is
    // NULL there) — an inner join would silently exclude an entity that
    // satisfies `price > 5 OR rating > 4` just because it has no rating
    // row. SQL null semantics then do the right thing for every
    // connective: a NULL comparison is not-true, so AND-only filters keep
    // exactly the inner join's answer, while OR and IS [NOT] NULL branches
    // can rescue partially-mounted entities.
    val joined = referenced.map { name =>
      catalog.get(name).df.select(col("id"), col("value").as(name))
    }.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    joined.where(expr(filter)).select(col("id"))
  }

  /** Facet distance frames for `specs` (None for preScored NRA lists)
    * plus the built in-situ facets — shared by [[search]] and the
    * federated calibration path ([[calibrationDistances]]).
    *
    * In-situ attributes come in two shapes (S7/S9/S10):
    *  - preScored (ES / federated REST): the remote returns a ranked
    *    SIMILARITY list — skip the distance/scale machinery entirely (NRA).
    *  - distance-based (JDBC pushdown): the remote evaluates
    *    `ORDER BY distance LIMIT m` and returns a bounded (id, d) list;
    *    the engine calibrates scale / decays it exactly like an ingested
    *    facet. The list is cached so the scale calibration, weight
    *    estimation and exact-scoring phases share ONE remote fetch (cache
    *    lifetime: <= m rows, MEMORY_AND_DISK, shed by LRU — same story as
    *    RankAggregate's topM caches). */
  private def facetDistFrames(catalog: Catalog, m: Int, specs: Seq[SearchSpec],
      eligible: Option[DataFrame])
      : (Map[Int, graft.operators.BoundFacet], Seq[Option[DataFrame]]) = {
    val inSituByIdx: Map[Int, InSituFacet] = specs.zipWithIndex
      .flatMap { case (s, i) =>
        catalog.getInSitu(s.column)
          // A residual filter composed with a remotely-BOUNDED top-M list
          // is unsound: eligible candidates ranked below M remotely never
          // cross the wire, so semi-joining the bounded list can starve
          // the top-k. Route such queries through the exact Spark-side
          // twin (the eligible semi-join then lands BEFORE the top-M
          // bound). REST facets have no twin and keep their documented
          // NRA semantics.
          .filterNot(is => eligible.isDefined && is.local.isDefined)
          .map(i -> _)
      }.toMap
    val inSituBuilt: Map[Int, graft.operators.BoundFacet] =
      inSituByIdx.map { case (i, is) => i -> is.build(specs(i), m) }
    val dists: Seq[Option[DataFrame]] = specs.zipWithIndex.map { case (s, i) =>
      inSituBuilt.get(i) match {
        case Some(bf) if !bf.preScored =>
          Some(eligible.map(e => bf.dist.join(e, Seq("id"), "left_semi"))
            .getOrElse(bf.dist).cache())
        case Some(_) => None
        case None =>
          val f = catalog.get(s.column)
          require(f.spec.queryable, s"attribute ${s.column} is not queryable") // P6
          val dist0 = distStream(f, s)
          Some(eligible.map(e => dist0.join(e, Seq("id"), "left_semi")).getOrElse(dist0))
      }
    }
    (inSituBuilt, dists)
  }

  /** Per-facet local top-k candidate DISTANCES, ascending — phase 1 of the
    * federated two-phase scale negotiation
    * ([[graft.sources.Federated.search]]): the k-th smallest candidate
    * distance over a horizontally sharded corpus is computable exactly
    * from each shard's local k smallest (the union's k smallest are
    * contained in the union of the per-shard k smallest), so a coordinator
    * can pin every shard to the single-instance calibration scale
    * (k * global d_k) before scoring. preScored facets (ES / federated
    * NRA lists) carry no distances and are omitted; a facet returns fewer
    * than k values when its candidate set is smaller. */
  /** Keyed by QUERY INDEX, not column: two specs may query the same
    * column with different values (and therefore different distance
    * distributions), and a column-keyed map would collapse them — the
    * federated negotiation would then pin both facets' scales from one
    * facet's k-th distance, diverging from the single-instance scores it
    * exists to match. */
  def calibrationDistances(spark: SparkSession, catalog: Catalog, k: Int,
      specs: Seq[SearchSpec], residualFilter: Option[String] = None)
      : Map[Int, Seq[Double]] = {
    require(specs.nonEmpty, "no query conditions")
    val m = if (specs.size > 1) InflationFactor * k else k
    val eligible = residualFilter.map(eligibleIds(catalog, _))
    val (_, dists) = facetDistFrames(catalog, m, specs, eligible)
    val need = specs.zipWithIndex.filter { case (_, i) => dists(i).isDefined }
    if (need.isEmpty) Map.empty
    else need.map { case (_, i) =>
      FacetSearch.topM(dists(i).get, k).select(lit(i).as("f"), col("d"))
    }.reduce(_ union _)
      .collect().groupBy(_.getInt(0))
      .map { case (i, rows) => i -> rows.map(_.getDouble(1)).sorted.toSeq }
  }

  def search(spark: SparkSession, catalog: Catalog, k: Int,
      specs: Seq[SearchSpec], residualFilter: Option[String] = None,
      detailed: Boolean = false,
      algorithm: Algorithm = Algorithm.Threshold): DataFrame = {
    // The algorithm selector is honored for API parity: every selector maps
    // to the same exact candidate-union plan, which supersedes TA and the
    // (possibly lower-bound-scored) NRA/PRA — see api.Algorithm scaladoc.
    val _ = algorithm
    require(specs.nonEmpty, "no query conditions")
    require(specs.size == 1 || k <= KMax, s"k > $KMax for multi-attribute query") // A2
    val nCombos = math.max(1, specs.map(_.weights.size).max)
    val m = if (specs.size > 1) InflationFactor * k else k
    val eligible = residualFilter.map(eligibleIds(catalog, _))
    val (inSituBuilt, dists) = facetDistFrames(catalog, m, specs, eligible)
    // ONE cached top-M per distance-bearing facet: the scale calibration
    // (its k-prefix), R7 weight estimation, and the rank aggregation's
    // phase-1 candidate lists all read this cache — previously each phase
    // paid its own full facet scan (a k-scan here, an m-scan inside run,
    // and another m-scan for estimation). Cache lifetime: <= m rows each,
    // MEMORY_AND_DISK, shed by LRU — the RankAggregate story.
    val topMCache: Map[Int, DataFrame] = specs.indices.flatMap(i =>
      dists(i).map(d => i -> FacetSearch.topM(d, m).cache())).toMap
    // Calibrate every uncalibrated facet's k-th candidate distance in ONE
    // tagged Spark job (union only (f, d) so id types never conflict) —
    // sequential per-facet collects would pay |facets| job overheads. The
    // job also populates all the top-M caches in a single pass.
    val needScale = specs.zipWithIndex.filter { case (s, i) =>
      s.scale.isEmpty && dists(i).isDefined }
    val kth: Map[Int, Double] =
      if (needScale.isEmpty) Map.empty
      else needScale.map { case (_, i) =>
        topMCache(i).orderBy(col("d"), col("id")).limit(k)
          .select(lit(i).as("f"), col("d"))
      }.reduce(_ union _)
        .groupBy(col("f")).agg(max(col("d")).as("dk"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def resolveWeights(s: SearchSpec, scored: => DataFrame): Seq[Double] =
      if (s.weights.size == nCombos) s.weights
      else if (s.weights.size == 1) Seq.fill(nCombos)(s.weights.head)
      else if (s.weights.nonEmpty) throw new IllegalArgumentException(
        s"attribute ${s.column} supplies ${s.weights.size} weights but the " +
          s"query evaluates $nCombos combinations — every attribute must " +
          "supply one weight per combination (or exactly one, broadcast " +
          "to all)")
      else Seq.fill(nCombos)(estimateWeight(scored, k)) // R7
    val facets = specs.zipWithIndex.map { case (s, i) =>
      inSituBuilt.get(i) match {
        case Some(bf0) if bf0.preScored =>
          val list = eligible
            .map(e => bf0.dist.join(e, Seq("id"), "left_semi")).getOrElse(bf0.dist)
          // the ranked list IS the facet's score distribution — estimate
          // directly over it (<= m rows, no further calibration needed)
          val ws = resolveWeights(s, list.select(col("id"), col("d").as("s")))
          bf0.copy(dist = list, weightPerCombo = ws)
        case Some(bf0) => // distance-based in-situ (S7 JDBC pushdown)
          val dist = dists(i).get // the cached bounded remote list
          val scale = s.scale.getOrElse {
            val dk = kth.getOrElse(i, 0.0)
            if (dk <= 0.0) 1.0 else k * dk
          }
          val ws = resolveWeights(s,
            FacetSearch.decayedWithScale(bf0.copy(dist = dist), scale))
          bf0.copy(dist = dist, weightPerCombo = ws, scale = Some(scale))
        case None =>
          val f = catalog.get(s.column)
          val dist = dists(i).get
          // k * d_k only when d_k is a genuine nonzero distance; the
          // degenerate all-exact-match prefix keeps the plain 1.0 guard
          // (no multiplier)
          val scale = s.scale.getOrElse {
            val dk = kth.getOrElse(i, 0.0)
            if (dk <= 0.0) 1.0 else k * dk
          }
          val jac = f.spec.op == SimOp.Categorical || f.spec.op == SimOp.Textual
          val ws = resolveWeights(s, { // R7: candidate score distribution
            // the cached top-M — estimation must not re-scan the facet
            FacetSearch.decayedWithScale(
              BoundFacet(s.column, topMCache(i), Seq(1.0), s.decay, Some(scale), jac),
              scale)
          })
          BoundFacet(s.column, dist, ws, s.decay, Some(scale), jac)
      }
    }
    // hand the cached candidate lists to the aggregation, positionally:
    // preScored facets rank by similarity DESC (run's own convention)
    val topMs = facets.zipWithIndex.map { case (bf, i) =>
      if (bf.preScored) bf.dist.orderBy(col("d").desc, col("id")).limit(m).cache()
      else topMCache(i)
    }
    if (detailed) RankAggregate.topKDetailed(spark, facets, k, m, Some(topMs))
    else RankAggregate.topK(spark, facets, k, m, Some(topMs))
  }

  /** A5: k x k pairwise weighted similarity over a set of result entities
    * (reference: engine/processor/ResultMatrix.java:62-124; skipped there
    * when k > 50 — enforced here too). Uses the same per-facet decay scales
    * as [[search]] (combo 0 weights). */
  def similarityMatrix(spark: SparkSession, catalog: Catalog, k: Int,
      specs: Seq[SearchSpec]): DataFrame = {
    require(k <= KMax, s"similarity matrix capped at K_MAX=$KMax")
    // In-situ attributes participate when their source supports value
    // retrieval (S7 JDBC pushdown — the reference matrixes in-situ
    // attributes from its random-access value cache, ResultMatrix over the
    // lookup); REST NRA sources have no value access and are rejected.
    val inSituByIdx: Map[Int, InSituFacet] = specs.zipWithIndex
      .flatMap { case (s, i) => catalog.getInSitu(s.column).map(i -> _) }.toMap
    inSituByIdx.values.foreach(f => require(f.values.isDefined,
      s"attribute ${f.name} is mounted in-situ without value retrieval — " +
        "a similarity matrix needs attribute values"))
    def opOf(i: Int): SimOp = inSituByIdx.get(i) match {
      case Some(f) => f.operation match {
        case "numerical_topk" => SimOp.Numerical
        case "temporal_topk"  => SimOp.Temporal
        case other => throw new IllegalArgumentException(
          s"in-situ operation $other not matrixable")
      }
      case None => catalog.get(specs(i).column).spec.op
    }
    // Calibrate the per-facet scales ONCE (a single tagged Spark job), then
    // hand them to search() via explicit SearchSpec.scale so neither pass
    // recomputes them. In-situ facets calibrate from their pushed bounded
    // top-k list instead of a local distance stream.
    val need = specs.zipWithIndex.filter(_._1.scale.isEmpty)
    val kth: Map[Int, Double] =
      if (need.isEmpty) Map.empty
      else need.map { case (s, i) =>
        val dist = inSituByIdx.get(i) match {
          case Some(f) => f.build(s, k).dist
          case None => distStream(catalog.get(s.column), s)
        }
        FacetSearch.topM(dist, k).select(lit(i).as("f"), col("d"))
      }.reduce(_ union _)
        .groupBy(col("f")).agg(max(col("d")).as("dk"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val scalesByIdx = specs.zipWithIndex.map { case (s, i) =>
      s.scale.getOrElse {
        val dk = kth.getOrElse(i, 0.0)
        if (dk <= 0.0) 1.0 else k * dk
      }
    }
    val calibrated = specs.zip(scalesByIdx).map { case (s, sc) => s.copy(scale = Some(sc)) }
    // cache: the ids frame feeds one collect plus |facets| joins below —
    // uncached, each consumer would re-run the whole search (re-firing
    // every remote top-M fetch for in-situ facets)
    val ids = search(spark, catalog, k, calibrated)
      .where(col("combo") === 0).select(col("id")).cache()
    // value retrieval for in-situ facets: one bounded (<= K_MAX) id collect
    // feeds every remote value fetch
    val idSeq: Seq[Any] = ids.collect().map(_.get(0)).toSeq
    // zero results => an empty k x k matrix, same graceful degradation as
    // the local-facet path (the remote value fetch would reject an empty
    // IN list)
    if (idSeq.isEmpty) {
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      val idType = ids.schema("id").dataType
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("lid", idType), StructField("rid", idType),
          StructField("sim", DoubleType))))
    }
    val withVals = specs.zipWithIndex.foldLeft(ids) { case (acc, (s, i)) =>
      val vf = inSituByIdx.get(i) match {
        case Some(f) => f.values.get(idSeq)
        case None => catalog.get(s.column).df
      }
      acc.join(vf.select(col("id"), col("value").as(s"v$i")), Seq("id"), "left")
    }
    val a = withVals.select(col("id").as("lid") +:
      specs.indices.map(i => col(s"v$i").as(s"a$i")): _*)
    val b = withVals.select(col("id").as("rid") +:
      specs.indices.map(i => col(s"v$i").as(s"b$i")): _*)
    val sims = specs.zipWithIndex.map { case (s, i) =>
      val op = opOf(i)
      val scale = scalesByIdx(i)
      val d: Column = op match {
        case SimOp.Numerical | SimOp.Temporal => SimKernels.absDist(col(s"a$i"), col(s"b$i"))
        case SimOp.Categorical => SimKernels.jaccardDistDistinct(col(s"a$i"), col(s"b$i"))
        case SimOp.Textual =>
          val q = catalog.get(s.column).spec.qgram
          SimKernels.jaccardDistDistinct(
            SimKernels.qgrams(col(s"a$i"), q), SimKernels.qgrams(col(s"b$i"), q))
        case SimOp.Spatial => SimKernels.geoDistDeg(
          col(s"a$i").getField("lon"), col(s"a$i").getField("lat"),
          col(s"b$i").getField("lon"), col(s"b$i").getField("lat"))
        case other => throw new IllegalArgumentException(s"unsupported op $other")
      }
      val jac = op == SimOp.Categorical || op == SimOp.Textual
      val sim = if (jac) SimKernels.decaySimJaccard(d, s.decay, lit(scale))
        else SimKernels.decaySim(d, s.decay, lit(scale))
      coalesce(sim, lit(0.0)) // missing value => similarity 0
    }
    val ws = specs.map(_.weights.headOption.getOrElse(1.0))
    val num = ws.zip(sims).map { case (w, s) => lit(w) * s }.reduce(_ + _)
    a.crossJoin(b).select(col("lid"), col("rid"),
      round(num / lit(ws.sum), 6).as("sim")).orderBy(col("lid"), col("rid"))
  }
}
