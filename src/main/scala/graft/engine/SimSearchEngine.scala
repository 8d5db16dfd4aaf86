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

  /** Mounted-attribute catalog with listing (A8), append (the reference's
    * /append endpoint) and removal (A9). */
  final class Catalog(initial: Seq[Facet]) {
    private var facets: Map[String, Facet] = initial.map(f => f.spec.name -> f).toMap
    def get(name: String): Facet = facets.getOrElse(name,
      throw new IllegalArgumentException(s"attribute $name is not mounted"))
    def list: Seq[(String, String)] = // (name, operation)
      facets.values.map(f => f.spec.name -> f.spec.op.toString).toSeq.sorted
    def add(f: Facet): Unit = facets += (f.spec.name -> f)
    /** @return whether the attribute was mounted (callers surface 404 on false) */
    def remove(name: String): Boolean = {
      val had = facets.contains(name)
      facets -= name
      had
    }
    def size: Int = facets.size
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
          case "max" => f.df.agg(max(v)).head.getDouble(0)
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
    val joined = referenced.map { name =>
      catalog.get(name).df.select(col("id"), col("value").as(name))
    }.reduce((a, b) => a.join(b, Seq("id")))
    joined.where(expr(filter)).select(col("id"))
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
    val dists = specs.map { s =>
      val f = catalog.get(s.column)
      require(f.spec.queryable, s"attribute ${s.column} is not queryable") // P6
      val dist0 = distStream(f, s)
      eligible.map(e => dist0.join(e, Seq("id"), "left_semi")).getOrElse(dist0)
    }
    // Calibrate every uncalibrated facet's k-th candidate distance in ONE
    // tagged Spark job (union only (f, d) so id types never conflict) —
    // sequential per-facet collects would pay |facets| job overheads.
    val needScale = specs.zipWithIndex.filter(_._1.scale.isEmpty)
    val kth: Map[Int, Double] =
      if (needScale.isEmpty) Map.empty
      else needScale.map { case (_, i) =>
        FacetSearch.topM(dists(i), k).select(lit(i).as("f"), col("d"))
      }.reduce(_ union _)
        .groupBy(col("f")).agg(max(col("d")).as("dk"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val facets = specs.zipWithIndex.map { case (s, i) =>
      val f = catalog.get(s.column)
      val dist = dists(i)
      // k * d_k only when d_k is a genuine nonzero distance; the degenerate
      // all-exact-match prefix keeps the plain 1.0 guard (no multiplier)
      val scale = s.scale.getOrElse {
        val dk = kth.getOrElse(i, 0.0)
        if (dk <= 0.0) 1.0 else k * dk
      }
      val jac = f.spec.op == SimOp.Categorical || f.spec.op == SimOp.Textual
      val ws =
        if (s.weights.size == nCombos) s.weights
        else if (s.weights.nonEmpty) Seq.fill(nCombos)(s.weights.head)
        else { // R7: auto-estimate from the candidate score distribution
          val cand = FacetSearch.topM(dist, m)
          val scored = FacetSearch.decayedWithScale(
            BoundFacet(s.column, cand, Seq(1.0), s.decay, Some(scale), jac), scale)
          Seq.fill(nCombos)(estimateWeight(scored, k))
        }
      BoundFacet(s.column, dist, ws, s.decay, Some(scale), jac)
    }
    if (detailed) RankAggregate.topKDetailed(spark, facets, k, m)
    else RankAggregate.topK(spark, facets, k, m)
  }

  /** A5: k x k pairwise weighted similarity over a set of result entities
    * (reference: engine/processor/ResultMatrix.java:62-124; skipped there
    * when k > 50 — enforced here too). Uses the same per-facet decay scales
    * as [[search]] (combo 0 weights). */
  def similarityMatrix(spark: SparkSession, catalog: Catalog, k: Int,
      specs: Seq[SearchSpec]): DataFrame = {
    require(k <= KMax, s"similarity matrix capped at K_MAX=$KMax")
    // Calibrate the per-facet scales ONCE (a single tagged Spark job), then
    // hand them to search() via explicit SearchSpec.scale so neither pass
    // recomputes them.
    val need = specs.zipWithIndex.filter(_._1.scale.isEmpty)
    val kth: Map[Int, Double] =
      if (need.isEmpty) Map.empty
      else need.map { case (s, i) =>
        FacetSearch.topM(distStream(catalog.get(s.column), s), k)
          .select(lit(i).as("f"), col("d"))
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
    val ids = search(spark, catalog, k, calibrated)
      .where(col("combo") === 0).select(col("id"))
    val withVals = specs.zipWithIndex.foldLeft(ids) { case (acc, (s, i)) =>
      acc.join(catalog.get(s.column).df.select(col("id"), col("value").as(s"v$i")),
        Seq("id"), "left")
    }
    val a = withVals.select(col("id").as("lid") +:
      specs.indices.map(i => col(s"v$i").as(s"a$i")): _*)
    val b = withVals.select(col("id").as("rid") +:
      specs.indices.map(i => col(s"v$i").as(s"b$i")): _*)
    val sims = specs.zipWithIndex.map { case (s, i) =>
      val f = catalog.get(s.column)
      val scale = scalesByIdx(i)
      val d: Column = f.spec.op match {
        case SimOp.Numerical | SimOp.Temporal => SimKernels.absDist(col(s"a$i"), col(s"b$i"))
        case SimOp.Categorical => SimKernels.jaccardDistDistinct(col(s"a$i"), col(s"b$i"))
        case SimOp.Textual => SimKernels.jaccardDistDistinct(
          SimKernels.qgrams(col(s"a$i"), f.spec.qgram), SimKernels.qgrams(col(s"b$i"), f.spec.qgram))
        case SimOp.Spatial => SimKernels.geoDistDeg(
          col(s"a$i").getField("lon"), col(s"a$i").getField("lat"),
          col(s"b$i").getField("lon"), col(s"b$i").getField("lat"))
        case other => throw new IllegalArgumentException(s"unsupported op $other")
      }
      val jac = f.spec.op == SimOp.Categorical || f.spec.op == SimOp.Textual
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
