package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{Facet, Normalizer, SimOp}
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

  /** Mounted-attribute catalog with listing (A8) and removal (A9). */
  final class Catalog(initial: Seq[Facet]) {
    private var facets: Map[String, Facet] = initial.map(f => f.spec.name -> f).toMap
    def get(name: String): Facet = facets.getOrElse(name,
      throw new IllegalArgumentException(s"attribute $name is not mounted"))
    def list: Seq[(String, String)] = // (name, operation)
      facets.values.map(f => f.spec.name -> f.spec.op.toString).toSeq.sorted
    def remove(name: String): Unit = facets -= name
    def size: Int = facets.size
  }

  val KMax = 50               // reference: Constants.java:42
  val InflationFactor = 1000  // reference: Constants.java:44

  /** Build the (id, d) distance stream for one facet/query pair, applying
    * the facet's boolean pre-filter (P2 — works on ingested data here,
    * unlike the reference which ignores it with a notice,
    * SearchHandler.java:707-713). */
  private def distStream(f: Facet, spec: SearchSpec): DataFrame = {
    val base = spec.filter.map(f.df.where).getOrElse(f.df)
    val v = col("value")
    val d: Column = f.spec.op match {
      case SimOp.Numerical =>
        val q0 = spec.value match {
          case "max" => f.df.agg(max(v)).head.getDouble(0) // F12
          case x: Double => x
          case x: Int => x.toDouble
          case x: String => x.toDouble
          case other => throw new IllegalArgumentException(s"bad numeric query $other")
        }
        // normalize the query value with the mount-time transform (A4)
        val q = (f.spec.normalizer, f.spec.stats) match {
          case (Normalizer.Z, Some(st)) => if (st.stddev == 0) 0.0 else (q0 - st.avg) / st.stddev
          case (Normalizer.Unity, Some(st)) => if (st.max == st.min) 0.0 else (q0 - st.avg) / (st.max - st.min)
          case _ => q0
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
  def search(spark: SparkSession, catalog: Catalog, k: Int,
      specs: Seq[SearchSpec]): DataFrame = {
    require(specs.nonEmpty, "no query conditions")
    require(specs.size == 1 || k <= KMax, s"k > $KMax for multi-attribute query") // A2
    val nCombos = specs.map(_.weights.size).max
    val m = if (specs.size > 1) InflationFactor * k else k
    val facets = specs.map { s =>
      val f = catalog.get(s.column)
      require(f.spec.queryable, s"attribute ${s.column} is not queryable") // P6
      val dist = distStream(f, s)
      val scale = s.scale.getOrElse(k * FacetSearch.kthDistanceScale(dist, k))
      val ws = if (s.weights.size == nCombos) s.weights
        else Seq.fill(nCombos)(s.weights.headOption.getOrElse(1.0))
      BoundFacet(s.column, dist, ws, s.decay, Some(scale),
        jaccard = f.spec.op == SimOp.Categorical || f.spec.op == SimOp.Textual)
    }
    RankAggregate.topK(spark, facets, k, m)
  }
}
