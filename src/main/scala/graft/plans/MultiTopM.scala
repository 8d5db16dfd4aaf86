package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Whole-operator custom plan — the "(c)" rung of the extension ladder
  * (custom LogicalPlan + Strategy + SparkPlan, registered through
  * SparkSessionExtensions / experimental.extraStrategies).
  *
  * A multi-facet query over a SHARED source needs every facet's top-M
  * candidate list. Composing built-ins costs one `orderBy(d_i).limit(M)`
  * pass per facet — |facets| scans of the same table (Spark has no
  * multi-top-k operator to fuse them). [[MultiTopMExec]] computes ALL the
  * per-facet bounded heaps in ONE scan: each task keeps |facets| size-M
  * heaps ordered by (distance, id), emits the per-partition partials, and a
  * final per-facet top-M over the (#partitions x M x |facets|)-row partial
  * set — tiny, and exactly the deterministic (d, id) ordering the per-facet
  * `orderBy.limit` plan produces. At 100 TB this turns the candidate phase
  * from |facets| full scans into one.
  *
  * The reference walks its per-attribute indexes concurrently to the same
  * effect (engine/SearchHandler.java:717-720, one thread per attribute over
  * in-memory indexes).
  */
object MultiTopM {

  /** Logical node: per-facet distance expressions over `child`, id first.
    * Output: (facet: int, id: <id type>, d: double). */
  final case class MultiTopMNode(
      outputAttrs: Seq[Attribute],
      idAttr: Attribute,
      distAttrs: Seq[Attribute],
      m: Int,
      child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = outputAttrs
    // the node GENERATES these attributes (they come from no child)
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs)
    override protected def withNewChildInternal(newChild: LogicalPlan): MultiTopMNode =
      copy(child = newChild)
  }

  /** Planner rule: [[MultiTopMNode]] -> [[MultiTopMExec]]. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case MultiTopMNode(out, idAttr, distAttrs, m, child) =>
        MultiTopMExec(out, idAttr, distAttrs, m, planLater(child)) :: Nil
      case _ => Nil
    }
  }

  /** Physical operator: one pass, |facets| bounded heaps per task. */
  final case class MultiTopMExec(
      outputAttrs: Seq[Attribute],
      idAttr: Attribute,
      distAttrs: Seq[Attribute],
      m: Int,
      child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = outputAttrs
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs)
    override protected def withNewChildInternal(newChild: SparkPlan): MultiTopMExec =
      copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val idExpr = BindReferences.bindReference(
        idAttr: org.apache.spark.sql.catalyst.expressions.Expression, child.output)
      val distExprs = distAttrs.map(d =>
        BindReferences.bindReference(d: org.apache.spark.sql.catalyst.expressions.Expression, child.output))
      val idOrdering = TypeUtils.getInterpretedOrdering(idAttr.dataType)
      val mLocal = m
      child.execute().mapPartitions { iter =>
        final case class Cand(d: Double, idVal: Any)
        // max-heap (worst candidate at head) keeping the m smallest by (d, id)
        val cmp: java.util.Comparator[Cand] = (a: Cand, b: Cand) => {
          val c = java.lang.Double.compare(a.d, b.d)
          if (c != 0) c else idOrdering.compare(a.idVal, b.idVal)
        }
        val heaps = Array.fill(distExprs.size)(
          new java.util.PriorityQueue[Cand](mLocal + 1, cmp.reversed()))
        iter.foreach { row =>
          val rawId = idExpr.eval(row)
          if (rawId != null) {
            var stored: Any = null // copy buffer-backed values once, lazily
            var f = 0
            while (f < distExprs.length) {
              val dAny = distExprs(f).eval(row)
              if (dAny != null) {
                val d = dAny.asInstanceOf[Double]
                val h = heaps(f)
                val full = h.size >= mLocal
                // allocation-free admission test: compare fields against the
                // current worst BEFORE building a Cand (this runs per row
                // per facet over the whole scan)
                val admit = !full || {
                  val worst = h.peek()
                  val c = java.lang.Double.compare(d, worst.d)
                  c < 0 || (c == 0 && idOrdering.compare(rawId, worst.idVal) < 0)
                }
                if (admit) {
                  if (stored == null) stored = InternalRow.copyValue(rawId)
                  if (full) h.poll()
                  h.add(Cand(d, stored))
                }
              }
              f += 1
            }
          }
        }
        // downstream operators expect UnsafeRow; volume is only
        // partitions x m x |facets|, so per-row copy is immaterial
        val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(outputAttrs.map(_.dataType).toArray)
        heaps.iterator.zipWithIndex.flatMap { case (h, f) =>
          h.iterator().asScala.map(c =>
            toUnsafe(new GenericInternalRow(Array[Any](f, c.idVal, c.d))).copy(): InternalRow)
        }
      }
    }
  }

  /** Register the planner strategy on a session (idempotent). Also injected
    * by [[graft.GraftExtensions]] for extensions-built sessions. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(Strategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ Strategy

  /** All facets' deterministic top-M in one scan of `df`.
    *
    * Null contract: rows with a null id or a null distance are EXCLUDED
    * from that facet's candidate list (a composed `orderBy(d)` would rank
    * null distances first — Spark ASC is NULLS FIRST — which is never the
    * intended candidate semantics). Facet streams built by the mount paths
    * are null-free anyway (P4 `na.drop`); callers with nullable distance
    * expressions must treat null as "no candidate", as this operator does.
    *
    * @param dists (facetName ignored for output; order = facet index)
    * @return (facet: int, id, d) — exactly the rows of
    *         `df.select(id, d_i).where(d.isNotNull).orderBy(d, id).limit(m)`
    *         for each facet i
    */
  def apply(df: DataFrame, idCol: Column, dists: Seq[Column], m: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val projected = df.select((idCol.as("id") +: dists.zipWithIndex.map {
      case (c, i) => c.cast("double").as(s"_d$i")
    }): _*)
    val plan = projected.queryExecution.analyzed
    val idAttr = plan.output.head
    val distAttrs = plan.output.tail
    val out = Seq(
      AttributeReference("facet", IntegerType, nullable = false)(),
      AttributeReference("id", idAttr.dataType, idAttr.nullable)(),
      AttributeReference("d", DoubleType, nullable = false)())
    val partials = GraftColumnBridge.ofRows(spark,
      MultiTopMNode(out, idAttr, distAttrs, m, plan))
    // exact per-facet top-M over the tiny partial set (<= #partitions * m
    // rows per facet), same (d, id) determinism as per-facet orderBy.limit
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("facet")).orderBy(col("d"), col("id"))
    partials.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= m).drop("_rn")
  }
}
