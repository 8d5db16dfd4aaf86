package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}

/** Spark-native integration point: enable with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * and every native graft kernel becomes a SQL function
  * (`SELECT graft_cosine_sim(a.embedding, b.embedding) ...`) compiled into
  * whole-stage codegen — the Catalyst-extension analogue of the reference's
  * in-process function surface. [[GraftExtensions.register]] retrofits a
  * session that was built without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.NativeKernels.sqlFunctions.foreach(ext.injectFunction)
    // whole-operator extension: fused multi-facet top-M (plans/MultiTopM)
    ext.injectPlannerStrategy(_ => graft.plans.MultiTopM.Strategy)
  }
}

object GraftExtensions {
  /** Register the graft SQL functions on an already-running session. */
  def register(spark: SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftColumnBridge.applyFunctionExtensions(ext, spark)
  }
}
