package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Learned document-quality scoring: binomial Naive Bayes over word
  * tokens, trained from labeled seed sets — the classifier-filter stage of
  * GPT-3/CCNet-style curation (score every crawl document by similarity to
  * a trusted corpus vs a junk corpus, then gate or temperature-sample on
  * the score) in a fully distributed, deterministic form. Complements the
  * heuristic signals ([[graft.functions.TextKernels]] stats,
  * [[TfIdf.corpusFreqQuality]]): those need no labels; this learns
  * whatever separates YOUR seed sets.
  *
  * Scale design (100 TB): training is ONE map-side-combined
  * (token, label) count aggregate; class totals and vocabulary size come
  * from a second scalar aggregate over that (persisted) count table, the
  * log-likelihood ratio is derived IN the frame, and the `maxVocab` cap is
  * an `orderBy(...).limit(maxVocab)` — Spark plans that as TakeOrdered
  * (per-partition top-maxVocab, merged on the driver), so the only driver
  * materializations are one scalar row and the vocabulary-bounded weight
  * table (capped by absolute llr, deterministic tie-break), never the
  * corpus and never the unbounded distinct-token set.
  * Scoring explodes tokens against the BROADCAST weight table and sums
  * per document — one hash shuffle keyed by the document id, map-side
  * combined.
  *
  * Determinism: weights are pure functions of integer counts; scores sum
  * doubles in partition order, so they are deterministic per partitioning
  * (the [[AnnSearch.kmeans]] caveat) — stable enough for gating, not
  * bit-portable across engines, which is why the oracle-checked quality
  * queries stay on the rational-arithmetic signals. */
object QualityClassifier {

  /** A trained model: `prior` = ln(N_pos/N_neg) over DOCUMENTS, `weights`
    * = per-token Laplace-smoothed log-likelihood ratios
    * ln(P(t|pos)) - ln(P(t|neg)). */
  final case class NbModel(prior: Double, weights: Map[String, Double])

  /** Train from a labeled frame: `tokens` is a word-array column (e.g.
    * [[graft.functions.NativeKernels.wordTokens]]), `label` a boolean
    * column — true = the trusted/positive seed set. Duplicate tokens in a
    * document count multiply (standard multinomial NB). */
  def train(docs: DataFrame, tokens: Column, label: Column,
      maxVocab: Int = 65536): NbModel = {
    val base = docs.select(tokens.as("__t"), label.as("__l"))
    val nDocs = base.groupBy("__l").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val nPos = nDocs.getOrElse(true, 0L)
    val nNeg = nDocs.getOrElse(false, 0L)
    require(nPos > 0 && nNeg > 0,
      s"both classes need documents (pos=$nPos, neg=$nNeg)")
    val counts = base
      .select(explode(col("__t")).as("t"), col("__l"))
      .groupBy("t")
      .agg(sum(when(col("__l"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("__l"), 0L).otherwise(1L)).as("cn"))
      .persist()
    try {
      val tot = counts
        .agg(sum("cp").as("tp"), sum("cn").as("tn"), count(lit(1)).as("v"))
        .collect()(0)
      val totPos = tot.getLong(0)
      val totNeg = tot.getLong(1)
      val v = tot.getLong(2)
      // llr derived in-frame as the ORDERING key only; the kept weights
      // are recomputed driver-side from the integer counts with math.log
      // so the model is bit-identical regardless of Spark's StrictMath
      // codegen (a 1-ulp key difference cannot realistically reorder the
      // cap — ties break on the token anyway)
      val llr = log((col("cp") + lit(1.0)) / lit((totPos + v).toDouble)) -
        log((col("cn") + lit(1.0)) / lit((totNeg + v).toDouble))
      // vocabulary cap: keep the most DISCRIMINATIVE tokens (highest
      // |llr|), ties to the lexicographically smaller token —
      // deterministic, and planned as TakeOrdered so no partition ever
      // sends more than maxVocab rows driver-ward
      val kept = counts.select(col("t"), col("cp"), col("cn"), llr.as("w"))
        .orderBy(abs(col("w")).desc, col("t"))
        .limit(maxVocab)
        .collect().map { r =>
          r.getString(0) ->
            (math.log((r.getLong(1) + 1.0) / (totPos + v)) -
              math.log((r.getLong(2) + 1.0) / (totNeg + v)))
        }
      NbModel(math.log(nPos.toDouble / nNeg), kept.toMap)
    } finally counts.unpersist()
  }

  /** (id, score) per document: the prior plus the summed weights of its
    * tokens (unseen/capped-out tokens contribute 0; a token-less document
    * scores the bare prior). Higher = more like the positive seed set;
    * gate on a threshold or feed [[Sampling.byRate]] as an acceptance
    * curve. */
  def score(df: DataFrame, id: Column, tokens: Column,
      model: NbModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = model.weights.toSeq.toDF("t", "__llr")
    df.select(id.as("id"), explode_outer(tokens).as("t"))
      .join(broadcast(w), Seq("t"), "left")
      .groupBy("id")
      .agg((sum(coalesce(col("__llr"), lit(0.0))) + model.prior).as("score"))
  }

  /** The model score as a SCALAR column — prior plus the summed weights of
    * the row's tokens, computed row-local by a native codegen kernel (the
    * weight table ships once per executor as a reference object). No
    * explode, no shuffle: this is the form a STREAMING quality gate can
    * use (`scoreColumn(tokens, model) >= t` is a stateless predicate
    * [[graft.streaming.StreamOps.curationStream]] accepts directly), and
    * the faster batch path when the scores feed a filter rather than a
    * table. Sums left-to-right in token order, where [[score]] sums in
    * partition order — same weights, possibly a last-ulp difference in the
    * double total; gate thresholds don't care. A NULL token array scores
    * the bare prior (coalesced around the null-intolerant kernel), the
    * same contract as [[score]]'s explode_outer path — without it a
    * `scoreColumn >= t` gate would silently DROP null-text documents that
    * score's scoring table admits. */
  def scoreColumn(tokens: Column, model: NbModel): Column =
    coalesce(
      GraftColumnBridge.column(
        NbScoreExpr(GraftColumnBridge.expression(tokens), model)),
      lit(model.prior))

  private[graft] case class NbScoreExpr(child: Expression, model: NbModel)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      child.dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
      }
    }
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "nb_score_native"
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)

    // UTF8String keys: the tokens arrive as UTF8String, and converting the
    // WEIGHT TABLE once per executor beats converting every token of every
    // row driver-ward of the lookup
    @transient private lazy val weights: java.util.HashMap[UTF8String, java.lang.Double] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Double](
        model.weights.size * 2)
      model.weights.foreach { case (t, w) =>
        m.put(UTF8String.fromString(t), java.lang.Double.valueOf(w))
      }
      m
    }

    def scoreTokens(tokens: ArrayData): Double = {
      var s = model.prior
      var i = 0
      val n = tokens.numElements()
      while (i < n) {
        val t = tokens.getUTF8String(i)
        if (t != null) {
          val w = weights.get(t)
          if (w != null) s += w.doubleValue()
        }
        i += 1
      }
      s
    }

    override protected def nullSafeEval(v: Any): Any =
      scoreTokens(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nbScoreExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scoreTokens($c);")
    }
  }

  /** Persist a model: the weight table as parquet (t, w) plus the
    * [[IndexIO.MetaFile]] sidecar carrying kind/prior/vocab — the same
    * directory-plus-sidecar discipline as the ANN indexes, so a trained
    * filter survives the JVM and any Hadoop-API filesystem a cluster
    * mounts. The weight table is vocabulary-bounded by construction
    * ([[train]]'s `maxVocab` cap), so [[load]]'s collect is too. */
  def save(spark: org.apache.spark.sql.SparkSession, model: NbModel,
      path: String): Unit = {
    import spark.implicits._
    model.weights.toSeq.toDF("t", "w")
      .repartition(1) // weight tables are ≤ maxVocab rows — one file
      .write.mode("overwrite").parquet(path)
    IndexIO.writeMeta(spark, path,
      s"""{"kind":"nb_quality","prior":${model.prior},""" +
        s""""vocab":${model.weights.size}}""")
  }

  /** Load a model persisted by [[save]]. Fails fast when the sidecar is
    * missing or names another index kind (probing an LSH index as a
    * classifier model would otherwise fail obscurely mid-join). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): NbModel = {
    val meta = IndexIO.readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no model sidecar at $path"))
    val kind = meta.path("kind").asText("")
    require(kind == "nb_quality",
      s"the sidecar at $path names kind '$kind', not an nb_quality model")
    val weights = spark.read.parquet(path)
      .select(col("t"), col("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    NbModel(meta.path("prior").asDouble(), weights)
  }
}
