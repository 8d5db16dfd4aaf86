package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding (Sennrich et al., ACL 2016): the subword tokenizer
  * real training pipelines count and pack by, replacing the whitespace and
  * regex approximations where exact token budgets matter.
  *
  * Scale design (100 TB): BPE training never iterates over the corpus — the
  * classic trick is that merge statistics depend only on the WORD-COUNT
  * table. [[train]] makes one distributed word-count pass (map-side-combined
  * aggregate, TakeOrdered cap — no global sort), then runs the merge loop
  * driver-side over that vocabulary-bounded table. Encoding is a narrow
  * per-row map: one native kernel call per document carrying the merge
  * ranks as a shared reference object, inside whole-stage codegen.
  */
object Bpe {

  /** GPT-style end-of-word marker: appended to each word's symbol sequence
    * before merging, so learned merges distinguish suffixes ("est</w>")
    * from word-internal fragments ("est"). */
  val EndMark = "</w>"

  /** Train `numMerges` BPE merges from a corpus: one distributed word
    * count (capped at the `maxWords` most frequent words — ties to the
    * lexicographically smaller word, so the training set is deterministic),
    * then the classic merge loop on the counts ([[trainFromCounts]]).
    * `words` is a word-array column (e.g.
    * [[graft.functions.NativeKernels.wordTokens]] of the text). */
  def train(df: DataFrame, words: Column, numMerges: Int,
      maxWords: Int = 1000000,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    val counts = df.select(explode(words).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(counts, numMerges, minPairCount)
  }

  /** Persist a merge table: parquet (rank, a, b) plus the
    * [[IndexIO.MetaFile]] sidecar carrying kind/merges/version — so the
    * exact token counts [[Packing.budgetSelect]]/[[Packing.chunkTokens]]
    * depend on are reproducible across JVMs and filesystems. Rank order IS
    * the model (encode applies the lowest-rank merge first), so the rank
    * column is stored explicitly rather than trusting file row order. */
  def save(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .repartition(1) // merge tables are a few thousand rows — one file
      .write.mode("overwrite").parquet(path)
    IndexIO.writeMeta(spark, path,
      s"""{"kind":"bpe","version":1,"merges":${merges.size}}""")
  }

  /** Load a merge table persisted by [[save]], restoring training order.
    * Fails fast on a missing sidecar or a different index kind. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val meta = IndexIO.readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no model sidecar at $path"))
    val kind = meta.path("kind").asText("")
    require(kind == "bpe",
      s"the sidecar at $path names kind '$kind', not a bpe merge table")
    spark.read.parquet(path)
      .select(col("rank").cast("int"), col("a"), col("b"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** A word as its initial symbol sequence: one symbol per UNICODE CODE
    * POINT (splitting UTF-16 chars would sever surrogate pairs — emoji,
    * rare CJK — into invalid half-characters), plus [[EndMark]]. */
  private def baseSymbols(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndMark
    out.toArray
  }

  /** The BPE merge loop over a word-count table: start from per-code-point
    * symbols (+ [[EndMark]]), repeatedly merge the most frequent adjacent
    * symbol pair — ties broken by the lexicographically smallest pair, so
    * training is deterministic — until `numMerges` merges are learned or no
    * pair reaches `minPairCount`. Driver-side by design: the table is
    * bounded by the vocabulary, not the corpus.
    *
    * `minPairCount` defaults to 2 — PARITY with Sennrich's subword-nmt
    * `learn_bpe` (its `--min-frequency` also defaults to 2): a pair seen
    * once buys nothing at inference and fills the merge table with
    * singleton noise. Pass `minPairCount = 1` to merge all the way down
    * the tail when a merge table must reproduce an implementation that
    * does (merge-table interop with tokenizer stacks that keep
    * count-1 merges). */
  def trainFromCounts(counts: Seq[(String, Long)],
      numMerges: Int, minPairCount: Long = 2L): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = counts
      .filter(_._1.nonEmpty)
      .map { case (w, n) => (baseSymbols(w), n) }
      .toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + n))
      val candidates = pairCounts.filter(_._2 >= minPairCount)
      if (candidates.isEmpty) continue = false
      else {
        val best = candidates.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) => (mergePair(syms, best), n) }
      }
    }
    merges.toSeq
  }

  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word (already whitespace-split) with rank-priority merging —
    * the GPT-2 procedure: among the word's adjacent symbol pairs, apply the
    * merge with the LOWEST training rank, repeat until none applies. The
    * result is independent of application order ambiguity because rank
    * priority is total. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms: Array[String] = baseSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = mergePair(syms, (syms(bestIdx), syms(bestIdx + 1)))
    }
    syms.toSeq
  }

  /** BPE tokens of a word-array column — array<string> of merged subword
    * symbols (suffix symbols carry [[EndMark]]), in document order. One
    * native kernel call per row; the merge ranks ship once per executor as
    * a reference object, and repeated words hit a bounded per-executor
    * memo (Zipf makes that cache's hit rate the corpus's token mass). */
  def tokens(words: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeTokensExpr(GraftColumnBridge.expression(words), merges))

  /** BPE token COUNT per row — the budget arithmetic most pipelines
    * actually need ([[Packing.budgetSelect]], [[Packing.chunkTokens]]). */
  def tokenCount(words: Column, merges: Seq[(String, String)]): Column =
    size(tokens(words, merges)).cast("long")

  private[graft] case class BpeTokensExpr(child: Expression,
      merges: Seq[(String, String)])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      child.dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
      }
    }
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bpe_tokens_native"
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)

    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    // per-executor word memo: ConcurrentHashMap because one reference object
    // serves every task thread; bounded so an adversarial vocabulary cannot
    // grow it without limit (clear-on-full beats eviction bookkeeping at
    // this hit-rate profile — Zipf traffic refills the head instantly)
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
    private val MemoMax = 65536

    private def encodeCached(w: String): Array[UTF8String] = {
      val hit = memo.get(w)
      if (hit != null) return hit
      val enc = encodeWord(w, ranks).map(UTF8String.fromString).toArray
      if (memo.size() >= MemoMax) memo.clear()
      memo.put(w, enc)
      enc
    }

    def encode(words: ArrayData): ArrayData = {
      val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      var i = 0
      val n = words.numElements()
      while (i < n) {
        val w = words.getUTF8String(i)
        if (w != null) out ++= encodeCached(w.toString)
        i += 1
      }
      new GenericArrayData(out.toArray[Any])
    }

    override protected def nullSafeEval(v: Any): Any =
      encode(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeTokensExpr", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
    }
  }
}
