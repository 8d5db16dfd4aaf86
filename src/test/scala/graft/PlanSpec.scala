package graft

import org.apache.spark.sql.functions._

import graft.functions.TextKernels
import graft.operators.Dedup

/** Physical-plan assertions that lock in the scale design (SURVEY.md §7.2,
  * COVERAGE.md scale notes): top-k must be TakeOrderedAndProject, the
  * rank-aggregation join must broadcast the candidate set, scans must prune
  * columns, and no candidate-generation path may degenerate into a
  * cartesian product. */
class PlanSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("singleton top-k: TakeOrderedAndProject over a pruned parquet scan") {
    val plan = planOf(Queries.all("q_num_topk")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_acctbal:double>"),
      "scan must read only the two needed columns")
    assert(!plan.contains("Exchange"), "no shuffle for a singleton top-k")
  }

  test("rank aggregation: broadcasts the candidate set, never shuffles a facet table") {
    val plan = planOf(Queries.all("q_multifacet")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"),
      "facet scans must stream against the broadcast candidates")
  }

  test("multimodal pipeline: every near-dup stage is a bucketed " +
    "equi-join and every keep-survivors step an anti-join — no cartesian " +
    "product or nested-loop join anywhere in the composition") {
    val plan = planOf(Queries.all("q_pipeline_mm")(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    // the dropped-id sets are tiny: the anti-joins must broadcast them,
    // never shuffle the survivor side
    assert(plan.contains("LeftAnti"), "keep-survivors must be anti-joins")
    assert(!plan.contains("SortMergeJoin(leftanti"),
      "anti-joins must broadcast the bounded dropped-id sets")
  }

  test("minhash dedup: bucket equi-join, no cartesian product") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = TextKernels.wordShingles2(TextKernels.wordTokens(col("text")))
    val plan = planOf(Dedup.minhashPairs(docs, "doc_id", sh, 0.8))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("incremental dedup: the batch side broadcasts against the stored " +
    "index even when the batch source has no size statistics") {
    // an in-memory batch (the streaming micro-batch shape) carries no
    // stats; without the explicit hint the planner could fall into a
    // sort-merge join that shuffles the ENTIRE stored band index per batch
    val sh = TextKernels.wordShingles2(TextKernels.wordTokens(col("text")))
    val path = java.nio.file.Files.createTempDirectory("graft-planidx").toString + "/idx"
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    Dedup.writeBandIndex(corpus, "doc_id", sh, path)
    val batch = Seq((900001L, "some fresh batch text here")).toDF("doc_id", "text")
    val plan = planOf(Dedup.incrementalPairs(batch, "doc_id", sh, path, 0.8))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      "the stored band index must never shuffle per ingestion batch")
    val exact = planOf(Dedup.incrementalExact(batch, "doc_id", col("text"),
      { val p = path + "-fp"; Dedup.writeFingerprintIndex(corpus, "doc_id", col("text"), p); p }))
    assert(exact.contains("BroadcastHashJoin"), exact.take(800))
  }

  test("winnow pairs: fingerprint equi-join only, no cartesian product") {
    val plan = planOf(Queries.all("q_winnow")(spark, dir))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("winnow spans: fingerprint equi-join only; the run window " +
    "partitions by (pair, diagonal), never a global single-partition sort") {
    val plan = planOf(Queries.all("q_winnow_spans")(spark, dir))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("windowspecdefinition(a#") ||
      plan.contains("PartitionSpec: a"), plan.take(400))
  }

  test("unigram LM quality: the vocab broadcasts into the token stream — " +
    "corpus tokens never shuffle for the scoring join") {
    // NOTE this lock is stats-dependent by design: there is no explicit
    // broadcast hint (the vocabulary is corpus-derived and unbounded, so a
    // threshold-exceeding vocab SHOULD fall back to a shuffled join at
    // true scale); the assertion pins the small-vocab planning behavior,
    // not an unconditional contract.
    val plan = planOf(Queries.all("q_lm_quality")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"),
      "the corpus token stream must not shuffle against the vocabulary")
  }

  test("embedding near-dup: signature-bucket equi-join, no cartesian product") {
    val plan = planOf(Queries.all("q_dedup_embedding")(spark, dir))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("bucketed tables: co-located join plans without a shuffle") {
    import spark.implicits._
    // warehouse.dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    val a = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "x")
    val b = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "y")
    a.write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("graft_bucket_a")
    b.write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("graft_bucket_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a merge join
      val joined = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        "bucketed-by-join-key tables must join without shuffling:\n" + plan.take(800))
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("IVF ANN: single scan, cluster filter, shuffle-free top-k") {
    val plan = planOf(Queries.all("q_ann_ivf")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
    // the only allowed Exchange is spread()'s round-robin split of the
    // single-file test source — no hash/range shuffle of the corpus
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      "IVF probe must stay a scan+filter+top-k, no key shuffle:\n" + plan.take(800))
    assert(!plan.contains("CartesianProduct"))
  }

  test("salted skew join: shuffle join on the salted key, no broadcast of the large side") {
    val plan = planOf(Queries.all("q_skew_join")(spark, dir))
    assert(!plan.contains("CartesianProduct"))
    // the small side is replicated via explode, then joined on (key, salt)
    assert(plan.contains("Generate") || plan.contains("explode"),
      "salt replication must appear in the plan:\n" + plan.take(800))
  }

  test("windowed aggregation: map-side partial aggregation before the shuffle") {
    val plan = planOf(Queries.all("q_window_agg")(spark, dir))
    // two HashAggregate nodes (partial + final) around one Exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
    assert(plan.contains("Exchange"))
  }

  test("line dedup: first-occurrence selection is an AGGREGATE with " +
    "map-side partial combine, not a window over partitionBy(line), and " +
    "there are no joins") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(Dedup.lineDedup(docs, "doc_id", col("text")))
    // partial+final pairs for both groupBys: a boilerplate line repeated
    // on a billion pages must leave each map partition once, not shuffle
    // every copy to one reducer
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(plan).size >= 4, plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("Window"), "first-occurrence must not be a window")
    assert(!plan.contains("Join"), "lineDedup needs no join")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("repetition signals: a narrow per-row map — no shuffle, no window, " +
    "pruned scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val w = graft.functions.TextKernels.wordTokens(col("text"))
    val plan = planOf(docs.select(col("doc_id"),
      graft.functions.TextKernels.topBigramFraction(w).as("tb"),
      graft.functions.TextKernels.dupNgramFraction(w, 5).as("d5")))
    assert(!plan.contains("Exchange"), "repetition signals must not shuffle")
    assert(!plan.contains("Window"))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("hash sample: a narrow filter — no shuffle, no window, pruned scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(graft.operators.Sampling.sample(docs, col("doc_id"), 37)
      .select("doc_id", "lang"))
    assert(!plan.contains("Exchange"), "sampling must not shuffle")
    assert(!plan.contains("Window"))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "scan must prune to the two projected columns")
  }

  test("stratified sample: salted rank — the data window partitions by " +
    "(stratum, salt), offsets broadcast back, no single-partition stage") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(graft.operators.Sampling.stratified(
      docs, col("lang"), col("doc_id"), 0.3))
    // the row_number over the data must include the salt in its partition
    // spec — a per-stratum-only window would serialize a hot stratum
    assert("row_number\\(\\) windowspecdefinition\\(__st#\\d+, __salt#\\d+".r
      .findFirstIn(plan).isDefined,
      s"data rank must partition by (stratum, salt):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      "per-bucket base offsets must broadcast-join back onto the data")
    assert(!plan.contains("Exchange SinglePartition") &&
      !plan.contains("Exchange rangepartitioning"),
      "no global sort/single-partition stage")
  }

  test("multi-probe LSH: a narrow isin bucket filter feeding a map-side " +
    "top-k — no shuffle anywhere") {
    val plan = planOf(Queries.all("q_ann_lsh_mp")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a map-side heap:\n$plan")
    // the only Exchange is the query helper's round-robin spread of the
    // tiny test parquet; the LSH probe itself induces no repartitioning
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange SinglePartition") &&
      !plan.contains("Exchange rangepartitioning"),
      s"bucket probe + re-rank must not shuffle:\n$plan")
  }

  test("packing: per-bucket windows plus a broadcast of the bucket offsets — " +
    "never a global single-partition window over the data") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(graft.operators.Packing.packOffsets(docs,
      col("doc_id"), size(TextKernels.wordTokens(col("text"))), 2048L))
    assert(plan.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast-join back onto the data")
    // the only SinglePartition exchange feeds the bucket-totals prefix sum
    // (|buckets| rows), downstream of a partial aggregation
    val dataWindows = "Window \\[sum".r.findAllIn(plan).size
    assert(dataWindows >= 1 && plan.contains("Exchange hashpartitioning"),
      "per-bucket running sums must be hash-partitioned by bucket")
  }

  test("budget select: windows partition by the quantized-quality bucket " +
    "and offsets broadcast back — never a global-sort window over the data") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(graft.operators.Packing.budgetSelect(docs,
      col("doc_id"), size(TextKernels.wordTokens(col("text"))),
      col("n_chars"), 12000L))
    assert(plan.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast-join back onto the data")
    assert(plan.contains("Exchange hashpartitioning"),
      "per-bucket running sums must be hash-partitioned by bucket")
  }

  test("cluster propagation round: equi-joins only, no cartesian product") {
    // force the distributed propagation loop (the local union-find fast
    // path has no plan to audit)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val plan = planOf(graft.operators.Dedup.clusters(pairs, localEdgeLimit = 0L))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("simhash pairs: band-bucket equi-join, verify inside the join, " +
      "first-band dedup instead of a distinct, no cartesian") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(Dedup.simhashPairs(docs, "doc_id",
      TextKernels.wordTokens(col("text"))))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the hamming verify must run INSIDE the band join (bit_count in the
    // plan): on a self-similar corpus raw candidates can be 1000x the
    // verified pairs, and a verify-after-shuffle plan would move all of
    // them. Cross-band duplicate pairs are removed by the row-local
    // first-agreeing-band condition (shiftrightunsigned comparisons in
    // the join filter) — there must be NO distinct aggregate over the
    // verified pair stream (the pre-r16 shape paid an exchange + two
    // HashAggregates for it); the only aggregate upstream of the
    // expansion joins is the signature-stats groupBy.
    val filterIdx = plan.indexOf("bit_count")
    assert(filterIdx >= 0,
      "hamming verify must run inside the join:\n" + plan.take(1200))
    assert(plan.contains("shiftrightunsigned"),
      "first-agreeing-band dedup filter missing:\n" + plan.take(1200))
  }

  test("contamination: eval shingle set broadcasts into the corpus scan") {
    val plan = planOf(Queries.all("q_contamination")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "the eval shingle set must broadcast:\n" + plan.take(800))
    assert(!plan.contains("CartesianProduct"))
  }

  test("explode-heavy operators: no tokenization expression sinks into the file scan") {
    // InferFiltersFromGenerate + pushdown can drag a composed shingle/token
    // expression below the spread repartition onto the raw (often
    // 1-partition) scan, serializing the corpus tokenization onto one core.
    // The explode_outer + not-null guard keeps the scan's DataFilters free
    // of higher-order functions. (q_pipeline is exempt: its QUALITY filter
    // size(tokens) >= 40 is a user predicate, and filtering at the scan is
    // the scale-correct plan — fewer rows materialize; only the
    // single-file local fixture serializes it.)
    for (q <- Seq("q_contamination", "q_tfidf")) {
      val plan = planOf(Queries.all(q)(spark, dir))
      val scanLines = plan.linesIterator.filter(_.contains("FileScan")).toSeq
      assert(scanLines.nonEmpty)
      scanLines.foreach(l => assert(!l.contains("lambdafunction"),
        s"$q: a lambda (tokenization) reached the scan filters:\n${l.take(400)}"))
    }
  }

  test("quantization: per-dim stats broadcast back; the corpus is never key-shuffled") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val plan = planOf(graft.operators.Quantize.int8(emb, col("vec_id"), col("v")))
    assert(plan.contains("BroadcastHashJoin"),
      "the 64-row dim-stats frame must broadcast:\n" + plan.take(800))
    assert(!plan.contains("CartesianProduct"))
    // the only hash shuffle feeds the 64-group stats aggregate (with a
    // partial aggregate below it), not the exploded corpus join
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "dim stats must partial-aggregate map-side")
  }

  test("compaction: two-phase max(struct) aggregate, no window over raw events") {
    val plan = planOf(Queries.all("q_compact")(spark, dir))
    assert("HashAggregate".r.findAllIn(plan).size >= 2 ||
      "SortAggregate".r.findAllIn(plan).size >= 2,
      "keep-latest must map-side combine:\n" + plan.take(800))
    assert(!plan.contains("Window"), "no row_number window over the full event stream")
  }

  test("weight estimation (R7): TakeOrdered tail, no unpartitioned window") {
    // the engine's estimateWeight must fetch its 2 interpolation rows via a
    // shuffle-free inverted TakeOrdered heap — a global Window.orderBy would
    // move 100% of the facet into ONE task to read 2 rows
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("id"),
        exp(lit(-0.05) * abs(col("c_acctbal") - lit(5000.0))).as("s"))
    val n = c.count()
    val plan = planOf(graft.engine.SimSearchEngine.weightTail(c, n, n - 11))
    assert(plan.contains("TakeOrderedAndProject"),
      "the tail fetch must be a TakeOrdered heap:\n" + plan.take(800))
    assert(!plan.contains("Window"), "no window over the full facet")
    assert(!plan.contains("Exchange SinglePartition") &&
      !plan.contains("rangepartitioning"),
      "no global sort / single-partition stage:\n" + plan.take(800))
  }

  test("tf-idf: corpus size joins as a broadcast, term/doc shuffles are hash-keyed") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(graft.operators.TfIdf.topTerms(docs,
      col("doc_id"), TextKernels.wordTokens(col("text")), 3))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "the 1-row corpus count must broadcast")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("pq ADC top-k: one scan, kernel scoring inside codegen, TakeOrdered — " +
    "no shuffle, no sort, no join") {
    val plan = planOf(Queries.all("q_pq_topk")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      "ADC top-k must be a TakeOrdered heap:\n" + plan.take(800))
    assert(plan.contains("pq_adc_native") && plan.contains("pq_encode_native"),
      "both PQ kernels must appear in the plan:\n" + plan.take(800))
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("Join"),
      "a flat ADC scan must not shuffle or join:\n" + plan.take(800))
    // (kernel codegen itself is strict-compiled in BandKeysCodegenSpec's
    // style via PqSpec's composed-twin bit-identity run)
  }

  test("semdedup: the within-cluster compare is a hash equi-join on the " +
    "cluster id — never a cartesian") {
    val plan = planOf(Queries.all("q_semdedup")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "within-cluster pairs must ride an equi-join:\n" + plan.take(1200))
    assert(plan.contains("nearest_centroid_native") ||
      plan.contains("array_position"),
      "cluster assignment must be the shared ivfCluster expression")
  }

  test("decontaminate: eval union broadcasts; the flagged-id anti-join never " +
    "plans a cartesian") {
    val plan = planOf(Queries.all("q_decontaminate")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "the eval shingle union must broadcast:\n" + plan.take(800))
    assert(plan.contains("LeftAnti"), "removal must be an anti-join")
    assert(!plan.contains("CartesianProduct"))
  }
}
