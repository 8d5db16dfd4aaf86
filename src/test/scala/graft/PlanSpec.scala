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

  test("minhash dedup: bucket equi-join, no cartesian product") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = TextKernels.wordShingles2(TextKernels.wordTokens(col("text")))
    val plan = planOf(Dedup.minhashPairs(docs, "doc_id", sh, 0.8))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("embedding near-dup: signature-bucket equi-join, no cartesian product") {
    val plan = planOf(Queries.all("q_dedup_embedding")(spark, dir))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("windowed aggregation: map-side partial aggregation before the shuffle") {
    val plan = planOf(Queries.all("q_window_agg")(spark, dir))
    // two HashAggregate nodes (partial + final) around one Exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
    assert(plan.contains("Exchange"))
  }
}
