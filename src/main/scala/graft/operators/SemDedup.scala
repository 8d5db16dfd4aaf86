package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeKernels

/** SemDeDup-style semantic deduplication (Abbas et al., arXiv:2303.09540):
  * cluster document embeddings with a coarse quantizer, compare embeddings
  * only WITHIN each cluster, and keep one representative of every group of
  * semantically near-identical documents. The within-cluster restriction is
  * the algorithm's scale contract — cross-cluster near-duplicates are missed
  * by design, in exchange for turning the all-pairs O(N²) comparison into
  * k independent O((N/k)²) blocks.
  *
  * Scale design (100 TB): the comparison is a self-equi-join on the cluster
  * id — both sides shuffle ONCE on `cluster`, and each cluster's pairs are
  * produced by one task. The quadratic term is bounded by the largest
  * cluster, so k is the knob: pick k ≈ N / targetClusterSize (the paper
  * runs k in the tens of thousands at web scale) and train with
  * [[AnnSearch.kmeans]] on a sample. A mega-cluster (mass of boilerplate
  * embeddings) is the skew hazard; salting cannot help here, because a
  * within-cluster join salted on both sides would drop cross-salt pairs.
  * [[clusterSizes]] gauges the hazard; [[pairsSplit]]/[[dedupSplit]]
  * close it automatically by re-clustering the heavy clusters with a
  * finer quantizer before the join.
  *
  * Complements [[graft.Queries]]' LSH embedding dedup (`q_dedup_embedding`):
  * LSH banding catches near-identical vectors regardless of global
  * structure; SemDeDup exploits a trained partition of the embedding space
  * and is the shape used for LAION/web-corpus curation.
  */
object SemDedup {

  /** Within-cluster near-duplicate pairs: (a, b, cluster, cos) with a < b
    * and cosine(va, vb) >= minCos, where both ids landed in the same
    * centroid bucket ([[AnnSearch.ivfCluster]] — L2, ties to the lowest
    * index). Cosines are rounded to `roundTo` decimals BEFORE the
    * threshold so the admitted pair set is stable across engines and
    * replans (a raw IEEE comparison flips on the last ulp when an engine
    * reorders the accumulation); pass roundTo < 0 for raw comparison. */
  def pairs(emb: DataFrame, id: Column, vec: Column,
      centroids: Seq[Seq[Double]], minCos: Double,
      roundTo: Int = 6): DataFrame = {
    val assigned = Dedup.spread(emb)
      .select(id.as("id"), vec.as("v"))
      .withColumn("cluster", AnnSearch.ivfCluster(col("v"), centroids))
    val a = assigned.select(col("cluster"), col("id").as("a"), col("v").as("va"))
    val b = assigned.select(col("cluster"), col("id").as("b"), col("v").as("vb"))
    val cos = NativeKernels.cosineSim(col("va"), col("vb"))
    val cosR = if (roundTo >= 0) round(cos, roundTo) else cos
    a.join(b, Seq("cluster"))
      .where(col("a") < col("b"))
      .withColumn("cos", cosR)
      .where(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cluster"), col("cos"))
  }

  /** Per-cluster row counts for a centroid list — the pre-flight skew
    * gauge: the within-cluster join's cost is Σ size², so ONE mega-cluster
    * dominates the whole job (measured in ScaleProbe: centroids drawn from
    * one corner of the space made a 16x run 200x slower than the same run
    * with hash-uniform centroids). One map-side-combined aggregate over k
    * groups; when max(n) is far above N/k, raise k or re-train the
    * quantizer on a representative sample before paying for [[pairs]]. */
  def clusterSizes(emb: DataFrame, vec: Column,
      centroids: Seq[Seq[Double]]): DataFrame =
    Dedup.spread(emb)
      .select(AnnSearch.ivfCluster(vec, centroids).as("cluster"))
      .groupBy("cluster").agg(count(lit(1)).as("n"))

  /** [[pairs]] with mega-cluster AUTO-SPLIT — closing the loop the
    * [[clusterSizes]] gauge only measures: clusters whose row count
    * exceeds `splitFactor` times the mean are re-clustered with a finer
    * k-means ([[AnnSearch.kmeans]] over just that cluster's rows, subK
    * sized to bring its blocks back to the mean), and the within-cluster
    * join runs on the composite (cluster, sub) key. The Σ size² term —
    * the whole cost of SemDeDup — is then bounded by the target block
    * size even when the quantizer was trained badly (the ScaleProbe
    * corner-centroid case: one cluster holding most of a 16x corpus made
    * the join ~45x slower than uniform clustering).
    *
    * Semantics: sub-splitting is MORE of the SemDeDup contract, not a
    * divergence — pairs crossing a sub-block boundary are missed exactly
    * like pairs crossing a cluster boundary always were; near-identical
    * embeddings land in the same sub-block for the same reason they land
    * in the same cluster. On a corpus with no mega-cluster (max size <=
    * splitFactor x mean) no split triggers and the result equals
    * [[pairs]] row for row.
    *
    * Driver cost: one k-row size aggregate, then one bounded kmeans per
    * heavy cluster — at most `maxHeavy` of them (the heaviest first; a
    * quantizer bad enough to produce more than maxHeavy mega-clusters
    * should be re-trained, not patched). The returned plan recomputes the
    * assignment kernel once instead of holding a cache pin across the
    * caller's lifetime. */
  def pairsSplit(emb: DataFrame, id: Column, vec: Column,
      centroids: Seq[Seq[Double]], minCos: Double, roundTo: Int = 6,
      splitFactor: Double = 4.0, maxSub: Int = 64,
      maxHeavy: Int = 32): DataFrame = {
    val assigned = Dedup.spread(emb)
      .select(id.as("id"), vec.as("v"))
      .withColumn("cluster", AnnSearch.ivfCluster(col("v"), centroids))
      .persist()
    val subCents: Seq[(Int, Seq[Seq[Double]])] =
      try {
        val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1))
        val total = sizes.map(_._2).sum
        val target = math.max(1.0, total.toDouble / math.max(centroids.size, 1))
        sizes.filter(_._2 > splitFactor * target)
          .sortBy { case (c, n) => (-n, c) }.take(maxHeavy).toSeq
          .map { case (c, n) =>
            val subK = math.min(maxSub, math.max(2, math.ceil(n / target).toInt))
            c -> AnnSearch.kmeans(assigned.where(col("cluster") === c),
              "id", col("v"), subK, iters = 5)
          }
      } finally assigned.unpersist()
    // fresh plan: one assignment pass at execution time, no cache pin
    val base = Dedup.spread(emb)
      .select(id.as("id"), vec.as("v"))
      .withColumn("cluster", AnnSearch.ivfCluster(col("v"), centroids))
    val withSub = base.withColumn("sub",
      subCents.foldLeft(lit(0)) { case (acc, (c, cents)) =>
        when(col("cluster") === c, AnnSearch.ivfCluster(col("v"), cents))
          .otherwise(acc)
      })
    val a = withSub.select(col("cluster"), col("sub"),
      col("id").as("a"), col("v").as("va"))
    val b = withSub.select(col("cluster"), col("sub"),
      col("id").as("b"), col("v").as("vb"))
    val cos = NativeKernels.cosineSim(col("va"), col("vb"))
    val cosR = if (roundTo >= 0) round(cos, roundTo) else cos
    a.join(b, Seq("cluster", "sub"))
      .where(col("a") < col("b"))
      .withColumn("cos", cosR)
      .where(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cluster"), col("cos"))
  }

  /** [[dedup]] on the auto-split pairs ([[pairsSplit]]) — the variant a
    * pipeline should reach for when the quantizer's quality is not under
    * its control. */
  def dedupSplit(emb: DataFrame, id: Column, vec: Column,
      centroids: Seq[Seq[Double]], minCos: Double, roundTo: Int = 6,
      splitFactor: Double = 4.0, maxSub: Int = 64,
      maxHeavy: Int = 32): DataFrame = {
    val prs = pairsSplit(emb, id, vec, centroids, minCos, roundTo,
      splitFactor, maxSub, maxHeavy)
    val losers = Dedup.clusters(prs, "a", "b")
      .where(col("n") =!= col("c"))
      .select(col("n").as("__sem_loser"))
    emb.join(losers, id === col("__sem_loser"), "left_anti")
  }

  /** The kept rows after semantic dedup: one representative — the MINIMUM
    * id — per connected component of the within-cluster near-duplicate
    * graph ([[pairs]] -> [[Dedup.clusters]]); rows in no component survive
    * untouched. Returns `emb`'s rows (original columns intact) for the
    * kept ids. The loser set is bounded by the duplicate mass, not the
    * corpus, so AQE turns the anti-join into a broadcast when duplicates
    * are rare (the common curated-corpus case). */
  def dedup(emb: DataFrame, id: Column, vec: Column,
      centroids: Seq[Seq[Double]], minCos: Double,
      roundTo: Int = 6): DataFrame = {
    val prs = pairs(emb, id, vec, centroids, minCos, roundTo)
    val losers = Dedup.clusters(prs, "a", "b")
      .where(col("n") =!= col("c"))
      .select(col("n").as("__sem_loser"))
    emb.join(losers, id === col("__sem_loser"), "left_anti")
  }
}
