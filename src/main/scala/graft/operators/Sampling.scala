package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Random sampling (`df.sample`) is useless for a reproducible corpus: the
  * kept set changes with partitioning, seed plumbing, and engine. These
  * operators instead key every keep/drop decision on a content hash of the
  * row id, so the same row makes the same decision on any cluster, any
  * partitioning, any engine — and re-running an incremental pipeline keeps
  * the sample consistent across corpus versions (a row's fate never depends
  * on which other rows are present).
  *
  * Scale design (100 TB): `sample` is a pure narrow filter (no shuffle, full
  * codegen, pushes past column pruning). `stratified` is skew-safe: it never
  * ranks a whole stratum through one task. The global in-stratum hash order
  * is decomposed by a SALT taken from the md5 prefix — because the salt is an
  * order-preserving prefix of the very key the rank sorts by, salt buckets
  * are contiguous runs of the global order, so
  * `global rank = (rows of the stratum in smaller salt buckets) + local rank`
  * holds exactly. A 90 %-of-corpus stratum therefore sorts as 256 parallel
  * (stratum, salt) partitions plus one broadcast of per-bucket base offsets
  * (the `Packing.packOffsets` prefix-sum pattern); no partition ever holds
  * more than ~1/256 of the hottest stratum.
  */
object Sampling {

  /** Portable hash bucket in [0, 100): the first 6 hex chars of md5(id) as
    * an integer, mod 100. md5 of the decimal string renders identically in
    * every engine, so the bucket — and the sample — is engine-independent. */
  def hashPct(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long"), lit(100L))

  /** Keep ~pct % of rows, deterministically by id hash. */
  def sample(df: DataFrame, id: Column, pct: Int): DataFrame =
    df.where(hashPct(id) < pct)

  /** Portable hash bucket in [0, 1e6): parts-per-million resolution for
    * decisions finer than [[hashPct]]'s 1 % — the first 8 hex chars of
    * md5(id) as an integer, mod 1e6. Same portability contract. */
  def hashPpm(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(1000000L))

  /** Deterministic train/validation/test split: label every row with the
    * name of the first cumulative-weight boundary its ppm id-hash falls
    * under — the standard 98/1/1 holdout assignment as ONE narrow codegen
    * projection (no shuffle, no RNG state, no sort). Weights are
    * normalized (they need not sum to 1) and the boundaries are integer
    * ppm, so the assignment is a pure integer comparison: identical on any
    * engine, partitioning, or rerun — and a row KEEPS its split as the
    * corpus around it grows, so incremental ingestion can never leak a
    * validation document into a later training epoch (the property
    * `randomSplit` famously lacks). */
  def splitByHash(df: DataFrame, id: Column, splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splitByHash needs at least one split")
    require(splits.forall(_._2 > 0),
      s"split weights must be positive: $splits")
    val total = splits.map(_._2).sum
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w / total * 1000000L))
    val h = hashPpm(id)
    val labeled = splits.zip(bounds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), b)) =>
        Some(acc.fold(when(h < lit(b), name))(_.when(h < lit(b), name)))
    }.get
    // the last boundary is exactly 1e6, so the fallback only absorbs a
    // pathological rounding of near-zero trailing weights
    df.withColumn(outCol, coalesce(labeled, lit(splits.last._1)))
  }

  /** Per-row RATE sampling: keep each row with probability ~rate%, where
    * the rate is a COLUMN — the continuous generalization of [[sample]]
    * (constant rate) and [[mix]] (per-group literal rates). This is the
    * quality-temperature mix primitive: feed any acceptance curve computed
    * from the row itself (`least(lit(100), quality * 20)`, a language
    * up-weight, a length damp) and the kept set is deterministic per id —
    * reproducible across engines, partitionings, and reruns, unlike
    * `rand()`-based weighted sampling. A narrow filter: no shuffle, no
    * join, no RNG state. Resolution is 1 % (the portable 100-bucket hash);
    * rates outside [0, 100] clamp naturally (<= 0 keeps nothing,
    * >= 100 keeps everything). */
  def byRate(df: DataFrame, id: Column, rate: Column): DataFrame =
    df.where(hashPct(id) < rate)

  /** Rows of the offsets frame above which [[stratified]] stops hinting a
    * broadcast and lets the planner pick the join (a high-cardinality
    * stratum column times 16^saltWidth buckets can outgrow driver memory —
    * the offsets frame is counted, it is materialized-tiny by construction
    * for normal stratum cardinalities). */
  private val BroadcastOffsetsMaxRows = 1000000L

  /** Stratified sample: keep floor(frac * |stratum|) rows per stratum,
    * chosen in deterministic hash order (md5 of the id, id as tiebreak).
    * Guarantees exact per-stratum quotas — the proportional mix survives
    * sampling even when strata are heavily imbalanced.
    *
    * Salted two-level rank (see scale note above): the salt is the first
    * `saltWidth` hex chars of the md5 sort key, so within a stratum every
    * salt bucket is a contiguous run of the global (md5, id) order. Local
    * ranks are a window over (stratum, salt) — 16^saltWidth-way parallel
    * even for one giant stratum — and the per-bucket base offsets (a
    * |strata|·16^saltWidth-row frame) prefix-sum on the stratum and
    * broadcast back (planner's choice above [[BroadcastOffsetsMaxRows]]).
    * Identical kept set to a single per-stratum `row_number`, without its
    * single-task sort, at ANY width — the salt is an order-preserving
    * prefix, so bucket boundaries never split the (md5, id) order.
    *
    * Sizing `saltWidth`: the hottest stratum sorts as 16^saltWidth window
    * partitions, so each task holds ~|hottest| / 16^saltWidth rows. Default
    * 2 (256 buckets) keeps a 1 TB stratum at ~4 GB per task; at 100 TB with
    * ~90 % single-stratum skew use 3 (4096 buckets, ~25 GB/stratum-TB → task
    * rows back under spill limits). Width trades window parallelism against
    * offsets-frame size (|strata| × 16^saltWidth rows). 0 = unset: resolve
    * from the session conf ([[graft.api.Knobs.SampleSaltWidth]], default 2),
    * so a deployment retunes the width without touching call sites. */
  def stratified(df: DataFrame, stratum: Column, id: Column, frac: Double,
      saltWidth: Int = 0): DataFrame =
    keepByRank(df, stratum, id, saltWidth, total => floor(total * frac))

  /** Per-key cap: keep at most `cap` rows per key, chosen in the same
    * deterministic hash order as [[stratified]] — the anti-domination pass
    * of a crawl pipeline (one mirror farm or link-spam domain must not be
    * 30 % of the training mix; capping docs-per-domain is standard
    * curation practice). Same salted two-level rank underneath, so a
    * domain with a billion pages ranks as 16^saltWidth parallel runs —
    * the hot-domain case is exactly the skew this machinery exists for. */
  def capPerKey(df: DataFrame, key: Column, id: Column, cap: Long,
      saltWidth: Int = 0): DataFrame = {
    require(cap >= 0, s"cap $cap must be >= 0")
    keepByRank(df, key, id, saltWidth, _ => lit(cap))
  }

  /** Shared salted-rank keep: rows whose global in-stratum rank (by
    * (md5(id), id)) is <= `quota`(per-stratum total). See [[stratified]]'s
    * scale note — this is the decomposition that never sorts a whole
    * stratum through one task. */
  private def keepByRank(df: DataFrame, stratum: Column, id: Column,
      saltWidth: Int, quota: Column => Column): DataFrame = {
    val width =
      if (saltWidth != 0) saltWidth
      else df.sparkSession.conf.get(graft.api.Knobs.SampleSaltWidth, "2").toInt
    require(width >= 1 && width <= 8,
      s"saltWidth $width out of [1, 8] (16^width window partitions per stratum)")
    val keyed = df.withColumn("__st", stratum)
      .withColumn("__md5", md5(id.cast("string")))
      .withColumn("__salt", substring(col("__md5"), 1, width))
    val local = keyed.withColumn("__rn", row_number().over(
      Window.partitionBy(col("__st"), col("__salt")).orderBy(col("__md5"), id)))
    // per-(stratum, salt) counts: base = rows of the stratum in lexically
    // smaller salt buckets (fixed-width lowercase hex, so string order ==
    // numeric order); quota = floor(|stratum| * frac). Both windows run over
    // the tiny aggregated frame, never the data.
    val offsets = keyed.groupBy(col("__st"), col("__salt")).agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(
        sum("__c").over(Window.partitionBy("__st").orderBy("__salt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__quota", quota(sum("__c").over(Window.partitionBy("__st"))))
      .select(col("__st").as("__o_st"), col("__salt").as("__o_salt"),
        col("__base"), col("__quota"))
      .cache() // tiny; counted below, then read by the join — one aggregation pass
    val joinRight =
      if (offsets.count() <= BroadcastOffsetsMaxRows) broadcast(offsets) else offsets
    local.join(joinRight,
        col("__st") <=> col("__o_st") && col("__salt") <=> col("__o_salt"))
      .where(col("__base") + col("__rn") <= col("__quota"))
      .drop("__st", "__md5", "__salt", "__rn",
        "__o_st", "__o_salt", "__base", "__quota")
  }

  /** Source/domain mixing: keep a per-group percentage of rows (hash-keyed,
    * deterministic), e.g. up-weight curated sources and down-weight crawl.
    * Groups absent from `rates` fall back to `defaultPct`. A narrow filter
    * like `sample` — the rate lookup is a literal CASE, no join. */
  def mix(df: DataFrame, group: Column, id: Column,
          rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (g, p)) =>
      when(group === g, lit(p)).otherwise(acc)
    }
    df.where(hashPct(id) < rate)
  }

  /** CCNet-style corpus-quantile bucketing: label every row by which
    * quantile band of the CORPUS-WIDE `score` distribution it falls in —
    * the head/middle/tail cut CCNet applies to its LM-perplexity signal
    * before keeping only the better bands (Wenzek et al. 2020 §4.3). The
    * cut points are parts-per-million fractions (`cutsPpm`, strictly
    * increasing, e.g. `Seq(333333L, 666667L)` for tertiles), so the
    * boundary rank `ceil(n * ppm / 1e6)` is pure 64-bit integer
    * arithmetic — identical on any engine (valid for corpora up to
    * ~9.2e12 rows before `n * ppm` would overflow a long).
    *
    * Semantics: threshold t_i is the SMALLEST score whose cumulative count
    * reaches boundary rank i; a row lands in the first band whose
    * threshold its score does not exceed. All rows sharing a score value
    * land in the same band (the percentile_disc convention), so a mass
    * point straddling a cut goes wholly to the lower band and the split is
    * deterministic under ties — band sizes are therefore >= the requested
    * fractions, not exact. Null scores get a null label and are not
    * counted in n.
    *
    * Scale design (100 TB): `score` must be INTEGRAL with bounded
    * cardinality (a ppm-scaled quality signal, a token count — anything
    * with <= ~1e7 distinct values; the cast to long is enforced here, the
    * cardinality bound is the caller's contract). The distribution then
    * aggregates with map-side combine to one row PER DISTINCT SCORE, and
    * the only unpartitioned window runs over that bounded frame — never
    * the corpus (the [[graft.operators.Packing]] discipline). Thresholds
    * reduce to ONE broadcast row and the labeling is a narrow codegen
    * projection: no corpus sort, no corpus shuffle beyond the score
    * aggregate, no driver collect.
    *
    * CACHE-WIDTH CONTRACT: `df` is cached verbatim (it feeds both the
    * threshold derivation and the label pass; without the cache an
    * expensive upstream scorer executes twice). Pass the NARROW
    * (id, score) projection and join any wide payload back afterwards —
    * a caller handing a full corpus frame caches its text columns
    * wholesale, and outside a [[graft.util.CacheScope]] that cache lives
    * until LRU eviction. */
  def quantileBuckets(df: DataFrame, score: Column, cutsPpm: Seq[Long],
      labels: Seq[String], outCol: String = "bucket"): DataFrame = {
    require(labels.size == cutsPpm.size + 1,
      s"need ${cutsPpm.size + 1} labels for ${cutsPpm.size} cuts, got ${labels.size}")
    require(cutsPpm.forall(p => p > 0 && p < 1000000L),
      s"cuts must be ppm fractions in (0, 1e6): $cutsPpm")
    require(cutsPpm == cutsPpm.sorted && cutsPpm.distinct == cutsPpm,
      s"cuts must be strictly increasing: $cutsPpm")
    val s = score.cast("long")
    // the input feeds BOTH the threshold derivation and the final label
    // pass: cached, or the caller's entire upstream DAG (often a full
    // corpus scoring pipeline — q_ppl_buckets' corpus-frequency scorer)
    // executes twice. Callers pass the narrow (id, score) projection.
    val in = graft.util.CacheScope.register(df.cache())
    val dist = in.select(s.as("__qb_s")).where(col("__qb_s").isNotNull)
      .groupBy("__qb_s").agg(count(lit(1)).as("__qb_c"))
    val cum = dist.select(col("__qb_s"),
      sum("__qb_c").over(Window.orderBy("__qb_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("__qb_cum"),
      sum("__qb_c").over(Window.partitionBy()).as("__qb_n"))
    // ceil(n * ppm / 1e6) in integer arithmetic — `div`, not `/`, because
    // Spark's `/` on longs is DOUBLE division and n * ppm exceeds a
    // double's 53-bit mantissa long before it overflows a long
    val thrCols = cutsPpm.zipWithIndex.map { case (p, i) =>
      min(when(col("__qb_cum") >=
        expr(s"(__qb_n * ${p}L + 999999L) div 1000000L"),
        col("__qb_s"))).as(s"__qb_t$i")
    }
    val thr = cum.agg(thrCols.head, thrCols.tail: _*)
    val label = cutsPpm.indices.foldRight(lit(labels.last): Column) {
      case (i, rest) => when(s <= col(s"__qb_t$i"), labels(i)).otherwise(rest)
    }
    in.crossJoin(broadcast(thr))
      .withColumn(outCol, when(s.isNull, lit(null)).otherwise(label))
      .drop(cutsPpm.indices.map(i => s"__qb_t$i"): _*)
  }
}
