package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import PortableHash.hash60

/** Deterministic sampling & dataset-split operators for training-data
  * pipelines. Everything is derived from the portable md5 hash of the
  * row id, so splits are (a) reproducible across runs/engines — the
  * DuckDB oracle recomputes them exactly, (b) stable under re-partition
  * and re-ingestion (a row's split never depends on which executor saw
  * it), and (c) join-free: assignment is a pure projection.
  *
  * The reference splits workloads with pandas `sample(frac)`
  * (dqo/datasets/__init__.py:244-273); these are the corpus-scale
  * equivalents of that capability.
  */
object Sampling {

  /** Per-row hash in [0, 100): the split die. Keyed on (salt, strata,
    * id) so each stratum rolls independently and different salts give
    * independent splits.
    */
  private def die(salt: String, strata: Column, id: Column): Column =
    hash60(concat(lit(salt), lit(":"), strata.cast("string"), lit(":"), id.cast("string"))) % 100

  /** Assign train/valid/test labels, stratified: within every stratum
    * the hash die is independent and uniform, so each stratum lands
    * `trainPct`/`validPct`/rest in expectation regardless of stratum
    * size skew. Pure projection — no shuffle, no state.
    */
  def deterministicSplit(df: DataFrame, idCol: String, strataCol: String,
                         trainPct: Int, validPct: Int,
                         salt: String = "split"): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100)
    val d = die(salt, col(strataCol), col(idCol))
    df.withColumn("split",
      when(d < trainPct, lit("train"))
        .when(d < trainPct + validPct, lit("valid"))
        .otherwise(lit("test")))
  }

  /** Sequence packing for training pipelines: concatenate documents in
    * deterministic (`groupCol`, `idCol`) order and chop the stream into
    * fixed `budget`-token training sequences — documents may straddle a
    * boundary (concat-and-chop packing, zero padding waste). Emits per
    * document the sequence it starts in (`seq_id`, local to its group)
    * and its offset inside that sequence (`seq_off`), from which a
    * writer can slice the actual token stream. Pure integer window
    * arithmetic — reproducible everywhere.
    *
    * Scale design: ONE window partitioned by `groupCol` (running token
    * sum in doc-id order) — no global ordering, no unpartitioned window;
    * parallelism = number of groups (shard the group key if a single
    * group outgrows an executor). Everything else is a projection.
    */
  def packSequences(df: DataFrame, idCol: String, groupCol: String,
                    nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // DIV, not `/`: Column./ is double division and loses exactness past
    // 2^53 cumulative tokens — realistic for a 100 TB group
    df.withColumn("start_tok", sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .select(col("*"),
        expr(s"start_tok DIV ${budget}L").as("seq_id"),
        (col("start_tok") % budget).as("seq_off"))
      .drop("start_tok")
  }

  /** Deterministic corpus shuffle into training shards: every row gets a
    * `shard` (hash-uniform in [0, shards)) and a `shard_pos` (its rank
    * inside the shard, ordered by the same hash — within a shard all
    * hashes are ≡ shard mod `shards`, so the order is still a uniform
    * scramble of that shard's rows) — a reproducible global permutation
    * materialized as N independently-shuffled shards, the layout a
    * training job reads. No global ordering anywhere: the window is
    * partitioned per shard, so parallelism = shard count (pick shards ≈
    * writer parallelism at scale).
    */
  def shuffleShards(df: DataFrame, idCol: String, shards: Int,
                    salt: String = "shuffle"): DataFrame = {
    require(shards > 0)
    val clash = df.columns.intersect(Seq("_h", "shard", "shard_pos"))
    require(clash.isEmpty, s"input columns collide with shuffleShards internals: ${clash.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val h = hash60(concat(lit(salt), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("shard", (col("_h") % shards).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("_h")
  }

  /** Fixed-size stratified sample: the `m` rows with the smallest
    * 60-bit hash per stratum (deterministic reservoir). One shuffle on
    * the stratum key; per-stratum work is a partitioned top-m, never a
    * global sort.
    *
    * Ordering uses the FULL 60-bit hash, not the 100-valued split die:
    * with only 100 distinct order values, any stratum ≫ 100·m
    * degenerates to "the lowest ids among die==0" — a systematic low-id
    * bias. The full hash makes the order a uniform permutation of the
    * stratum; `idCol` stays only as a collision tiebreak.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       m: Int, salt: String = "sample"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash60(concat(lit(salt), lit(":"),
      col(strataCol).cast("string"), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= m)
  }

  /** Split a fractional mixture weight into its deterministic parts:
    * `floor(w)` guaranteed copies plus a 60-bit hash threshold for one
    * extra copy with probability `frac(w)`. Public so oracle builders
    * can embed the SAME integer threshold the operator compares against
    * (a re-derived double would risk a one-ulp disagreement).
    */
  def mixtureParts(w: Double): (Int, Long) = {
    require(w >= 0 && w < 1000, s"unreasonable mixture weight $w")
    val whole = math.floor(w).toInt
    ((whole), math.rint((w - whole) * (1L << 60)).toLong)
  }

  /** Domain-mixture resampling: re-weight a corpus toward a target
    * domain mixture (the Pile/DoReMi-style recipe — "books ×2.5, web
    * ×0.3, drop src9") in one deterministic pass. A row in domain `d`
    * with weight `w` is emitted `floor(w)` times, plus one more iff its
    * 60-bit hash falls under `frac(w)·2^60` — so expected multiplicity
    * is exactly `w`, the decision is a pure function of (salt, id), and
    * re-runs/engines agree row-for-row. Each emitted copy carries a
    * `copy` index (0-based) so downstream shuffles/packing treat
    * upsampled copies as distinct rows.
    *
    * Scale design: zero shuffles and zero joins — the weight lookup is
    * a literal CASE chain (domains are few), the copy fan-out is an
    * in-row `explode(sequence(...))` bounded by `ceil(max weight)`, and
    * everything stays inside WholeStageCodegen. At 100 TB this is the
    * only sane shape: any join against a weights table would shuffle
    * the corpus; hash-thresholding never moves a row.
    */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
                    weights: Map[String, Double], defaultWeight: Double = 1.0,
                    salt: String = "mix"): DataFrame = {
    val h = hash60(concat(lit(salt), lit(":"), col(idCol).cast("string")))
    def copiesFor(w: Double): Column = {
      val (whole, thresh) = mixtureParts(w)
      lit(whole) + when(h < thresh, 1).otherwise(0)
    }
    val copies = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("int")) { case (acc, (dom, w)) =>
        when(col(domainCol) === dom, copiesFor(w)).otherwise(acc)
      }
    df.withColumn("__copies", coalesce(copies, copiesFor(defaultWeight)))
      .where(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Leakage-safe train/valid/test split: the hash die rolls on the
    * GROUP id, not the row id, so every member of a group lands in the
    * same split by construction. The group is typically a near-duplicate
    * cluster ([[Dedup.connectedComponents]]): a per-row split would put
    * one copy of a near-duplicated document in train and another in
    * test, and the eval set silently scores memorization — the classic
    * contamination-through-duplication bug this operator exists to
    * prevent.
    *
    * Pure projection over the labeled frame — no shuffle, no state; the
    * expensive part (clustering) is the caller's input, reused as-is.
    */
  def splitByGroup(labeled: DataFrame, groupCol: String,
                   trainPct: Int, validPct: Int,
                   salt: String = "gsplit"): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100)
    val d = hash60(concat(lit(salt), lit(":"), col(groupCol).cast("string"))) % 100
    labeled.withColumn("split",
      when(d < trainPct, lit("train"))
        .when(d < trainPct + validPct, lit("valid"))
        .otherwise(lit("test")))
  }

  /** Contiguous global training order: every row gets `train_pos` ∈
    * [0, N), its rank in the corpus-wide permutation ordered by the
    * portable hash (`idCol` breaks the ~2⁻⁶⁰ collisions). The order a
    * data loader replays for epoch determinism — unlike
    * [[shuffleShards]] (per-shard positions), positions here are
    * globally contiguous.
    *
    * Scale design: NO global-window `row_number` (that is one reducer
    * for the whole corpus). A range exchange on the hash key gives
    * cross-partition order; a per-partition sort gives in-partition
    * order; `monotonically_increasing_id` is then CONTIGUOUS inside
    * each partition, so `train_pos = global offset of my partition +
    * (mono − partition's min mono)`. The offsets frame is one row per
    * partition — broadcast-joined, never a shuffle of the data. One
    * persist so the offsets pass and the output pass see identical
    * partitioning. Everything stays in whole-stage codegen.
    */
  def trainingOrder(df: DataFrame, idCol: String, partitions: Int,
                    salt: String = "order"): DataFrame = {
    require(partitions > 0)
    import org.apache.spark.sql.expressions.Window
    val clash = df.columns.intersect(Seq("_ok", "_mono", "_pid", "train_pos"))
    require(clash.isEmpty, s"input columns collide with trainingOrder internals: ${clash.mkString(", ")}")
    val keyed = df
      .withColumn("_ok", hash60(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .repartitionByRange(partitions, col("_ok"), col(idCol))
      .sortWithinPartitions(col("_ok"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mono", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one tiny row per partition: how many rows precede partition p
    // globally, and p's smallest mono id (its local zero point)
    val parts = keyed.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"), min(col("_mono")).as("_lo"))
    // the frame is ONE ROW PER PARTITION of `keyed` (bounded by
    // construction), so the single-partition window is the design and
    // WindowExec's unpartitioned-window warning is expected (a constant
    // partition key would not silence it — Catalyst folds it away)
    val offsets = broadcast(parts
      .withColumn("_off",
        coalesce(sum(col("_n")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"), col("_lo")))
    keyed.join(offsets, "_pid")
      .withColumn("train_pos", col("_off") + (col("_mono") - col("_lo")))
      .drop("_ok", "_mono", "_pid", "_off", "_lo")
  }

  /** Cap each group at its `k` deterministically-ranked rows (the
    * common-crawl-style per-domain cap: no source may dominate the
    * corpus). Rank = portable hash of (group, id), so the kept subset
    * is a uniform, reproducible draw. Emits `rank_in_group` ∈ [1, k].
    *
    * Skew design: a single `row_number` window partitioned by the group
    * would funnel a hot domain (at 100 TB: one host with 10⁹ pages)
    * through one task. Phase 1 ranks within (group, hash%`salts`)
    * sub-buckets and keeps k per sub-bucket — the global per-group
    * top-k by hash order is necessarily a subset of the union of
    * sub-bucket top-ks. Phase 2 re-ranks only those ≤ `salts`·k
    * survivors per group, so the hot-key task is bounded by
    * `salts`·k rows regardless of corpus skew.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int,
                  salts: Int = 16, salt: String = "cap"): DataFrame = {
    require(k > 0 && salts > 0)
    val clash = df.columns.intersect(Seq("_rk", "_r1", "rank_in_group"))
    require(clash.isEmpty, s"input columns collide with capPerGroup internals: ${clash.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col(groupCol), col("_rk") % salts)
      .orderBy(col("_rk"), col(idCol))
    val w2 = Window.partitionBy(col(groupCol)).orderBy(col("_rk"), col(idCol))
    df.withColumn("_rk", hash60(concat(lit(salt), lit(":"),
        col(groupCol).cast("string"), lit(":"), col(idCol).cast("string"))))
      .withColumn("_r1", row_number().over(w1)).where(col("_r1") <= k)
      .withColumn("rank_in_group", row_number().over(w2))
      .where(col("rank_in_group") <= k)
      .drop("_rk", "_r1")
  }

  /** Largest-remainder (Hamilton) apportionment of a global token
    * `budget` across groups, proportional to each group's token mass:
    * `alloc_g = floor(budget·tok_g/T) + 1` for the `budget − Σfloor`
    * groups with the largest remainders (ties broken by group name).
    * Exact integer arithmetic throughout — `budget·tok_g` is computed
    * in decimal(38,0) so a 10¹² token corpus times a 10⁹ budget cannot
    * overflow a BIGINT — which makes the allocation reproducible
    * bit-for-bit in any engine. Σalloc == budget by construction.
    *
    * Scale: the only corpus-sized work is the map-side-combined
    * `groupBy(group).sum(tokens)`; every window after it runs over one
    * row per group (thousands, not billions — document if your group
    * key is finer). The sort in the ranking window is over groups only.
    */
  def allocateTokenBudget(df: DataFrame, groupCol: String,
                          nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    import org.apache.spark.sql.expressions.Window
    // these windows run over ONE ROW PER GROUP (bounded — see the scale
    // note above), so single-partition execution is the design and the
    // WindowExec unpartitioned-window warning is expected here. A
    // constant partition key (partitionBy(lit(0))) does NOT silence it:
    // Catalyst folds foldable partition expressions out of the window
    // spec before execution (verified in the q94 physical plan).
    val wAll = Window.partitionBy()
    val wRank = Window.partitionBy().orderBy(col("_rem").desc, col(groupCol))
    df.groupBy(col(groupCol))
      .agg(sum(col(nTokensCol)).cast("decimal(38,0)").as("group_tokens"))
      .withColumn("_t", sum(col("group_tokens")).over(wAll))
      .withColumn("_prod", col("group_tokens") * lit(budget).cast("decimal(38,0)"))
      // decimal DIV/% : floor quotient and exact remainder of budget·tok/T
      .withColumn("_base", expr("CAST(_prod DIV _t AS BIGINT)"))
      .withColumn("_rem", expr("CAST(_prod % _t AS DECIMAL(38,0))"))
      .withColumn("_extra", lit(budget) - sum(col("_base")).over(wAll))
      .withColumn("_rk", row_number().over(wRank))
      .withColumn("token_alloc",
        col("_base") + when(col("_rk") <= col("_extra"), 1L).otherwise(0L))
      .select(col(groupCol), col("group_tokens").cast("long").as("group_tokens"),
        col("token_alloc"))
  }

  /** Temperature-scaled mixture sampling (the multilingual-pretraining
    * recipe p_g ∝ n_g^α — Conneau & Lample 2019, XLM; mT5's α=0.3
    * variant): flatten a skewed group distribution by drawing
    * `alloc_g` rows per group, where alloc apportions `total` over
    * weights n_g^α. `halvings` selects α = 2^-halvings (1 → the XLM
    * default 0.5, 2 → 0.25): repeated `sqrt` is the one fractional
    * exponent both engines round identically (IEEE correctly-rounded),
    * where a general `pow` drifts by ulps between libm and the JVM.
    * Weights go through `floor(·×10^6)` into exact decimals so the
    * largest-remainder apportionment is integer-exact (same Hamilton
    * scheme as [[allocateTokenBudget]]); per-group row selection is
    * the [[stratifiedSample]] hash rank. A group upweighted beyond its
    * size emits all its rows (rank caps at n_g) — the returned
    * `group_alloc` exposes the deficit so callers can epoch-repeat.
    *
    * Scale shape: the apportionment windows run over ONE row per
    * group; the corpus-sized work is a count aggregate plus a
    * per-group rank (when alloc ≪ n, the [[capPerGroup]] salted
    * two-phase rank is the drop-in skew path), and the allocation
    * joins back as a broadcast.
    */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
                        total: Long, halvings: Int = 1,
                        salt: String = "temp"): DataFrame = {
    require(total > 0, s"total=$total")
    require(halvings >= 1 && halvings <= 4, s"halvings=$halvings (α=2^-h ∈ [1/16, 1/2])")
    import org.apache.spark.sql.expressions.Window
    // these windows run over ONE ROW PER GROUP (bounded — see the scale
    // note above), so single-partition execution is the design and the
    // WindowExec unpartitioned-window warning is expected here. A
    // constant partition key (partitionBy(lit(0))) does NOT silence it:
    // Catalyst folds foldable partition expressions out of the window
    // spec before execution (verified in the q94 physical plan).
    val wAll = Window.partitionBy()
    val wRank = Window.partitionBy().orderBy(col("_rem").desc, col(groupCol))
    val wRoot = (1 to halvings).foldLeft(col("group_n").cast("double")) {
      case (c, _) => sqrt(c)
    }
    val alloc = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("group_n"))
      // ×10^6 then floor: sqrt(n) ≤ 2^26.5 for n ≤ 2^53, so the scaled
      // weight stays exact in double and floor() agrees across engines
      // with no round-tie semantics in play
      .withColumn("_iw", floor(wRoot * lit(1e6)).cast("decimal(38,0)"))
      .withColumn("_t", sum(col("_iw")).over(wAll))
      .withColumn("_prod", col("_iw") * lit(total).cast("decimal(38,0)"))
      .withColumn("_base", expr("CAST(_prod DIV _t AS BIGINT)"))
      .withColumn("_rem", expr("CAST(_prod % _t AS DECIMAL(38,0))"))
      .withColumn("_extra", lit(total) - sum(col("_base")).over(wAll))
      .withColumn("_rk", row_number().over(wRank))
      .withColumn("group_alloc",
        col("_base") + when(col("_rk") <= col("_extra"), 1L).otherwise(0L))
      .select(col(groupCol), col("group_n"), col("group_alloc"))
    val h = hash60(concat(lit(salt), lit(":"), col(groupCol).cast("string"),
      lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .join(broadcast(alloc), Seq(groupCol))
      .where(col("sample_rank") <= col("group_alloc"))
      .select(col(idCol), col(groupCol), col("sample_rank"),
        col("group_n"), col("group_alloc"))
  }

  /** Deterministic weighted sample of size `k`: each row draws a
    * uniform 50-bit hash `u` of its id and competes with priority
    * `u / weight` — the k SMALLEST priorities win, so selection odds
    * rise monotonically with the weight (a row with twice the weight
    * halves its priority). This is the hash-seeded priority-sampling
    * family (Duffield et al.); the textbook PPS-exact variant keys on
    * `-ln(u)/w`, a transcendental whose last-ulp behavior differs
    * across engines — `u/w` keeps the same monotone weight semantics
    * with every step (one int-to-double conversion, one IEEE division)
    * bit-reproducible by the oracle.
    *
    * Scale shape: a pure projection followed by a global top-k
    * (TakeOrdered — per-partition heaps of k, never a full sort), so
    * the only data movement is k rows per partition to the driver-side
    * merge. Ties cannot occur across distinct ids (distinct hashes),
    * and the (priority, id) order makes even a hash collision
    * deterministic.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "wsamp"): DataFrame = {
    val u = hash60(concat(lit(salt), lit(":"), col(idCol).cast("string"))) % (1L << 50)
    df.where(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("double").as("weight"),
        (u.cast("double") / col(weightCol).cast("double")).as("priority"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }
}
