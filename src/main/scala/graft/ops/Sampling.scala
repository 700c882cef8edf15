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
}
