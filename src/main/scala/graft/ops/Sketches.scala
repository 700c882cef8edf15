package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.plans.BloomSketch

/** Mergeable-synopsis operators: bloom membership, HLL cardinality and
  * count-min frequency. At warehouse scale the pattern is always the
  * same — build a bounded sketch per partition in one pass, merge
  * sketches associatively (the shuffle carries kilobytes, not rows),
  * and either ship the merged sketch back into the plan as a literal
  * (bloom prefilter) or read the answer straight off it (HLL estimate,
  * CMS point query). The reference engine's stats probes
  * (`dqo/db/clients/postgres.py:122-172`) recompute exact aggregates per
  * question; sketches are the 100 TB substitute: one pass, then every
  * follow-up question is free.
  *
  * Correctness stance: the bloom path is EXACT (no false negatives, and
  * false positives die in the exact join that follows — the filter only
  * decides which rows travel). HLL and CMS are approximate by contract;
  * their driver queries report the exact value next to a bound check so
  * the oracle stays deterministic.
  */
object Sketches {

  /** [[Dedup.ngramContamination]] with a broadcast bloom prefilter —
    * identical output, different data movement. The eval side (benchmark
    * suites — tiny next to the corpus) collapses to its distinct shingle
    * set and folds into ONE bloom filter; the corpus side then drops
    * every shingle the filter rules out INSIDE its scan stage, so the
    * distinct+join shuffle sees only true overlaps plus an fpp-sized
    * trickle of false positives instead of every shingle in the corpus.
    * This is the decontamination shape at 100 TB: the quadratic-risk
    * side (the corpus) never shuffles in full.
    *
    * Exactness does not depend on the filter quality: inserted shingles
    * always pass (no false negatives), and a false positive is a train
    * shingle absent from the eval set — the equi-join with the eval
    * shingles discards it. `fpp` only tunes shuffle volume.
    */
  def bloomContamination(df: DataFrame, idCol: String, textCol: String,
                         evalPred: Column, shingleN: Int,
                         fpp: Double = 0.03): DataFrame = {
    // the semantics live in Dedup.contamination (shared with the plain
    // path, so the two cannot drift); this hook only decides which train
    // occurrences TRAVEL. The filter build is one eager job over the
    // (persisted, small) eval branch; its result is a bounded binary on
    // the driver — the same footprint Spark's own runtime-filter rule
    // accepts.
    Dedup.contamination(df, idCol, textCol, evalPred, shingleN) {
      (trainSh, evalSh) =>
        // evalSh arrives non-distinct off the persisted shingle base:
        // duplicate inserts are idempotent and the row count only
        // OVER-sizes the filter (fpp at or below the ask), so the
        // distinct exchange the old build paid bought nothing
        BloomSketch.build(evalSh, "sh", fpp) match {
          case None => trainSh.limit(0)
          case Some(bf) => trainSh.where(BloomSketch.mightContain(bf, col("sh")))
        }
    }
  }

  /** Is the sketch estimate inside `rtol` of the exact value? Shared by
    * the profile and the driver queries that pin `hll_ok` = true.
    */
  def withinBand(est: Column, exact: Column, rtol: Double): Column =
    abs(est - exact) <= exact * rtol

  /** Exact inner equi-join with a bloom prefilter on the big side: fold
    * `small`'s join keys into one bounded filter, drop `big` rows whose
    * key provably has no partner INSIDE big's scan stage, then run the
    * normal join. The result is exactly `big.join(small, ...)` — no
    * false negatives, and a false positive just means a row travels to
    * the join and matches nothing.
    *
    * This is Spark's own runtime-filter idea under EXPLICIT control:
    * Catalyst's InjectRuntimeFilter only fires when its creation-cost
    * heuristics align within one query, while a pipeline can reuse one
    * filter across many queries or build it where the optimizer can't
    * see the selectivity. The shape pays when `small` is selective but
    * too large to broadcast-join: its KEY SET still fits kilobytes of
    * bloom, and the big side's shuffle shrinks toward the true match
    * volume ([[bloomContamination]] is this pattern specialized to
    * shingles; measured in SCALE.md).
    */
  def bloomJoin(big: DataFrame, small: DataFrame,
                bigKey: String, smallKey: String,
                fpp: Double = 0.01): DataFrame = {
    // ONE scan of the small side serves both the filter build (sizing
    // count + aggregate) and the exact join — without the persist the
    // source is read once per consumer. Lifecycle is session-owned
    // (clearCache between jobs — see Bench/Verify), the same rule every
    // persisting operator here follows.
    val sm = small.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    BloomSketch.build(sm, smallKey, fpp) match {
      case None => big.limit(0).join(sm, big(bigKey) === sm(smallKey))
      case Some(bf) =>
        big.where(BloomSketch.mightContain(bf, col(bigKey)))
          .join(sm, big(bigKey) === sm(smallKey))
    }
  }

  /** Exact anti-join (subtract a blocklist) with a bloom shortcut: a
    * bloom-NEGATIVE key is provably absent from `small`, so those rows
    * are kept outright and never shuffle — only the maybe-matches go
    * through the exact `left_anti` join, which removes the false
    * positives' doubt. This is the decontamination-by-removal shape:
    * most of the corpus is clean, so most rows take the shuffle-free
    * branch and the join sees only (true matches + fpp) of the corpus.
    * Note the asymmetry with [[bloomJoin]]: an anti-join could NOT
    * simply drop bloom-positive rows (a false positive would wrongly
    * delete a clean row); splitting on the filter and exact-checking
    * only the positive side keeps it exact.
    */
  def bloomAntiJoin(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    fpp: Double = 0.01): DataFrame = {
    // same single-scan sharing as bloomJoin: build + exact anti-join
    // both read the persisted small side
    val sm = small.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    BloomSketch.build(sm, smallKey, fpp) match {
      case None => big
      case Some(bf) =>
        val maybe = BloomSketch.mightContain(bf, col(bigKey))
        big.where(!maybe)
          .unionAll(big.where(maybe)
            .join(sm, big(bigKey) === sm(smallKey), "left_anti"))
    }
  }

  /** Per-shard HLL sketches of `valueCol`'s distinct count: one row per
    * shard with the reusable binary sketch and its point estimate. The
    * aggregation is map-side combined (each task folds its rows into a
    * 2^lgK-register sketch; the shuffle moves sketches). Persist the
    * sketch column per day/partition once and every later cross-shard
    * cardinality question is a [[hllMergedEstimate]] over kilobytes —
    * the mergeability exact counts can never have.
    */
  def hllShardSketches(df: DataFrame, shardCol: String, valueCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(col(shardCol))
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))

  /** Union previously built shard sketches into one global estimate —
    * the shuffle-free merge path over a [[hllShardSketches]] result.
    */
  def hllMergedEstimate(sketches: DataFrame, sketchCol: String = "sketch"): DataFrame =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("estimate"))

  /** One-pass table profile — per column: row count, nulls, exact
    * distinct count, and whether the HLL estimate lands within `rtol`
    * of it. The whole profile is ONE wide aggregation (every per-column
    * expression map-side combines in the same pass), then a row-per-
    * column unpivot of the single result row — the curation-time
    * "ANALYZE TABLE" over a corpus. At warehouse scale drop the exact
    * `count_distinct` columns (they expand the aggregate) and keep the
    * sketches: estimates come from the same pass and the sketches merge
    * across shards ([[hllShardSketches]]).
    *
    * Types the datasketches aggregate takes natively (int/long/string/
    * binary) sketch as-is; everything else goes through a string cast —
    * never binary-through-string, whose invalid-UTF-8 collapse would
    * merge distinct values.
    */
  def profile(df: DataFrame, lgK: Int = 12, rtol: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}
    val cols = df.columns.toSeq
    require(cols.distinct.size == cols.size,
      s"profile needs unique column names; duplicates: ${cols.diff(cols.distinct).distinct.mkString(",")}")
    // generated aliases embed user column names — reference them
    // backtick-quoted so a dotted name isn't parsed as a struct access
    def cq(name: String) = col("`" + name.replace("`", "``") + "`")
    def sketchable(c: String) = df.schema(c).dataType match {
      case IntegerType | LongType | StringType | BinaryType => cq(c)
      case _ => cq(c).cast("string")
    }
    val aggExprs = (count(lit(1)).cast("long").as("__n") +: cols.flatMap { c =>
      Seq(count(cq(c)).cast("long").as(s"__nn_$c"),
        count_distinct(cq(c)).as(s"__nd_$c"),
        hll_sketch_estimate(hll_sketch_agg(sketchable(c), lgK)).as(s"__est_$c"))
    }).toList
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column_name"), col("__n").as("n_total"),
        (col("__n") - cq(s"__nn_$c")).as("n_nulls"),
        cq(s"__nd_$c").as("n_distinct"),
        withinBand(cq(s"__est_$c"), cq(s"__nd_$c"), rtol).as("hll_ok"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Count-min sketch over every row of `valueCol` (string terms): one
    * pass, one bounded binary whose width/depth follow from `eps`
    * (over-count ≤ eps·N) and `confidence`. Deterministic for a fixed
    * seed, so estimates are reproducible across runs and partitionings.
    */
  def cmsAgg(df: DataFrame, valueCol: String, eps: Double, confidence: Double,
             seed: Int): Array[Byte] =
    df.agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
        .as("cms"))
      .head.getAs[Array[Byte]]("cms")

  /** Point-query a serialized [[cmsAgg]] sketch (driver-side, O(depth)). */
  def cmsEstimate(sketch: Array[Byte], term: String): Long =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketch)).estimateCount(term)
}
