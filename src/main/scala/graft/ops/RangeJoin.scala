package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-range (theta BETWEEN) join without a cartesian product.
  *
  * Spark has no native range-join operator: `facts JOIN ranges ON
  * facts.v BETWEEN ranges.lo AND ranges.hi` plans as a broadcast
  * nested-loop (small ranges side) or a full cartesian — O(|facts| ×
  * |ranges|) comparisons either way, which dies long before 100 TB. The
  * classic fix (used by the Databricks range-join hint and Flink's
  * interval join) is bin bucketing: pick a bin width `w`, key every fact
  * by its single bin `floor(v / w)`, explode every range across the
  * bins it overlaps, and equi-join on the bin id. Each qualifying
  * (fact, range) pair meets in exactly ONE bin — the fact's — so the
  * join needs no post-dedup; a residual `BETWEEN` filter discards the
  * false candidates that share a bin but not the interval.
  *
  * Scale design: the plan is a plain equi-join on `__bin`, so Catalyst
  * is free to broadcast an exploded ranges side that fits (the common
  * dimension-like case) or shuffle both sides on the bin id; either
  * way, comparisons per fact are bounded by the ranges overlapping its
  * bin, not |ranges|. Cost knob: explode factor per range is
  * `(hi - lo) / w + 1`, candidate factor per fact is the number of
  * ranges per bin — pick `w` near the typical range width so both stay
  * O(1). Value skew (many facts in one bin) is ordinary equi-join skew:
  * AQE's skew-join split applies, since this is just an equi-join.
  */
object RangeJoin {

  /** Inner-join `facts` with every row of `ranges` whose
    * `[loCol, hiCol]` interval (inclusive both ends) contains
    * `facts(valueCol)`. All columns of both inputs survive; null
    * values / bounds never match (SQL BETWEEN semantics). Ranges with
    * `lo > hi` are empty intervals and are dropped up front.
    */
  def rangeJoin(facts: DataFrame, valueCol: String,
                ranges: DataFrame, loCol: String, hiCol: String,
                binWidth: Double): DataFrame =
    keyedRangeJoin(facts, valueCol, ranges, loCol, hiCol, binWidth, Nil)

  /** [[rangeJoin]] with equi-keys: a fact only matches ranges of the
    * SAME `keyCols` values (events against that user's windows, reads
    * against that shard's intervals). The keys join alongside the bin
    * id — sharper partitioning for free, and per-key skew splits the
    * same way plain equi-join skew does. `keyCols` must exist on both
    * sides; key columns survive once.
    */
  def keyedRangeJoin(facts: DataFrame, valueCol: String,
                     ranges: DataFrame, loCol: String, hiCol: String,
                     binWidth: Double, keyCols: Seq[String],
                     maxBinsPerRange: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = (facts.columns ++ ranges.columns).intersect(Seq("__bin"))
    require(clash.isEmpty, "input columns collide with rangeJoin internals: __bin")
    val missing = keyCols.filterNot(facts.columns.contains) ++
      keyCols.filterNot(ranges.columns.contains)
    require(missing.isEmpty, s"key columns missing from an input: ${missing.distinct.mkString(", ")}")
    // fail fast on shared non-key names: the residual BETWEEN filter
    // after the join would otherwise die with an opaque
    // AMBIGUOUS_REFERENCE naming neither input
    val shared = facts.columns.intersect(ranges.columns).diff(keyCols)
    require(shared.isEmpty,
      s"non-key columns shared by both inputs (rename one side): ${shared.mkString(", ")}")
    val w = lit(binWidth)
    val f = facts.withColumn("__bin", floor(col(valueCol) / w).cast("long"))
    val r = ranges
      .where(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .where(binGuard(floor(col(hiCol) / w) - floor(col(loCol) / w) + 1, maxBinsPerRange))
      .withColumn("__bin",
        explode(sequence(floor(col(loCol) / w).cast("long"),
                         floor(col(hiCol) / w).cast("long"))))
    f.join(r, "__bin" +: keyCols)
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Explode-factor tripwire: a binWidth far below the widest range
    * would fan one range row out into millions of bins — at cluster
    * scale that is a job-killing, quiet mistake. Fails the job loudly
    * instead of exploding. Evaluated per range row inside the scan
    * (a codegen'd comparison, not a separate pass); `coalesce` keeps
    * the assert un-prunable (assert_true yields NULL on success).
    *
    * `nBins` stays in DOUBLE space: an open-ended interval encoded as
    * hi = Infinity must hit THIS message, not a downstream long-cast
    * overflow or a sequence() array-size error. assert_true also
    * throws on a NULL condition, so NaN bounds cannot slip through the
    * comparison.
    */
  private def binGuard(nBins: Column, maxBins: Long): Column =
    coalesce(assert_true(nBins >= lit(1.0) && nBins <= lit(maxBins.toDouble),
      concat(lit(s"rangeJoin: a range spans "), nBins,
        lit(s" bins (> $maxBins) — raise binWidth or maxBinsPerRange"))),
      lit(true))

  /** Interval-overlap join: every pair (l, r) whose closed intervals
    * `[l.lo, l.hi]` and `[r.lo, r.hi]` intersect — sessions × outage
    * windows, reservations × maintenance, any two interval sets. Both
    * sides explode across the bins they span, meet on the bin id, and a
    * pair that shares SEVERAL bins is kept only in the first one both
    * occupy (`max` of the two start bins) — dedup by arithmetic, not a
    * `distinct` shuffle over the (much larger) match set. Empty
    * (`lo > hi`) and null intervals drop. Left columns keep their
    * names; right columns get `rightPrefix`.
    *
    * Scale: equi-join on the bin, so candidates per row are bounded by
    * interval density per bin, never |right|; `binWidth` near the
    * typical interval length keeps both explode factors O(1). The same
    * AQE skew handling as [[rangeJoin]] applies.
    */
  def intervalOverlapJoin(left: DataFrame, leftLo: String, leftHi: String,
                          right: DataFrame, rightLo: String, rightHi: String,
                          binWidth: Double, rightPrefix: String = "r_",
                          maxBinsPerRange: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = left.columns.intersect(Seq("__bin", "__lbin"))
    require(clash.isEmpty, s"left columns collide with internals: ${clash.mkString(", ")}")
    val w = lit(binWidth)
    def exploded(df: DataFrame, lo: String, hi: String) = df
      .where(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .where(binGuard(floor(col(hi) / w) - floor(col(lo) / w) + 1, maxBinsPerRange))
      .withColumn("__lbin", floor(col(lo) / w).cast("long"))
      .withColumn("__bin",
        explode(sequence(col("__lbin"), floor(col(hi) / w).cast("long"))))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"$rightPrefix$c"))
    val rclash = r.columns.intersect(Seq("__bin", "__lbin"))
    require(rclash.isEmpty, s"right columns collide with internals: ${rclash.mkString(", ")}")
    // a left column spelled like a PREFIXED right column would survive
    // twice (duplicate output names) or make the overlap filter
    // ambiguous — reject up front with the actual clash
    val shared = left.columns.intersect(r.columns)
    require(shared.isEmpty,
      s"left columns collide with prefixed right columns (rename or change rightPrefix): ${shared.mkString(", ")}")
    val le = exploded(left, leftLo, leftHi)
    val re = exploded(r, s"$rightPrefix$rightLo", s"$rightPrefix$rightHi")
      .withColumnRenamed("__lbin", "__rlbin")
    le.join(re, Seq("__bin"))
      .where(col(leftLo) <= col(s"$rightPrefix$rightHi") &&
        col(s"$rightPrefix$rightLo") <= col(leftHi) &&
        col("__bin") === greatest(col("__lbin"), col("__rlbin")))
      .drop("__bin", "__lbin", "__rlbin")
  }
}
