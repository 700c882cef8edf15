package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles without a global sort and without the
  * single-reducer collect of Spark's built-in `percentile` aggregate
  * (which gathers every (value, count) pair of a group into one task's
  * memory — fine per small group, fatal for a whole-table quantile at
  * 100 TB). Interpolation follows the SQL-standard continuous quantile
  * (`quantile_cont` / `percentile_cont`): h = p·(n−1) zero-based,
  * x = v[⌊h⌋] + (h−⌊h⌋)·(v[⌊h⌋+1] − v[⌊h⌋]).
  *
  * Algorithm (per needed rank): iterative range refinement. Keep a value
  * interval [lo, hi] guaranteed to contain the rank, plus the count of
  * rows strictly below it. Each round buckets the in-range rows into
  * `buckets` equi-width bands (one aggregate pass; ≤ `buckets` rows to
  * the driver — the TopFraction pattern) and descends into the band
  * holding the rank; the interval width shrinks ×buckets per round.
  * When ≤ `smallCutoff` rows remain, the exact value is the max of the
  * (local-rank+1) smallest — a bounded TakeOrdered, never a full sort.
  * A constant-valued interval short-circuits (width 0 cannot refine).
  *
  * Scale design (100 TB): every pass is a scan + map-side-combined
  * aggregate on ONE projected column with a pushed range filter; driver
  * state is `buckets` counts per round. Convergence is geometric:
  * 256 buckets × 4 rounds resolves ~4e9 distinct doubles; ties
  * concentrate mass in one band, which the width-0 short-circuit exits.
  * The projected column is cached across rounds — at 100 TB, either
  * budget executor storage for the single column (~1% of row width) or
  * drop the cache and pay one extra scan per round.
  */
object Quantiles {

  /** Continuous (interpolated) quantiles of `valueCol` at `probs`.
    * Returns one row per prob: (prob, quantile), quantile rounded to
    * `scale` decimals (double partial-sum order plays no role here, but
    * the interpolation multiply is rounded for cross-engine stability).
    */
  def exactQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                     buckets: Int = 256, smallCutoff: Long = 65536,
                     scale: Int = 4): DataFrame = {
    require(probs.nonEmpty, "no probs given")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), s"probs out of [0,1]: $probs")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .cache()
    try {
      val n = vals.count()
      require(n > 0, s"no non-null values in $valueCol")

      // exact 0-based k-th (and, when `needNext`, (k+1)-th) smallest by
      // iterative range refinement. Interpolation needs the ADJACENT
      // rank too, so both are resolved in ONE descent: whenever rank is
      // its band's last row, rank+1's value is the next non-empty band's
      // min — already sitting in the same histogram, zero extra passes.
      def kthPair(rank: Long, needNext: Boolean): (Double, Double) = {
        var (lo, hi) = {
          val r = vals.agg(min($"v"), max($"v")).head()
          (r.getDouble(0), r.getDouble(1))
        }
        var below = 0L
        var inRange = n
        var nextVal: Option[Double] = None
        while (inRange > smallCutoff && hi > lo) {
          val width = hi - lo
          // the equi-width floor only STEERS; the bounds carried to the
          // next round are each band's ACTUAL min/max from this same
          // aggregate. Band assignment is monotone in v, so the closed
          // interval [band-min, band-max] contains exactly the band's
          // rows — no float boundary can disagree with the counts
          val b = least(lit(buckets - 1),
            greatest(lit(0), floor(($"v" - lo) / width * buckets))).cast("int")
          val bands = vals.where($"v" >= lo && $"v" <= hi)
            .groupBy(b.as("b"))
            .agg(count(lit(1)).as("c"), min($"v").as("mn"), max($"v").as("mx"))
            .collect()
            .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
            .sortBy(_._1)
          var acc = below
          var chosen: Option[(Int, Long, Double, Double)] = None
          for (band @ (_, c, _, _) <- bands if chosen.isEmpty) {
            if (acc + c > rank) chosen = Some(band) else acc += c
          }
          val (bi, c, mn, mx) = chosen.getOrElse(
            sys.error(s"rank $rank fell out of [$lo,$hi] (below=$below)"))
          if (needNext && nextVal.isEmpty && rank - acc == c - 1) {
            // rank+1 lives in the next non-empty band; its min IS the value
            nextVal = bands.collectFirst { case (b2, c2, mn2, _) if b2 > bi && c2 > 0 => mn2 }
          }
          below = acc
          lo = mn; hi = mx; inRange = c
        }
        if (hi == lo) (lo, nextVal.getOrElse(lo))
        else {
          val local = (rank - below).toInt
          // the (local+1)..(local+2) smallest in-range values: bounded by
          // smallCutoff rows, TakeOrdered — never a global sort. The
          // driver materializes at most smallCutoff+2 doubles.
          val take = if (needNext && nextVal.isEmpty) local + 2 else local + 1
          val sortedTail = vals.where($"v" >= lo && $"v" <= hi)
            .orderBy($"v").limit(take).collect().map(_.getDouble(0))
          val vLow = sortedTail(local)
          (vLow, nextVal.getOrElse(
            if (needNext) sortedTail(local + 1) else vLow))
        }
      }

      val rows = probs.map { p =>
        val h = p * (n - 1)
        val lowRank = math.floor(h).toLong
        val frac = h - lowRank
        val (vLow, vHigh) = kthPair(lowRank, needNext = frac != 0.0)
        val q = if (frac == 0.0) vLow else vLow + frac * (vHigh - vLow)
        // HALF_UP on the exact binary value — the rounding DuckDB's
        // ROUND and Spark's round() both apply (rint's half-even differs
        // at exact .5 boundaries)
        (p, BigDecimal(q).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      spark.createDataFrame(rows).toDF("prob", "quantile")
    } finally { vals.unpersist(); () }
  }
}
