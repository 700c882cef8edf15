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

      // ALL probs descend together, one scan per ROUND instead of one
      // scan per round per prob (groupedExactQuantiles' pass-sharing,
      // applied across ranks): each active rank ships its [lo, hi] in a
      // broadcast ranges frame, rows histogram within every range they
      // fall in (fan-out bounded by the active-rank count, a handful),
      // and the driver steers each rank independently off its own
      // (rid, band) slice. The per-rank descent is bit-identical to the
      // former one-rank-at-a-time form — same float band arithmetic,
      // same actual band min/max carried to the next round — but the
      // scan count drops from sum-of-rounds (plus a min/max job PER
      // prob) to one min/max + max-rounds-over-ranks + one shared tail.
      // Interpolation needs the ADJACENT rank too; it resolves inside
      // the same descent: whenever rank is its band's last row, rank+1's
      // value is the next non-empty band's min — already sitting in the
      // same histogram, zero extra passes.
      final case class St(rank: Long, frac: Double, var lo: Double,
                          var hi: Double, var below: Long, var inRange: Long,
                          var nextVal: Option[Double])
      val (gLo, gHi) = {
        val r = vals.agg(min($"v"), max($"v")).head()
        (r.getDouble(0), r.getDouble(1))
      }
      // one descent per DISTINCT (rank, needNext) requirement; duplicate
      // probs (or probs sharing a rank) reuse the same state
      val states = scala.collection.mutable.LinkedHashMap.empty[(Long, Boolean), St]
      probs.foreach { p =>
        val h = p * (n - 1)
        val rank = math.floor(h).toLong
        val needNext = (h - rank) != 0.0
        states.getOrElseUpdate((rank, needNext),
          St(rank, h - rank, gLo, gHi, 0L, n, None))
        ()
      }
      def stillActive = states.filter { case (_, s) => s.inRange > smallCutoff && s.hi > s.lo }
      var active = stillActive
      while (active.nonEmpty) {
        // ONE materialized (state, rid) order serves both the ranges
        // frame and the histogram application below — re-enumerating the
        // map twice would silently mis-route slices if the collection's
        // iteration order ever stopped being stable between the calls
        val actSeq = active.values.toSeq.zipWithIndex
        val ranges = actSeq
          .map { case (s, rid) => (rid, s.lo, s.hi) }
          .toDF("rid", "_lo", "_hi")
        // the equi-width floor only STEERS; the bounds carried to the
        // next round are each band's ACTUAL min/max from this same
        // aggregate. Band assignment is monotone in v, so the closed
        // interval [band-min, band-max] contains exactly the band's
        // rows — no float boundary can disagree with the counts
        val b = least(lit(buckets - 1), greatest(lit(0),
          floor(($"v" - $"_lo") / ($"_hi" - $"_lo") * buckets))).cast("int")
        val hist = vals.join(broadcast(ranges), $"v" >= $"_lo" && $"v" <= $"_hi")
          .groupBy($"rid", b.as("b"))
          .agg(count(lit(1)).as("c"), min($"v").as("mn"), max($"v").as("mx"))
          .collect()
          .map(r => (r.getInt(0), (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
          .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
        actSeq.foreach { case (s, rid) =>
          val bands = hist.getOrElse(rid,
            sys.error(s"rank ${s.rank} fell out of [${s.lo},${s.hi}] (below=${s.below})"))
          var acc = s.below
          var chosen: Option[(Int, Long, Double, Double)] = None
          for (band @ (_, c, _, _) <- bands if chosen.isEmpty) {
            if (acc + c > s.rank) chosen = Some(band) else acc += c
          }
          val (bi, c, mn, mx) = chosen.getOrElse(
            sys.error(s"rank ${s.rank} fell out of [${s.lo},${s.hi}] (below=${s.below})"))
          if (s.frac != 0.0 && s.nextVal.isEmpty && s.rank - acc == c - 1) {
            // rank+1 lives in the next non-empty band; its min IS the value
            s.nextVal = bands.collectFirst { case (b2, c2, mn2, _) if b2 > bi && c2 > 0 => mn2 }
          }
          s.below = acc
          s.lo = mn; s.hi = mx; s.inRange = c
        }
        active = stillActive
      }
      // shared tail resolution: per still-unresolved rank, the
      // (local+1)..(local+2) smallest in-range values — bounded by
      // smallCutoff rows per rank, resolved by a per-rank row_number
      // window (partitioned, bounded, never a global sort), ALL ranks in
      // one job. The driver materializes at most (smallCutoff+2) doubles
      // per rank.
      val ridOf = states.keys.toSeq.zipWithIndex.toMap
      val tails = states.toSeq.collect { case (key, st) if st.hi > st.lo =>
        val local = (st.rank - st.below).toInt
        val take = if (st.frac != 0.0 && st.nextVal.isEmpty) local + 2 else local + 1
        (ridOf(key), st.lo, st.hi, take)
      }
      val resolved: Map[Int, IndexedSeq[Double]] =
        if (tails.isEmpty) Map.empty
        else {
          val rangesF = tails.toDF("rid", "_lo", "_hi", "_take")
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy($"rid").orderBy($"v")
          vals.join(broadcast(rangesF), $"v" >= $"_lo" && $"v" <= $"_hi")
            .withColumn("rn", row_number().over(w))
            .where($"rn" <= $"_take")
            .select($"rid", $"rn", $"v")
            .collect()
            .map(r => (r.getInt(0), (r.getInt(1), r.getDouble(2))))
            .groupBy(_._1).view
            .mapValues(_.map(_._2).sortBy(_._1).map(_._2).toIndexedSeq).toMap
        }

      val rows = probs.map { p =>
        val h = p * (n - 1)
        val lowRank = math.floor(h).toLong
        val frac = h - lowRank
        val key = (lowRank, frac != 0.0)
        val s = states(key)
        val (vLow, vHigh) =
          if (s.hi == s.lo) (s.lo, s.nextVal.getOrElse(s.lo))
          else {
            val local = (s.rank - s.below).toInt
            val tail = resolved(ridOf(key))
            (tail(local), s.nextVal.getOrElse(
              if (frac != 0.0) tail(local + 1) else tail(local)))
          }
        val q = if (frac == 0.0) vLow else vLow + frac * (vHigh - vLow)
        // HALF_UP on the exact binary value — the rounding DuckDB's
        // ROUND and Spark's round() both apply (rint's half-even differs
        // at exact .5 boundaries)
        (p, BigDecimal(q).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      spark.createDataFrame(rows).toDF("prob", "quantile")
    } finally { vals.unpersist(); () }
  }

  /** Exact continuous quantile of `valueCol` at `p`, PER GROUP — the
    * "p99 latency per domain" shape. Same iterative range refinement as
    * [[exactQuantiles]], but every round advances ALL still-active
    * groups in ONE aggregate: the per-group [lo, hi] intervals ship as
    * a broadcast ranges frame, rows bucket within their own group's
    * interval, and the (group, band) histogram (≤ groups × buckets
    * rows) returns to the driver, which descends each group
    * independently. Groups converge at different rounds and drop out;
    * the final ≤ `smallCutoff`-row tails resolve together in one
    * per-group window (row_number over each group's surviving range —
    * partitioned, bounded, never a global sort), collecting exactly the
    * two ranks interpolation needs per group.
    *
    * Scale trade-off, explicitly: driver state is O(groups) and each
    * round returns ≤ groups × buckets histogram rows, so this operator
    * targets FEW-to-moderately-many LARGE groups (domains, sources,
    * days). For millions of tiny groups the built-in per-group
    * `percentile_approx`/`percentile` is the right tool — each group
    * fits one task there, which is exactly where the built-in's
    * gather-the-group behavior stops being a problem.
    *
    * Returns one row per group: (group, n, quantile), quantile rounded
    * HALF_UP to `scale` decimals (the q82 cross-engine convention).
    * Rows with a NULL group key are EXCLUDED (a null key can never
    * match the broadcast ranges join, so it would crash mid-descent
    * instead of aggregating; callers wanting SQL's null group coalesce
    * the key upstream).
    */
  def groupedExactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                            p: Double, buckets: Int = 256,
                            smallCutoff: Long = 65536, scale: Int = 4): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"prob out of [0,1]: $p")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && col("g").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      final case class St(n: Long, rank: Long, frac: Double, var lo: Double,
                          var hi: Double, var below: Long, var inRange: Long,
                          var nextVal: Option[Double], var done: Boolean)
      val init = vals.groupBy($"g")
        .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
        .collect()
      require(init.nonEmpty, s"no non-null values in $valueCol")
      val st = scala.collection.mutable.LinkedHashMap(init.map { r =>
        val n = r.getLong(1)
        val h = p * (n - 1)
        val rank = math.floor(h).toLong
        r.getString(0) -> St(n, rank, h - rank, r.getDouble(2), r.getDouble(3),
          0L, n, None, done = false)
      }.sortBy(_._1): _*)

      var active = st.filter { case (_, s) => s.inRange > smallCutoff && s.hi > s.lo }
      while (active.nonEmpty) {
        val ranges = active.toSeq.map { case (g, s) => (g, s.lo, s.hi) }
          .toDF("g", "_lo", "_hi")
        val b = least(lit(buckets - 1), greatest(lit(0),
          floor(($"v" - $"_lo") / ($"_hi" - $"_lo") * buckets))).cast("int")
        val hist = vals.join(broadcast(ranges), Seq("g"))
          .where($"v" >= $"_lo" && $"v" <= $"_hi")
          .groupBy($"g", b.as("b"))
          .agg(count(lit(1)).as("c"), min($"v").as("mn"), max($"v").as("mx"))
          .collect()
          .map(r => (r.getString(0), (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
          .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
        active.foreach { case (g, s) =>
          val bands = hist.getOrElse(g, sys.error(s"group $g lost its range"))
          var acc = s.below
          var chosen: Option[(Int, Long, Double, Double)] = None
          for (band @ (_, c, _, _) <- bands if chosen.isEmpty) {
            if (acc + c > s.rank) chosen = Some(band) else acc += c
          }
          val (bi, c, mn, mx) = chosen.getOrElse(
            sys.error(s"group $g: rank ${s.rank} fell out of [${s.lo},${s.hi}]"))
          if (s.frac != 0.0 && s.nextVal.isEmpty && s.rank - acc == c - 1)
            s.nextVal = bands.collectFirst { case (b2, c2, mn2, _) if b2 > bi && c2 > 0 => mn2 }
          s.below = acc; s.lo = mn; s.hi = mx; s.inRange = c
        }
        active = active.filter { case (_, s) => s.inRange > smallCutoff && s.hi > s.lo }
      }

      // one shared resolution pass: per group, the (local+1)-th (and when
      // still needed, (local+2)-th) smallest value inside its final range
      val tails = st.toSeq.collect { case (g, s) if s.hi > s.lo =>
        val take = if (s.frac != 0.0 && s.nextVal.isEmpty) (s.rank - s.below) + 2
                   else (s.rank - s.below) + 1
        (g, s.lo, s.hi, take)
      }
      val resolved: Map[String, Seq[(Long, Double)]] =
        if (tails.isEmpty) Map.empty
        else {
          val rangesF = tails.toDF("g", "_lo", "_hi", "_take")
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy($"g").orderBy($"v")
          vals.join(broadcast(rangesF), Seq("g"))
            .where($"v" >= $"_lo" && $"v" <= $"_hi")
            .withColumn("rn", row_number().over(w))
            .where($"rn" <= $"_take")
            .select($"g", $"rn".cast("long"), $"v")
            .collect()
            .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
            .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap
        }

      val rows = st.toSeq.map { case (g, s) =>
        val (vLow, vHigh) =
          if (s.hi == s.lo) (s.lo, s.nextVal.getOrElse(s.lo))
          else {
            val local = (s.rank - s.below).toInt
            val tail = resolved(g)
            val low = tail(local)._2
            (low,
              s.nextVal.getOrElse(
                if (s.frac != 0.0) tail(local + 1)._2 else low))
          }
        val q = if (s.frac == 0.0) vLow else vLow + s.frac * (vHigh - vLow)
        (g, s.n,
          BigDecimal(q).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      spark.createDataFrame(rows).toDF(groupCol, "n", "quantile")
    } finally { vals.unpersist(); () }
  }
}
