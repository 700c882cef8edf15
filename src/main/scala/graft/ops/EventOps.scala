package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over keyed event logs: gap-based sessionization
  * and point-in-time (as-of) joins. Both are pure window/aggregate
  * compositions — no custom state, no range-join explosion — so Catalyst
  * plans them as ordinary partitioned windows and they hold at any
  * corpus size where a single key's history fits an executor.
  */
object EventOps {

  /** Gap-based sessionization: consecutive events of the same key belong
    * to one session while the time delta to the previous event is at
    * most `gap`; a strictly larger delta starts a new session. Returns
    * one row per (key, session) with start/end, event count, and the
    * decimal-exact value sum. `session_id` is the 1-based session index
    * within its key (deterministic: ties in the event order cannot move
    * a session boundary, because a zero delta never exceeds the gap).
    *
    * Scale design: ONE shuffle (window partitioned by the key, ordered
    * by event time) feeding a groupBy on (key, session) that reuses the
    * same partitioning; per-key state is a lag + running sum, never the
    * whole history in memory. The streaming counterpart is Spark's
    * native `session_window` (see `EventStream.sessionCounts`), whose
    * state is watermark-bounded; this batch form pins oracle-checkable
    * semantics.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, gap: Long): DataFrame = {
    // fail fast on collisions with working/output columns (session_id is
    // a common pre-existing name in event logs — never overwrite it)
    val clash = events.columns.intersect(Seq("_new", "session_id"))
    require(clash.isEmpty, s"input columns collide with sessionize internals: ${clash.mkString(", ")}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val cum = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newSession = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1).otherwise(0)
    events
      .withColumn("_new", newSession)
      .withColumn("session_id", sum(col("_new")).over(cum).cast("long"))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(14,2)")).cast("double").as("sum_value"))
  }

  /** Point-in-time (as-of) join: every left row picks up the newest
    * right row of the same key with `right.ts <= left.ts` (or nulls if
    * none). The classic use is joining events to the most recent state
    * snapshot / quote / feature value as of each event.
    *
    * Implementation is the union + running-`last` pattern, NOT a range
    * join: right rows (deduplicated to one per (key, ts) by greatest
    * value struct — a deterministic tie rule both engines reproduce)
    * interleave with left rows in one window ordered by (ts, side) with
    * right-before-left at equal ts (inclusive match), and
    * `last(_vals, ignoreNulls)` carries the newest right payload
    * forward.
    *
    * Scale design: zero joins — one shuffle on the key, one ordered
    * window pass. A range join here would either explode (unbounded
    * lookback) or need hand-bucketing; the window form streams each
    * key's merged timeline once, at any history length. Right payload
    * columns surface as `asof_ts` + `asof_<col>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valCols: Seq[String]): DataFrame = {
    require(valCols.nonEmpty)
    // fail fast instead of silently overwriting user data with the
    // internal bookkeeping / output columns
    val reserved = Seq("_side", "_vals", "_last", "asof_ts") ++ valCols.map("asof_" + _)
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty, s"left columns collide with asofJoin internals: ${clash.mkString(", ")}")
    // one right row per (key, ts): keep the greatest payload struct
    val rightSlim = right
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(struct(col(tsCol).as("_rts") +: valCols.map(col): _*)).as("_vals"))
    val valsType = rightSlim.schema("_vals").dataType
    val lAug = left
      .withColumn("_side", lit(1))
      .withColumn("_vals", lit(null).cast(valsType))
    val rAug = rightSlim.select(
      left.columns.map {
        case c if c == keyCol => col(keyCol)
        case c if c == tsCol => col(tsCol)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(lit(0).as("_side"), col("_vals")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAug.unionByName(rAug)
      .withColumn("_last", last(col("_vals"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.map(col) ++
        (col("_last").getField("_rts").as("asof_ts") +:
          valCols.map(v => col("_last").getField(v).as(s"asof_$v"))): _*)
  }

  /** Ordered funnel analysis: for each key, walk its event stream in
    * time order and count how far it gets through `steps` — step i+1
    * only counts if it happens STRICTLY after the event that completed
    * step i. Returns one row per stage: `(stage, step, n_users)` where
    * `n_users` counts keys reaching AT LEAST that stage (the classic
    * conversion funnel). Greedy earliest-completion is optimal here (if
    * any strictly-increasing chain exists, taking every step at its
    * earliest valid time finds one), which is what makes the one-pass
    * scan below equal to the min-chain formulation the oracle replays.
    *
    * Scale design: events are pruned to the funnel's step types BEFORE
    * the one shuffle (groupBy key); the walk is an in-row `aggregate`
    * over the key's sorted step events, so per-key state is one
    * (stage, time) pair and the stage counting is a bounded explode
    * (|steps| rows per key, map-side combined). A key whose step-event
    * history cannot fit one executor needs a pre-cap upstream — at that
    * volume per user the funnel is saturated anyway.
    *
    * `tsCol` must already be a canonical long event time (callers derive
    * it via [[graft.Tables.eventTimeNs]]).
    */
  def funnel(events: DataFrame, keyCol: String, typeCol: String, tsCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    val evs = events
      .where(col(typeCol).isin(steps.map(lit): _*))
      .select(col(keyCol).as("_k"),
        struct(col(tsCol).cast("long").as("t"), col(typeCol).as("et")).as("e"))
      .groupBy("_k").agg(sort_array(collect_list(col("e"))).as("evs"))
    // in-row scan: acc = (stage reached, time of the completing event);
    // each when-branch tests the ORIGINAL acc so branches are disjoint
    val reached = evs.withColumn("acc",
      aggregate(col("evs"),
        struct(lit(0).as("stage"), lit(Long.MinValue).as("t")),
        (acc, e) => steps.zipWithIndex.foldLeft(acc) { case (els, (st, i)) =>
          when(acc.getField("stage") === i && e.getField("et") === st &&
            e.getField("t") > acc.getField("t"),
            struct(lit(i + 1).as("stage"), e.getField("t").as("t")))
            .otherwise(els)
        }))
      .select(col("_k"), col("acc.stage").as("reached"))
    // a zero-count seed per stage: with no step-typed events at all the
    // keyed aggregation is empty, but the contract (and the oracle's
    // UNION ALL of scalar counts) is one row per stage with n_users = 0
    val spark = events.sparkSession
    import spark.implicits._
    val seed = steps.zipWithIndex
      .map { case (st, i) => (i + 1, st, 0L) }.toDF("stage", "step", "hit")
    reached
      .select(explode(array(steps.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).as("stage"), lit(st).as("step"),
          when(col("reached") >= i + 1, 1L).otherwise(0L).as("hit"))
      }: _*)).as("s"))
      .select(col("s.stage").as("stage"), col("s.step").as("step"),
        col("s.hit").as("hit"))
      .unionByName(seed)
      .groupBy("stage", "step")
      .agg(sum(col("hit")).as("n_users"))
  }

  /** Rolling active keys: for every epoch-day, the count of distinct
    * keys active at least once in the trailing `windowDays`-day window
    * ending that day — the N-day-active-users curve. Each (key, day)
    * activity contributes to the `windowDays` window-days it can be
    * seen from, so windows trailing past the last observed day appear
    * with their partial coverage (the standard convention; slice at the
    * consumer if unwanted).
    *
    * Scale design: distinct (key, day) first — collapses event volume
    * to key·calendar size BEFORE the ×windowDays in-row explode — then
    * an exact two-phase distinct count per window-day. No window
    * function, no per-day self-joins.
    */
  def rollingActive(events: DataFrame, keyCol: String, tsCol: String,
                    windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive: $windowDays")
    val DayNs = 86400L * 1000000000L
    events
      .select(col(keyCol).as("_k"), col(tsCol).cast("long").as("_ns"))
      .withColumn("day", expr(s"_ns DIV $DayNs"))
      .select("_k", "day").distinct()
      .select(col("_k"),
        explode(transform(sequence(lit(0), lit(windowDays - 1)),
          i => col("day") + i)).as("window_day"))
      .groupBy("window_day")
      .agg(countDistinct(col("_k")).as("n_active"))
  }

  /** Event-type transition matrix: per key, consecutive event pairs in
    * time order, aggregated to `(from_type, to_type, n, prob)` where
    * `prob` is row-normalized over the from-type (a first-order Markov
    * chain over the event stream). Ordering ties on (ts) resolve by
    * type so the lag is deterministic even with same-instant events.
    *
    * Scale design: one shuffle — the per-key window (lag of one value,
    * constant state); the transition aggregation and its normalization
    * run over |types|² rows. `prob` is one IEEE division of two exact
    * longs, engine-portable.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, typeCol: String,
                       tsCol: String): DataFrame = {
    val w = Window.partitionBy(col("_k")).orderBy(col("_ns"), col("_t"))
    val pairs = events
      .select(col(keyCol).as("_k"), col(typeCol).as("_t"),
        col(tsCol).cast("long").as("_ns"))
      .withColumn("from_type", lag(col("_t"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("_t").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("prob", col("n").cast("double") /
        sum(col("n")).over(wf).cast("double"))
      .select("from_type", "to_type", "n", "prob")
  }

  /** Retention cohorts: keys are cohorted by the epoch-day of their
    * FIRST event; for every (cohort_day, day_offset) the count of keys
    * active (≥ 1 event) exactly `day_offset` days after their cohort
    * day. The standard activation/retention triangle.
    *
    * Scale design: ONE data-sized shuffle — `collect_set(day)` per key
    * (map-side deduped; per-key state is bounded by the calendar span,
    * not the event count), cohort = in-row `array_min`, offsets a
    * bounded in-row explode, and the final (cohort, offset) groupBy runs
    * over keys·days rows, already tiny. `tsCol` must be canonical long
    * nanos ([[graft.Tables.eventTimeNs]]).
    */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val DayNs = 86400L * 1000000000L
    val byKey = events
      .select(col(keyCol).as("_k"), col(tsCol).cast("long").as("_ns"))
      .withColumn("day", expr(s"_ns DIV $DayNs"))
      .groupBy("_k").agg(collect_set(col("day")).as("ds"))
      .withColumn("cohort_day", array_min(col("ds")))
    byKey
      .select(col("cohort_day"),
        explode(transform(col("ds"), d => d - col("cohort_day"))).as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
