package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming surface over the events table. The reference has
  * no streaming (SURVEY §2.8 — its closest artifacts are checkpoint files
  * and rotating logs); this extends the engine to event streams the way a
  * training-data pipeline ingests logs: watermarked tumbling-window
  * aggregation and stateful per-key sessionization.
  *
  * Scale design: windowed aggregation is a streaming hash-partitioned
  * partial/final agg (map-side combined per micro-batch); state size is
  * bounded by the watermark (late data beyond 10 minutes is dropped) so
  * executors hold O(active windows × keys), not history.
  */
object EventStream {

  /** Schema of the events stream. `ts` has shipped as both epoch-nanos
    * LONG (under nanosAsLong) and TIMESTAMP(MICROS) across testdata
    * regenerations — `Tables.eventTime` normalizes either to a real
    * timestamp, so the streaming surface is canon-type-agnostic.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file-stream source needs a directory; glob-filter to the events
    // table within the sf directory
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
  }

  private def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", graft.Tables.eventTime(events))

  /** Tumbling-window per-type aggregate with a 10-minute watermark. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("min_value"), col("max_value"))

  /** Gap-based session aggregation via Spark's NATIVE `session_window`
    * (merging-state streaming operator): a session extends while the
    * next event lands strictly inside [last, last + gap). State is
    * watermark-bounded per (user, open session). The batch counterpart
    * with oracle-pinned semantics is `EventOps.sessionize` (q54).
    */
  def sessionCounts(events: DataFrame, gap: String = "8 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "10 minutes")
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Windowed approximate distinct users — the streaming-safe form of
    * "unique visitors per hour" at ingest scale. Exact distinct in a
    * stream needs per-window state proportional to the user set; the
    * HLL++ aggregate (`approx_count_distinct`) keeps a FIXED register
    * array per window whatever the cardinality, its buffers merge by
    * register-max (order-insensitive, so micro-batch boundaries cannot
    * change the answer), and the watermark still bounds how many windows
    * hold state. Batch-vs-stream parity is exact, not approximate: both
    * fold the same value set into the same deterministic sketch
    * (asserted in StreamingSpec).
    */
  def approxDistinctUsers(events: DataFrame, window_ : String = "1 hour",
                          rsd: Double = 0.02): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), window_))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("window.start").as("window_start"), col("approx_users"))

  /** Streaming-checkpoint compatibility: like [[FunnelState]], the
    * PERSISTED form is a length-versioned `Array[Long]`, not this case
    * class — a case-class state encoder bakes its field list into the
    * checkpoint's state schema, so appending a field would fail any
    * restart from an older durable checkpoint with a state-schema
    * mismatch. `sum` is a Double carried as its IEEE-754 bit pattern
    * (`doubleToLongBits` — exact round-trip, no precision loss).
    *
    * MIGRATION NOTE: switching an already-deployed query from the old
    * case-class encoder to this codec is itself a one-time state-schema
    * change — a restart from a durable checkpoint written by the
    * case-class era fails with the same schema mismatch this codec
    * prevents thereafter. Discard (or re-bootstrap) pre-codec streaming
    * checkpoints when upgrading; every change AFTER that is covered by
    * the length-versioned decode below.
    */
  final case class SessionState(count: Long, sum: Double, lastNanos: Long) {
    def toPersisted: Array[Long] =
      Array(count, java.lang.Double.doubleToLongBits(sum), lastNanos)
  }

  object SessionState {
    /** Length-versioned decode: fields appended after `lastNanos` in a
      * future era default when a shorter (older) row doesn't carry
      * them; longer (newer) rows than this decoder knows are read by
      * position and the extra entries ignored, so a rollback restarts
      * cleanly too. `lastNanos` defaults to Long.MinValue — the next
      * batch re-arms the idle clock from its own events.
      */
    def fromPersisted(a: Array[Long]): SessionState =
      SessionState(a(0), java.lang.Double.longBitsToDouble(a(1)),
        if (a.length >= 3) a(2) else Long.MinValue)
  }

  final case class UserSession(user_id: Long, n_events: Long, total_value: Double)

  /** Stateful per-user running aggregate via mapGroupsWithState —
    * the custom-state streaming pattern (SURVEY steering: KeyValue
    * GroupedDataset.mapGroupsWithState).
    *
    * State bound: without `idleTimeout` state is one aggregate per
    * DISTINCT user ever seen — O(|users|) forever, fine for bounded
    * user populations, unbounded for open-world ids. Passing
    * `idleTimeout` (e.g. `"30 days"`) watermarks the stream and evicts
    * a user whose newest event is older than the watermark minus the
    * horizon, emitting their final aggregate on the way out; a user who
    * reappears later restarts from zero — the same idle-eviction trade
    * as [[funnelStages]]. `lastNanos` is already the monotone max of
    * every event time seen, so it doubles as the idle clock (an
    * out-of-order batch can never rewind an armed deadline).
    */
  def userSessions(spark: SparkSession, events: DataFrame,
                   idleTimeout: Option[String] = None): DataFrame = {
    import spark.implicits._
    // event-time timeout needs the watermarked column to reach the
    // stateful operator's input (see funnelStages for the same rule)
    val timed = idleTimeout match {
      case Some(_) => withEventTime(events).withWatermark("event_time", "10 minutes")
      case None => events.withColumn("event_time", lit(null).cast("timestamp"))
    }
    val timeoutConf = idleTimeout match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    timed.select(col("user_id").cast("long"), col("value").cast("double"),
        graft.Tables.eventTimeNs(events), col("event_time"))
      .as[(Long, Double, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(timeoutConf) {
        (user: Long, rows: Iterator[(Long, Double, Long, java.sql.Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val last = SessionState.fromPersisted(state.get)
            state.remove()
            UserSession(user, last.count, last.sum)
          } else {
            val prev = state.getOption.map(SessionState.fromPersisted)
              .getOrElse(SessionState(0L, 0.0, 0L))
            var c = prev.count; var s = prev.sum; var last = prev.lastNanos
            rows.foreach { r => c += 1; s += r._2; last = math.max(last, r._3) }
            state.update(SessionState(c, s, last).toPersisted)
            idleTimeout.foreach { horizon =>
              state.setTimeoutTimestamp(last / 1000000L, horizon)
            }
            UserSession(user, c, s)
          }
      }.toDF()
  }

  /** `tNanos` = time of the event that completed the current stage;
    * `seenNanos` = newest event time EVER seen for this user — the idle
    * clock. Kept separately: a batch of out-of-order non-advancing
    * events must never re-arm the timeout EARLIER than an
    * already-armed deadline.
    *
    * Streaming-checkpoint compatibility: the PERSISTED form is a
    * length-versioned `Array[Long]` (`toPersisted`/`fromPersisted`),
    * not this case class — a case-class state encoder bakes its field
    * list into the checkpoint's state schema, so adding a field (as
    * round 8's `seenNanos` did) fails any restart from an older durable
    * checkpoint with a state-schema mismatch. An `array<bigint>` column
    * keeps ONE schema whatever fields are appended: the decoder reads
    * by position and defaults what a shorter (older) row doesn't carry,
    * so a funnel restarted from a 2-field-era checkpoint resumes with
    * `seenNanos = Long.MinValue` (the next batch re-arms the idle clock
    * from its own events) instead of crashing.
    */
  final case class FunnelState(stage: Int, tNanos: Long,
                               seenNanos: Long = Long.MinValue) {
    def toPersisted: Array[Long] = Array(stage.toLong, tNanos, seenNanos)
  }

  object FunnelState {
    /** Length-versioned decode: v1 rows are (stage, tNanos), v2 appends
      * seenNanos. Unknown FUTURE fields (longer arrays) are ignored so a
      * rollback also restarts cleanly. */
    def fromPersisted(a: Array[Long]): FunnelState =
      FunnelState(a(0).toInt, a(1),
        if (a.length >= 3) a(2) else Long.MinValue)
  }
  final case class UserFunnel(user_id: Long, reached: Int)

  /** Streaming conversion funnel — the ingest-time counterpart of the
    * batch [[graft.ops.EventOps.funnel]] (q111): per-user state is ONE
    * (stage, time) pair advanced by the same strict greedy rule (step
    * i+1 only on a step event strictly after the event that completed
    * step i). Within a micro-batch events are processed in event-time
    * order; ACROSS batches the stream is assumed in order up to the
    * watermark — a late event that should have advanced a stage already
    * passed over is ignored, the standard streaming-funnel
    * approximation, exact whenever arrival respects event time
    * (StreamingSpec pins batch parity on the static canon). Emits each
    * user's currently-reached stage (Update mode: latest row per user
    * wins).
    *
    * State bound: without `idleTimeout` state is one (stage, time) pair
    * per DISTINCT user ever seen — O(|users|) forever, fine for bounded
    * user populations, unbounded for open-world ids. Passing
    * `idleTimeout` (e.g. `"30 days"`) watermarks the stream and evicts a
    * user whose last funnel event is older than the watermark minus the
    * horizon, emitting their final reached stage on the way out; a user
    * who reappears later restarts at stage 0 — the standard
    * idle-eviction trade.
    */
  def funnelStages(spark: SparkSession, events: DataFrame,
                   steps: Seq[String],
                   idleTimeout: Option[String] = None): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    val stepEvents = events.where(col("event_type").isin(steps.map(lit): _*))
    // event-time timeout requires the WATERMARKED COLUMN to reach the
    // stateful operator's input (Spark's analyzer rejects a watermark
    // whose column was projected away) — so the timestamp rides along as
    // a fourth column the state function ignores
    val timed = idleTimeout match {
      case Some(_) => withEventTime(stepEvents).withWatermark("event_time", "10 minutes")
      case None => stepEvents.withColumn("event_time", lit(null).cast("timestamp"))
    }
    val timeoutConf = idleTimeout match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    timed
      .select(col("user_id").cast("long"), col("event_type"),
        graft.Tables.eventTimeNs(events), col("event_time"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(timeoutConf) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val reached = FunnelState.fromPersisted(state.get).stage
            state.remove()
            UserFunnel(user, reached)
          } else {
            val prev = state.getOption.map(FunnelState.fromPersisted)
              .getOrElse(FunnelState(0, Long.MinValue))
            var st = prev.stage
            var t = prev.tNanos
            val batch = rows.toSeq.sortBy(r => (r._3, r._2))
            batch.foreach { case (_, et, ts, _) =>
              if (st < steps.length && et == steps(st) && ts > t) { st += 1; t = ts }
            }
            // idle clock: newest event time ever seen (monotone across
            // batches — an out-of-order batch must not REWIND an armed
            // deadline and evict an active user early)
            val seen = math.max(prev.seenNanos, batch.map(_._3).max)
            state.update(FunnelState(st, t, seen).toPersisted)
            idleTimeout.foreach { horizon =>
              state.setTimeoutTimestamp(seen / 1000000L, horizon)
            }
            UserFunnel(user, st)
          }
      }.toDF()
  }

  /** Stream-stream interval join: attribute each purchase to every click
    * by the same user within the preceding `withinSeconds` — the classic
    * event-attribution shape. Both sides are watermarked so Spark's
    * symmetric hash join can discard state older than the interval
    * bound: per-key state is O(events inside the watermark window),
    * never the full history. The equality key (`user_id`) is the shuffle
    * key; the time-range predicate bounds the per-key scan.
    */
  def attributedPurchases(events: DataFrame, withinSeconds: Long): DataFrame = {
    val clicks = withEventTime(events)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", "1 hour")
    val purchases = withEventTime(events)
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"), col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_time") <= col("purchase_time") &&
        col("click_time") >= col("purchase_time") - expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_value"), col("click_time"), col("purchase_time"))
  }

  /** Streaming exact dedup on a content hash — the ingestion-time
    * counterpart of the batch `Dedup.exact` (q30): keep the first
    * occurrence of each md5(content), suppressing duplicates that
    * arrive within the watermark delay of it.
    *
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: with plain
    * `dropDuplicates` the watermark only evicts state when the
    * event-time column is part of the dedup keys — keyed on a content
    * hash alone the seen-set grows forever, the classic unbounded-state
    * trap at corpus scale. The WithinWatermark variant expires each
    * key's marker once the watermark passes its first occurrence, so
    * state is O(hashes per watermark horizon) regardless of key column.
    * Duplicates separated by MORE than the horizon are this operator's
    * non-goal — the persistent LSH index path ([[IngestDedup]]) owns
    * long-horizon dedup.
    */
  def dedupStream(docs: DataFrame, textCol: String,
                  tsCol: String, watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Drive a streaming DataFrame to completion against the (static)
    * parquet source using a memory sink — the local test harness
    * (`format("memory")` + processAllAvailable).
    */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
  }
}
