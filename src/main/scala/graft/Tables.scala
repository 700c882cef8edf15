package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Replaces the reference's live-Postgres execution substrate
  * (reference: dqo/db/clients/postgres.py:241-317) with parquet-backed
  * temp views: scans stay declarative so Catalyst pushes filters and
  * prunes columns down to the parquet reader.
  */
object Tables {
  /** All driver-provided tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Cheap testdata-canon fingerprint: CRC32 over (table, byte-length)
    * of every driver parquet under `dir`. The driver regenerates
    * `/root/testdata` between rounds without notice (round 6 silently
    * lost six golden-pinned queries to one such shift) — every pinned
    * golden carries this fingerprint so drift is self-diagnosing, and
    * `TestdataCanonSpec` turns the next regeneration into a loud test
    * failure within minutes instead of a vanished CORRECTNESS entry.
    */
  def canonFingerprint(dir: String): Long = {
    val c = new java.util.zip.CRC32()
    c.update(names.map { n =>
      s"$n:${new java.io.File(s"$dir/$n.parquet").length}"
    }.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    c.getValue
  }

  /** Canonical event time in epoch NANOS (long), whatever the on-disk
    * type of `tsCol`. The driver's testdata has shipped `events.ts` as
    * both TIMESTAMP(NANOS)→long (under `nanosAsLong`) and
    * TIMESTAMP(MICROS)→timestamp_ntz across regenerations; every
    * event-time consumer must derive its clock through here so a canon
    * change is a schema-match branch, not an AnalysisException.
    * NTZ is interpreted as UTC (all graft sessions pin
    * `spark.sql.session.timeZone=UTC`), matching DuckDB's `epoch_ns`
    * on naive timestamps — the oracle side needs no per-type SQL.
    */
  def eventTimeNs(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType => col(tsCol)
      case TimestampType | TimestampNTZType =>
        unix_micros(col(tsCol).cast(TimestampType)) * lit(1000L)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported event-time type for `$tsCol`: $other")
    }

  /** Canonical event time as a real TIMESTAMP column (for streaming
    * watermarks / windows). µs resolution: the long-nanos form floors
    * to micros so both representations agree.
    */
  def eventTime(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType => timestamp_micros(floor(col(tsCol) / lit(1000L)).cast(LongType))
      case TimestampType | TimestampNTZType => col(tsCol).cast(TimestampType)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported event-time type for `$tsCol`: $other")
    }

  /** Register every table as a same-named temp view. No data is read
    * until an action runs, but each `load` DOES read a parquet footer
    * for the schema — ten driver round-trips per call — so repeat calls
    * on the same (session, dir) are memoized: a query invoked N times
    * (the bench's warm+3-timed protocol) pays catalog setup once, and
    * the timed runs measure the query. Keyed by session identity so a
    * rebuilt session (new catalog) re-registers.
    */
  // WeakHashMap on the session OBJECT: identity hashes collide across
  // GC'd sessions (a later session could silently no-op registration),
  // and weak keys let dead sessions drop out instead of pinning entries
  private val registered = new java.util.WeakHashMap[SparkSession, String]()
  def registerAll(spark: SparkSession, dir: String): Unit =
    // one lock around check+register: concurrent callers with different
    // dirs must not interleave the ten view writes (the memo would then
    // record one dir over a half-and-half catalog)
    registered.synchronized {
      // memoize the LAST dir, not a set: switching dirs must re-register
      // (the views are same-named), and switching back must re-register
      // again or stale views would serve the other dir's data. The memo
      // also assumes the views are still registered — a caller that
      // dropped or replaced one would otherwise be silently skipped —
      // so re-check the catalog (driver-side map lookups, no I/O)
      if (registered.get(spark) != dir ||
          !names.forall(spark.catalog.tableExists)) {
        names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir)
        ()
      }
    }
}
