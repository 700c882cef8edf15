package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
