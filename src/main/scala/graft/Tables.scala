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

  /** Register every table as a same-named temp view. Lazy & cheap
    * (schema comes from parquet footers; no data is read until an
    * action runs). Safe to call repeatedly.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
