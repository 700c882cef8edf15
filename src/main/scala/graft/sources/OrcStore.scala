package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col

/** ORC source/sink — the second columnar format beside parquet, so a
  * pipeline can interoperate with ORC-resident warehouses (Hive-era lakes)
  * without a conversion hop. Mirrors the storage-switch idea of the
  * reference's pluggable DB clients (reference: dqo/db/clients/__init__.py:8-17,
  * one engine behind a stable read surface).
  *
  * Scale design (100 TB): `writeSorted` range-partitions on the sort key
  * before sorting within partitions, so every output file covers a tight,
  * non-overlapping key interval and ORC's file/stripe/row-group min-max
  * statistics prune reads server-side; a point or range predicate then
  * touches O(matching files), not the table. `readWhereProven` fails hard
  * unless the predicate actually reached the ORC scan as a pushed filter —
  * a silently-unpushed filter (e.g. after a cast regression) would still
  * return correct rows while scanning everything, which is exactly the
  * kind of 100× regression a value-only check cannot see.
  */
object OrcStore {

  /** Write `df` as `numFiles` ORC files range-partitioned + sorted on
    * `sortCol`, so min/max stripe statistics are tight and disjoint.
    */
  def writeSorted(df: DataFrame, path: String, sortCol: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").orc(path)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  /** Filtered ORC read that REQUIRES the predicate to be pushed into the
    * scan (ORC searchable-argument pushdown). Throws if the plan shows an
    * empty `PushedFilters` — correctness would survive, scan efficiency
    * would not.
    */
  def readWhereProven(spark: SparkSession, path: String, pred: Column): DataFrame = {
    val df = read(spark, path).where(pred)
    val scan = BucketedStore.planNodes(df.queryExecution.executedPlan)
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(sys.error(s"no file scan in the ORC read of $path"))
    // a null-intolerant predicate always contributes IsNotNull(attr),
    // which is pushable even when the comparison itself is not — only a
    // REAL pushed comparison proves the scan can skip stripes
    val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
      .stripPrefix("[").stripSuffix("]").split(",").map(_.trim)
      .filter(f => f.nonEmpty && !f.startsWith("IsNotNull"))
    require(pushed.nonEmpty,
      s"predicate not pushed to the ORC scan of $path:\n" +
        df.queryExecution.executedPlan)
    df
  }
}
