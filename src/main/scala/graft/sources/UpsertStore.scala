package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.PortableHash.hash60

/** Keyed upsert (MERGE) into a hash-sharded parquet layout — incremental
  * corpus maintenance without a table format: re-crawled documents
  * replace their previous version, new documents append, untouched data
  * is never rewritten.
  *
  * Layout: the table is partitioned by `__shard = hash60(key) % numShards`
  * (directory-level partitioning, not bucketing — partitions support
  * DYNAMIC overwrite, which is the primitive that makes a partial rewrite
  * safe). The shard column is derived, stable, and portable (md5-based
  * [[hash60]]), so every future upsert routes a key to the same shard.
  *
  * Scale design (100 TB): an upsert batch touches only the shards its
  * keys hash into. The merge reads THOSE directories alone (partition
  * filter proven by the pruned-scan pattern of q65), anti-joins the batch
  * keys out, unions the batch in, and rewrites with
  * `partitionOverwriteMode=dynamic` — Spark replaces exactly the
  * partitions present in the written data, the other `numShards − |hit|`
  * directories keep their files byte-identical (asserted via file
  * listings in UpsertStoreSpec). Cost scales with batch size × table/
  * numShards, independent of table size, so `numShards` is the knob:
  * size shards to a few GB so one shard's rewrite fits an executor
  * comfortably. Not transactional across shards (parquet has no commit
  * protocol spanning directories) — a failed upsert can leave a subset
  * of shards new; re-running the same batch is idempotent (anti-join +
  * union is a deterministic function of (table, batch)).
  */
object UpsertStore {

  val ShardCol = "__shard"

  private def sharded(df: DataFrame, keyCol: String, numShards: Int): DataFrame =
    df.withColumn(ShardCol, pmod(hash60(col(keyCol).cast("string")), lit(numShards)).cast("int"))

  /** Initial write of a keyed table: hash-sharded directories. */
  def writeKeyed(df: DataFrame, path: String, keyCol: String, numShards: Int): Unit = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(!df.columns.contains(ShardCol), s"input already has a $ShardCol column")
    sharded(df, keyCol, numShards).write
      .mode("overwrite").partitionBy(ShardCol).parquet(path)
  }

  /** Read the keyed table (shard column dropped). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(ShardCol)

  /** Upsert `updates` into the table at `path` by `keyCol`: rows whose
    * key exists are replaced, new keys are inserted, and ONLY the shard
    * directories hit by the batch are rewritten. `updates` must carry
    * the table's full schema (minus [[ShardCol]]) and at most one row
    * per key.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keyCol: String, numShards: Int): Unit = {
    require(!updates.columns.contains(ShardCol), s"updates already have $ShardCol")
    val batch = sharded(updates, keyCol, numShards).cache()
    try {
      val dupKeys = batch.groupBy(col(keyCol)).count().where(col("count") > 1).count()
      require(dupKeys == 0L, s"$dupKeys duplicate keys in the upsert batch")
      val hit = batch.select(ShardCol).distinct()
        .collect().map(_.getInt(0)).sorted
      // partition-pruned read of ONLY the hit shards: the IN-list is a
      // literal, so it prunes directories at planning time (q65 pattern)
      val existing = spark.read.parquet(path)
        .where(col(ShardCol).isin(hit.map(Integer.valueOf).toSeq: _*))
      // prove the pruning before writing anything: a regression that
      // turned this into a full-table read would still merge correctly
      // while silently rewriting cost O(table) instead of O(batch)
      val scan = BucketedStore.planNodes(existing.queryExecution.executedPlan)
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .getOrElse(sys.error(s"no file scan in the shard read of $path"))
      require(scan.partitionFilters.nonEmpty,
        s"shard predicate not pushed as a partition filter on $path:\n" +
          existing.queryExecution.executedPlan)
      val merged = existing.join(
          batch.select(col(keyCol).as("__k")), col(keyCol) === col("__k"), "left_anti")
        .unionByName(batch)
      // dynamic mode replaces exactly the partitions present in `merged`
      // (= the hit shards); all other shard directories are untouched
      merged.write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(ShardCol)
        .parquet(path)
    } finally { batch.unpersist(); () }
  }
}
