package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-evolution reads over a growing corpus directory — the
  * arrival mode every long-lived training-data store hits: shards
  * written this year carry columns last year's shards don't, and a
  * reader must see the UNION schema with the missing columns as NULL
  * rather than silently dropping them.
  *
  * Spark's default (`mergeSchema=false`) picks an arbitrary footer's
  * schema — a column present only in newer shards can vanish without
  * an error. [[readMergedProven]] therefore carries its proof: it
  * requires every column the caller knows about to be present in the
  * merged schema, so a regression to the schema-dropping behavior
  * fails the read instead of corrupting the downstream aggregate.
  *
  * Scale note: schema merging reads FOOTERS, not data (one small task
  * per file at planning time); the data scan afterwards is an ordinary
  * pruned parquet read. At 100 TB keep per-directory file counts
  * bounded (compaction — [[BucketedStore.compact]]) so footer listing
  * stays cheap.
  */
object EvolvingStore {

  /** Append a shard (any schema) to the evolving directory. */
  def appendShard(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)

  /** Union-schema read across all shards; `expectedCols` is the proof
    * obligation — each must survive into the merged schema. */
  def readMergedProven(spark: SparkSession, dir: String,
                       expectedCols: Seq[String]): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    val have = df.schema.fieldNames.toSet
    val missing = expectedCols.filterNot(have)
    require(missing.isEmpty,
      s"merged read at $dir dropped columns ${missing.mkString(", ")} — " +
        s"schema merging did not see the newer shards (have: ${have.mkString(", ")})")
    df
  }
}
