package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout sinks for the 100 TB path: bucketed and partitioned
  * parquet, plus the co-located-join reader that proves the layout pays
  * off.
  *
  * At cluster scale the dominant cost of the engine's join/dedup
  * pipelines is the shuffle. Two layouts remove it at the source:
  *
  *  - **Bucketing** (`bucketBy` on the join/aggregation key): both sides
  *    of an equi-join pre-hashed into the same number of buckets join
  *    with ZERO exchanges — Spark's bucketed scan reports the hash
  *    partitioning, so `EnsureRequirements` inserts no shuffle. Filters
  *    on the bucket key also prune whole buckets at scan time.
  *  - **Partitioning** (`partitionBy` on a low-cardinality column):
  *    predicates on the partition column prune entire directories before
  *    any file is opened (`PartitionFilters` in the scan, zero I/O for
  *    excluded partitions).
  *
  * The reference stores workload tables in Postgres and leaves layout to
  * the DB (dqo/db/clients/postgres.py:241-317); here layout is a
  * first-class engine capability.
  */
object BucketedStore {

  /** Write `df` as a bucketed, bucket-sorted parquet table registered in
    * the session catalog. `numBuckets` sizes the parallelism of every
    * downstream co-located join/agg on `keyCol` — at 100 TB pick it so a
    * bucket fits an executor's memory (e.g. 2048 buckets for ~50 GB/b at
    * 100 TB); bucket counts must match on both join sides.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    numBuckets: Int, path: String): Unit =
    df.write.format("parquet")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Write `df` partitioned by directory on `partCols` (low-cardinality
    * columns only — each distinct tuple becomes a directory).
    */
  def writePartitioned(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.partitionBy(partCols: _*).mode("overwrite").parquet(path)

  /** Equi-join two bucketed tables on their shared bucket key. When both
    * were written via [[writeBucketed]] with the same bucket count, the
    * physical plan contains no ShuffleExchange on either side.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCol)

  /** Flatten a physical plan to its nodes, looking through the AQE
    * wrapper nodes (AdaptiveSparkPlanExec re-plans under itself; query
    * stages hold their subtree in `plan`). Shared by the layout proofs
    * here and the per-join-side assertions in tests.
    */
  def planNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => planNodes(a.executedPlan)
      case q: QueryStageExec => q +: planNodes(q.plan)
      case other => other +: other.children.flatMap(planNodes)
    }
  }

  /** True when the (sub)plan contains a shuffle exchange — including a
    * ReusedExchangeExec pointing at a shuffle planned elsewhere (the
    * subtree's data IS shuffled even though the exchange node lives in
    * another branch).
    */
  def subtreeHasShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    planNodes(p).exists {
      case _: ShuffleExchangeLike => true
      case r: ReusedExchangeExec => r.child.isInstanceOf[ShuffleExchangeLike]
      case _ => false
    }
  }

  /** True when the finalized physical plan of `df` contains no shuffle
    * exchange — the co-location proof used by tests and by callers
    * validating a layout before a big run.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !subtreeHasShuffle(df.queryExecution.executedPlan)

  /** Bytes of data files under `path` (Hadoop FS, recursive, dotfiles
    * and _SUCCESS markers excluded) — sizes the compaction target.
    */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Compact a small-file parquet directory into ~`targetBytes` files.
    * Incremental ingestion (per-batch appends, streaming sinks, one
    * file per task) accretes thousands of tiny files, and at corpus
    * scale that is an operational failure mode of its own: scan tasks
    * collapse to one-file granularity, footer reads dominate, and the
    * driver's file index bloats. The rewrite `coalesce`s to
    * ceil(bytes/targetBytes) output files — coalesce, not repartition:
    * compaction only ever REDUCES file count, and coalesce merges
    * partitions without a shuffle (the data is read once and written
    * once). Pass `shuffle = true` only when the inputs are skewed
    * enough that evenly-sized outputs are worth one full shuffle.
    * Returns the output file count.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 512L << 20, shuffle: Boolean = false): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val bytes = dataBytes(spark, inPath)
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val in = spark.read.parquet(inPath)
    val out = if (shuffle) in.repartition(parts) else in.coalesce(parts)
    out.write.mode("overwrite").parquet(outPath)
    parts
  }
}
