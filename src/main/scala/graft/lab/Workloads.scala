package graft.lab

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ir.{Frontend, TreeOps}
import graft.model.DbModel

/** Workload datasets: (query, runtime[, plan]) management — CSV source/
  * sink, log2 runtime bucketization, groom/augment/sample/split
  * (dqo/datasets/__init__.py).
  */
object Workloads {

  val BucketMin = -3
  val BucketMax = 8

  /** bucket = round(log2 runtime) clamped to [-3, 8]
    * (datasets/__init__.py:111-112,140) — spelled floor(log2+0.5) for
    * engine portability.
    */
  def withBucket(df: DataFrame, runtimeCol: String = "runtime"): DataFrame =
    df.withColumn("bucket",
      least(greatest(floor(log2(col(runtimeCol)) + 0.5), lit(BucketMin.toDouble)),
        lit(BucketMax.toDouble)).cast("int"))

  /** CSV workload source with dedup + bucket column (QueriesDataset.load,
    * datasets/__init__.py:116-141). Schema: query,runtime[,plan].
    */
  def load(spark: SparkSession, path: String, extended: Boolean = false): DataFrame = {
    val base = spark.read
      .option("header", "false").option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
    val named =
      if (extended) base.toDF("query", "runtime", "plan")
      else base.toDF(base.columns.take(2).zip(Seq("query", "runtime")).map(_._2): _*)
    withBucket(named.withColumn("runtime", col("runtime").cast("double"))
      .dropDuplicates("query"))
  }

  /** CSV sink, optionally as a stratified train/test split on the bucket
    * (QueriesDataset.save, datasets/__init__.py:239-267).
    */
  def save(df: DataFrame, prefix: String, split: Option[Double] = None,
           seed: Long = 42L): Unit = split match {
    case None =>
      df.select("query", "runtime").write.mode("overwrite")
        .option("quote", "\"").option("escape", "\"").csv(prefix)
    case Some(testFrac) =>
      val Array(train, test) = stratifiedSplit(df, testFrac, seed)
      train.select("query", "runtime").write.mode("overwrite")
        .option("quote", "\"").option("escape", "\"").csv(s"$prefix-train")
      test.select("query", "runtime").write.mode("overwrite")
        .option("quote", "\"").option("escape", "\"").csv(s"$prefix-test")
  }

  /** Stratified split on the log2 bucket (gerelt/data_module.py:15-70):
    * sampleBy keeps per-bucket proportions, the anti-join is the rest.
    */
  def stratifiedSplit(df: DataFrame, testFrac: Double, seed: Long): Array[DataFrame] = {
    val buckets = df.select("bucket").distinct().collect().map(_.getInt(0))
    val test = df.stat.sampleBy("bucket", buckets.map(b => (b, testFrac)).toMap, seed)
    val train = df.join(test.select("query"), Seq("query"), "left_anti")
    Array(train, test)
  }

  /** Groom: drop queries that fail to parse, are invalid, or form a
    * cartesian product (datasets/__init__.py:146-175). The parse runs as
    * a typed partition-local filter on the executors (the reference's
    * single-process loop caps campaign size at driver memory; here a
    * 100M-query workload grooms like any other DataFrame).
    */
  def groom(df: DataFrame, db: Option[DbModel]): DataFrame =
    df.filter { (row: org.apache.spark.sql.Row) =>
      scala.util.Try {
        TreeOps.toQuery(TreeOps.optimize(
          Frontend.parseSql(row.getAs[String]("query"), db))).valid
      }.getOrElse(false)
    }

  /** Augment: for each query emit up to `limit` equivalent permuted SQL
    * strings carrying the same runtime label (datasets/__init__.py:177-209
    * via tree permutations D2). Permutation fan-out happens per
    * partition on the executors; the dedup is one hash shuffle on the
    * SQL string.
    */
  def augment(df: DataFrame, db: Option[DbModel], limit: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select("query", "runtime").as[(String, Double)]
      .mapPartitions(_.flatMap { case (sql, rt) =>
        scala.util.Try {
          TreeOps.permutations(Frontend.parseSql(sql, db), limit)
            .map(p => (TreeOps.toQuery(p).toSql(pretty = false), rt))
        }.getOrElse(Seq((sql, rt)))
      })
      .distinct()
    withBucket(rows.toDF("query", "runtime"))
  }

  /** Parquet workload storage — the scale-native alternative to the
    * reference's CSV (columnar, splittable, predicate-pushable when
    * filtering workloads by bucket/runtime).
    */
  def loadParquet(spark: SparkSession, path: String): DataFrame =
    withBucket(spark.read.parquet(path).dropDuplicates("query"))

  def saveParquet(df: DataFrame, path: String): Unit =
    df.select("query", "runtime").write.mode("overwrite").parquet(path)

  /** Weighted / uniform / head sampling modes
    * (datasets/__init__.py:211-237).
    */
  def sample(df: DataFrame, n: Int, mode: String = "random", seed: Long = 42L): DataFrame =
    mode match {
      case "random" => df.orderBy(rand(seed)).limit(n)
      case "head" => df.orderBy(col("runtime").desc).limit(n)
      case "weighted" =>
        // inverse-frequency bucket weighting: emptier buckets oversampled
        val counts = df.groupBy("bucket").count()
        val total = df.count().toDouble
        df.join(counts, "bucket")
          .withColumn("w", lit(total) / col("count"))
          .orderBy((rand(seed) * col("w")).desc)
          .limit(n).drop("w", "count")
      case other => throw new IllegalArgumentException(s"unknown sample mode $other")
    }
}
