package graft.estimate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Distributed workload scoring — the serving half of the neural
  * estimator. Training runs on the driver (campaign n is thousands of
  * measured queries); SCORING is the part that has to scale: a system
  * routing millions of queries per day wants the predicted-runtime
  * bucket stamped onto every query of a workload table without the
  * SQL corpus ever visiting the driver.
  *
  * Scale shape: both checkpoints (model JSON, stats-model JSON — tens
  * to hundreds of KB) are broadcast as TEXT and parsed once per
  * partition inside `mapPartitions`, so executors never touch the
  * driver's filesystem and none of the model classes need to be
  * java-serializable. The job is one narrow map over however the
  * workload is already partitioned — zero shuffles, zero collects —
  * and per-row work is exactly the encode+forward the driver-side
  * sweep does ([[graft.tools.GruSweep]]).
  *
  * Reference analog: dqo's estimator trains in `train.py` and then
  * batch-applies predictions to workload CSVs driver-side
  * (dqo/estimator/gerelt/v20/train.py, estimate.py); re-expressed as a
  * DataFrame transform instead of a Python loop.
  */
object Scoring {

  /** Score `workload`'s `sqlCol` with a persisted GRU bucket
    * classifier ([[ModelIo.saveGru]] JSON, z-score constants riding
    * along) against `statsJson` ([[graft.model.ModelJson]]).
    *
    * Output columns: the SQL column (name preserved), `bucket` — the
    * predicted reference-space runtime bucket (0..8,
    * dqo/estimator/partitioner.py:40-46) — and `est_seconds`, the
    * bucket center 2^b. Rows whose SQL does not parse or bind against
    * the stats model keep their row with `bucket = -1` /
    * `est_seconds = NaN`: a scorer that silently drops rows would
    * corrupt any downstream join on the workload.
    */
  def scoreWorkload(spark: SparkSession, workload: DataFrame, sqlCol: String,
                    modelJson: String, statsJson: String): DataFrame = {
    import spark.implicits._
    val bModel = spark.sparkContext.broadcast(modelJson)
    val bStats = spark.sparkContext.broadcast(statsJson)
    workload.select(col(sqlCol).cast("string")).as[String]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val (model, norm) = ModelIo.loadGruNormFromJson(bModel.value)
          val db = graft.model.ModelJson.fromJson(bStats.value)
          val dim = model.p.cfg.inputDim
          it.map { sql =>
            val bucket = scala.util.Try {
              val raw = graft.encode.SetEncoders.flatMatrix(db, sql)
                .map(_.padTo(dim, 0.0))
              val seq = norm match {
                case Some((m, sd)) => raw.map { row =>
                  Array.tabulate(dim)(i => (row(i) - m(i)) / sd(i))
                }
                case None => raw
              }
              model.predict(seq)
            }.getOrElse(-1)
            (sql, bucket,
              if (bucket >= 0) math.pow(2.0, bucket) else Double.NaN)
          }
        }
      }
      .toDF(sqlCol, "bucket", "est_seconds")
  }

  /** Score `workload`'s `sqlCol` with a persisted v20 four-traversal
    * GRU REGRESSOR ([[ModelIo.saveGru4]] — the reference's flagship
    * model shape, gerelt/v20/model.py:94-122): continuous
    * `log2_seconds` plus its exponentiation `est_seconds`, over the
    * parent-linked tree encoding. Same broadcast-text /
    * parse-once-per-partition / shuffle-free shape as
    * [[scoreWorkload]]; unbindable SQL keeps its row with NaNs.
    */
  def scoreWorkloadV20(spark: SparkSession, workload: DataFrame, sqlCol: String,
                       modelJson: String, statsJson: String): DataFrame = {
    import spark.implicits._
    val bModel = spark.sparkContext.broadcast(modelJson)
    val bStats = spark.sparkContext.broadcast(statsJson)
    workload.select(col(sqlCol).cast("string")).as[String]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val (model, norm) = ModelIo.loadGru4NormFromJson(bModel.value)
          val db = graft.model.ModelJson.fromJson(bStats.value)
          val dim = model.p.cfg.inputDim
          it.map { sql =>
            val log2 = scala.util.Try {
              val (parents, vecs) =
                graft.encode.SetEncoders.treeWithParents(db, sql)
              val padded = vecs.map(_.padTo(dim, 0.0))
              val z = norm match {
                case Some((m, sd)) => padded.map { row =>
                  Array.tabulate(dim)(i => (row(i) - m(i)) / sd(i))
                }
                case None => padded
              }
              model.predict(Gru4.fromParents(parents, z))
            }.getOrElse(Double.NaN)
            (sql, log2, math.pow(2.0, log2))
          }
        }
      }
      .toDF(sqlCol, "log2_seconds", "est_seconds")
  }
}
