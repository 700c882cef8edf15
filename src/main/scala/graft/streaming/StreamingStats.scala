package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.IncrementalStats
import graft.sources.JsonlStore

/** Streaming statistics maintenance: the arrival-mode composition of
  * [[IncrementalStats]] — every JSONL shard landing in a drop directory
  * is summarized ONCE into synopsis rows appended to a synopsis table;
  * the corpus stats model refreshes on demand by aggregating that
  * table. The corpus data itself is read exactly once, at arrival; a
  * model refresh touches kilobytes per shard ever ingested.
  *
  * Restart safety is merge-side and self-healing, mirroring
  * [[IngestDedup]]'s philosophy: a crash between the synopsis append
  * and the stream's checkpoint commit makes Spark replay the batch,
  * appending a SECOND copy of the same (batch_id, measure) rows —
  * synopsize is deterministic, so [[currentModel]] collapses exact
  * duplicates by key before merging and the replay is a no-op. No
  * ledger, no read-before-write race.
  */
object StreamingStats {

  final case class Config(anchors: Map[String, (Double, Double)],
                          synopsisDir: String, lgK: Int = 12)

  /** Summarize one clean micro-batch and append its synopsis rows.
    * Exposed for direct testing; [[start]] wires it into foreachBatch.
    */
  def processBatch(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val clean =
      if (batch.columns.contains(JsonlStore.CorruptCol))
        batch.where(col(JsonlStore.CorruptCol).isNull).drop(JsonlStore.CorruptCol)
      else batch
    IncrementalStats.synopsize(clean, cfg.anchors, cfg.lgK)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(cfg.synopsisDir)
  }

  /** Drop-directory stream: each arriving JSONL shard flows through
    * [[processBatch]] under the stream's checkpoint.
    */
  def start(spark: SparkSession, dropDir: String, schema: StructType,
            checkpointDir: String, cfg: Config,
            availableNow: Boolean = false): StreamingQuery = {
    val writer = JsonlStore.readStream(spark, dropDir, schema).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, cfg)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The model as of everything ingested so far: one aggregation over
    * the synopsis table. `dropDuplicates` on the (batch_id, measure)
    * KEY collapses crash-replay double-appends: any copy is a valid
    * representative — the counts/sums/histogram of a replayed batch are
    * deterministic, and the HLL sketch is semantically determined by
    * the batch's value set (its serialized bytes may differ with
    * partition order, which is why the dedup keys on the id, not the
    * content).
    */
  def currentModel(spark: SparkSession,
                   cfg: Config): Map[String, IncrementalStats.MeasureStats] = {
    val syn = spark.read.parquet(cfg.synopsisDir)
      .dropDuplicates("batch_id", "measure")
      .drop("batch_id")
    IncrementalStats.finalize(IncrementalStats.merge(syn))
  }
}
