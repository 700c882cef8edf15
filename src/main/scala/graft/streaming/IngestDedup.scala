package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.{Dedup, TextAnalysis}
import graft.sources.JsonlStore

/** End-to-end streaming ingestion dedup: the arrival-mode composition of
  * pieces that exist separately — [[JsonlStore.readStream]] over a JSONL
  * drop directory → corrupt-line quarantine → [[TextAnalysis.cleanText]]
  * → per-micro-batch LSH dedup against the persisted index AND within
  * the batch ([[Dedup.incrementalLshCandidates]]) → accepted docs folded
  * into the index ([[Dedup.appendToLshIndex]]) and appended to the
  * curated output.
  *
  * Scale design: every micro-batch costs O(batch) — the batch computes
  * its own band rows and probes the bucketed index in place (corpus side
  * never shuffles); the accepted append adds bucket-aligned files (see
  * BucketedStore.compactBucketed for reclaiming the accreted small
  * files). Restart safety is SELF-HEALING rather than ledger-based:
  * Spark replays the last uncommitted micro-batch after a crash, and the
  * id-level anti-join against the index makes a replayed append a no-op
  * — cheaper to reason about than a batchId ledger and robust to a crash
  * BETWEEN the index append and the sink commit.
  */
object IngestDedup {

  /** Ingestion parameters: LSH signature config must match the index
    * build (validated by the probe/append calls), `acceptedDir` receives
    * the curated corpus, `quarantineDir` the malformed JSONL lines.
    */
  final case class Config(idCol: String, textCol: String,
                          k: Int, shingleN: Int, bands: Int,
                          indexTable: String, acceptedDir: String,
                          quarantineDir: String)

  /** One micro-batch through the dedup gate; returns the number of
    * ACCEPTED rows after folding them into the index and the curated
    * output (returning the frame itself would be a trap: once the batch
    * ids are in the index, recomputing it yields empty). Exposed for
    * direct testing — [[start]] wires it into foreachBatch.
    *
    * Steps, in order:
    *  1. corrupt rows (JSONL lines that failed the schema) append to the
    *     quarantine as raw lines;
    *  2. clean rows get `clean_text` (tag strip, PII masking);
    *  3. a doc is REJECTED if it has any LSH candidate — against the
    *     index, or against a batch-internal doc with a smaller id (the
    *     orientation [[Dedup.incrementalLshCandidates]] guarantees), or
    *     an id already in the index (the replay no-op);
    *  4. survivors append to the index and to `acceptedDir`.
    */
  def processBatch(spark: SparkSession, rawBatch: DataFrame, cfg: Config): Long = {
    // persist first: Spark refuses corrupt-column-only projections
    // against a raw JSON source (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    // the batch is re-read several times below anyway.
    // NOTE: under foreachBatch the batch belongs to a per-micro-batch
    // session CLONE; all table reads below go through it (not the outer
    // session) so the probe always sees this stream's own appends. Other
    // sessions reading the index concurrently must refreshTable first —
    // standard Spark cross-session relation-cache semantics.
    val batch = rawBatch.persist()
    try processPersisted(batch.sparkSession, batch, cfg)
    finally { batch.unpersist(); () }
  }

  private def processPersisted(spark: SparkSession, batch: DataFrame, cfg: Config): Long = {
    val corrupt = batch.where(col(JsonlStore.CorruptCol).isNotNull)
      .select(col(JsonlStore.CorruptCol).as("line"))
    // quarantine is append-mode text: one raw line per malformed record
    corrupt.write.mode("append").text(cfg.quarantineDir)

    val clean = batch.where(col(JsonlStore.CorruptCol).isNull)
      .drop(JsonlStore.CorruptCol)
    val cleaned = clean
      .join(TextAnalysis.cleanText(clean, cfg.idCol, cfg.textCol)
          .select(col(cfg.idCol), col("clean_text")),
        Seq(cfg.idCol))
      .drop(cfg.textCol)
      .withColumnRenamed("clean_text", cfg.textCol)
      // one deterministic pass: the batch is probed, appended, and
      // written — recomputing the clean join 3× invites plan divergence
      .persist()
    try {
      val dupIds = Dedup.incrementalLshCandidates(cleaned, cfg.idCol, cfg.textCol,
          cfg.k, cfg.shingleN, cfg.bands, cfg.indexTable)
        .select(col("id_new").as(cfg.idCol)).distinct()
      val indexIds = spark.table(cfg.indexTable)
        .select(col(cfg.idCol)).distinct()
      // localCheckpoint, NOT persist: the accepted plan reads the index
      // table, and appendToLshIndex's write below triggers Spark's cache
      // refresh, which would RE-EXECUTE a merely-cached plan against the
      // just-appended index (anti-join then empties it — the curated
      // write would silently drop the whole batch). Checkpointing
      // truncates the lineage so the accepted rows are pinned before the
      // index moves. Executor-storage cost is one micro-batch.
      val accepted = cleaned
        .join(dupIds, Seq(cfg.idCol), "left_anti")
        // replay self-healing: ids already in the index were accepted by
        // a previous (crashed-after-append) attempt of this same batch
        .join(indexIds, Seq(cfg.idCol), "left_anti")
        .localCheckpoint()
      val n = accepted.count()
      if (n > 0) {
        Dedup.appendToLshIndex(accepted, cfg.idCol, cfg.textCol,
          cfg.k, cfg.shingleN, cfg.bands, cfg.indexTable)
        accepted.write.mode("append").parquet(cfg.acceptedDir)
      }
      n
    } finally cleaned.unpersist()
  }

  /** Start the drop-directory ingestion stream: every new JSONL shard
    * under `dropDir` flows through [[processBatch]]. The checkpoint
    * makes restarts resume from the last committed micro-batch; a batch
    * that crashed mid-append replays and no-ops (see class doc).
    */
  def start(spark: SparkSession, dropDir: String, schema: StructType,
            checkpointDir: String, cfg: Config,
            availableNow: Boolean = false): StreamingQuery = {
    val stream = JsonlStore.readStream(spark, dropDir, schema)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, cfg)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
