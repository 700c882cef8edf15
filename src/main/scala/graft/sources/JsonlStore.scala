package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines corpus source/sink — the interchange format raw text
  * dumps actually arrive in (one document object per line). Counterpart
  * of the reference's CSV workload source/sink (`dqo/lab/workloads.py`)
  * for the document tables; parquet ([[BucketedStore]]) stays the
  * engine-native layout, JSONL is the ingestion/export boundary.
  *
  * Scale rules baked into the API:
  *  - **Schema is declared, never inferred.** Inference is a full extra
  *    pass over the data (and samples by default) — at corpus scale the
  *    schema is a contract, not a discovery.
  *  - **Malformed lines must not kill the job.** A thousand-executor
  *    ingest of a crawled dump WILL meet broken lines; PERMISSIVE mode
  *    routes them to a corrupt-record column so the pipeline counts and
  *    gates on them ([[readChecked]]) instead of dying at 97%.
  *  - **Splittability.** Uncompressed (or per-file-sharded) JSONL splits
  *    on line boundaries, so parallelism follows file size; gzip does
  *    not split — one giant .gz file serializes the whole scan. The
  *    writer therefore shards by the dataframe's partitioning.
  */
object JsonlStore {

  /** Column malformed lines land in (must be part of the read schema). */
  val CorruptCol = "_corrupt_record"

  /** Write one JSON object per row/line, sharded by `df`'s partitioning.
    * `compression` e.g. Some("gzip"): only with enough files to keep the
    * cluster busy — gzip shards don't split.
    */
  def write(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    compression.foreach(c => w.option("compression", c))
    w.json(path)
  }

  /** Permissive read with an explicit schema: well-formed lines bind to
    * `schema`'s columns, malformed ones surface whole in [[CorruptCol]]
    * (null everywhere else). Note Spark refuses queries that reference
    * ONLY the corrupt column on the raw relation — aggregate it together
    * with data columns or cache first ([[readChecked]] does).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Streaming ingest of a JSONL drop directory — the arrival mode of
    * real corpus dumps (files land continuously; each is one shard).
    * Same contract as [[read]]: declared schema, malformed lines routed
    * whole into [[CorruptCol]] rather than killing the stream. The
    * count-gate of [[readChecked]] has no streaming equivalent (no
    * eager count over an unbounded source); route
    * `where(col(CorruptCol).isNotNull)` to a quarantine sink and alert
    * on its rate instead.
    */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Gated ingest: fail fast if malformed lines exceed `maxCorrupt`,
    * then return the clean rows. The gate is two STREAMING counts — all
    * lines (PERMISSIVE) minus clean lines (DROPMALFORMED) — never a
    * cache of the corpus: persisting the whole ingest to run a count
    * would spill terabytes to executor storage and leak it for the
    * session (the returned frame gives callers no unpersist handle).
    * Two extra source scans are I/O-bounded and free of state; they also
    * sidestep Spark's corrupt-column-only query restriction.
    *
    * The shard list is snapshotted ONCE up front so all three scans (two
    * counts + the returned lazily-re-read frame) see the same files — a
    * drop directory is exactly the arrival mode where files land between
    * scans, which would otherwise let `bad` go negative (gate always
    * passes) and the returned rows differ from what was counted.
    */
  def readChecked(spark: SparkSession, path: String, schema: StructType,
                  maxCorrupt: Long = 0L): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(hp)).getOrElse(Array.empty)
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
        else Array(st)
      }
      .map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      .map(_.toString)
    require(files.nonEmpty, s"$path: no JSONL shards to ingest")
    def mode(m: String) =
      spark.read.schema(schema).option("mode", m).json(files.toIndexedSeq: _*)
    val total = mode("PERMISSIVE").count()
    val clean = mode("DROPMALFORMED")
    val bad = total - clean.count()
    require(bad <= maxCorrupt,
      s"$path: $bad malformed JSONL lines (gate: $maxCorrupt); " +
        s"inspect with JsonlStore.read(...).where(col(\"$CorruptCol\").isNotNull)")
    clean
  }
}
