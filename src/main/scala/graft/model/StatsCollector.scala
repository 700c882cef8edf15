package graft.model

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Builds the full [[DbModel]] from parquet tables with DataFrame
  * aggregations — the engine-native replacement for the reference's
  * Postgres stat probes (`StatQueries`, dqo/db/clients/postgres.py:65-238
  * and `Postgres.model`, postgres.py:321-377).
  *
  * Scale design: ONE wide aggregation per table computes every column's
  * count/nulls/distinct/min/max/moments in a single scan (the reference's
  * combined per-table query, postgres.py:189-211); histograms take a
  * second scan per table (they need min/max first), again one combined
  * aggregation for all numeric columns via width_bucket. Distinct counts
  * switch to approx_count_distinct at scale (`exact=false`) — HLL sketches
  * merge in the combiner, so the shuffle stays O(columns), not O(rows).
  * Timestamps are reduced to epoch seconds (postgres.py:177-186); strings
  * contribute length and word-count distributions (postgres.py:141-172).
  */
object StatsCollector {

  val HistBuckets = 10

  /** Probe expression for one column: measure column (numeric image) or
    * none for bool.
    */
  private def measure(c: ColumnModel): Option[Column] = c.dtype match {
    case DType.Float | DType.Number => Some(col(c.name).cast("double"))
    case DType.Time => Some(unix_seconds(col(c.name).cast("timestamp")).cast("double"))
    case _ => None
  }

  private def numAggs(prefix: String, m: Column, nRows: Column): Seq[Column] = Seq(
    min(m).as(s"${prefix}_min"), max(m).as(s"${prefix}_max"), avg(m).as(s"${prefix}_mean"),
    var_samp(m).as(s"${prefix}_var"), skewness(m).as(s"${prefix}_skew"),
    kurtosis(m).as(s"${prefix}_kurt"))

  /** Schema-only model (no stats) from parquet footers. */
  def schemaModel(spark: SparkSession, dir: String, tables: Seq[String]): DbModel =
    DbModel(tables.map { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      TableModel(t, df.schema.fields.toSeq.flatMap(f =>
        DType.fromSpark(f.dataType).map(ColumnModel(f.name, _))))
    })

  /** Index flag from key-naming convention (FIXTURES.md §6): Postgres'
    * pg_index probe (postgres.py:99-119) has no parquet analog.
    */
  private def indexed(table: String, colName: String): Boolean =
    colName == "id" || colName.endsWith("key") || colName.endsWith("_id")

  /** Collect full stats for one table in two scans. */
  def collectTable(dfIn: DataFrame, name: String, sizeBytes: Long,
                   exact: Boolean = true): TableModel = {
    // Parallelize small single-split sources: the exact-distinct Expand
    // multiplies rows by the distinct-agg count, and on one partition the
    // whole wide aggregate runs on one core (observed 51s for sf0.1
    // lineitem before this). Large inputs keep their natural splits.
    val par = dfIn.sparkSession.sparkContext.defaultParallelism
    val df = if (dfIn.rdd.getNumPartitions < par) dfIn.repartition(par) else dfIn
    val schema = TableModel(name,
      df.schema.fields.toSeq.flatMap(f =>
        DType.fromSpark(f.dataType).map(ColumnModel(f.name, _))))
    val nRowsCol = count(lit(1))

    def distinctAgg(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c, 0.01)

    // ---- scan 1: counts + moments for every column at once
    var aggs = Seq[Column](nRowsCol.as("__rows"))
    schema.columns.foreach { c =>
      val cc = col(c.name)
      aggs :+= count(cc).as(s"${c.name}__n")
      aggs :+= distinctAgg(cc).as(s"${c.name}__nd")
      measure(c).foreach { m => aggs ++= numAggs(c.name, m, nRowsCol) }
      if (c.dtype == DType.Str) {
        aggs ++= numAggs(s"${c.name}__len", length(cc).cast("double"), nRowsCol)
        aggs ++= numAggs(s"${c.name}__wc", size(split(cc, "\\s+")).cast("double"), nRowsCol)
      }
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = r.getAs[Long]("__rows")

    def numStats(r: Row, p: String): NumericStats = NumericStats(
      getD(r, s"${p}_min"), getD(r, s"${p}_mean"), getD(r, s"${p}_max"),
      getD(r, s"${p}_var"), getD(r, s"${p}_skew"), getD(r, s"${p}_kurt"))

    // ---- scan 2: combined equi-width histograms for numeric/time columns
    val histTargets = schema.columns.filter(c => measure(c).isDefined)
      .map(c => c -> (getD(r, s"${c.name}_min"), getD(r, s"${c.name}_max")))
      .filter { case (_, (mn, mx)) => !mn.isNaN && !mx.isNaN }
    val hists: Map[String, (Seq[Double], Seq[Long])] =
      if (histTargets.isEmpty) Map.empty
      else {
        // width_bucket(v, min, max+1, 10) semantics (postgres.py:122-138);
        // one groupBy-free scan: per column, 10 conditional counts
        var hAggs = Seq.empty[Column]
        histTargets.foreach { case (c, (mn, mx)) =>
          val m = measure(c).get
          val w = (mx + 1.0 - mn) / HistBuckets
          (1 to HistBuckets).foreach { b =>
            val lo = mn + (b - 1) * w; val hi = mn + b * w
            hAggs :+= sum(when(m >= lo && m < hi, 1L).otherwise(0L)).as(s"${c.name}__h$b")
          }
        }
        val hr = df.agg(hAggs.head, hAggs.tail: _*).head()
        histTargets.map { case (c, (mn, mx)) =>
          val w = (mx + 1.0 - mn) / HistBuckets
          val bounds = (1 to HistBuckets).map(b => mn + b * w)
          val freqs = (1 to HistBuckets).map(b => hr.getAs[Long](s"${c.name}__h$b"))
          c.name -> (bounds, freqs)
        }.toMap
      }

    val cols = schema.columns.map { c =>
      val n = r.getAs[Long](s"${c.name}__n")
      val nd = r.getAs[Long](s"${c.name}__nd")
      val numeric = measure(c).map { _ =>
        val base = numStats(r, c.name)
        hists.get(c.name) match {
          case Some((h, f)) => base.copy(hist = h, freq = f)
          case None => base
        }
      }
      val string = if (c.dtype == DType.Str)
        Some(StringStats(numStats(r, s"${c.name}__len"), numStats(r, s"${c.name}__wc")))
      else None
      c.copy(stats = Some(ColumnStats(nRows, nRows - n, nd, indexed(name, c.name),
        numeric, string)))
    }
    TableModel(name, cols, Some(TableStats(nRows, sizeBytes)))
  }

  private def getD(r: Row, field: String): Double = {
    val i = r.fieldIndex(field)
    if (r.isNullAt(i)) Double.NaN
    else r.get(i) match {
      case d: Double => d
      case l: Long => l.toDouble
      case x => x.toString.toDouble
    }
  }

  private def dirSize(path: String): Long = {
    val p = Paths.get(path)
    if (Files.isDirectory(p))
      Files.walk(p).filter(Files.isRegularFile(_)).mapToLong(Files.size).sum()
    else if (Files.exists(p)) Files.size(p) else 0L
  }

  /** Partition-column introspection (SURVEY §2.1 S6 — the engine analog
    * of the reference's pg_partitioned_table probe, postgres.py:19-45):
    * hive-style partition directories of a parquet dataset.
    */
  def partitionColumns(spark: SparkSession, path: String): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    spark.read.parquet(path).queryExecution.analyzed.collectFirst {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.partitionSchema.fieldNames.toSeq
    }.getOrElse(Nil)
  }

  private val memo = scala.collection.concurrent.TrieMap.empty[(String, Seq[String], Boolean), DbModel]

  /** Full model over the standard table set, with in-memory memoization
    * and optional JSON cache (mirrors Postgres.model(use_cache=True),
    * postgres.py:321-377 — the reference also caches its model).
    */
  def collect(spark: SparkSession, dir: String, tables: Seq[String],
              exact: Boolean = true, cachePath: Option[String] = None): DbModel =
    memo.getOrElseUpdate((dir, tables, exact), {
      cachePath.filter(p => Files.exists(Paths.get(p))).map { p =>
        ModelJson.fromJson(Files.readString(Paths.get(p)))
      }.getOrElse {
        val db = DbModel(tables.map { t =>
          val path = s"$dir/$t.parquet"
          collectTable(spark.read.parquet(path), t, dirSize(path), exact)
        })
        cachePath.foreach(p => Files.writeString(Paths.get(p), ModelJson.toJson(db)))
        db
      }
    })
}
