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

  /** Scan-1 aggregates per measure: min/max plus a DECIMAL-exact mean.
    * Spark's double `avg`/`var_samp`/`skewness`/`kurtosis` merge partial
    * aggregates in partition order, so their low bits change with the
    * split count — the same table yields a (ulp-)different model on a
    * different cluster size, which breaks model reproducibility (and the
    * golden-pinned encoder vectors downstream). The mean goes through an
    * exact decimal sum (order-independent); central moments move to scan
    * 2 as decimal-exact sums of range-normalized deviations. Domain
    * bound: |value| < 10^32 (decimal(38,6)) — holds for every measure
    * the model covers (prices, counts, epoch seconds, string lengths).
    * The same cast sets a LOWER precision cliff: values quantize at
    * 1e-6 absolute before summation, so a measure whose signal lives
    * below that (per-token probabilities, sub-micro rates) would mean
    * to 0 silently — rescale such columns before feeding the model.
    */
  private def numAggs(prefix: String, m: Column): Seq[Column] = Seq(
    min(m).as(s"${prefix}_min"), max(m).as(s"${prefix}_max"),
    avg(m.cast("decimal(38,6)")).cast("double").as(s"${prefix}_mean"))

  /** Scan-2 aggregates for one measure: exact decimal sums of the first
    * four powers of u = (x - mean)/width. |u| <= 1, so the quartic can
    * never overflow decimal(38,18) regardless of the column's magnitude
    * or the corpus size (a raw Σx⁴ of epoch-seconds overflows decimal at
    * any realistic row count); skew/kurt are scale-free so the
    * normalization cancels, and the variance rescales by width².
    */
  private def momentAggs(key: String, m: Column, mean: Double, width: Double): Seq[Column] = {
    val u = (m - lit(mean)) / lit(width)
    val u2 = u * u
    Seq("s1" -> u, "s2" -> u2, "s3" -> (u2 * u), "s4" -> (u2 * u2))
      .map { case (n, c) => sum(c.cast("decimal(38,18)")).as(s"${key}__$n") }
  }

  /** Driver-side combine of the scan-2 sums into (var_samp, skewness,
    * kurtosis) matching Spark's definitions (population m3/m2^1.5 and
    * m4/m2²-3, NaN on degenerate inputs) — pure double arithmetic over
    * exact sums, so the result is identical at any partition count.
    */
  private[model] def combineMoments(n: Long, width: Double,
                             s1: Double, s2: Double, s3: Double, s4: Double)
      : (Double, Double, Double) = {
    if (n == 0) return (Double.NaN, Double.NaN, Double.NaN)
    val nd = n.toDouble
    val c2 = s2 - s1 * s1 / nd
    val varSamp = if (n < 2) Double.NaN else width * width * c2 / (nd - 1)
    val m2 = c2 / nd
    val m3 = (s3 - 3 * s1 * s2 / nd + 2 * s1 * s1 * s1 / (nd * nd)) / nd
    val m4 = (s4 - 4 * s1 * s3 / nd + 6 * s1 * s1 * s2 / (nd * nd)
      - 3 * s1 * s1 * s1 * s1 / (nd * nd * nd)) / nd
    val skew = if (m2 > 0) m3 / (m2 * math.sqrt(m2)) else Double.NaN
    val kurt = if (m2 > 0) m4 / (m2 * m2) - 3 else Double.NaN
    (varSamp, skew, kurt)
  }

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
    val df = graft.ops.Spread(dfIn)
    val schema = TableModel(name,
      df.schema.fields.toSeq.flatMap(f =>
        DType.fromSpark(f.dataType).map(ColumnModel(f.name, _))))
    val nRowsCol = count(lit(1))

    def distinctAgg(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c, 0.01)

    // every moment-bearing measure: numeric/time columns plus the string
    // length and word-count distributions (key, expr, count-field)
    def strMeasures(c: ColumnModel): Seq[(String, Column)] = {
      val cc = col(c.name)
      Seq(s"${c.name}__len" -> length(cc).cast("double"),
        s"${c.name}__wc" -> size(split(cc, "\\s+")).cast("double"))
    }
    val allMeasures: Seq[(String, Column, String)] =
      schema.columns.flatMap { c =>
        measure(c).map(m => (c.name, m, c.name)).toSeq ++
          (if (c.dtype == DType.Str) strMeasures(c).map { case (k, m) => (k, m, c.name) }
           else Nil)
      }

    // ---- scan 1: counts + min/max + exact means for every column at once
    var aggs = Seq[Column](nRowsCol.as("__rows"))
    schema.columns.foreach { c =>
      val cc = col(c.name)
      aggs :+= count(cc).as(s"${c.name}__n")
      aggs :+= distinctAgg(cc).as(s"${c.name}__nd")
    }
    allMeasures.foreach { case (k, m, _) => aggs ++= numAggs(k, m) }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = r.getAs[Long]("__rows")

    // ---- scan 2: central-moment sums for every measure + equi-width
    // histograms for the numeric/time columns, ONE combined aggregation
    val momentTargets = allMeasures
      .map { case (k, m, nk) =>
        (k, m, nk, getD(r, s"${k}_min"), getD(r, s"${k}_max"), getD(r, s"${k}_mean")) }
      .filter { case (_, _, _, mn, mx, _) => !mn.isNaN && !mx.isNaN }
    val histTargets = schema.columns.filter(c => measure(c).isDefined)
      .map(c => c -> (getD(r, s"${c.name}_min"), getD(r, s"${c.name}_max")))
      .filter { case (_, (mn, mx)) => !mn.isNaN && !mx.isNaN }
    var moments = Map.empty[String, (Double, Double, Double)]
    var hists = Map.empty[String, (Seq[Double], Seq[Long])]
    if (momentTargets.nonEmpty) {
      var sAggs = Seq.empty[Column]
      momentTargets.foreach { case (k, m, _, mn, mx, mean) =>
        sAggs ++= momentAggs(k, m, mean, if (mx > mn) mx - mn else 1.0)
      }
      // width_bucket(v, min, max+1, 10) semantics (postgres.py:122-138):
      // per column, 10 conditional counts
      histTargets.foreach { case (c, (mn, mx)) =>
        val m = measure(c).get
        val w = (mx + 1.0 - mn) / HistBuckets
        (1 to HistBuckets).foreach { b =>
          val lo = mn + (b - 1) * w; val hi = mn + b * w
          sAggs :+= sum(when(m >= lo && m < hi, 1L).otherwise(0L)).as(s"${c.name}__h$b")
        }
      }
      val hr = df.agg(sAggs.head, sAggs.tail: _*).head()
      moments = momentTargets.map { case (k, _, nk, mn, mx, _) =>
        k -> combineMoments(r.getAs[Long](s"${nk}__n"),
          if (mx > mn) mx - mn else 1.0,
          getD(hr, s"${k}__s1"), getD(hr, s"${k}__s2"),
          getD(hr, s"${k}__s3"), getD(hr, s"${k}__s4"))
      }.toMap
      hists = histTargets.map { case (c, (mn, mx)) =>
        val w = (mx + 1.0 - mn) / HistBuckets
        val bounds = (1 to HistBuckets).map(b => mn + b * w)
        val freqs = (1 to HistBuckets).map(b => hr.getAs[Long](s"${c.name}__h$b"))
        c.name -> (bounds, freqs)
      }.toMap
    }

    def numStats(p: String): NumericStats = {
      val (v, sk, ku) = moments.getOrElse(p, (Double.NaN, Double.NaN, Double.NaN))
      NumericStats(getD(r, s"${p}_min"), getD(r, s"${p}_mean"), getD(r, s"${p}_max"),
        v, sk, ku)
    }

    val cols = schema.columns.map { c =>
      val n = r.getAs[Long](s"${c.name}__n")
      val nd = r.getAs[Long](s"${c.name}__nd")
      val numeric = measure(c).map { _ =>
        val base = numStats(c.name)
        hists.get(c.name) match {
          case Some((h, f)) => base.copy(hist = h, freq = f)
          case None => base
        }
      }
      val string = if (c.dtype == DType.Str)
        Some(StringStats(numStats(s"${c.name}__len"), numStats(s"${c.name}__wc")))
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
