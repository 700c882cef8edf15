package graft.model

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable per-shard statistics synopses — the 100 TB stats-refresh
  * path. [[StatsCollector.collectTable]] rescans a table to build its
  * model; at corpus scale a rescan per arriving shard is the thing you
  * cannot afford. This module makes the model INCREMENTAL: each shard
  * is summarized once into a kilobyte-sized synopsis row per measure
  * (exact decimal moment sums + a Datasketches HLL sketch + anchored
  * histogram counts), synopses persist as an ordinary parquet table,
  * and refreshing the corpus model is an aggregation over synopsis
  * rows — shuffling kilobytes, never re-reading data.
  *
  * Exactness contract: count/nulls/min/max/histogram counts and the
  * four moment sums merge EXACTLY (decimal addition is associative and
  * the per-row quantization is identical in every shard), so
  * synopsize(whole) == merge(synopsize(parts)) bit-for-bit — asserted
  * in IncrementalStatsSpec and driver query q84. Distinct counts merge
  * at the sketch level (HLL union at the same lgK): the union's
  * estimate is not bit-identical to a one-shot sketch (the union can
  * promote the register representation) but tracks it within well
  * under a percent, and stays inside the usual HLL error band of the
  * exact count.
  *
  * The moment sums are anchored: u = (x - lo) / width with (lo, width)
  * FIXED per measure across all shards (bootstrapped once from an
  * existing model via [[anchorsFor]], then part of the synopsis
  * contract — [[merge]] groups by the anchor so mismatched anchor
  * generations can never silently combine; [[finalize]] rejects them).
  * [[StatsCollector.combineMoments]] recovers variance/skew/kurtosis
  * from anchored sums unchanged: its s1²/n correction is exact for any
  * affine anchor, the anchor only conditions the decimal quantization.
  * Values outside [lo, lo+width] (a shard exceeding the bootstrap
  * range) stay exact too — |u| merely exceeds 1, and decimal(38,12)
  * leaves 26 integer digits of headroom for the quartic.
  *
  * Scale 12 (not 18) is a deliberate throughput choice, and the
  * quantization runs as round-to-long, not cast-to-decimal: casting a
  * double to ANY DecimalType materializes a per-row BigDecimal (that
  * cast alone was ~4x the cost of a plain sum), whereas
  * `round(u·10^12) → long → decimal(20,0)` keeps the whole per-row
  * path in whole-stage codegen on primitives and the sum buffer on
  * Spark's compact-long Decimal fast path; the 10^-12 rescale happens
  * once per synopsis row on the driver. The u's are O(1), so 1e-12
  * quantization keeps the finalized moments within ~1e-11 relative of
  * the two-scan collector (asserted at 1e-9 in the spec) — and the
  * merge-exactness contract is quantization-blind: every shard
  * quantizes identically, so sums still merge bit-for-bit.
  */
object IncrementalStats {

  val HistBuckets: Int = StatsCollector.HistBuckets

  /** (lo, width) anchor per measurable column, bootstrapped from an
    * already-collected model (the natural lifecycle: one initial
    * [[StatsCollector.collect]] to seed, incremental forever after).
    */
  def anchorsFor(table: TableModel): Map[String, (Double, Double)] =
    table.columns.flatMap { c =>
      c.stats.flatMap(_.numeric).map { n =>
        val w = if (n.max > n.min) n.max - n.min else 1.0
        c.name -> (n.min, w)
      }
    }.toMap

  private def measureExpr(df: DataFrame, colName: String): Column = {
    val dt = df.schema(colName).dataType.typeName
    // "timestamp" and "timestamp_ntz" both measure as epoch seconds
    if (dt.startsWith("timestamp"))
      unix_seconds(col(colName).cast("timestamp")).cast("double")
    else col(colName).cast("double")
  }

  /** Summarize one shard into one synopsis row per measure, in a single
    * aggregation scan. Output schema (one row per measure):
    * measure, anchor_lo, anchor_w, n, nulls, vmin, vmax,
    * s1..s4 (decimal(38,12) sums of u powers), hll (binary sketch),
    * hist (array of HistBuckets anchored bucket counts).
    *
    * Performance shape, measured at sf0.1: (a) a TypedImperativeAggregate
    * (the HLL sketch) anywhere in an aggregation forces the WHOLE
    * aggregation onto the non-codegen ObjectHashAggregate path — the
    * sketches therefore aggregate separately from the ~54 numeric
    * buffers (5-6 s/scan combined → ~1 s/scan split, both scans pruning
    * to exactly the measure columns); (b) every double→decimal cast
    * allocates a per-row BigDecimal, so the quantization runs as
    * round-to-long in the projection and only the SUM is decimal;
    * (c) per-row-per-buffer update cost still dominates, so backfilling
    * many shards should use [[synopsizeGrouped]] (all shards in one
    * grouped pass) rather than a scan per shard.
    */
  def synopsize(df: DataFrame, anchors: Map[String, (Double, Double)],
                lgK: Int = 12): DataFrame =
    build(df, anchors, lgK, shard = None)

  /** Synopsize EVERY shard of one table in a single pass: `shard` labels
    * rows (a partition column, a file id, a date), and the output has
    * one synopsis row per (shard value, measure) — the backfill path
    * for an already-partitioned corpus, one grouped scan instead of a
    * scan per shard. Output schema = `shard` string column + the
    * [[synopsisSchema]] fields. The grouped wide rows are collected to
    * the driver for restructuring, so shard cardinality must be
    * driver-bounded (thousands, not millions) — the same bound a
    * per-shard synopsis table wants anyway.
    */
  def synopsizeGrouped(df: DataFrame, shard: Column,
                       anchors: Map[String, (Double, Double)],
                       lgK: Int = 12): DataFrame =
    build(df, anchors, lgK, shard = Some(shard))

  private def build(df: DataFrame, anchors: Map[String, (Double, Double)],
                    lgK: Int, shard: Option[Column]): DataFrame = {
    require(anchors.nonEmpty, "no measures to synopsize")
    val keys = anchors.keys.toSeq.sorted
    var proj = shard.map(s => s.cast("string").as("__shard")).toSeq
    keys.foreach { k =>
      val (lo, w) = anchors(k)
      val m = measureExpr(df, k)
      val u = (m - lit(lo)) / lit(w)
      val u2 = u * u
      val bw = (w + 1.0) / HistBuckets
      // round-to-long quantization at 1e-12 (see class doc): u is O(1),
      // so u⁴·10^12 ≤ ~1.6e13 for even far-out-of-anchor values — exact
      // in a double and far inside a long
      def q(c: Column) = round(c * lit(1e12)).cast("long")
      proj ++= Seq(
        m.as(s"${k}__m"),
        when(col(k).isNull, 1L).otherwise(0L).as(s"${k}__isnull"),
        q(u).as(s"${k}__u1"),
        q(u2).as(s"${k}__u2"),
        q(u2 * u).as(s"${k}__u3"),
        q(u2 * u2).as(s"${k}__u4"),
        // anchored equi-width bucket id clamped to [1, HistBuckets]:
        // the two clamp tails catch values outside the bootstrap range,
        // so per-shard counts stay addable under a FIXED anchor
        least(greatest(floor((m - lit(lo)) / lit(bw)).cast("int") + 1,
          lit(1)), lit(HistBuckets)).as(s"${k}__b"))
    }
    val projected = df.select(proj: _*)
    var aggs = Seq.empty[Column]
    keys.foreach { k =>
      aggs ++= Seq(
        count(col(s"${k}__m")).as(s"${k}__n"),
        sum(col(s"${k}__isnull")).as(s"${k}__nulls"),
        min(col(s"${k}__m")).as(s"${k}__min"),
        max(col(s"${k}__m")).as(s"${k}__max"),
        // decimal(20,0) of the quantized longs: the sum's buffer stays
        // on the compact-long fast path, and its decimal(30,0) result
        // type is overflow-checked (a long sum would wrap silently)
        sum(col(s"${k}__u1").cast("decimal(20,0)")).as(s"${k}__s1"),
        sum(col(s"${k}__u2").cast("decimal(20,0)")).as(s"${k}__s2"),
        sum(col(s"${k}__u3").cast("decimal(20,0)")).as(s"${k}__s3"),
        sum(col(s"${k}__u4").cast("decimal(20,0)")).as(s"${k}__s4"))
      (1 to HistBuckets).foreach { b =>
        aggs :+= sum(when(col(s"${k}__b") === b, 1L).otherwise(0L)).as(s"${k}__h$b")
      }
    }
    val rows = shard match {
      case None => Seq(((), projected.agg(aggs.head, aggs.tail: _*).head()))
      case Some(_) => projected.groupBy(col("__shard"))
        .agg(aggs.head, aggs.tail: _*).collect().toSeq
        .map(r => (r.getAs[String]("__shard"), r))
    }
    // the sketch accepts int/long/string/binary only: sketch the
    // canonical string image (injective for every non-NaN value)
    val sketchAggs =
      keys.map(k => hll_sketch_agg(col(k).cast("string"), lgK).as(s"${k}__hll"))
    val sketchRows: Map[Any, Row] = shard match {
      case None =>
        Map(((): Any) -> df.agg(sketchAggs.head, sketchAggs.tail: _*).head())
      case Some(s) => df.groupBy(s.cast("string").as("__shard"))
        .agg(sketchAggs.head, sketchAggs.tail: _*).collect().toSeq
        .map(r => (r.getAs[String]("__shard"): Any) -> r).toMap
    }
    // restructure the wide rows into long synopsis rows (driver-side,
    // bounded: one row per shard per measure, KBs each)
    val spark = df.sparkSession
    val out = rows.flatMap { case (shardKey, row) =>
      val sketchRow = sketchRows(shardKey)
      keys.map { k =>
        val (lo, w) = anchors(k)
        // rescale the integer sum back to value units (×10^-12), once
        // per synopsis row — the only BigDecimal work in the pipeline
        def d(f: String): java.math.BigDecimal = {
          val i = row.fieldIndex(f)
          val raw = if (row.isNullAt(i)) java.math.BigDecimal.ZERO else row.getDecimal(i)
          raw.movePointLeft(12).setScale(12)
        }
        def dbl(f: String): java.lang.Double = {
          val i = row.fieldIndex(f)
          if (row.isNullAt(i)) null else java.lang.Double.valueOf(getDouble(row, i))
        }
        val core = Seq[Any](k, lo, w,
          row.getAs[Long](s"${k}__n"), row.getAs[Long](s"${k}__nulls"),
          dbl(s"${k}__min"), dbl(s"${k}__max"),
          d(s"${k}__s1"), d(s"${k}__s2"), d(s"${k}__s3"), d(s"${k}__s4"),
          sketchRow.getAs[Array[Byte]](s"${k}__hll"),
          (1 to HistBuckets).map(b => row.getAs[Long](s"${k}__h$b")))
        Row.fromSeq(if (shard.isDefined) shardKey +: core else core)
      }
    }
    val schema = if (shard.isDefined)
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.StringType, nullable = true) +: synopsisSchema.fields.toSeq)
    else synopsisSchema
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
  }

  private def getDouble(r: Row, i: Int): Double = r.get(i) match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case n: java.lang.Number => n.doubleValue()
  }

  import org.apache.spark.sql.types._
  val synopsisSchema: StructType = StructType(Seq(
    StructField("measure", StringType, nullable = false),
    StructField("anchor_lo", DoubleType, nullable = false),
    StructField("anchor_w", DoubleType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("nulls", LongType, nullable = false),
    StructField("vmin", DoubleType, nullable = true),
    StructField("vmax", DoubleType, nullable = true),
    StructField("s1", DecimalType(38, 12), nullable = true),
    StructField("s2", DecimalType(38, 12), nullable = true),
    StructField("s3", DecimalType(38, 12), nullable = true),
    StructField("s4", DecimalType(38, 12), nullable = true),
    StructField("hll", BinaryType, nullable = true),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Merge any number of synopsis rows (across shards AND across
    * append batches — the operation is the same) into one row per
    * measure. Grouping includes the anchor columns on purpose: rows
    * from different anchor generations land in separate groups instead
    * of summing nonsense; [[finalize]] rejects the resulting duplicate.
    * Histogram counts add positionally via a posexplode round-trip —
    * the array is HistBuckets long, so the shuffle carries nothing.
    */
  def merge(synopses: DataFrame): DataFrame = {
    val flat = synopses.select(col("measure"), col("anchor_lo"), col("anchor_w"),
      col("n"), col("nulls"), col("vmin"), col("vmax"),
      col("s1"), col("s2"), col("s3"), col("s4"), col("hll"),
      posexplode(col("hist")).as(Seq("hb", "hc")))
    val hists = flat.groupBy("measure", "anchor_lo", "anchor_w", "hb")
      .agg(sum(col("hc")).as("hc"))
      .groupBy("measure", "anchor_lo", "anchor_w")
      .agg(map_from_arrays(collect_list(col("hb")), collect_list(col("hc"))).as("hm"))
      .select(col("measure"), col("anchor_lo"), col("anchor_w"),
        transform(sequence(lit(0), lit(HistBuckets - 1)),
          i => element_at(col("hm"), i)).as("hist"))
    synopses.groupBy("measure", "anchor_lo", "anchor_w").agg(
        sum(col("n")).cast("long").as("n"),
        sum(col("nulls")).cast("long").as("nulls"),
        min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"),
        sum(col("s1")).cast("decimal(38,12)").as("s1"),
        sum(col("s2")).cast("decimal(38,12)").as("s2"),
        sum(col("s3")).cast("decimal(38,12)").as("s3"),
        sum(col("s4")).cast("decimal(38,12)").as("s4"),
        hll_union_agg(col("hll")).as("hll"))
      .join(hists, Seq("measure", "anchor_lo", "anchor_w"))
      .select(col("measure"), col("anchor_lo"), col("anchor_w"),
        col("n"), col("nulls"), col("vmin"), col("vmax"),
        col("s1"), col("s2"), col("s3"), col("s4"), col("hll"), col("hist"))
  }

  /** Finalized per-measure statistics recovered from a merged synopsis. */
  final case class MeasureStats(n: Long, nulls: Long, min: Double, max: Double,
                                mean: Double, varSamp: Double, skew: Double,
                                kurt: Double, distinctEst: Double,
                                hist: Seq[Long])

  /** Collect a merged synopsis into driver-side stats (one row per
    * measure — bounded). Rejects a synopsis that still contains more
    * than one anchor generation per measure.
    */
  def finalize(merged: DataFrame): Map[String, MeasureStats] = {
    val rows = merged
      .withColumn("distinct_est", hll_sketch_estimate(col("hll")).cast("double"))
      .collect()
    val byMeasure = rows.groupBy(_.getAs[String]("measure"))
    byMeasure.foreach { case (m, rs) =>
      require(rs.length == 1,
        s"measure $m has ${rs.length} anchor generations in one synopsis — " +
        "re-anchor (fresh bootstrap model) before merging across generations")
    }
    rows.map { r =>
      val n = r.getAs[Long]("n")
      val w = r.getAs[Double]("anchor_w")
      val lo = r.getAs[Double]("anchor_lo")
      def s(f: String): Double = {
        val i = r.fieldIndex(f)
        if (r.isNullAt(i)) 0.0 else r.getDecimal(i).doubleValue()
      }
      val (v, sk, ku) = StatsCollector.combineMoments(n, w, s("s1"), s("s2"), s("s3"), s("s4"))
      val mean = if (n == 0) Double.NaN else lo + w * (s("s1") / n)
      r.getAs[String]("measure") -> MeasureStats(
        n, r.getAs[Long]("nulls"), r.getAs[Double]("vmin"), r.getAs[Double]("vmax"),
        mean, v, sk, ku, r.getAs[Double]("distinct_est"),
        r.getSeq[Long](r.fieldIndex("hist")))
    }.toMap
  }
}
