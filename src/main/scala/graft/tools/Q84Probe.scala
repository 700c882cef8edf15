package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q84's pipeline at a given sf dir. */
object Q84Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", sys.env.getOrElse("MAXF", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.model.{IncrementalStats, StatsCollector}
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val li = graft.Tables.load(spark, dir, "lineitem")
    val keys = Seq("l_discount", "l_extendedprice", "l_quantity")
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val model = t("collect(full table)") {
        StatsCollector.collect(spark, dir, Seq("lineitem"))
          .tables.find(_.name == "lineitem").get
      }
      val proj = t("collectTable(3 cols)") {
        StatsCollector.collectTable(li.select(keys.map(col): _*), "lineitem", 0L)
      }
      val anchors = IncrementalStats.anchorsFor(model)
        .view.filterKeys(keys.contains).toMap
      // sub-part timings: numeric-only vs sketch-only aggregation
      t("numeric agg only") {
        li.agg(sum((col("l_discount") * 2).cast("decimal(38,12)")),
          sum((col("l_extendedprice") * 2).cast("decimal(38,12)")),
          sum((col("l_quantity") * 2).cast("decimal(38,12)"))).head()
      }
      t("sketch agg only") {
        li.agg(hll_sketch_agg(col("l_discount").cast("string"), 12),
          hll_sketch_agg(col("l_extendedprice").cast("string"), 12),
          hll_sketch_agg(col("l_quantity").cast("string"), 12)).head()
      }
      t("plain sum only") {
        li.agg(sum(col("l_discount")), sum(col("l_extendedprice")),
          sum(col("l_quantity"))).head()
      }
      if (round == 2) {
        // reproduce synopsize's numeric aggregation and dump its plan
        val keys2 = keys
        var proj2 = Seq.empty[org.apache.spark.sql.Column]
        keys2.foreach { k =>
          val (lo, w) = anchors(k)
          val m = col(k).cast("double")
          val u = (m - lit(lo)) / lit(w); val u2 = u * u
          val bw = (w + 1.0) / 10
          def q(c: org.apache.spark.sql.Column) = org.apache.spark.sql.functions.round(c * lit(1e12)).cast("long")
          proj2 ++= Seq(m.as(s"${k}__m"),
            when(col(k).isNull, 1L).otherwise(0L).as(s"${k}__isnull"),
            q(u).as(s"${k}__u1"), q(u2).as(s"${k}__u2"),
            q(u2 * u).as(s"${k}__u3"), q(u2 * u2).as(s"${k}__u4"),
            least(greatest(floor((m - lit(lo)) / lit(bw)).cast("int") + 1,
              lit(1)), lit(10)).as(s"${k}__b"))
        }
        val p2 = li.select(proj2: _*)
        var aggs2 = Seq.empty[org.apache.spark.sql.Column]
        keys2.foreach { k =>
          aggs2 ++= Seq(count(col(s"${k}__m")), sum(col(s"${k}__isnull")),
            min(col(s"${k}__m")), max(col(s"${k}__m")),
            sum(col(s"${k}__u1").cast("decimal(20,0)")),
            sum(col(s"${k}__u2").cast("decimal(20,0)")),
            sum(col(s"${k}__u3").cast("decimal(20,0)")),
            sum(col(s"${k}__u4").cast("decimal(20,0)")))
          (1 to 10).foreach { b =>
            aggs2 :+= sum(when(col(s"${k}__b") === b, 1L).otherwise(0L))
          }
        }
        val agg2 = p2.agg(aggs2.head, aggs2.tail: _*)
        t("numeric full agg (repro)")(agg2.head())
        println("codegen nodes full: " + agg2.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }.size)
        val noHist = (0 until 3).flatMap(i => aggs2.slice(i * 18, i * 18 + 8))
        val agg3 = p2.agg(noHist.head, noHist.tail: _*)
        t("agg no-hist (24 fns)")(agg3.head())
        println("codegen nodes nohist: " + agg3.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }.size)
        val sumsOnly = aggs2.take(8)
        val agg4 = p2.agg(sumsOnly.head, sumsOnly.tail: _*)
        t("agg one-measure (8 fns)")(agg4.head())
        println("codegen nodes 8fn: " + agg4.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }.size)
      }
      val whole = t("synopsize whole")(IncrementalStats.synopsize(li, anchors))
      val grouped = t("synopsizeGrouped (1 pass)")(
        IncrementalStats.synopsizeGrouped(li, pmod(col("l_orderkey"), lit(3)), anchors))
      t("merge grouped")(IncrementalStats.finalize(
        IncrementalStats.merge(grouped.drop("shard"))))
      val parts = t("synopsize 3 shards")((0 until 3).map(i =>
        IncrementalStats.synopsize(li.where(pmod(col("l_orderkey"), lit(3)) === i), anchors)))
      val merged = t("merge+finalize") {
        IncrementalStats.finalize(IncrementalStats.merge(parts.reduce(_ unionAll _)))
      }
      val _ = t("countDistinct x3") {
        li.agg(countDistinct(col(keys(0))), countDistinct(col(keys(1))),
          countDistinct(col(keys(2)))).head()
      }
      val __ = t("whole.collect")(whole.collect())
      (merged, proj)
    }
    spark.stop()
  }
}
