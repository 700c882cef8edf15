package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure parse/encode throughput across consecutive passes over the
  * same generated workload — distinguishes JIT-warmup cost (pass 1 slow,
  * later passes fast and stable) from a real per-query slowdown (all
  * passes slow). Usage: runMain graft.tools.QpsProbe [sfDir] [passes]
  */
object QpsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = graft.model.StatsCollector.collect(spark, dir,
      Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem"))
    val workload = (1 to 200).map(s => new graft.gen.RandomQueryGen(db, s).randomize())
      .filter(_.valid).map(_.toSql(pretty = false))
    println(s"workload: ${workload.size} queries, avg sql len " +
      s"${workload.map(_.length).sum / workload.size}")
    (1 to passes).foreach { p =>
      val tp0 = System.nanoTime()
      workload.foreach(sql => graft.ir.Frontend.parseSql(sql, Some(db)))
      val parse = workload.size / ((System.nanoTime() - tp0) / 1e9)
      val te0 = System.nanoTime()
      val n = workload.count(sql =>
        scala.util.Try(graft.encode.Encoder.encodeQuery(db, sql)).isSuccess)
      val enc = n / ((System.nanoTime() - te0) / 1e9)
      println(f"pass $p: parse_qps $parse%.0f encode_qps $enc%.0f")
    }
    spark.stop()
  }
}
