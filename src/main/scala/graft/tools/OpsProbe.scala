package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness: time any catalog queries (run-twice-keep-2nd) and
  * optionally dump their formatted physical plans.
  *
  * Usage: runMain graft.tools.OpsProbe <sfDir> <q1,q2,...> [explain]
  */
object OpsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(graft.Bench.headline)
    val doExplain = args.lift(2).contains("explain")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    names.foreach { q =>
      // construction INSIDE the timer: some queries (q49's label
      // propagation) do their real work eagerly at build time
      val t0 = System.nanoTime(); val n = all(q)(spark, dir).count(); val t1 = System.nanoTime()
      val t2 = System.nanoTime(); all(q)(spark, dir).count(); val t3 = System.nanoTime()
      println(f"TIMING $q%-22s ${(t1 - t0) / 1e9}%6.2f s (2nd ${(t3 - t2) / 1e9}%6.2f s) rows=$n")
      if (doExplain) { println(s"=== $q plan ==="); all(q)(spark, dir).explain("formatted") }
    }
    spark.stop()
  }
}
