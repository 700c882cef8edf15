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
      // A/B knob: Spark's prod-recommended AQE coalescing (respect the
      // advisory target size instead of maximizing parallelism)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_AQE_PFIRST", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    // GRAFT_PROBE_RUNS=k: after the warm run, time k more and report the
    // median + spread — single warm samples at sub-second scale proved
    // unable to rank rival shapes (r16: the same binary swung ±50%
    // run-to-run), which is exactly the bench's median-of-3/5 rationale
    val runs = sys.env.get("GRAFT_PROBE_RUNS").map(_.toInt).getOrElse(1)
    names.foreach { q =>
      // construction INSIDE the timer: some queries (q49's label
      // propagation) do their real work eagerly at build time
      def once(): Double = {
        val t0 = System.nanoTime(); all(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t0 = System.nanoTime(); val n = all(q)(spark, dir).count(); val t1 = System.nanoTime()
      val warm = (t1 - t0) / 1e9
      val timed = Seq.fill(runs) {
        val s = once(); spark.catalog.clearCache(); System.gc(); s
      }.sorted
      // true median for even counts too (the upper-middle sample biased
      // even-run A/B rankings — the tool exists to stabilize those)
      val med =
        if (timed.size % 2 == 1) timed(timed.size / 2)
        else (timed(timed.size / 2 - 1) + timed(timed.size / 2)) / 2
      println(f"TIMING $q%-22s $warm%6.2f s (med-of-$runs $med%6.2f s, " +
        f"min ${timed.head}%5.2f max ${timed.last}%5.2f) rows=$n")
      if (doExplain) { println(s"=== $q plan ==="); all(q)(spark, dir).explain("formatted") }
    }
    spark.stop()
  }
}
