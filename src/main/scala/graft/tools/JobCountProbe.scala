package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job/stage/task counting for any catalog query — the evidence layer
  * for driver-orchestrated optimizations whose FINAL plan is vacuous
  * (post-checkpoint CC, multi-pass quantiles, concurrent synopses): a
  * "fewer jobs per round" claim is checked here, not in explain output.
  *
  * Usage: runMain graft.tools.JobCountProbe <sfDir> <q1,q2,...>
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q49_dedup_clusters"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    val trace = sys.env.get("GRAFT_JOB_TRACE").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (trace) {
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          println(f"  job#$jobs%-4d stages=${j.stageIds.size} $site")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    names.foreach { q =>
      all(q)(spark, dir).count() // warm run: codegen + any plan caches
      spark.catalog.clearCache()
      // listener events are asynchronous — drain before zeroing and
      // again before reading, or the counts bleed across queries
      Thread.sleep(1000)
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      val n = all(q)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"JOBS $q%-24s jobs=$jobs stages=$stages tasks=$tasks%-6d $sec%6.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
