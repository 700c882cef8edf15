package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the connected-components family (q49/q70/q90/q100):
  * edges build vs label propagation vs the final join-back, plus the
  * round count the fixpoint actually took.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_OHA_FALLBACK", "128"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job attribution per phase: under AQE every shuffle stage
    // materializes as its own job, so "jobs" is the fixed-overhead unit
    // the CC loop pays per round — count it alongside wall time
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
      })
    def t[A](tag: String)(f: => A): A = {
      Thread.sleep(300); val j0 = jobs
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PHASE $tag%-28s $sec%6.2f s  jobs=${jobs - j0}"); r
    }
    import graft.ops.Dedup
    val (shingleN, maxDf, thresh) = (3, 50L, 0.8)
    // sub-phase decomposition of the edges pipeline (shinglePairCounts)
    (1 to 2).foreach { round =>
      println(s"--- edges sub-phases round $round")
      val docs = graft.Tables.load(spark, dir, "documents")
      val par = spark.sparkContext.defaultParallelism
      val base = docs
        .repartition(par, col("doc_id"))
        .select(col("doc_id").as("id"), Dedup.tokens(col("text")).as("toks"))
        .select(col("id"), array_distinct(Dedup.shinglesOf(col("toks"), shingleN)).as("shs"))
      t("base (tokenize+shingle)") { base.write.format("noop").mode("overwrite").save() }
      val docSh = base
        .select(col("id"), explode(transform(col("shs"), x =>
          struct(x.as("sh"), size(col("shs")).cast("long").as("n_sh")))).as("e"))
        .select(col("id"), col("e.n_sh").as("n_sh"), col("e.sh").as("sh"))
      t("docSh explode") { docSh.write.format("noop").mode("overwrite").save() }
      val buckets = docSh.groupBy("sh")
        .agg(sort_array(collect_list(struct(col("id"), col("n_sh")))).as("ids"))
        .where(size(col("ids")) <= maxDf)
      t("buckets agg") { buckets.write.format("noop").mode("overwrite").save() }
      val pairs = buckets.select(explode(flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))), b =>
            struct(a.getField("id").as("id_a"), a.getField("n_sh").as("n_a"),
                   b.getField("id").as("id_b"), b.getField("n_sh").as("n_b")))))).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.n_a").as("n_a"),
                col("p.id_b").as("id_b"), col("p.n_b").as("n_b"))
      val counts = pairs.groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("n_inter"))
      t("pairs+counts") { counts.write.format("noop").mode("overwrite").save() }
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val docs = graft.Tables.load(spark, dir, "documents")
      val edges = t("edges build+persist") {
        val e = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN, maxDf, thresh)
          .persist()
        println(s"  edges=${e.count()}")
        e
      }
      val labels = t("connectedComponents") {
        val l = Dedup.connectedComponents(edges, "id_a", "id_b", docs, "doc_id")
        println(s"  rounds=${Dedup.lastRounds}")
        l
      }
      t("labels count") { labels.count() }
      t("orderBy+count") { labels.orderBy("doc_id").count() }
      edges.unpersist()
    }
    spark.stop()
  }
}
