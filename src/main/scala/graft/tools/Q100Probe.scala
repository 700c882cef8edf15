package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q100 (semanticDedup) and the PQ family (q78/q85):
  * which stage owns the wall-clock — cell assignment, the within-cell
  * pair join, the CC fixpoint, or the keep-rule joins.
  */
object Q100Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    import graft.ops.{Dedup, Similarity}
    (1 to 3).foreach { rnd =>
      println(s"--- round $rnd")
      val df = graft.Tables.load(spark, dir, "embeddings")
      val centroidPred = col("vec_id") % 32 === 0
      val tau = 0.35
      // mirror semanticDedup's internals with timers between materializations
      val corpus0 = t("withNorm2+persist") {
        val c = Similarity.withNorm2(df, "embedding")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val withCent = t("assignCells+centcos+persist") {
        val w = Similarity.assignCells(corpus0, "vec_id", "embedding", centroidPred)
          .join(broadcast(corpus0.where(centroidPred)
            .select(col("vec_id").as("cell"), col("embedding").as("cvec"),
              col("norm2").as("cnorm2"))), "cell")
          .select(col("id"), col("cell"), col("vec"), col("norm2"),
            Similarity.cosine(col("vec"), col("cvec"), col("norm2"), col("cnorm2")).as("cent_cos"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        w.count(); w
      }
      val edges = t("within-cell edges") {
        val a = withCent.select(col("cell"), col("id").as("id_a"),
          col("vec").as("vec_a"), col("norm2").as("norm2_a"))
        val b = withCent.select(col("cell"), col("id").as("id_b"),
          col("vec").as("vec_b"), col("norm2").as("norm2_b"))
        val e = a.join(b.hint("shuffle_merge"), Seq("cell"))
          .where(col("id_a") < col("id_b"))
          .where(Similarity.prefilterPass(col("vec_a"), col("vec_b"),
            col("norm2_a"), col("norm2_b"), tau))
          .where(Similarity.cosine(col("vec_a"), col("vec_b"),
            col("norm2_a"), col("norm2_b")) >= tau)
          .select("id_a", "id_b")
          .persist()
        println(s"  edges=${e.count()}")
        e
      }
      val labels = t("connectedComponents") {
        val l = Dedup.connectedComponents(edges, "id_a", "id_b",
          withCent.select(col("id")), "id")
        println(s"  rounds=${Dedup.lastRounds}")
        l.select(col("id"), col("cluster_id").as("group_id"))
      }
      t("keep-rule joins + count") {
        val kept = withCent.join(labels, "id")
          .groupBy("group_id")
          .agg(min(struct(col("cent_cos"), col("id"))).as("best"))
          .select(col("group_id").as("kg"), col("best.id").as("keep_id"))
        withCent.join(labels, "id")
          .join(kept, col("group_id") === col("kg"))
          .select(col("id"), col("cell"), col("group_id"),
            round(col("cent_cos"), 6).as("cent_cos"),
            (col("id") === col("keep_id")).as("kept"))
          .count()
      }
      corpus0.unpersist(); withCent.unpersist(); edges.unpersist()
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
