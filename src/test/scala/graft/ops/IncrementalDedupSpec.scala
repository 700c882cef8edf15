package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.lab.ScaleRehearsal

/** Incremental ingestion dedup: a new batch probes the persisted LSH
  * index. Two contracts: (a) candidates match what a full recompute
  * would find for the batch, (b) the INDEX side of the probe join has no
  * shuffle — the corpus never moves, only the batch does.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val warehouse = java.nio.file.Files.createTempDirectory("incwh").toString
  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse)
      // force the shuffle-join path so the index-side no-shuffle claim is
      // actually exercised (broadcast would hide it — and at corpus scale
      // the index side could never broadcast anyway)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("new batch finds its corpus duplicates through the bucketed index, shuffle-free on the index side") {
    import spark.implicits._
    val corpus = ScaleRehearsal.syntheticDocs(spark, 300)
    Dedup.buildLshIndex(corpus, "doc_id", "text", k = 8, shingleN = 3, bands = 4,
      table = "lsh_idx", path = s"$warehouse/lsh_idx", numBuckets = 8)

    // new batch: three exact copies of corpus docs under new ids + one novel doc
    val copied = corpus.where($"doc_id".isin(0L, 50L, 100L))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val newDocs = (copied.zipWithIndex.map { case ((src, text), i) =>
      (1000L + src, text)
    } :+ (2000L, "entirely novel vocabulary that matches nothing in the corpus at all"))
      .toSeq.toDF("doc_id", "text")

    val cands = Dedup.incrementalLshCandidates(newDocs, "doc_id", "text",
      k = 8, shingleN = 3, bands = 4, indexTable = "lsh_idx")
    val got = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // every exact copy must hit its source doc; the novel doc must not appear
    for (src <- Seq(0L, 50L, 100L))
      assert(got.contains((1000L + src, src)), s"copy of $src not found in $got")
    assert(!got.exists(p => p._1 == 2000L || p._2 == 2000L), s"novel doc matched: $got")

    // plan proof: the join child holding the index scan contains no shuffle
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => q +: nodes(q.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    val all = nodes(cands.queryExecution.executedPlan)
    val join = all.collectFirst {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }.getOrElse(fail(s"no shuffle join in plan:\n${cands.queryExecution.executedPlan}"))
    val sides = join.children.map(nodes)
    val idxSide = sides.find(_.exists {
      case s: FileSourceScanExec => s.toString.contains("lsh_idx")
      case _ => false
    }).getOrElse(fail("no join side scans the index table"))
    assert(!idxSide.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"index side shuffled:\n${join.children.mkString("\n---\n")}")
  }
}
