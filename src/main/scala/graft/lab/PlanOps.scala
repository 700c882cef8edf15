package graft.lab

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._

/** Physical-plan extraction: maps a SparkPlan tree onto the reference's
  * ExecutionOp taxonomy (ScanOp / JoinOp / NestedLoopOp / AggregateOp —
  * dqo/db/execution_plan.py:16-57, 213-244). Where the reference regex-
  * scrapes Postgres EXPLAIN JSON, we walk typed SparkPlan nodes and read
  * their SQLMetrics directly (richer: per-operator output rows).
  *
  * Uninteresting wrappers (exchanges, codegen, projections — the analog
  * of skipped `Gather` nodes, execution_plan.py:230-235) are collapsed.
  */
final case class ExecOp(kind: String, detail: String, children: Seq[ExecOp],
                        outputRows: Option[Long],
                        metrics: Map[String, Long] = Map.empty) {
  def preorder: Seq[ExecOp] = this +: children.flatMap(_.preorder)
  def render(indent: Int = 0): String =
    (" " * indent) + s"$kind${if (detail.nonEmpty) s"($detail)" else ""}" +
      outputRows.map(r => s" rows=$r").getOrElse("") +
      (if (metrics.nonEmpty)
        metrics.toSeq.sorted.map { case (k, v) => s" $k=$v" }.mkString else "") +
      "\n" + children.map(_.render(indent + 2)).mkString
  def toJson: String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"kind":"${esc(kind)}","detail":"${esc(detail)}"""" +
      outputRows.map(r => s""","rows":$r""").getOrElse("") +
      (if (metrics.nonEmpty)
        s""","metrics":{${metrics.toSeq.sorted.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString(",")}}"""
       else "") +
      s""","children":[${children.map(_.toJson).mkString(",")}]}"""
  }
}

object PlanOps {

  /** Op tree of a DataFrame's executed plan (run an action first so AQE
    * has finalized and metrics are populated).
    */
  def fromDataFrame(df: DataFrame): ExecOp =
    fromSparkPlan(df.queryExecution.executedPlan)

  /** Execute the plan WITHOUT collecting rows to the driver (the result
    * set of an arbitrary generated query can be large), then return the
    * finalized op tree. `executedPlan.execute()` triggers full adaptive
    * execution; `foreach` drains it executor-side.
    */
  def executedOpTree(df: DataFrame): ExecOp = {
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    fromDataFrame(df)
  }

  def fromSparkPlan(plan: SparkPlan): ExecOp = {
    val ops = walk(plan)
    if (ops.size == 1) ops.head else ExecOp("Result", "", ops, None)
  }

  private def rows(p: SparkPlan): Option[Long] =
    p.metrics.get("numOutputRows").map(_.value).filter(_ > 0)

  /** Per-operator SQLMetrics worth keeping (beyond output rows): timings,
    * I/O shape, memory/spill. Richer than the reference's regex scrape of
    * EXPLAIN ANALYZE text (dqo/db/execution_plan.py:146-211) — these are
    * the accumulators the executors actually reported.
    */
  private val KeptMetrics = Set(
    "scanTime", "aggTime", "buildTime", "sortTime", "collectTime",
    "numFiles", "numPartitions", "filesSize", "spillSize", "peakMemory")

  private def kept(p: SparkPlan): Map[String, Long] =
    p.metrics.collect {
      case (k, m) if KeptMetrics.contains(k) && m.value > 0 => k -> m.value
    }.toMap

  private def op(p: SparkPlan, kind: String, detail: String, kids: Seq[ExecOp]): ExecOp =
    ExecOp(kind, detail, kids, rows(p), kept(p))

  private def walk(p: SparkPlan): Seq[ExecOp] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
    case w: WholeStageCodegenExec => walk(w.child)
    case i: InputAdapter => walk(i.child)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
    case e: ShuffleExchangeExec => walk(e.child)
    case e: BroadcastExchangeExec => walk(e.child)
    case s: FileSourceScanExec =>
      val table = s.relation.location.rootPaths.headOption
        .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
      val pushed = s.dataFilters.map(_.sql).mkString(" AND ")
      Seq(op(s, "Scan", if (pushed.nonEmpty) s"$table: $pushed" else table, Nil))
    case j: BroadcastHashJoinExec =>
      Seq(op(j, "Join", s"BroadcastHash ${j.joinType}", j.children.flatMap(walk)))
    case j: ShuffledHashJoinExec =>
      Seq(op(j, "Join", s"ShuffledHash ${j.joinType}", j.children.flatMap(walk)))
    case j: SortMergeJoinExec =>
      Seq(op(j, "Join", s"SortMerge ${j.joinType}", j.children.flatMap(walk)))
    case j: BroadcastNestedLoopJoinExec =>
      Seq(op(j, "NestedLoop", s"${j.joinType}", j.children.flatMap(walk)))
    case j: CartesianProductExec =>
      Seq(op(j, "NestedLoop", "Cartesian", j.children.flatMap(walk)))
    case a: HashAggregateExec =>
      Seq(op(a, "Aggregate", s"Hash ${a.aggregateExpressions.size}", a.children.flatMap(walk)))
    case a: SortAggregateExec =>
      Seq(op(a, "Aggregate", s"Sort ${a.aggregateExpressions.size}", a.children.flatMap(walk)))
    case a: ObjectHashAggregateExec =>
      Seq(op(a, "Aggregate", s"ObjectHash ${a.aggregateExpressions.size}", a.children.flatMap(walk)))
    case f: FilterExec =>
      Seq(op(f, "Filter", f.condition.sql.take(120), f.children.flatMap(walk)))
    case s: SortExec => s.children.flatMap(walk) // ordering detail not in taxonomy
    case p: ProjectExec => p.children.flatMap(walk)
    case other => other.children.flatMap(walk) match {
      case Seq() => Seq(op(other, other.nodeName, "", Nil))
      case kids => kids
    }
  }
}
