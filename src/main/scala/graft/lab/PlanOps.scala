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
                        outputRows: Option[Long]) {
  def preorder: Seq[ExecOp] = this +: children.flatMap(_.preorder)
  def render(indent: Int = 0): String =
    (" " * indent) + s"$kind${if (detail.nonEmpty) s"($detail)" else ""}" +
      outputRows.map(r => s" rows=$r").getOrElse("") + "\n" +
      children.map(_.render(indent + 2)).mkString
  def toJson: String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"kind":"${esc(kind)}","detail":"${esc(detail)}"""" +
      outputRows.map(r => s""","rows":$r""").getOrElse("") +
      s""","children":[${children.map(_.toJson).mkString(",")}]}"""
  }
}

object PlanOps {

  /** Op tree of a DataFrame's executed plan (run an action first so AQE
    * has finalized and metrics are populated).
    */
  def fromDataFrame(df: DataFrame): ExecOp =
    fromSparkPlan(df.queryExecution.executedPlan)

  def fromSparkPlan(plan: SparkPlan): ExecOp = {
    val ops = walk(plan)
    if (ops.size == 1) ops.head else ExecOp("Result", "", ops, None)
  }

  private def rows(p: SparkPlan): Option[Long] =
    p.metrics.get("numOutputRows").map(_.value).filter(_ > 0)

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
      Seq(ExecOp("Scan", if (pushed.nonEmpty) s"$table: $pushed" else table, Nil, rows(s)))
    case j: BroadcastHashJoinExec =>
      Seq(ExecOp("Join", s"BroadcastHash ${j.joinType}", j.children.flatMap(walk), rows(j)))
    case j: ShuffledHashJoinExec =>
      Seq(ExecOp("Join", s"ShuffledHash ${j.joinType}", j.children.flatMap(walk), rows(j)))
    case j: SortMergeJoinExec =>
      Seq(ExecOp("Join", s"SortMerge ${j.joinType}", j.children.flatMap(walk), rows(j)))
    case j: BroadcastNestedLoopJoinExec =>
      Seq(ExecOp("NestedLoop", s"${j.joinType}", j.children.flatMap(walk), rows(j)))
    case j: CartesianProductExec =>
      Seq(ExecOp("NestedLoop", "Cartesian", j.children.flatMap(walk), rows(j)))
    case a: HashAggregateExec =>
      Seq(ExecOp("Aggregate", s"Hash ${a.aggregateExpressions.size}", a.children.flatMap(walk), rows(a)))
    case a: SortAggregateExec =>
      Seq(ExecOp("Aggregate", s"Sort ${a.aggregateExpressions.size}", a.children.flatMap(walk), rows(a)))
    case a: ObjectHashAggregateExec =>
      Seq(ExecOp("Aggregate", s"ObjectHash ${a.aggregateExpressions.size}", a.children.flatMap(walk), rows(a)))
    case f: FilterExec =>
      Seq(ExecOp("Filter", f.condition.sql.take(120), f.children.flatMap(walk), rows(f)))
    case s: SortExec => s.children.flatMap(walk) // ordering detail not in taxonomy
    case p: ProjectExec => p.children.flatMap(walk)
    case other => other.children.flatMap(walk) match {
      case Seq() => Seq(ExecOp(other.nodeName, "", Nil, rows(other)))
      case kids => kids
    }
  }
}
