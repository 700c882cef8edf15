package graft.encode

import graft.ir._
import graft.lab.ExecOp

/** E10 "hybrid tree": rebuild the relational tree so its join structure
  * follows the MEASURED physical plan rather than the parse order
  * (merge_rel_tree_with_exec_plan, dqo/estimator/gerelt/v20/
  * encoder.py:579-742). Scans map to relation leaves; physical joins
  * combine the trees their children produced, recovering the join
  * condition from the original query's join edges — or, when the
  * engine joined along a different transitive-equality path, via BFS on
  * the join graph (implied-join recovery J8, encoder.py:654-686).
  * Original single-relation selections and the projection root are then
  * re-attached.
  */
object PlanMerge {

  def mergeWithExecPlan(original: RelPlan, plan: ExecOp): RelPlan = {
    // original parts
    val Project(projCols, wildcard, _) = original match {
      case p: Project => p
      case other => Project(Nil, wildcard = true, other)
    }
    val filters = collectFilters(original)
    val joins = collectJoins(original)
    val graph = new JoinGraph
    joins.foreach(j => graph.addJoin(j._1.rel, j._1.name, j._2.rel, j._2.name))
    val keyOf = collectKeys(original) // table -> key (alias)

    def joinCondBetween(leftKeys: Set[String], rightKeys: Set[String]): Option[(ColOp, ColOp)] = {
      joins.find(j =>
        (leftKeys.contains(j._1.rel) && rightKeys.contains(j._2.rel)) ||
        (leftKeys.contains(j._2.rel) && rightKeys.contains(j._1.rel)))
        .map { j => if (leftKeys.contains(j._1.rel)) (j._1, j._2) else (j._2, j._1) }
        .orElse {
          // implied-join recovery: BFS path whose endpoints live in each side
          val pairs = for (a <- leftKeys.toSeq; b <- rightKeys.toSeq) yield (a, b)
          pairs.view.flatMap { case (a, b) =>
            graph.getPath(a, b).filter(_.size >= 2).flatMap { path =>
              graph.getJoins(path.head, path(1)).headOption
                .map(cols => (ColOp(path.head, cols._1), ColOp(path(1), cols._2)))
            }
          }.headOption
        }
    }

    def build(op: ExecOp): Option[RelPlan] = op.kind match {
      case "Scan" =>
        val table = op.detail.split(":").head.trim
        Some(RelationLeaf(table, keyOf.getOrElse(table, table)))
      case "Join" | "NestedLoop" =>
        op.children.flatMap(build) match {
          case Seq(l, r) =>
            joinCondBetween(l.relationKeys, r.relationKeys) match {
              case Some((lc, rc)) => Some(JoinNode("=", lc, rc, l, r))
              case None => Some(CrossSet(Seq(l, r)))
            }
          case Seq(single) => Some(single)
          case _ => None
        }
      case _ =>
        op.children.flatMap(build) match {
          case Seq(one) => Some(one)
          case Seq() => None
          case many => Some(CrossSet(many))
        }
    }

    val base = build(plan).getOrElse(stripProject(original))
    val withFilters = filters.foldLeft(base)((acc, f) => TreeOps.placeAboveRelation(acc, f))
    Project(projCols, wildcard, withFilters)
  }

  private def stripProject(p: RelPlan): RelPlan = p match {
    case Project(_, _, c) => c
    case other => other
  }

  private def collectFilters(p: RelPlan): Seq[Cmp] = p match {
    case Filter(c: Cmp, child) if !c.operand.isInstanceOf[ColOp] =>
      c +: collectFilters(child)
    case other => other.children.flatMap(collectFilters)
  }

  private def collectJoins(p: RelPlan): Seq[(ColOp, ColOp)] = p match {
    case JoinNode(_, l, r, lc, rc) => (l, r) +: (collectJoins(lc) ++ collectJoins(rc))
    case Filter(Cmp(_, l, r: ColOp), child) => (l, r) +: collectJoins(child)
    case other => other.children.flatMap(collectJoins)
  }

  private def collectKeys(p: RelPlan): Map[String, String] = p match {
    case RelationLeaf(t, key) => Map(t -> key)
    case other => other.children.flatMap(collectKeys).toMap
  }
}
