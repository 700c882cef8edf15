package graft.ir

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAggregate, Filter => LFilter, GlobalLimit, Join => LJoin, LocalLimit, LogicalPlan, Project => LProject, Sort => LSort, SubqueryAlias}

import graft.model.DbModel

/** SQL → [[RelPlan]] frontend. Instead of hand-writing a lexer/parser
  * (the reference's ply grammar, dqo/relational/sql/ast.py:91-476), the
  * engine rides Spark's own SQL parser (`CatalystSqlParser.parsePlan`) —
  * it natively handles the reference's comma-join dialect (implicit inner
  * join + WHERE) — and maps the unresolved LogicalPlan onto the engine IR
  * (SURVEY §7 step 4). Bare columns are resolved against the schema model
  * like the reference's bindings pass (dqo/relational/sql/bindings.py:10-26).
  *
  * Same scope as the reference's consumed grammar: SELECT (with
  * aggregates) / FROM (tables, aliased subqueries) / WHERE (comparisons,
  * LIKE, BETWEEN — desugared by the parser to two range predicates like
  * ast.py:354-358 — IN-lists, IS [NOT] NULL, OR). ORDER BY / LIMIT /
  * GROUP BY parse but are dropped from the tree (tree/parser.py:21-51);
  * execution of those clauses is delegated to Spark SQL directly.
  */
object Frontend {

  final case class ParseError(msg: String) extends Exception(msg)

  def parseSql(sql: String, db: Option[DbModel] = None): RelPlan =
    fromLogical(CatalystSqlParser.parsePlan(sql), db)

  def fromLogical(plan: LogicalPlan, db: Option[DbModel]): RelPlan = {
    // unwrap clauses the reference's tree drops
    val core = plan match {
      case GlobalLimit(_, child) => stripSort(child)
      case other => stripSort(other)
    }
    core match {
      case LProject(list, child) => buildQueryBlock(list, child, db)
      case LAggregate(_, aggList, child, _) => buildQueryBlock(aggList, child, db)
      case other => throw ParseError(s"unsupported top-level node: ${other.nodeName}")
    }
  }

  private def stripSort(p: LogicalPlan): LogicalPlan = p match {
    case LSort(_, _, child, _) => stripSort(child)
    case GlobalLimit(_, child) => stripSort(child)
    case LocalLimit(_, child) => stripSort(child)
    case other => other
  }

  /** One SELECT/FROM/WHERE block → Project over join/filter tree
    * (tree/parser.py:17-51 equivalent).
    */
  private def buildQueryBlock(projList: Seq[NamedExpression], child: LogicalPlan,
                              db: Option[DbModel]): RelPlan = {
    val (whereOpt, fromPlan) = child match {
      case f: LFilter => (Some(f.condition), f.child)
      case other => (None, other)
    }
    // FROM entries (branches) — flatten comma joins / explicit joins
    var branches = Vector.empty[RelPlan]
    var extraConds = Vector.empty[Expression]
    def collectFrom(p: LogicalPlan): Unit = p match {
      case j: LJoin =>
        collectFrom(j.left); collectFrom(j.right)
        j.condition.foreach(c => extraConds :+= c)
      case SubqueryAlias(id, rel: UnresolvedRelation) =>
        branches :+= RelationLeaf(rel.multipartIdentifier.last, id.name)
      case SubqueryAlias(id, inner) =>
        branches :+= Subquery(id.name, fromLogical(inner, db))
      case rel: UnresolvedRelation =>
        branches :+= RelationLeaf(rel.multipartIdentifier.last, rel.multipartIdentifier.last)
      case other => throw ParseError(s"unsupported FROM node: ${other.nodeName}")
    }
    collectFrom(fromPlan)

    val scope = new Scope(branches, db)

    // WHERE conjuncts
    val conjuncts = (whereOpt.toSeq ++ extraConds).flatMap(splitAnd)
    val preds = conjuncts.map(toPred(_, scope))

    // single-relation filters stack directly above their relation
    // (tree/parser.py:196-211); joins graft branches at intersections
    // (node.py:316-356); the rest lands on top
    val (joinsP, rest) = preds.partition {
      case Cmp(_, l, r: ColOp) => l.rel != r.rel
      case _ => false
    }
    val (singleRel, multiRel) = rest.partition(_.relations.size == 1)

    var work: Vector[RelPlan] = branches
    def branchIdxOf(rel: String): Int = {
      val i = work.indexWhere(_.relationKeys.contains(rel))
      if (i < 0) throw ParseError(s"unknown relation '$rel'")
      i
    }
    singleRel.foreach { pr =>
      val i = branchIdxOf(pr.relations.head)
      work = work.updated(i, TreeOps.placeAboveRelation(work(i), pr))
    }
    joinsP.foreach { case j @ Cmp(op, l, r: ColOp) =>
      val li = branchIdxOf(l.rel); val ri = branchIdxOf(r.rel)
      if (li == ri) work = work.updated(li, Filter(j, work(li)))
      else {
        val joined = JoinNode(op, l, r, work(li), work(ri))
        work = work.zipWithIndex.filter { case (_, i) => i != li && i != ri }.map(_._1) :+ joined
      }
    case _ => ()
    }
    multiRel.foreach { pr =>
      val touching = work.indices.filter(i => pr.relations.exists(work(i).relationKeys.contains))
      if (touching.size == 1) work = work.updated(touching.head, Filter(pr, work(touching.head)))
      else if (work.size == 1) work = Vector(Filter(pr, work.head))
      else {
        // OR spanning disconnected branches: park on a cross set
        work = Vector(Filter(pr, if (work.size == 1) work.head else CrossSet(work)))
      }
    }
    val base = if (work.size == 1) work.head else CrossSet(work)

    // projections
    val (cols, wildcard) = projList.foldLeft((Vector.empty[ProjCol], false)) {
      case ((acc, w), e) => projColOf(e, scope) match {
        case Some(pc) => (acc :+ pc, w)
        case None => (acc, true)
      }
    }
    Project(cols, wildcard, base)
  }

  /** Name scope: relation keys → known columns (for bare-name binding). */
  private final class Scope(branches: Seq[RelPlan], db: Option[DbModel]) {
    private val entries: Seq[(String, Option[Set[String]])] = branches.map {
      case RelationLeaf(t, key) =>
        key -> db.flatMap(_.tablesByName.get(t)).map(_.columns.map(_.name).toSet)
      case Subquery(alias, Project(cols, wildcard, _)) =>
        alias -> (if (wildcard) None
                  else Some(cols.map(pc => pc.alias.getOrElse(pc.col.name)).toSet))
      case other => other.relationKeys.head -> None
    }
    private val keys = entries.map(_._1).toSet

    def resolve(parts: Seq[String]): ColOp = parts match {
      case Seq(rel, col) if keys.contains(rel) => ColOp(rel, col)
      case Seq(col) =>
        entries.find(_._2.exists(_.contains(col))).map(e => ColOp(e._1, col))
          .getOrElse {
            if (entries.size == 1) ColOp(entries.head._1, col)
            else throw ParseError(s"cannot bind column '$col' (ambiguous scope)")
          }
      case other => throw ParseError(s"unsupported column reference ${other.mkString(".")}")
    }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    // BETWEEN survives parsing as an unresolved function in Spark 4;
    // desugar to two range predicates like the reference (ast.py:354-358)
    case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("between") =>
      Seq(GreaterThanOrEqual(f.arguments(0), f.arguments(1)),
          LessThanOrEqual(f.arguments(0), f.arguments(2)))
    case other => Seq(other)
  }

  private def litText(l: Literal): Const = l.dataType match {
    case org.apache.spark.sql.types.StringType => Const(s"'${l.value}'")
    case _ => Const(String.valueOf(l.value))
  }

  private def toPred(e: Expression, scope: Scope): Pred = e match {
    case Or(l, r) => OrPred(toPred(l, scope), toPred(r, scope))
    case EqualTo(l, r) => cmp("=", l, r, scope)
    case Not(EqualTo(l, r)) => cmp("!=", l, r, scope)
    case LessThan(l, r) => cmp("<", l, r, scope)
    case LessThanOrEqual(l, r) => cmp("<=", l, r, scope)
    case GreaterThan(l, r) => cmp(">", l, r, scope)
    case GreaterThanOrEqual(l, r) => cmp(">=", l, r, scope)
    case l: Like => cmp("LIKE", l.left, l.right, scope)
    case Not(l: Like) => cmp("NOT LIKE", l.left, l.right, scope)
    case In(a: UnresolvedAttribute, vals) =>
      Cmp("IN", scope.resolve(a.nameParts),
        MultiConst(vals.collect { case l: Literal => litText(l) }))
    case Not(In(a: UnresolvedAttribute, vals)) =>
      Cmp("NOT IN", scope.resolve(a.nameParts),
        MultiConst(vals.collect { case l: Literal => litText(l) }))
    case IsNull(a: UnresolvedAttribute) =>
      Cmp("IS", scope.resolve(a.nameParts), ConstOp(Const("NULL")))
    case IsNotNull(a: UnresolvedAttribute) =>
      Cmp("IS NOT", scope.resolve(a.nameParts), ConstOp(Const("NULL")))
    case other => throw ParseError(s"unsupported predicate: ${other.sql}")
  }

  /** Build a comparison with column-first canonical orientation, flipping
    * the operator when the SQL had the constant first (node.py:193-203,
    * 254-257).
    */
  private def cmp(op: String, l: Expression, r: Expression, scope: Scope): Cmp =
    (l, r) match {
      case (a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        Cmp(op, scope.resolve(a.nameParts), scope.resolve(b.nameParts))
      case (a: UnresolvedAttribute, lit: Literal) =>
        Cmp(op, scope.resolve(a.nameParts), ConstOp(litText(lit)))
      case (lit: Literal, a: UnresolvedAttribute) =>
        Cmp(TreeOps.FlipOp.getOrElse(op, op), scope.resolve(a.nameParts), ConstOp(litText(lit)))
      case (a: UnresolvedAttribute, Cast(lit: Literal, _, _, _)) =>
        Cmp(op, scope.resolve(a.nameParts), ConstOp(litText(lit)))
      case _ => throw ParseError(s"unsupported comparison operands: $l $op $r")
    }

  private val AggFuncs = Set("min", "max", "avg", "sum", "count")

  private def projColOf(e: Expression, scope: Scope): Option[ProjCol] = e match {
    case _: UnresolvedStar => None
    case UnresolvedAlias(child, _) => projColOf(child, scope)
    case Alias(child, name) => projColOf(child, scope).map(_.copy(alias = Some(name)))
    case a: UnresolvedAttribute => Some(ProjCol(scope.resolve(a.nameParts)))
    case f: UnresolvedFunction if AggFuncs.contains(f.nameParts.last.toLowerCase) =>
      val fn = f.nameParts.last.toUpperCase
      f.arguments match {
        case Seq(a: UnresolvedAttribute) => Some(ProjCol(scope.resolve(a.nameParts), Some(fn)))
        case Seq(_: Literal) => Some(ProjCol(ColOp("", "*"), Some(fn))) // COUNT(*)/COUNT(1)
        case _ => throw ParseError(s"unsupported aggregate args: ${f.sql}")
      }
    case other => throw ParseError(s"unsupported projection: ${other.sql}")
  }
}
