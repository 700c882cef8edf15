package graft.ir

import scala.collection.mutable

/** Flat canonical query layer — the engine's counterpart of the
  * reference's `dqo/relational/models.py` + `dqo/relational/query/
  * __init__.py`: a set-based view (relations, joins, conditions,
  * projections) that many equivalent relational trees map onto, with
  * deterministic SQL emission for fingerprinting and execution.
  */

final case class TableRef(name: String, var alias: Option[String] = None) {
  /** Identity key: alias wins (models.py:14-21). */
  def key: String = alias.getOrElse(name)
  override def hashCode(): Int = key.hashCode
  override def equals(o: Any): Boolean = o match {
    case t: TableRef => t.key == key
    case _ => false
  }
}

final case class ColRef(name: String, table: TableRef, alias: Option[String] = None) {
  /** `table.column` with alias preference (models.py:31-41). */
  def fullName: String = s"${table.key}.${alias.getOrElse(name)}"
  override def toString: String = fullName
  override def hashCode(): Int = fullName.hashCode
  override def equals(o: Any): Boolean = o match {
    case c: ColRef => c.fullName == fullName
    case _ => false
  }
}

final case class Const(text: String) {
  override def toString: String = text
  def isNum: Boolean =
    text.nonEmpty && text.forall(ch => ch.isDigit || ch == '.' || ch == '-' || ch == '+') &&
      scala.util.Try(text.toDouble).isSuccess
}

/** A WHERE-clause atom: either a filter condition or an equi/theta join
  * (models.py:88-155). `ltr=false` preserves value-first orientation for
  * SQL round-trip.
  */
sealed trait Selection {
  def operator: String
  def sqlString: String
}
final case class Condition(col: ColRef, value: Const, operator: String,
                           ltr: Boolean = true) extends Selection {
  def sqlString: String =
    if (ltr) s"${col.fullName} $operator $value" else s"$value $operator ${col.fullName}"
  override def toString: String = sqlString
}
final case class JoinEdge(left: ColRef, right: ColRef, operator: String = "=") extends Selection {
  def sqlString: String = s"${left.fullName} $operator ${right.fullName}"
  override def toString: String = sqlString
}

final case class Projection(col: ColRef, func: Option[String] = None) {
  override def toString: String = func.map(f => s"$f(${col.fullName})").getOrElse(col.fullName)
}

/** Mutable set-based query builder (query/__init__.py:24-313) with
  * optional insertion-order tracking for round-trip fidelity.
  *
  * Deviation from the reference, documented: `is_dangling` in the
  * reference compares `j.right.table` truthily instead of to the table
  * (query/__init__.py:205-208, an evident bug that disables cascade
  * deletion); this implementation uses the intended comparison.
  */
final class Query(val trackOrder: Boolean = false) {
  val conditions: mutable.LinkedHashSet[Condition] = mutable.LinkedHashSet.empty
  val projections: mutable.LinkedHashSet[Projection] = mutable.LinkedHashSet.empty
  val joins: mutable.LinkedHashSet[JoinEdge] = mutable.LinkedHashSet.empty
  val relations: mutable.LinkedHashSet[TableRef] = mutable.LinkedHashSet.empty

  def selections: Seq[Selection] = conditions.toSeq ++ joins.toSeq

  def size: Int = conditions.size + projections.size + joins.size + relations.size

  def addTable(t: TableRef): TableRef = {
    relations.find(_ == t).getOrElse { relations += t; t }
  }

  def addJoin(left: ColRef, right: ColRef, operator: String = "="): JoinEdge = {
    val l = left.copy(table = addTable(left.table))
    val r = right.copy(table = addTable(right.table))
    val j = JoinEdge(l, r, operator)
    joins += j
    j
  }

  def addCondition(cond: Condition): Condition = {
    val c = cond.copy(col = cond.col.copy(table = addTable(cond.col.table)))
    conditions += c
    c
  }

  def addProjection(p: Projection): Projection = {
    val pp = p.copy(col = p.col.copy(table = addTable(p.col.table)))
    projections += pp
    pp
  }

  def areJoint(a: TableRef, b: TableRef): Boolean =
    joins.exists(j => Set(j.left.table, j.right.table) == Set(a, b))

  /** Cascade removal: drop the condition, then any relation left dangling
    * (query/__init__.py:155-164).
    */
  def removeCondition(c: Condition): Seq[TableRef] = {
    conditions -= c
    cascade(Seq(c.col.table))
  }

  def removeProjection(p: Projection): Seq[TableRef] = {
    projections -= p
    cascade(Seq(p.col.table))
  }

  def removeJoin(j: JoinEdge): Seq[TableRef] = {
    joins -= j
    cascade(Seq(j.left.table, j.right.table))
  }

  private def cascade(candidates: Seq[TableRef]): Seq[TableRef] =
    candidates.distinct.filter(isDangling).map { t => relations -= t; t }

  def isDangling(t: TableRef): Boolean =
    !projections.exists(_.col.table == t) &&
      !conditions.exists(_.col.table == t) &&
      !joins.exists(j => j.left.table == t || j.right.table == t)

  /** Structural validity (query/__init__.py:278-313): at least one
    * projection; every projected/filtered table present; join graph
    * connects every relation (no implicit cartesian); no join over a
    * missing relation.
    */
  def valid: Boolean = {
    if (size == 0 || projections.isEmpty) return false
    if (projections.exists(p => !relations.contains(p.col.table))) return false
    if (conditions.exists(c => !relations.contains(c.col.table))) return false
    if (joins.exists(j => !relations.contains(j.left.table) || !relations.contains(j.right.table)))
      return false
    if (relations.size == 1 && joins.isEmpty) return true
    // connectivity over the join graph
    val adj = mutable.Map.empty[TableRef, mutable.Set[TableRef]]
    joins.foreach { j =>
      adj.getOrElseUpdate(j.left.table, mutable.Set.empty) += j.right.table
      adj.getOrElseUpdate(j.right.table, mutable.Set.empty) += j.left.table
    }
    val seen = mutable.Set[TableRef](relations.head)
    val queue = mutable.Queue(relations.head)
    while (queue.nonEmpty) {
      val t = queue.dequeue()
      adj.getOrElse(t, mutable.Set.empty).foreach { n =>
        if (!seen.contains(n)) { seen += n; queue += n }
      }
    }
    seen.size == relations.size
  }

  /** Canonical SQL emission (query/__init__.py:231-276): sorted (or
    * insertion-ordered) parts, `t1..tn` aliases, `pretty` newline mode.
    *
    * Deviation, documented: the reference assigns aliases by MUTATING the
    * TableRefs (its own FIXME at query/__init__.py:277) which corrupts
    * hash-set membership; here aliases are resolved at render time only.
    */
  def toSql(pretty: Boolean = true, alias: Boolean = true): String = {
    def selectionKey(s: Selection): String = s match {
      case c: Condition => "_" + c.col.fullName
      case j: JoinEdge => j.left.fullName + "_" + j.right.fullName
    }
    val rels = if (trackOrder) relations.toSeq else relations.toSeq.sortBy(_.name)
    val sels = if (trackOrder) selections else selections.sortBy(selectionKey)
    val projs = if (trackOrder) projections.toSeq else projections.toSeq.sortBy(_.col.name)

    val aliasOf: Map[String, String] =
      if (alias)
        rels.zipWithIndex.map { case (t, i) => t.key -> t.alias.getOrElse(s"t${i + 1}") }.toMap
      else rels.map(t => t.key -> t.key).toMap
    def rCol(c: ColRef): String = s"${aliasOf.getOrElse(c.table.key, c.table.key)}.${c.alias.getOrElse(c.name)}"
    def rProj(p: Projection): String =
      p.func.map(f => s"$f(${rCol(p.col)})").getOrElse(rCol(p.col))
    def rSel(s: Selection): String = s match {
      case c: Condition =>
        if (c.ltr) s"${rCol(c.col)} ${c.operator} ${c.value}"
        else s"${c.value} ${c.operator} ${rCol(c.col)}"
      case j: JoinEdge => s"${rCol(j.left)} ${j.operator} ${rCol(j.right)}"
    }

    val selectClause = projs.map(rProj).mkString(", ")
    val fromClause = rels
      .map(t => if (alias || t.alias.isDefined) s"${t.name} as ${aliasOf(t.key)}" else t.name)
      .mkString(", ")
    val andStr = if (pretty) " AND \n      " else " AND "
    val sb = new StringBuilder
    sb ++= s"SELECT $selectClause "
    if (pretty) sb ++= "\n"
    sb ++= s"FROM $fromClause"
    if (sels.nonEmpty) {
      sb ++= " "
      if (pretty) sb ++= "\n"
      sb ++= s"WHERE ${sels.map(rSel).mkString(andStr)}"
    }
    sb.result()
  }

  /** Fingerprint = alias-free compact SQL (query/__init__.py:50-51). */
  def fingerprint: String = toSql(pretty = false, alias = false)

  def copyQuery(): Query = {
    val q = new Query(trackOrder)
    // deep-copy TableRefs so alias assignment doesn't leak across copies
    val tmap = relations.map(t => t.key -> TableRef(t.name, t.alias)).toMap
    def mapCol(c: ColRef): ColRef = c.copy(table = tmap(c.table.key))
    relations.foreach(t => q.relations += tmap(t.key))
    conditions.foreach(c => q.conditions += c.copy(col = mapCol(c.col)))
    joins.foreach(j => q.joins += j.copy(left = mapCol(j.left), right = mapCol(j.right)))
    projections.foreach(p => q.projections += p.copy(col = mapCol(p.col)))
    q
  }
}

/** Join graph over a query/tree: nodes = relations, edges = join column
  * pairs; BFS pathfinding recovers implied transitive joins
  * (dqo/relational/tree/__init__.py:351-445; used by plan-merge J8).
  */
final class JoinGraph {
  private val edges = mutable.Map.empty[String, mutable.Buffer[(String, (String, String))]]

  def addJoin(relA: String, colA: String, relB: String, colB: String): Unit = {
    edges.getOrElseUpdate(relA, mutable.Buffer.empty) += ((relB, (colA, colB)))
    edges.getOrElseUpdate(relB, mutable.Buffer.empty) += ((relA, (colB, colA)))
  }

  def neighbors(rel: String): Seq[String] = edges.getOrElse(rel, Nil).map(_._1).distinct.toSeq

  def getJoins(a: String, b: String): Seq[(String, String)] =
    edges.getOrElse(a, Nil).filter(_._1 == b).map(_._2).toSeq

  /** Shortest relation path a→b (naive BFS, tree/__init__.py:414-445). */
  def getPath(a: String, b: String): Option[Seq[String]] = {
    if (a == b) return Some(Seq(a))
    val prev = mutable.Map.empty[String, String]
    val queue = mutable.Queue(a)
    val seen = mutable.Set(a)
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      for (n <- neighbors(cur) if !seen.contains(n)) {
        seen += n; prev(n) = cur
        if (n == b) {
          var path = List(b)
          while (path.head != a) path = prev(path.head) :: path
          return Some(path)
        }
        queue += n
      }
    }
    None
  }
}
