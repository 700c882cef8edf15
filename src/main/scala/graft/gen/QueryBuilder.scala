package graft.gen

import scala.util.Random

import graft.ir._
import graft.model._

/** Mutation-based query building (dqo/query_generator/query_builder.py:
  * 89-349): six mutation operators over a [[Query]] with validity guards,
  * one-step undo, and "jenga" cascade removal of the least-connected
  * relation. Used by the guided/balanced/RL generators.
  */
final class QueryBuilder(db: DbModel, seed: Long = Random.nextLong()) {
  private val rng = new Rng(seed)
  var q: Query = new Query()
  private var snapshot: Option[Query] = None

  private def tableModel(t: TableRef): TableModel = db.table(t.name)

  private def save(): Unit = snapshot = Some(q.copyQuery())

  /** One-step undo (query_builder.py state save). */
  def undo(): Boolean = snapshot match {
    case Some(s) => q = s; snapshot = None; true
    case None => false
  }

  /** Reconcile available parts after an externally assigned query
    * (query_builder.py:154-161).
    */
  def sync(): Unit = ()

  // ---- capability guards ------------------------------------------------

  def canRemoveProjection: Boolean = q.projections.size > 1
  def canAddProjection: Boolean =
    q.relations.exists(t => tableModel(t).columns.size >
      q.projections.count(_.col.table == t))
  def canRemoveCondition: Boolean = q.conditions.nonEmpty
  def canRemoveRelation: Boolean = q.relations.size > 1
  def canAddRelation: Boolean = db.tables.size > 0
  def canReplaceJoin: Boolean = q.joins.nonEmpty

  // ---- mutations --------------------------------------------------------

  def addProjection(): Unit = {
    save()
    val candidates = for {
      t <- q.relations.toSeq
      c <- tableModel(t).columns
      p = Projection(ColRef(c.name, t), Some("MIN"))
      if !q.projections.contains(p)
    } yield p
    if (candidates.nonEmpty) q.addProjection(rng.choice(candidates))
  }

  def removeProjection(): Unit = if (canRemoveProjection) {
    save()
    q.removeProjection(rng.choice(q.projections.toSeq))
  }

  def addCondition(): Unit = {
    save()
    val cols = for { t <- q.relations.toSeq; c <- tableModel(t).columns } yield (t, c)
    if (cols.nonEmpty) {
      val (t, c) = rng.choice(cols)
      RandomConditions.randCondition(rng, tableModel(t), c).foreach { cond =>
        q.addCondition(cond.copy(col = cond.col.copy(table = t)))
      }
    }
  }

  def removeCondition(): Unit = if (canRemoveCondition) {
    save()
    q.removeCondition(rng.choice(q.conditions.toSeq))
  }

  /** Join a fresh (or reused) table into the query via a type-compatible
    * column pair with an existing relation.
    */
  def addRelation(): Unit = {
    save()
    val existing = q.relations.toSeq
    val candidates = db.tables.filterNot(t => q.relations.contains(TableRef(t.name)))
    val pool = if (candidates.nonEmpty) candidates else db.tables
    val newcomer = rng.choice(pool)
    val anchors = rng.random.shuffle(existing)
    val gen = new RandomQueryGen(db, rng.random.nextLong())
    anchors.view
      .flatMap(a => gen.chooseJoinColumns(tableModel(a), newcomer)
        .map(p => (a, p._1, p._2)))
      .headOption match {
      case Some((anchor, ac, nc)) =>
        q.addJoin(ColRef(ac.name, anchor), ColRef(nc.name, TableRef(newcomer.name)))
      case None if existing.isEmpty =>
        q.addProjection(Projection(ColRef(newcomer.columns.head.name,
          TableRef(newcomer.name)), Some("MIN")))
      case None => ()
    }
  }

  /** "Jenga" removal: drop the relation participating in the fewest joins
    * and cascade (query_builder.py:257-298).
    */
  def removeRelation(): Unit = if (canRemoveRelation) {
    save()
    val joinCount = q.relations.toSeq.map { t =>
      t -> q.joins.count(j => j.left.table == t || j.right.table == t)
    }
    val victim = joinCount.minBy(_._2)._1
    q.joins.filter(j => j.left.table == victim || j.right.table == victim)
      .toSeq.foreach(q.removeJoin)
    q.conditions.filter(_.col.table == victim).toSeq.foreach(q.removeCondition)
    q.projections.filter(_.col.table == victim).toSeq.foreach(q.removeProjection)
    q.relations -= victim
  }

  /** Swap one join edge for a different type-compatible column pair over
    * the same two tables.
    */
  def replaceJoin(): Unit = if (canReplaceJoin) {
    save()
    val j = rng.choice(q.joins.toSeq)
    val (lt, rt) = (tableModel(j.left.table), tableModel(j.right.table))
    val gen = new RandomQueryGen(db, rng.random.nextLong())
    gen.chooseJoinColumns(lt, rt).foreach { case (lc, rc) =>
      val replacement = JoinEdge(ColRef(lc.name, j.left.table), ColRef(rc.name, j.right.table))
      if (replacement != j) {
        q.joins -= j
        q.joins += replacement
      }
    }
  }

  def valid: Boolean = q.valid
}
