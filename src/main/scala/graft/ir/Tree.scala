package graft.ir

/** Logical relational-tree IR — counterpart of the reference's
  * `RelationalTree` (dqo/relational/tree/node.py, tree/__init__.py).
  * Immutable ADT: the reference's pointer surgery (push_above/detach) is
  * re-derived as rebuilds, per SURVEY §7 "hard parts".
  *
  * AND is vertical stacking of single-predicate [[Filter]] nodes
  * (tree/parser.py:144-148); OR is a predicate tree inside one Filter;
  * joins are selections over two relations ([[JoinNode]],
  * node.py:316-386).
  */

sealed trait Operand
final case class ConstOp(const: Const) extends Operand
final case class MultiConst(items: Seq[Const]) extends Operand {
  override def toString: String = items.mkString("(", ", ", ")")
}
final case class ColOp(rel: String, name: String) extends Operand {
  def fullName = s"$rel.$name"
}

sealed trait Pred {
  def relations: Set[String]
}
/** Single comparison, column-first canonical orientation (flip table
  * node.py:193-203). */
final case class Cmp(op: String, col: ColOp, operand: Operand) extends Pred {
  def relations: Set[String] = Set(col.rel) ++ (operand match {
    case c: ColOp => Set(c.rel)
    case _ => Set.empty
  })
  def sqlString: String = operand match {
    case ConstOp(c) => s"${col.fullName} $op ${c.text}"
    case m: MultiConst => s"${col.fullName} $op $m"
    case c: ColOp => s"${col.fullName} $op ${c.fullName}"
  }
}
final case class OrPred(left: Pred, right: Pred) extends Pred {
  def relations: Set[String] = left.relations ++ right.relations
}

final case class ProjCol(col: ColOp, agg: Option[String] = None,
                         alias: Option[String] = None) {
  def sqlString: String = {
    val base = agg.map(f => s"$f(${col.fullName})").getOrElse(col.fullName)
    alias.map(a => s"$base AS $a").getOrElse(base)
  }
}

sealed trait RelPlan {
  def children: Seq[RelPlan]
  def nodeCount: Int = 1 + children.map(_.nodeCount).sum
  /** relation keys (aliases or table names) visible in this subtree;
    * subquery internals are hidden behind their alias (node.py:54-107). */
  def relationKeys: Set[String] = this match {
    case RelationLeaf(_, key) => Set(key)
    case Subquery(alias, _) => Set(alias)
    case n => n.children.flatMap(_.relationKeys).toSet
  }
}
final case class RelationLeaf(table: String, key: String) extends RelPlan {
  def children: Seq[RelPlan] = Nil
}
/** FROM-clause subquery under an alias (AliasNode, tree/parser.py:94-109);
  * inner is a full plan rooted at a Project. */
final case class Subquery(alias: String, inner: RelPlan) extends RelPlan {
  def children: Seq[RelPlan] = Seq(inner)
}
final case class Filter(pred: Pred, child: RelPlan) extends RelPlan {
  def children: Seq[RelPlan] = Seq(child)
}
final case class JoinNode(op: String, left: ColOp, right: ColOp,
                          lc: RelPlan, rc: RelPlan) extends RelPlan {
  def children: Seq[RelPlan] = Seq(lc, rc)
}
final case class Project(cols: Seq[ProjCol], wildcard: Boolean,
                         child: RelPlan) extends RelPlan {
  def children: Seq[RelPlan] = Seq(child)
}
/** Disconnected FROM entries (cartesian) — kept so validity checks can
  * reject them (RelationalTree.dangling, tree/__init__.py:330-336). */
final case class CrossSet(branches: Seq[RelPlan]) extends RelPlan {
  def children: Seq[RelPlan] = branches
}

object TreeOps {

  val FlipOp: Map[String, String] = Map(
    "<" -> ">", ">" -> "<", "<=" -> ">=", ">=" -> "<=", "=" -> "=", "!=" -> "!=")

  // ---------------- canonization (node.py:254-257, 369-382, 414-415) ----

  /** Deterministic normal form: sorted projections, commutative join
    * children ordered by (subtree size, min relation key), stacked filter
    * chains sorted by predicate key.
    */
  def canonize(p: RelPlan): RelPlan = p match {
    case Project(cols, w, c) =>
      Project(cols.sortBy(_.sqlString), w, canonize(c))
    case f: Filter =>
      // collect a maximal stacked chain, sort, restack
      val (preds, base) = collectChain(f)
      val sorted = preds.sortBy(predKey)
      sorted.foldRight(canonize(base))((pr, acc) => Filter(pr, acc))
    case JoinNode(op, l, r, lc, rc) =>
      val (cl, cr) = (canonize(lc), canonize(rc))
      val ((nl, nr), (ncl, ncr)) =
        if (joinChildKey(cl) <= joinChildKey(cr)) ((l, r), (cl, cr))
        else ((r, l), (cr, cl))
      JoinNode(op, nl, nr, ncl, ncr)
    case Subquery(a, i) => Subquery(a, canonize(i))
    case CrossSet(bs) => CrossSet(bs.map(canonize).sortBy(joinChildKey))
    case leaf => leaf
  }

  /** Larger subtrees sort first (reference join-child ordering puts the
    * heavier branch left, node.py:369-382). */
  private def joinChildKey(p: RelPlan): String =
    f"${999999999 - p.nodeCount}%09d:${p.relationKeys.toSeq.sorted.mkString(",")}"

  private def predKey(pr: Pred): String = pr match {
    case c: Cmp => c.sqlString
    case o: OrPred => "OR:" + o.relations.toSeq.sorted.mkString(",")
  }

  private def collectChain(p: RelPlan): (Seq[Pred], RelPlan) = p match {
    case Filter(pr, c) =>
      val (rest, base) = collectChain(c)
      (pr +: rest, base)
    case other => (Nil, other)
  }

  // ---------------- predicate merge (tree/__init__.py:65-138) ----------

  /** Merge selection `a` into `b` (same column). Returns Some(newB) when
    * `a` is absorbed (drop `a`, replace `b`), None when not mergeable.
    * Exact port of the reference truth table, including its asymmetric
    * branches; multi-value / IS operands are conservatively unmergeable
    * (the reference would raise there).
    */
  def mergeSelections(a: Cmp, b: Cmp): Option[Cmp] = {
    (a.operand, b.operand) match {
      case (ConstOp(av), ConstOp(bv)) =>
        val (ao, bo) = (a.op, b.op)
        // '!=' is outside the interval algebra: 'x != 5 AND x != 3' keeps
        // BOTH predicates, and 'x != 5 AND x >= 5' is NOT 'x = 5'. Merge
        // only the exact-duplicate case.
        if (ao == "!=" || bo == "!=") {
          if (ao == bo && av.text == bv.text) Some(b) else None
        } else if (av.isNum) {
          def f(c: Const) = c.text.toDouble
          if (ao.contains("=") || bo.contains("=")) {
            if (ao == "=" || bo == "=") {
              if (ao == bo) {
                if (av.text == bv.text) Some(b) else None
              } else if (ao == "=") {
                if ((bo == ">=" && f(av) >= f(bv)) || (bo == "<=" && f(av) <= f(bv)))
                  Some(b.copy(op = "=", operand = ConstOp(av)))
                else None
              } else {
                if ((ao == ">=" && f(bv) >= f(av)) || (ao == "<=" && f(bv) <= f(av)) ||
                    (ao == "<" && f(bv) < f(av)) || (ao == ">" && f(bv) > f(av)))
                  Some(b)
                else None
              }
            } else if (ao == bo) {
              val replace =
                (ao == ">=" && f(av) >= f(bv)) || (ao == "<=" && f(av) <= f(bv))
              Some(if (replace) b.copy(operand = ConstOp(av)) else b)
            } else {
              // mixed, one op contains '=': merge only on equal operands
              if (av.text == bv.text) Some(b.copy(op = "=")) else None
            }
          } else if (ao == bo) {
            val replace =
              (ao == ">" && f(av) > f(bv)) || (ao == "<" && f(av) < f(bv))
            Some(if (replace) b.copy(operand = ConstOp(av)) else b)
          } else None
        } else if (ao == bo) {
          // non-numeric: textual strength comparison (tree/__init__.py:127-138)
          val replace =
            (ao == ">" && av.text > bv.text) || (ao == "<" && av.text < bv.text) ||
            (ao == "<=" && av.text <= bv.text) || (ao == ">=" && av.text >= bv.text)
          Some(if (replace) b.copy(operand = ConstOp(av)) else b)
        } else None
      case _ => None
    }
  }

  // ---------------- pushdown (tree/__init__.py:25-163) -----------------

  /** Push every single-relation filter to its deepest relation: below
    * joins and projections and INTO subquery bodies (alias columns map to
    * their source columns through the inner projection); merge with an
    * existing same-column selection met on the way.
    */
  def pushdown(p: RelPlan): RelPlan = {
    val (plan, pending) = collectFilters(p)
    pending.foldLeft(plan)((acc, pr) => place(acc, pr))
  }

  /** Remove pushable (single-relation, non-join) filters from the tree. */
  private def collectFilters(p: RelPlan): (RelPlan, Seq[Cmp]) = p match {
    case Filter(c: Cmp, child) if c.relations.size == 1 && !c.operand.isInstanceOf[ColOp] =>
      val (cp, cf) = collectFilters(child)
      (cp, c +: cf)
    case Filter(pr, child) =>
      val (cp, cf) = collectFilters(child)
      (Filter(pr, cp), cf)
    case JoinNode(op, l, r, lc, rc) =>
      val (lp, lf) = collectFilters(lc)
      val (rp, rf) = collectFilters(rc)
      (JoinNode(op, l, r, lp, rp), lf ++ rf)
    case Project(cols, w, c) =>
      val (cp, cf) = collectFilters(c)
      (Project(cols, w, cp), cf)
    case Subquery(a, i) => (Subquery(a, pushdown(i)), Nil) // inner handled recursively
    case CrossSet(bs) =>
      val done = bs.map(collectFilters)
      (CrossSet(done.map(_._1)), done.flatMap(_._2))
    case leaf => (leaf, Nil)
  }

  /** Re-attach a filter directly above its deepest relation, merging into
    * an existing same-column selection if one is met at the target.
    */
  private def place(p: RelPlan, c: Cmp): RelPlan = p match {
    case f @ Filter(existing: Cmp, child) =>
      if (existing.col == c.col && existing.relations == c.relations)
        mergeSelections(c, existing) match {
          case Some(merged) => Filter(merged, child)
          case None => Filter(c, f)
        }
      else Filter(existing, place(child, c))
    case Filter(pr, child) => Filter(pr, place(child, c))
    case j @ JoinNode(op, l, r, lc, rc) =>
      if (lc.relationKeys.contains(c.col.rel)) JoinNode(op, l, r, place(lc, c), rc)
      else if (rc.relationKeys.contains(c.col.rel)) JoinNode(op, l, r, lc, place(rc, c))
      else Filter(c, j)
    case Project(cols, w, child) =>
      if (child.relationKeys.contains(c.col.rel) ||
          // predicate on a projected alias: still belongs below
          cols.exists(pc => pc.alias.contains(c.col.name) || pc.col.name == c.col.name))
        Project(cols, w, place(child, c))
      else Filter(c, Project(cols, w, child))
    case sq @ Subquery(alias, inner) if alias == c.col.rel =>
      // map the outer column through the subquery projection to its
      // source column, then push inside (tree/__init__.py:141-162)
      resolveThroughProjection(inner, c.col.name) match {
        case Some(srcCol) => Subquery(alias, place(inner, c.copy(col = srcCol)))
        case None => Filter(c, sq)
      }
    case leaf @ RelationLeaf(_, key) =>
      if (key == c.col.rel) Filter(c, leaf) else leaf
    case CrossSet(bs) =>
      if (bs.exists(_.relationKeys.contains(c.col.rel)))
        CrossSet(bs.map(b => if (b.relationKeys.contains(c.col.rel)) place(b, c) else b))
      else Filter(c, CrossSet(bs))
    case other => Filter(c, other)
  }

  /** Resolve a name through a subquery's root projection to the source
    * column reference (RelationColumn.deepest_relation, node.py:74-99).
    */
  private def resolveThroughProjection(inner: RelPlan, name: String): Option[ColOp] =
    inner match {
      case Project(cols, wildcard, child) =>
        cols.find(pc => pc.alias.contains(name) || (pc.alias.isEmpty && pc.col.name == name))
          .map(_.col)
          .orElse(if (wildcard) child.relationKeys.headOption.map(ColOp(_, name)) else None)
      case Filter(_, c) => resolveThroughProjection(c, name)
      case _ => None
    }

  /** Parser-time placement: insert a predicate directly above the single
    * relation (or subquery alias) it references, below any filters already
    * stacked there (tree/parser.py:196-211). No merging here — that is
    * optimize()'s job.
    */
  def placeAboveRelation(p: RelPlan, pr: Pred): RelPlan = p match {
    case leaf @ RelationLeaf(_, key) if pr.relations == Set(key) => Filter(pr, leaf)
    case sq @ Subquery(alias, _) if pr.relations == Set(alias) => Filter(pr, sq)
    case Filter(x, c) => Filter(x, placeAboveRelation(c, pr))
    case JoinNode(op, l, r, lc, rc) =>
      if (pr.relations.subsetOf(lc.relationKeys)) JoinNode(op, l, r, placeAboveRelation(lc, pr), rc)
      else if (pr.relations.subsetOf(rc.relationKeys)) JoinNode(op, l, r, lc, placeAboveRelation(rc, pr))
      else Filter(pr, JoinNode(op, l, r, lc, rc))
    case other => Filter(pr, other)
  }

  /** optimize = canonize → pushdown → canonize (tree/__init__.py driver;
    * encoders consume the optimized tree, v20/encoder.py:574).
    */
  def optimize(p: RelPlan): RelPlan = canonize(pushdown(canonize(p)))

  // ---------------- flatten to Query (tree → set view) -----------------

  /** Flatten a (subquery-free) tree into the canonical [[Query]]. */
  def toQuery(p: RelPlan, trackOrder: Boolean = false): Query = {
    val q = new Query(trackOrder)
    val tables = scala.collection.mutable.Map.empty[String, TableRef]
    def tableOf(key: String): TableRef = tables(key)
    def scanRels(n: RelPlan): Unit = n match {
      case RelationLeaf(t, key) =>
        val tr = TableRef(t, if (key != t) Some(key) else None)
        tables(key) = tr; q.addTable(tr)
      case other => other.children.foreach(scanRels)
    }
    scanRels(p)
    def colRef(c: ColOp): ColRef = ColRef(c.name, tableOf(c.rel))
    def walk(n: RelPlan): Unit = n match {
      case Project(cols, _, c) =>
        cols.foreach(pc => q.addProjection(Projection(colRef(pc.col), pc.agg)))
        walk(c)
      case Filter(pred, c) =>
        flattenPred(pred).foreach {
          case Cmp(op, col, ConstOp(v)) => q.addCondition(Condition(colRef(col), v, op))
          case Cmp(op, col, m: MultiConst) =>
            q.addCondition(Condition(colRef(col), Const(m.toString), op))
          case Cmp(op, col, c2: ColOp) => q.addJoin(colRef(col), colRef(c2), op)
          case _ => ()
        }
        walk(c)
      case JoinNode(op, l, r, lc, rc) =>
        q.addJoin(colRef(l), colRef(r), op); walk(lc); walk(rc)
      case Subquery(_, i) => walk(i)
      case CrossSet(bs) => bs.foreach(walk)
      case _ => ()
    }
    walk(p)
    q
  }

  private def flattenPred(p: Pred): Seq[Cmp] = p match {
    case c: Cmp => Seq(c)
    case _: OrPred => Nil // OR kept only in the tree form (reference parity)
  }

  // ---------------- equivalence-preserving permutations (D2) -----------

  /** Enumerate up to `limit` equivalent trees: commutative join-child
    * swaps + comparison operand flips (dqo/tree/__init__.py:350-394)
    * plus stacked-selection-chain multiset permutations
    * (dqo/tree/__init__.py:213-266) — each maximal run of consecutive
    * Filter nodes contributes every distinct non-identity reordering,
    * one chain at a time (no cross product across chains, matching the
    * reference's one-swap-sequence-per-extra-tree construction). Fuels
    * dataset augmentation G8. Deviation: the reference drops the base
    * permutations whenever chain extras exist (`extra or super`,
    * tree/__init__.py:266) — we keep both, so augmented sets are
    * supersets of the reference's.
    */
  def permutations(p: RelPlan, limit: Int = 16): Seq[RelPlan] = {
    def variants(n: RelPlan): LazyList[RelPlan] = n match {
      case JoinNode(op, l, r, lc, rc) =>
        for {
          lv <- variants(lc); rv <- variants(rc)
          swapped <- LazyList(false, true)
        } yield
          if (swapped) JoinNode(FlipOp.getOrElse(op, op), r, l, rv, lv)
          else JoinNode(op, l, r, lv, rv)
      case Filter(pr, c) => variants(c).map(Filter(pr, _))
      case Project(cols, w, c) => variants(c).map(Project(cols, w, _))
      case Subquery(a, i) => variants(i).map(Subquery(a, _))
      case CrossSet(bs) => LazyList(CrossSet(bs)) // keep cartesian shape fixed
      case leaf => LazyList(leaf)
    }

    // maximal Filter chain: predicates top-down + the first non-Filter tail
    def chain(n: RelPlan): (Seq[Pred], RelPlan) = n match {
      case Filter(pr, c) => val (ps, tail) = chain(c); (pr +: ps, tail)
      case other => (Nil, other)
    }
    def rebuild(preds: Seq[Pred], tail: RelPlan): RelPlan =
      preds.foldRight(tail)((pr, acc) => Filter(pr, acc))

    /** Trees differing from `n` by reordering exactly one selection
      * chain somewhere in the subtree (multiset: duplicate predicates
      * collapse to distinct orderings only).
      */
    def chainExtras(n: RelPlan): Seq[RelPlan] = n match {
      case f: Filter =>
        val (preds, tail) = chain(f)
        val here =
          if (preds.size < 2) Nil
          else preds.permutations.take(limit + 1).map(_.toSeq).toSeq
            .distinct.filterNot(_ == preds).map(rebuild(_, tail))
        here ++ chainExtras(tail).map(t2 => rebuild(preds, t2))
      case JoinNode(op, l, r, lc, rc) =>
        chainExtras(lc).map(JoinNode(op, l, r, _, rc)) ++
          chainExtras(rc).map(JoinNode(op, l, r, lc, _))
      case Project(cols, w, c) => chainExtras(c).map(Project(cols, w, _))
      case Subquery(a, i) => chainExtras(i).map(Subquery(a, _))
      case CrossSet(bs) =>
        bs.indices.flatMap(i =>
          chainExtras(bs(i)).map(b2 => CrossSet(bs.updated(i, b2))))
      case _ => Nil
    }

    val base = variants(p).take(limit).toList
    (base ++ base.flatMap(chainExtras)).distinct.take(limit)
  }
}
