package graft.encode

import graft.ir._
import graft.model._

/** Second and third encoder families sharing the stats model with
  * [[Encoder]] (the gerelt kernel set): the MSCN-style set encoder
  * (reference dqo/estimator/others/kipf/encoder.py:43-148) and the greq
  * compact per-node vectors (dqo/estimator/greq/v3/encoder.py:61-167).
  * These are the reference's points of comparison for the learned cost
  * estimator — set-shaped input for deep-sets models, flat short vectors
  * for sequence models.
  */
object SetEncoders {

  // ---- MSCN set encoder (kipf/encoder.py:37-121) -----------------------

  /** Operator vocabulary and order fixed by kipf/encoder.py:37-40. */
  val MscnOperators: Seq[String] = Seq(
    "<", "<=", ">", ">=", "!=", "=", "NOT LIKE", "BETWEEN", "LIKE", "IN",
    "IS", "IS NOT")
  private val mscnOpIndex = MscnOperators.zipWithIndex.toMap

  /** ceil(log2(n)) bits, matching np.ceil(np.log2(n)) (log2(1) = 0). */
  def bitsFor(n: Int): Int =
    math.max(0, math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt)

  /** value as a zero-filled binary row (index_as_int_array,
    * kipf/encoder.py:33-34). */
  def binRow(value: Int, pad: Int): Array[Double] = {
    val out = new Array[Double](pad)
    var v = value
    var i = pad - 1
    while (v > 0 && i >= 0) {
      out(i) = (v & 1).toDouble
      v >>= 1
      i -= 1
    }
    out
  }

  /** Fixed-capacity set matrices + per-row padding masks
    * (decompose_query, kipf/encoder.py:43-121): tables (T × log2(T)),
    * joins (C(T,2) × log2(C(T,2))) over the upper-triangle pair index,
    * predicates (C × log2(C)+log2(O)) as column-id ++ operator-id bits.
    */
  final case class MscnEncoding(
      tables: Array[Array[Double]], tablesMask: Array[Double],
      joins: Array[Array[Double]], joinsMask: Array[Double],
      predicates: Array[Array[Double]], predicatesMask: Array[Double])

  def encodeMscn(db: DbModel, sql: String): MscnEncoding = {
    val plan = Frontend.parseSql(sql, Some(db))
    val q = TreeOps.toQuery(plan)
    val aliases = collectAliases(plan)

    val tableNames = db.tables.map(_.name)
    val tablesMap = tableNames.zipWithIndex.toMap
    val columnsMap = db.tables
      .flatMap(t => t.columns.map(c => s"${t.name}::${c.name}"))
      .zipWithIndex.toMap
    val tCount = tableNames.size
    val cCount = columnsMap.size
    val tableBits = bitsFor(tCount)
    val joinsCount = tCount * (tCount - 1) / 2
    val joinBits = bitsFor(joinsCount)
    val colBits = bitsFor(cCount)
    val opBits = bitsFor(MscnOperators.size)

    // tables set: i-th relation of the query -> binary table id
    val tables = Array.fill(tCount)(new Array[Double](tableBits))
    val tablesMask = new Array[Double](tCount)
    q.relations.toSeq.zipWithIndex.foreach { case (rel, i) =>
      tables(i) = binRow(tablesMap(rel.name), tableBits)
      tablesMask(i) = 1.0
    }

    // joins set: the symmetric join matrix flattened over the upper
    // triangle (row-major, k=1); a present pair lights its own index
    val joins = Array.fill(joinsCount)(new Array[Double](joinBits))
    val joinsMask = new Array[Double](joinsCount)
    val joined = q.joins.map { j =>
      val (a, b) = (tablesMap(j.left.table.name), tablesMap(j.right.table.name))
      (math.min(a, b), math.max(a, b))
    }.toSet
    var flat = 0
    for (a <- 0 until tCount; b <- a + 1 until tCount) {
      if (joined((a, b))) {
        joins(flat) = binRow(flat, joinBits)
        joinsMask(flat) = 1.0
      }
      flat += 1
    }

    // predicates set: i-th non-join comparison (ORs flattened) ->
    // column-id bits ++ operator-id bits; unknown operators keep zero
    // operator bits (the reference would reject them upstream)
    val predicates = Array.fill(cCount)(new Array[Double](colBits + opBits))
    val predicatesMask = new Array[Double](cCount)
    flatSelections(plan).take(cCount).zipWithIndex.foreach { case (c, i) =>
      val table = aliases.getOrElse(c.col.rel, c.col.rel)
      val colIdx = columnsMap(s"$table::${c.col.name}")
      val opRow = mscnOpIndex.get(c.op.toUpperCase) match {
        case Some(o) => binRow(o, opBits)
        case None => new Array[Double](opBits)
      }
      predicates(i) = binRow(colIdx, colBits) ++ opRow
      predicatesMask(i) = 1.0
    }

    MscnEncoding(tables, tablesMask, joins, joinsMask, predicates, predicatesMask)
  }

  /** Non-join comparisons in tree preorder, ORs flattened
    * (get_selections(include_joins=False, flatten_or=True)). */
  private def flatSelections(p: RelPlan): Seq[Cmp] = {
    def cmps(pred: Pred): Seq[Cmp] = pred match {
      case c: Cmp => Seq(c)
      case OrPred(l, r) => cmps(l) ++ cmps(r)
    }
    p match {
      case Filter(pred, child) =>
        cmps(pred).filterNot(_.operand.isInstanceOf[ColOp]) ++ flatSelections(child)
      case other => other.children.flatMap(flatSelections)
    }
  }

  private def collectAliases(p: RelPlan): Map[String, String] = p match {
    case RelationLeaf(t, key) => Map(key -> t)
    case other => other.children.flatMap(collectAliases).toMap
  }

  // ---- Neo flat query vector (others/neo/v1/encoder.py:9-50) -----------

  /** Upper-triangle join-existence bits ++ per-column predicate
    * indicator: length C(T,2) + C. Joins follow the same (a,b) row-major
    * triangle order as [[encodeMscn]]; any column referenced by a
    * non-join selection lights its slot.
    */
  def encodeNeo(db: DbModel, sql: String): Array[Double] = {
    val plan = Frontend.parseSql(sql, Some(db))
    val q = TreeOps.toQuery(plan)
    val aliases = collectAliases(plan)
    val tablesMap = db.tables.map(_.name).zipWithIndex.toMap
    val columnsMap = db.tables
      .flatMap(t => t.columns.map(c => s"${t.name}::${c.name}"))
      .zipWithIndex.toMap
    val tCount = tablesMap.size
    // join-free queries never index tablesMap below, so bind-check the
    // relation set explicitly — an unknown table must fail encoding
    // (the reference indexes its table map and KeyErrors), not score
    // silently as an all-zero vector downstream ([[graft.estimate.Scoring]]
    // turns the failure into the row's NaN marker)
    q.relations.foreach { rel =>
      require(tablesMap.contains(rel.name), s"unknown table ${rel.name}")
    }

    val joined = q.joins.map { j =>
      val (a, b) = (tablesMap(j.left.table.name), tablesMap(j.right.table.name))
      (math.min(a, b), math.max(a, b))
    }.toSet
    val joinBits = (for (a <- 0 until tCount; b <- a + 1 until tCount)
      yield if (joined((a, b))) 1.0 else 0.0).toArray

    val predBits = new Array[Double](columnsMap.size)
    flatSelections(plan).foreach { c =>
      val table = aliases.getOrElse(c.col.rel, c.col.rel)
      predBits(columnsMap(s"$table::${c.col.name}")) = 1.0
    }
    joinBits ++ predBits
  }

  // ---- relcnn flat matrix / treelstm parent links ----------------------

  /** The relcnn data interface (relcnn/v1/encoder.py:536-556): the
    * optimized tree's dfs node vectors as one fixed-width matrix (rows
    * right-padded with zeros to the widest node vector) — the 2-D input a
    * convolutional estimator consumes. Node vectors are the v20 kernel
    * family ([[Encoder]]: relation 63, projection 69, selection 112,
    * join 203), the documented substitution for relcnn's near-identical
    * widths.
    */
  def flatMatrix(db: DbModel, sql: String): Array[Array[Double]] = {
    val nodes = Encoder.encodeQuery(db, sql).preorder
    val width = nodes.map(_.vector.length).max
    nodes.map(n => n.vector.padTo(width, 0.0)).toArray
  }

  /** The treelstm data interface (treelstm/v2/encoder.py:531-551): dfs
    * node vectors plus each node's parent index (-1 for the root), the
    * child-sum recursion structure a tree-LSTM consumes.
    */
  def treeWithParents(db: DbModel, sql: String): (Array[Int], Array[Array[Double]]) = {
    val root = Encoder.encodeQuery(db, sql)
    val parents = scala.collection.mutable.ArrayBuffer.empty[Int]
    val vectors = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def walk(n: Encoder.EncodedNode, parent: Int): Unit = {
      val idx = vectors.size
      parents += parent
      vectors += n.vector
      n.children.foreach(walk(_, idx))
    }
    walk(root, -1)
    (parents.toArray, vectors.toArray)
  }

  // ---- greq v3 compact per-node vectors (greq/v3/encoder.py:18-141) ----

  /** node-type one-hot order: projection, relation, join, selection
    * (greq/v3/encoder.py:33-40). */
  private val ProjNode = Array(1.0, 0, 0, 0)
  private val RelNode = Array(0.0, 1, 0, 0)
  private val SelNode = Array(0.0, 0, 0, 1)

  /** operator coarse one-hot: range / equality / pattern
    * (greq/v3/encoder.py:18-31). */
  def greqOpOneHot(op: String): Array[Double] = op.toUpperCase match {
    case "<" | "<=" | ">" | ">=" | "BETWEEN" => Array(1, 0, 0)
    case "=" | "!=" | "IN" | "IS" | "IS NOT" => Array(0, 1, 0)
    case "LIKE" | "NOT LIKE" => Array(0, 0, 1)
    case _ => Array(0, 0, 0)
  }

  private def typeIndex(t: DType): Int = t match {
    case DType.Float => 0
    case DType.Time => 1
    case DType.Bool => 2
    case DType.Number => 3
    case DType.Str => 4
  }

  private def log10Total(st: ColumnStats): Double =
    math.log10(math.max(1, st.total).toDouble)

  private def stats(cm: ColumnModel): ColumnStats =
    cm.stats.getOrElse(ColumnStats(1, 0, 1, index = false))

  /** 10-wide (count, log10 total) accumulation per type slot shared by
    * relation and projection nodes (greq/v3/encoder.py:61-82). */
  private def typeAccum(cols: Seq[ColumnModel]): Array[Double] = {
    val acc = new Array[Double](10)
    cols.foreach { cm =>
      val i = typeIndex(cm.dtype)
      acc(i * 2) += 1.0
      acc(i * 2 + 1) += log10Total(stats(cm))
    }
    acc
  }

  /** column 9-vector: log10 total, nulls fraction, distinct ratio,
    * type one-hot (5), index flag (greq/v3/encoder.py:85-95). */
  def greqColumn(db: DbModel, rel: String, col: String,
                 aliases: Map[String, String]): Array[Double] = {
    val cm = db.table(aliases.getOrElse(rel, rel)).columnsByName(col)
    val st = stats(cm)
    Array(log10Total(st), st.nullsFraction, st.distinctRatio) ++
      Encoder.typeOneHot(cm.dtype) ++ Array(if (st.index) 1.0 else 0.0)
  }

  /** One vector per node, tree preorder: relation 14, projection 14,
    * condition 16 (node4+col9+op3), join 25 (node4+col9+op3+col9); OR is
    * the elementwise mean of its flattened conditions
    * (encode_rel_tree, greq/v3/encoder.py:131-141).
    */
  def encodeGreq(db: DbModel, sql: String): Seq[(String, Array[Double])] = {
    val plan = TreeOps.optimize(Frontend.parseSql(sql, Some(db)))
    val aliases = collectAliases(plan)

    def selection(c: Cmp): Array[Double] = c.operand match {
      case r: ColOp =>
        SelNode ++ greqColumn(db, c.col.rel, c.col.name, aliases) ++
          greqOpOneHot(c.op) ++ greqColumn(db, r.rel, r.name, aliases)
      case _ =>
        SelNode ++ greqColumn(db, c.col.rel, c.col.name, aliases) ++
          greqOpOneHot(c.op)
    }

    def enc(p: RelPlan): Seq[(String, Array[Double])] = p match {
      case RelationLeaf(t, _) =>
        Seq("relation" -> (RelNode ++ typeAccum(db.table(t).columns)))
      case Subquery(_, inner) => enc(inner)
      case Project(cols, _, child) =>
        val bound = cols.map(_.col).filter(_.rel.nonEmpty)
          .map(c => db.table(aliases.getOrElse(c.rel, c.rel)).columnsByName(c.name))
        ("projection" -> (ProjNode ++ typeAccum(bound))) +: enc(child)
      case Filter(c: Cmp, child) =>
        ((if (c.operand.isInstanceOf[ColOp]) "join" else "selection") ->
          selection(c)) +: enc(child)
      case Filter(o: OrPred, child) =>
        def cmps(pred: Pred): Seq[Cmp] = pred match {
          case c: Cmp => Seq(c)
          case OrPred(l, r) => cmps(l) ++ cmps(r)
        }
        val vecs = cmps(o).filterNot(_.operand.isInstanceOf[ColOp]).map(selection)
        val mean =
          if (vecs.isEmpty) new Array[Double](16)
          else vecs.transpose.map(col => col.sum / col.size).toArray
        ("selection" -> mean) +: enc(child)
      case JoinNode(op, l, r, lc, rc) =>
        ("join" -> (SelNode ++ greqColumn(db, l.rel, l.name, aliases) ++
          greqOpOneHot(op) ++ greqColumn(db, r.rel, r.name, aliases))) +:
          (enc(lc) ++ enc(rc))
      case CrossSet(bs) => bs.flatMap(enc)
    }
    enc(plan)
  }
}
