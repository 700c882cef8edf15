package graft.encode

import graft.ir._
import graft.lab.ExecOp
import graft.model._

/** Statistics-driven feature encoders — the reference's compute kernels
  * (dqo/estimator/gerelt/v20/encoder.py, SURVEY §2.10 E1-E11). Each
  * relational-tree node becomes a fixed-width vector built from the
  * schema+stats model: relation 63, projection 69, selection 112,
  * join 203 (v20/encoder.py:461,401,541,493 asserts).
  */
object Encoder {

  // ---- E1: 8-stat set summary (v20/encoder.py:43-72) -------------------

  def summarizeSet(s: Seq[Double]): Array[Double] = {
    if (s.isEmpty) return Array.fill(8)(0.0)
    if (s.size == 1) return Array(1, s.head, s.head, s.head, s.head, 0, 0, 0)
    val n = s.size
    val mean = s.sum / n
    val sorted = s.sorted
    val median =
      if (n % 2 == 1) sorted(n / 2) else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    val m2 = s.map(x => (x - mean) * (x - mean)).sum / n
    val m3 = s.map(x => math.pow(x - mean, 3)).sum / n
    val m4 = s.map(x => math.pow(x - mean, 4)).sum / n
    val variance = if (n > 1) s.map(x => (x - mean) * (x - mean)).sum / (n - 1) else 0.0
    val skew = if (m2 > 0) m3 / math.pow(m2, 1.5) else 0.0
    val kurt = if (m2 > 0) m4 / (m2 * m2) - 3.0 else 0.0
    Array(n, sorted.head, sorted.last, mean, median, nz(variance), nz(skew), nz(kurt))
  }

  private def nz(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d

  // ---- type one-hots & size weights (v20/encoder.py:121-163) -----------

  /** one-hot order: float, time, bool, number, string. */
  def typeOneHot(t: DType): Array[Double] = t match {
    case DType.Float => Array(1, 0, 0, 0, 0)
    case DType.Time => Array(0, 1, 0, 0, 0)
    case DType.Bool => Array(0, 0, 1, 0, 0)
    case DType.Number => Array(0, 0, 0, 1, 0)
    case DType.Str => Array(0, 0, 0, 0, 1)
  }

  def estimateSize(t: DType): Double = t match {
    case DType.Number => 0.2
    case DType.Bool => 0.01
    case DType.Str => 1.0
    case DType.Float => 0.3
    case DType.Time => 0.2
  }

  /** operator kind one-hot (v20/encoder.py:82-103). */
  def opOneHot(op: String): Array[Double] = op.toUpperCase match {
    case "=" | "IN" | "IS" => Array(0, 0, 0, 0, 1)
    case "!=" | "IS NOT" | "NOT IN" => Array(0, 0, 0, 1, 0)
    case "<" | "<=" | ">" | ">=" | "BETWEEN" => Array(0, 0, 1, 0, 0)
    case "LIKE" => Array(0, 1, 0, 0, 0)
    case "NOT LIKE" => Array(1, 0, 0, 0, 0)
    case _ => Array(0, 0, 0, 0, 0)
  }

  /** Standard English letter relative frequencies (public table), used by
    * the LIKE-pattern selectivity feature (v20/encoder.py:121-148).
    */
  val letterFreq: Map[Char, Double] = Map(
    'a' -> 0.08167, 'b' -> 0.01492, 'c' -> 0.02782, 'd' -> 0.04253,
    'e' -> 0.12702, 'f' -> 0.02228, 'g' -> 0.02015, 'h' -> 0.06094,
    'i' -> 0.06966, 'j' -> 0.00153, 'k' -> 0.00772, 'l' -> 0.04025,
    'm' -> 0.02406, 'n' -> 0.06749, 'o' -> 0.07507, 'p' -> 0.01929,
    'q' -> 0.00095, 'r' -> 0.05987, 's' -> 0.06327, 't' -> 0.09056,
    'u' -> 0.02758, 'v' -> 0.00978, 'w' -> 0.0236, 'x' -> 0.0015,
    'y' -> 0.01974, 'z' -> 0.00074)

  // ---- stats lookups ----------------------------------------------------

  private def colStats(db: DbModel, rel: String, col: String,
                       aliases: Map[String, String]): (ColumnModel, ColumnStats) = {
    val table = aliases.getOrElse(rel, rel)
    val cm = db.table(table).columnsByName(col)
    (cm, cm.stats.getOrElse(ColumnStats(1, 0, 1, index = false)))
  }

  /** numeric image of the column's stats (strings use length stats,
    * encode_col_measures v20/encoder.py:230-250). */
  private def numericOf(cm: ColumnModel, st: ColumnStats): Option[NumericStats] =
    if (cm.dtype == DType.Str) st.string.map(_.length) else st.numeric

  private def logAbs(d: Double): Double =
    if (d == 0.0 || d.isNaN || d.isInfinite) 0.0 else math.log(math.abs(d))

  private def measures(cm: ColumnModel, st: ColumnStats): Array[Double] =
    numericOf(cm, st) match {
      case Some(n) => Array(logAbs(n.variance), logAbs(n.skewness), logAbs(n.kurtosis))
      case None => Array(0, 0, 0)
    }

  // ---- E2: column 13-vector (v20/encoder.py:253-276) -------------------

  def encodeColumn(db: DbModel, rel: String, col: String,
                   aliases: Map[String, String]): Array[Double] = {
    val (cm, st) = colStats(db, rel, col, aliases)
    Array(math.log10(math.max(1, st.total)), st.distinctRatio, st.nullsFraction,
      estimateSize(cm.dtype), if (st.index) 1.0 else 0.0) ++
      measures(cm, st) ++ typeOneHot(cm.dtype)
  }

  // ---- E8: hist/freq padding (v20/encoder.py:200-227) ------------------

  val HistMaxLen = 11

  def encodeHistFreq(db: DbModel, rel: String, col: String,
                     aliases: Map[String, String]): (Array[Double], Array[Double]) = {
    val (cm, st) = colStats(db, rel, col, aliases)
    val (hist, freq) = numericOf(cm, st).map(n => (n.hist, n.freq))
      .getOrElse((Seq.empty[Double], Seq.empty[Long]))
    val (histPad, freqPad) = (1e-8, 0.1)
    val h = hist.map(v => math.log(if (v == 0.0) histPad else math.abs(v))).toArray
    val f = freq.map(v => math.log10(if (v == 0L) freqPad else v.toDouble)).toArray
    (h.padTo(HistMaxLen, math.log(histPad)), f.padTo(HistMaxLen, math.log10(freqPad)))
  }

  // ---- E3: relation 63-vector (v20/encoder.py:406-463) -----------------

  def encodeRelation(db: DbModel, table: String): Array[Double] = {
    val t = db.table(table)
    val rows7 = t.columns.map { c =>
      val st = c.stats.getOrElse(ColumnStats(1, 0, 1, index = false))
      Array(st.distinctRatio, st.nullsFraction, estimateSize(c.dtype),
        if (st.index) 1.0 else 0.0) ++ measures(c, st)
    }
    val summarized = (0 until 7).flatMap(i => summarizeSet(rows7.map(_(i))))
    val counts = typeCountsLog(t.columns.map(_.dtype))
    val ts = t.stats.getOrElse(TableStats(1, 8192))
    (summarized ++ counts ++ Seq(math.log10(math.max(1, ts.rows)),
      math.log10(math.max(1, ts.pages * ts.pageSize)))).toArray
  }

  /** log type counts in order string, number, float, bool, time
    * (v20/encoder.py:447-455). */
  private def typeCountsLog(types: Seq[DType]): Seq[Double] = {
    val c = types.groupBy(identity).view.mapValues(_.size).toMap
    Seq(DType.Str, DType.Number, DType.Float, DType.Bool, DType.Time)
      .map(t => c.get(t).map(n => math.log(n)).getOrElse(0.0))
  }

  // ---- E4: projection 69-vector (v20/encoder.py:342-403) ---------------

  def encodeProjection(db: DbModel, cols: Seq[ColOp],
                       aliases: Map[String, String]): Array[Double] = {
    val safe = if (cols.isEmpty) Seq.empty else cols.filter(_.rel.nonEmpty)
    val rows8 = safe.map { c =>
      val (cm, st) = colStats(db, c.rel, c.name, aliases)
      Array(math.log10(math.max(1, st.total)), st.distinctRatio, st.nullsFraction,
        estimateSize(cm.dtype), if (st.index) 1.0 else 0.0) ++ measures(cm, st)
    }
    val summarized =
      if (rows8.isEmpty) Array.fill(64)(0.0)
      else (0 until 8).flatMap(i => summarizeSet(rows8.map(_(i)))).toArray
    val counts = typeCountsLog(safe.map(c => colStats(db, c.rel, c.name, aliases)._1.dtype))
    (summarized ++ counts).toArray
  }

  // ---- E7: operand 4-vector (v20/encoder.py:279-339) -------------------

  def adjustedValueAndProbability(hist: Seq[Double], freq: Seq[Long], value: Double,
                                  agg: Boolean): (Double, Double) = {
    if (hist.isEmpty) return (0.0, 0.0)
    var bucket = 0
    var i = 0
    while (i < hist.size && value >= hist(i)) { bucket = i; i += 1 }
    val total = math.max(1L, freq.sum).toDouble
    if (agg) {
      val remaining = hist.size - bucket
      val adjusted = (bucket until hist.size).sum.toDouble / math.max(1, remaining)
      val prob = (bucket until hist.size).map(j => freq.lift(j).getOrElse(0L)).sum / total
      (adjusted, prob)
    } else {
      val adjusted = (bucket + 1).toDouble / hist.size
      (adjusted, freq.lift(bucket).getOrElse(0L) / total)
    }
  }

  def encodeOperand(db: DbModel, rel: String, col: String, operand: Operand,
                    aliases: Map[String, String]): Array[Double] = {
    val (cm, st) = colStats(db, rel, col, aliases)
    val text = operand match {
      case ConstOp(c) => c.text
      case m: MultiConst => m.items.headOption.map(_.text).getOrElse("0")
      case c: ColOp => return Array(0, 0, 0, 0)
    }
    cm.dtype match {
      case DType.Str =>
        val raw = text.stripPrefix("'").stripSuffix("'")
        val leftWc = raw.startsWith("%")
        val rightWc = raw.endsWith("%")
        val value = raw.replace("%", "")
        val letterProb = value.toLowerCase.foldLeft(1.0)((acc, ch) =>
          acc * letterFreq.getOrElse(ch, 0.01))
        val ls = st.string.map(_.length)
        val (adj, prob) = adjustedValueAndProbability(
          ls.map(_.hist).getOrElse(Nil), ls.map(_.freq).getOrElse(Nil),
          value.length.toDouble, agg = leftWc || rightWc)
        Array(if (leftWc) 1 else 0, adj, prob * letterProb, if (rightWc) 1 else 0)
      case DType.Bool =>
        val v = if (Set("true", "1").contains(text.toLowerCase)) 1.0 else 0.0
        val n = st.numeric
        val (adj, prob) = adjustedValueAndProbability(
          n.map(_.hist).getOrElse(Nil), n.map(_.freq).getOrElse(Nil), v, agg = false)
        Array(0, adj, prob, 0)
      case _ =>
        val v = parseMeasure(text)
        val n = st.numeric
        val (adj, prob) = adjustedValueAndProbability(
          n.map(_.hist).getOrElse(Nil), n.map(_.freq).getOrElse(Nil), v, agg = false)
        Array(0, adj - 0.5, prob, 0)
    }
  }

  private def parseMeasure(text: String): Double = {
    val t = text.trim
    if (t.toUpperCase.startsWith("TIMESTAMP")) {
      val iso = t.drop(9).trim.stripPrefix("'").stripSuffix("'").replace(" ", "T")
      scala.util.Try(java.time.LocalDateTime.parse(iso)
        .toEpochSecond(java.time.ZoneOffset.UTC).toDouble).getOrElse(0.0)
    } else scala.util.Try(t.toDouble).getOrElse(0.0)
  }

  // ---- E5: selection 112 / E6: join 203 (v20/encoder.py:466-543) -------

  def encodeSelection(db: DbModel, c: Cmp, aliases: Map[String, String]): Array[Double] = {
    val (cm, _) = colStats(db, c.col.rel, c.col.name, aliases)
    val (h, f) = encodeHistFreq(db, c.col.rel, c.col.name, aliases)
    encodeColumn(db, c.col.rel, c.col.name, aliases) ++
      encodeRelation(db, aliases.getOrElse(c.col.rel, c.col.rel)) ++
      h ++ f ++ typeOneHot(cm.dtype) ++ opOneHot(c.op) ++
      encodeOperand(db, c.col.rel, c.col.name, c.operand, aliases)
  }

  def encodeJoin(db: DbModel, left: ColOp, right: ColOp,
                 aliases: Map[String, String]): Array[Double] = {
    def side(c: ColOp): Array[Double] = {
      val (_, st) = colStats(db, c.rel, c.name, aliases)
      val (h, f) = encodeHistFreq(db, c.rel, c.name, aliases)
      encodeColumn(db, c.rel, c.name, aliases) ++
        encodeRelation(db, aliases.getOrElse(c.rel, c.rel)) ++
        h ++ f ++ Array(if (st.index) 1.0 else 0.0)
    }
    val (cmR, _) = colStats(db, right.rel, right.name, aliases)
    side(left) ++ side(right) ++ typeOneHot(cmR.dtype)
  }

  // ---- E9/E11: tree → vectors ------------------------------------------

  final case class EncodedNode(nodeType: String, vector: Array[Double],
                               children: Seq[EncodedNode]) {
    def preorder: Seq[EncodedNode] = this +: children.flatMap(_.preorder)
  }

  /** Encode an optimized relational tree into per-node vectors
    * (encode_rel_tree, v20/encoder.py:571-576). OR nodes are encoded as
    * the elementwise mean of their flattened comparisons.
    */
  def encodeTree(db: DbModel, plan: RelPlan): EncodedNode = {
    val aliases = collectAliases(plan)
    def enc(p: RelPlan): EncodedNode = p match {
      case RelationLeaf(t, _) =>
        EncodedNode("relation", encodeRelation(db, t), Nil)
      case Subquery(_, inner) => enc(inner)
      case Filter(c: Cmp, child) =>
        c.operand match {
          case r: ColOp =>
            EncodedNode("join", encodeJoin(db, c.col, r, aliases), Seq(enc(child)))
          case _ =>
            EncodedNode("selection", encodeSelection(db, c, aliases), Seq(enc(child)))
        }
      case Filter(o: OrPred, child) =>
        def cmps(p: Pred): Seq[Cmp] = p match {
          case c: Cmp => Seq(c)
          case OrPred(l, r) => cmps(l) ++ cmps(r)
        }
        val vecs = cmps(o).filterNot(_.operand.isInstanceOf[ColOp])
          .map(encodeSelection(db, _, aliases))
        val mean =
          if (vecs.isEmpty) Array.fill(112)(0.0)
          else vecs.transpose.map(col => col.sum / col.size).toArray
        EncodedNode("selection", mean, Seq(enc(child)))
      case JoinNode(_, l, r, lc, rc) =>
        EncodedNode("join", encodeJoin(db, l, r, aliases), Seq(enc(lc), enc(rc)))
      case Project(cols, _, child) =>
        EncodedNode("projection",
          encodeProjection(db, cols.map(_.col).filter(_.rel.nonEmpty), aliases),
          Seq(enc(child)))
      case CrossSet(bs) =>
        EncodedNode("projection", Array.fill(69)(0.0), bs.map(enc))
    }
    enc(TreeOps.optimize(plan))
  }

  private def collectAliases(p: RelPlan): Map[String, String] = p match {
    case RelationLeaf(t, key) => Map(key -> t)
    case other => other.children.flatMap(collectAliases).toMap
  }

  /** E11: SQL (+ optional measured plan) → encoded tree
    * (encode_query, v20/encoder.py:745-756).
    */
  def encodeQuery(db: DbModel, sql: String, plan: Option[ExecOp] = None): EncodedNode = {
    val tree = Frontend.parseSql(sql, Some(db))
    val q = TreeOps.toQuery(tree)
    require(q.valid, s"rejecting cartesian/invalid query (encoder parity): $sql")
    val merged = plan.map(p => PlanMerge.mergeWithExecPlan(tree, p)).getOrElse(tree)
    encodeTree(db, merged)
  }
}
