package graft.encode

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Shape + golden-value parity for the MSCN set encoder
  * (kipf/encoder.py:43-121: matrices T×log2T, C(T,2)×log2C(T,2),
  * C×(log2C+log2O) with per-row masks) and the greq compact vectors
  * (greq/v3/encoder.py: relation/projection 14, condition 16, join 25).
  * Same employees fixture as EncoderSpec (FIXTURES.md §1).
  */
class SetEncodersSpec extends AnyFunSuite {

  private def col(name: String, t: DType, total: Long, nulls: Long, distinct: Long,
                  index: Boolean) =
    ColumnModel(name, t, Some(ColumnStats(total, nulls, distinct, index,
      if (t == DType.Str || t == DType.Bool) None
      else Some(NumericStats(1, 50, 100, 0.1, 0.1, 0.1)),
      if (t == DType.Str) Some(StringStats(
        NumericStats(1, 10, 20, 0.1, 0.1, 0.1),
        NumericStats(1, 2, 4, 0.1, 0.1, 0.1))) else None)))

  val db: DbModel = DbModel(Seq(
    TableModel("employees", Seq(
      col("id", DType.Str, 1000000, 0, 1000000, index = true),
      col("salary", DType.Number, 1000000, 10, 100000, index = false),
      col("dept", DType.Str, 1000000, 100, 100, index = false),
      col("company", DType.Str, 1000000, 0, 3, index = false),
      col("name", DType.Str, 1000000, 0, 100000, index = false),
      col("active", DType.Bool, 1000000, 0, 2, index = false))),
    TableModel("departments", Seq(
      col("id", DType.Number, 100, 0, 100, index = true),
      col("name", DType.Str, 100, 0, 100, index = false))),
    TableModel("companies", Seq(
      col("id", DType.Number, 3, 0, 3, index = true),
      col("name", DType.Str, 3, 0, 3, index = false)))))

  private val sql =
    """SELECT e.name FROM employees AS e, departments AS d
      |WHERE e.dept = d.name AND e.salary > 10""".stripMargin

  test("mscn shapes: T x log2(T), C(T,2) x log2(C(T,2)), C x (log2C + log2O)") {
    val m = SetEncoders.encodeMscn(db, sql)
    // T=3 -> 2 bits; 3 pairs -> 2 bits; C=10 -> 4 bits; 12 ops -> 4 bits
    assert(m.tables.length == 3 && m.tables.forall(_.length == 2))
    assert(m.joins.length == 3 && m.joins.forall(_.length == 2))
    assert(m.predicates.length == 10 && m.predicates.forall(_.length == 8))
    assert(m.tablesMask.length == 3 && m.joinsMask.length == 3
      && m.predicatesMask.length == 10)
  }

  test("mscn golden encoding for a join + range predicate") {
    val m = SetEncoders.encodeMscn(db, sql)
    // relations in query order: employees=0 -> [0,0], departments=1 -> [0,1]
    assert(m.tables(0).toSeq == Seq(0.0, 0.0) && m.tables(1).toSeq == Seq(0.0, 1.0))
    assert(m.tablesMask.toSeq == Seq(1.0, 1.0, 0.0))
    // upper-triangle pair order (0,1),(0,2),(1,2): only (emp,dept) lit
    assert(m.joinsMask.toSeq == Seq(1.0, 0.0, 0.0))
    assert(m.joins(0).toSeq == Seq(0.0, 0.0)) // binary of flat index 0
    // predicate: employees::salary has column index 1, '>' operator index 2
    assert(m.predicatesMask.head == 1.0 && m.predicatesMask.drop(1).forall(_ == 0.0))
    assert(m.predicates(0).toSeq == Seq(0, 0, 0, 1.0, 0, 0, 1.0, 0))
  }

  test("binRow matches zero-filled binary") {
    assert(SetEncoders.binRow(5, 4).toSeq == Seq(0.0, 1.0, 0.0, 1.0))
    assert(SetEncoders.binRow(0, 3).toSeq == Seq(0.0, 0.0, 0.0))
  }

  test("greq vector lengths: relation/projection 14, condition 16, join 25") {
    val nodes = SetEncoders.encodeGreq(db, sql)
    val byType = nodes.groupBy(_._1)
    assert(byType("relation").forall(_._2.length == 14))
    assert(byType("projection").forall(_._2.length == 14))
    assert(byType("selection").forall(_._2.length == 16))
    assert(byType("join").forall(_._2.length == 25))
    // one projection, one join, one selection, two relations
    assert(nodes.map(_._1).sorted ==
      Seq("join", "projection", "relation", "relation", "selection"))
  }

  test("greq relation node accumulates (count, log10 total) per type slot") {
    val nodes = SetEncoders.encodeGreq(db, "SELECT id FROM departments")
    val rel = nodes.find(_._1 == "relation").get._2
    // node one-hot [0,1,0,0] then 5 (count, log10total) pairs:
    // departments = 1 number + 1 string column, total=100 -> log10=2
    assert(rel.take(4).toSeq == Seq(0.0, 1.0, 0.0, 0.0))
    val slots = rel.drop(4)
    assert(slots(3 * 2) == 1.0 && slots(3 * 2 + 1) == 2.0) // number slot
    assert(slots(4 * 2) == 1.0 && slots(4 * 2 + 1) == 2.0) // string slot
    assert(slots(0) == 0.0 && slots(2) == 0.0 && slots(4) == 0.0)
  }

  test("neo vector is C(T,2) join bits ++ C predicate bits") {
    val v = SetEncoders.encodeNeo(db, sql)
    assert(v.length == 3 + 10)
    // (employees, departments) is triangle pair 0; predicate on
    // employees::salary = global column index 1
    assert(v.take(3).toSeq == Seq(1.0, 0.0, 0.0))
    assert(v.drop(3).toSeq == Seq(0.0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("relcnn flat matrix pads dfs node vectors to uniform width") {
    val m = SetEncoders.flatMatrix(db, sql)
    assert(m.length == 5) // projection, join(+selection pushed), 2 relations
    assert(m.forall(_.length == m.head.length))
    assert(m.head.length == 203) // widest = join vector
  }

  test("treelstm parent links describe the dfs tree") {
    val (parents, vectors) = SetEncoders.treeWithParents(db, sql)
    assert(parents.length == vectors.length)
    assert(parents.head == -1) // root
    // every non-root parent index precedes its child (dfs order)
    parents.zipWithIndex.drop(1).foreach { case (p, i) =>
      assert(p >= 0 && p < i)
    }
  }

  test("greq OR node is the mean of its flattened conditions") {
    val nodes = SetEncoders.encodeGreq(db,
      "SELECT id FROM employees WHERE salary > 10 OR salary < 5")
    val sel = nodes.filter(_._1 == "selection")
    assert(sel.size == 1 && sel.head._2.length == 16)
    // both branches are range ops on the same column -> mean == either
    val single = SetEncoders.encodeGreq(db,
      "SELECT id FROM employees WHERE salary > 10").filter(_._1 == "selection")
    assert(sel.head._2.toSeq == single.head._2.toSeq)
  }
}
