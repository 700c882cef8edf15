package graft.encode

import org.scalatest.funsuite.AnyFunSuite

import graft.ir._
import graft.model._

/** Vector-length parity with the reference's asserts
  * (v20/encoder.py:461,401,541,493): relation 63, projection 69,
  * selection 112, join 203, column 13. Fixture mirrors
  * employees_db_w_meta (FIXTURES.md §1).
  */
class EncoderSpec extends AnyFunSuite {

  private def num(mn: Double, mx: Double) = NumericStats(
    mn, (mn + mx) / 2, mx, 0.1, 0.1, 0.1,
    hist = (1 to 10).map(b => mn + b * (mx + 1 - mn) / 10),
    freq = Seq.fill(10)(100L))

  private def strStats = StringStats(num(1, 20), num(1, 4))

  private def col(name: String, t: DType, total: Long, nulls: Long, distinct: Long,
                  index: Boolean) = {
    val numeric = t match {
      case DType.Str | DType.Bool => None
      case _ => Some(num(1, 100))
    }
    val string = if (t == DType.Str) Some(strStats) else None
    ColumnModel(name, t, Some(ColumnStats(total, nulls, distinct, index, numeric, string)))
  }

  val db: DbModel = DbModel(Seq(
    TableModel("employees", Seq(
      col("id", DType.Str, 1000000, 0, 1000000, index = true),
      col("salary", DType.Number, 1000000, 10, 100000, index = false),
      col("dept", DType.Str, 1000000, 100, 100, index = false),
      col("company", DType.Str, 1000000, 0, 3, index = false),
      col("name", DType.Str, 1000000, 0, 100000, index = false),
      col("active", DType.Bool, 1000000, 0, 2, index = false)),
      Some(TableStats(1000000, 80000000))),
    TableModel("departments", Seq(
      col("id", DType.Number, 100, 0, 100, index = true),
      col("name", DType.Str, 100, 0, 100, index = false)),
      Some(TableStats(100, 8192))),
    TableModel("companies", Seq(
      col("id", DType.Number, 3, 0, 3, index = true),
      col("name", DType.Str, 3, 0, 3, index = false)),
      Some(TableStats(3, 8192)))))

  private val noAlias = Map.empty[String, String]

  test("column vector is 13-wide") {
    assert(Encoder.encodeColumn(db, "employees", "salary", noAlias).length == 13)
  }

  test("relation vector is 63-wide") {
    assert(Encoder.encodeRelation(db, "employees").length == 63)
    assert(Encoder.encodeRelation(db, "departments").length == 63)
  }

  test("projection vector is 69-wide") {
    val v = Encoder.encodeProjection(db,
      Seq(ColOp("employees", "id"), ColOp("employees", "salary")), noAlias)
    assert(v.length == 69)
  }

  test("selection vector is 112-wide") {
    val v = Encoder.encodeSelection(db,
      Cmp(">", ColOp("employees", "salary"), ConstOp(Const("10"))), noAlias)
    assert(v.length == 112)
  }

  test("join vector is 203-wide") {
    val v = Encoder.encodeJoin(db,
      ColOp("employees", "dept"), ColOp("departments", "name"), noAlias)
    assert(v.length == 203)
  }

  test("LIKE operand encodes wildcards + letter-probability") {
    val v = Encoder.encodeOperand(db, "employees", "name",
      ConstOp(Const("'%abc%'")), noAlias)
    assert(v.length == 4 && v(0) == 1.0 && v(3) == 1.0 && v(2) > 0 && v(2) < 1)
  }

  test("summarize_set matches reference shape (v20/encoder.py:43-72)") {
    assert(Encoder.summarizeSet(Seq(5.0)).toSeq == Seq(1, 5, 5, 5, 5, 0, 0, 0))
    val s = Encoder.summarizeSet(Seq(1.0, 2.0, 3.0, 4.0))
    assert(s.length == 8 && s(0) == 4 && s(1) == 1 && s(2) == 4 && s(3) == 2.5 && s(4) == 2.5)
  }

  test("end-to-end query encode: node types and widths") {
    val tree = Encoder.encodeQuery(db,
      """SELECT MIN(e.id) FROM employees as e, departments as d
        |WHERE e.dept = d.id AND e.salary > 10""".stripMargin)
    val nodes = tree.preorder
    val widths = Map("relation" -> 63, "projection" -> 69, "selection" -> 112, "join" -> 203)
    nodes.foreach(n => assert(n.vector.length == widths(n.nodeType),
      s"node ${n.nodeType} has width ${n.vector.length}"))
    assert(nodes.map(_.nodeType).count(_ == "relation") == 2)
    assert(nodes.map(_.nodeType).count(_ == "join") == 1)
    assert(nodes.map(_.nodeType).count(_ == "selection") == 1)
  }

  test("cartesian queries are rejected (encoder parity, v20/encoder.py:751-752)") {
    intercept[IllegalArgumentException] {
      Encoder.encodeQuery(db, "SELECT e.id, d.name FROM employees as e, departments as d")
    }
  }
}
