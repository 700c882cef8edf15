package graft.encode

import org.scalatest.funsuite.AnyFunSuite

import graft.ir._
import graft.model._

/** Value-level anchors for the gerelt kernel vectors behind the q62/q64
  * goldens. The driver pins those queries by CRC, and EncoderSpec pins
  * the widths — but a refactor that changed VALUES and re-pinned the
  * CRC would pass both. Every expected number here is hand-derived from
  * the encoding definitions (v20/encoder.py:230-276 column,
  * 406-463 relation, 466-543 selection/join) and this spec's own
  * fixture stats, independently of the encoder's output: if any entry
  * moves, the golden drift is semantic, not cosmetic.
  *
  * Fixture mirrors EncoderSpec's employees_db_w_meta numbers
  * (FIXTURES.md §1) so the anchored vectors are the ones the e2e
  * encode tests exercise.
  */
class EncoderAnchorSpec extends AnyFunSuite {

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
      Some(TableStats(100, 8192)))))

  private val noAlias = Map.empty[String, String]
  private def approx(got: Double, want: Double, what: String): Unit =
    assert(math.abs(got - want) < 1e-12, s"$what: got $got want $want")

  test("column 13-vector: every entry hand-derived from the fixture stats") {
    val v = Encoder.encodeColumn(db, "employees", "salary", noAlias)
    // [log10(total), distinct/total, nulls/total, size(Number), index,
    //  ln|var|, ln|skew|, ln|kurt|, onehot(float,time,bool,number,string)]
    approx(v(0), 6.0, "log10(1e6 rows)")
    approx(v(1), 0.1, "distinct ratio 100000/1e6")
    approx(v(2), 1e-5, "nulls fraction 10/1e6")
    approx(v(3), 0.2, "estimateSize(Number)")
    approx(v(4), 0.0, "no index")
    approx(v(5), math.log(0.1), "ln|variance=0.1|")
    approx(v(6), math.log(0.1), "ln|skewness=0.1|")
    approx(v(7), math.log(0.1), "ln|kurtosis=0.1|")
    assert(v.slice(8, 13).toSeq == Seq(0.0, 0.0, 0.0, 1.0, 0.0), "Number one-hot")
  }

  test("selection 112-vector: anchored entries across all six segments") {
    // layout: column 13 ++ relation 63 ++ hist 11 ++ freq 11 ++
    //         type one-hot 5 ++ op one-hot 5 ++ operand 4
    val v = Encoder.encodeSelection(db,
      Cmp(">", ColOp("employees", "salary"), ConstOp(Const("10"))), noAlias)
    assert(v.length == 112)
    // [0..12] the column vector itself
    assert(v.take(13).sameElements(
      Encoder.encodeColumn(db, "employees", "salary", noAlias)))
    // [13..68] relation summary: 7 per-column stats x 8-stat summary.
    // Stat 0 is distinctRatio; its set over employees' six columns is
    // {1.0, 0.1, 1e-4, 3e-6, 0.1, 2e-6} -> summary head (n, min, max)
    approx(v(13), 6.0, "summarizeSet n over 6 columns")
    approx(v(14), 2e-6, "min distinct ratio (active: 2/1e6)")
    approx(v(15), 1.0, "max distinct ratio (id)")
    // [69..73] ln type counts (string, number, float, bool, time):
    // employees = 4 strings, 1 number, 1 bool
    approx(v(69), math.log(4.0), "ln(4 string columns)")
    approx(v(70), 0.0, "ln(1 number column)")
    approx(v(72), 0.0, "ln(1 bool column)")
    // [74..75] table size: log10(rows), log10(pages * pageSize)
    approx(v(74), 6.0, "log10(1e6 rows)")
    approx(v(75), math.log10((80000000L / 8192L) * 8192.0), "log10 table bytes")
    // [76..86] ln histogram bounds: salary hist is 11,21,...,101
    // (equi-width over num(1,100)), padded to 11 with ln(1e-8)
    approx(v(76), math.log(11.0), "first hist bound")
    approx(v(85), math.log(101.0), "last hist bound")
    approx(v(86), math.log(1e-8), "hist pad")
    // [87..97] log10 frequencies: ten buckets of 100, pad log10(0.1)
    (87 to 96).foreach(i => approx(v(i), 2.0, s"log10(freq=100) at $i"))
    approx(v(97), -1.0, "freq pad log10(0.1)")
    // [98..102] column type one-hot (Number), [103..107] op one-hot (>)
    assert(v.slice(98, 103).toSeq == Seq(0.0, 0.0, 0.0, 1.0, 0.0))
    assert(v.slice(103, 108).toSeq == Seq(0.0, 0.0, 1.0, 0.0, 0.0))
    // [108..111] operand: 10 < first bound 11 -> bucket 0, so
    // adjusted = 1/10 - 0.5 and prob = 100/1000
    approx(v(108), 0.0, "no left wildcard")
    approx(v(109), 0.1 - 0.5, "adjusted value")
    approx(v(110), 0.1, "bucket probability")
    approx(v(111), 0.0, "no right wildcard")
  }

  test("join 203-vector: side layout and right-type one-hot anchored") {
    // layout: left side 99 (column 13 ++ relation 63 ++ hist 11 ++
    // freq 11 ++ index flag 1) ++ right side 99 ++ right type one-hot 5
    val v = Encoder.encodeJoin(db,
      ColOp("employees", "dept"), ColOp("departments", "id"), noAlias)
    assert(v.length == 203)
    assert(v.take(13).sameElements(
      Encoder.encodeColumn(db, "employees", "dept", noAlias)))
    approx(v(98), 0.0, "left index flag: employees.dept unindexed")
    assert(v.slice(99, 112).sameElements(
      Encoder.encodeColumn(db, "departments", "id", noAlias)))
    approx(v(197), 1.0, "right index flag: departments.id indexed")
    assert(v.slice(198, 203).toSeq == Seq(0.0, 0.0, 0.0, 1.0, 0.0),
      "right column (Number) one-hot")
  }

  test("encodeQuery assembles the SAME anchored kernel vectors (q62 form)") {
    val tree = Encoder.encodeQuery(db,
      """SELECT MIN(e.id) FROM employees as e, departments as d
        |WHERE e.dept = d.id AND e.salary > 10""".stripMargin)
    val nodes = tree.preorder
    val sel = nodes.filter(_.nodeType == "selection")
    assert(sel.size == 1)
    // the tree's selection node must be bit-identical to the directly
    // anchored kernel call — aliases resolved, nothing re-scaled
    assert(sel.head.vector.sameElements(Encoder.encodeSelection(db,
      Cmp(">", ColOp("e", "salary"), ConstOp(Const("10"))),
      Map("e" -> "employees", "d" -> "departments"))))
    val join = nodes.filter(_.nodeType == "join")
    assert(join.size == 1)
    assert(join.head.vector.length == 203)
  }
}
