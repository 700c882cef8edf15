package graft.ir

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks from the SURVEY §5 test plan (seeded exhaustive
  * sampling; the scalatest/scalacheck bridge is not on the offline
  * classpath): the sound subset of the predicate-merge algebra preserves
  * satisfaction, and canonization/optimization are idempotent fixpoints
  * over generated queries.
  */
class MergePropertiesSpec extends AnyFunSuite {

  private val rng = new Random(42)
  private val ops = Seq(">", ">=", "<", "<=")

  private def sat(op: String, bound: Double, x: Double): Boolean = op match {
    case ">" => x > bound
    case ">=" => x >= bound
    case "<" => x < bound
    case "<=" => x <= bound
    case "=" => x == bound
  }

  private def cmp(op: String, v: Double) =
    Cmp(op, ColOp("t", "a"), ConstOp(Const(v.toLong.toString)))

  test("same-operator merges preserve satisfaction (sound subset, 4000 cases)") {
    for (_ <- 1 to 1000) {
      val op = ops(rng.nextInt(4))
      val v1 = rng.nextInt(101) - 50.0
      val v2 = rng.nextInt(101) - 50.0
      TreeOps.mergeSelections(cmp(op, v1), cmp(op, v2)).foreach { merged =>
        val ConstOp(c) = merged.operand
        for (x <- Seq(v1 - 1, v1, v2, v2 + 1)) {
          assert(sat(merged.op, c.text.toDouble, x) == (sat(op, v1, x) && sat(op, v2, x)),
            s"merge($op $v1, $op $v2) -> ${merged.op} ${c.text} wrong at x=$x")
        }
      }
    }
  }

  test("equality dominance merges preserve satisfaction") {
    for (_ <- 1 to 1000) {
      val op = if (rng.nextBoolean()) ">=" else "<="
      val bound = rng.nextInt(101) - 50.0
      val eq = rng.nextInt(101) - 50.0
      TreeOps.mergeSelections(cmp("=", eq), cmp(op, bound)).foreach { merged =>
        val ConstOp(c) = merged.operand
        for (x <- Seq(eq - 1, eq, eq + 1, bound)) {
          assert(sat(merged.op, c.text.toDouble, x) == (sat("=", eq, x) && sat(op, bound, x)))
        }
      }
    }
  }

  test("'!=' merges only on exact duplicates (outside the interval algebra)") {
    for (_ <- 1 to 500) {
      val v1 = rng.nextInt(21) - 10.0
      val v2 = rng.nextInt(21) - 10.0
      val r = TreeOps.mergeSelections(cmp("!=", v1), cmp("!=", v2))
      if (v1 == v2) assert(r.exists(m => m.op == "!=")) else assert(r.isEmpty,
        s"!=$v1 and !=$v2 must both survive, got $r")
      // mixed '!=' with any interval op must never merge (x!=5 AND x>=5 is x>5)
      val other = (ops :+ "=")(rng.nextInt(5))
      assert(TreeOps.mergeSelections(cmp("!=", v1), cmp(other, v2)).isEmpty)
      assert(TreeOps.mergeSelections(cmp(other, v2), cmp("!=", v1)).isEmpty)
    }
  }

  test(">= and <= of the same constant merge to equality") {
    for (v <- -50 to 50) {
      val r = TreeOps.mergeSelections(cmp(">=", v), cmp("<=", v))
      assert(r.exists(_.op == "="), s"v=$v")
    }
  }

  test("canonize/optimize idempotence + round-trip fixpoint over 150 generated queries") {
    import graft.model._
    def col(name: String, t: DType) = ColumnModel(name, t,
      Some(ColumnStats(100, 0, 10, index = false,
        if (t == DType.Str) None else Some(NumericStats(1, 5, 9, 1, 0, 0)),
        if (t == DType.Str) Some(StringStats(NumericStats(1, 5, 9, 1, 0, 0),
          NumericStats(1, 2, 3, 0, 0, 0))) else None)))
    val db = DbModel(Seq(
      TableModel("ta", Seq(col("id", DType.Number), col("x", DType.Float),
        col("s", DType.Str))),
      TableModel("tb", Seq(col("id", DType.Number), col("y", DType.Float))),
      TableModel("tc", Seq(col("id", DType.Number), col("z", DType.Str)))))
    var checked = 0
    for (seed <- 1 to 150) {
      val q = new graft.gen.RandomQueryGen(db, seed).randomize()
      if (q.valid) {
        checked += 1
        val sql = q.toSql(pretty = false)
        val plan = Frontend.parseSql(sql, Some(db))
        assert(TreeOps.canonize(TreeOps.canonize(plan)) == TreeOps.canonize(plan), s"seed $seed")
        assert(TreeOps.optimize(TreeOps.optimize(plan)) == TreeOps.optimize(plan), s"seed $seed")
        // round-trip stability: flatten → SQL → parse → flatten is a fixpoint
        val q2 = TreeOps.toQuery(TreeOps.optimize(plan))
        val q3 = TreeOps.toQuery(
          TreeOps.optimize(Frontend.parseSql(q2.toSql(pretty = false), Some(db))))
        assert(q2.fingerprint == q3.fingerprint, s"seed $seed:\n${q2.fingerprint}\n${q3.fingerprint}")
      }
    }
    assert(checked > 100, s"only $checked valid queries generated")
  }
}
