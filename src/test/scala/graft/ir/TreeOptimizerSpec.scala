package graft.ir

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference optimizer fixtures
  * (dqo/relational/tests/test_tree_optimzations.py) onto the Scala IR.
  */
class TreeOptimizerSpec extends AnyFunSuite {

  private def shape(p: RelPlan): String = p match {
    case _: RelationLeaf => "R"
    case Subquery(_, i) => s"A(${shape(i)})"
    case Filter(_: OrPred, c) => s"O(${shape(c)})"
    case Filter(_, c) => s"S(${shape(c)})"
    case JoinNode(_, _, _, l, r) => s"J(${shape(l)},${shape(r)})"
    case Project(_, _, c) => s"P(${shape(c)})"
    case CrossSet(bs) => s"X(${bs.map(shape).mkString(",")})"
  }

  private def cmpOf(op: String, value: String) =
    Cmp(op, ColOp("t", "a"), ConstOp(Const(value)))

  // --- merge truth table (test_tree_optimzations.py:37-88) -------------

  test("merge (a>1, a>10) -> a>10, merged") {
    val r = TreeOps.mergeSelections(cmpOf(">", "1"), cmpOf(">", "10"))
    assert(r.contains(cmpOf(">", "10")))
  }

  test("merge (a>1, a=10) -> a=10, merged") {
    val r = TreeOps.mergeSelections(cmpOf(">", "1"), cmpOf("=", "10"))
    assert(r.contains(cmpOf("=", "10")))
  }

  test("merge (a>10, a>1) -> a>10, merged") {
    val r = TreeOps.mergeSelections(cmpOf(">", "10"), cmpOf(">", "1"))
    assert(r.contains(cmpOf(">", "10")))
  }

  test("merge (a>=1, a<=1) -> a=1, merged") {
    val r = TreeOps.mergeSelections(cmpOf(">=", "1"), cmpOf("<=", "1"))
    assert(r.contains(cmpOf("=", "1")))
  }

  test("merge (a>1, a<1) -> not merged") {
    val r = TreeOps.mergeSelections(cmpOf(">", "1"), cmpOf("<", "1"))
    assert(r.isEmpty)
  }

  test("merge equal constants with = dedupes") {
    assert(TreeOps.mergeSelections(cmpOf("=", "5"), cmpOf("=", "5")).contains(cmpOf("=", "5")))
    assert(TreeOps.mergeSelections(cmpOf("=", "5"), cmpOf("=", "6")).isEmpty)
  }

  test("merge same-op LIKE keeps b (reference semantics)") {
    val a = Cmp("LIKE", ColOp("t", "a"), ConstOp(Const("'%x%'")))
    val b = Cmp("LIKE", ColOp("t", "a"), ConstOp(Const("'%y%'")))
    assert(TreeOps.mergeSelections(a, b).contains(b))
  }

  // --- pushdown fixtures ----------------------------------------------

  test("pushdown through subquery (test_tree_subselect_push_down_selection)") {
    val plan = Frontend.parseSql(
      """SELECT e.id, e.name
        |FROM (SELECT id, name FROM employees WHERE salary < 100) as e
        |WHERE id > 1""".stripMargin)
    assert(shape(TreeOps.optimize(plan)) == "P(A(P(S(S(R)))))")
  }

  test("pushdown below join (test_tree_selection_push_down_other)") {
    val plan = Frontend.parseSql(
      """SELECT e.id, e.name
        |FROM employees as e, departments as d
        |WHERE e.dept = d.id AND d.id < 10 AND e.id > 10""".stripMargin)
    assert(shape(TreeOps.optimize(plan)) == "P(J(S(R),S(R)))")
  }

  test("pushdown + merge into subquery (test_tree_selection_pushdown_merge)") {
    val plan = Frontend.parseSql(
      """SELECT e.id, e.name
        |FROM (SELECT id, name FROM employees WHERE 10 < id) as e,
        |     employees as b
        |WHERE e.id = b.id AND e.id > 1""".stripMargin)
    val opt = TreeOps.optimize(plan)
    assert(shape(opt) == "P(J(A(P(S(R))),R))")
    // the merged selection must keep the stronger bound id > 10
    val Project(_, _, JoinNode(_, _, _, Subquery(_, Project(_, _, Filter(c: Cmp, _))), _)) = opt
    assert(c == Cmp(">", ColOp("employees", "id"), ConstOp(Const("10"))))
  }

  test("pushdown through nested self-join subqueries (test_tree_selection_push_down_self)") {
    val plan = Frontend.parseSql(
      """SELECT m2.emp_name, m2.emp_salary, m2.man_name, m2.man_salary
        |FROM (
        |    SELECT e.name as emp_name, e.salary as emp_salary, m.name as man_name, m.salary as man_salary
        |    FROM employees as e,
        |        (SELECT id, name, salary FROM employees WHERE job = 'managers' AND active = TRUE) as m
        |    WHERE e.manager_id = m.id
        |) as m2
        |WHERE m2.emp_salary < 100 AND m2.man_salary > 100""".stripMargin)
    val opt = TreeOps.optimize(plan)
    // inner m-subquery accumulates 3 stacked selections; e side gets 1
    assert(shape(opt) == "P(A(P(J(A(P(S(S(S(R))))),S(R)))))" ||
           shape(opt) == "P(A(P(J(S(R),A(P(S(S(S(R)))))))))")
  }

  test("operand flip canonization: 10 < id becomes id > 10") {
    val plan = Frontend.parseSql("SELECT id FROM employees WHERE 10 < id")
    val Project(_, _, Filter(c: Cmp, _)) = plan
    assert(c == Cmp(">", ColOp("employees", "id"), ConstOp(Const("10"))))
  }

  test("canonize is idempotent") {
    val plan = Frontend.parseSql(
      """SELECT e.id FROM employees as e, departments as d, companies as c
        |WHERE e.dept = d.id AND d.company = c.id AND e.id > 5 AND c.name LIKE '%x%'""".stripMargin)
    val once = TreeOps.canonize(plan)
    assert(TreeOps.canonize(once) == once)
    assert(TreeOps.optimize(TreeOps.optimize(plan)) == TreeOps.optimize(plan))
  }

  // --- parser smoke on JOB-style shapes (test_ast.py) ------------------

  test("9-way comma join with mixed predicates parses and flattens") {
    val sql =
      """SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title
        |FROM company_type AS ct, info_type AS it, movie_companies AS mc,
        |     movie_info_idx AS mi_idx, title AS t
        |WHERE ct.kind = 'production companies' AND it.info = 'top 250 rank'
        |  AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
        |  AND mc.note LIKE '%(co-production)%'
        |  AND ct.id = mc.company_type_id AND t.id = mc.movie_id
        |  AND t.id = mi_idx.movie_id AND mc.movie_id = mi_idx.movie_id
        |  AND it.id = mi_idx.info_type_id""".stripMargin
    val plan = Frontend.parseSql(sql)
    val q = TreeOps.toQuery(TreeOps.optimize(plan))
    assert(q.relations.size == 5)
    assert(q.joins.size == 5)
    assert(q.conditions.size == 4)
    assert(q.valid)
  }

  test("BETWEEN desugars to two range predicates (ast.py:354-358 parity)") {
    val plan = Frontend.parseSql(
      "SELECT id FROM employees WHERE salary BETWEEN 10 AND 20")
    assert(shape(plan) == "P(S(S(R)))")
  }

  test("IN / IS NULL / OR parse") {
    val plan = Frontend.parseSql(
      """SELECT id FROM employees
        |WHERE dept IN ('a', 'b') AND (salary > 10 OR salary IS NULL)""".stripMargin)
    assert(shape(plan) == "P(O(S(R)))" || shape(plan) == "P(S(O(R)))")
  }

  // --- D2 permutations incl. selection chains (test_augmentation.py) ---

  private val leafA = RelationLeaf("employees", "e")
  private val leafB = RelationLeaf("departments", "d")
  private def cond(col: String, v: String) =
    Cmp(">", ColOp("e", col), ConstOp(Const(v)))
  private def preds(p: RelPlan): Seq[Pred] = p match {
    case Filter(pr, c) => pr +: preds(c)
    case JoinNode(_, _, _, l, r) => preds(l) ++ preds(r)
    case other => other.children.flatMap(preds)
  }

  test("3-condition chain yields all 3! orderings (test_augmentation.py:62-88)") {
    val t = Filter(cond("id", "1"), Filter(cond("salary", "100"),
      Filter(cond("age", "30"), leafA)))
    val perms = TreeOps.permutations(t, limit = 32)
    assert(perms.size == 6)
    assert(perms.distinct.size == 6) // all structurally different
    // all semantically the same: identical predicate multiset, same leaf
    perms.foreach { p =>
      assert(preds(p).toSet == preds(t).toSet && preds(p).size == 3)
    }
  }

  test("duplicate predicates collapse (multiset permutations)") {
    val t = Filter(cond("id", "1"), Filter(cond("id", "1"), leafA))
    assert(TreeOps.permutations(t, limit = 32).size == 1)
  }

  test("join swap composes with chain reorderings (test_augmentation.py:91-115)") {
    val chainSide = Filter(cond("id", "1"), Filter(cond("salary", "5"), leafA))
    val t = JoinNode("=", ColOp("e", "dept_id"), ColOp("d", "id"), chainSide, leafB)
    val perms = TreeOps.permutations(t, limit = 32)
    // 2 join orientations x (identity + 1 chain reordering) = 4
    assert(perms.size == 4)
    assert(perms.distinct.size == 4)
    perms.foreach(p => assert(preds(p).size == 2))
  }

  test("permutation limit caps chain blow-up") {
    val t = (1 to 6).foldLeft(leafA: RelPlan)((acc, i) =>
      Filter(cond(s"c$i", i.toString), acc))
    assert(TreeOps.permutations(t, limit = 16).size == 16)
  }
}
