package graft.ir

import org.scalatest.funsuite.AnyFunSuite

/** Flat Query layer: canonical SQL emission, validity, round-trip
  * (ports dqo/relational/tests/test_query.py behaviors).
  */
class QuerySpec extends AnyFunSuite {

  private def sampleQuery(): Query = {
    val q = new Query()
    val emp = TableRef("employees")
    val dep = TableRef("departments")
    q.addJoin(ColRef("dept", emp), ColRef("id", dep))
    q.addCondition(Condition(ColRef("salary", emp), Const("100"), ">"))
    q.addProjection(Projection(ColRef("name", emp), Some("MIN")))
    q
  }

  test("toSql emits sorted relations with t1..tn aliases") {
    val sql = sampleQuery().toSql(pretty = false)
    assert(sql == "SELECT MIN(t2.name) FROM departments as t1, employees as t2 " +
      "WHERE t2.salary > 100 AND t2.dept = t1.id")
  }

  test("valid: connected join graph passes, orphan relation fails") {
    val q = sampleQuery()
    assert(q.valid)
    q.addProjection(Projection(ColRef("name", TableRef("companies"))))
    assert(!q.valid) // companies not joined to anything
  }

  test("single relation without joins is valid") {
    val q = new Query()
    q.addProjection(Projection(ColRef("id", TableRef("employees"))))
    assert(q.valid)
  }

  test("empty / projection-less queries invalid") {
    val q = new Query()
    assert(!q.valid)
    q.addCondition(Condition(ColRef("id", TableRef("t")), Const("1"), "="))
    assert(!q.valid)
  }

  test("remove join cascades dangling relations") {
    val q = sampleQuery()
    val j = q.joins.head
    val removed = q.removeJoin(j)
    assert(removed.map(_.name) == Seq("departments"))
    assert(q.relations.map(_.name).toSet == Set("employees"))
  }

  test("toSql -> parse -> toQuery round-trips the fingerprint") {
    val q = sampleQuery()
    val sql = q.toSql(pretty = false)
    val q2 = TreeOps.toQuery(Frontend.parseSql(sql))
    val q3 = TreeOps.toQuery(Frontend.parseSql(q2.toSql(pretty = false)))
    assert(q2.fingerprint == q3.fingerprint)
    assert(q2.relations.map(_.name) == q.relations.map(_.name))
    assert(q2.joins.size == 1 && q2.conditions.size == 1)
  }

  test("join graph pathfinding (tree/__init__.py:414-445)") {
    val g = new JoinGraph
    g.addJoin("a", "x", "b", "y")
    g.addJoin("b", "z", "c", "w")
    g.addJoin("d", "k", "c", "m")
    assert(g.getPath("a", "c").contains(Seq("a", "b", "c")))
    assert(g.getPath("a", "d").contains(Seq("a", "b", "c", "d")))
    assert(g.getPath("a", "zz").isEmpty)
    assert(g.getJoins("a", "b") == Seq(("x", "y")))
  }
}
