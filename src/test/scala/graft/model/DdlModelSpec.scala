package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** DDL → schema model (postgres.py:514-539 semantics, Catalyst grammar). */
class DdlModelSpec extends AnyFunSuite {

  test("parses multi-statement DDL into a typed model") {
    val db = DdlModel.fromCreateCommands(
      """CREATE TABLE emp (id BIGINT, name VARCHAR(10), salary DOUBLE,
        |                  hired TIMESTAMP, active BOOLEAN);
        |CREATE TABLE dept (id INT, label CHAR(4));
        |DROP TABLE old_stuff;
        |""".stripMargin)
    assert(db.tables.map(_.name) == Seq("emp", "dept"))
    val emp = db.table("emp")
    assert(emp.columns.map(c => c.name -> c.dtype) == Seq(
      "id" -> DType.Number, "name" -> DType.Str, "salary" -> DType.Float,
      "hired" -> DType.Time, "active" -> DType.Bool))
    assert(db.table("dept").columns.map(_.dtype) == Seq(DType.Number, DType.Str))
    // stats-less: usable for generation/encoding shapes, not estimates
    assert(emp.columns.forall(_.stats.isEmpty))
  }

  test("unparseable statements and unsupported types are skipped") {
    val db = DdlModel.fromCreateCommands(
      "CREATE TABLE t (a INT, blob BINARY, tags ARRAY<STRING>); not sql at all;")
    assert(db.tables.map(_.name) == Seq("t"))
    assert(db.table("t").columns.map(_.name) == Seq("a"))
  }

  test("a DDL model drives the random generator end-to-end") {
    val db = DdlModel.fromCreateCommands(
      """CREATE TABLE orders (o_id BIGINT, o_total DOUBLE, o_flag STRING);
        |CREATE TABLE lines (l_id BIGINT, l_oid BIGINT, l_qty DOUBLE)""".stripMargin)
    val q = new graft.gen.RandomQueryGen(db, seed = 3).randomize()
    assert(q.relations.nonEmpty)
    assert(q.toSql(pretty = false).toUpperCase.contains("SELECT"))
  }
}
