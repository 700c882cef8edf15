package graft.gen

import org.scalatest.funsuite.AnyFunSuite

import graft.ir._
import graft.model._

class GeneratorSpec extends AnyFunSuite {

  private def num(mn: Double, mx: Double) =
    NumericStats(mn, (mn + mx) / 2, mx, 1, 0, 0)

  private def col(name: String, t: DType) = ColumnModel(name, t,
    Some(ColumnStats(1000, 0, 100, index = name == "id",
      if (t == DType.Str || t == DType.Bool) None else Some(num(1, 100)),
      if (t == DType.Str) Some(StringStats(num(1, 20), num(1, 3))) else None)))

  val db: DbModel = DbModel(Seq(
    TableModel("employees", Seq(col("id", DType.Number), col("salary", DType.Number),
      col("dept", DType.Number), col("name", DType.Str), col("active", DType.Bool),
      col("hired", DType.Time)), Some(TableStats(1000, 8192))),
    TableModel("departments", Seq(col("id", DType.Number), col("name", DType.Str)),
      Some(TableStats(100, 8192))),
    TableModel("companies", Seq(col("id", DType.Number), col("name", DType.Str)),
      Some(TableStats(3, 8192)))))

  test("seeded RandomQueryGen is deterministic and valid") {
    val a = new RandomQueryGen(db, seed = 1).randomize()
    val b = new RandomQueryGen(db, seed = 1).randomize()
    assert(a.toSql(pretty = false) == b.toSql(pretty = false))
    assert(a.valid, a.toSql())
    assert(a.projections.nonEmpty && a.projections.forall(_.func.contains("MIN")))
  }

  test("100 random queries: all valid, shapes within caps") {
    (1 to 100).foreach { s =>
      val q = new RandomQueryGen(db, seed = s).randomize()
      assert(q.valid, s"seed $s: ${q.toSql()}")
      assert(q.joins.size <= 10 && q.conditions.size <= 30 && q.projections.size <= 20)
    }
  }

  test("preference sampling is left-skewed") {
    val rng = new Rng(7)
    val picks = (1 to 2000).map(_ => rng.chooseWithPreference(1 to 10, Pref.Left))
    val low = picks.count(_ <= 3).toDouble / picks.size
    assert(low > 0.4, s"left preference should overweight small values, got $low")
  }

  test("QueryBuilder mutations preserve validity; undo restores") {
    val qb = new QueryBuilder(db, seed = 5)
    qb.q = new RandomQueryGen(db, seed = 5).randomize()
    val before = qb.q.toSql(pretty = false)
    qb.addCondition()
    assert(qb.q.toSql(pretty = false) != before || qb.q.conditions.isEmpty)
    assert(qb.undo())
    assert(qb.q.toSql(pretty = false) == before)
    (1 to 30).foreach { _ =>
      qb.addProjection(); qb.addCondition()
      if (qb.canRemoveCondition) qb.removeCondition()
      assert(qb.q.valid, qb.q.toSql())
    }
  }

  test("jenga relation removal cascades") {
    val qb = new QueryBuilder(db, seed = 11)
    qb.q = new RandomQueryGen(db, seed = 11).randomize()
    while (qb.q.relations.size < 2) { qb.addRelation() }
    val before = qb.q.relations.size
    qb.removeRelation()
    assert(qb.q.relations.size < before)
    assert(qb.q.valid || qb.q.projections.isEmpty)
  }

  /** Synthetic cost model standing in for execution (FakeClient pattern):
    * more relations/projections → slower; more conditions → faster.
    */
  private def fakeRunner(sql: String): Double = {
    val rels = sql.split("FROM")(1).split("WHERE")(0).count(_ == ',') + 1
    val conds = if (sql.contains("WHERE")) sql.split("WHERE")(1).split(" AND ").length else 0
    math.pow(2.0, rels + 1.0 - conds * 0.4)
  }

  test("guided generator steers toward the target bucket") {
    val gen = new GuidedQueryGen(db, fakeRunner, target = (1.0, 4.0),
      stopEarly = true, maxSteps = 60, seed = 3)
    val hits = gen.guide()
    assert(gen.steps <= 60)
    hits.foreach { case (_, rt) => assert(rt >= 1.0 && rt <= 4.0) }
  }

  test("balanced generator fills bucket counts") {
    val bal = new BalancedQueryGen(db, fakeRunner, patience = 5,
      maxStepsPerGen = 30, seed = 9)
    val out = bal.generate(20)
    assert(out.size >= 10)
    assert(bal.counts.sum == out.size)
  }

  test("killed+resumed balanced campaign reproduces the uninterrupted population") {
    val straight = new BalancedQueryGen(db, fakeRunner, patience = 5,
      maxStepsPerGen = 30, seed = 21)
    val full = straight.generate(30)

    val killed = new BalancedQueryGen(db, fakeRunner, patience = 5,
      maxStepsPerGen = 30, seed = 21)
    killed.generate(8) // campaign dies here
    val cp = BalancedCheckpoint.deserialize(killed.checkpoint.serialize)
    val resumed = BalancedCheckpoint.restore(cp, db, fakeRunner, patience = 5,
      maxStepsPerGen = 30)
    val continued = resumed.generate(30)

    assert(continued == full, "resumed population must equal the straight run")
    assert(resumed.counts.toSeq == straight.counts.toSeq)
  }

  test("checkpoint serialization round-trips all campaign state") {
    val gen = new BalancedQueryGen(db, fakeRunner, patience = 5,
      maxStepsPerGen = 30, seed = 33)
    gen.generate(10)
    val cp = gen.checkpoint
    assert(BalancedCheckpoint.deserialize(cp.serialize) == cp)
    assert(cp.results.nonEmpty && cp.counts.sum == cp.results.size)
    // the compute-budget header survives serialize/deserialize (it is
    // what CheckpointMerge's comparability check reads), and its absence
    // decodes as None for pre-round-10 files
    val stamped = cp.copy(budget = Some("x160_c2"))
    assert(BalancedCheckpoint.deserialize(stamped.serialize) == stamped)
    assert(BalancedCheckpoint.deserialize(cp.serialize).budget.isEmpty)
  }

  test("restore refuses a merged (non-resumable) checkpoint") {
    val gen = new BalancedQueryGen(db, fakeRunner, patience = 5,
      maxStepsPerGen = 30, seed = 34)
    gen.generate(5)
    // CheckpointMerge marks merged training-only files iterations = -1;
    // resuming one would continue a seed stream matching no campaign
    val merged = gen.checkpoint.copy(iterations = -1)
    intercept[IllegalArgumentException] {
      BalancedCheckpoint.restore(merged, db, fakeRunner)
    }
  }

  test("guided generator can be seeded from a checkpointed query") {
    val gen = new GuidedQueryGen(db, fakeRunner, target = (1.0, 64.0),
      stopEarly = true, maxSteps = 10, seed = 5)
    val sql = "SELECT MIN(e.salary) FROM employees AS e WHERE e.salary > 10"
    gen.seedQuery(sql)
    gen.randomizeInitial() // must NOT overwrite the seeded query
    assert(gen.currentSql.toLowerCase.contains("employees"))
    assert(gen.qb.q.conditions.nonEmpty)
  }

  test("every balanced-gen target bucket is reachable by partition()") {
    val p = new Log2Partitioner()
    val bal = new BalancedQueryGen(db, fakeRunner, partitioner = p, seed = 9)
    // counts must have exactly one slot per value partition() can produce,
    // else the unreachable slot stays 0 and pins every target to it
    val reachable = (0 to 20).map(e => p.partition(math.pow(2.0, e - 1.0) * 1.5))
      .toSet ++ Set(p.partition(0.1))
    assert(bal.counts.indices.toSet == reachable)
  }

  test("log2 partitioner bounds (rl/partitioner.py:31-53)") {
    val p = new Log2Partitioner()
    assert(p.k == 9)
    assert(p.partition(0.5) == 0 && p.partition(3.0) == 1 && p.partition(300.0) == 8)
    assert(p.bounds(3) == (4.0, 8.0))
  }

  test("SARSA agent trains and records Q-values") {
    val env = new DbEnv(db, fakeRunner, maxEpisodeSteps = 30, seed = 13)
    val agent = new SarsaAgent(nStates = 10, seed = 13)
    val episodes = agent.train(env, episodes = 5, targetBucket = 2)
    assert(episodes.size == 5)
    assert(agent.q.exists(_.exists(_ != 0.0)))
  }
}
