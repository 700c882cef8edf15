package graft.gen

import scala.collection.mutable
import scala.util.{Random, Try}

import graft.model.DbModel

/** Feedback-guided and population-balanced workload generation
  * (dqo/query_generator/guided.py).
  *
  * [[GuidedQueryGen]] runs a control loop per target runtime bucket:
  * narrow when over target (add condition / drop projection / drop
  * relation), broaden when under (add projection/relation, drop
  * condition, replace join), stay inside (guided.py:119-177).
  * [[BalancedQueryGen]] maintains log2-bucket population counts and
  * always feeds the emptiest bucket, with round-robin generators and
  * patience-based eviction (guided.py:191-330).
  *
  * `runner` abstracts execution (SQL → seconds) — the Spark Executor in
  * production, a synthetic cost model in tests (FakeClient pattern,
  * dqo/db/clients/fake.py:8-41).
  */
final class GuidedQueryGen(
    db: DbModel,
    runner: String => Double,
    val target: (Double, Double),
    stopEarly: Boolean = false,
    maxSteps: Int = 100,
    seed: Long = Random.nextLong(),
    cb: (String, Double) => Unit = (_, _) => ()) {

  val qb = new QueryBuilder(db, seed)
  private val rqg = new RandomQueryGen(db, seed)
  private val rng = new Rng(seed ^ 0x5eed)
  private val mem = mutable.Map.empty[String, Double]
  var steps = 0

  def currentSql: String = qb.q.toSql(pretty = false, alias = false)

  def randomizeInitial(): Unit = { qb.q = rqg.randomize(); qb.sync() }

  def hit(runtime: Double): Boolean = target._1 <= runtime && runtime <= target._2

  def runQuery(): (Double, Boolean) = {
    val sql = currentSql
    val runtime = mem.getOrElseUpdate(sql, {
      val t = runner(sql); cb(sql, t); t
    })
    (runtime, hit(runtime))
  }

  private def narrow(): String = {
    val actions = mutable.Buffer[(String, () => Unit)]()
    if (qb.canRemoveProjection) actions += ("remove_projection" -> (() => qb.removeProjection()))
    if (qb.canRemoveRelation) actions += ("remove_relation" -> (() => qb.removeRelation()))
    actions += ("add_condition" -> (() => qb.addCondition()))
    val (name, f) = rng.choice(actions.toSeq); f(); name
  }

  private def broaden(): String = {
    val actions = mutable.Buffer[(String, () => Unit)]()
    if (qb.canAddProjection) actions += ("add_projection" -> (() => qb.addProjection()))
    if (qb.canAddRelation) actions += ("add_relation" -> (() => qb.addRelation()))
    if (qb.canRemoveCondition) actions += ("remove_condition" -> (() => qb.removeCondition()))
    if (qb.canReplaceJoin) actions += ("replace_join" -> (() => qb.replaceJoin()))
    if (actions.isEmpty) throw new IllegalStateException("no more options to broaden")
    val (name, f) = rng.choice(actions.toSeq); f(); name
  }

  private def stay(): String = {
    if (qb.canRemoveProjection) qb.removeProjection() else qb.addProjection()
    "stay"
  }

  def selectNextAction(runtime: Double): () => String =
    if (runtime > target._2) () => narrow()
    else if (runtime < target._1) () => broaden()
    else () => stay()

  /** One mutate→execute step (guided.py:170-177). */
  def step(prevRuntime: Double): (Double, String, Boolean) = {
    steps += 1
    val action = selectNextAction(prevRuntime)()
    val (runtime, isHit) = runQuery()
    val done = (stopEarly && isHit) || steps >= maxSteps
    (runtime, action, done)
  }

  /** Full guidance loop; returns (sql, runtime) hits observed. */
  def guide(): Seq[(String, Double)] = {
    randomizeInitial()
    val hits = mutable.Buffer.empty[(String, Double)]
    var (runtime, _) = runQuery()
    var done = false
    while (!done) {
      val r = Try(step(runtime))
      r.toOption match {
        case Some((rt, _, d)) =>
          runtime = rt
          if (hit(rt)) hits += ((currentSql, rt))
          done = d
        case None => done = true
      }
    }
    hits.toSeq
  }
}

/** Population balancing across log2 runtime buckets
  * (BalancedQueryGen, guided.py:191-330).
  */
final class BalancedQueryGen(
    db: DbModel,
    runner: String => Double,
    partitioner: Log2Partitioner = new Log2Partitioner(),
    patience: Int = 10,
    maxStepsPerGen: Int = 100,
    seed: Long = Random.nextLong()) {

  private val rng = new Rng(seed)
  // one slot per reachable partition() result (0 until k) — an extra
  // slot would stay 0 forever and pin emptiestPartition to it
  val counts: Array[Long] = Array.fill(partitioner.k)(0L)
  private val results = mutable.Buffer.empty[(String, Double)]

  private def emptiestPartition: Int = counts.zipWithIndex.minBy(_._1)._2

  private def record(sql: String, runtime: Double): Unit = {
    counts(math.min(partitioner.partition(runtime), counts.length - 1)) += 1
    results += ((sql, runtime))
  }

  /** Generate n measured queries, always targeting the emptiest bucket;
    * a generator that stalls in the same bucket `patience` times is
    * evicted and replaced (guided.py:295-330).
    */
  def generate(n: Int): Seq[(String, Double)] = {
    var produced = 0
    while (produced < n) {
      val target = partitioner.bounds(math.max(1, emptiestPartition))
      val gen = new GuidedQueryGen(db, runner, target, stopEarly = true,
        maxSteps = maxStepsPerGen, seed = rng.random.nextLong(),
        cb = (sql, rt) => record(sql, rt))
      val before = results.size
      Try(gen.guide())
      val got = results.size - before
      produced += math.max(got, 1) // evict-and-continue even on stall
    }
    results.toSeq
  }
}
