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
  private var seeded = false
  var steps = 0

  def currentSql: String = qb.q.toSql(pretty = false, alias = false)

  def randomizeInitial(): Unit =
    if (!seeded) { qb.q = rqg.randomize(); qb.sync() }

  /** Start from a checkpointed query instead of a random one
    * (load_checkpoint requeue, guided.py:233-260: `gqg.qb.q = query;
    * gqg.qb.sync()`).
    */
  def seedQuery(sql: String): Unit = {
    qb.q = graft.ir.TreeOps.toQuery(graft.ir.Frontend.parseSql(sql, Some(db)))
    qb.sync()
    seeded = true
  }

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

  // one slot per reachable partition() result (0 until k) — an extra
  // slot would stay 0 forever and pin emptiestPartition to it
  val counts: Array[Long] = Array.fill(partitioner.k)(0L)
  private val results = mutable.Buffer.empty[(String, Double)]
  private var iterations = 0
  private var produced = 0
  private var lastSql: Option[String] = None

  /** Per-iteration generator seed as a pure function of (campaign seed,
    * iteration index) — splitmix64 — so a campaign restored from a
    * checkpoint draws the exact seeds the uninterrupted run would.
    * (The reference's load_checkpoint drops its RNG state and admits the
    * re-targeting is lossy, guided.py:246; a deterministic stream makes
    * kill+resume reproducible instead.)
    */
  private def seedFor(i: Int): Long = {
    var z = seed + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def emptiestPartition: Int = counts.zipWithIndex.minBy(_._1)._2

  private def record(sql: String, runtime: Double): Unit = {
    counts(math.min(partitioner.partition(runtime), counts.length - 1)) += 1
    results += ((sql, runtime))
    lastSql = Some(sql)
  }

  /** Generate n measured queries, always targeting the emptiest bucket;
    * a generator that stalls in the same bucket `patience` times is
    * evicted and replaced (guided.py:295-330).
    */
  def generate(n: Int): Seq[(String, Double)] = {
    while (produced < n) {
      val target = partitioner.bounds(math.max(1, emptiestPartition))
      val gen = new GuidedQueryGen(db, runner, target, stopEarly = true,
        maxSteps = maxStepsPerGen, seed = seedFor(iterations),
        cb = (sql, rt) => record(sql, rt))
      iterations += 1
      val before = results.size
      Try(gen.guide())
      val got = results.size - before
      produced += math.max(got, 1) // evict-and-continue even on stall
    }
    results.toSeq
  }

  private[gen] def restoreState(iters: Int, prod: Int,
                                res: Seq[(String, Double)],
                                last: Option[String]): Unit = {
    iterations = iters
    produced = prod
    results.clear(); results ++= res
    lastSql = last
  }

  /** In-flight campaign state (save_checkpoint, guided.py:263-266 —
    * extended with the population counters the reference's TODO notes it
    * loses).
    */
  def checkpoint: BalancedCheckpoint =
    BalancedCheckpoint(seed, iterations, produced, counts.toSeq, results.toSeq, lastSql)
}

/** Serializable in-flight state of a [[BalancedQueryGen]] campaign.
  *
  * `budget` identifies the COMPUTE BUDGET the runtimes were measured
  * under (e.g. `"x160_c2"` — scale factor and core count): runtime
  * labels are only comparable within one budget, and before this field
  * that invariant lived solely in the checkpoint's FILENAME, so a
  * rename could silently mix incomparable labels. [[graft.tools
  * .CheckpointMerge]] refuses to merge checkpoints whose recorded
  * budgets differ. Absent on pre-round-10 files (decoded as None).
  */
final case class BalancedCheckpoint(
    seed: Long, iterations: Int, produced: Int,
    counts: Seq[Long], results: Seq[(String, Double)], lastSql: Option[String],
    budget: Option[String] = None) {

  /** One line per measured query, runtime TAB sql, after a header —
    * the reference's one-SQL-per-line file with the counters prepended.
    */
  def serialize: String = {
    val header = s"seed=$seed\titerations=$iterations\tproduced=$produced" +
      budget.map(b => s"\tbudget=$b").getOrElse("")
    val countsLine = counts.mkString(",")
    val inflight = lastSql.getOrElse("")
    (Seq(header, countsLine, inflight) ++
      results.map { case (sql, rt) => s"$rt\t$sql" }).mkString("\n")
  }
}

object BalancedCheckpoint {

  def deserialize(text: String): BalancedCheckpoint = {
    val lines = text.split("\n", -1).toSeq
    val kv = lines.head.split("\t").map { p =>
      val Array(k, v) = p.split("=", 2); k -> v
    }.toMap
    val counts =
      if (lines(1).isEmpty) Seq.empty[Long] else lines(1).split(",").toSeq.map(_.toLong)
    val lastSql = if (lines(2).isEmpty) None else Some(lines(2))
    val results = lines.drop(3).filter(_.nonEmpty).map { l =>
      val Array(rt, sql) = l.split("\t", 2)
      (sql, rt.toDouble)
    }
    BalancedCheckpoint(kv("seed").toLong, kv("iterations").toInt,
      kv("produced").toInt, counts, results, lastSql, kv.get("budget"))
  }

  /** Rebuild a campaign mid-flight: counters, measured population and the
    * deterministic seed position all restored, so `generate` continues
    * exactly where the killed campaign stopped (load_checkpoint,
    * guided.py:233-260).
    */
  def restore(cp: BalancedCheckpoint, db: DbModel, runner: String => Double,
              partitioner: Log2Partitioner = new Log2Partitioner(),
              patience: Int = 10, maxStepsPerGen: Int = 100): BalancedQueryGen = {
    // a merged checkpoint (CheckpointMerge stamps iterations = -1) is
    // TRAINING-ONLY: its results are a concatenation of several streams,
    // so resuming with the header's seed would continue a seed stream
    // that matches no campaign — refuse instead of silently generating
    require(cp.iterations >= 0,
      "checkpoint is not resumable (iterations < 0 marks a merged, " +
        "training-only checkpoint)")
    val gen = new BalancedQueryGen(db, runner, partitioner, patience,
      maxStepsPerGen, cp.seed)
    cp.counts.zipWithIndex.foreach { case (c, i) => gen.counts(i) = c }
    gen.restoreState(cp.iterations, cp.produced, cp.results, cp.lastSql)
    gen
  }
}
