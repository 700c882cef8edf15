package graft.gen

import scala.collection.mutable
import scala.util.{Random, Try}

import graft.model.DbModel

/** RL workload generation (dqo/query_generator/rl/): a gym-style
  * environment over [[QueryBuilder]] with 6 discrete actions, and a
  * SARSA agent with an ε-greedy per-target-bucket Q-table
  * (envs/db_env.py:25-187, agent.py:21-141). The Q-table is a plain 2-D
  * array — no framework needed.
  */
object DbEnv {
  /** Action space (db_env.py: 6 discrete actions). */
  val Actions: Vector[String] = Vector(
    "add_projection", "remove_projection", "add_condition",
    "remove_condition", "add_relation", "remove_relation")
}

final class DbEnv(db: DbModel, runner: String => Double,
                  partitioner: Log2Partitioner = new Log2Partitioner(),
                  maxEpisodeSteps: Int = 200, seed: Long = Random.nextLong()) {
  private val rng = new Rng(seed)
  private var qb = new QueryBuilder(db, rng.random.nextLong())
  private var rqg = new RandomQueryGen(db, rng.random.nextLong())
  var targetBucket: Int = 1
  private var stepsTaken = 0

  /** state = current runtime bucket of the query. */
  def reset(target: Int): Int = {
    targetBucket = target
    stepsTaken = 0
    qb = new QueryBuilder(db, rng.random.nextLong())
    rqg = new RandomQueryGen(db, rng.random.nextLong())
    qb.q = rqg.randomize()
    observe()._1
  }

  private def observe(): (Int, Double) = {
    val sql = qb.q.toSql(pretty = false, alias = false)
    val rt = Try(runner(sql)).getOrElse(0.001)
    (partitioner.partition(rt), rt)
  }

  /** reward = −log distance to target bucket, +1000 on hit, −10000 on
    * step-budget exhaustion (db_env.py:111-116,125-174).
    */
  def step(action: Int): (Int, Double, Boolean) = {
    stepsTaken += 1
    DbEnv.Actions(action) match {
      case "add_projection" => qb.addProjection()
      case "remove_projection" => qb.removeProjection()
      case "add_condition" => qb.addCondition()
      case "remove_condition" => qb.removeCondition()
      case "add_relation" => qb.addRelation()
      case "remove_relation" => qb.removeRelation()
    }
    val (bucket, _) = observe()
    val dist = math.abs(bucket - targetBucket)
    if (dist == 0) (bucket, 1000.0, true)
    else if (stepsTaken >= maxEpisodeSteps) (bucket, -10000.0, true)
    else (bucket, -math.log(dist + 1.0), false)
  }

  def currentSql: String = qb.q.toSql(pretty = false, alias = false)
}

/** Tabular SARSA with ε-greedy exploration (rl/agent.py:21-141). */
final class SarsaAgent(nStates: Int, nActions: Int = DbEnv.Actions.size,
                       alpha: Double = 0.1, gamma: Double = 0.9,
                       epsilon: Double = 0.2, seed: Long = Random.nextLong()) {
  private val rng = new Random(seed)
  val q: Array[Array[Double]] = Array.fill(nStates, nActions)(0.0)

  def chooseAction(state: Int): Int =
    if (rng.nextDouble() < epsilon) rng.nextInt(nActions)
    else q(state).zipWithIndex.maxBy(_._1)._2

  def update(s: Int, a: Int, reward: Double, s2: Int, a2: Int): Unit =
    q(s)(a) += alpha * (reward + gamma * q(s2)(a2) - q(s)(a))

  /** Episodic driver (rl/__init__.py:35-127): returns per-episode
    * (finalSql, totalReward, hit).
    */
  def train(env: DbEnv, episodes: Int, targetBucket: Int): Seq[(String, Double, Boolean)] =
    (1 to episodes).map { _ =>
      var s = math.min(env.reset(targetBucket), q.length - 1)
      var a = chooseAction(s)
      var total = 0.0
      var done = false
      var hit = false
      while (!done) {
        val (s2raw, r, d) = env.step(a)
        val s2 = math.min(s2raw, q.length - 1)
        val a2 = chooseAction(s2)
        update(s, a, r, s2, a2)
        total += r; s = s2; a = a2; done = d
        if (r >= 1000.0) hit = true
      }
      (env.currentSql, total, hit)
    }
}
