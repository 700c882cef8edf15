package graft.gen

import scala.collection.mutable
import scala.util.Random

import graft.ir._
import graft.model._

/** Random workload generation (dqo/query_generator/__init__.py +
  * dqo/random_utils/__init__.py): seeded, schema/stats-driven query
  * synthesis. Pure driver-side Scala — only query EXECUTION touches
  * Spark.
  */
object Pref extends Enumeration {
  val Uniform, Left, Right = Value
}

final class Rng(seed: Long) {
  val random = new Random(seed)

  /** Triangular-weight choice (random_utils/__init__.py:20-38): Left
    * prefers early elements, Right late ones.
    */
  def chooseWithPreference[T](population: Seq[T], pref: Pref.Value): T = {
    val n = population.size
    require(n > 0, "empty population")
    val probs: Seq[Double] = pref match {
      case Pref.Uniform => Seq.fill(n)(1.0 / n)
      case Pref.Left =>
        val s = n * (n + 1) / 2.0
        (1 to n).map(i => (n - i + 1) / s)
      case Pref.Right =>
        val s = n * (n + 1) / 2.0
        (1 to n).map(i => i / s)
    }
    var r = random.nextDouble(); var i = 0
    while (i < n - 1 && r > probs(i)) { r -= probs(i); i += 1 }
    population(i)
  }

  def randintWithPreference(a: Int, b: Int, pref: Pref.Value): Int =
    chooseWithPreference(a to b, pref)

  def choice[T](population: Seq[T]): T = population(random.nextInt(population.size))
  def choices[T](population: Seq[T], k: Int): Seq[T] = Seq.fill(k)(choice(population))
}

object RandomConditions {

  val Operators = Seq(">", "<", "=", "!=")

  /** Random predicate for a column from its stats (rand_condition,
    * query_generator/__init__.py:24-54). Deviation (documented in SURVEY
    * §7 "hard parts" F5): TIME literals are emitted as ISO timestamps
    * (`TIMESTAMP 'yyyy-…'`) instead of the reference's
    * `to_timestamp(…)` — which its own parser could not read.
    */
  def randCondition(rng: Rng, table: TableModel, col: ColumnModel): Option[Condition] = {
    val ref = ColRef(col.name, TableRef(table.name))
    col.dtype match {
      case DType.Number | DType.Float =>
        val (mn, mx) = numRange(col).getOrElse((0.0, 1e4))
        val v = mn + rng.random.nextDouble() * (mx - mn)
        val text = if (col.dtype == DType.Number) math.round(v).toString else f"$v%.2f"
        Some(Condition(ref, Const(text), rng.choice(Operators)))
      case DType.Time =>
        val (mn, mx) = numRange(col).getOrElse((1.0, 1.7e9))
        val epoch = mn.toLong + (rng.random.nextDouble() * (mx - mn)).toLong
        val iso = java.time.LocalDateTime.ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
        Some(Condition(ref, Const(s"TIMESTAMP '$iso'"), rng.choice(Operators)))
      case DType.Str =>
        val letters = Seq.fill(3)(('a' + rng.random.nextInt(26)).toChar).mkString
        Some(Condition(ref, Const(s"'%$letters%'"), "LIKE"))
      case DType.Bool =>
        Some(Condition(ref, Const(rng.random.nextBoolean().toString), "="))
    }
  }

  private def numRange(col: ColumnModel): Option[(Double, Double)] =
    col.stats.flatMap(_.numeric).map(n => (n.min, n.max)).filter(p => !p._1.isNaN && !p._2.isNaN)
}

/** RandomQueryGen (query_generator/__init__.py:57-226): left-skewed table
  * count, type-compatible connected join chain + random extra joins,
  * bounded random predicates, MIN-wrapped projections.
  */
final class RandomQueryGen(db: DbModel, seed: Long = Random.nextLong()) {
  private val rng = new Rng(seed)

  def chooseJoinColumns(left: TableModel, right: TableModel): Option[(ColumnModel, ColumnModel)] = {
    val shared = left.typesLookup.keySet & right.typesLookup.keySet
    if (shared.isEmpty) None
    else {
      val t = rng.choice(shared.toSeq.sortBy(_.name))
      Some((rng.choice(left.typesLookup(t)), rng.choice(right.typesLookup(t))))
    }
  }

  private def ref(t: TableModel, c: ColumnModel): ColRef = ColRef(c.name, TableRef(t.name))

  def randomize(maxJoins: Int = 10, maxProjections: Int = 20,
                maxPredicates: Int = 30): Query = {
    val q = new Query()
    val k = rng.chooseWithPreference(1 until math.max(2, db.tables.size), Pref.Left)
    val subset = rng.choices(db.tables, k).distinct

    // connected join chain (randomize_joins, :94-131)
    if (subset.size > 1) {
      val joined = mutable.Buffer.empty[TableModel]
      val joinable = mutable.Buffer(subset: _*)
      while (joinable.nonEmpty) {
        val left =
          if (joined.nonEmpty) rng.choice(joined.toSeq)
          else { val l = joinable.remove(rng.random.nextInt(joinable.size)); joined += l; l }
        val right = joinable.remove(rng.random.nextInt(joinable.size))
        joined += right
        chooseJoinColumns(left, right).foreach { case (lc, rc) =>
          q.addJoin(ref(left, lc), ref(right, rc))
        }
      }
      // extra joins up to comb(n,2)
      val possible = subset.size * (subset.size - 1) / 2
      val extraCap = math.min(possible, maxJoins) - joined.size
      val extra = if (extraCap > 0) rng.random.nextInt(extraCap) else 0
      var i = 0; var guard = 0
      while (i < extra && guard < extra * 10) {
        guard += 1
        val Seq(a, b) = rng.choices(subset, 2)
        if (a.name != b.name && !q.areJoint(TableRef(a.name), TableRef(b.name))) {
          chooseJoinColumns(a, b).foreach { case (lc, rc) =>
            q.addJoin(ref(a, lc), ref(b, rc)); i += 1
          }
        }
      }
    }

    // predicates (randomize_selections, :133-150)
    val allCols = subset.flatMap(t => t.columns.map(t -> _))
    val nSel = math.min(rng.random.nextInt(math.max(1, allCols.size)), maxPredicates)
    rng.choices(allCols, nSel).foreach { case (t, c) =>
      RandomConditions.randCondition(rng, t, c).foreach(q.addCondition)
    }

    // MIN projections (randomize_projections, :152-155; MIN-wrapping
    // keeps result sets single-row so queries measure scan/join cost)
    val nProj = rng.randintWithPreference(1, math.max(1, math.min(maxProjections, allCols.size)),
      Pref.Left)
    rng.choices(allCols, nProj).distinct.foreach { case (t, c) =>
      q.addProjection(Projection(ref(t, c), Some("MIN")))
    }
    q
  }
}

/** Log2 runtime partitioner (rl/partitioner.py:31-53): buckets 1s..2^8s. */
final class Log2Partitioner(minValue: Double = 1.0, maxValue: Double = 256.0) {
  val k: Int = (math.log(maxValue) / math.log(2)).toInt -
    (math.log(minValue) / math.log(2)).toInt + 1

  def partition(value: Double): Int =
    if (value <= minValue) 0
    else if (value > maxValue) (math.log(maxValue) / math.log(2)).toInt
    else (math.log(value) / math.log(2)).toInt

  def bounds(p: Int): (Double, Double) = {
    require(p >= 0 && p <= k, s"invalid partition $p")
    (math.pow(2, p - 1), math.pow(2, p))
  }
}
