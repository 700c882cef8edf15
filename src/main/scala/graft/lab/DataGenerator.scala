package graft.lab

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** Statistics-faithful synthetic data generation + scaling
  * (dqo/lab/data_generator.py:37-241, drivers/ds.py:10-39, and the
  * reference's scale stub data_scaler.py:23-31 — implemented here for
  * real). Given a [[DbModel]], produce n rows per table whose per-column
  * null fraction, equi-width histogram, and string shape match the model.
  *
  * Scale design: generation is `spark.range(n)` + pure column
  * expressions — fully distributed, no driver data. Histogram fidelity
  * comes from inverse-CDF sampling: a uniform draw is mapped through the
  * cumulative bucket frequencies, then positioned uniformly inside the
  * chosen bucket. Seeded `rand(seed)` keeps output deterministic per
  * (table, column).
  */
object DataGenerator {

  private def seedFor(table: String, col: String): Long =
    (table + ":" + col).hashCode.toLong & 0x7fffffffL

  /** Inverse-CDF histogram sampling over pre-materialized uniform draws.
    * `u`/`inner` MUST be bound columns, not inline `rand()`: rand is
    * nondeterministic so Catalyst does not common-subexpression-eliminate
    * it — inlining would draw a fresh random per `when` branch and skew
    * the distribution (observed 40% mean drift before this fix).
    */
  private def histSample(n: NumericStats, u: Column, inner: Column): Column = {
    val total = math.max(1L, n.freq.sum).toDouble
    val cum = n.freq.scanLeft(0L)(_ + _).tail.map(_ / total)
    val lowers = n.min +: n.hist.dropRight(1)
    // pick the first bucket whose cumulative share covers u
    cum.indices.foldRight(lit(n.max): Column) { (i, els) =>
      val lo = lowers(i); val hi = n.hist(i)
      when(u <= cum(i), lit(lo) + inner * (hi - lo)).otherwise(els)
    }
  }


  /** String-kind inference (data_generator.py:100-216): classify a column
    * from its stats — Categorical (few distincts), Chars (fixed length),
    * Speech (multi-word), Pattern otherwise.
    */
  def inferStringKind(st: ColumnStats): String = {
    val words = st.string.map(_.word)
    val lens = st.string.map(_.length)
    if (st.distinct <= 64) "categorical"
    else if (lens.exists(l => l.min == l.max)) "chars"
    else if (words.exists(_.mean > 2.0)) "speech"
    else "pattern"
  }

  private def stringExpr(cm: ColumnModel, st: ColumnStats, u: Column, inner: Column): Column = {
    val lens = st.string.map(_.length).getOrElse(NumericStats(1, 8, 16, 0, 0, 0))
    inferStringKind(st) match {
      case "categorical" =>
        concat(lit(s"${cm.name}_"),
          floor(u * math.max(1, st.distinct)).cast("long").cast("string"))
      case _ =>
        // deterministic pseudo-words of a length drawn from the model
        val len = (lit(lens.min) + u * (lens.max - lens.min)).cast("int")
        val token = md5(concat(lit(cm.name), floor(inner * 1e9).cast("long").cast("string")))
        substring(concat(token, token, token), 1, 32).substr(lit(1), greatest(len, lit(1)))
    }
  }

  /** Generate one table of n rows matching the model's column stats. */
  def generateTable(spark: SparkSession, tm: TableModel, n: Long): DataFrame = {
    // stage 1: materialize every uniform draw once per row (see histSample)
    val draws: Seq[Column] = tm.columns.flatMap { cm =>
      val seed = seedFor(tm.name, cm.name)
      Seq(rand(seed).as(s"__u_${cm.name}"), rand(seed + 1).as(s"__i_${cm.name}"),
        rand(seed + 2).as(s"__n_${cm.name}"))
    }
    val base = spark.range(n).toDF("__id").select(col("__id") +: draws: _*)

    val cols: Seq[Column] = tm.columns.map { cm =>
      val st = cm.stats.getOrElse(ColumnStats(n, 0, n, index = false))
      val u = col(s"__u_${cm.name}"); val inner = col(s"__i_${cm.name}")
      val raw: Column = cm.dtype match {
        case DType.Number =>
          st.numeric match {
            case Some(ns) if ns.hist.nonEmpty =>
              // monotonic-id detection (data_generator.py:219-241): keys
              // with ~unique distincts become a dense sequence
              if (st.distinct >= (st.total * 0.95).toLong) col("__id")
              else histSample(ns, u, inner).cast("long")
            case Some(ns) => (lit(ns.min) + u * (ns.max - ns.min)).cast("long")
            case None => (u * 1000).cast("long")
          }
        case DType.Float =>
          st.numeric.map(ns =>
            if (ns.hist.nonEmpty) histSample(ns, u, inner)
            else lit(ns.min) + u * (ns.max - ns.min))
            .getOrElse(u * 1000)
        case DType.Time =>
          val ns = st.numeric.getOrElse(NumericStats(7e8, 8e8, 9e8, 0, 0, 0))
          timestamp_seconds(
            (if (ns.hist.nonEmpty) histSample(ns, u, inner)
             else lit(ns.min) + u * (ns.max - ns.min)).cast("long"))
        case DType.Bool => u < 0.5
        case DType.Str => stringExpr(cm, st, u, inner)
      }
      (if (st.nullsFraction <= 0) raw
       else when(col(s"__n_${cm.name}") < st.nullsFraction, lit(null)).otherwise(raw))
        .as(cm.name)
    }
    // shuffle row order so generated keys aren't physically sorted
    base.select(cols: _*).orderBy(rand(seedFor(tm.name, "__shuffle")))
  }

  /** Scale a whole database model by `factor` (the reference's
    * data_scaler stub, made real): row counts multiply, per-column
    * distributions hold.
    */
  def scale(spark: SparkSession, db: DbModel, factor: Double): Map[String, DataFrame] =
    db.tables.map { t =>
      val n = math.max(1L, (t.stats.map(_.rows).getOrElse(1000L) * factor).toLong)
      t.name -> generateTable(spark, t, n)
    }.toMap
}
