package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Split/sample assignments must be deterministic, partition-independent
  * functions of (salt, stratum, id) — the properties that make them safe
  * to recompute across runs and engines.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def corpus = {
    import spark.implicits._
    (1 to 2000).map(i => (i.toLong, s"lang${i % 5}")).toDF("id", "lang")
  }

  test("deterministicSplit is stable under repartitioning and near target rates") {
    val a = Sampling.deterministicSplit(corpus, "id", "lang", 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.deterministicSplit(corpus.repartition(13), "id", "lang", 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b, "split changed under repartition")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.80) < 0.05, s"train=${frac("train")}")
    assert(math.abs(frac("valid") - 0.10) < 0.03, s"valid=${frac("valid")}")
    // per-stratum rates hold too (stratification, not just global rate)
    val perLang = Sampling.deterministicSplit(corpus, "id", "lang", 80, 10)
      .groupBy("lang").agg(
        (sum(when(col("split") === "train", 1).otherwise(0)) / count(lit(1))).as("tr"))
      .collect().map(_.getDouble(1))
    perLang.foreach(tr => assert(math.abs(tr - 0.80) < 0.08, s"stratum train=$tr"))
  }

  test("different salts give independent splits") {
    val a = Sampling.deterministicSplit(corpus, "id", "lang", 50, 0, salt = "s1")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.deterministicSplit(corpus, "id", "lang", 50, 0, salt = "s2")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val agree = a.count { case (k, v) => b(k) == v } / 2000.0
    assert(agree > 0.35 && agree < 0.65, s"salts not independent: agree=$agree")
  }

  test("stratifiedSample returns exactly m rows per stratum, deterministically") {
    val s1 = Sampling.stratifiedSample(corpus, "id", "lang", 7)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val s2 = Sampling.stratifiedSample(corpus.repartition(9), "id", "lang", 7)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(s1 == s2)
    val perStratum = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perStratum.values.forall(_ == 7), s"$perStratum")
    assert(perStratum.keySet.size == 5)
  }
}
