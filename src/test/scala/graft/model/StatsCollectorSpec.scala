package graft.model

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class StatsCollectorSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val li = {
    spark.sparkContext.setLogLevel("ERROR")
    StatsCollector.collectTable(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"), "lineitem", 12345L)
  }

  test("collects per-column counts, stats, histograms") {
    val rows = li.stats.get.rows
    assert(rows > 1000)
    val qty = li.columnsByName("l_quantity")
    assert(qty.dtype == DType.Float)
    val st = qty.stats.get
    assert(st.total == rows && st.nulls == 0 && st.distinct > 10)
    val num = st.numeric.get
    assert(num.min >= 1.0 && num.max <= 60.0 && num.mean > num.min && num.mean < num.max)
    assert(num.hist.size == StatsCollector.HistBuckets)
    assert(num.freq.sum == rows) // equi-width buckets cover [min, max+1)
    // string stats exist for returnflag
    val rf = li.columnsByName("l_returnflag").stats.get
    assert(rf.string.get.length.min == 1.0 && rf.string.get.length.max == 1.0)
    // time column measured as epoch seconds
    val sd = li.columnsByName("l_shipdate").stats.get.numeric.get
    assert(sd.min > 6e8 && sd.max < 1.1e9) // ~1995..2002 epoch range
    // key-convention index flags
    assert(li.columnsByName("l_orderkey").stats.get.index)
    assert(!li.columnsByName("l_quantity").stats.get.index)
  }

  test("JSON model round-trips exactly") {
    val db = DbModel(Seq(li))
    val json = ModelJson.toJson(db)
    // compare via JSON (case-class == is false under NaN skew/kurt fields)
    assert(ModelJson.toJson(ModelJson.fromJson(json)) == json)
  }

  test("approx mode stays within 5% on distinct counts") {
    val approx = StatsCollector.collectTable(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      "lineitem", 0L, exact = false)
    val e = li.columnsByName("l_partkey").stats.get.distinct.toDouble
    val a = approx.columnsByName("l_partkey").stats.get.distinct.toDouble
    assert(math.abs(a - e) / e < 0.05)
  }
}
