package graft.plans

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native kernel must stay bit-identical to the composed decimal
  * fold it replaced — the DuckDB oracle reproduces the composed form.
  */
class DecimalDotSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("native DecimalDotProduct == composed aggregate(zip_with(cast)) fold") {
    import spark.implicits._
    val rng = new Random(7)
    val rows = (1 to 500).map { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val composed = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(20,12)")),
      lit(0).cast("decimal(30,12)"),
      (acc, x) => (acc + x).cast("decimal(30,12)"))
    val out = df.select(col("id"),
      graft.ops.Similarity.dotDecimal(col("a"), col("b")).as("native"),
      composed.as("composed")).collect()
    out.foreach { r =>
      assert(r.getDecimal(1) == r.getDecimal(2),
        s"id=${r.getLong(0)}: native=${r.getDecimal(1)} composed=${r.getDecimal(2)}")
    }
  }
}
