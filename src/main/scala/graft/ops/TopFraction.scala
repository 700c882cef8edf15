package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe "top fraction by score" selection (the reference's
  * top-20%-by-runtime labeling cut, dqo/lab/augment.py:18-21).
  *
  * A naive `ROW_NUMBER() OVER (ORDER BY score DESC)` moves the whole table
  * into ONE window partition (Spark logs `WindowExec: No Partition
  * Defined`) — correct at sf0.1, dead at 100 TB. This implementation keeps
  * every per-row step partitioned:
  *
  *   1. one aggregate pass → (n, min, max) of the score column;
  *   2. rows are bucketed by score band (bucket 0 = highest scores), a
  *      pure function of the score so band order == score order and ties
  *      stay inside one bucket;
  *   3. per-bucket counts (≤ `buckets` rows to the driver) give each
  *      bucket's global rank offset, and prune every bucket that starts at
  *      or past k — the window below only ever sees ~frac of the table;
  *   4. `row_number` partitioned BY BUCKET (never global), plus the
  *      broadcast offset, yields the exact global rank; filter rank ≤ k.
  *
  * Degenerate case: when every score is identical the score band cannot
  * discriminate, so the same banding is applied to the (numeric,
  * distinct) tiebreaker column instead — global order is then tie order.
  * Known ceiling: a single pathologically hot score value still lands in
  * one window partition (raise `buckets` or pre-salt upstream).
  */
object TopFraction {

  /** Rows in the top `frac` of `df` by (`scoreCol` DESC, `tieCol` ASC),
    * exactly floor(n * frac) of them. `tieCol` must be numeric and
    * distinct per row (e.g. a primary key).
    */
  def topFraction(df: DataFrame, scoreCol: String, tieCol: String,
                  frac: Double, buckets: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val first = df.agg(
      count(lit(1)).as("n"),
      min(col(scoreCol)).as("mn"), max(col(scoreCol)).as("mx"),
      min(col(tieCol)).as("tmn"), max(col(tieCol)).as("tmx")).head()
    val n = first.getLong(0)
    val k = math.floor(n * frac).toLong
    if (k <= 0L) return df.limit(0)

    val (mn, mx) = (first.getDouble(1), first.getDouble(2))
    // band on score when it discriminates, else on the tiebreaker
    // (all-equal scores ⇒ global order is tie order, ascending)
    val bucket: Column =
      if (mx > mn)
        least(lit(buckets - 1), greatest(lit(0),
          floor((lit(mx) - col(scoreCol)) / lit(mx - mn) * buckets))).cast("int")
      else {
        val (tmn, tmx) = (first.get(3).toString.toDouble, first.get(4).toString.toDouble)
        if (tmx > tmn)
          least(lit(buckets - 1), greatest(lit(0),
            floor((col(tieCol).cast("double") - lit(tmn)) / lit(tmx - tmn) * buckets))).cast("int")
        else lit(0)
      }

    val banded = df.withColumn("__bucket", bucket)
    val bucketCounts = banded.groupBy("__bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // offset(b) = rows in strictly-better buckets; prune buckets whose
    // offset already reaches k (they cannot contribute a top-k row)
    var acc = 0L
    val offsets = bucketCounts.map { case (b, c) => val o = acc; acc += c; (b, o) }
      .takeWhile(_._2 < k)
    val lastBucket = offsets.last._1
    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("__bucket", "__offset")

    val w = Window.partitionBy("__bucket")
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    banded
      .filter(col("__bucket") <= lastBucket)
      .join(broadcast(offsetDf), "__bucket")
      .withColumn("__rn", row_number().over(w) + col("__offset"))
      .filter(col("__rn") <= k)
      .drop("__bucket", "__offset", "__rn")
  }
}
