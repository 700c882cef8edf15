package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional range pruning.
  *
  * Partitioning prunes on ONE low-cardinality column and bucketing
  * co-locates ONE join key — but corpus scans are often boxes over TWO
  * numeric dimensions at once ("timestamp range × quality band",
  * "length band × perplexity band"), and a sort on either dimension
  * alone leaves the other's values scattered through every file. The
  * Morton curve interleaves the bits of both dimensions into one sort
  * key, so rows close in the 2-D box are close on the curve: after
  * range-partitioning + sorting on the z-value, each parquet file's
  * [min, max] z-interval covers a small tile of the plane, and a 2-D
  * box predicate skips the files (and row groups) whose tile misses
  * the box. This is the layout trick behind Delta/Hudi `OPTIMIZE
  * ZORDER BY` re-expressed as a plain engine capability (public
  * technique; see also Morton 1966 and the Delta Lake docs).
  *
  * The box → z-interval bound is conservative and SOUND: bit-spreading
  * is strictly order-preserving per dimension, so every point of
  * [loA,hiA]×[loB,hiB] has z ∈ [z(loA,loB), z(hiA,hiB)]. The interval
  * also covers out-of-box points (the curve leaves and re-enters the
  * tile), so the exact per-dimension predicates stay in the filter —
  * the z-range only DRIVES THE SKIPPING, never the answer. (A
  * litmax/bigmin refinement would tighten the interval further; at
  * file granularity the simple bound already prunes the bulk.)
  *
  * Scale design: the write is one range-shuffle on the z-value (the
  * same cost as any global sort-for-layout) and the read path is pure
  * scan-side pruning — `PushedFilters` carries the z-range to the
  * parquet reader, which drops whole files/row-groups on footer stats
  * before any I/O. No shuffle, no join, no state at query time.
  */
object ZOrderStore {

  /** Morton z-value: interleave the low `bits` bits of `a` and `b`
    * (bit i of `a` → position 2i+1, bit i of `b` → position 2i). Pure
    * shift/mask arithmetic on longs — codegen'd, portable, and exactly
    * reproducible in any engine with `>>` and `&`.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** The sound conservative z-interval for a 2-D box (see Scaladoc
    * above): every in-box row's z-value falls inside it.
    */
  def zInterval(loA: Long, hiA: Long, loB: Long, hiB: Long, bits: Int): (Long, Long) = {
    def z(a: Long, b: Long): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))).sum
    (z(loA, loB), z(hiA, hiB))
  }

  /** Write `df` z-ordered on (`colA`, `colB`): compute the z-value,
    * range-partition into `numFiles` curve segments, sort inside each,
    * write parquet. The emitted `zval` column is what the parquet
    * footers carry min/max stats for — the skipping handle.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int, numFiles: Int): Unit =
    df.withColumn("zval", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(path)

  /** Read back a 2-D box from a z-ordered table: exact per-dimension
    * predicates (the answer) AND the conservative z-interval (the
    * pruning). Both reach the scan as `PushedFilters`; the z-range
    * skips files/row-groups whose footer stats miss the interval.
    */
  def readBox(spark: SparkSession, path: String, colA: String, colB: String,
              bits: Int, loA: Long, hiA: Long, loB: Long, hiB: Long): DataFrame = {
    val (zLo, zHi) = zInterval(loA, hiA, loB, hiB, bits)
    spark.read.parquet(path)
      .where(col(colA) >= loA && col(colA) <= hiA &&
        col(colB) >= loB && col(colB) <= hiB &&
        col("zval") >= zLo && col("zval") <= zHi)
  }

  /** Per-file pruning audit: each file's min/max rectangle on BOTH
    * dimensions and whether it intersects the query box — exactly the
    * test the parquet reader runs against footer column stats. This is
    * where z-ordering pays: curve segments are near-square tiles, so
    * every file's rectangle is tight in BOTH dimensions, while a 1-D
    * sort leaves the non-sort dimension's [min,max] spanning the full
    * domain in every file (its stats prune nothing). One scan, one
    * small aggregate (≤ numFiles rows).
    */
  def fileOverlap(spark: SparkSession, path: String, colA: String, colB: String,
                  loA: Long, hiA: Long, loB: Long, hiB: Long): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(colA).as("a_min"), max(colA).as("a_max"),
        min(colB).as("b_min"), max(colB).as("b_max"))
      .withColumn("overlaps",
        col("a_max") >= loA && col("a_min") <= hiA &&
          col("b_max") >= loB && col("b_min") <= hiB)
}
