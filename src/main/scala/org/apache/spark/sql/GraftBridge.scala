package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * private[sql]; extension libraries place a small accessor inside the
  * spark.sql package (the established pattern for Catalyst-extending
  * projects) rather than reflecting.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Estimated scan-split count of a frame whose leaves are ALL file
    * relations — None otherwise (the caller falls back to an exact RDD
    * probe). Pure metadata arithmetic over the already-cached file index
    * using FilePartition.maxSplitBytes' own formula: no analysis, no
    * physical planning, no RDD construction — the cheap replacement for
    * `df.rdd.getNumPartitions` in Spread's "fewer splits than cores?"
    * check, which re-planned the whole query once per call (r16 verdict
    * called this out as per-query driver overhead). An estimate is
    * enough there: a borderline miss either adds one harmless
    * repartition of an already-parallel source or skips a spread the
    * exact probe would also have skipped at equality.
    */
  def estimatedScanSplits(df0: DataFrame): Option[Long] = {
    val df = df0.asInstanceOf[classic.Dataset[Row]]
    val leaves = df.queryExecution.logical.collectLeaves()
    val rels = leaves.map {
      case l: LogicalRelation => l.relation match {
        case r: HadoopFsRelation => Some(r)
        case _ => None
      }
      case _ => None
    }
    if (rels.isEmpty || rels.exists(_.isEmpty)) None
    else {
      val conf = df.sparkSession.sessionState.conf
      val par = math.max(1L, df.sparkSession.sparkContext.defaultParallelism.toLong)
      val openCost = conf.filesOpenCostInBytes
      Some(rels.flatten.map { r =>
        val total = r.location.sizeInBytes +
          r.location.inputFiles.length.toLong * openCost
        val maxSplit = math.min(conf.filesMaxPartitionBytes,
          math.max(openCost, total / par))
        if (maxSplit <= 0L) 1L else math.max(1L, (total + maxSplit - 1) / maxSplit)
      }.sum)
    }
  }
}
