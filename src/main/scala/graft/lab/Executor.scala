package graft.lab

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-execution lab (dqo/lab/query_executor.py): reproducible timing,
  * plan+timing capture, timeout control, and (query, runtime[, plan])
  * logging.
  *
  * Timing protocol (query_executor.py:27-103): clear caches, execute
  * TWICE and keep the 2nd run (cancels cold-start noise — Spark's analog
  * of DEALLOCATE/DISCARD is clearCache + fresh plan compilation);
  * timeout via job-group cancellation (the engine-side analog of
  * statement_timeout, postgres.py:244-263).
  */
final case class QueryRun(sql: String, seconds: Double, planJson: Option[String])

final class QueryTimeoutException(msg: String) extends RuntimeException(msg)

final class Executor(spark: SparkSession, timeoutSec: Int = 600,
                     logPath: Option[String] = None) {

  private def clearCaches(): Unit = {
    spark.catalog.clearCache()
  }

  private def runOnce(sql: String): (Double, DataFrame) = {
    val df = spark.sql(sql)
    val t0 = System.nanoTime()
    df.collect()
    ((System.nanoTime() - t0) / 1e9, df)
  }

  /** Run inside a cancellable job group so a runaway query can't wedge
    * the lab loop.
    */
  private def withTimeout[A](sql: String)(f: => A): A = {
    val group = s"graft-exec-${System.identityHashCode(sql)}-${Thread.currentThread().getId}"
    spark.sparkContext.setJobGroup(group, sql.take(80), interruptOnCancel = true)
    val timer = new java.util.Timer(true)
    @volatile var timedOut = false
    timer.schedule(new java.util.TimerTask {
      def run(): Unit = { timedOut = true; spark.sparkContext.cancelJobGroup(group) }
    }, timeoutSec * 1000L)
    try f
    catch {
      case e: Throwable if timedOut => throw new QueryTimeoutException(s"timeout after ${timeoutSec}s: ${e.getMessage}")
    } finally {
      timer.cancel()
      spark.sparkContext.clearJobGroup()
    }
  }

  /** Wall-clock seconds; run twice, keep the 2nd (query_executor.py:79-103). */
  def time(sql: String): Double = withTimeout(sql) {
    clearCaches()
    runOnce(sql)
    val (secs, _) = runOnce(sql)
    log(sql, secs, None)
    secs
  }

  /** 2nd-run timing + executed-plan op tree (the EXPLAIN ANALYZE analog,
    * query_executor.py:40-58 + execution_plan.py parse).
    */
  def analyze(sql: String): QueryRun = withTimeout(sql) {
    clearCaches()
    runOnce(sql)
    val (secs, df) = runOnce(sql)
    val plan = PlanOps.fromDataFrame(df).toJson
    log(sql, secs, Some(plan))
    QueryRun(sql, secs, Some(plan))
  }

  private def log(sql: String, secs: Double, plan: Option[String]): Unit =
    logPath.foreach { p =>
      val esc = "\"" + sql.replace("\"", "\"\"") + "\""
      val planCol = plan.map(j => ",\"" + j.replace("\"", "\"\"") + "\"").getOrElse("")
      Files.writeString(Paths.get(p), s"$esc,$secs$planCol\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

  /** Execute a query-per-line file with dedup, skip-already-executed
    * subtraction, and per-query error isolation
    * (FileQueryExecutor, query_executor.py:106-203).
    */
  def executeFile(path: String, alreadyExecuted: Set[String] = Set.empty,
                  shuffle: Boolean = true, seed: Long = 42L): Seq[QueryRun] = {
    val raw = Files.readAllLines(Paths.get(path)).toArray(Array.empty[String])
      .map(_.trim).filter(_.nonEmpty).distinct
      .filterNot(alreadyExecuted.contains)
    val queries = if (shuffle) new scala.util.Random(seed).shuffle(raw.toSeq) else raw.toSeq
    queries.flatMap(q => Try(analyze(q)).toOption)
  }

  /** Re-run a recorded workload with a checkpoint index for resume and a
    * drift report every `reportEvery` queries
    * (DatasetExecutor, query_executor.py:206-290).
    */
  def rerun(runs: Seq[(String, Double)], checkpointPath: Option[String] = None,
            reportEvery: Int = 100): Seq[(String, Double, Double)] = {
    val start = checkpointPath.filter(p => Files.exists(Paths.get(p)))
      .map(p => Files.readString(Paths.get(p)).trim.toInt).getOrElse(0)
    val out = mutable.Buffer.empty[(String, Double, Double)]
    runs.zipWithIndex.drop(start).foreach { case ((sql, recorded), i) =>
      Try(time(sql)).foreach { secs =>
        out += ((sql, recorded, secs))
        if ((i + 1) % reportEvery == 0) {
          val drift = out.map(r => math.abs(r._3 - r._2)).sum / out.size
          System.err.println(f"[rerun] ${i + 1}/${runs.size} mean|drift|=$drift%.3fs")
        }
      }
      checkpointPath.foreach(p => Files.writeString(Paths.get(p), (i + 1).toString))
    }
    out.toSeq
  }
}
