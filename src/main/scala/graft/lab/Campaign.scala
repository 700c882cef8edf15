package graft.lab

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

import graft.Tables
import graft.estimate.Estimator
import graft.gen.{BalancedCheckpoint, BalancedQueryGen}
import graft.model.StatsCollector

/** End-to-end workload campaign — the reference's full lifecycle in one
  * run (SURVEY §3.2 + §3.3): collect the stats model, generate a
  * runtime-balanced workload against REAL Spark execution, groom it,
  * train the estimator on measured runtimes, and report bucket metrics.
  *
  * Usage: `sbt 'runMain graft.lab.Campaign [sfDir] [nQueries] [checkpointPath]'`
  * With a checkpoint path, an interrupted campaign resumes from it
  * (guided.py:233-266 semantics) and the state is saved after generation.
  */
object Campaign {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val n = args.lift(1).map(_.toInt).getOrElse(25)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tables = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    Tables.registerAll(spark, sfDir)

    println(s"[campaign] collecting stats model over $tables @ $sfDir")
    val db = StatsCollector.collect(spark, sfDir, tables)

    println(s"[campaign] balanced generation of $n measured queries")
    val executor = new Executor(spark, timeoutSec = 60)
    val runner: String => Double = sql => executor.time(sql)
    val cpPath = args.lift(2).map(Paths.get(_))
    val gen = cpPath.filter(Files.exists(_)) match {
      case Some(p) =>
        println(s"[campaign] resuming from checkpoint $p")
        BalancedCheckpoint.restore(
          BalancedCheckpoint.deserialize(Files.readString(p)),
          db, runner, maxStepsPerGen = 15)
      case None =>
        new BalancedQueryGen(db, runner, maxStepsPerGen = 15, seed = 42L)
    }
    val measured = gen.generate(n)
    cpPath.foreach { p =>
      Files.writeString(p, gen.checkpoint.serialize)
      println(s"[campaign] checkpoint saved to $p")
    }
    println(s"[campaign] measured ${measured.size} runs; bucket counts: " +
      gen.counts.mkString("[", ",", "]"))

    println("[campaign] training GBT estimator on measured runtimes")
    val usable = measured.filter(_._2 > 0)
    val model = Estimator.train(spark, db, usable, maxIter = 15)
    val preds = usable.map { case (sql, rt) =>
      (model.predictLog2(Estimator.featurize(db, sql)), math.log(rt) / math.log(2))
    }
    val (acc, mae, f1) = Estimator.evaluate(preds)
    println(f"[campaign] n=${usable.size} bucket-acc=$acc%.3f mae(log2)=$mae%.3f macroF1=$f1%.3f")
    spark.stop()
  }
}
