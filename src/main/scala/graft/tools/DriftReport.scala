package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.BalancedCheckpoint

/** Render [[graft.lab.Campaign.driftReport]] over a band-campaign
  * checkpoint as a markdown artifact: stamp a served estimator
  * checkpoint's predictions onto every measured query and summarize
  * prediction-vs-measurement drift overall and per true runtime bucket
  * (the reference's estimate.py-over-workload-CSV loop, re-expressed as
  * one distributed scoring pass + one aggregation).
  *
  * With a FIFTH argument (a second model checkpoint), renders a
  * refresh comparison instead: both checkpoints scored over the SAME
  * population, per-bucket means side by side — the apples-to-apples
  * answer to "did the surrogate refresh actually pull tail drift
  * down?" (a single-model DRIFT.md regenerated after both the
  * population and the model moved confounds the two).
  *
  * Usage: `DriftReport [checkpoint] [modelJson] [statsJson] [outMd] [modelJsonOld]`
  */
object DriftReport {

  def main(args: Array[String]): Unit = {
    val cpPath = args.lift(0).getOrElse("/root/repo/data/band/campaign_x160_c2.cp")
    val modelJson = args.lift(1).getOrElse("/root/repo/data/band/models/gru4.json")
    val statsPath = args.lift(2).getOrElse("/root/repo/data/band/x160/stats.json")
    val outMd = args.lift(3).getOrElse("/root/repo/data/band/DRIFT.md")
    val oldModelJson = args.lift(4) // refresh-comparison mode when present
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val cp = BalancedCheckpoint.deserialize(Files.readString(Paths.get(cpPath)))
    val usable = cp.results.filter(_._2 > 0)
    println(s"[drift] scoring ${usable.size} measured queries from $cpPath")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val statsStr = Files.readString(Paths.get(statsPath))
    val drift = graft.lab.Campaign.driftReport(spark, usable,
      Files.readString(Paths.get(modelJson)), statsStr).cache()

    // ref-space true bucket (<=1 s -> 0) so the drift table reads in the
    // same units as the band metrics
    def bucketed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("true_bucket",
        greatest(lit(0.0), floor(log(2.0, greatest(col("runtime_sec"), lit(1e-3)))))
          .cast("long"))
      .groupBy("true_bucket")
      .agg(count(lit(1)).as("n"),
        avg("drift_log2").as("mean_drift"),
        expr("percentile(drift_log2, 0.5)").as("median_drift"),
        max("drift_log2").as("max_drift"))
      .orderBy("true_bucket")
    val byBucket = bucketed(drift).collect()
    val overall = drift.agg(avg("drift_log2"), expr("percentile(drift_log2, 0.5)"))
      .collect()(0)
    val worst = drift.orderBy(col("drift_log2").desc)
      .select("sql", "runtime_sec", "est_seconds", "drift_log2")
      .limit(8).collect()

    val sb = new StringBuilder
    sb.append("# Prediction-vs-measurement drift (campaign loop closure)\n\n")
    sb.append(s"Checkpoint: `$cpPath` (${usable.size} measured queries); ")
    sb.append(s"model: `$modelJson` served via `Scoring.scoreWorkloadAny` ")
    sb.append("(distributed, broadcast-text checkpoint, zero collects in the scoring pass).\n\n")
    sb.append(f"Overall drift |pred − actual| in log2 seconds: mean ${overall.getDouble(0)}%.3f, ")
    sb.append(f"median ${overall.getDouble(1)}%.3f.\n\n")
    sb.append("| true bucket | n | mean drift | median drift | max drift |\n")
    sb.append("|---|---|---|---|---|\n")
    byBucket.foreach { r =>
      sb.append(f"| ${r.getLong(0)} | ${r.getLong(1)} | ${r.getDouble(2)}%.3f " +
        f"| ${r.getDouble(3)}%.3f | ${r.getDouble(4)}%.3f |\n")
    }
    sb.append("\n## Largest drifts\n\n")
    sb.append("| measured s | predicted s | drift (log2) | sql |\n|---|---|---|---|\n")
    worst.foreach { r =>
      sb.append(f"| ${r.getDouble(1)}%.1f | ${r.getDouble(2)}%.1f " +
        f"| ${r.getDouble(3)}%.2f | ${r.getString(0).take(90).replace("|", "\\|")} |\n")
    }

    // refresh comparison: old checkpoint scored over the IDENTICAL
    // population, per-bucket means joined side by side
    oldModelJson.foreach { oldPath =>
      val oldDrift = graft.lab.Campaign.driftReport(spark, usable,
        Files.readString(Paths.get(oldPath)), statsStr)
      val oldBy = bucketed(oldDrift).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      sb.append("\n## Surrogate refresh comparison (same population, old vs new checkpoint)\n\n")
      sb.append(s"Old: `$oldPath`; new: `$modelJson`; population: ")
      sb.append(s"${usable.size} labels from `$cpPath`.\n\n")
      sb.append("| true bucket | n | mean drift (old) | mean drift (new) | Δ |\n")
      sb.append("|---|---|---|---|---|\n")
      byBucket.foreach { r =>
        val b = r.getLong(0)
        val nw = r.getDouble(2)
        val od = oldBy.getOrElse(b, Double.NaN)
        val delta = if (od == 0 || od.isNaN) "—"
          else f"${100.0 * (nw - od) / od}%+.0f%%"
        sb.append(f"| $b | ${r.getLong(1)} | $od%.3f | $nw%.3f | $delta |\n")
      }
    }
    Files.writeString(Paths.get(outMd), sb.toString)
    println(s"[drift] wrote $outMd")
    spark.stop()
  }
}
