package graft.tools

import java.nio.file.{Files, Paths}

import graft.gen.BalancedCheckpoint

/** Audit the tail campaign's measurement SCREEN against ground truth:
  * for every already-measured true-tail query, would the surrogate
  * screen ([[graft.lab.TailCampaign]], `screenLo = lo/2`) have rejected
  * it unmeasured? Reported for the v20 regressor alone and for the
  * max-of-families screen ([[graft.estimate.Scoring.maxPredictorFor]]),
  * so the dual-screen fix is quantified on data instead of asserted —
  * the per-bucket DRIFT.md means can only say the model errs, not
  * whether the error costs measurements (an OVERestimate is harmless:
  * the candidate is measured anyway and the label recorded; only the
  * under-the-floor rejection loses a tail label).
  *
  * Usage: `ScreenAudit [checkpoint] [gru4Json] [gruJson] [statsJson] [lo] [outMd]`
  */
object ScreenAudit {

  def main(args: Array[String]): Unit = {
    val cpPath = args.lift(0).getOrElse("/root/repo/data/band/campaign_x160_c2.cp")
    val gru4Path = args.lift(1).getOrElse("/root/repo/data/band/models/gru4.json")
    val gruPath = args.lift(2).getOrElse("/root/repo/data/band/models/gru.json")
    val statsPath = args.lift(3).getOrElse("/root/repo/data/band/x160/stats.json")
    val lo = args.lift(4).map(_.toDouble).getOrElse(32.0)
    val outMd = args.lift(5).getOrElse("/root/repo/data/band/SCREEN_AUDIT.md")
    val screenLo = lo / 2

    val cp = BalancedCheckpoint.deserialize(Files.readString(Paths.get(cpPath)))
    val stats = Files.readString(Paths.get(statsPath))
    val gru4 = Files.readString(Paths.get(gru4Path))
    val gru = Files.readString(Paths.get(gruPath))
    val v20 = graft.estimate.Scoring.maxPredictorFor(Seq(gru4), stats)
    val dual = graft.estimate.Scoring.maxPredictorFor(Seq(gru4, gru), stats)

    val tail = cp.results.filter { case (_, rt) => rt >= lo }
    println(s"[screen] ${tail.size} measured true-tail queries (rt >= $lo s) " +
      s"from ${cp.results.size}; screen floor $screenLo s")

    def rejected(p: String => Double): Seq[(String, Double, Double)] =
      tail.flatMap { case (sql, rt) =>
        val est = math.pow(2.0, p(sql))
        if (est.isNaN || est < screenLo) Some((sql, rt, est)) else None
      }
    val v20Rej = rejected(v20)
    val dualRej = rejected(dual)
    def pct(n: Int) = f"${100.0 * n / math.max(1, tail.size)}%.1f%%"

    val sb = new StringBuilder
    sb.append("# Measurement-screen audit (true tail vs surrogate floor)\n\n")
    sb.append(s"Checkpoint: `$cpPath`; ${tail.size} measured queries with ")
    sb.append(s"runtime >= $lo s; a screen estimate below $screenLo s would have ")
    sb.append("rejected the candidate unmeasured (the only costly error — an ")
    sb.append("overestimate still fires the executor and records the label).\n\n")
    sb.append("| screen | true-tail rejected unmeasured | rate |\n|---|---|---|\n")
    sb.append(s"| v20 regressor alone | ${v20Rej.size} / ${tail.size} | ${pct(v20Rej.size)} |\n")
    sb.append(s"| max(v20, classifier bucket center) | ${dualRej.size} / ${tail.size} | ${pct(dualRej.size)} |\n")
    sb.append("\n## Worst v20-alone rejections the dual screen recovers\n\n")
    val recovered = v20Rej.filterNot(r => dualRej.exists(_._1 == r._1))
      .sortBy(-_._2).take(8)
    sb.append("| measured s | v20 est s | sql |\n|---|---|---|\n")
    recovered.foreach { case (sql, rt, est) =>
      sb.append(f"| $rt%.1f | $est%.2f | ${sql.take(90).replace("|", "\\|")} |\n")
    }
    Files.writeString(Paths.get(outMd), sb.toString)
    println(s"[screen] v20-alone rejects ${v20Rej.size} (${pct(v20Rej.size)}); " +
      s"dual screen rejects ${dualRej.size} (${pct(dualRej.size)}); wrote $outMd")
  }
}
