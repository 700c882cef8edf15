package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Try

import graft.gen.BalancedCheckpoint

/** Audit the tail campaign's measurement SCREEN against ground truth:
  * for every already-measured true-tail query, would the surrogate
  * screen ([[graft.lab.TailCampaign]], `screenLo = lo/2`) have rejected
  * it unmeasured? Reported for the v20 regressor alone and for the
  * max-of-families screen ([[graft.estimate.Scoring.maxPredictorFor]]),
  * so the dual-screen fix is quantified on data instead of asserted —
  * the per-bucket DRIFT.md means can only say the model errs, not
  * whether the error costs measurements (a MID-BAND overestimate is
  * harmless: the candidate is measured anyway and the label recorded;
  * an under-the-floor OR over-the-ceiling estimate rejects it
  * unmeasured).
  *
  * Two complementary views:
  *  1. retrospective — replay the screen over every already-paid
  *     true-tail label (possible only because earlier campaigns ran
  *     WITHOUT the screen);
  *  2. the ε ledger — aggregate the `.eps` sidecars the live streams
  *     append ([[graft.lab.TailCampaign]]'s ε pass-through measures a
  *     deterministic ~2% of screened-OUT candidates), which stays an
  *     unbiased estimate of screen loss even after every new label is
  *     screen-conditioned.
  *
  * Usage: `ScreenAudit [checkpoint] [gru4Json] [gruJson] [statsJson] [lo] [outMd] [screenHi] [epsDir]`
  */
object ScreenAudit {

  def main(args: Array[String]): Unit = {
    val cpPath = args.lift(0).getOrElse("/root/repo/data/band/campaign_x160_c2.cp")
    val gru4Path = args.lift(1).getOrElse("/root/repo/data/band/models/gru4.json")
    val gruPath = args.lift(2).getOrElse("/root/repo/data/band/models/gru.json")
    val statsPath = args.lift(3).getOrElse("/root/repo/data/band/x160/stats.json")
    val lo = args.lift(4).map(_.toDouble).getOrElse(32.0)
    val outMd = args.lift(5).getOrElse("/root/repo/data/band/SCREEN_AUDIT.md")
    val screenHi = args.lift(6).map(_.toDouble).getOrElse(280.0)
    val epsDir = args.lift(7).getOrElse("/tmp/graft_band")
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
        // the screen rejects BOTH below the floor and above the ceiling
        // (the latter matters near screenHi: a +0.5 log2 bias once
        // pushed correct near-ceiling votes past it, round-12 advice)
        if (est.isNaN || est < screenLo || est > screenHi) Some((sql, rt, est))
        else None
      }
    val v20Rej = rejected(v20)
    val dualRej = rejected(dual)
    def pct(n: Int) = f"${100.0 * n / math.max(1, tail.size)}%.1f%%"

    val sb = new StringBuilder
    sb.append("# Measurement-screen audit (true tail vs surrogate floor)\n\n")
    sb.append(s"Checkpoint: `$cpPath`; ${tail.size} measured queries with ")
    sb.append(s"runtime >= $lo s; a screen estimate outside [$screenLo, $screenHi] s ")
    sb.append("would have rejected the candidate unmeasured (a mid-band ")
    sb.append("overestimate still fires the executor and records the label). ")
    sb.append("Classifier votes enter the screen unshifted — bucket b is the ")
    sb.append("center of the ROUNDED log2 bucket the repo trains on.\n\n")
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

    // ε ledger: the forward-looking, screen-independent loss estimate.
    // Each line is est<TAB>rt[<TAB>cap=<sec>]<TAB>sql for one ε-measured
    // screened-OUT candidate; rt = -1 is a censored timeout (counted as
    // a true-tail miss — anything past the timeout is certainly >= lo);
    // the cap field (rounds >= 13) records the ε-measurement timeout so
    // "censored at the band edge" and "censored at the stream timeout"
    // stay distinguishable. The SIDECAR'S OWN band is parsed from its
    // filename (tail_..._b<lo>_<hi>.cp.eps): each stream screens against
    // [its lo/2, max(its hi, 280)]. Completed misses split THREE ways —
    // below the fleet-wide floor or above the fleet-wide ceiling is a
    // GLOBAL loss (no stream would have measured it), while an estimate
    // some other stream's band contains is band TARGETING (a
    // differently-banded stream measures these) — an above-ceiling
    // rejection must not be booked as recoverable (round-12 advice).
    val BandRe = """.*_b(\d+(?:\.\d+)?)_(\d+(?:\.\d+)?)\.cp\.eps$""".r
    val CapRe = """cap=(\d+(?:\.\d+)?)""".r
    var fallbackFiles = 0
    // (est, rt, streamLo, streamCeil, capSec)
    val epsLines: Seq[(Double, Double, Double, Double, Option[Double])] =
      Try(Files.list(Paths.get(epsDir)).iterator().asScala
        .filter(_.toString.endsWith(".eps")).toSeq).getOrElse(Nil)
        .flatMap { p =>
          val (streamLo, streamCeil) = p.toString match {
            case BandRe(l, h) => (l.toDouble, math.max(h.toDouble, 280.0))
            case _            => fallbackFiles += 1; (lo, screenHi)
          }
          Files.readString(p).split("\n").filter(_.nonEmpty).toSeq.flatMap { l =>
            val f = l.split("\t")
            val cap = f.lift(2).collect { case CapRe(c) => c.toDouble }
            Try((f(0).toDouble, f(1).toDouble, streamLo, streamCeil, cap)).toOption
          }
        }
    if (epsLines.nonEmpty) {
      val globalFloor = epsLines.map(_._3 / 2).min min screenLo
      val globalCeil = epsLines.map(_._4).max max screenHi
      // A censored draw (rt = -1) proves single-run rt ≳ cap/2, NOT
      // rt >= cap: Executor.time runs both executions of the
      // run-twice-keep-2nd protocol inside one timeout (round-13
      // advice). So a censored row is CERTAINLY tail for its stream
      // only when streamLo <= cap/2; otherwise it sits in [cap/2, lo)
      // ∪ [lo, ∞) and is booked separately as ambiguous. Legacy lines
      // without a cap field censored at the full stream timeout — the
      // pre-cap streams all had lo <= timeout/2 (96 <= 150, 150 <= 400),
      // so they keep the certainly-tail booking.
      val isCertainTail: ((Double, Double, Double, Double, Option[Double])) => Boolean = {
        case (_, rt, slo, _, cap) => rt < 0 && cap.forall(c => slo <= c / 2)
      }
      val censoredAmbiguous = epsLines.filter { l => l._2 < 0 && !isCertainTail(l) }
      val misses = epsLines.filter { case l @ (_, rt, slo, _, _) =>
        (rt < 0 && isCertainTail(l)) || (rt >= 0 && rt >= slo)
      }
      val done = misses.filter(_._2 >= 0)
      val blindLow = done.filter(_._1 < globalFloor)
      val blindHigh = done.filter(_._1 > globalCeil)
      val banded = done.filter(m => m._1 >= globalFloor && m._1 <= globalCeil)
      val censored = misses.filter(_._2 < 0)
      val censorCaps = censored.flatMap(_._5).distinct.sorted
        .map(c => s"${c.toInt} s")
      sb.append("\n## Screen loss on the ε pass-through sample (unbiased, live)\n\n")
      sb.append(s"${epsLines.size} screened-out candidates ε-measured across the ")
      sb.append(s"stream sidecars in `$epsDir`, each judged against its own ")
      sb.append(s"stream's band; ${misses.size} were true tail for their stream ")
      sb.append(f"(${100.0 * misses.size / epsLines.size}%.1f%% of screened-out ")
      sb.append(s"candidates). Fleet-wide screen envelope: [$globalFloor, ")
      sb.append(s"$globalCeil] s (min floor / max ceiling over the sidecar ")
      sb.append("bands). Decomposed:\n\n")
      sb.append("| ε-sample loss class | n | meaning |\n|---|---|---|\n")
      sb.append(s"| blind spot, floor side (est < $globalFloor s) | ")
      sb.append(s"${blindLow.size} | lost to EVERY stream — the failure mode the dual ")
      sb.append("screen exists to bound |\n")
      sb.append(s"| blind spot, ceiling side (est > $globalCeil s) | ")
      sb.append(s"${blindHigh.size} | also a GLOBAL loss — no stream's screen ")
      sb.append("admits an estimate this high |\n")
      sb.append(s"| band targeting (est within [$globalFloor, $globalCeil] s) | ")
      sb.append(s"${banded.size} | rejected only by THIS stream's narrower band; a ")
      sb.append("stream whose band contains the estimate measures these |\n")
      sb.append(s"| censored timeouts (rt = -1) | ${censored.size} | past the ")
      sb.append("ε timeout — certainly tail (single-run ≳ cap/2 ≥ stream lo)")
      if (censorCaps.nonEmpty)
        sb.append(s" (recorded ε caps: ${censorCaps.mkString(", ")})")
      sb.append(" |\n")
      if (censoredAmbiguous.nonEmpty) {
        sb.append(s"| censored, ambiguous (stream lo > cap/2) | ")
        sb.append(s"${censoredAmbiguous.size} | single-run only proven ≳ cap/2, ")
        sb.append("which is BELOW the stream floor — may or may not be tail |\n")
      }
      if (blindLow.nonEmpty || blindHigh.nonEmpty) {
        sb.append("\nWorst blind-spot rows (est s / true s): ")
        sb.append((blindLow ++ blindHigh).sortBy(-_._2).take(5)
          .map { case (e, r, _, _, _) => f"$e%.1f/$r%.1f" }.mkString(", "))
        sb.append("\n")
      }
      if (fallbackFiles > 0)
        sb.append(s"\nNOTE: $fallbackFiles sidecar file(s) did not match the ")
          .append("band-naming pattern and were banded with the audit's CLI ")
          .append("defaults — rename them or re-check the regex if this is ")
          .append("unexpected.\n")
      sb.append("\nUnlike the retrospective table above, this section stays ")
      sb.append("valid as the population becomes screen-conditioned.\n")
    }
    Files.writeString(Paths.get(outMd), sb.toString)
    println(s"[screen] v20-alone rejects ${v20Rej.size} (${pct(v20Rej.size)}); " +
      s"dual screen rejects ${dualRej.size} (${pct(dualRej.size)}); wrote $outMd")
  }
}
