package graft.estimate

/** The estimator result-analysis PRESENTATION layer — the reference's
  * `dqo/estimator/evaluate.py:17-106` (confusion heatmap, sklearn
  * classification report, per-bucket error frame, binary-split curve)
  * re-expressed as plotting-free text/markdown artifacts: everything
  * the notebook renders as a figure becomes a table a terminal or a
  * README can carry. The underlying math lives in [[Metrics]]; this
  * object only arranges and renders it.
  *
  * Like the reference, the classification space is ROUNDED LOG2 of the
  * runtime (display_summary applies np.round(np.log2(x)) to both
  * sides; np.round is half-to-even, mirrored here via math.rint).
  */
object Report {

  final case class ResultRow(query: String, trueSec: Double, predSec: Double) {
    def bucket: Int = math.rint(log2(trueSec)).toInt        // evaluate_results
    def absErr: Double = math.abs(predSec - trueSec)
    def errRatio: Double = trueSec / predSec
  }

  private def log2(x: Double): Double = math.log(math.max(x, 1e-9)) / math.log(2.0)
  private def rint(x: Double): Int = math.rint(x).toInt

  /** sklearn-convention confusion matrix: labels are the sorted union
    * of true and predicted classes; rows = true, cols = pred. */
  def confusion(pairs: Seq[(Int, Int)]): (Seq[Int], Seq[Seq[Int]]) = {
    val labels = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = labels.zipWithIndex.toMap
    val m = Array.fill(labels.size, labels.size)(0)
    pairs.foreach { case (t, p) => m(idx(t))(idx(p)) += 1 }
    (labels, m.map(_.toSeq).toSeq)
  }

  /** Per-label precision/recall/F1/support plus macro and weighted
    * averages — sklearn's classification_report(zero_division=0) as
    * data. Pairs are (true, pred). */
  final case class LabelScore(label: Int, precision: Double, recall: Double,
                              f1: Double, support: Int)
  def classificationScores(pairs: Seq[(Int, Int)]): Seq[LabelScore] = {
    val labels = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    labels.map { l =>
      val tp = pairs.count(p => p._1 == l && p._2 == l).toDouble
      val predP = pairs.count(_._2 == l)
      val trueP = pairs.count(_._1 == l)
      val prec = if (predP == 0) 0.0 else tp / predP
      val rec = if (trueP == 0) 0.0 else tp / trueP
      val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
      LabelScore(l, prec, rec, f1, trueP)
    }
  }

  /** mcc_metrics (dqo/estimator/metrics.py:9-17) over (true, pred)
    * label pairs, via [[Metrics]] where the math already exists. */
  def mccMetrics(pairs: Seq[(Int, Int)]): Seq[(String, Double)] = {
    val scores = classificationScores(pairs)
    val n = math.max(1, pairs.size).toDouble
    val totalSupport = math.max(1, scores.map(_.support).sum).toDouble
    Seq(
      "accuracy" -> pairs.count(p => p._1 == p._2) / n,
      "balanced accuracy" ->
        Metrics.balancedAccuracyAdjusted(pairs.map { case (t, p) => (p, t) }),
      "kappa" -> Metrics.cohenKappa(pairs.map { case (t, p) => (p, t) }),
      "recall" -> scores.map(_.recall).sum / math.max(1, scores.size),
      "f1 macro" -> scores.map(_.f1).sum / math.max(1, scores.size),
      "f1 weighted" -> scores.map(s => s.f1 * s.support).sum / totalSupport)
  }

  /** display_results' per-bucket error frame: abs_err and err_ratio,
    * mean and median, grouped by the rounded-log2 TRUE bucket. */
  def errorByBucket(rows: Seq[ResultRow]): Seq[(Int, Double, Double, Double, Double)] = {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    rows.groupBy(_.bucket).toSeq.sortBy(_._1).map { case (b, g) =>
      (b, g.map(_.absErr).sum / g.size, median(g.map(_.absErr)),
        g.map(_.errRatio).sum / g.size, median(g.map(_.errRatio)))
    }
  }

  private def fmt(d: Double): String = f"$d%.3f"

  /** The full text report: summary metrics, confusion matrix,
    * classification report, per-bucket errors, binary-split curve —
    * one markdown document, the artifact evaluate.py renders across a
    * notebook. */
  def renderMarkdown(title: String, rows: Seq[ResultRow]): String = {
    require(rows.nonEmpty, "no results to report")
    val pairs = rows.map(r => (rint(log2(r.trueSec)), rint(log2(r.predSec))))
    val sb = new StringBuilder
    sb ++= s"# $title\n\n"
    sb ++= s"${rows.size} queries; labels are rounded log2(runtime seconds).\n\n"

    sb ++= "## Summary metrics\n\n"
    mccMetrics(pairs).foreach { case (k, v) => sb ++= s"- $k: ${fmt(v)}\n" }
    sb ++= s"- mae (seconds): ${fmt(rows.map(_.absErr).sum / rows.size)}\n"
    val log2Pairs = rows.map(r => (log2(r.predSec), log2(r.trueSec)))
    sb ++= s"- mae (log2): ${fmt(log2Pairs.map { case (p, t) => math.abs(p - t) }.sum / rows.size)}\n\n"

    val (labels, m) = confusion(pairs)
    sb ++= "## Confusion matrix (rows = true, cols = pred)\n\n"
    sb ++= "| true\\pred | " + labels.mkString(" | ") + " |\n"
    sb ++= "|---|" + labels.map(_ => "---").mkString("|") + "|\n"
    labels.zip(m).foreach { case (l, row) =>
      sb ++= s"| **$l** | " + row.mkString(" | ") + " |\n"
    }
    sb ++= "\n## Classification report\n\n"
    sb ++= "| label | precision | recall | f1 | support |\n|---|---|---|---|---|\n"
    val scores = classificationScores(pairs)
    scores.foreach { s =>
      sb ++= s"| ${s.label} | ${fmt(s.precision)} | ${fmt(s.recall)} | ${fmt(s.f1)} | ${s.support} |\n"
    }
    val totalSupport = math.max(1, scores.map(_.support).sum).toDouble
    sb ++= s"| macro avg | ${fmt(scores.map(_.precision).sum / scores.size)} | " +
      s"${fmt(scores.map(_.recall).sum / scores.size)} | " +
      s"${fmt(scores.map(_.f1).sum / scores.size)} | ${scores.map(_.support).sum} |\n"
    sb ++= s"| weighted avg | ${fmt(scores.map(s => s.precision * s.support).sum / totalSupport)} | " +
      s"${fmt(scores.map(s => s.recall * s.support).sum / totalSupport)} | " +
      s"${fmt(scores.map(s => s.f1 * s.support).sum / totalSupport)} | ${scores.map(_.support).sum} |\n"

    sb ++= "\n## Error by true bucket\n\n"
    sb ++= "| bucket | abs_err mean | abs_err median | err_ratio mean | err_ratio median |\n"
    sb ++= "|---|---|---|---|---|\n"
    errorByBucket(rows).foreach { case (b, am, amed, rm, rmed) =>
      sb ++= s"| $b | ${fmt(am)} | ${fmt(amed)} | ${fmt(rm)} | ${fmt(rmed)} |\n"
    }

    // display_best_binary: the fast/slow split curve over 2^0..2^8 —
    // note the reference scans RAW-second boundaries on the results df
    val rawPairs = rows.map(r => (r.predSec, r.trueSec))
    val (curve, best, bestAcc, bestZero) = Metrics.maximizeBinarySplit(rawPairs)
    sb ++= s"\n## Binary split (fast/slow boundary scan)\n\n"
    sb ++= s"best boundary: ${best}s — model ${fmt(bestAcc)} vs zero-rule ${fmt(bestZero)}\n\n"
    sb ++= "| boundary_sec | model | zerorule | gain |\n|---|---|---|---|\n"
    curve.foreach { case (b, acc, zero, gain) =>
      sb ++= s"| $b | ${fmt(acc)} | ${fmt(zero)} | ${fmt(gain)} |\n"
    }
    sb.result()
  }

  /** Write the artifact (the notebook-output stand-in). */
  def write(path: String, title: String, rows: Seq[ResultRow]): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, renderMarkdown(title, rows))
  }
}
