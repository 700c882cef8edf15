package graft.estimate

/** Reference-parity evaluation metrics for the runtime estimator
  * (dqo/estimator/metrics.py:9-79, dqo/estimator/evaluate.py:64-97),
  * driver-side math over the (pred, true) pairs an evaluation collects —
  * the distributed part is producing the pairs, not scoring them.
  *
  * Rounding follows numpy: np.round is half-to-even (math.rint), so
  * bucket edges at .5 match the reference's bucketing exactly.
  */
object Metrics {

  /** Cohen's kappa over discrete labels (metrics.py:13,
    * sklearn.cohen_kappa_score): (p_o - p_e) / (1 - p_e) with the
    * chance-agreement p_e from the row/column marginals.
    */
  def cohenKappa(pairs: Seq[(Int, Int)]): Double = {
    if (pairs.isEmpty) return 0.0
    val n = pairs.size.toDouble
    val po = pairs.count(p => p._1 == p._2) / n
    val predMarg = pairs.groupBy(_._1).view.mapValues(_.size / n).toMap
    val trueMarg = pairs.groupBy(_._2).view.mapValues(_.size / n).toMap
    val pe = (predMarg.keySet ++ trueMarg.keySet).toSeq
      .map(k => predMarg.getOrElse(k, 0.0) * trueMarg.getOrElse(k, 0.0)).sum
    if (pe == 1.0) 0.0 else (po - pe) / (1 - pe)
  }

  /** Adjusted balanced accuracy (metrics.py:12): mean per-true-class
    * recall, rescaled so chance performance scores 0.
    */
  def balancedAccuracyAdjusted(pairs: Seq[(Int, Int)]): Double = {
    if (pairs.isEmpty) return 0.0
    val byTrue = pairs.groupBy(_._2)
    val recalls = byTrue.values.map(g => g.count(p => p._1 == p._2).toDouble / g.size)
    val ba = recalls.sum / recalls.size
    val chance = 1.0 / byTrue.size
    if (chance == 1.0) 0.0 else (ba - chance) / (1 - chance)
  }

  /** Per-bucket signed error bookkeeping (TwoSidedError,
    * metrics.py:30-54): raw under/over-shoots plus a hit counter on
    * rounded equality. `hits` and the error lists overlap by design
    * (a rounded hit with nonzero raw error counts in both), mirroring
    * the reference.
    */
  final case class TwoSided(left: Seq[Double], right: Seq[Double], hits: Int) {
    def mean: (Double, Double) = (
      if (left.isEmpty) 0.0 else left.sum / left.size,
      if (right.isEmpty) 0.0 else right.sum / right.size)
    def accuracy: Double =
      if (left.isEmpty && right.isEmpty) 0.0
      else hits.toDouble / (hits + left.size + right.size)
    /** np.histogram(both, bins=range(10)): nine [i,i+1) bins over [0,9]
      * — negative (left) errors fall outside and are not counted,
      * faithfully mirroring metrics.py:70. */
    def histogram: Seq[Int] = {
      val h = new Array[Int](9)
      (left ++ right).foreach { e =>
        if (e >= 0 && e <= 9) {
          val b = math.min(8, math.floor(e).toInt)
          h(b) += 1
        }
      }
      h.toSeq
    }
  }

  final case class BucketReport(values: Seq[Int],
                                meanTwoSided: Seq[(Double, Double)],
                                bucketErrors: Seq[Seq[Int]],
                                bucketAccuracy: Seq[Double])

  private def rint(x: Double): Int = math.rint(x).toInt

  /** custom_metrics (metrics.py:57-79): (pred, true) pairs grouped by the
    * rounded true value; per bucket the signed-error means, the error
    * histogram, and the rounded-hit accuracy.
    */
  def bucketMetrics(pairs: Seq[(Double, Double)]): BucketReport = {
    val grouped = pairs.groupBy { case (_, t) => rint(t) }
    val values = grouped.keys.toSeq.sorted
    val two = values.map { b =>
      val g = grouped(b)
      TwoSided(
        left = g.collect { case (p, t) if p - t < 0 => p - t },
        right = g.collect { case (p, t) if p - t > 0 => p - t },
        hits = g.count { case (p, t) => rint(p) == rint(t) })
    }
    BucketReport(values, two.map(_.mean), two.map(_.histogram), two.map(_.accuracy))
  }

  /** evaluate_binary_split (evaluate.py:64-72): treat `boundary` as a
    * fast/slow cut; accuracy of "pred says fast" among truly fast, the
    * zero-rule baseline, and the gain over it.
    */
  def binarySplit(pairs: Seq[(Double, Double)], boundary: Double): (Double, Double, Double) = {
    val total = pairs.size
    val t = pairs.count(_._2 <= boundary)
    val p = pairs.count { case (pr, tr) => pr <= boundary && tr <= boundary }
    val acc = if (t > 0) p.toDouble / t else 0.0
    val zeroAcc = if (total > 0) t.toDouble / total else 0.0
    val gain = if (zeroAcc > 0) acc / zeroAcc else 0.0
    (acc, zeroAcc, gain)
  }

  /** maximize_binary_split (evaluate.py:75-89): scan boundaries 2^0..2^8,
    * return the per-boundary curve and the best (boundary, acc, zeroAcc)
    * by gain.
    */
  def maximizeBinarySplit(pairs: Seq[(Double, Double)])
      : (Seq[(Int, Double, Double, Double)], Int, Double, Double) = {
    val curve = (0 until 9).map { i =>
      val boundary = 1 << i
      val (acc, zeroAcc, gain) = binarySplit(pairs, boundary.toDouble)
      (boundary, acc, zeroAcc, gain)
    }
    var (bestIdx, bestGain, bestAcc, bestZero) = (1, 0.0, 0.0, 1.0)
    curve.foreach { case (b, acc, zero, gain) =>
      if (gain > bestGain) { bestIdx = b; bestGain = gain; bestAcc = acc; bestZero = zero }
    }
    (curve, bestIdx, bestAcc, bestZero)
  }
}
