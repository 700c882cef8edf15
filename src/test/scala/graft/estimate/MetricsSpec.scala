package graft.estimate

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the reference-parity metrics
  * (dqo/estimator/metrics.py:9-79, evaluate.py:64-97).
  */
class MetricsSpec extends AnyFunSuite {

  test("Cohen's kappa on a symmetric 2-class confusion") {
    // confusion: 2 correct 0s, 2 correct 1s, one miss each way
    val pairs = Seq((0, 0), (0, 0), (1, 1), (1, 0), (0, 1), (1, 1))
    // po = 4/6, pe = .5*.5 + .5*.5 = .5 -> kappa = (2/3 - 1/2)/(1/2) = 1/3
    assert(math.abs(Metrics.cohenKappa(pairs) - 1.0 / 3.0) < 1e-12)
    assert(Metrics.cohenKappa(Seq((1, 1), (2, 2))) == 1.0)
    assert(Metrics.cohenKappa(Nil) == 0.0)
  }

  test("adjusted balanced accuracy") {
    val pairs = Seq((0, 0), (0, 0), (1, 1), (1, 0), (0, 1), (1, 1))
    // per-class recall 2/3 each -> ba = 2/3, chance = 1/2 -> adjusted 1/3
    assert(math.abs(Metrics.balancedAccuracyAdjusted(pairs) - 1.0 / 3.0) < 1e-12)
    assert(Metrics.balancedAccuracyAdjusted(Seq((5, 5))) == 0.0) // single class
  }

  test("two-sided bucket metrics match the reference bookkeeping") {
    val pairs = Seq((1.2, 1.0), (0.4, 1.0), (3.0, 1.4), (2.0, 2.0))
    val r = Metrics.bucketMetrics(pairs)
    assert(r.values == Seq(1, 2))
    // bucket 1: left [-0.6], right [0.2, 1.6], hits 1 (rint(1.2)==1)
    assert(math.abs(r.meanTwoSided(0)._1 - (-0.6)) < 1e-12)
    assert(math.abs(r.meanTwoSided(0)._2 - 0.9) < 1e-12)
    assert(r.bucketAccuracy(0) == 0.25)
    // histogram bins [0,1) and [1,2) get one each; negatives excluded
    assert(r.bucketErrors(0) == Seq(1, 1, 0, 0, 0, 0, 0, 0, 0))
    // bucket 2: exact prediction -> no recorded errors -> accuracy 0
    // (reference returns 0 when both sides are empty, metrics.py:53)
    assert(r.meanTwoSided(1) == ((0.0, 0.0)))
    assert(r.bucketAccuracy(1) == 0.0)
  }

  test("np.round half-to-even bucket edges") {
    val r = Metrics.bucketMetrics(Seq((0.5, 0.5), (1.5, 1.5), (2.5, 2.5)))
    // np.round: 0.5 -> 0, 1.5 -> 2, 2.5 -> 2
    assert(r.values == Seq(0, 2))
  }

  test("binary split accuracy, zero-rule, gain") {
    val pairs = Seq((1.0, 1.0), (3.0, 1.0), (1.0, 3.0), (5.0, 5.0))
    val (acc, zero, gain) = Metrics.binarySplit(pairs, 2.0)
    assert(acc == 0.5 && zero == 0.5 && gain == 1.0)
    assert(Metrics.binarySplit(Nil, 2.0) == ((0.0, 0.0, 0.0)))
  }

  test("maximize scans 2^0..2^8 and picks the best gain") {
    // true fast class at <=2, predictions perfect below 4
    val pairs = Seq((1.0, 1.0), (2.0, 2.0), (8.0, 8.0), (32.0, 32.0),
      (1.0, 2.0), (100.0, 120.0))
    val (curve, bestB, bestAcc, bestZero) = Metrics.maximizeBinarySplit(pairs)
    assert(curve.size == 9 && curve.head._1 == 1 && curve.last._1 == 256)
    assert(curve.map(_._1) == Seq(1, 2, 4, 8, 16, 32, 64, 128, 256))
    // gain = acc/zeroAcc is maximized at the tightest perfect boundary
    assert(bestB == 1 && bestAcc == 1.0 && math.abs(bestZero - 1.0 / 6.0) < 1e-12)
  }
}
