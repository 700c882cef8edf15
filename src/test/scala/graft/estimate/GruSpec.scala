package graft.estimate

import org.scalatest.funsuite.AnyFunSuite

/** The GRU's correctness anchor: a finite-difference gradient check over
  * EVERY parameter tensor (the test that catches any BPTT index or sign
  * error), plus learning-behavior and determinism gates.
  */
class GruSpec extends AnyFunSuite {

  private def tinyData(seed: Long, n: Int, len: Int, dim: Int, classes: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val seq = Array.fill(len)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      // learnable rule: label = sign pattern of the mean of dim 0
      val m = seq.map(_(0)).sum / len
      val label = if (m < -0.1) 0 else if (m < 0.1) 1 else math.min(2, classes - 1)
      (seq, label)
    }
  }

  test("analytic gradient matches finite differences on every tensor") {
    val cfg = Gru.Config(inputDim = 3, hidden = 4, classes = 3, seed = 5L)
    val p = Gru.Params(cfg)
    val rnd = new scala.util.Random(99)
    val seq = Array.fill(6)(Array.fill(3)(rnd.nextDouble() * 2 - 1))
    val label = 2
    val g = new Array[Double](Gru.Params.size(cfg))
    Gru.lossAndGrad(p, seq, label, g)
    val eps = 1e-6
    // probe several indices inside every tensor region
    val regions = Seq(
      "Wz" -> p.offWz, "Wr" -> p.offWr, "Wh" -> p.offWh,
      "Uz" -> p.offUz, "Ur" -> p.offUr, "Uh" -> p.offUh,
      "bz" -> p.offBz, "br" -> p.offBr, "bh" -> p.offBh,
      "Wo" -> p.offWo, "bo" -> p.offBo)
    regions.foreach { case (name, off) =>
      (0 until 3).foreach { k =>
        val i = off + k
        val orig = p.w(i)
        p.w(i) = orig + eps
        val lPlus = Gru.lossAndGrad(p, seq, label, new Array[Double](g.length))
        p.w(i) = orig - eps
        val lMinus = Gru.lossAndGrad(p, seq, label, new Array[Double](g.length))
        p.w(i) = orig
        val numeric = (lPlus - lMinus) / (2 * eps)
        val denom = math.max(1e-8, math.abs(numeric) + math.abs(g(i)))
        assert(math.abs(numeric - g(i)) / denom < 1e-4,
          f"$name[$k]: numeric $numeric%.8f vs analytic ${g(i)}%.8f")
      }
    }
  }

  test("fit overfits a tiny separable dataset and loss decreases") {
    val data = tinyData(3L, n = 60, len = 8, dim = 5, classes = 3)
    val cfg = Gru.Config(inputDim = 5, hidden = 12, classes = 3,
      lr = 5e-3, epochs = 60, batch = 8, seed = 7L)
    val fitted = Gru.fit(data, cfg)
    assert(fitted.losses.head > fitted.losses.last,
      s"loss did not decrease: ${fitted.losses.head} -> ${fitted.losses.last}")
    val acc = data.count { case (s, l) => fitted.predict(s) == l }.toDouble / data.size
    assert(acc > 0.9, s"failed to overfit: train acc $acc")
  }

  test("training is bit-deterministic for a fixed seed") {
    val data = tinyData(4L, n = 20, len = 5, dim = 4, classes = 2)
    val cfg = Gru.Config(inputDim = 4, hidden = 6, classes = 2,
      lr = 1e-2, epochs = 5, batch = 4, seed = 21L)
    val a = Gru.fit(data, cfg)
    val b = Gru.fit(data, cfg)
    assert(a.p.w.toSeq == b.p.w.toSeq)
    assert(a.losses == b.losses)
  }

  test("variable-length sequences and guard rails") {
    val rnd = new scala.util.Random(8)
    val data = (1 to 30).map { i =>
      val len = 1 + i % 7
      val seq = Array.fill(len)(Array.fill(3)(rnd.nextDouble()))
      (seq, i % 2)
    }
    val cfg = Gru.Config(inputDim = 3, hidden = 5, classes = 2, epochs = 2)
    Gru.fit(data, cfg) // must not throw on mixed lengths (incl. len 1)
    intercept[IllegalArgumentException] { Gru.fit(Nil, cfg) }
    intercept[IllegalArgumentException] {
      Gru.fit(Seq((Array.empty[Array[Double]], 0)), cfg)
    }
  }

  test("fitValSelected returns the weights of the reported best epoch") {
    val data = tinyData(11L, n = 40, len = 5, dim = 4, classes = 3)
    val (train, valSet) = data.splitAt(30)
    val cfg = Gru.Config(inputDim = 4, hidden = 6, classes = 3,
      lr = 1e-2, epochs = 8, batch = 4, seed = 13L)
    val (fitted, bestEpoch, bestF1) = Gru.fitValSelected(train, cfg, valSet)
    assert(bestEpoch >= 1 && bestEpoch <= cfg.epochs)
    // invariant: re-scoring the returned weights on the val set
    // reproduces exactly the F1 the selection reports
    val pairs = valSet.map { case (s, l) => (fitted.predict(s).toDouble, l.toDouble) }
    val (_, _, f1) = Estimator.evaluate(pairs, minBucket = 0)
    assert(f1 == bestF1, s"returned weights score $f1, selection reported $bestF1")
    // selection cannot do worse on val than plain last-epoch training
    // (identical trajectory, so the last epoch is one of its candidates)
    val last = Gru.fit(train, cfg)
    val lastPairs = valSet.map { case (s, l) => (last.predict(s).toDouble, l.toDouble) }
    val (_, _, lastF1) = Estimator.evaluate(lastPairs, minBucket = 0)
    assert(bestF1 >= lastF1)
    // determinism: same seed, same selected epoch and weights
    val (again, epochAgain, f1Again) = Gru.fitValSelected(train, cfg, valSet)
    assert(epochAgain == bestEpoch && f1Again == bestF1)
    assert(again.p.w.toSeq == fitted.p.w.toSeq)
    intercept[IllegalArgumentException] { Gru.fitValSelected(train, cfg, Nil) }
    // epochs == 0 would silently return an all-zero model (onEpoch never
    // fires, the final arraycopy overwrites the seeded init) — refuse
    intercept[IllegalArgumentException] {
      Gru.fitValSelected(train, cfg.copy(epochs = 0), valSet)
    }
  }

  test("weighted loss gradient matches finite differences and scales exactly") {
    val cfg = Gru.Config(inputDim = 3, hidden = 4, classes = 3, seed = 6L)
    val p = Gru.Params(cfg)
    val rnd = new scala.util.Random(123)
    val seq = Array.fill(5)(Array.fill(3)(rnd.nextDouble() * 2 - 1))
    val label = 1
    val w = 3.7
    // analytic weighted gradient
    val g = new Array[Double](Gru.Params.size(cfg))
    val loss = Gru.lossAndGrad(p, seq, label, g, w)
    // (1) exact linearity: weighted loss/grad == weight × unweighted —
    // the property that makes inverse-frequency weighting equivalent to
    // fractional oversampling
    val g1 = new Array[Double](g.length)
    val loss1 = Gru.lossAndGrad(p, seq, label, g1)
    assert(math.abs(loss - w * loss1) < 1e-12)
    g.indices.foreach { i =>
      assert(math.abs(g(i) - w * g1(i)) < 1e-12,
        s"grad[$i] not scaled: ${g(i)} vs ${w * g1(i)}")
    }
    // (2) finite differences of the WEIGHTED loss on a probe inside
    // every tensor region (the spec-pinned check for the weighted path)
    val eps = 1e-6
    val regions = Seq(p.offWz, p.offUr, p.offBh, p.offWo, p.offBo)
    regions.foreach { off =>
      val i = off + 1
      val orig = p.w(i)
      p.w(i) = orig + eps
      val lPlus = Gru.lossAndGrad(p, seq, label, new Array[Double](g.length), w)
      p.w(i) = orig - eps
      val lMinus = Gru.lossAndGrad(p, seq, label, new Array[Double](g.length), w)
      p.w(i) = orig
      val numeric = (lPlus - lMinus) / (2 * eps)
      val denom = math.max(1e-8, math.abs(numeric) + math.abs(g(i)))
      assert(math.abs(numeric - g(i)) / denom < 1e-4,
        f"weighted grad at $i: numeric $numeric%.8f vs analytic ${g(i)}%.8f")
    }
  }

  test("fitValSelectedWeighted with unit weights equals fitValSelected bit-for-bit") {
    val data = tinyData(15L, n = 30, len = 5, dim = 4, classes = 3)
    val (train, valSet) = data.splitAt(22)
    val cfg = Gru.Config(inputDim = 4, hidden = 6, classes = 3,
      lr = 1e-2, epochs = 5, batch = 4, seed = 31L)
    val (a, epA, f1A) = Gru.fitValSelected(train, cfg, valSet)
    val (b, epB, f1B) = Gru.fitValSelectedWeighted(
      train.map { case (s, l) => (s, l, 1.0) }, cfg, valSet)
    assert(epA == epB && f1A == f1B)
    assert(a.p.w.toSeq == b.p.w.toSeq)
    // a non-uniform weighting changes the trajectory (sanity that the
    // weights actually reach the optimizer)
    val (c, _, _) = Gru.fitValSelectedWeighted(
      train.map { case (s, l) => (s, l, if (l == 0) 4.0 else 1.0) }, cfg, valSet)
    assert(c.p.w.toSeq != a.p.w.toSeq)
  }
}
