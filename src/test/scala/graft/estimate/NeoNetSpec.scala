package graft.estimate

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch Neo regressor (flat 4-layer MLP, the shape BOTH
  * reference Neo variants actually are — see NeoNet's fidelity note):
  * finite-difference gradient check on every layer, smooth-L1 loss
  * regions, learning and determinism gates.
  */
class NeoNetSpec extends AnyFunSuite {

  private def vec(dim: Int, seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextDouble() * 2 - 1)
  }

  test("analytic gradient matches finite differences on every layer") {
    val cfg = NeoNet.Config(inputDim = 6, h1 = 5, h2 = 4, h3 = 3, seed = 9L)
    val p = NeoNet.Params(cfg)
    val x = vec(6, 42)
    // check both smooth-L1 regions: quadratic (|d|<1) and linear
    for (target <- Seq(NeoNet.predict(p, x) + 0.3, NeoNet.predict(p, x) + 2.5)) {
      val g = new Array[Double](NeoNet.Params.size(cfg))
      NeoNet.lossAndGrad(p, x, target, g)
      val eps = 1e-6
      val probes = Seq("W1" -> p.offW1, "b1" -> p.offB1, "W2" -> p.offW2,
        "b2" -> p.offB2, "W3" -> p.offW3, "b3" -> p.offB3,
        "W4" -> p.offW4, "b4" -> p.offB4)
      probes.foreach { case (name, off) =>
        (0 until 3).foreach { k =>
          val i = off + k
          if (i < p.w.length) {
            val orig = p.w(i)
            p.w(i) = orig + eps
            val lp = NeoNet.lossAndGrad(p, x, target, new Array[Double](g.length))
            p.w(i) = orig - eps
            val lm = NeoNet.lossAndGrad(p, x, target, new Array[Double](g.length))
            p.w(i) = orig
            val numeric = (lp - lm) / (2 * eps)
            val denom = math.max(1e-8, math.abs(numeric) + math.abs(g(i)))
            assert(math.abs(numeric - g(i)) / denom < 1e-4,
              f"$name[$k]: numeric $numeric%.8f vs analytic ${g(i)}%.8f")
          }
        }
      }
    }
  }

  test("fit regresses a linear+interaction target and loss decreases") {
    val rnd = new scala.util.Random(19)
    val data = (1 to 80).map { i =>
      val x = vec(8, i)
      val y = 1.5 * x(0) - 0.8 * x(3) + x(1) * x(2) + 0.5
      (x, y)
    }
    val cfg = NeoNet.Config(inputDim = 8, lr = 2e-3, epochs = 150,
      batch = 16, seed = 3L)
    val fitted = NeoNet.fit(data, cfg)
    assert(fitted.losses.head > fitted.losses.last * 3,
      s"loss barely moved: ${fitted.losses.head} -> ${fitted.losses.last}")
    val mae = data.map { case (x, y) => math.abs(fitted.predict(x) - y) }.sum / data.size
    assert(mae < 0.2, s"failed to regress: mae $mae")
  }

  test("training is bit-deterministic for a fixed seed") {
    val data = (1 to 16).map(i => (vec(5, i), i * 0.2))
    val cfg = NeoNet.Config(inputDim = 5, epochs = 5, batch = 4, seed = 77L)
    val a = NeoNet.fit(data, cfg)
    val b = NeoNet.fit(data, cfg)
    assert(a.p.w.toSeq == b.p.w.toSeq)
  }

  test("rejects feature width mismatch") {
    val cfg = NeoNet.Config(inputDim = 5)
    assertThrows[IllegalArgumentException] {
      NeoNet.fit(Seq((vec(4, 1), 1.0)), cfg)
    }
  }
}
