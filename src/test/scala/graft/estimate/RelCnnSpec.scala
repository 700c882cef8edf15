package graft.estimate

import org.scalatest.funsuite.AnyFunSuite

/** relcnn family: finite-difference gradient check (conv + head through
  * the max-pool routing), short-sequence padding, learning, determinism.
  */
class RelCnnSpec extends AnyFunSuite {

  private def vec(dim: Int, seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextDouble() * 2 - 1)
  }

  test("analytic gradient matches finite differences through the max pool") {
    val cfg = RelCnn.Config(inputDim = 3, filters = 4, headHidden = 4, seed = 9L)
    val p = RelCnn.Params(cfg)
    val seq = Array.tabulate(7)(i => vec(3, 200 + i))
    val target = 1.3
    val g = new Array[Double](RelCnn.Params.size(cfg))
    RelCnn.lossAndGrad(p, seq, target, g)
    val eps = 1e-6
    val probes = Seq("conv" -> p.offConv, "bc" -> p.offBc,
      "W1" -> p.offW1, "b1" -> p.offB1, "W2" -> p.offW2, "b2" -> p.offB2)
    probes.foreach { case (name, off) =>
      (0 until 3).foreach { k =>
        val i = off + k
        if (i < p.w.length) {
          val orig = p.w(i)
          p.w(i) = orig + eps
          val lp = RelCnn.lossAndGrad(p, seq, target, new Array[Double](g.length))
          p.w(i) = orig - eps
          val lm = RelCnn.lossAndGrad(p, seq, target, new Array[Double](g.length))
          p.w(i) = orig
          val numeric = (lp - lm) / (2 * eps)
          val denom = math.max(1e-8, math.abs(numeric) + math.abs(g(i)))
          assert(math.abs(numeric - g(i)) / denom < 1e-4,
            f"$name[$k]: numeric $numeric%.8f vs analytic ${g(i)}%.8f")
        }
      }
    }
  }

  test("sequences shorter than the kernel are zero-padded, not rejected") {
    val cfg = RelCnn.Config(inputDim = 3, filters = 2, headHidden = 2)
    val p = RelCnn.Params(cfg)
    val one = Array(vec(3, 5))
    val two = Array(vec(3, 5), vec(3, 6))
    assert(!RelCnn.predictLog2(p, one).isNaN)
    assert(!RelCnn.predictLog2(p, two).isNaN)
  }

  test("fit regresses a content-dependent target") {
    val rnd = new scala.util.Random(19)
    val data = (1 to 50).map { i =>
      val len = 3 + rnd.nextInt(6)
      val seq = Array.tabulate(len)(j => vec(4, i * 100 + j))
      (seq, seq.map(_(0)).max * 2.0 + len * 0.1) // max-pool-learnable
    }
    val cfg = RelCnn.Config(inputDim = 4, filters = 12, headHidden = 8,
      lr = 5e-3, epochs = 80, batch = 10, seed = 3L)
    val fitted = RelCnn.fit(data, cfg)
    assert(fitted.losses.head > fitted.losses.last * 3,
      s"loss barely moved: ${fitted.losses.head} -> ${fitted.losses.last}")
    val mae = data.map { case (s, y) => math.abs(fitted.predict(s) - y) }.sum / data.size
    assert(mae < 0.4, s"failed to regress: mae $mae")
  }

  test("training is bit-deterministic for a fixed seed") {
    val data = (1 to 12).map { i =>
      (Array.tabulate(4)(j => vec(3, i * 10 + j)), i * 0.1)
    }
    val cfg = RelCnn.Config(inputDim = 3, filters = 4, headHidden = 4,
      epochs = 4, batch = 4, seed = 77L)
    val a = RelCnn.fit(data, cfg)
    val b = RelCnn.fit(data, cfg)
    assert(a.p.w.toSeq == b.p.w.toSeq)
    assert(a.losses == b.losses)
  }
}
