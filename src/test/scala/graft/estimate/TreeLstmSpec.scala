package graft.estimate

import org.scalatest.funsuite.AnyFunSuite

/** Child-sum TreeLSTM: finite-difference gradient check over every
  * tensor (branching AND chain trees — the two shapes that exercise
  * different backward paths), learning and determinism gates.
  */
class TreeLstmSpec extends AnyFunSuite {

  private def vec(dim: Int, seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextDouble() * 2 - 1)
  }

  private def check(parents: Array[Int], tag: String): Unit = {
    val cfg = TreeLstm.Config(inputDim = 3, hidden = 3, seed = 9L)
    val p = TreeLstm.Params(cfg)
    val tree = Gru4.fromParents(parents,
      Array.tabulate(parents.length)(i => vec(3, 100 + i)))
    val target = 1.7
    val g = new Array[Double](TreeLstm.Params.size(cfg))
    TreeLstm.lossAndGrad(p, tree, target, g)
    val eps = 1e-6
    val probes = Seq(
      "Wi" -> p.offWi, "Wo" -> p.offWo, "Wu" -> p.offWu,
      "Ui" -> p.offUi, "Uo" -> p.offUo, "Uu" -> p.offUu,
      "bi" -> p.offBi, "bo" -> p.offBo, "bu" -> p.offBu,
      "Fx" -> p.offFx, "Fh" -> p.offFh, "bf" -> p.offBf,
      "Whead" -> p.offWhead, "bhead" -> p.offBhead)
    probes.foreach { case (name, off) =>
      (0 until 2).foreach { k =>
        val i = off + k
        if (i < p.w.length) {
          val orig = p.w(i)
          p.w(i) = orig + eps
          val lp = TreeLstm.lossAndGrad(p, tree, target, new Array[Double](g.length))
          p.w(i) = orig - eps
          val lm = TreeLstm.lossAndGrad(p, tree, target, new Array[Double](g.length))
          p.w(i) = orig
          val numeric = (lp - lm) / (2 * eps)
          val denom = math.max(1e-8, math.abs(numeric) + math.abs(g(i)))
          assert(math.abs(numeric - g(i)) / denom < 1e-4,
            f"$tag $name[$k]: numeric $numeric%.8f vs analytic ${g(i)}%.8f")
        }
      }
    }
  }

  test("analytic gradient matches finite differences on a branching tree") {
    check(Array(-1, 0, 0, 1, 1, 2), "branching")
  }

  test("analytic gradient matches finite differences on a deep chain") {
    check(Array(-1, 0, 1, 2, 3, 4), "chain")
  }

  test("fit regresses a structure-dependent target") {
    val rnd = new scala.util.Random(13)
    val data = (1 to 50).map { i =>
      val n = 3 + rnd.nextInt(5)
      val parents = Array.tabulate(n)(j => if (j == 0) -1 else rnd.nextInt(j))
      val vecs = Array.tabulate(n)(j => vec(4, i * 100 + j))
      (Gru4.fromParents(parents, vecs), vecs.map(_(0)).sum + n * 0.3)
    }
    val cfg = TreeLstm.Config(inputDim = 4, hidden = 10,
      lr = 5e-3, epochs = 80, batch = 10, seed = 3L)
    val fitted = TreeLstm.fit(data, cfg)
    assert(fitted.losses.head > fitted.losses.last * 3,
      s"loss barely moved: ${fitted.losses.head} -> ${fitted.losses.last}")
    val mae = data.map { case (t, y) => math.abs(fitted.predict(t) - y) }.sum / data.size
    assert(mae < 0.5, s"failed to regress: mae $mae")
  }

  test("training is bit-deterministic for a fixed seed") {
    val data = (1 to 12).map { i =>
      (Gru4.fromParents(Array(-1, 0, 0),
        Array.tabulate(3)(j => vec(3, i * 10 + j))), i * 0.1)
    }
    val cfg = TreeLstm.Config(inputDim = 3, hidden = 4,
      epochs = 4, batch = 4, seed = 77L)
    val a = TreeLstm.fit(data, cfg)
    val b = TreeLstm.fit(data, cfg)
    assert(a.p.w.toSeq == b.p.w.toSeq)
    assert(a.losses == b.losses)
  }
}
