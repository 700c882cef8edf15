package graft.estimate

import org.scalatest.funsuite.AnyFunSuite

/** v20 four-traversal GRU: traversal-order semantics pinned against the
  * reference's Tree definitions, full finite-difference gradient check
  * (all four blocks + head), regression-learning and determinism gates.
  */
class Gru4Spec extends AnyFunSuite {

  private def vec(dim: Int, seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextDouble() * 2 - 1)
  }

  test("traversals match the reference semantics incl. binary-style inorder") {
    //        0
    //       / \
    //      1   2
    //     /|   |
    //    3 4   5
    val parents = Array(-1, 0, 0, 1, 1, 2)
    val t = Gru4.fromParents(parents, Array.fill(6)(Array(0.0)))
    val Array(pre, ino, post, bfs) = Gru4.traversals(t)
    assert(pre.toSeq == Seq(0, 1, 3, 4, 2, 5))
    // inorder (child0, node, child1-when-exactly-2): 3,1,4 then 0 then
    // right subtree 2 has ONE child -> child0 first, then 2, no second
    assert(ino.toSeq == Seq(3, 1, 4, 0, 5, 2))
    assert(post.toSeq == Seq(3, 4, 1, 5, 2, 0))
    assert(bfs.toSeq == Seq(0, 1, 2, 3, 4, 5))
  }

  test("inorder and postorder skip children 2+ on wide nodes (reference quirk)") {
    //       0
    //      /|\
    //     1 2 3     <- 3-child root: the reference's iterative stacks
    //     |            only push child 1 when len(children) == 2, so
    //     4            child 2 (node 3) is never visited
    val parents = Array(-1, 0, 0, 0, 1)
    val t = Gru4.fromParents(parents, Array.fill(5)(Array(0.0)))
    val Array(pre, ino, post, bfs) = Gru4.traversals(t)
    assert(pre.toSeq == Seq(0, 1, 4, 2, 3))
    assert(bfs.toSeq == Seq(0, 1, 2, 3, 4))
    assert(ino.toSeq == Seq(4, 1, 0))   // 3-child root: no "child 1" leg
    assert(post.toSeq == Seq(4, 1, 0))  // ditto — node 2 and 3 skipped
  }

  test("analytic gradient matches finite differences across blocks and head") {
    val cfg = Gru4.Config(inputDim = 3, hidden = 3, headHidden = 4, seed = 9L)
    val p = Gru4.Params(cfg)
    val parents = Array(-1, 0, 0, 1, 1)
    val tree = Gru4.fromParents(parents,
      Array.tabulate(5)(i => vec(3, 100 + i)))
    val target = 2.5
    val g = new Array[Double](Gru4.Params.size(cfg))
    Gru4.lossAndGrad(p, tree, target, g)
    val eps = 1e-6
    val probes =
      p.blocks.zipWithIndex.flatMap { case (b, bi) =>
        Seq(s"b$bi.Wz" -> b.offWz, s"b$bi.Uh" -> b.offUh, s"b$bi.bh" -> b.offBh)
      } ++ Seq("W1" -> p.offW1, "b1" -> p.offB1, "W2" -> p.offW2, "b2" -> p.offB2)
    probes.foreach { case (name, off) =>
      (0 until 2).foreach { k =>
        val i = off + k
        if (i < p.w.length) {
          val orig = p.w(i)
          p.w(i) = orig + eps
          val lp = Gru4.lossAndGrad(p, tree, target, new Array[Double](g.length))
          p.w(i) = orig - eps
          val lm = Gru4.lossAndGrad(p, tree, target, new Array[Double](g.length))
          p.w(i) = orig
          val numeric = (lp - lm) / (2 * eps)
          val denom = math.max(1e-8, math.abs(numeric) + math.abs(g(i)))
          assert(math.abs(numeric - g(i)) / denom < 1e-4,
            f"$name[$k]: numeric $numeric%.8f vs analytic ${g(i)}%.8f")
        }
      }
    }
  }

  test("fit regresses a structure-dependent target and loss decreases") {
    val rnd = new scala.util.Random(31)
    val data = (1 to 50).map { i =>
      val n = 3 + rnd.nextInt(5)
      val parents = Array.tabulate(n)(j => if (j == 0) -1 else rnd.nextInt(j))
      val vecs = Array.tabulate(n)(j => vec(4, i * 100 + j))
      val tree = Gru4.fromParents(parents, vecs)
      // target depends on content AND size — learnable from traversals
      val y = vecs.map(_(0)).sum + n * 0.3
      (tree, y)
    }
    val cfg = Gru4.Config(inputDim = 4, hidden = 10, headHidden = 8,
      lr = 5e-3, epochs = 80, batch = 10, seed = 3L)
    val fitted = Gru4.fit(data, cfg)
    assert(fitted.losses.head > fitted.losses.last * 3,
      s"loss barely moved: ${fitted.losses.head} -> ${fitted.losses.last}")
    val mae = data.map { case (t, y) => math.abs(fitted.predict(t) - y) }.sum / data.size
    assert(mae < 0.5, s"failed to regress: mae $mae")
  }

  test("training is bit-deterministic for a fixed seed") {
    val data = (1 to 12).map { i =>
      val parents = Array(-1, 0, 0)
      (Gru4.fromParents(parents, Array.tabulate(3)(j => vec(3, i * 10 + j))), i * 0.1)
    }
    val cfg = Gru4.Config(inputDim = 3, hidden = 4, headHidden = 4,
      epochs = 4, batch = 4, seed = 77L)
    val a = Gru4.fit(data, cfg)
    val b = Gru4.fit(data, cfg)
    assert(a.p.w.toSeq == b.p.w.toSeq)
    assert(a.losses == b.losses)
  }
}
