package graft.estimate

import Gru.{affine, addTMatVec, addOuter, sigmoid}
import Gru4.Tree

/** Child-sum TreeLSTM over the encoded query tree — the reference's
  * treelstm estimator family (`dqo/estimator/treelstm/v1/childsum.py`),
  * cell reproduced faithfully INCLUDING its quirk of a tanh forget gate
  * (`F.tanh(fh(child_h) + fx(inputs))` where Tai et al. use a sigmoid):
  *
  *   h~   = sum_k h_k
  *   i    = sigmoid(Wi x + Ui h~ + bi)
  *   o    = sigmoid(Wo x + Uo h~ + bo)
  *   u    = tanh  (Wu x + Uu h~ + bu)
  *   f_k  = tanh  (Fx x + Fh h_k + bf)        (per child)
  *   c    = i * u + sum_k f_k * c_k
  *   h    = o * tanh(c)
  *
  * The root hidden state feeds a linear head regressing log2(runtime)
  * under smooth-L1 (the family's loss/label space). Backward is reverse
  * topological over the tree; every tensor is finite-difference checked
  * in TreeLstmSpec. Training is seed-deterministic (same discipline as
  * [[Gru]]/[[Gru4]]).
  */
object TreeLstm {

  final case class Config(inputDim: Int, hidden: Int,
                          lr: Double = 1e-3, epochs: Int = 30,
                          batch: Int = 32, seed: Long = 17L,
                          clip: Double = 5.0)

  final class Params(val cfg: Config, val w: Array[Double]) {
    import cfg._
    private val hi = hidden * inputDim
    private val hh = hidden * hidden
    val offWi = 0; val offWo = hi; val offWu = 2 * hi
    val offUi = 3 * hi; val offUo = 3 * hi + hh; val offUu = 3 * hi + 2 * hh
    val offBi = 3 * hi + 3 * hh; val offBo = offBi + hidden; val offBu = offBo + hidden
    val offFx = offBu + hidden; val offFh = offFx + hi; val offBf = offFh + hh
    val offWhead = offBf + hidden; val offBhead = offWhead + hidden
    def size: Int = offBhead + 1
  }

  object Params {
    def size(cfg: Config): Int = new Params(cfg, Array.empty).size
    def apply(cfg: Config): Params = {
      val rnd = new scala.util.Random(cfg.seed)
      val p = new Params(cfg, new Array[Double](size(cfg)))
      def fill(off: Int, n: Int, fanIn: Int): Unit = {
        val s = math.sqrt(1.0 / fanIn)
        var i = 0
        while (i < n) { p.w(off + i) = (rnd.nextDouble() * 2 - 1) * s; i += 1 }
      }
      import cfg._
      fill(p.offWi, 3 * hidden * inputDim, inputDim)
      fill(p.offUi, 3 * hidden * hidden, hidden)
      fill(p.offFx, hidden * inputDim, inputDim)
      fill(p.offFh, hidden * hidden, hidden)
      fill(p.offWhead, hidden, hidden)
      p
    }
  }

  private final case class NodeFwd(i: Array[Double], o: Array[Double],
                                   u: Array[Double], fs: Array[Array[Double]],
                                   c: Array[Double], h: Array[Double],
                                   hSum: Array[Double])

  /** Bottom-up forward; returns per-node caches + root prediction. */
  private def forward(p: Params, tree: Tree): (Double, Array[NodeFwd], Array[Int]) = {
    import p.cfg._
    val n = tree.vecs.length
    val order = postorderIndices(tree)
    val fwd = new Array[NodeFwd](n)
    val tmpA = new Array[Double](hidden); val tmpB = new Array[Double](hidden)
    order.foreach { j =>
      val x = tree.vecs(j)
      val kids = tree.children(j)
      val hSum = new Array[Double](hidden)
      kids.foreach { k =>
        val hk = fwd(k).h
        var q = 0
        while (q < hidden) { hSum(q) += hk(q); q += 1 }
      }
      def gate(offW: Int, offU: Int, offB: Int, tanh: Boolean): Array[Double] = {
        affine(p.w, offW, hidden, inputDim, x, offB, tmpA)
        affine(p.w, offU, hidden, hidden, hSum, -1, tmpB)
        val out = new Array[Double](hidden)
        var q = 0
        while (q < hidden) {
          out(q) = if (tanh) math.tanh(tmpA(q) + tmpB(q)) else sigmoid(tmpA(q) + tmpB(q))
          q += 1
        }
        out
      }
      val gi = gate(p.offWi, p.offUi, p.offBi, tanh = false)
      val go = gate(p.offWo, p.offUo, p.offBo, tanh = false)
      val gu = gate(p.offWu, p.offUu, p.offBu, tanh = true)
      // Fx x + bf is child-independent: compute once per node, reuse
      // across the per-child forget gates
      val fxShared = new Array[Double](hidden)
      affine(p.w, p.offFx, hidden, inputDim, x, p.offBf, fxShared)
      val fs = kids.map { k =>
        affine(p.w, p.offFh, hidden, hidden, fwd(k).h, -1, tmpB)
        Array.tabulate(hidden)(q => math.tanh(fxShared(q) + tmpB(q)))
      }
      val c = new Array[Double](hidden)
      var q = 0
      while (q < hidden) { c(q) = gi(q) * gu(q); q += 1 }
      kids.indices.foreach { ki =>
        val ck = fwd(kids(ki)).c; val f = fs(ki)
        q = 0
        while (q < hidden) { c(q) += f(q) * ck(q); q += 1 }
      }
      val h = Array.tabulate(hidden)(q => go(q) * math.tanh(c(q)))
      fwd(j) = NodeFwd(gi, go, gu, fs, c, h, hSum)
    }
    val out = new Array[Double](1)
    affine(p.w, p.offWhead, 1, hidden, fwd(tree.root).h, p.offBhead, out)
    (out(0), fwd, order)
  }

  private def postorderIndices(t: Tree): Array[Int] = {
    val b = Array.newBuilder[Int]
    def go(i: Int): Unit = { t.children(i).foreach(go); b += i }
    go(t.root)
    b.result()
  }

  def predictLog2(p: Params, tree: Tree): Double = forward(p, tree)._1

  /** Smooth-L1 loss + full gradient (accumulates into g). */
  def lossAndGrad(p: Params, tree: Tree, target: Double, g: Array[Double]): Double = {
    import p.cfg._
    val (pred, fwd, order) = forward(p, tree)
    val d = pred - target
    val (loss, dPred) =
      if (math.abs(d) < 1.0) (0.5 * d * d, d) else (math.abs(d) - 0.5, math.signum(d))
    val n = tree.vecs.length
    val dh = Array.fill(n)(new Array[Double](hidden))
    val dc = Array.fill(n)(new Array[Double](hidden))
    addOuter(g, p.offWhead, p.offBhead, Array(dPred), fwd(tree.root).h)
    addTMatVec(p.w, p.offWhead, 1, hidden, Array(dPred), dh(tree.root))
    // reverse topological: parents before children
    order.reverse.foreach { j =>
      val x = tree.vecs(j)
      val f = fwd(j)
      val kids = tree.children(j)
      // h = o * tanh(c)
      val doPre = new Array[Double](hidden)
      var q = 0
      while (q < hidden) {
        val tc = math.tanh(f.c(q))
        doPre(q) = dh(j)(q) * tc * f.o(q) * (1 - f.o(q))
        dc(j)(q) += dh(j)(q) * f.o(q) * (1 - tc * tc)
        q += 1
      }
      val diPre = new Array[Double](hidden)
      val duPre = new Array[Double](hidden)
      q = 0
      while (q < hidden) {
        diPre(q) = dc(j)(q) * f.u(q) * f.i(q) * (1 - f.i(q))
        duPre(q) = dc(j)(q) * f.i(q) * (1 - f.u(q) * f.u(q))
        q += 1
      }
      addOuter(g, p.offWi, p.offBi, diPre, x)
      addOuter(g, p.offUi, -1, diPre, f.hSum)
      addOuter(g, p.offWo, p.offBo, doPre, x)
      addOuter(g, p.offUo, -1, doPre, f.hSum)
      addOuter(g, p.offWu, p.offBu, duPre, x)
      addOuter(g, p.offUu, -1, duPre, f.hSum)
      val dhSum = new Array[Double](hidden)
      addTMatVec(p.w, p.offUi, hidden, hidden, diPre, dhSum)
      addTMatVec(p.w, p.offUo, hidden, hidden, doPre, dhSum)
      addTMatVec(p.w, p.offUu, hidden, hidden, duPre, dhSum)
      kids.indices.foreach { ki =>
        val k = kids(ki)
        val fk = f.fs(ki); val ck = fwd(k).c
        val dfPre = new Array[Double](hidden)
        q = 0
        while (q < hidden) {
          dfPre(q) = dc(j)(q) * ck(q) * (1 - fk(q) * fk(q))
          dc(k)(q) += dc(j)(q) * fk(q)
          // h~ path + f-gate path into the child's hidden grad
          dh(k)(q) += dhSum(q)
          q += 1
        }
        addOuter(g, p.offFx, p.offBf, dfPre, x)
        addOuter(g, p.offFh, -1, dfPre, fwd(k).h)
        addTMatVec(p.w, p.offFh, hidden, hidden, dfPre, dh(k))
      }
      ()
    }
    loss
  }

  final case class Fitted(p: Params, losses: Seq[Double]) {
    def predict(tree: Tree): Double = predictLog2(p, tree)
  }

  /** Adam over (tree, log2 runtime) via the shared [[AdamTrainer]]
    * loop; deterministic per seed.
    */
  def fit(data: Seq[(Tree, Double)], cfg: Config): Fitted = {
    require(data.nonEmpty, "no training data")
    require(data.forall(_._1.vecs.nonEmpty), "empty tree in training data")
    val p = Params(cfg)
    val losses = AdamTrainer.run[(Tree, Double)](data, p.w,
      AdamTrainer.Opt(cfg.lr, cfg.epochs, cfg.batch, cfg.seed, cfg.clip),
      { case ((tree, y), g) => lossAndGrad(p, tree, y, g) })
    Fitted(p, losses)
  }
}
