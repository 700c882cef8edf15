package graft.estimate

import Gru.{affine, addTMatVec, addOuter}

/** Convolutional estimator family — the reference's relcnn
  * (`dqo/estimator/relcnn/v1/model.py`): convolutions over the padded
  * node-vector matrix, tanh activations, max pooling, an MLP head
  * regressing log2(runtime) under smooth-L1. Re-expressed as a 1-D
  * temporal convolution (kernel width 3 over the node sequence, full
  * input depth per filter) with a GLOBAL max pool — the same
  * family (conv + tanh + max-pool + tanh head + smooth-L1), with the
  * reference's fixed 125-row zero-padding replaced by variable-length
  * sequences (zero-padded only up to the kernel width), and the
  * stacked-conv/5-layer head trimmed to one conv + one tanh layer, the
  * same depth trim [[Gru4]] documents for its head.
  *
  * Max-pool backward routes the gradient to the argmax window
  * (standard subgradient; ties are measure-zero on continuous inputs).
  * Finite-difference checked in RelCnnSpec; seed-deterministic.
  */
object RelCnn {

  final case class Config(inputDim: Int, filters: Int, headHidden: Int = 32,
                          lr: Double = 1e-3, epochs: Int = 30,
                          batch: Int = 32, seed: Long = 17L,
                          clip: Double = 5.0)

  val KernelW = 3

  final class Params(val cfg: Config, val w: Array[Double]) {
    import cfg._
    val offConv = 0                                   // filters x (KernelW*inputDim)
    val offBc: Int = filters * KernelW * inputDim
    val offW1: Int = offBc + filters                  // headHidden x filters
    val offB1: Int = offW1 + headHidden * filters
    val offW2: Int = offB1 + headHidden               // 1 x headHidden
    val offB2: Int = offW2 + headHidden
    def size: Int = offB2 + 1
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
      fill(p.offConv, filters * KernelW * inputDim, KernelW * inputDim)
      fill(p.offW1, headHidden * filters, filters)
      fill(p.offW2, headHidden, headHidden)
      p
    }
  }

  /** Zero-pad to at least KernelW rows and build sliding windows. */
  private def windows(cfg: Config, seq: Array[Array[Double]]): Array[Array[Double]] = {
    val padded =
      if (seq.length >= KernelW) seq
      else seq ++ Array.fill(KernelW - seq.length)(new Array[Double](cfg.inputDim))
    Array.tabulate(padded.length - KernelW + 1) { t =>
      val win = new Array[Double](KernelW * cfg.inputDim)
      var k = 0
      while (k < KernelW) {
        System.arraycopy(padded(t + k), 0, win, k * cfg.inputDim, cfg.inputDim)
        k += 1
      }
      win
    }
  }

  private final case class Fwd(wins: Array[Array[Double]],
                               acts: Array[Array[Double]],   // per window, per filter
                               argmax: Array[Int],           // per filter
                               pooled: Array[Double], h1: Array[Double])

  private def forward(p: Params, seq: Array[Array[Double]]): (Double, Fwd) = {
    import p.cfg._
    val wins = windows(p.cfg, seq)
    val acts = Array.ofDim[Double](wins.length, filters)
    val tmp = new Array[Double](filters)
    var t = 0
    while (t < wins.length) {
      affine(p.w, p.offConv, filters, KernelW * inputDim, wins(t), p.offBc, tmp)
      var k = 0
      while (k < filters) { acts(t)(k) = math.tanh(tmp(k)); k += 1 }
      t += 1
    }
    val argmax = new Array[Int](filters)
    val pooled = new Array[Double](filters)
    var k = 0
    while (k < filters) {
      var best = 0
      t = 1
      while (t < wins.length) { if (acts(t)(k) > acts(best)(k)) best = t; t += 1 }
      argmax(k) = best; pooled(k) = acts(best)(k)
      k += 1
    }
    val a1 = new Array[Double](headHidden)
    affine(p.w, p.offW1, headHidden, filters, pooled, p.offB1, a1)
    val h1 = a1.map(math.tanh)
    val out = new Array[Double](1)
    affine(p.w, p.offW2, 1, headHidden, h1, p.offB2, out)
    (out(0), Fwd(wins, acts, argmax, pooled, h1))
  }

  def predictLog2(p: Params, seq: Array[Array[Double]]): Double = forward(p, seq)._1

  def lossAndGrad(p: Params, seq: Array[Array[Double]], target: Double,
                  g: Array[Double]): Double = {
    import p.cfg._
    val (pred, f) = forward(p, seq)
    val d = pred - target
    val (loss, dPred) =
      if (math.abs(d) < 1.0) (0.5 * d * d, d) else (math.abs(d) - 0.5, math.signum(d))
    val dOut = Array(dPred)
    addOuter(g, p.offW2, p.offB2, dOut, f.h1)
    val dh1 = new Array[Double](headHidden)
    addTMatVec(p.w, p.offW2, 1, headHidden, dOut, dh1)
    val da1 = new Array[Double](headHidden)
    var i = 0
    while (i < headHidden) { da1(i) = dh1(i) * (1 - f.h1(i) * f.h1(i)); i += 1 }
    addOuter(g, p.offW1, p.offB1, da1, f.pooled)
    val dPooled = new Array[Double](filters)
    addTMatVec(p.w, p.offW1, headHidden, filters, da1, dPooled)
    // max-pool routes each filter's gradient to its argmax window
    var k = 0
    while (k < filters) {
      val t = f.argmax(k)
      val a = f.acts(t)(k)
      val dPre = dPooled(k) * (1 - a * a)
      val base = p.offConv + k * KernelW * inputDim
      val win = f.wins(t)
      var c = 0
      while (c < win.length) { g(base + c) += dPre * win(c); c += 1 }
      g(p.offBc + k) += dPre
      k += 1
    }
    loss
  }

  final case class Fitted(p: Params, losses: Seq[Double]) {
    def predict(seq: Array[Array[Double]]): Double = predictLog2(p, seq)
  }

  /** Adam over (sequence, log2 runtime) via the shared [[AdamTrainer]]
    * loop; deterministic per seed.
    */
  def fit(data: Seq[(Array[Array[Double]], Double)], cfg: Config): Fitted = {
    require(data.nonEmpty, "no training data")
    require(data.forall(_._1.nonEmpty), "empty sequence in training data")
    val p = Params(cfg)
    val losses = AdamTrainer.run[(Array[Array[Double]], Double)](data, p.w,
      AdamTrainer.Opt(cfg.lr, cfg.epochs, cfg.batch, cfg.seed, cfg.clip),
      { case ((seq, y), g) => lossAndGrad(p, seq, y, g) })
    Fitted(p, losses)
  }
}
