package graft.estimate

import Gru.{affine, addTMatVec, addOuter}

/** The Neo regressor as its own network, from scratch — closing the
  * last "approximated by MLlib" family. Fidelity note: BOTH Neo
  * variants in the reference are flat fully-connected regressors over
  * the flat join+predicate bit vector — torch v1
  * (`dqo/estimator/others/neo/v1/model.py:22-36`: Linear 89→64→32→16→1,
  * ReLU, smooth-L1, Adam lr 1e-4) and the Keras `neo_tf` twin
  * (`others/neo_tf/query_estimator.py:15-23`: Dense 318→64→32→16→1,
  * same shape, wider input). Neither contains the Neo PAPER's tree
  * convolution — there is no tree-conv in the reference to reproduce;
  * the convolutional architecture family is covered by [[RelCnn]].
  * This net mirrors v1 exactly: three ReLU hidden layers (64/32/16), a
  * linear scalar head, smooth-L1 loss on the raw runtime label space
  * the caller chooses (the reference feeds log-scaled runtimes), Adam
  * at lr 1e-4 via the shared bit-deterministic [[AdamTrainer]].
  *
  * Gradients are finite-difference checked in NeoNetSpec; training is
  * seed-deterministic (same discipline as [[Gru]]).
  */
object NeoNet {

  final case class Config(inputDim: Int, h1: Int = 64, h2: Int = 32, h3: Int = 16,
                          lr: Double = 1e-4, epochs: Int = 60,
                          batch: Int = 32, seed: Long = 17L,
                          clip: Double = 5.0)

  final class Params(val cfg: Config, val w: Array[Double]) {
    import cfg._
    val offW1 = 0                                  // h1 x inputDim
    val offB1: Int = h1 * inputDim
    val offW2: Int = offB1 + h1                    // h2 x h1
    val offB2: Int = offW2 + h2 * h1
    val offW3: Int = offB2 + h2                    // h3 x h2
    val offB3: Int = offW3 + h3 * h2
    val offW4: Int = offB3 + h3                    // 1 x h3
    val offB4: Int = offW4 + h3
    def size: Int = offB4 + 1
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
      fill(p.offW1, h1 * inputDim, inputDim)
      fill(p.offW2, h2 * h1, h1)
      fill(p.offW3, h3 * h2, h2)
      fill(p.offW4, h3, h3)
      p
    }
  }

  private final case class Fwd(a1: Array[Double], a2: Array[Double],
                               a3: Array[Double], out: Double)

  private def forward(p: Params, x: Array[Double]): Fwd = {
    import p.cfg._
    val a1 = new Array[Double](h1)
    affine(p.w, p.offW1, h1, inputDim, x, p.offB1, a1)
    var i = 0
    while (i < h1) { a1(i) = math.max(0.0, a1(i)); i += 1 }
    val a2 = new Array[Double](h2)
    affine(p.w, p.offW2, h2, h1, a1, p.offB2, a2)
    i = 0
    while (i < h2) { a2(i) = math.max(0.0, a2(i)); i += 1 }
    val a3 = new Array[Double](h3)
    affine(p.w, p.offW3, h3, h2, a2, p.offB3, a3)
    i = 0
    while (i < h3) { a3(i) = math.max(0.0, a3(i)); i += 1 }
    val out = new Array[Double](1)
    affine(p.w, p.offW4, 1, h3, a3, p.offB4, out)
    Fwd(a1, a2, a3, out(0))
  }

  def predict(p: Params, x: Array[Double]): Double = forward(p, x).out

  /** Smooth-L1 (the reference's F.smooth_l1_loss) on predict(x) vs
    * target; accumulates the gradient into `g`, returns the loss. */
  def lossAndGrad(p: Params, x: Array[Double], target: Double,
                  g: Array[Double]): Double = {
    import p.cfg._
    val f = forward(p, x)
    val d = f.out - target
    val (loss, dOutV) =
      if (math.abs(d) < 1.0) (0.5 * d * d, d) else (math.abs(d) - 0.5, math.signum(d))
    val dOut = Array(dOutV)
    addOuter(g, p.offW4, p.offB4, dOut, f.a3)
    val d3 = new Array[Double](h3)
    addTMatVec(p.w, p.offW4, 1, h3, dOut, d3)
    var i = 0
    while (i < h3) { if (f.a3(i) <= 0) d3(i) = 0.0; i += 1 }
    addOuter(g, p.offW3, p.offB3, d3, f.a2)
    val d2 = new Array[Double](h2)
    addTMatVec(p.w, p.offW3, h3, h2, d3, d2)
    i = 0
    while (i < h2) { if (f.a2(i) <= 0) d2(i) = 0.0; i += 1 }
    addOuter(g, p.offW2, p.offB2, d2, f.a1)
    val d1 = new Array[Double](h1)
    addTMatVec(p.w, p.offW2, h2, h1, d2, d1)
    i = 0
    while (i < h1) { if (f.a1(i) <= 0) d1(i) = 0.0; i += 1 }
    addOuter(g, p.offW1, p.offB1, d1, x)
    loss
  }

  final case class Fitted(p: Params, losses: Seq[Double]) {
    def predict(x: Array[Double]): Double = NeoNet.predict(p, x)
  }

  def fit(data: Seq[(Array[Double], Double)], cfg: Config): Fitted = {
    require(data.nonEmpty, "no training data")
    require(data.forall(_._1.length == cfg.inputDim),
      s"feature width mismatch vs inputDim=${cfg.inputDim}")
    val p = Params(cfg)
    val losses = AdamTrainer.run[(Array[Double], Double)](data, p.w,
      AdamTrainer.Opt(cfg.lr, cfg.epochs, cfg.batch, cfg.seed, cfg.clip),
      { case ((x, y), g) => lossAndGrad(p, x, y, g) })
    Fitted(p, losses)
  }
}
