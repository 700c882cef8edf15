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

  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.max(1, Runtime.getRuntime.availableProcessors() / 2),
    r => { val t = new Thread(r, "relcnn-grad"); t.setDaemon(true); t })

  def fit(data: Seq[(Array[Array[Double]], Double)], cfg: Config): Fitted = {
    require(data.nonEmpty, "no training data")
    require(data.forall(_._1.nonEmpty), "empty sequence in training data")
    val p = Params(cfg)
    val n = Params.size(cfg)
    val g = new Array[Double](n)
    val m = new Array[Double](n)
    val v = new Array[Double](n)
    val rnd = new scala.util.Random(cfg.seed ^ 0x9E3779B97F4A7C15L)
    val (b1, b2, eps) = (0.9, 0.999, 1e-8)
    var step = 0
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    val idx = data.indices.toArray
    for (_ <- 1 to cfg.epochs) {
      var i = idx.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val tmp = idx(i); idx(i) = idx(j); idx(j) = tmp
        i -= 1
      }
      var epochLoss = 0.0
      var off = 0
      while (off < idx.length) {
        val end = math.min(off + cfg.batch, idx.length)
        java.util.Arrays.fill(g, 0.0)
        val tasks = (off until end).map { k =>
          new java.util.concurrent.Callable[(Double, Array[Double])] {
            def call(): (Double, Array[Double]) = {
              val (seq, y) = data(idx(k))
              val gi = new Array[Double](n)
              (lossAndGrad(p, seq, y, gi), gi)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        pool.invokeAll(tasks.asJava).asScala.foreach { fut =>
          val (l, gi) = fut.get()
          epochLoss += l
          var q = 0
          while (q < n) { g(q) += gi(q); q += 1 }
        }
        val bs = (end - off).toDouble
        var norm2 = 0.0
        var q = 0
        while (q < n) { g(q) /= bs; norm2 += g(q) * g(q); q += 1 }
        val norm = math.sqrt(norm2)
        val scale = if (norm > cfg.clip) cfg.clip / norm else 1.0
        step += 1
        val bc1 = 1 - math.pow(b1, step)
        val bc2 = 1 - math.pow(b2, step)
        q = 0
        while (q < n) {
          val gq = g(q) * scale
          m(q) = b1 * m(q) + (1 - b1) * gq
          v(q) = b2 * v(q) + (1 - b2) * gq * gq
          p.w(q) -= cfg.lr * (m(q) / bc1) / (math.sqrt(v(q) / bc2) + eps)
          q += 1
        }
        off = end
      }
      losses += epochLoss / idx.length
    }
    Fitted(p, losses.toSeq)
  }
}
