package graft.estimate

import Gru.{affine, addTMatVec, addOuter, sigmoid}
import graft.encode.SetEncoders.MscnEncoding

/** The MSCN "SetConv" estimator, from scratch — the last of the
  * reference's model families (`dqo/estimator/others/kipf/model.py:8-48`,
  * `SetConv.forward` at :20) reproduced natively rather than
  * approximated by a fixed-vector summary model. Architecture, faithfully:
  * three independent set branches (tables, predicates, joins), each a
  * 2-layer ReLU MLP applied per set row, masked and AVERAGED over the
  * set (sum of masked hiddens / mask count — the deep-sets pooling at
  * model.py:26-30), concatenated into a ReLU hidden layer and a SIGMOID
  * scalar head. Training matches the reference notebook
  * (`kifp_query_only_model.ipynb`): labels are min-max-normalized
  * ln(runtime) clamped to [0,1] (`prep_data.py normalize_labels`), the
  * loss is squared error between the EXP-UNNORMALIZED prediction and
  * target (the notebook's active `qerror_loss` branch — `(pred - target)**2`
  * on `unnormalize_torch`ed values, NOT the commented-out ratio q-error),
  * Adam at lr 1e-3 — here via the shared bit-deterministic
  * [[AdamTrainer]] loop with global-norm clipping.
  *
  * Documented divergence: the reference divides by the raw mask sum,
  * which NaNs on an empty set (a single-table query has no joins; its
  * workload never produces one, ours does). An empty set pools to the
  * zero vector instead (mask count clamped to 1) — identical whenever
  * the set is non-empty.
  *
  * Every tensor's gradient is finite-difference checked in MscnSpec;
  * training is seed-deterministic (same discipline as [[Gru]]).
  */
object Mscn {

  final case class Config(tableFeats: Int, predFeats: Int, joinFeats: Int,
                          hidden: Int = 64,
                          lr: Double = 1e-3, epochs: Int = 60,
                          batch: Int = 32, seed: Long = 17L,
                          clip: Double = 5.0)

  /** One set branch's tensor offsets in the flat parameter array. */
  final case class Branch(offW1: Int, offB1: Int, offW2: Int, offB2: Int)

  final class Params(val cfg: Config, val w: Array[Double]) {
    import cfg._
    private def branch(off: Int, feats: Int): (Branch, Int) = {
      val b = Branch(off, off + hidden * feats,
        off + hidden * feats + hidden,
        off + hidden * feats + hidden + hidden * hidden)
      (b, b.offB2 + hidden)
    }
    val (tables, afterT) = branch(0, tableFeats)
    val (preds, afterP) = branch(afterT, predFeats)
    val (joins, afterJ) = branch(afterP, joinFeats)
    val offO1: Int = afterJ                       // hidden x 3*hidden
    val offOB1: Int = offO1 + hidden * 3 * hidden
    val offO2: Int = offOB1 + hidden              // 1 x hidden
    val offOB2: Int = offO2 + hidden
    def size: Int = offOB2 + 1
  }

  object Params {
    def size(cfg: Config): Int = new Params(cfg, Array.empty).size
    /** Seeded uniform fan-in init, biases zero (the [[Gru]] convention). */
    def apply(cfg: Config): Params = {
      val rnd = new scala.util.Random(cfg.seed)
      val p = new Params(cfg, new Array[Double](size(cfg)))
      def fill(off: Int, n: Int, fanIn: Int): Unit = {
        val s = math.sqrt(1.0 / fanIn)
        var i = 0
        while (i < n) { p.w(off + i) = (rnd.nextDouble() * 2 - 1) * s; i += 1 }
      }
      import cfg._
      for ((b, f) <- Seq((p.tables, tableFeats), (p.preds, predFeats), (p.joins, joinFeats))) {
        fill(b.offW1, hidden * f, f)
        fill(b.offW2, hidden * hidden, hidden)
      }
      fill(p.offO1, hidden * 3 * hidden, 3 * hidden)
      fill(p.offO2, hidden, hidden)
      p
    }
  }

  /** Compact set form: only the mask==1 rows (masked rows contribute
    * nothing to the pooled average or its gradient, so dropping them is
    * exact — and avoids walking the full fixed-capacity padding).
    */
  final case class Sets(tables: Array[Array[Double]],
                        preds: Array[Array[Double]],
                        joins: Array[Array[Double]])

  def sets(e: MscnEncoding): Sets = {
    def live(rows: Array[Array[Double]], mask: Array[Double]) =
      rows.indices.filter(mask(_) > 0).map(rows(_)).toArray
    Sets(
      live(e.tables, e.tablesMask),
      live(e.predicates, e.predicatesMask),
      live(e.joins, e.joinsMask))
  }

  private final case class BranchFwd(h1: Array[Array[Double]],
                                     h2: Array[Array[Double]],
                                     pooled: Array[Double], m: Double)

  private def branchForward(p: Params, b: Branch, feats: Int,
                            rows: Array[Array[Double]]): BranchFwd = {
    import p.cfg._
    val n = rows.length
    val h1 = Array.ofDim[Double](n, hidden)
    val h2 = Array.ofDim[Double](n, hidden)
    val pooled = new Array[Double](hidden)
    val tmp = new Array[Double](hidden)
    var j = 0
    while (j < n) {
      affine(p.w, b.offW1, hidden, feats, rows(j), b.offB1, tmp)
      var i = 0
      while (i < hidden) { h1(j)(i) = math.max(0.0, tmp(i)); i += 1 }
      affine(p.w, b.offW2, hidden, hidden, h1(j), b.offB2, tmp)
      i = 0
      while (i < hidden) {
        h2(j)(i) = math.max(0.0, tmp(i))
        pooled(i) += h2(j)(i)
        i += 1
      }
      j += 1
    }
    val m = math.max(1, n).toDouble // empty-set guard (see object doc)
    var i = 0
    while (i < hidden) { pooled(i) /= m; i += 1 }
    BranchFwd(h1, h2, pooled, m)
  }

  private final case class Fwd(t: BranchFwd, pr: BranchFwd, jn: BranchFwd,
                               cat: Array[Double], h3: Array[Double],
                               out: Double)

  private def forward(p: Params, s: Sets): Fwd = {
    import p.cfg._
    val t = branchForward(p, p.tables, tableFeats, s.tables)
    val pr = branchForward(p, p.preds, predFeats, s.preds)
    val jn = branchForward(p, p.joins, joinFeats, s.joins)
    val cat = new Array[Double](3 * hidden)
    System.arraycopy(t.pooled, 0, cat, 0, hidden)
    System.arraycopy(pr.pooled, 0, cat, hidden, hidden)
    System.arraycopy(jn.pooled, 0, cat, 2 * hidden, hidden)
    val a3 = new Array[Double](hidden)
    affine(p.w, p.offO1, hidden, 3 * hidden, cat, p.offOB1, a3)
    val h3 = a3.map(math.max(0.0, _))
    val a4 = new Array[Double](1)
    affine(p.w, p.offO2, 1, hidden, h3, p.offOB2, a4)
    Fwd(t, pr, jn, cat, h3, sigmoid(a4(0)))
  }

  /** Normalized [0,1] prediction (the sigmoid output). */
  def predictNorm(p: Params, s: Sets): Double = forward(p, s).out

  private def branchBackward(p: Params, b: Branch, feats: Int,
                             rows: Array[Array[Double]], f: BranchFwd,
                             dPooled: Array[Double], g: Array[Double]): Unit = {
    import p.cfg._
    val dh2 = new Array[Double](hidden)
    val dh1 = new Array[Double](hidden)
    var j = 0
    while (j < rows.length) {
      var i = 0
      while (i < hidden) {
        dh2(i) = if (f.h2(j)(i) > 0) dPooled(i) / f.m else 0.0
        i += 1
      }
      addOuter(g, b.offW2, b.offB2, dh2, f.h1(j))
      java.util.Arrays.fill(dh1, 0.0)
      addTMatVec(p.w, b.offW2, hidden, hidden, dh2, dh1)
      i = 0
      while (i < hidden) { if (f.h1(j)(i) <= 0) dh1(i) = 0.0; i += 1 }
      addOuter(g, b.offW1, b.offB1, dh1, rows(j))
      j += 1
    }
  }

  /** Squared error in the exp-unnormalized space (the notebook's active
    * loss): with u(v) = exp(v * range + minLog), loss = (u(out) - u(y))²
    * where y is the normalized label. Accumulates dLoss/dw into `g`,
    * returns the loss.
    */
  def lossAndGrad(p: Params, s: Sets, yNorm: Double,
                  minLog: Double, maxLog: Double, g: Array[Double]): Double = {
    import p.cfg._
    val f = forward(p, s)
    val range = maxLog - minLog
    val uOut = math.exp(f.out * range + minLog)
    val uY = math.exp(yNorm * range + minLog)
    val diff = uOut - uY
    val loss = diff * diff
    // d loss / d out = 2 diff * uOut * range; d out / d a4 = out (1 - out)
    val dA4 = 2.0 * diff * uOut * range * f.out * (1.0 - f.out)
    val dOut = Array(dA4)
    addOuter(g, p.offO2, p.offOB2, dOut, f.h3)
    val dh3 = new Array[Double](hidden)
    addTMatVec(p.w, p.offO2, 1, hidden, dOut, dh3)
    var i = 0
    while (i < hidden) { if (f.h3(i) <= 0) dh3(i) = 0.0; i += 1 }
    addOuter(g, p.offO1, p.offOB1, dh3, f.cat)
    val dCat = new Array[Double](3 * hidden)
    addTMatVec(p.w, p.offO1, hidden, 3 * hidden, dh3, dCat)
    branchBackward(p, p.tables, tableFeats, s.tables, f.t,
      java.util.Arrays.copyOfRange(dCat, 0, hidden), g)
    branchBackward(p, p.preds, predFeats, s.preds, f.pr,
      java.util.Arrays.copyOfRange(dCat, hidden, 2 * hidden), g)
    branchBackward(p, p.joins, joinFeats, s.joins, f.jn,
      java.util.Arrays.copyOfRange(dCat, 2 * hidden, 3 * hidden), g)
    loss
  }

  final case class Fitted(p: Params, minLog: Double, maxLog: Double,
                          losses: Seq[Double]) {
    /** Runtime prediction in seconds: exp-unnormalize the sigmoid. */
    def predictSeconds(s: Sets): Double =
      math.exp(predictNorm(p, s) * (maxLog - minLog) + minLog)
    def predictLog2(s: Sets): Double =
      math.log(predictSeconds(s)) / math.log(2.0)
  }

  /** Train on (sets, runtimeSeconds): normalize ln labels to [0,1] over
    * the training set (normalize_labels), run the shared Adam loop.
    * Deterministic per seed.
    */
  def fit(data: Seq[(Sets, Double)], cfg: Config): Fitted = {
    require(data.nonEmpty, "no training data")
    val logs = data.map { case (_, rt) => math.log(math.max(rt, 1e-6)) }
    val minLog = logs.min
    val maxLog = math.max(logs.max, minLog + 1e-9) // degenerate-range guard
    val range = maxLog - minLog
    val normed = data.zip(logs).map { case ((s, _), l) =>
      (s, math.min(1.0, math.max(0.0, (l - minLog) / range)))
    }
    val p = Params(cfg)
    val losses = AdamTrainer.run[(Sets, Double)](normed, p.w,
      AdamTrainer.Opt(cfg.lr, cfg.epochs, cfg.batch, cfg.seed, cfg.clip),
      { case ((s, y), g) => lossAndGrad(p, s, y, minLog, maxLog, g) })
    Fitted(p, minLog, maxLog, losses)
  }

  /** The notebook's print_qerror summary over (predictedSeconds,
    * actualSeconds): ratio q-error max(p/a, a/p) at the median / p90 /
    * p95 / p99 / max / mean. Percentiles use numpy's default linear
    * interpolation between adjacent order statistics (the notebook
    * calls np.percentile) — a nearest-rank ceil index would overstate
    * p90/p95/p99 on small holdouts.
    */
  def qerrorSummary(pred: Seq[(Double, Double)]): Map[String, Double] = {
    require(pred.nonEmpty, "no predictions")
    val qe = pred.map { case (p, a) =>
      val (lo, hi) = (math.min(p, a), math.max(p, a))
      hi / math.max(lo, 1e-9)
    }.sorted
    def pct(q: Double): Double = {
      val pos = q * (qe.size - 1)
      val lo = math.floor(pos).toInt
      val hi = math.min(qe.size - 1, lo + 1)
      qe(lo) + (pos - lo) * (qe(hi) - qe(lo))
    }
    Map("median" -> pct(0.5), "p90" -> pct(0.9), "p95" -> pct(0.95),
      "p99" -> pct(0.99), "max" -> qe.last, "mean" -> qe.sum / qe.size)
  }
}
