package graft.estimate

/** A real recurrent estimator family: GRU over the encoder's node-vector
  * traversal sequence, classifying log2-runtime buckets — the same model
  * family as the reference's gerelt GRU-over-traversals
  * (`dqo/estimator/gerelt/v20/model.py:94-122`), which earlier rounds
  * substituted with fixed-vector summaries (GBT / MLP) because MLlib has
  * no recurrent models. This closes that substitution with a from-scratch
  * implementation: standard GRU cell, softmax cross-entropy head on the
  * final hidden state, truncated-nothing BPTT (sequences are query
  * traversals, tens of steps), Adam, gradient clipping. Deterministic for
  * a fixed seed: weight init from a seeded RNG, fixed batch order, no
  * parallel reduction non-determinism (per-batch gradients sum in example
  * order).
  *
  * Scope: the model trains DRIVER-SIDE over a measured workload (like the
  * reference, which trains on a single host's GPU) — thousands of
  * sequences; the corpus-scale work (measuring runtimes, encoding) stays
  * in Spark. Correctness is anchored by a finite-difference gradient
  * check in GruSpec (every parameter tensor, 1e-4 relative) plus an
  * overfit-a-tiny-dataset test.
  *
  * Cell (reset-before-candidate variant, the torch.nn.GRU convention):
  *   z_t = sigmoid(Wz x_t + Uz h_{t-1} + bz)
  *   r_t = sigmoid(Wr x_t + Ur h_{t-1} + br)
  *   g_t = tanh(Wh x_t + Uh (r_t * h_{t-1}) + bh)
  *   h_t = (1 - z_t) * h_{t-1} + z_t * g_t
  */
object Gru {

  final case class Config(inputDim: Int, hidden: Int, classes: Int,
                          lr: Double = 1e-3, epochs: Int = 30,
                          batch: Int = 32, seed: Long = 17L,
                          clip: Double = 5.0)

  /** Flat parameter storage; layout documented in [[Params.apply]]. */
  final class Params(val cfg: Config, val w: Array[Double]) {
    import cfg._
    // offsets: Wz,Wr,Wh: hidden*inputDim each; Uz,Ur,Uh: hidden*hidden;
    // bz,br,bh: hidden; Wo: classes*hidden; bo: classes
    private val hi = hidden * inputDim
    private val hh = hidden * hidden
    val offWz = 0; val offWr = hi; val offWh = 2 * hi
    val offUz = 3 * hi; val offUr = 3 * hi + hh; val offUh = 3 * hi + 2 * hh
    val offBz = 3 * hi + 3 * hh; val offBr = offBz + hidden; val offBh = offBr + hidden
    val offWo = offBh + hidden; val offBo = offWo + classes * hidden
    def size: Int = offBo + classes
  }

  object Params {
    def size(cfg: Config): Int = new Params(cfg, Array.empty).size
    /** Glorot-ish seeded init. */
    def apply(cfg: Config): Params = {
      val rnd = new scala.util.Random(cfg.seed)
      val p = new Params(cfg, new Array[Double](size(cfg)))
      def fill(off: Int, n: Int, fanIn: Int): Unit = {
        val s = math.sqrt(1.0 / fanIn)
        var i = 0
        while (i < n) { p.w(off + i) = (rnd.nextDouble() * 2 - 1) * s; i += 1 }
      }
      import cfg._
      fill(p.offWz, 3 * hidden * inputDim, inputDim)     // Wz, Wr, Wh
      fill(p.offUz, 3 * hidden * hidden, hidden)         // Uz, Ur, Uh
      fill(p.offWo, classes * hidden, hidden)            // Wo
      p                                                  // biases stay 0
    }
  }

  /** y = M x + b where M is rows x cols at `off` (row-major), b at `boff`. */
  private[estimate] def affine(w: Array[Double], off: Int, rows: Int, cols: Int,
                     x: Array[Double], boff: Int, out: Array[Double]): Unit = {
    var r = 0
    while (r < rows) {
      var acc = if (boff >= 0) w(boff + r) else 0.0
      val base = off + r * cols
      var c = 0
      while (c < cols) { acc += w(base + c) * x(c); c += 1 }
      out(r) = acc
      r += 1
    }
  }

  /** out += M^T d (M rows x cols at off). */
  private[estimate] def addTMatVec(w: Array[Double], off: Int, rows: Int, cols: Int,
                         d: Array[Double], out: Array[Double]): Unit = {
    var r = 0
    while (r < rows) {
      val base = off + r * cols
      val dv = d(r)
      var c = 0
      while (c < cols) { out(c) += w(base + c) * dv; c += 1 }
      r += 1
    }
  }

  /** grad(M) += d x^T, grad(b) += d. */
  private[estimate] def addOuter(g: Array[Double], off: Int, boff: Int, d: Array[Double],
                       x: Array[Double]): Unit = {
    var r = 0
    while (r < d.length) {
      val base = off + r * x.length
      val dv = d(r)
      var c = 0
      while (c < x.length) { g(base + c) += dv * x(c); c += 1 }
      if (boff >= 0) g(boff + r) += dv
      r += 1
    }
  }

  private[estimate] def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  final case class Forward(hs: Array[Array[Double]], zs: Array[Array[Double]],
                           rs: Array[Array[Double]], gs: Array[Array[Double]],
                           logits: Array[Double], probs: Array[Double])

  def forward(p: Params, seq: Array[Array[Double]]): Forward = {
    import p.cfg._
    val T = seq.length
    val hs = Array.ofDim[Double](T + 1, hidden) // hs(0) = 0
    val zs = Array.ofDim[Double](T, hidden)
    val rs = Array.ofDim[Double](T, hidden)
    val gs = Array.ofDim[Double](T, hidden)
    val tmpA = new Array[Double](hidden)
    val tmpB = new Array[Double](hidden)
    val rh = new Array[Double](hidden)
    var t = 0
    while (t < T) {
      val x = seq(t); val hPrev = hs(t)
      affine(p.w, p.offWz, hidden, inputDim, x, p.offBz, tmpA)
      affine(p.w, p.offUz, hidden, hidden, hPrev, -1, tmpB)
      var i = 0
      while (i < hidden) { zs(t)(i) = sigmoid(tmpA(i) + tmpB(i)); i += 1 }
      affine(p.w, p.offWr, hidden, inputDim, x, p.offBr, tmpA)
      affine(p.w, p.offUr, hidden, hidden, hPrev, -1, tmpB)
      i = 0
      while (i < hidden) { rs(t)(i) = sigmoid(tmpA(i) + tmpB(i)); i += 1 }
      i = 0
      while (i < hidden) { rh(i) = rs(t)(i) * hPrev(i); i += 1 }
      affine(p.w, p.offWh, hidden, inputDim, x, p.offBh, tmpA)
      affine(p.w, p.offUh, hidden, hidden, rh, -1, tmpB)
      i = 0
      while (i < hidden) { gs(t)(i) = math.tanh(tmpA(i) + tmpB(i)); i += 1 }
      i = 0
      while (i < hidden) {
        hs(t + 1)(i) = (1 - zs(t)(i)) * hPrev(i) + zs(t)(i) * gs(t)(i); i += 1
      }
      t += 1
    }
    val logits = new Array[Double](classes)
    affine(p.w, p.offWo, classes, hidden, hs(T), p.offBo, logits)
    val mx = logits.max
    val exps = logits.map(l => math.exp(l - mx))
    val z = exps.sum
    Forward(hs, zs, rs, gs, logits, exps.map(_ / z))
  }

  /** Cross-entropy loss and full-parameter gradient for one example.
    * Gradient ACCUMULATES into `g` (caller zeroes between batches).
    *
    * `weight` scales BOTH the loss and its gradient (weighted
    * cross-entropy): loss = -w·log p_label, and since every parameter
    * gradient is linear in dLogits, scaling dLogits by w scales the
    * whole gradient exactly — the class-weighting lever for the
    * tail-starved runtime buckets (the reference's data_module gets the
    * same effect by balanced SAMPLING, dqo/estimator/gerelt/
    * data_module.py:15-70; weighting reweights the loss with zero extra
    * wall-clock instead of duplicating rows). Verified against finite
    * differences in GruSpec alongside the unweighted check.
    */
  def lossAndGrad(p: Params, seq: Array[Array[Double]], label: Int,
                  g: Array[Double], weight: Double = 1.0): Double = {
    import p.cfg._
    val f = forward(p, seq)
    val T = seq.length
    val loss = -weight * math.log(math.max(f.probs(label), 1e-12))
    // head
    val dLogits = f.probs.clone()
    dLogits(label) -= 1.0
    if (weight != 1.0) {
      var i = 0
      while (i < dLogits.length) { dLogits(i) *= weight; i += 1 }
    }
    addOuter(g, p.offWo, p.offBo, dLogits, f.hs(T))
    val dh = new Array[Double](hidden)
    addTMatVec(p.w, p.offWo, classes, hidden, dLogits, dh)
    // BPTT
    val dzPre = new Array[Double](hidden)
    val drPre = new Array[Double](hidden)
    val dgPre = new Array[Double](hidden)
    val drh = new Array[Double](hidden)
    val rh = new Array[Double](hidden)
    var t = T - 1
    while (t >= 0) {
      val hPrev = f.hs(t); val z = f.zs(t); val r = f.rs(t); val gq = f.gs(t)
      var i = 0
      while (i < hidden) {
        dzPre(i) = dh(i) * (gq(i) - hPrev(i)) * z(i) * (1 - z(i))
        dgPre(i) = dh(i) * z(i) * (1 - gq(i) * gq(i))
        rh(i) = r(i) * hPrev(i)
        i += 1
      }
      java.util.Arrays.fill(drh, 0.0)
      addTMatVec(p.w, p.offUh, hidden, hidden, dgPre, drh)
      i = 0
      while (i < hidden) {
        drPre(i) = drh(i) * hPrev(i) * r(i) * (1 - r(i))
        i += 1
      }
      // parameter grads
      addOuter(g, p.offWz, p.offBz, dzPre, seq(t))
      addOuter(g, p.offUz, -1, dzPre, hPrev)
      addOuter(g, p.offWr, p.offBr, drPre, seq(t))
      addOuter(g, p.offUr, -1, drPre, hPrev)
      addOuter(g, p.offWh, p.offBh, dgPre, seq(t))
      addOuter(g, p.offUh, -1, dgPre, rh)
      // dh_{t-1}
      val dhPrev = new Array[Double](hidden)
      i = 0
      while (i < hidden) { dhPrev(i) = dh(i) * (1 - z(i)) + drh(i) * r(i); i += 1 }
      addTMatVec(p.w, p.offUz, hidden, hidden, dzPre, dhPrev)
      addTMatVec(p.w, p.offUr, hidden, hidden, drPre, dhPrev)
      System.arraycopy(dhPrev, 0, dh, 0, hidden)
      t -= 1
    }
    loss
  }

  final case class Fitted(p: Params, losses: Seq[Double]) {
    def predict(seq: Array[Array[Double]]): Int = {
      val probs = forward(p, seq).probs
      probs.indices.maxBy(probs(_))
    }
  }

  /** Adam training over (sequence, bucket-label) examples — the shared
    * [[AdamTrainer]] loop; deterministic end to end for a fixed seed.
    */
  def fit(data: Seq[(Array[Array[Double]], Int)], cfg: Config): Fitted = {
    require(data.nonEmpty, "no training data")
    require(data.forall(_._1.nonEmpty), "empty sequence in training data")
    val p = Params(cfg)
    val losses = AdamTrainer.run[(Array[Array[Double]], Int)](data, p.w,
      AdamTrainer.Opt(cfg.lr, cfg.epochs, cfg.batch, cfg.seed, cfg.clip),
      { case ((seq, label), g) => lossAndGrad(p, seq, label, g) })
    Fitted(p, losses)
  }

  /** Like [[fit]] but keeps the weights of the EPOCH whose macro-F1 on
    * `valSet` is best, not the last epoch's — the reference's
    * validation-checkpoint selection (its lightning runs score val each
    * epoch and load the best checkpoint back; the saved artifacts are
    * NAMED by those val metrics,
    * dqo/estimator/gerelt/v15/logs/tpch_aug/.../val_results_*_acc_*_f1_*.png,
    * consumed by evaluate.py's load_pretrained_model). `valSet` must be
    * carved from TRAINING data — selecting on the test holdout would
    * leak it. Returns the best-epoch model plus (bestEpoch, bestValF1);
    * ties keep the earlier epoch. Determinism: the training trajectory
    * is [[fit]]'s bit-for-bit (same AdamTrainer stream — the epoch hook
    * only reads weights), so for a fixed seed the selected epoch is
    * reproducible.
    */
  def fitValSelected(data: Seq[(Array[Array[Double]], Int)], cfg: Config,
                     valSet: Seq[(Array[Array[Double]], Int)])
      : (Fitted, Int, Double) =
    fitValSelectedWeighted(data.map { case (s, l) => (s, l, 1.0) }, cfg, valSet)

  /** [[fitValSelected]] with a per-example loss weight (third tuple
    * element) — inverse-class-frequency weights give the tail buckets
    * gradient mass without oversampling's duplicated rows. With all
    * weights 1.0 the trajectory is [[fitValSelected]]'s bit-for-bit
    * (same AdamTrainer stream, same epoch hook).
    */
  def fitValSelectedWeighted(data: Seq[(Array[Array[Double]], Int, Double)],
                             cfg: Config,
                             valSet: Seq[(Array[Array[Double]], Int)])
      : (Fitted, Int, Double) = {
    require(data.nonEmpty, "no training data")
    require(valSet.nonEmpty, "empty validation set")
    // epochs == 0 would silently return an all-zero model: onEpoch never
    // fires, bestW stays zero-filled, and the final arraycopy would
    // overwrite the seeded init with zeros
    require(cfg.epochs >= 1, s"epochs must be >= 1, got ${cfg.epochs}")
    val p = Params(cfg)
    val probe = Fitted(p, Nil)
    val bestW = new Array[Double](p.w.length)
    var bestF1 = -1.0
    var bestEpoch = 0
    val losses = AdamTrainer.run[(Array[Array[Double]], Int, Double)](data, p.w,
      AdamTrainer.Opt(cfg.lr, cfg.epochs, cfg.batch, cfg.seed, cfg.clip),
      { case ((seq, label, wt), g) => lossAndGrad(p, seq, label, g, wt) },
      onEpoch = { epoch =>
        val pairs = valSet.map { case (seq, label) =>
          (probe.predict(seq).toDouble, label.toDouble) }
        val (_, _, f1) = Estimator.evaluate(pairs, minBucket = 0)
        if (f1 > bestF1) {
          bestF1 = f1; bestEpoch = epoch
          System.arraycopy(p.w, 0, bestW, 0, p.w.length)
        }
      })
    System.arraycopy(bestW, 0, p.w, 0, p.w.length)
    (Fitted(p, losses), bestEpoch, bestF1)
  }
}
