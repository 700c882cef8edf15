package graft.estimate

/** The one Adam mini-batch training loop shared by every from-scratch
  * neural family ([[Gru]], [[Gru4]], [[TreeLstm]], [[RelCnn]]): seeded
  * Fisher-Yates batch order per epoch, per-example gradients computed in
  * parallel but REDUCED IN SUBMISSION ORDER (so the floating-point sum —
  * and therefore the whole run — is bit-deterministic for a fixed seed),
  * gradient mean + global-norm clip, bias-corrected Adam. Extracted so a
  * change to the optimizer semantics cannot silently diverge across
  * families.
  */
private[estimate] object AdamTrainer {

  final case class Opt(lr: Double, epochs: Int, batch: Int, seed: Long, clip: Double)

  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.max(1, Runtime.getRuntime.availableProcessors() / 2),
    r => { val t = new Thread(r, "adam-grad"); t.setDaemon(true); t })

  /** Trains `w` in place; `lossGrad(example, g)` must ACCUMULATE the
    * example's gradient into `g` and return its loss. Returns per-epoch
    * mean losses. `onEpoch(e)` fires after epoch `e` (1-based) has been
    * applied to `w` — the hook validation-based checkpoint selection
    * reads the in-place weights through ([[Gru.fitValSelected]]).
    */
  def run[E](data: Seq[E], w: Array[Double], opt: Opt,
             lossGrad: (E, Array[Double]) => Double,
             onEpoch: Int => Unit = _ => ()): Seq[Double] = {
    val n = w.length
    val g = new Array[Double](n)
    val m = new Array[Double](n)
    val v = new Array[Double](n)
    val rnd = new scala.util.Random(opt.seed ^ 0x9E3779B97F4A7C15L)
    val (b1, b2, eps) = (0.9, 0.999, 1e-8)
    var step = 0
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    val idx = data.indices.toArray
    for (epoch <- 1 to opt.epochs) {
      var i = idx.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val tmp = idx(i); idx(i) = idx(j); idx(j) = tmp
        i -= 1
      }
      var epochLoss = 0.0
      var off = 0
      while (off < idx.length) {
        val end = math.min(off + opt.batch, idx.length)
        java.util.Arrays.fill(g, 0.0)
        val tasks = (off until end).map { k =>
          new java.util.concurrent.Callable[(Double, Array[Double])] {
            def call(): (Double, Array[Double]) = {
              val gi = new Array[Double](n)
              (lossGrad(data(idx(k)), gi), gi)
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
        val scale = if (norm > opt.clip) opt.clip / norm else 1.0
        step += 1
        val bc1 = 1 - math.pow(b1, step)
        val bc2 = 1 - math.pow(b2, step)
        q = 0
        while (q < n) {
          val gq = g(q) * scale
          m(q) = b1 * m(q) + (1 - b1) * gq
          v(q) = b2 * v(q) + (1 - b2) * gq * gq
          w(q) -= opt.lr * (m(q) / bc1) / (math.sqrt(v(q) / bc2) + eps)
          q += 1
        }
        off = end
      }
      losses += epochLoss / idx.length
      onEpoch(epoch)
    }
    losses.toSeq
  }
}
