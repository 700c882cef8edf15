package graft.estimate

import Gru.{affine, addTMatVec, addOuter, sigmoid}

/** The reference's v20 recurrent architecture, faithfully: FOUR GRUs —
  * one per tree traversal (preorder / inorder / postorder / BFS,
  * `dqo/estimator/gerelt/v20/model.py:94-122`; traversal semantics from
  * `dqo/tree/__init__.py:141-183`, including the binary-style inorder
  * AND postorder that visit child 0's subtree, then child 1's only when
  * a node has exactly two children — on 3+-child nodes, which the
  * encoder can emit for wide projections, both orders skip children 2+
  * exactly as the reference's iterative stacks do) — each ending in a
  * tanh'd final hidden state,
  * concatenated into an MLP head that REGRESSES log2(runtime) under
  * smooth-L1 loss (the reference's `F.smooth_l1_loss` on `np.log2`
  * labels). Head depth is trimmed to one tanh layer (the reference
  * stacks three; the family — 4 traversal GRUs + tanh MLP + smooth-L1
  * regression — is what's being reproduced, not the exact layer count).
  *
  * Every tensor's gradient is finite-difference checked in Gru4Spec;
  * training is seed-deterministic (same discipline as [[Gru]]).
  */
object Gru4 {

  final case class Config(inputDim: Int, hidden: Int, headHidden: Int = 32,
                          lr: Double = 1e-3, epochs: Int = 30,
                          batch: Int = 32, seed: Long = 17L,
                          clip: Double = 5.0)

  /** Offsets of one GRU block's tensors inside the flat parameter array. */
  final case class Block(offWz: Int, offWr: Int, offWh: Int,
                         offUz: Int, offUr: Int, offUh: Int,
                         offBz: Int, offBr: Int, offBh: Int)

  final class Params(val cfg: Config, val w: Array[Double]) {
    import cfg._
    private val hi = hidden * inputDim
    private val hh = hidden * hidden
    val blockSize: Int = 3 * hi + 3 * hh + 3 * hidden
    val blocks: IndexedSeq[Block] = (0 until 4).map { b =>
      val o = b * blockSize
      Block(o, o + hi, o + 2 * hi,
        o + 3 * hi, o + 3 * hi + hh, o + 3 * hi + 2 * hh,
        o + 3 * hi + 3 * hh, o + 3 * hi + 3 * hh + hidden,
        o + 3 * hi + 3 * hh + 2 * hidden)
    }
    val offW1: Int = 4 * blockSize                 // headHidden x 4*hidden
    val offB1: Int = offW1 + headHidden * 4 * hidden
    val offW2: Int = offB1 + headHidden            // 1 x headHidden
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
      p.blocks.foreach { b =>
        fill(b.offWz, 3 * hidden * inputDim, inputDim)
        fill(b.offUz, 3 * hidden * hidden, hidden)
      }
      fill(p.offW1, headHidden * 4 * hidden, 4 * hidden)
      fill(p.offW2, headHidden, headHidden)
      p
    }
  }

  /** A query tree: node vectors + children lists (index order), root. */
  final case class Tree(vecs: Array[Array[Double]], children: Array[Array[Int]],
                        root: Int)

  /** Build from the encoder's parent-link form (parents(root) == -1). */
  def fromParents(parents: Array[Int], vecs: Array[Array[Double]]): Tree = {
    val ch = Array.fill(parents.length)(List.newBuilder[Int])
    var root = -1
    parents.indices.foreach { i =>
      if (parents(i) < 0) root = i else ch(parents(i)) += i
    }
    require(root >= 0, "no root in parent links")
    Tree(vecs, ch.map(_.result().toArray), root)
  }

  /** The four traversal orders (reference Tree semantics). */
  def traversals(t: Tree): Array[Array[Int]] = {
    val pre = Array.newBuilder[Int]
    def dfs(i: Int): Unit = { pre += i; t.children(i).foreach(dfs) }
    dfs(t.root)
    val ino = Array.newBuilder[Int]
    def vin(i: Int): Unit = {
      val c = t.children(i)
      if (c.nonEmpty) vin(c(0))
      ino += i
      if (c.length == 2) vin(c(1))
    }
    vin(t.root)
    // binary-style like the reference's iterative postorder
    // (dqo/tree/__init__.py:156-183): child 0's subtree always, child 1's
    // only when a node has EXACTLY two children — children 2+ are never
    // visited, the same quirk inorder has
    val post = Array.newBuilder[Int]
    def vpost(i: Int): Unit = {
      val c = t.children(i)
      if (c.nonEmpty) vpost(c(0))
      if (c.length == 2) vpost(c(1))
      post += i
    }
    vpost(t.root)
    val bfs = Array.newBuilder[Int]
    val q = scala.collection.mutable.Queue(t.root)
    while (q.nonEmpty) { val i = q.dequeue(); bfs += i; t.children(i).foreach(q.enqueue) }
    Array(pre.result(), ino.result(), post.result(), bfs.result())
  }

  private final case class BlockFwd(hs: Array[Array[Double]], zs: Array[Array[Double]],
                                    rs: Array[Array[Double]], gs: Array[Array[Double]])

  private def blockForward(p: Params, b: Block, seq: Array[Array[Double]]): BlockFwd = {
    import p.cfg._
    val T = seq.length
    val hs = Array.ofDim[Double](T + 1, hidden)
    val zs = Array.ofDim[Double](T, hidden)
    val rs = Array.ofDim[Double](T, hidden)
    val gs = Array.ofDim[Double](T, hidden)
    val tmpA = new Array[Double](hidden); val tmpB = new Array[Double](hidden)
    val rh = new Array[Double](hidden)
    var t = 0
    while (t < T) {
      val x = seq(t); val hPrev = hs(t)
      affine(p.w, b.offWz, hidden, inputDim, x, b.offBz, tmpA)
      affine(p.w, b.offUz, hidden, hidden, hPrev, -1, tmpB)
      var i = 0
      while (i < hidden) { zs(t)(i) = sigmoid(tmpA(i) + tmpB(i)); i += 1 }
      affine(p.w, b.offWr, hidden, inputDim, x, b.offBr, tmpA)
      affine(p.w, b.offUr, hidden, hidden, hPrev, -1, tmpB)
      i = 0
      while (i < hidden) { rs(t)(i) = sigmoid(tmpA(i) + tmpB(i)); i += 1 }
      i = 0
      while (i < hidden) { rh(i) = rs(t)(i) * hPrev(i); i += 1 }
      affine(p.w, b.offWh, hidden, inputDim, x, b.offBh, tmpA)
      affine(p.w, b.offUh, hidden, hidden, rh, -1, tmpB)
      i = 0
      while (i < hidden) { gs(t)(i) = math.tanh(tmpA(i) + tmpB(i)); i += 1 }
      i = 0
      while (i < hidden) {
        hs(t + 1)(i) = (1 - zs(t)(i)) * hPrev(i) + zs(t)(i) * gs(t)(i); i += 1
      }
      t += 1
    }
    BlockFwd(hs, zs, rs, gs)
  }

  private def blockBackward(p: Params, b: Block, seq: Array[Array[Double]],
                            f: BlockFwd, dhFinal: Array[Double],
                            g: Array[Double]): Unit = {
    import p.cfg._
    val T = seq.length
    val dh = dhFinal.clone()
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
      addTMatVec(p.w, b.offUh, hidden, hidden, dgPre, drh)
      i = 0
      while (i < hidden) { drPre(i) = drh(i) * hPrev(i) * r(i) * (1 - r(i)); i += 1 }
      addOuter(g, b.offWz, b.offBz, dzPre, seq(t))
      addOuter(g, b.offUz, -1, dzPre, hPrev)
      addOuter(g, b.offWr, b.offBr, drPre, seq(t))
      addOuter(g, b.offUr, -1, drPre, hPrev)
      addOuter(g, b.offWh, b.offBh, dgPre, seq(t))
      addOuter(g, b.offUh, -1, dgPre, rh)
      val dhPrev = new Array[Double](hidden)
      i = 0
      while (i < hidden) { dhPrev(i) = dh(i) * (1 - z(i)) + drh(i) * r(i); i += 1 }
      addTMatVec(p.w, b.offUz, hidden, hidden, dzPre, dhPrev)
      addTMatVec(p.w, b.offUr, hidden, hidden, drPre, dhPrev)
      System.arraycopy(dhPrev, 0, dh, 0, hidden)
      t -= 1
    }
  }

  def predictLog2(p: Params, tree: Tree): Double = forwardOut(p, tree)._1

  private def forwardOut(p: Params, tree: Tree)
    : (Double, Array[BlockFwd], Array[Array[Array[Double]]], Array[Double], Array[Double]) = {
    import p.cfg._
    val orders = traversals(tree)
    val seqs = orders.map(_.map(tree.vecs))
    val fwds = new Array[BlockFwd](4)
    val concat = new Array[Double](4 * hidden)
    var bi = 0
    while (bi < 4) {
      val f = blockForward(p, p.blocks(bi), seqs(bi))
      fwds(bi) = f
      val hT = f.hs(seqs(bi).length)
      var i = 0
      while (i < hidden) { concat(bi * hidden + i) = math.tanh(hT(i)); i += 1 }
      bi += 1
    }
    val a1 = new Array[Double](headHidden)
    affine(p.w, p.offW1, headHidden, 4 * hidden, concat, p.offB1, a1)
    val h1 = a1.map(math.tanh)
    val out = new Array[Double](1)
    affine(p.w, p.offW2, 1, headHidden, h1, p.offB2, out)
    (out(0), fwds, seqs, concat, h1)
  }

  /** Smooth-L1 loss against the log2 target; gradient ACCUMULATES into g. */
  def lossAndGrad(p: Params, tree: Tree, target: Double, g: Array[Double]): Double = {
    import p.cfg._
    val (pred, fwds, seqs, concat, h1) = forwardOut(p, tree)
    val d = pred - target
    val (loss, dPred) =
      if (math.abs(d) < 1.0) (0.5 * d * d, d) else (math.abs(d) - 0.5, math.signum(d))
    // head backward
    val dOut = Array(dPred)
    addOuter(g, p.offW2, p.offB2, dOut, h1)
    val dh1 = new Array[Double](headHidden)
    addTMatVec(p.w, p.offW2, 1, headHidden, dOut, dh1)
    val da1 = new Array[Double](headHidden)
    var i = 0
    while (i < headHidden) { da1(i) = dh1(i) * (1 - h1(i) * h1(i)); i += 1 }
    addOuter(g, p.offW1, p.offB1, da1, concat)
    val dConcat = new Array[Double](4 * hidden)
    addTMatVec(p.w, p.offW1, headHidden, 4 * hidden, da1, dConcat)
    // per-block: through the final tanh, then BPTT
    var bi = 0
    while (bi < 4) {
      val hT = fwds(bi).hs(seqs(bi).length)
      val dhF = new Array[Double](hidden)
      i = 0
      while (i < hidden) {
        val th = math.tanh(hT(i))
        dhF(i) = dConcat(bi * hidden + i) * (1 - th * th)
        i += 1
      }
      blockBackward(p, p.blocks(bi), seqs(bi), fwds(bi), dhF, g)
      bi += 1
    }
    loss
  }

  final case class Fitted(p: Params, losses: Seq[Double]) {
    def predict(tree: Tree): Double = predictLog2(p, tree)
  }

  /** Adam over (tree, log2-runtime) examples via the shared
    * [[AdamTrainer]] loop; deterministic per seed.
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
