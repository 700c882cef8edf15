package graft.estimate

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch MSCN SetConv: full finite-difference gradient check
  * (all three set branches + head, weights and biases), masked-average
  * pooling semantics, empty-set guard, regression-learning and
  * determinism gates. Architecture reference:
  * dqo/estimator/others/kipf/model.py:8-48.
  */
class MscnSpec extends AnyFunSuite {

  private def vec(dim: Int, seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextDouble() * 2 - 1)
  }

  private def randSets(tf: Int, pf: Int, jf: Int, seed: Int,
                       nt: Int = 2, np: Int = 3, nj: Int = 1): Mscn.Sets =
    Mscn.Sets(
      Array.tabulate(nt)(i => vec(tf, seed * 100 + i)),
      Array.tabulate(np)(i => vec(pf, seed * 100 + 10 + i)),
      Array.tabulate(nj)(i => vec(jf, seed * 100 + 20 + i)))

  test("analytic gradient matches finite differences across branches and head") {
    val cfg = Mscn.Config(tableFeats = 3, predFeats = 4, joinFeats = 2,
      hidden = 5, seed = 9L)
    val p = Mscn.Params(cfg)
    val s = randSets(3, 4, 2, seed = 7)
    val (minLog, maxLog) = (-2.0, 3.0)
    val y = 0.6
    val g = new Array[Double](Mscn.Params.size(cfg))
    Mscn.lossAndGrad(p, s, y, minLog, maxLog, g)
    val eps = 1e-6
    val probes = Seq(
      "t.W1" -> p.tables.offW1, "t.b1" -> p.tables.offB1,
      "t.W2" -> p.tables.offW2, "t.b2" -> p.tables.offB2,
      "p.W1" -> p.preds.offW1, "p.b1" -> p.preds.offB1,
      "p.W2" -> p.preds.offW2, "p.b2" -> p.preds.offB2,
      "j.W1" -> p.joins.offW1, "j.b1" -> p.joins.offB1,
      "j.W2" -> p.joins.offW2, "j.b2" -> p.joins.offB2,
      "O1" -> p.offO1, "OB1" -> p.offOB1, "O2" -> p.offO2, "OB2" -> p.offOB2)
    probes.foreach { case (name, off) =>
      (0 until 3).foreach { k =>
        val i = off + k
        if (i < p.w.length) {
          val orig = p.w(i)
          p.w(i) = orig + eps
          val lp = Mscn.lossAndGrad(p, s, y, minLog, maxLog, new Array[Double](g.length))
          p.w(i) = orig - eps
          val lm = Mscn.lossAndGrad(p, s, y, minLog, maxLog, new Array[Double](g.length))
          p.w(i) = orig
          val numeric = (lp - lm) / (2 * eps)
          val denom = math.max(1e-8, math.abs(numeric) + math.abs(g(i)))
          assert(math.abs(numeric - g(i)) / denom < 1e-4,
            f"$name[$k]: numeric $numeric%.8f vs analytic ${g(i)}%.8f")
        }
      }
    }
  }

  test("pooling averages over set rows (deep-sets invariance to row order)") {
    val cfg = Mscn.Config(tableFeats = 3, predFeats = 3, joinFeats = 3,
      hidden = 4, seed = 5L)
    val p = Mscn.Params(cfg)
    val s = randSets(3, 3, 3, seed = 11, nt = 3, np = 2, nj = 2)
    // tolerance, not bit-equality: pooling SUMS in row order and FP
    // addition is non-associative, so reversal can differ at ulp level
    val shuffled = Mscn.Sets(s.tables.reverse, s.preds.reverse, s.joins.reverse)
    assert(math.abs(Mscn.predictNorm(p, s) - Mscn.predictNorm(p, shuffled)) < 1e-12)
    // duplicating every row leaves the AVERAGE (hence the output) unchanged
    val doubled = Mscn.Sets(s.tables ++ s.tables, s.preds ++ s.preds,
      s.joins ++ s.joins)
    assert(math.abs(Mscn.predictNorm(p, s) - Mscn.predictNorm(p, doubled)) < 1e-12)
  }

  test("empty predicate/join sets pool to zero instead of NaN") {
    val cfg = Mscn.Config(tableFeats = 3, predFeats = 4, joinFeats = 2,
      hidden = 4, seed = 3L)
    val p = Mscn.Params(cfg)
    val s = Mscn.Sets(Array(vec(3, 1)), Array.empty, Array.empty)
    val out = Mscn.predictNorm(p, s)
    assert(!out.isNaN && out > 0 && out < 1)
    // gradient path survives the empty branches too
    val g = new Array[Double](Mscn.Params.size(cfg))
    val loss = Mscn.lossAndGrad(p, s, 0.5, -1.0, 2.0, g)
    assert(!loss.isNaN && g.exists(_ != 0.0))
    // empty-branch W1 tensors get no gradient (nothing flowed through)
    assert((0 until 4 * 4).forall(i => g(p.preds.offW1 + i) == 0.0))
  }

  test("fit learns a set-content-dependent runtime and loss decreases") {
    val rnd = new scala.util.Random(23)
    val data = (1 to 60).map { i =>
      val nt = 1 + rnd.nextInt(3)
      val np = rnd.nextInt(4)
      val nj = math.max(0, nt - 1)
      val s = Mscn.Sets(
        Array.tabulate(nt)(j => vec(3, i * 50 + j)),
        Array.tabulate(np)(j => vec(3, i * 50 + 10 + j)),
        Array.tabulate(nj)(j => vec(3, i * 50 + 20 + j)))
      // runtime grows with table content and set sizes — learnable from
      // the pooled averages; spans e^0..e^3 so normalization has range
      val y = math.exp(1.0 + s.tables.map(_(0)).sum * 0.5 + nj * 0.4 - np * 0.2)
      (s, y)
    }
    val cfg = Mscn.Config(tableFeats = 3, predFeats = 3, joinFeats = 3,
      hidden = 16, lr = 5e-3, epochs = 120, batch = 10, seed = 3L)
    val fitted = Mscn.fit(data, cfg)
    assert(fitted.losses.head > fitted.losses.last * 3,
      s"loss barely moved: ${fitted.losses.head} -> ${fitted.losses.last}")
    // q-error over the training set should be tight after overfit
    val qe = Mscn.qerrorSummary(data.map { case (s, y) =>
      (fitted.predictSeconds(s), y) })
    assert(qe("median") < 1.25, s"median q-error ${qe("median")}")
  }

  test("training is bit-deterministic for a fixed seed") {
    val data = (1 to 12).map { i => (randSets(3, 3, 3, seed = i), i * 0.4) }
    val cfg = Mscn.Config(tableFeats = 3, predFeats = 3, joinFeats = 3,
      hidden = 4, epochs = 4, batch = 4, seed = 77L)
    val a = Mscn.fit(data, cfg)
    val b = Mscn.fit(data, cfg)
    assert(a.p.w.toSeq == b.p.w.toSeq)
    assert(a.minLog == b.minLog && a.maxLog == b.maxLog)
  }

  test("sets() keeps only mask==1 rows from the encoder form") {
    val e = graft.encode.SetEncoders.MscnEncoding(
      tables = Array(Array(1.0), Array(2.0), Array(3.0)),
      tablesMask = Array(1.0, 0.0, 1.0),
      joins = Array(Array(4.0)), joinsMask = Array(0.0),
      predicates = Array(Array(5.0), Array(6.0)),
      predicatesMask = Array(0.0, 1.0))
    val s = Mscn.sets(e)
    assert(s.tables.map(_(0)).toSeq == Seq(1.0, 3.0))
    assert(s.preds.map(_(0)).toSeq == Seq(6.0))
    assert(s.joins.isEmpty)
  }

  test("qerrorSummary percentiles interpolate linearly (numpy default)") {
    // q-errors are exactly 1..5: actual=1, predicted=k (both orders hit
    // the same ratio, pinning the max(p/a, a/p) symmetry too)
    val pred = Seq((1.0, 1.0), (2.0, 1.0), (1.0, 3.0), (4.0, 1.0), (1.0, 5.0))
    val qe = Mscn.qerrorSummary(pred)
    assert(qe("median") == 3.0)
    // np.percentile([1,2,3,4,5], 90) = 4.6 — nearest-rank ceil would say 5
    assert(math.abs(qe("p90") - 4.6) < 1e-12, s"p90=${qe("p90")}")
    assert(math.abs(qe("p95") - 4.8) < 1e-12, s"p95=${qe("p95")}")
    assert(qe("max") == 5.0 && qe("mean") == 3.0)
  }
}
