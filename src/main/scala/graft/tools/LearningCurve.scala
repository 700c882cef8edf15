package graft.tools

import java.nio.file.{Files, Paths}

import graft.estimate.{Estimator, Gru}
import graft.gen.BalancedCheckpoint
import graft.model.ModelJson

/** The estimator learning curve in n — the evidence behind BASELINE's
  * "the curve is still climbing" / "plateau" claim. Trains the GRU
  * bucket classifier (bucket-balanced, 3-seed vote — the family that
  * carries the published-band comparison) on growing PREFIXES of the
  * band campaign's measurement order, always scoring against the SAME
  * CRC-byte holdout drawn from the full checkpoint, and writes the
  * acc/F1-vs-n table as a markdown artifact.
  *
  * The holdout is fixed across prefixes on purpose: a per-prefix
  * holdout would change the test set as n grows and the curve would
  * confound data volume with test-set drift.
  *
  * Usage: `sbt 'runMain graft.tools.LearningCurve [checkpoint] [statsJson] [outMd]'`
  */
object LearningCurve {

  def main(args: Array[String]): Unit = {
    val cpPath = args.lift(0).getOrElse("/root/repo/data/band/campaign_x160_c2.cp")
    val statsPath = args.lift(1).getOrElse("/root/repo/data/band/x160/stats.json")
    val outMd = args.lift(2).getOrElse("/root/repo/data/band/LEARNING_CURVE.md")
    val cp = BalancedCheckpoint.deserialize(Files.readString(Paths.get(cpPath)))
    val db = ModelJson.fromJson(Files.readString(Paths.get(statsPath)))
    val usable = cp.results.filter(_._2 > 0)
    println(s"[curve] ${usable.size} measured runtimes")

    val test = usable.filter { case (sql, _) => SweepKit.isHoldout(sql) }
    val actuals = test.map { case (_, rt) => math.log(rt) / math.log(2) }
    println(s"[curve] holdout=${test.size} (fixed across prefixes)")

    val Dim = 203
    val seqs = scala.collection.mutable.Map.empty[String, Array[Array[Double]]]
    def encRaw(sql: String): Array[Array[Double]] =
      seqs.getOrElseUpdate(sql,
        graft.encode.SetEncoders.flatMatrix(db, sql).map(_.padTo(Dim, 0.0)))
    usable.foreach { case (s, _) => encRaw(s) }

    val classes = usable.map { case (_, rt) => Estimator.runtimeBucket(rt, 0) }.max + 1
    val seeds = Seq(42L, 7L, 1234L)
    // six points, not four: the plateau-vs-climbing verdict rides on
    // the last segments' slope, so sample them more densely
    val fracs = (1 to 6).map(_ / 6.0)
    val rows = fracs.map { frac =>
      val prefix = usable.take(math.max(1, (usable.size * frac).toInt))
      val train = prefix.filterNot { case (sql, _) => SweepKit.isHoldout(sql) }
      // z-score over THIS prefix's train timesteps (what a campaign
      // stopped at n would have used) — SweepKit's cancellation-safe
      // variance, shared with GruSweep
      val (mean, std) = SweepKit.zStats(train, Dim, encRaw)
      val z = SweepKit.zApply(mean, std) _
      val balanced = SweepKit.balance(train)
      val data = balanced.map { case (sql, rt) =>
        (z(encRaw(sql)), Estimator.runtimeBucket(rt, 0)) }
      val testSeqs = test.map { case (sql, _) => z(encRaw(sql)) }
      val perSeed = SweepKit.parSeeds(seeds) { seed =>
        val fitted = Gru.fit(data, Gru.Config(inputDim = Dim, hidden = 48,
          classes = classes, lr = 2e-3, epochs = 30, batch = 32, seed = seed))
        testSeqs.map(fitted.predict)
      }
      val (acc, mae, f1) =
        Estimator.evaluate(SweepKit.vote(perSeed).zip(actuals), minBucket = 0)
      println(f"[curve] n=${prefix.size}%5d train=${train.size}%5d " +
        f"acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
      (prefix.size, train.size, acc, mae, f1)
    }

    // Stamp the macro-F1 denominator into every row (round-14 verdict
    // #7): the bucket-space size grows as deeper labels arrive (class 9
    // entered at r13), which silently changes what "macro" averages
    // over — a cross-generation row comparison is only readable if each
    // row carries its class count, and the table states the holdout's
    // per-class support it was scored against.
    val holdoutSupport = test
      .groupBy { case (_, rt) => Estimator.runtimeBucket(rt, 0) }
      .view.mapValues(_.size).toSeq.sorted
    val sb = new StringBuilder
    sb ++= "# GRU bucket-classifier learning curve (band campaign)\n\n"
    sb ++= s"Holdout fixed at ${test.size} queries (CRC byte < 64 over the full\n"
    sb ++= "checkpoint); train = measurement-order prefix minus holdout;\n"
    sb ++= "bucket-balanced, 3-seed vote; reference bucket space.\n\n"
    sb ++= "| n (prefix) | train | classes | heldout acc | heldout MAE (buckets) | heldout macro-F1 |\n"
    sb ++= "|---|---|---|---|---|---|\n"
    rows.foreach { case (n, tr, acc, mae, f1) =>
      sb ++= f"| $n | $tr | $classes | $acc%.3f | $mae%.3f | $f1%.3f |\n"
    }
    sb ++= s"\nHoldout composition (class: support): " +
      holdoutSupport.map { case (c, s) => s"$c: $s" }.mkString(", ") + ".\n"
    sb ++= "`classes` is the bucket-space size the macro-F1 denominator\n"
    sb ++= "averages over — rows minted under different class counts are\n"
    sb ++= "not directly comparable (a new always-zero tail class lowers\n"
    sb ++= "macro-F1 with no model change).\n"
    Files.writeString(Paths.get(outMd), sb.result())
    println(s"[curve] wrote $outMd")
  }
}
