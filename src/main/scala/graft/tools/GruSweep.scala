package graft.tools

import java.nio.file.{Files, Paths}

import graft.estimate.{Estimator, Gru, Gru4, Mscn, NeoNet, RelCnn, TreeLstm}
import graft.gen.BalancedCheckpoint
import graft.model.ModelJson

/** The neural estimator families on the band-campaign workload — all
  * of the reference's model shapes, trained from scratch (each
  * gradient-checked in its spec) instead of substituting fixed-vector
  * summary models:
  *
  *  - MSCN SetConv over the masked set matrices
  *    ([[graft.estimate.Mscn]], `dqo/estimator/others/kipf/model.py:8-48`)
  *  - Neo flat MLP regressor over the neo bit vector
  *    ([[graft.estimate.NeoNet]], `others/neo/v1/model.py:22-36`)
  *  - v20 four-traversal GRU regressor ([[graft.estimate.Gru4]],
  *    `dqo/estimator/gerelt/v20/model.py:94-122`)
  *  - child-sum TreeLSTM regressor ([[graft.estimate.TreeLstm]],
  *    `dqo/estimator/treelstm/v1/childsum.py`)
  *  - relcnn convolutional regressor ([[graft.estimate.RelCnn]],
  *    `dqo/estimator/relcnn/v1/model.py`)
  *  - single-GRU bucket classifier over the flat traversal sequence
  *    ([[graft.estimate.Gru]]), plain and bucket-balanced, 5-seed vote
  *
  * Same checkpoint, same CRC-byte holdout, same reference bucket space
  * as BandRetrain/MlpSweep, so numbers drop into the README parity
  * table unchanged.
  *
  * Every family's held-out predictions are rendered as a
  * [[graft.estimate.Report]] artifact (`REPORT_<family>.md` — the
  * reference logs per-family evaluate.py artifacts,
  * `dqo/estimator/evaluate.py:17-106`). Model checkpoints and reports
  * land under `outDir` — DERIVED from the input checkpoint's directory
  * unless overridden, so a sweep against some other checkpoint never
  * silently overwrites the repo's committed artifacts.
  *
  * Usage: `sbt 'runMain graft.tools.GruSweep [checkpoint] [statsJson] [outDir]'`
  */
object GruSweep {

  def main(args: Array[String]): Unit = {
    val cpPath = args.lift(0).getOrElse("/root/repo/data/band/campaign_x160_c2.cp")
    val statsPath = args.lift(1).getOrElse("/root/repo/data/band/x160/stats.json")
    val outDir = args.lift(2).getOrElse(
      Option(Paths.get(cpPath).toAbsolutePath.getParent)
        .map(_.toString).getOrElse("."))
    Files.createDirectories(Paths.get(s"$outDir/models"))
    val cp = BalancedCheckpoint.deserialize(Files.readString(Paths.get(cpPath)))
    val db = ModelJson.fromJson(Files.readString(Paths.get(statsPath)))
    val usable = cp.results.filter(_._2 > 0)
    println(s"[gru] ${usable.size} measured runtimes from $cpPath")

    val (test, train) = usable.partition { case (sql, _) => SweepKit.isHoldout(sql) }
    println(s"[gru] train=${train.size} heldout=${test.size}")

    // GRAFT_SWEEP_ROWS: "full" (default) runs every family and row;
    // "fast" drops the three slowest classifier rows (~60 min each at
    // n~10k: the two capacity/val-selected rows and the 45k-row
    // augmented flagship); "core" additionally skips the
    // treelstm/relcnn/mscn/neonet regressor reproductions, keeping v20
    // (the serving surrogate + MAE flagship) and the classifier rows —
    // the mid-round re-score shape where the population grew a few
    // percent and wall-clock belongs to measurement, not reproduction;
    // "v20" runs ONLY the v20 row — the shape of a mid-campaign
    // surrogate refresh, where live tail streams hot-reload the
    // rewritten gru4.json and nothing else is needed. The flagship
    // classifier artifacts (REPORT_gru.md, models/gru.json) regenerate
    // only in full or reports mode (both run the augmented h=48 row
    // that defines them); the tailweight row (same ~60-min cost class)
    // runs in full/reports mode or under its own
    // GRAFT_SWEEP_TAILWEIGHT toggle.
    // "v20cap" = the v20 refresh PLUS a capacity probe: retrain the
    // same row at hidden 96 and 128 and report per-bucket held-out
    // MAE(log2) next to h=48 — the round-12 DRIFT refresh showed v20
    // recovering only 18% in bucket 7 vs 21-31% mid-band (partial
    // saturation); this row answers whether capacity, not only data,
    // binds the deep tail.
    // "reports" (round-14 verdict #3): every REPORT_*.md artifact —
    // v20 + refspace, the four reproduction families, the augmented
    // flagship, tailweight — plus the plain/balanced/combo matrix
    // cells, all at ONE checkpoint + holdout, skipping only the two
    // REPORT-less val-selected matrix cells (balancedSel ~14 min,
    // augmentedSel h=64 ~2.5 h — the row every round has killed the
    // full sweep before; the mechanism question those cells probed was
    // settled as a ±0.01 tie in r12/r13). One reports run ≈ the
    // flagship row (~100 min) + ~45 min of everything else.
    val rowMode = sys.env.getOrElse("GRAFT_SWEEP_ROWS", "full")
    val reportsMode = rowMode == "reports"
    val fast = rowMode == "fast" || rowMode == "core"
    val coreOnly = rowMode == "core"
    val v20Cap = rowMode == "v20cap"
    val v20Only = rowMode == "v20" || v20Cap

    val Dim = 203
    val seqs = scala.collection.mutable.Map.empty[String, Array[Array[Double]]]
    def enc(sql: String): Array[Array[Double]] =
      seqs.getOrElseUpdate(sql,
        graft.encode.SetEncoders.flatMatrix(db, sql).map(_.padTo(Dim, 0.0)))
    (train ++ test).foreach { case (s, _) => enc(s) }

    // z-score per dimension over TRAIN timesteps only
    // (cancellation-safe variance + the holdout/balance/vote
    // conventions all live in SweepKit, shared with LearningCurve)
    val (mean, std) = SweepKit.zStats(train, Dim, enc)
    val z = SweepKit.zApply(mean, std) _

    val classes = usable.map { case (_, rt) => Estimator.runtimeBucket(rt, 0) }.max + 1
    // z-applied sequences cached by SQL so balanced/augmented
    // oversampling shares references instead of re-materializing a
    // fresh normalized copy per duplicate
    val zSeqs = scala.collection.mutable.Map.empty[String, Array[Array[Double]]]
    def zenc(sql: String): Array[Array[Double]] =
      zSeqs.getOrElseUpdate(sql, z(enc(sql)))
    def labeled(set: Seq[(String, Double)]): Seq[(Array[Array[Double]], Int)] =
      set.map { case (sql, rt) => (zenc(sql), Estimator.runtimeBucket(rt, 0)) }

    // bucket-balanced cyclic oversampling (training set only), the
    // BandRetrain/MlpSweep convention
    val balanced = SweepKit.balance(train)

    val actuals = test.map { case (_, rt) => math.log(rt) / math.log(2) }
    val testSeqs = test.map { case (sql, _) => z(enc(sql)) }
    def score(bucketsPerSeed: Seq[Seq[Int]]): (Double, Double, Double) =
      Estimator.evaluate(SweepKit.vote(bucketsPerSeed).zip(actuals), minBucket = 0)

    // the evaluate.py presentation artifact (confusion matrix,
    // classification report, bucket errors, binary-split scan), one per
    // family, over that family's held-out log2 predictions
    def report(family: String, what: String, predsLog2: Seq[Double]): Unit = {
      graft.estimate.Report.write(s"$outDir/REPORT_$family.md",
        s"$what — held-out (${test.size} queries; campaign checkpoint n=${usable.size})",
        test.zip(predsLog2).map { case ((sql, rt), predLog2) =>
          graft.estimate.Report.ResultRow(sql.take(80), rt, math.pow(2.0, predLog2)) })
      println(s"[$family] report artifact: $outDir/REPORT_$family.md")
    }

    // ---- v20 architecture: four traversal GRUs + tanh head, smooth-L1
    // regression on log2 runtime (the reference's own loss/label space) —
    // trees from the parent-linked encoder form, same z-scored vectors
    val trees = scala.collection.mutable.Map.empty[String, graft.estimate.Gru4.Tree]
    def tree(sql: String): graft.estimate.Gru4.Tree =
      trees.getOrElseUpdate(sql, {
        val (parents, vecs) = graft.encode.SetEncoders.treeWithParents(db, sql)
        graft.estimate.Gru4.fromParents(parents,
          z(vecs.map(_.padTo(Dim, 0.0))))
      })
    val v20Train = train.map { case (sql, rt) =>
      (tree(sql), math.log(rt) / math.log(2)) }
    val testTrees = test.map { case (sql, _) => tree(sql) }
    val seeds = Seq(42L, 7L, 1234L)
    val v20PerSeed = SweepKit.parSeeds(seeds) { seed =>
      val t0 = System.nanoTime()
      val fitted = Gru4.fit(v20Train, Gru4.Config(inputDim = Dim, hidden = 48,
        headHidden = 32, lr = 2e-3, epochs = 30, batch = 32, seed = seed))
      val sec = (System.nanoTime() - t0) / 1e9
      if (seed == seeds.last)
        // the z-score constants ride along: without them a later
        // session would feed raw features to z-fitted weights
        graft.estimate.ModelIo.saveGru4(s"$outDir/models/gru4.json",
          fitted, Some((mean, std)))
      val preds = testTrees.map(fitted.predict)
      val (acc, mae, f1) = Estimator.evaluate(preds.zip(actuals), minBucket = 0)
      println(f"[v20-1] 4-traversal seed=$seed%4d (${sec}%.0f s, " +
        f"loss ${fitted.losses.head}%.3f->${fitted.losses.last}%.3f) " +
        f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
      preds
    }
    val avg = v20PerSeed.transpose.map(ps => ps.sum / ps.size)
    val (vAcc, vMae, vF1) = Estimator.evaluate(avg.zip(actuals), minBucket = 0)
    println(f"[v20-ens] 4-traversal mean of ${seeds.size} seeds " +
      f"| heldout REF-SPACE: acc=$vAcc%.3f mae=$vMae%.3f f1=$vF1%.3f")
    report("v20", "v20 4-traversal GRU ensemble", avg)
    // the README/BASELINE v20 headline is quoted in the REFERENCE's
    // bucket space (<=1 s -> bucket 0, partitioner.py:40-46) and must
    // trace to a committed artifact, not console scrollback: this
    // variant clamps BOTH sides at 1 s, exactly like the printed
    // REF-SPACE metrics (Estimator.evaluate minBucket = 0)
    graft.estimate.Report.write(s"$outDir/REPORT_v20_refspace.md",
      s"v20 4-traversal GRU ensemble — held-out (${test.size} queries; " +
        s"campaign checkpoint n=${usable.size}; " +
        "reference bucket space, <=1 s -> bucket 0 on both sides)",
      test.zip(avg).map { case ((sql, rt), predLog2) =>
        graft.estimate.Report.ResultRow(sql.take(80), math.max(1.0, rt),
          math.max(1.0, math.pow(2.0, predLog2))) })
    println(s"[v20] refspace report artifact: $outDir/REPORT_v20_refspace.md")

    if (v20Cap) {
      // capacity probe: identical data, z-stats, seeds, epochs and loss
      // as the h=48 row above — hidden width is the ONLY variable, so a
      // bucket-7 gap is attributable to capacity alone
      def perBucketMae(preds: Seq[Double]): Map[Int, (Int, Double)] =
        test.zip(preds).groupBy { case ((_, rt), _) =>
          Estimator.runtimeBucket(rt, 0)
        }.map { case (b, rows) =>
          val errs = rows.map { case ((_, rt), p) =>
            math.abs(p - math.log(rt) / math.log(2)) }
          b -> (rows.size, errs.sum / errs.size)
        }
      val capLines = new StringBuilder
      capLines.append("# v20 capacity probe — held-out per-bucket MAE(log2)\n\n")
      capLines.append(s"Checkpoint: `$cpPath` (train ${train.size} / held-out ")
      capLines.append(s"${test.size}); 3-seed ensembles; identical protocol to ")
      capLines.append("the serving h=48 row — hidden width is the only variable.\n\n")
      capLines.append("| hidden | acc | MAE(log2) | " +
        (0 to 8).map(b => s"b$b MAE (n)").mkString(" | ") + " |\n")
      capLines.append("|---|---|---|" + (0 to 8).map(_ => "---").mkString("|") + "|\n")
      def capRow(label: String, preds: Seq[Double]): Unit = {
        val (acc, mae, _) = Estimator.evaluate(preds.zip(actuals), minBucket = 0)
        val pb = perBucketMae(preds)
        capLines.append(f"| $label | $acc%.3f | $mae%.3f | " +
          (0 to 8).map { b =>
            pb.get(b).map { case (n, m) => f"$m%.3f ($n)" }.getOrElse("—")
          }.mkString(" | ") + " |\n")
      }
      capRow("48 (serving)", avg)
      for (h <- Seq(96, 128)) {
        val perSeed = SweepKit.parSeeds(seeds) { seed =>
          val t0 = System.nanoTime()
          val fitted = Gru4.fit(v20Train, Gru4.Config(inputDim = Dim, hidden = h,
            headHidden = 32, lr = 2e-3, epochs = 30, batch = 32, seed = seed))
          val sec = (System.nanoTime() - t0) / 1e9
          if (seed == seeds.last)
            graft.estimate.ModelIo.saveGru4(s"$outDir/models/gru4_h$h.json",
              fitted, Some((mean, std)))
          val preds = testTrees.map(fitted.predict)
          val (acc, mae, f1) = Estimator.evaluate(preds.zip(actuals), minBucket = 0)
          println(f"[v20cap] h=$h seed=$seed%4d (${sec}%.0f s) " +
            f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
          preds
        }
        capRow(s"$h", perSeed.transpose.map(ps => ps.sum / ps.size))
      }
      capLines.append("\nServe the wider model (copy `models/gru4_h<h>.json` " +
        "over `models/gru4.json`) only if it cuts bucket-7 MAE >= 30% vs " +
        "h=48 — otherwise the deep tail is data-bound, not capacity-bound.\n")
      Files.writeString(Paths.get(s"$outDir/REPORT_v20_capacity.md"),
        capLines.toString)
      println(s"[v20cap] capacity report: $outDir/REPORT_v20_capacity.md")
    }

    if (v20Only) {
      println(s"[gru] GRAFT_SWEEP_ROWS=$rowMode: surrogate refresh complete, " +
        "skipping classifier and reproduction rows")
      return
    }

    if (!coreOnly) {
    // ---- child-sum TreeLSTM (the reference's treelstm family), same
    // trees, same smooth-L1 log2 regression
    val tlPerSeed = SweepKit.parSeeds(seeds) { seed =>
      val t0 = System.nanoTime()
      val fitted = TreeLstm.fit(v20Train, TreeLstm.Config(inputDim = Dim,
        hidden = 48, lr = 2e-3, epochs = 30, batch = 32, seed = seed))
      val sec = (System.nanoTime() - t0) / 1e9
      if (seed == seeds.last)
        graft.estimate.ModelIo.saveTreeLstm(s"$outDir/models/treelstm.json",
          fitted, Some((mean, std)))
      val preds = testTrees.map(fitted.predict)
      val (acc, mae, f1) = Estimator.evaluate(preds.zip(actuals), minBucket = 0)
      println(f"[tl-1] treelstm seed=$seed%4d (${sec}%.0f s, " +
        f"loss ${fitted.losses.head}%.3f->${fitted.losses.last}%.3f) " +
        f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
      preds
    }
    val tlAvg = tlPerSeed.transpose.map(ps => ps.sum / ps.size)
    val (tAcc, tMae, tF1) = Estimator.evaluate(tlAvg.zip(actuals), minBucket = 0)
    println(f"[tl-ens] treelstm mean of ${seeds.size} seeds " +
      f"| heldout REF-SPACE: acc=$tAcc%.3f mae=$tMae%.3f f1=$tF1%.3f")
    report("treelstm", "child-sum TreeLSTM ensemble", tlAvg)

    // ---- relcnn (conv over the node matrix), same sequences, same
    // smooth-L1 log2 regression
    val cnnTrain = train.map { case (sql, rt) =>
      (z(enc(sql)), math.log(rt) / math.log(2)) }
    val cnnPerSeed = SweepKit.parSeeds(seeds) { seed =>
      val t0 = System.nanoTime()
      val fitted = RelCnn.fit(cnnTrain, RelCnn.Config(inputDim = Dim,
        filters = 64, headHidden = 32, lr = 2e-3, epochs = 30, batch = 32,
        seed = seed))
      val sec = (System.nanoTime() - t0) / 1e9
      if (seed == seeds.last)
        graft.estimate.ModelIo.saveRelCnn(s"$outDir/models/relcnn.json",
          fitted, Some((mean, std)))
      val preds = testSeqs.map(fitted.predict)
      val (acc, mae, f1) = Estimator.evaluate(preds.zip(actuals), minBucket = 0)
      println(f"[cnn-1] relcnn seed=$seed%4d (${sec}%.0f s, " +
        f"loss ${fitted.losses.head}%.3f->${fitted.losses.last}%.3f) " +
        f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
      preds
    }
    val cnnAvg = cnnPerSeed.transpose.map(ps => ps.sum / ps.size)
    val (cAcc, cMae, cF1) = Estimator.evaluate(cnnAvg.zip(actuals), minBucket = 0)
    println(f"[cnn-ens] relcnn mean of ${seeds.size} seeds " +
      f"| heldout REF-SPACE: acc=$cAcc%.3f mae=$cMae%.3f f1=$cF1%.3f")
    report("relcnn", "relcnn convolutional ensemble", cnnAvg)

    // ---- MSCN SetConv over the raw binary set matrices (no z-score —
    // the reference feeds the 0/1 encodings directly), trained with the
    // notebook's exp-space squared loss on min-max-normalized ln labels
    val setCache = scala.collection.mutable.Map.empty[String, Mscn.Sets]
    def msets(sql: String): Mscn.Sets =
      setCache.getOrElseUpdate(sql,
        Mscn.sets(graft.encode.SetEncoders.encodeMscn(db, sql)))
    (train ++ test).foreach { case (s, _) => msets(s) }
    val anyEnc = graft.encode.SetEncoders.encodeMscn(db, train.head._1)
    val (tf, pf, jf) = (anyEnc.tables.head.length,
      anyEnc.predicates.head.length,
      math.max(1, anyEnc.joins.headOption.map(_.length).getOrElse(1)))
    val mscnTrain = train.map { case (sql, rt) => (msets(sql), rt) }
    val testSets = test.map { case (sql, _) => msets(sql) }
    val actualSecs = test.map(_._2)
    val mscnPerSeed = SweepKit.parSeeds(seeds) { seed =>
      val t0 = System.nanoTime()
      val fitted = Mscn.fit(mscnTrain, Mscn.Config(tf, pf, jf, hidden = 64,
        lr = 1e-3, epochs = 60, batch = 32, seed = seed))
      val sec = (System.nanoTime() - t0) / 1e9
      if (seed == seeds.last)
        graft.estimate.ModelIo.saveMscn(s"$outDir/models/mscn.json", fitted)
      val preds = testSets.map(fitted.predictLog2)
      val (acc, mae, f1) = Estimator.evaluate(preds.zip(actuals), minBucket = 0)
      val qe = Mscn.qerrorSummary(
        testSets.map(fitted.predictSeconds).zip(actualSecs))
      println(f"[mscn1] setconv seed=$seed%4d (${sec}%.0f s, " +
        f"loss ${fitted.losses.head}%.3f->${fitted.losses.last}%.3f) " +
        f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f " +
        f"| qerr med=${qe("median")}%.2f p95=${qe("p95")}%.2f")
      preds
    }
    val mscnAvg = mscnPerSeed.transpose.map(ps => ps.sum / ps.size)
    val (mAcc, mMae, mF1) = Estimator.evaluate(mscnAvg.zip(actuals), minBucket = 0)
    println(f"[mscn-ens] setconv mean of ${seeds.size} seeds " +
      f"| heldout REF-SPACE: acc=$mAcc%.3f mae=$mMae%.3f f1=$mF1%.3f")
    report("mscn", "MSCN SetConv ensemble", mscnAvg)

    // ---- Neo regressor (flat 4-layer MLP — the shape both reference
    // Neo variants actually are) over the flat neo bit vector,
    // smooth-L1 on log2 runtime, at the reference's Adam lr 1e-4
    // (neo/v1/model.py:72) with the epoch count scaled up to
    // compensate for the smaller campaign
    val neoFeat = scala.collection.mutable.Map.empty[String, Array[Double]]
    def nfeat(sql: String): Array[Double] =
      neoFeat.getOrElseUpdate(sql, Estimator.featurizeWith(db, sql, "neo"))
    (train ++ test).foreach { case (s, _) => nfeat(s) }
    val neoDim = nfeat(train.head._1).length
    val neoTrain = train.map { case (sql, rt) =>
      (nfeat(sql), math.log(rt) / math.log(2)) }
    val neoTestX = test.map { case (sql, _) => nfeat(sql) }
    val neoPerSeed = SweepKit.parSeeds(seeds) { seed =>
      val t0 = System.nanoTime()
      val fitted = NeoNet.fit(neoTrain, NeoNet.Config(inputDim = neoDim,
        lr = 1e-4, epochs = 600, batch = 32, seed = seed))
      val sec = (System.nanoTime() - t0) / 1e9
      if (seed == seeds.last)
        graft.estimate.ModelIo.saveNeo(s"$outDir/models/neonet.json", fitted)
      val preds = neoTestX.map(fitted.predict)
      val (acc, mae, f1) = Estimator.evaluate(preds.zip(actuals), minBucket = 0)
      println(f"[neo1] neonet seed=$seed%4d (${sec}%.0f s, " +
        f"loss ${fitted.losses.head}%.3f->${fitted.losses.last}%.3f) " +
        f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
      preds
    }
    val neoAvg = neoPerSeed.transpose.map(ps => ps.sum / ps.size)
    val (nAcc, nMae, nF1) = Estimator.evaluate(neoAvg.zip(actuals), minBucket = 0)
    println(f"[neo-ens] neonet mean of ${seeds.size} seeds " +
      f"| heldout REF-SPACE: acc=$nAcc%.3f mae=$nMae%.3f f1=$nF1%.3f")
    report("neonet", "Neo flat-MLP ensemble", neoAvg)
    } // coreOnly skip (treelstm/relcnn/mscn/neonet reproductions)

    // ---- tpch_aug analog: the reference's best gerelt F1 (0.754,
    // BASELINE.md model table) comes from the AUGMENTED dataset, so the
    // flagship classifier also gets an augmented-train row. z-score
    // constants stay those of the unaugmented train split: all three
    // rows then share one feature space, and permutations only reorder
    // rows/subtrees so the per-dimension moments barely move.
    lazy val augmented = SweepKit.augment(train, db, limit = 8,
      holdout = test.map(_._1).toSet)
    def logAugmented(): Unit = println(s"[gru] augmented train=${augmented.size} " +
      s"(tpch_aug analog, ${train.size} originals, permutation limit 8)")

    // the h=64/45-epoch rows scale classifier capacity with the grown
    // campaign: h=48/30 preserves curve-comparability with every earlier
    // round, while the larger run answers "is 48 hidden units the
    // binding constraint at this n?" without disturbing that protocol
    lazy val balAug = { logAugmented(); SweepKit.balance(augmented) }
    // the capacity rows additionally select the BEST-VALIDATION epoch
    // instead of the last (Gru.fitValSelected — the reference's
    // lightning val-checkpoint selection): their training set excludes
    // a ~10% CRC-band validation carve (disjoint from the holdout by
    // construction), and the carve is taken from the RAW train split
    // before balancing/augmenting so no oversampled or permuted copy of
    // a validation query leaks into training
    val (valRaw, fitRaw) = train.partition { case (sql, _) => SweepKit.isVal(sql) }
    val valData = labeled(valRaw)
    println(s"[gru] val carve for best-epoch rows: ${valRaw.size} " +
      s"(fit train ${fitRaw.size})")
    lazy val balancedSel = SweepKit.balance(fitRaw)
    lazy val balAugSel = SweepKit.balance(SweepKit.augment(fitRaw, db, limit = 8,
      holdout = (test.map(_._1) ++ valRaw.map(_._1)).toSet))
    // the flagship classifier votes over 5 seeds (regressor families
    // stay at 3 for curve comparability): parSeeds fits them
    // concurrently so the wider vote costs no wall-clock, and near the
    // published band's edge the extra two members cut the vote's
    // seed-to-seed spread below the margin being measured
    val clsSeeds = seeds ++ Seq(99L, 2025L)
    val clsRows =
      if (fast) Seq(("plain", train, 48, 30, false),
                    ("balanced", balanced, 48, 30, false))
      else if (reportsMode)
           Seq(("plain", train, 48, 30, false),
               ("balanced", balanced, 48, 30, false),
               ("augmented", balAug, 48, 30, false))
      else Seq(("plain", train, 48, 30, false),
               ("balanced", balanced, 48, 30, false),
               ("balanced", balancedSel, 64, 45, true),
               ("augmented", balAug, 48, 30, false),
               ("augmented", balAugSel, 64, 45, true))
    for ((label, set, hidden, epochs, valSel) <- clsRows) {
      val data = labeled(set)
      val perSeed = SweepKit.parSeeds(clsSeeds) { seed =>
        val t0 = System.nanoTime()
        val cfg = Gru.Config(inputDim = Dim, hidden = hidden,
          classes = classes, lr = 2e-3, epochs = epochs, batch = 32, seed = seed)
        val (fitted, bestEp) =
          if (valSel) {
            val (f, ep, valF1) = Gru.fitValSelected(data, cfg, valData)
            println(f"[gru1] $label%-8s h=$hidden seed=$seed%4d " +
              f"best epoch $ep/${epochs} (val f1=$valF1%.3f)")
            (f, ep)
          } else (Gru.fit(data, cfg), epochs)
        val sec = (System.nanoTime() - t0) / 1e9
        require(bestEp >= 1, s"val selection never improved on init (seed $seed)")
        // persist the flagship band-comparison classifier (augmented
        // train, curve-protocol capacity) with its z-score constants,
        // completing the six-family checkpoint set alongside
        // gru4/treelstm/relcnn/mscn/neonet
        if (label == "augmented" && hidden == 48 && seed == clsSeeds.last)
          graft.estimate.ModelIo.saveGru(s"$outDir/models/gru.json",
            fitted, Some((mean, std)))
        val preds = testSeqs.map(fitted.predict)
        val (acc, mae, f1) = score(Seq(preds))
        println(f"[gru1] $label%-8s h=$hidden e=$epochs seed=$seed%4d (${sec}%.0f s, " +
          f"loss ${fitted.losses.head}%.3f->${fitted.losses.last}%.3f) " +
          f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
        preds
      }
      val (acc, mae, f1) = score(perSeed)
      println(f"[vote] $label%-8s h=$hidden e=$epochs seeds=${clsSeeds.size} " +
        f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
      // the flagship band-comparison family (augmented = the tpch_aug
      // analog the reference's published 0.754 comes from) gets the
      // evaluate.py artifact too; voted buckets stand in for log2 preds.
      // TRUE runtimes are clamped into the same reference bucket space
      // the classifier votes in (<=1 s -> bucket 0, partitioner.py:40-46)
      // — rendered raw, every sub-second query would land in a negative
      // true bucket no ref-space classifier can emit, and the summary
      // table would contradict the REF-SPACE metrics above
      if (label == "augmented" && hidden == 48) {
        val voted = SweepKit.vote(perSeed)
        graft.estimate.Report.write(s"$outDir/REPORT_gru.md",
          s"GRU bucket classifier, augmented train, ${clsSeeds.size}-seed vote — held-out " +
            s"(${test.size} queries; campaign checkpoint n=${usable.size}; " +
            "reference bucket space, <=1 s -> bucket 0)",
          test.zip(voted).map { case ((sql, rt), predLog2) =>
            graft.estimate.Report.ResultRow(sql.take(80),
              math.max(1.0, rt), math.pow(2.0, predLog2)) })
        println(s"[gru] report artifact: $outDir/REPORT_gru.md")
      }
    }

    // full mode (or an explicit GRAFT_SWEEP_TAILWEIGHT) only: the row
    // below costs the same ~60 min the fast/core modes exist to skip,
    // and its artifact should not regenerate in cut-down runs while the
    // flagship artifacts stay full-only
    if (!fast || sys.env.contains("GRAFT_SWEEP_TAILWEIGHT")) {
    // ---- tail-weighted row: the two zero-new-wall-clock levers the
    // balanced rows don't use — (a) PER-BUCKET permutation augmentation
    // (a tail measurement that cost minutes of wall-clock expands into
    // up to 16 free rows at its label; the 5k-strong sub-second bucket
    // stays at ~1), and (b) inverse-frequency class weights in the loss
    // (SweepKit.classWeights -> Gru.fitValSelectedWeighted) instead of
    // cyclic oversampling, so rare buckets get gradient mass without
    // hundreds of duplicated copies of the same 12 rows. Val-selected
    // epoch, same carve and holdout as the capacity rows.
    val tailAug = SweepKit.augmentPerBucket(fitRaw, db, capLimit = 16,
      holdout = (test.map(_._1) ++ valRaw.map(_._1)).toSet)
    val tailLabeled = tailAug.map { case (sql, rt) =>
      (zenc(sql), Estimator.runtimeBucket(rt, 0)) }
    val cw = SweepKit.classWeights(tailLabeled.map(_._2), classes, cap = 10.0)
    println(s"[gru] tailweight train=${tailAug.size} (from ${fitRaw.size}) " +
      s"class weights=${cw.map(w => f"$w%.2f").mkString(",")}")
    val tailData = tailLabeled.map { case (s, l) => (s, l, cw(l)) }
    val tailPerSeed = SweepKit.parSeeds(clsSeeds) { seed =>
      val t0 = System.nanoTime()
      val cfg = Gru.Config(inputDim = Dim, hidden = 64,
        classes = classes, lr = 2e-3, epochs = 45, batch = 32, seed = seed)
      val (fitted, bestEp, valF1) = Gru.fitValSelectedWeighted(tailData, cfg, valData)
      val sec = (System.nanoTime() - t0) / 1e9
      require(bestEp >= 1, s"val selection never improved on init (seed $seed)")
      val preds = testSeqs.map(fitted.predict)
      val (acc, mae, f1) = score(Seq(preds))
      println(f"[gru1] tailweight h=64 e=45 seed=$seed%4d (${sec}%.0f s, " +
        f"best epoch $bestEp, val f1=$valF1%.3f) " +
        f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
      preds
    }
    val (twAcc, twMae, twF1) = score(tailPerSeed)
    println(f"[vote] tailweight h=64 e=45 seeds=${clsSeeds.size} " +
      f"| heldout REF-SPACE: acc=$twAcc%.3f mae=$twMae%.3f f1=$twF1%.3f")
    val twVoted = SweepKit.vote(tailPerSeed)
    graft.estimate.Report.write(s"$outDir/REPORT_tailweight.md",
      s"GRU bucket classifier, per-bucket-augmented train + class-weighted " +
        s"loss, ${clsSeeds.size}-seed vote — held-out (${test.size} queries; " +
        s"campaign checkpoint n=${usable.size}; " +
        "reference bucket space, <=1 s -> bucket 0)",
      test.zip(twVoted).map { case ((sql, rt), predLog2) =>
        graft.estimate.Report.ResultRow(sql.take(80),
          math.max(1.0, rt), math.pow(2.0, predLog2)) })
    println(s"[gru] report artifact: $outDir/REPORT_tailweight.md")

    // ---- combo row: the pairing the matrix was missing. The rows above
    // test balanced-DRAW alone (balancedSel), augmentation alone
    // (balAugSel), and augmentation × class-WEIGHTS (tailweight); this
    // one is augmentation × balanced-draw — cyclic oversampling over the
    // per-bucket-augmented train, unweighted loss (stacking weights on
    // top of a draw that already equalizes bucket mass would square the
    // rarity correction). If this row beats tailweight, gradient
    // repetition of real+permuted tail rows matters more than loss
    // scaling; if it ties, the augmentation is the active ingredient.
    val comboData = {
      val byLabel = tailLabeled
      // balance on the ROUNDED ref-space labels the classifier trains on
      val counts = byLabel.groupBy(_._2).view.mapValues(_.size).toMap
      val most = counts.values.max
      byLabel.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        Iterator.continually(rows).flatten.take(most)
      }
    }
    println(s"[gru] combo train=${comboData.size} " +
      s"(balanced draw over per-bucket-augmented ${tailAug.size})")
    val comboPerSeed = SweepKit.parSeeds(clsSeeds) { seed =>
      val t0 = System.nanoTime()
      val cfg = Gru.Config(inputDim = Dim, hidden = 64,
        classes = classes, lr = 2e-3, epochs = 45, batch = 32, seed = seed)
      val (fitted, bestEp, valF1) = Gru.fitValSelected(comboData, cfg, valData)
      val sec = (System.nanoTime() - t0) / 1e9
      require(bestEp >= 1, s"val selection never improved on init (seed $seed)")
      val preds = testSeqs.map(fitted.predict)
      val (acc, mae, f1) = score(Seq(preds))
      println(f"[gru1] combo     h=64 e=45 seed=$seed%4d (${sec}%.0f s, " +
        f"best epoch $bestEp, val f1=$valF1%.3f) " +
        f"| heldout REF-SPACE: acc=$acc%.3f mae=$mae%.3f f1=$f1%.3f")
      preds
    }
    val (cbAcc, cbMae, cbF1) = score(comboPerSeed)
    println(f"[vote] combo     h=64 e=45 seeds=${clsSeeds.size} " +
      f"| heldout REF-SPACE: acc=$cbAcc%.3f mae=$cbMae%.3f f1=$cbF1%.3f")
    } // tailweight gate (full mode / GRAFT_SWEEP_TAILWEIGHT)
  }
}
