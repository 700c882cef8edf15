package graft.lab

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.util.Try

import graft.gen.{BalancedCheckpoint, GuidedQueryGen, Log2Partitioner}
import graft.model.DbModel

/** Active-sampling campaign for the RUNTIME TAIL (the 32–256 s log2
  * buckets that gate estimator macro-F1 parity — BandCampaign's
  * population holds thousands of sub-second measurements but only tens
  * above 64 s, because every measured candidate costs its own runtime).
  *
  * The balanced campaign's guided control loop (guided.py:119-177)
  * EXECUTES every mutation step to decide narrow/broaden — so steering
  * a query from 0.5 s up into the band burns minutes of measurement
  * wall-clock on labels the population doesn't need. This campaign
  * replaces the step runner with the SERVED estimator checkpoints —
  * the max over the v20 regressor and the gru bucket classifier
  * ([[graft.estimate.Scoring.maxPredictorFor]]), hot-reloaded when
  * their files change: mutations are steered by
  * predicted runtime at ~1 ms per step, and the real executor is
  * invoked only when the prediction lands inside the screen band —
  * active sampling, turning "every candidate costs its runtime" into
  * "only probable-tail candidates do". Every REAL measurement is
  * recorded whatever bucket it truly lands in (a mispredicted 8 s query
  * is still a valid label); surrogate estimates are never recorded.
  *
  * Checkpoint format is [[BalancedCheckpoint]] with the compute budget
  * stamped, so [[graft.tools.CheckpointMerge]] folds tail streams into
  * the main population under the same comparability check, and the
  * CRC-byte holdout assigns their queries stably. Labels use the same
  * run-twice-keep-2nd executor protocol and 300 s timeout as
  * [[BandCampaign]] at the same local[cpus] budget — mergeable by
  * construction.
  *
  * Usage: `TailCampaign [baseSfDir] [factor] [n] [workDir] [seed] [lo] [hi] [modelJson]`
  * — hunts runtimes in [lo, hi] seconds until `n` records exist,
  * resuming from its per-(seed, band) checkpoint.
  */
object TailCampaign {

  /** splitmix64 over (campaign seed, iteration) — the same
    * deterministic per-iteration seed stream [[graft.gen
    * .BalancedQueryGen]] draws, so independent tail streams with
    * different seeds explore disjoint generator sequences and a
    * kill+resume continues the stream instead of replaying it.
    */
  private def seedFor(seed: Long, i: Int): Long = {
    var z = seed + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The hunting core, separated from Spark so the spec can drive it
    * with a synthetic surrogate and a fake executor.
    *
    * Screen-band invariant: `screenLo <= lo && screenHi >= hi` is
    * REQUIRED so a surrogate estimate handed back to the guided loop
    * can never itself land inside the target band — the only values the
    * loop can score as a hit are real measurements. `screenLo < lo`
    * widens the measurement trigger below the band floor on purpose:
    * the surrogate underestimates roughly half the time (log2-MAE
    * ~0.5), so a candidate predicted at lo/2 is worth measuring.
    *
    * A failed or timed-out measurement returns `screenHi * 2` to the
    * loop (steer DOWN — at this scale a timeout means too slow, and
    * broadening a timed-out query would walk further into timeout
    * territory) and records nothing.
    */
  final class Hunter(db: DbModel,
                     surrogateSec: String => Double,
                     measure: String => Double,
                     val lo: Double, val hi: Double,
                     val screenLo: Double, val screenHi: Double,
                     seed: Long,
                     preMeasure: String => Unit = _ => (),
                     postRecord: (String, Double) => Unit = (_, _) => (),
                     known: Map[String, Double] = Map.empty,
                     driftWeightedSeeds: Boolean = false,
                     epsilon: Double = 0.0,
                     onEpsilon: (String, Double, Double) => Unit = (_, _, _) => (),
                     epsMeasure: Option[String => Double] = None) {
    require(screenLo <= lo && screenHi >= hi,
      s"screen band [$screenLo, $screenHi] must contain target band [$lo, $hi]")

    /** Real measurements only, in measurement order (the checkpoint's
      * results). Also the cross-generator memo: a SQL string some
      * earlier generator already paid to measure is never re-executed.
      */
    val measured: mutable.LinkedHashMap[String, Double] =
      mutable.LinkedHashMap.empty[String, Double]

    /** Cross-episode NEGATIVE cache: SQLs whose measurement GENUINELY
      * timed out ([[QueryTimeoutException]] — the query is too slow at
      * this compute budget, permanently). A timeout burns the full
      * timeout wall-clock (300 s in production) and GuidedQueryGen's
      * memo is per-episode — without this set a surrogate-approved
      * query that timed out once could be re-approved and re-paid in
      * every later episode or resume. Transient failures (lost
      * session, executor hiccup) are deliberately NOT cached: banning
      * a possibly-good tail candidate forever over an environment
      * blip would silently shrink the huntable space across every
      * future resume. The main loop persists this set beside the
      * checkpoint.
      */
    val failed: mutable.LinkedHashSet[String] =
      mutable.LinkedHashSet.empty[String]

    /** ε draws censored at the CAPPED timeout — kept out of the
      * permanent `failed` cache (see payMeasure) but remembered for
      * this run so the deterministic per-SQL ε coin can't re-pay the
      * same censored candidate every time the generator revisits it.
      */
    private val epsCensored = mutable.HashSet.empty[String]
    var iterations = 0
    var screenedOut = 0L // candidates the surrogate rejected — free steps
    var measureCalls = 0L
    var transientFailures = 0L // non-timeout measurement failures, not cached
    var epsSelected = 0L // screened-out candidates the ε pass-through picked
    var epsMeasured = 0L // ...of which a real measurement completed

    /** Consecutive episodes in which at least one measurement fired and
      * EVERY one of them failed (`rt <= 0`). An episode-budget stop or a
      * generator dead-end is a normal way for an episode to end; a run
      * of all-failure episodes is not — it is the signature of a dead
      * measurement session (OOM'd JVM, lost executor), and an unattended
      * stream must ABORT on it rather than loop silently forever
      * recording nothing. Reset by the first successful measurement.
      */
    var consecutiveFailedEpisodes = 0

    /** Episodes that died on an exception other than the measurement
      * budget (generator dead-ends, unparseable seed SQL) — visible in
      * the iteration log so a stream wasting its episodes on a bad seed
      * pool is diagnosable. */
    var episodeErrors = 0L
    private var episodeMeasures = 0
    private var episodeSuccesses = 0
    private var episodeEps = 0

    /** Thrown by the runner when an episode exhausts its measurement
      * budget; the guided loop's per-step Try ends the episode cleanly.
      */
    private final class EpisodeBudgetExceeded extends RuntimeException

    /** Deterministic per-SQL coin for the ε pass-through: splitmix64
      * over the SQL's (JVM-spec-stable) string hash, mapped to [0, 1).
      * Keyed on the SQL — not the episode position — so whether a
      * candidate is ε-sampled is a property of the query, independent
      * of where in the stream it shows up, and a kill+resume makes the
      * same choices.
      */
    private def epsCoin(sql: String): Double = {
      var z = sql.hashCode.toLong + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble
    }

    /** Pay for one real measurement. `epsEst` is Some(surrogate
      * estimate) when this is an ε pass-through sample of a
      * screened-OUT candidate — the (estimate, truth) pair is reported
      * through `onEpsilon` so the campaign keeps an unbiased,
      * continuously-updated estimate of what the screen loses
      * (SCREEN_AUDIT's blind spot is otherwise unmeasurable once every
      * new label is screen-conditioned).
      *
      * Failure taxonomy: a [[QueryTimeoutException]] is a fact about
      * the QUERY (too slow at this budget) → cached in `failed`
      * forever; any other failure — or a degenerate rt <= 0 — is a
      * fact about the SESSION → counted, steered down, NOT cached.
      *
      * ε samples route through `epsMeasure` when provided — the
      * campaign wires a SHORTER-timeout executor there (~1.2× the
      * screen ceiling): a censored ε draw only needs to prove the
      * candidate was past the band, so it should bill the band edge,
      * not the stream's full deep-tail timeout (the round-12 ledger's
      * six censored draws each burned up to 400 s to learn only
      * "past the timeout").
      */
    private def payMeasure(sql: String, epsEst: Option[Double]): Double = {
      preMeasure(sql)
      measureCalls += 1
      episodeMeasures += 1
      val measureFn = if (epsEst.isDefined) epsMeasure.getOrElse(measure) else measure
      Try(measureFn(sql)) match {
        case scala.util.Success(rt) if rt > 0 =>
          episodeSuccesses += 1
          measured.put(sql, rt)
          epsEst.foreach { est => epsMeasured += 1; onEpsilon(sql, est, rt) }
          postRecord(sql, rt)
          rt
        case scala.util.Failure(_: QueryTimeoutException) =>
          // a timed-out ε sample is still evidence: truth censored at
          // the timeout, reported as -1 (not in-band for loss purposes
          // only when the band top is below the timeout). A CAP-censored
          // ε draw is NOT added to the permanent negative cache — and
          // note the bound it proves is weaker than the cap itself:
          // Executor.time runs BOTH executions of the run-twice-keep-2nd
          // protocol inside one timeout, so censoring at cap only proves
          // single-run rt ≳ cap/2 ≈ 0.6×screenHi, not that the query
          // would time out at the stream's full budget; banning it could
          // block a future in-band approval after a surrogate refresh.
          if (epsEst.isEmpty || epsMeasure.isEmpty) failed += sql
          else epsCensored += sql
          epsEst.foreach { est => epsMeasured += 1; onEpsilon(sql, est, -1.0) }
          screenHi * 2
        case _ =>
          transientFailures += 1
          screenHi * 2
      }
    }

    // `known` carries labels some EARLIER campaign already paid for
    // (the seed pool below): the loop treats them as real runtimes but
    // they are never re-executed and never re-recorded — re-measuring a
    // query whose label exists would burn minutes and then lose the
    // duplicate at merge time anyway (CheckpointMerge keeps the first)
    private val runner: String => Double = sql =>
      measured.getOrElse(sql, known.getOrElse(sql, {
        if (failed.contains(sql)) screenHi * 2 // known-bad: steer down, never re-pay
        else {
          val est = Try(surrogateSec(sql)).getOrElse(Double.NaN)
          if (est.isNaN) { screenedOut += 1; 0.0 } // unencodable: broaden
          else if (est < screenLo || est > screenHi) {
            screenedOut += 1
            // ε pass-through: measure a small deterministic fraction of
            // screened-OUT candidates anyway. At most one per episode
            // (bounds the worst case — a 300 s timeout — to one episode
            // cap slot), and it shares the episode measurement budget.
            if (epsilon > 0 && epsCoin(sql) < epsilon && episodeEps < 1 &&
                episodeMeasures < episodeCap && !epsCensored.contains(sql)) {
              episodeEps += 1
              epsSelected += 1
              payMeasure(sql, Some(est))
            } else est
          }
          else if (episodeMeasures >= episodeCap) throw new EpisodeBudgetExceeded
          else payMeasure(sql, None)
        }
      }))

    /** Measurement budget per episode. A family the surrogate
      * systematically OVERestimates is the expensive failure mode: every
      * mutation clears the screen but lands below the band, the episode
      * never hits, and up to maxSteps paid measurements go to one
      * low-diversity neighborhood (observed in the first fleet: a
      * 60-step episode burning ~20 min on 8 s variants of one query).
      * Capping paid measurements per episode bounds that loss and
      * returns to a fresh seed/random start, which also diversifies the
      * recorded SQL. In-band hits stop the episode before the cap ever
      * binds (stopEarly).
      */
    var episodeCap: Int = 10

    /** One guided-generator episode: random start (or a `seedSql`
      * start — see [[seedCandidates]]), surrogate-steered mutations
      * toward [lo, hi], stop at the first REAL measurement that lands
      * in-band (stopEarly) or after `maxSteps`.
      */
    def runOne(maxSteps: Int = 60, seedSql: Option[String] = None): Unit = {
      val gen = new GuidedQueryGen(db, runner, (lo, hi), stopEarly = true,
        maxSteps = maxSteps, seed = seedFor(seed, iterations))
      iterations += 1
      episodeMeasures = 0
      episodeSuccesses = 0
      episodeEps = 0
      Try {
        seedSql.foreach(gen.seedQuery)
        gen.guide()
      } match {
        // the budget stop is the episode's NORMAL end; anything else
        // (dead-end mutation space, unparseable seed) is counted so the
        // iteration log shows where a stream's episodes are going
        case scala.util.Failure(e) if !e.isInstanceOf[EpisodeBudgetExceeded] =>
          episodeErrors += 1
        case _ => ()
      }
      if (episodeMeasures > 0) {
        if (episodeSuccesses == 0) consecutiveFailedEpisodes += 1
        else consecutiveFailedEpisodes = 0
      }
    }

    /** Seed-farming pool: queries whose KNOWN runtime is already at or
      * near the band (from `known` — a prior campaign's tail — plus
      * this hunter's own in-band finds). Starting an episode from one
      * (guided.py:233-260's requeue mechanism) means the loop's first
      * mutation is already a probable-tail candidate instead of a
      * sub-second random query that must be walked up through paid
      * intermediate measurements; the seed's own label comes back free
      * through `known`/`measured`, so only NEW neighbors are executed.
      */
    private def seedPool: IndexedSeq[(String, Double)] =
      (known.iterator ++ measured.iterator).collect {
        case (sql, rt) if rt >= lo * 0.75 && rt <= hi => (sql, rt)
      }.toIndexedSeq

    def seedCandidates: IndexedSeq[String] = seedPool.map(_._1)

    /** Surrogate drift on a candidate's already-paid label, in log2
      * space — how UNRELIABLE the served model is at that query. An
      * unencodable estimate counts as maximally unreliable (3 log2 ≈
      * the worst per-bucket drift ever observed).
      *
      * Cached per SQL: a label never changes, and the surrogate only
      * changes on hot-reload — without the cache every drift-weighted
      * pick re-runs a full forward pass (two families, ~1 ms) over the
      * ENTIRE pool, which grows with every record the stream mints.
      * [[invalidateDriftCache]] is the reload hook.
      */
    private val driftCache = mutable.HashMap.empty[String, Double]

    /** Drop memoized drifts — call after the served surrogate changes
      * (checkpoint hot-reload): the old model's drift is stale. */
    def invalidateDriftCache(): Unit = driftCache.clear()

    private def seedDrift(sql: String, rt: Double): Double =
      driftCache.getOrElseUpdate(sql, {
        val est = Try(surrogateSec(sql)).getOrElse(Double.NaN)
        if (est.isNaN || est <= 0) 3.0
        else math.abs(math.log(est / rt) / math.log(2.0))
      })

    /** Deterministic pool pick for this iteration (splitmix over the
      * iteration counter, like the episode seeds). With
      * `driftWeightedSeeds`, candidates are drawn proportionally to the
      * surrogate's drift on their known label — the guided-feedback
      * idea aimed at the MODEL instead of the bucket counts: episodes
      * start where the served model is least reliable, so the stream
      * both labels the model's blind spots and keeps its screen honest
      * there. The +0.1 floor keeps well-predicted seeds reachable.
      */
    def pickSeed: Option[String] = {
      val pool = seedPool
      if (pool.isEmpty) None
      else if (!driftWeightedSeeds)
        Some(pool(((seedFor(seed, iterations) % pool.size).toInt
          + pool.size) % pool.size)._1)
      else {
        val w = pool.map { case (sql, rt) => seedDrift(sql, rt) + 0.1 }
        val u = ((seedFor(seed, iterations) >>> 11).toDouble /
          (1L << 53).toDouble) * w.sum
        var acc = 0.0
        var i = 0
        while (i < pool.size - 1 && acc + w(i) < u) { acc += w(i); i += 1 }
        Some(pool(i)._1)
      }
    }

    def checkpoint(budget: Option[String]): BalancedCheckpoint = {
      val part = new Log2Partitioner()
      val counts = Array.fill(part.k)(0L)
      measured.valuesIterator.foreach(rt =>
        counts(math.min(part.partition(rt), counts.length - 1)) += 1)
      BalancedCheckpoint(seed, iterations, measured.size, counts.toSeq,
        measured.toSeq, lastSql = None, budget = budget)
    }

    def restore(cp: BalancedCheckpoint): Unit = {
      require(cp.iterations >= 0, "merged checkpoint is not resumable")
      iterations = cp.iterations
      measured.clear()
      cp.results.foreach { case (sql, rt) => measured.put(sql, rt) }
    }
  }

  /** The ε-measurement cap, or None when no REAL cap applies.
    *
    * Some(c) with c = min over the stream timeout of ~1.2× the screen
    * ceiling — an ε draw only needs to prove the candidate is past the
    * screen, so it bills the band edge, not the deep-tail budget.
    * None when that formula lands on the stream timeout itself
    * (32-256 s band: min(300, ceil(1.2*280)=336) = 300): a draw
    * censored there carries FULL-budget evidence and must take the old
    * permanent-negative-cache route, not the JVM-lifetime epsCensored
    * set that a babysitter relaunch forgets (round-13 advice).
    */
  def epsCap(timeoutSec: Int, screenHiSec: Double): Option[Int] = {
    val c = math.min(timeoutSec, math.ceil(1.2 * screenHiSec).toInt)
    if (c < timeoutSec) Some(c) else None
  }

  def main(args: Array[String]): Unit = {
    val baseSfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toDouble).getOrElse(160.0)
    val n = args.lift(2).map(_.toInt).getOrElse(Int.MaxValue)
    val workDir = args.lift(3).getOrElse("/tmp/graft_band")
    val seed = args.lift(4).map(_.toLong).getOrElse(50L)
    val lo = args.lift(5).map(_.toDouble).getOrElse(32.0)
    val hi = args.lift(6).map(_.toDouble).getOrElse(256.0)
    val modelJson = args.lift(7).getOrElse("/root/repo/data/band/models/gru4.json")
    // prior campaign whose measured tail seeds the hunt ("" disables);
    // must be the same compute budget — its labels feed `known`
    val seedCpPath = args.lift(8)
      .getOrElse("/root/repo/data/band/campaign_x160_c2.cp")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "2")
    val budget = Some(s"x${factor.toInt}_c$cpus")

    val scaledDir = BandCampaign.ensureScaled(baseSfDir, factor, workDir)
    println(s"[tail] measurement session: local[$cpus], band [$lo, $hi] s")
    val spark = BandCampaign.session(cpus)
    val db = BandCampaign.openScaled(spark, scaledDir)

    // The screen nominates on the MAX of the v20 regressor and (when a
    // gru classifier checkpoint exists) the classifier's bucket center
    // (Scoring.maxPredictorFor): the regressor's drift is worst exactly
    // where this campaign hunts (class-7 mean 1.15 log2, DRIFT.md), and
    // true 30–45 s candidates it predicts sub-second would be rejected
    // unmeasured — with two independently-erring families either one
    // can nominate. GRAFT_TAIL_CLS_MODEL overrides the classifier path
    // ("" disables it).
    val clsJson = sys.env.getOrElse("GRAFT_TAIL_CLS_MODEL",
      "/root/repo/data/band/models/gru.json")
    // keep the CONFIGURED paths, present or not: the reload poll below
    // watches all of them, so a classifier checkpoint a later sweep
    // writes is picked up when its file APPEARS — a launch-time
    // existence filter would silently run single-family forever
    val modelPaths = Seq(modelJson) ++ (if (clsJson.nonEmpty) Seq(clsJson) else Nil)
    require(Files.exists(Paths.get(modelJson)),
      s"no surrogate regressor checkpoint found at $modelJson")
    modelPaths.filterNot(p => Files.exists(Paths.get(p))).foreach(p =>
      println(s"[tail s$seed] NOTE: checkpoint $p absent at launch — " +
        "will join the screen when its file appears"))
    val statsStr = Files.readString(Paths.get(s"$scaledDir/stats.json"))
    def buildPredictor(): String => Double =
      graft.estimate.Scoring.maxPredictorFor(
        modelPaths.filter(p => Files.exists(Paths.get(p)))
          .map(p => Files.readString(Paths.get(p))), statsStr)
    // None for a missing file: appearance/disappearance is itself a
    // stamp change, which is what triggers the rebuild
    def stampsNow: Seq[Option[java.nio.file.attribute.FileTime]] =
      modelPaths.map(p => Try(Files.getLastModifiedTime(Paths.get(p))).toOption)
    var predictLog2 = buildPredictor()
    var lastStamps = stampsNow
    var hunterRef: Hunter = null
    // Hot-reload the served checkpoints when their files change: the
    // population a long stream mints refines the surrogate mid-flight
    // (a sweep rewrites gru4.json), and a screen frozen at launch time
    // would keep the blind spots the refresh just fixed. A failed
    // rebuild (torn read under a concurrent writer) keeps the old
    // predictor and retries next iteration, since the stamps only
    // advance on success.
    def maybeReload(): Unit = {
      val s = Try(stampsNow).getOrElse(lastStamps)
      if (s != lastStamps) Try(buildPredictor()) match {
        case scala.util.Success(p) =>
          predictLog2 = p
          lastStamps = s
          if (hunterRef != null) hunterRef.invalidateDriftCache()
          println(s"[tail s$seed] reloaded surrogate checkpoints " +
            modelPaths.mkString(", "))
        case scala.util.Failure(e) =>
          println(s"[tail s$seed] surrogate reload failed (torn write?), " +
            s"keeping previous: $e")
      }
    }
    println(s"[tail s$seed] surrogate families: ${modelPaths.size} " +
      s"(${modelPaths.mkString(", ")})")
    // GRAFT_TAIL_TIMEOUT raises the measurement ceiling for deep-tail
    // bands (a 300 s timeout cannot label the 256–362 s half of
    // reference class 8); GRAFT_TAIL_EPISODE_CAP raises the per-episode
    // measurement budget where walking up into the band needs more paid
    // intermediate steps than the default 10
    val timeoutSec = sys.env.get("GRAFT_TAIL_TIMEOUT").map(_.toInt).getOrElse(300)
    val executor = new Executor(spark, timeoutSec = timeoutSec)
    // ε samples bill a capped timeout: a censored ε draw only needs to
    // prove the candidate was past the screen ceiling, so it bills
    // ~1.2× screenHi instead of the stream's full (possibly deep-tail)
    // timeout. Never RAISED above the stream timeout — ε labels stay
    // protocol-comparable with the stream's own. The cap is stamped
    // into each .eps line so the ledger can tell "censored at the band
    // edge" from "censored at the stream timeout".
    val screenHiSec = math.max(hi, 280.0)
    val epsCapSec = epsCap(timeoutSec, screenHiSec)
    val epsTimeoutSec = epsCapSec.getOrElse(timeoutSec)
    val epsExecutor =
      epsCapSec.map(c => new Executor(spark, timeoutSec = c)).getOrElse(executor)

    val known: Map[String, Double] =
      if (seedCpPath.isEmpty || !Files.exists(Paths.get(seedCpPath))) Map.empty
      else {
        val cp = BalancedCheckpoint.deserialize(Files.readString(Paths.get(seedCpPath)))
        require(cp.budget.forall(budget.contains),
          s"seed checkpoint budget ${cp.budget} does not match this run's $budget")
        cp.results.filter(_._2 > 0).toMap
      }
    println(s"[tail s$seed] known labels: ${known.size} (seed pool within " +
      s"[${lo * 0.75}, $hi] s: ${known.count { case (_, rt) => rt >= lo * 0.75 && rt <= hi }})")

    val cpPath = Paths.get(s"$workDir/tail_x${factor.toInt}_c${cpus}_s${seed}" +
      s"_b${lo.toInt}_${hi.toInt}.cp")
    val failedPath = Paths.get(cpPath.toString + ".failed")
    // ε pass-through ledger: one line per ε-measured screened-out
    // candidate, `est<TAB>rt<TAB>sql` (rt = -1 for a censored timeout).
    // Append-only — the point is an unbiased, ever-growing sample of
    // what the screen rejects, aggregated into SCREEN_AUDIT.md.
    val epsPath = Paths.get(cpPath.toString + ".eps")
    def save(): Unit = if (hunterRef != null) {
      Campaign.saveCheckpoint(cpPath, hunterRef.checkpoint(budget).serialize)
      // the negative cache rides beside the checkpoint (one SQL per
      // line; the generator's to_sql is single-line, and anything with
      // an embedded newline is dropped rather than corrupting the file)
      if (hunterRef.failed.nonEmpty)
        Campaign.saveCheckpoint(failedPath,
          hunterRef.failed.filterNot(_.contains("\n")).mkString("\n"))
    }

    val hunter = new Hunter(db,
      surrogateSec = sql => math.pow(2.0, predictLog2(sql)),
      measure = executor.time,
      lo = lo, hi = hi, screenLo = lo / 2, screenHi = screenHiSec,
      seed = seed,
      // incremental checkpoint BEFORE each measurement: a kill loses at
      // most the in-flight query, and the saved file is always a
      // complete serialization (Campaign.saveCheckpoint's atomic rename)
      preMeasure = _ => save(),
      postRecord = (sql, rt) => {
        save()
        println(f"[tail s$seed] RECORD ${hunterRef.measured.size}%5d " +
          f"rt=$rt%7.1f s :: ${sql.take(110)}")
      },
      known = known,
      // drift-weighted seed selection (default on; GRAFT_TAIL_DRIFT_SEEDS=0
      // restores uniform picks for A/B comparison)
      driftWeightedSeeds =
        sys.env.get("GRAFT_TAIL_DRIFT_SEEDS").forall(_ != "0"),
      // ε pass-through: measure ~2% of screened-OUT candidates so the
      // screen's blind spot stays measurable (GRAFT_TAIL_EPS overrides,
      // 0 disables)
      epsilon = sys.env.get("GRAFT_TAIL_EPS").map(_.toDouble).getOrElse(0.02),
      // line format: est<TAB>rt<TAB>cap=<sec><TAB>sql (the cap field is
      // self-describing so ScreenAudit keeps parsing legacy 3-field
      // lines from rounds that predate the cap)
      onEpsilon = (sql, est, rt) => {
        val line = f"$est%.3f\t$rt%.3f\tcap=$epsTimeoutSec\t${sql.replace("\n", " ")}\n"
        Files.writeString(epsPath, line,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
        println(f"[tail s$seed] EPS est=$est%.2f s rt=$rt%.2f s " +
          f"cap=$epsTimeoutSec s :: ${sql.take(90)}")
      },
      // wire the capped executor ONLY when a real cap applies
      // (epsTimeoutSec < timeoutSec). In the no-cap case (32-256 s
      // band: min(300, ceil(1.2*280)) = 300) an ε draw censors at the
      // FULL stream budget — exactly the case the permanent negative
      // cache exists for — so payMeasure must fall back to `measure`
      // and the old failed-cache routing, not park the candidate in the
      // JVM-lifetime epsCensored set where every babysitter relaunch
      // re-pays it (round-13 advice).
      epsMeasure = epsCapSec.map(_ => epsExecutor.time))
    hunterRef = hunter
    sys.env.get("GRAFT_TAIL_EPISODE_CAP").map(_.toInt)
      .foreach(hunter.episodeCap = _)

    if (Files.exists(cpPath)) {
      val cp = BalancedCheckpoint.deserialize(Files.readString(cpPath))
      require(cp.budget.forall(budget.contains),
        s"checkpoint budget ${cp.budget} does not match this run's $budget")
      hunter.restore(cp)
      if (Files.exists(failedPath))
        hunter.failed ++= Files.readString(failedPath).split("\n").filter(_.nonEmpty)
      println(s"[tail s$seed] resumed from $cpPath: " +
        s"${hunter.measured.size} records, iteration ${hunter.iterations}, " +
        s"${hunter.failed.size} known-failed")
    }

    // all-failure abort threshold: 5 consecutive episodes in which every
    // fired measurement returned rt <= 0 means the measurement session
    // is gone — exit non-zero so a supervisor (or the operator's ps
    // scan) sees a dead stream instead of an infinite silent loop
    val maxFailedEpisodes = 5

    while (hunter.measured.size < n) {
      maybeReload()
      // alternate seed-farmed and random-start episodes: farming mints
      // in-band neighbors at ~one measurement each, random starts keep
      // exploring query shapes the pool doesn't cover
      val seedSql = if (hunter.iterations % 2 == 0) hunter.pickSeed else None
      hunter.runOne(maxSteps = 60, seedSql = seedSql)
      if (hunter.consecutiveFailedEpisodes >= maxFailedEpisodes) {
        save()
        Console.err.println(s"[tail s$seed] ABORT: $maxFailedEpisodes " +
          "consecutive episodes with every measurement failed — " +
          "measurement session presumed dead")
        spark.stop()
        sys.exit(1)
      }
      if (hunter.iterations % 25 == 0) {
        save()
        println(s"[tail s$seed] iter=${hunter.iterations} " +
          s"records=${hunter.measured.size} screened-out=${hunter.screenedOut} " +
          s"measure-calls=${hunter.measureCalls} failed=${hunter.failed.size} " +
          s"transient=${hunter.transientFailures} " +
          s"eps=${hunter.epsMeasured}/${hunter.epsSelected} " +
          s"episode-errors=${hunter.episodeErrors} counts=" +
          hunter.checkpoint(budget).counts.mkString(","))
      }
    }
    save()
    spark.stop()
  }
}
