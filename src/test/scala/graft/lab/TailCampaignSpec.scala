package graft.lab

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.BalancedCheckpoint
import graft.model._

/** The active-sampling invariants of the tail hunter: the expensive
  * executor runs ONLY on surrogate-approved candidates, every record is
  * a real measurement (surrogate estimates are never recorded), already
  * -paid measurements are never re-executed across generators or
  * resumes, and the checkpoint round-trips through the shared
  * BalancedCheckpoint format with the budget stamped.
  */
class TailCampaignSpec extends AnyFunSuite {

  private def num(mn: Double, mx: Double) =
    NumericStats(mn, (mn + mx) / 2, mx, 1, 0, 0)

  private def col(name: String, t: DType) = ColumnModel(name, t,
    Some(ColumnStats(1000, 0, 100, index = name == "id",
      if (t == DType.Str || t == DType.Bool) None else Some(num(1, 100)),
      if (t == DType.Str) Some(StringStats(num(1, 20), num(1, 3))) else None)))

  private val db: DbModel = DbModel(Seq(
    TableModel("employees", Seq(col("id", DType.Number), col("salary", DType.Number),
      col("dept", DType.Number), col("name", DType.Str)),
      Some(TableStats(1000, 8192))),
    TableModel("departments", Seq(col("id", DType.Number), col("name", DType.Str)),
      Some(TableStats(100, 8192))),
    TableModel("companies", Seq(col("id", DType.Number), col("name", DType.Str)),
      Some(TableStats(3, 8192)))))

  /** Synthetic "true" cost (the FakeClient pattern): more relations →
    * slower, more conditions → faster — same shape GeneratorSpec's
    * guided tests steer against.
    */
  private def trueCost(sql: String): Double = {
    val rels = sql.split("FROM")(1).split("WHERE")(0).count(_ == ',') + 1
    val conds = if (sql.contains("WHERE")) sql.split("WHERE")(1).split(" AND ").length else 0
    math.pow(2.0, 2.0 * rels + 1.0 - conds * 0.4)
  }

  test("measure fires only inside the screen band; records are real measurements only") {
    val measuredSqls = scala.collection.mutable.Buffer.empty[String]
    // surrogate with a systematic ×0.7 bias (the real v20 errs too)
    val surrogate: String => Double = sql => trueCost(sql) * 0.7
    val measure: String => Double = sql => { measuredSqls += sql; trueCost(sql) }
    val h = new TailCampaign.Hunter(db, surrogate, measure,
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 7L)
    (0 until 30).foreach(_ => h.runOne(maxSteps = 25))
    assert(h.measured.nonEmpty, "hunter never measured anything")
    assert(h.screenedOut > 0, "surrogate never screened a candidate out")
    // every expensive call was surrogate-approved
    measuredSqls.foreach { sql =>
      val est = surrogate(sql)
      assert(est >= 4.0 && est <= 80.0,
        f"measured a candidate the surrogate predicted at $est%.2f s, outside the screen band")
    }
    // records are exactly the real measurements (first occurrence), and
    // the guided loop found true in-band runtimes among them
    assert(h.measured.keySet == measuredSqls.toSet)
    h.measured.foreach { case (sql, rt) => assert(rt == trueCost(sql)) }
    assert(h.measured.values.exists(rt => rt >= 8.0 && rt <= 64.0),
      "no true in-band runtime hunted down")
  }

  test("checkpoint round-trips with budget; restore resumes and never re-measures") {
    var calls = 0
    val surrogate: String => Double = trueCost
    val measure: String => Double = sql => { calls += 1; trueCost(sql) }
    val h = new TailCampaign.Hunter(db, surrogate, measure,
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 11L)
    (0 until 15).foreach(_ => h.runOne(maxSteps = 20))
    val cp = h.checkpoint(Some("x160_c2"))
    assert(cp.budget.contains("x160_c2"))
    assert(cp.produced == h.measured.size && cp.results.size == h.measured.size)
    assert(cp.counts.sum == h.measured.size)
    val rt = BalancedCheckpoint.deserialize(cp.serialize)
    assert(rt == cp)

    // a restored hunter replaying the SAME iterations re-uses the paid
    // measurements instead of re-executing them
    val callsBefore = calls
    val h2 = new TailCampaign.Hunter(db, surrogate, measure,
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 11L)
    h2.restore(rt)
    assert(h2.iterations == h.iterations && h2.measured == h.measured)
    // merged (training-only) checkpoints are refused, same as the
    // balanced generator's restore
    intercept[IllegalArgumentException] { h2.restore(rt.copy(iterations = -1)) }
    assert(calls == callsBefore)
  }

  test("seed farming: known labels come back free, only new neighbors are measured") {
    val measuredSqls = scala.collection.mutable.Buffer.empty[String]
    val measure: String => Double = sql => { measuredSqls += sql; trueCost(sql) }
    // a known in-band query (3 relations, 1 condition under trueCost:
    // 2*3+1-0.4 = 2^6.6 ≈ 97... use the pool bounds below) plus some
    // known out-of-band labels that must never enter the pool
    val seedSql = "SELECT MIN(ta.x) FROM ta, tb, tc " +
      "WHERE ta.id = tb.id AND tb.id = tc.id AND ta.x > 3 AND tc.z < 90"
    val known = Map(
      seedSql -> 40.0,
      "SELECT MIN(ta.x) FROM ta WHERE ta.id > 1" -> 0.4)
    val h = new TailCampaign.Hunter(db, trueCost, measure,
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 19L,
      known = known)
    assert(h.seedCandidates == IndexedSeq(seedSql),
      "only the in-band known label may seed episodes")
    assert(h.pickSeed.contains(seedSql))
    (0 until 10).foreach(_ => h.runOne(maxSteps = 15, seedSql = h.pickSeed))
    // the seed itself was never re-executed or re-recorded
    assert(!measuredSqls.contains(seedSql))
    assert(!h.measured.contains(seedSql))
    // farming minted at least one NEW in-band measurement
    assert(h.measured.values.exists(rt => rt >= 8.0 && rt <= 64.0),
      s"no in-band neighbor minted: ${h.measured.values.toSeq.sorted}")
    // the hunter's own finds join the pool
    assert(h.seedCandidates.size > 1)
  }

  test("screen band must contain the target band") {
    intercept[IllegalArgumentException] {
      new TailCampaign.Hunter(db, trueCost, trueCost,
        lo = 8.0, hi = 64.0, screenLo = 16.0, screenHi = 80.0, seed = 1L)
    }
    intercept[IllegalArgumentException] {
      new TailCampaign.Hunter(db, trueCost, trueCost,
        lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 32.0, seed = 1L)
    }
  }

  test("episode measurement budget caps a surrogate-overestimated family") {
    // surrogate says everything is in the screen band; reality says
    // everything is below the target band — the episode can never hit,
    // so without the cap it would pay maxSteps measurements
    var calls = 0
    val h = new TailCampaign.Hunter(db,
      surrogateSec = _ => 20.0,          // always screen-approved
      measure = sql => { calls += 1; 2.0 }, // always below the band
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 23L)
    h.episodeCap = 5
    h.runOne(maxSteps = 60)
    assert(calls <= 5, s"episode budget must bound paid measurements, got $calls")
    val after = calls
    h.runOne(maxSteps = 60)
    assert(calls - after <= 5, "the budget must reset per episode")
    assert(calls - after >= 1, "a fresh episode must get a fresh budget")
  }

  test("failed or timed-out measurement records nothing and steers down") {
    val h = new TailCampaign.Hunter(db,
      surrogateSec = sql => trueCost(sql),
      measure = _ => throw new RuntimeException("timeout"),
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 3L)
    (0 until 10).foreach(_ => h.runOne(maxSteps = 15))
    assert(h.measured.isEmpty, "a failed measurement must never be recorded")
    assert(h.measureCalls > 0, "the screen band was never entered")
  }

  test("dual-family screen: the classifier can nominate what the v20 underestimates") {
    // the DRIFT.md failure mode: the regressor predicts true 30–45 s
    // candidates at ~0.5 s — below screenLo, so alone it rejects the
    // whole tail unmeasured. The classifier family errs independently
    // (here: accurately), and a max-of-families screen lets it nominate.
    val v20Blind: String => Double = _ => 0.5
    val cls: String => Double = trueCost
    def hunt(surrogate: String => Double) = {
      val h = new TailCampaign.Hunter(db, surrogate, trueCost,
        lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 7L)
      (0 until 20).foreach(_ => h.runOne(maxSteps = 25))
      h
    }
    assert(hunt(v20Blind).measureCalls == 0,
      "the blind regressor alone must reject everything unmeasured")
    val dual = hunt(sql => math.max(v20Blind(sql), cls(sql)))
    assert(dual.measureCalls > 0,
      "the max screen must let the second family nominate")
    assert(dual.measured.values.exists(rt => rt >= 8.0 && rt <= 64.0),
      "a v20-underestimated, classifier-caught candidate must get measured")
  }

  test("a dead measurement session trips consecutiveFailedEpisodes") {
    var dead = true
    val h = new TailCampaign.Hunter(db,
      surrogateSec = _ => 20.0, // everything nominated
      measure = sql => if (dead) throw new RuntimeException("session dead")
                       else trueCost(sql),
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 13L)
    (0 until 8).foreach(_ => h.runOne(maxSteps = 10))
    assert(h.consecutiveFailedEpisodes >= 5,
      s"an all-failure run must accumulate, got ${h.consecutiveFailedEpisodes}")
    assert(h.measured.isEmpty)
    // one real success resets the abort counter
    dead = false
    (0 until 3).foreach(_ => h.runOne(maxSteps = 10))
    assert(h.consecutiveFailedEpisodes == 0,
      "a successful measurement must reset the counter")
    assert(h.measured.nonEmpty)
  }

  test("negative cache: a genuinely timed-out SQL is never re-paid across episodes") {
    // every episode starts from the same seed query, whose canonical
    // form is therefore the first SQL measured each time; it times out
    // once and the cache must answer for it in later episodes
    val seedSql = "SELECT MIN(employees.salary) FROM employees " +
      "WHERE employees.id > 10"
    var timedOut: Option[String] = None
    var callsForSeed = 0
    val measure: String => Double = sql => {
      if (timedOut.isEmpty) timedOut = Some(sql)
      if (timedOut.contains(sql)) {
        callsForSeed += 1
        throw new QueryTimeoutException("timeout after 300s")
      } else trueCost(sql)
    }
    val h = new TailCampaign.Hunter(db, _ => 20.0, measure,
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 5L)
    h.runOne(maxSteps = 1, seedSql = Some(seedSql))
    h.runOne(maxSteps = 1, seedSql = Some(seedSql))
    h.runOne(maxSteps = 1, seedSql = Some(seedSql))
    assert(callsForSeed == 1,
      s"the timed-out seed must be paid exactly once, got $callsForSeed")
    assert(h.failed.contains(timedOut.get),
      "the failure must enter the cross-episode negative cache")
  }

  test("negative cache: transient failures are NOT cached and may be retried") {
    // the same always-first seed SQL fails once with a NON-timeout error
    // (lost session); a later episode must be allowed to re-pay it — a
    // permanent ban for an environment blip would shrink the huntable
    // space forever. A degenerate rt <= 0 is transient-class too.
    val seedSql = "SELECT MIN(employees.salary) FROM employees " +
      "WHERE employees.id > 10"
    var first: Option[String] = None
    var callsForSeed = 0
    val measure: String => Double = sql => {
      if (first.isEmpty) first = Some(sql)
      if (first.contains(sql)) {
        callsForSeed += 1
        if (callsForSeed == 1) throw new RuntimeException("session lost")
        else if (callsForSeed == 2) 0.0 // degenerate: also not a ban
        else trueCost(sql)
      } else trueCost(sql)
    }
    val h = new TailCampaign.Hunter(db, _ => 20.0, measure,
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 5L)
    h.runOne(maxSteps = 1, seedSql = Some(seedSql))
    assert(h.failed.isEmpty, "a transient failure must not enter the negative cache")
    assert(h.transientFailures == 1)
    assert(!h.measured.contains(first.get),
      "rt from a failed call must never be recorded")
    h.runOne(maxSteps = 1, seedSql = Some(seedSql))
    assert(callsForSeed == 2, "a transient failure must be retryable next episode")
    assert(h.failed.isEmpty && h.transientFailures == 2)
    assert(!h.measured.contains(first.get),
      "a degenerate rt <= 0 must never be recorded either")
    h.runOne(maxSteps = 1, seedSql = Some(seedSql))
    assert(callsForSeed == 3 && h.measured.contains(first.get),
      "the third attempt succeeds and is recorded")
  }

  test("ε pass-through keeps an always-underestimating screen measurable") {
    // the SCREEN_AUDIT blind spot: BOTH families predict sub-second for
    // true-tail queries, so the screen alone rejects 100% of them
    // unmeasured and no future label can reveal it. The ε pass-through
    // measures a deterministic fraction of screened-OUT candidates and
    // reports (estimate, truth) pairs for the loss estimate.
    val blind: String => Double = _ => 0.5 // always below screenLo = 4
    val epsPairs = scala.collection.mutable.Buffer.empty[(String, Double, Double)]
    def hunt(eps: Double) = {
      val h = new TailCampaign.Hunter(db, blind, trueCost,
        lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 7L,
        epsilon = eps,
        onEpsilon = (sql, est, rt) => epsPairs += ((sql, est, rt)))
      (0 until 15).foreach(_ => h.runOne(maxSteps = 25))
      h
    }
    val off = hunt(0.0)
    assert(off.measureCalls == 0 && epsPairs.isEmpty,
      "with ε = 0 a blind screen measures nothing (the r11 status quo)")
    val on = hunt(1.0)
    assert(on.epsMeasured > 0 && on.measureCalls == on.epsMeasured,
      "every measurement here must be an ε sample — the screen never approves")
    assert(epsPairs.nonEmpty)
    epsPairs.foreach { case (sql, est, rt) =>
      assert(est == 0.5, "the pair must carry the screen's (wrong) estimate")
      assert(rt == trueCost(sql), "the pair must carry the measured truth")
      assert(on.measured.get(sql).contains(rt),
        "an ε-paid label is a real label — it joins the population")
    }
    // at most one ε measurement per episode bounds the added wall-clock
    assert(on.epsMeasured <= 15)
    // the ε coin is a property of the SQL: the same stream re-run makes
    // the same choices (kill+resume determinism)
    val pairsFirst = epsPairs.toList.drop(off.measureCalls.toInt)
    epsPairs.clear()
    val again = hunt(1.0)
    assert(epsPairs.toList == pairsFirst && again.epsMeasured == on.epsMeasured)
  }

  test("ε pass-through reports a censored timeout as rt = -1 and shares the cap") {
    val blind: String => Double = _ => 0.5
    val epsRts = scala.collection.mutable.Buffer.empty[Double]
    val h = new TailCampaign.Hunter(db, blind,
      measure = _ => throw new QueryTimeoutException("timeout"),
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 31L,
      epsilon = 1.0, onEpsilon = (_, _, rt) => epsRts += rt)
    h.runOne(maxSteps = 25)
    assert(epsRts.nonEmpty && epsRts.forall(_ == -1.0),
      "a timed-out ε sample is evidence, censored at the timeout")
    assert(h.measured.isEmpty && h.failed.nonEmpty)
  }

  test("ε samples route through the capped measure; in-band hits use the full budget") {
    // the surrogate approves some candidates (in-band estimate = truth)
    // and screens the rest out below the floor — the two measurement
    // paths must stay separable: full-budget for approved candidates,
    // capped for ε pass-through draws
    val surrogate: String => Double = sql => {
      val t = trueCost(sql)
      if (t >= 8.0 && t <= 64.0) t else 0.5
    }
    val fullCalls = scala.collection.mutable.Buffer.empty[String]
    val capCalls = scala.collection.mutable.Buffer.empty[String]
    val h = new TailCampaign.Hunter(db, surrogate,
      measure = sql => { fullCalls += sql; trueCost(sql) },
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 11L,
      epsilon = 1.0,
      epsMeasure = Some(sql => { capCalls += sql; trueCost(sql) }))
    (0 until 20).foreach(_ => h.runOne(maxSteps = 25))
    assert(capCalls.nonEmpty, "no ε draw ever used the capped executor")
    assert(capCalls.forall(sql => surrogate(sql) < 4.0 || surrogate(sql) > 80.0),
      "a capped ε call must be a screened-OUT candidate")
    assert(fullCalls.forall(sql => surrogate(sql) >= 4.0 && surrogate(sql) <= 80.0),
      "a full-budget call must be a surrogate-approved candidate")
    // a completed ε label is a real label regardless of which executor paid
    capCalls.foreach(sql => assert(h.measured.get(sql).contains(trueCost(sql))))
  }

  test("a CAP-censored ε draw is not banned forever, and is not re-paid this run") {
    // a timeout at the capped ε budget proves rt > cap, NOT that the
    // query would time out at the stream's full budget — it must stay
    // out of the permanent negative cache (a surrogate refresh could
    // later approve it in-band), but the deterministic per-SQL ε coin
    // must not re-pay the same censored candidate every episode
    val blind: String => Double = _ => 0.5
    val capSqls = scala.collection.mutable.Buffer.empty[String]
    val epsRts = scala.collection.mutable.Buffer.empty[Double]
    val h = new TailCampaign.Hunter(db, blind,
      measure = _ => fail("full-budget executor must not fire: screen rejects all"),
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 31L,
      epsilon = 1.0, onEpsilon = (_, _, rt) => epsRts += rt,
      epsMeasure = Some(sql => { capSqls += sql; throw new QueryTimeoutException("cap") }))
    h.runOne(maxSteps = 25)
    assert(capSqls.nonEmpty && epsRts.forall(_ == -1.0))
    assert(h.failed.isEmpty,
      "a cap-censored ε draw must not enter the permanent negative cache")
    // replay the SAME episode seed: the generator revisits the same
    // SQLs; a censored one must never be re-paid
    h.iterations = 0
    h.runOne(maxSteps = 25)
    assert(capSqls.distinct.size == capSqls.size,
      s"a cap-censored candidate was re-paid on revisit: $capSqls")
  }

  test("seed drift is cached per SQL and recomputed only after invalidation") {
    val good = "SELECT MIN(ta.x) FROM ta WHERE ta.x > 5"
    val blind = "SELECT MIN(tb.y) FROM tb WHERE tb.y > 5"
    val known = Map(good -> 40.0, blind -> 30.0)
    var surrogateCalls = 0
    val surrogate: String => Double = sql => {
      if (known.contains(sql)) surrogateCalls += 1
      if (sql == blind) 0.5 else 40.0
    }
    val h = new TailCampaign.Hunter(db, surrogate, trueCost,
      lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 29L,
      known = known, driftWeightedSeeds = true)
    (0 until 100).foreach { i => h.iterations = i; h.pickSeed }
    assert(surrogateCalls == 2,
      s"drift must be one forward pass per pool member, not per pick; got $surrogateCalls")
    // a surrogate hot-reload invalidates: the next pick re-scores the pool
    h.invalidateDriftCache()
    h.pickSeed
    assert(surrogateCalls == 4,
      s"invalidation must trigger exactly one re-score per member, got $surrogateCalls")
  }

  test("drift-weighted seed selection prefers the surrogate's blind spots") {
    // two known in-band labels: the surrogate is exact on `good` and
    // off by ~log2(60) on `blind`
    val good = "SELECT MIN(ta.x) FROM ta WHERE ta.x > 5"
    val blind = "SELECT MIN(tb.y) FROM tb WHERE tb.y > 5"
    val surrogate: String => Double =
      sql => if (sql == blind) 0.5 else if (sql == good) 40.0 else trueCost(sql)
    val known = Map(good -> 40.0, blind -> 30.0)
    def picks(weighted: Boolean): Seq[String] = {
      val h = new TailCampaign.Hunter(db, surrogate, trueCost,
        lo = 8.0, hi = 64.0, screenLo = 4.0, screenHi = 80.0, seed = 29L,
        known = known, driftWeightedSeeds = weighted)
      (0 until 200).map { i => h.iterations = i; h.pickSeed.get }
    }
    val weighted = picks(weighted = true)
    val blindShare = weighted.count(_ == blind) / 200.0
    // weights ≈ 6.0 vs 0.1 → expected blind share ≈ 0.98
    assert(blindShare > 0.9,
      f"drift weighting must steer episodes to the blind spot, got $blindShare%.2f")
    assert(weighted.contains(good),
      "the +0.1 floor must keep well-predicted seeds reachable")
    val uniformBlind = picks(weighted = false).count(_ == blind) / 200.0
    assert(uniformBlind > 0.3 && uniformBlind < 0.7,
      f"uniform picks should split the 2-seed pool evenly, got $uniformBlind%.2f")
  }

  test("ε cap wiring: a cap exists only when it is strictly below the stream timeout") {
    // 32-256 s band: formula lands ON the stream timeout — no real cap,
    // so censored ε draws must keep the permanent negative-cache route
    assert(TailCampaign.epsCap(300, 280.0).isEmpty)
    // deep bands: a real cap, billed at ~1.2× the screen ceiling
    assert(TailCampaign.epsCap(620, 280.0).contains(336))
    assert(TailCampaign.epsCap(800, 362.0).contains(435))
    assert(TailCampaign.epsCap(1500, 724.0).contains(869))
    // a cap is never RAISED above the stream timeout (protocol
    // comparability): formula above the budget ⇒ no cap, same route
    assert(TailCampaign.epsCap(300, 362.0).isEmpty)
  }
}
