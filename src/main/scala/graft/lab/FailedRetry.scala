package graft.lab

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Re-measure the fleet's timeout-censored candidates at a DEEP-TAIL
  * measurement budget.
  *
  * The run-twice-keep-2nd protocol ([[Executor.time]],
  * query_executor.py:79-103) runs BOTH executions inside one timeout,
  * so a stream with a 400 s ceiling can only complete labels whose
  * two-run total fits — statistically, single-run ≲ timeout/2. Every
  * SQL in a stream's `.failed` sidecar is therefore a query whose
  * single-run time is roughly ≥ half that stream's timeout: censored
  * evidence pointing exactly at reference class 8 (rounded log2 bucket
  * 8 = 181–362 s), the one bucket whose holdout support still zeroes
  * its F1. Instead of hunting fresh candidates through paid guided
  * walks, this tool replays the already-paid-for censored pool at a
  * timeout wide enough for two runs of a 362 s query (~800 s), ranked
  * by the served surrogate's estimate (descending — the deeper the
  * surrogate already thinks, the deeper the truth tends to be, DRIFT.md
  * saturation notwithstanding).
  *
  * Labels land in a [[graft.gen.BalancedCheckpoint]] stamped with the
  * same `x<factor>_c<cpus>` budget as the streams — same scaled DB,
  * same local[cpus] session, same protocol — so
  * [[graft.tools.CheckpointMerge]] folds them into the population
  * unchanged. Re-censored SQLs (still past the deep budget) go to this
  * tool's own `.failed` sidecar and are never re-paid, including across
  * resumes.
  *
  * Usage: `FailedRetry [baseSfDir] [factor] [workDir] [name] [timeoutSec]
  *                     [part] [nParts] [modelJson] [seedCp] [poolDir]`
  * `part`/`nParts` split the candidate pool across concurrent JVMs by a
  * stable per-SQL hash, so two retry workers never pay the same query.
  * `poolDir` (default `workDir`) is where the censored sidecars are
  * scanned from — the fleet runbook SNAPSHOTS the sidecars there at
  * launch, because live streams running at the same deep timeout would
  * otherwise append fresh 800 s-censored SQLs that a retry at 800 s is
  * guaranteed to re-censor (13 paid minutes to learn nothing). When the
  * pool is drained a `<checkpoint>.done` marker is written so the
  * babysitter stops relaunching; refill the pool and delete the marker
  * to re-arm.
  */
object FailedRetry {

  /** splitmix64 of the SQL's string hash — stable across JVMs. */
  private def sqlHash(sql: String): Long = {
    var z = sql.hashCode.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** What the shutdown hook decided about the provisional strike
    * (exposed for the spec).
    */
  private[lab] sealed trait Settled
  private[lab] object Settled {
    /** Nothing in flight, or the main loop already claimed the outcome. */
    case object Idle extends Settled
    /** Guard marker present: the disk guard killed THIS worker because
      * its own in-flight query spilled past the floor — strike stands. */
    case object Kept extends Settled
    /** Routine drain: not evidence against the query — strike withdrawn. */
    case object Withdrawn extends Settled
  }

  /** Shutdown-hook body, extracted so the spec can exercise it without
    * SIGTERMing a JVM. Claims the in-flight query atomically — the main
    * loop claims through the same reference once `executor.time`
    * returns, so exactly ONE side ever settles the provisional strike
    * (round-15 advice: hook and main thread both decrementing could
    * erase a genuine earlier strike, 2 -> 0). Kill-source
    * discrimination (round-15 advice, high): `disk_guard.sh` only ever
    * kills the OWNER of the largest spill — i.e. exactly the JVM whose
    * in-flight monster caused the pressure — and touches
    * `<spillRoot>.guardkill` before its SIGTERM. Marker present means
    * the strike must STAY (withdrawing would re-rank the same query to
    * the top on relaunch: an unbounded kill/relaunch loop re-paying the
    * same spill). No marker means a routine drain (fleet_drain.sh),
    * where withdrawal protects an innocent candidate from being
    * poisoned by two routine round-end drains. The marker is consumed
    * (deleted) so the decision cannot leak into a later shutdown.
    */
  private[lab] def settleShutdown(
      inFlight: java.util.concurrent.atomic.AtomicReference[String],
      guardMarker: Path,
      withdraw: String => Unit): Settled = {
    val sql = inFlight.getAndSet(null)
    if (sql == null) Settled.Idle
    else if (Try(Files.deleteIfExists(guardMarker)).getOrElse(false)) Settled.Kept
    else { withdraw(sql); Settled.Withdrawn }
  }

  /** Poison ledger serialization: `<strikes>\t<sql>` per line. One
    * format function shared by main and the spec, so the spec's
    * well-formedness assertion covers the bytes main actually writes.
    */
  private[lab] def poisonLines(poison: collection.Map[String, Int]): String =
    poison.collect { case (sql, n) if !sql.contains("\n") => s"$n\t$sql" }
      .mkString("\n")

  def main(args: Array[String]): Unit = {
    val baseSfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toDouble).getOrElse(160.0)
    val workDir = args.lift(2).getOrElse("/tmp/graft_band")
    val name = args.lift(3).getOrElse("a")
    val timeoutSec = args.lift(4).map(_.toInt).getOrElse(800)
    val part = args.lift(5).map(_.toInt).getOrElse(0)
    val nParts = args.lift(6).map(_.toInt).getOrElse(1)
    val modelJson = args.lift(7).getOrElse("/root/repo/data/band/models/gru4.json")
    val seedCpPath = args.lift(8)
      .getOrElse("/root/repo/data/band/campaign_x160_c2.cp")
    val poolDir = args.lift(9).getOrElse(workDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "2")
    val budget = s"x${factor.toInt}_c$cpus"

    // candidate pool: every stream's negative cache, plus ε sidecar
    // lines censored at their cap (rt = -1) — both are queries some
    // stream already paid a full timeout to learn only "too slow there"
    def streamFiles(suffix: String): Seq[Path] =
      Try(Files.list(Paths.get(poolDir)).iterator().asScala
        .filter(_.toString.endsWith(suffix)).toSeq).getOrElse(Nil)
    // Skip rules (round-14 advice): when scanning the LIVE workDir,
    // every retry_* sidecar is excluded — a worker must not re-ingest
    // its own (or a sibling's) re-censored list at the same timeout
    // that just censored it. When the pool is a SNAPSHOT dir
    // (poolDir != workDir) the runbook curates it deliberately — e.g.
    // retry_a's re-censored list legitimately feeds retry_b's deep
    // pool — so only this worker's OWN sidecar is excluded. Every skip
    // is printed, so a mis-snapshotted pool is visible instead of
    // silently smaller.
    val ownSidecar = s"retry_x${factor.toInt}_c${cpus}_$name.cp.failed"
    // canonicalize before comparing: both dirs arrive from a shell
    // launcher, so an equivalent spelling (trailing slash, relative
    // path, symlink) must not silently flip the skip rule from
    // live-scan to snapshot semantics (round-15 verdict #3)
    def canon(p: String): Path =
      Try(Paths.get(p).toRealPath())
        .getOrElse(Paths.get(p).toAbsolutePath.normalize)
    val poolIsLiveWorkDir = canon(poolDir) == canon(workDir)
    val fromFailed = streamFiles(".cp.failed")
      .filterNot { p =>
        val fn = p.getFileName.toString
        val skip = fn == ownSidecar ||
          (poolIsLiveWorkDir && fn.startsWith("retry_"))
        if (skip) println(s"[retry $name] pool scan: skipping $fn")
        skip
      }
      .flatMap(p => Files.readString(p).split("\n").filter(_.nonEmpty))
    val fromEps = streamFiles(".cp.eps").flatMap { p =>
      Files.readString(p).split("\n").filter(_.nonEmpty).toSeq.flatMap { l =>
        val f = l.split("\t")
        if (f.length >= 3 && Try(f(1).toDouble).toOption.contains(-1.0))
          Some(f.last)
        else None
      }
    }
    val known: Set[String] =
      if (!Files.exists(Paths.get(seedCpPath))) Set.empty
      else graft.gen.BalancedCheckpoint
        .deserialize(Files.readString(Paths.get(seedCpPath)))
        .results.iterator.map(_._1).toSet

    val cpPath = Paths.get(
      s"$workDir/retry_x${factor.toInt}_c${cpus}_$name.cp")
    val failedPath = Paths.get(cpPath.toString + ".failed")
    val measured = mutable.LinkedHashMap.empty[String, Double]
    if (Files.exists(cpPath)) {
      val cp = graft.gen.BalancedCheckpoint.deserialize(Files.readString(cpPath))
      require(cp.budget.forall(_ == budget),
        s"retry checkpoint budget ${cp.budget} does not match $budget")
      cp.results.foreach { case (sql, rt) => measured.put(sql, rt) }
    }
    val ownFailed = mutable.LinkedHashSet.empty[String]
    if (Files.exists(failedPath))
      ownFailed ++= Files.readString(failedPath).split("\n").filter(_.nonEmpty)
    // poison ledger: per-SQL TRANSIENT failure counts, persisted across
    // relaunches. A query that OOM-kills the driver looks "transient"
    // (SparkContext stopped), gets re-ranked to the top on resume, and
    // crash-loops the retry worker forever; two strikes and it is
    // skipped like a censored one (unlabelable at this heap budget).
    val poisonPath = Paths.get(cpPath.toString + ".poison")
    val poison = mutable.LinkedHashMap.empty[String, Int]
    if (Files.exists(poisonPath))
      Files.readString(poisonPath).split("\n").filter(_.nonEmpty).foreach { l =>
        val Array(n, sql) = l.split("\t", 2)
        poison.put(sql, n.toInt)
      }
    val maxStrikes = 2

    val pool = (fromFailed ++ fromEps).distinct
      .filterNot(known.contains)
      .filterNot(measured.contains)
      .filterNot(ownFailed.contains)
      .filterNot(sql => poison.getOrElse(sql, 0) >= maxStrikes)
      .filter(sql => math.floorMod(sqlHash(sql), nParts.toLong) == part.toLong)
    println(s"[retry $name] candidate pool: ${pool.size} " +
      s"(failed ${fromFailed.distinct.size}, eps-censored ${fromEps.distinct.size}, " +
      s"part $part/$nParts, already measured ${measured.size}, " +
      s"already re-censored ${ownFailed.size}, poisoned " +
      s"${poison.count(_._2 >= maxStrikes)})")

    val scaledDir = BandCampaign.ensureScaled(baseSfDir, factor, workDir)
    val spark = BandCampaign.session(cpus)
    BandCampaign.openScaled(spark, scaledDir)
    val statsStr = Files.readString(Paths.get(s"$scaledDir/stats.json"))
    val predictLog2 = graft.estimate.Scoring.maxPredictorFor(
      Seq(Files.readString(Paths.get(modelJson))), statsStr)
    // Rank order is a knob: descending (default) drains a pool whose
    // members are mostly completable at this timeout — pay the biggest
    // first while the surrogate is freshest. Ascending
    // (GRAFT_RETRY_RANK=asc) suits a DEEP pool retried at a much larger
    // timeout, where the largest estimates will censor again and burn
    // the full budget each — smallest-first mints the completable
    // labels before the monsters eat the round's wall-clock.
    val ascending = sys.env.get("GRAFT_RETRY_RANK").contains("asc")
    val ranked0 = pool
      .map(sql => (sql, Try(predictLog2(sql)).getOrElse(Double.NegativeInfinity)))
      .sortBy(-_._2)
    val ranked = if (!ascending) ranked0 else {
      // unencodable candidates (est = -inf) stay LAST either way
      val (unencodable, scored) = ranked0.reverse.partition(_._2.isNegInfinity)
      scored ++ unencodable
    }
    val executor = new Executor(spark, timeoutSec = timeoutSec)

    def save(): Unit = {
      val partn = new graft.gen.Log2Partitioner()
      val counts = Array.fill(partn.k)(0L)
      measured.valuesIterator.foreach(rt =>
        counts(math.min(partn.partition(rt), counts.length - 1)) += 1)
      Campaign.saveCheckpoint(cpPath, graft.gen.BalancedCheckpoint(
        seed = 900L + part, iterations = 0, produced = measured.size,
        counts = counts.toSeq, results = measured.toSeq, lastSql = None,
        budget = Some(budget)).serialize)
      if (ownFailed.nonEmpty)
        Campaign.saveCheckpoint(failedPath,
          ownFailed.filterNot(_.contains("\n")).mkString("\n"))
      savePoison()
    }

    // The poison ledger is persisted on its own, immediately, at every
    // strike transition — not just at the next iteration's save(). The
    // retry candidates are exactly the monster spillers, so the most
    // likely failure is one that leaves NO chance to run code (kernel
    // OOM SIGKILL, or the disk guard escalating SIGTERM -> SIGKILL on
    // the spill owner before the hook finishes); a strike that only
    // reaches disk on the next loop iteration is a strike lost to
    // every such kill, and the two-strike cap never engages (round-13
    // advice). For the SIGTERM-with-hooks case, the guard-marker logic
    // in [[settleShutdown]] decides whether that persisted strike
    // stays. All ledger mutation + persistence runs under `poison`'s
    // monitor: the shutdown hook is a second thread, and an
    // unsynchronized interleave could tear the sidecar write or lose a
    // count (round-15 advice).
    def savePoison(): Unit = poison.synchronized {
      Campaign.saveCheckpoint(poisonPath, poisonLines(poison))
    }
    def strikeProvisional(sql: String): Unit = poison.synchronized {
      poison.put(sql, poison.getOrElse(sql, 0) + 1)
      savePoison()
    }
    def withdrawProvisional(sql: String): Unit = poison.synchronized {
      if (poison.getOrElse(sql, 0) <= 1) poison.remove(sql)
      else poison.put(sql, poison(sql) - 1)
      savePoison()
    }

    // See [[settleShutdown]] for the kill-source contract: routine
    // drain (no marker) withdraws the provisional strike, a disk-guard
    // kill of THIS worker (marker present) keeps it, and SIGKILL /
    // kernel OOM cannot run hooks at all so the persisted strike
    // always survives those. The marker path mirrors disk_guard.sh:
    // the guard touches `<spark.local.dir>.guardkill` before SIGTERM.
    val guardMarker = Paths.get(sys.props.get("spark.local.dir")
      .getOrElse(s"/tmp/graft_spill/retry_$name") + ".guardkill")
    // stale marker (SIGTERM escalated to SIGKILL before the hook ran,
    // so nothing consumed it) must not make the NEXT routine drain
    // keep a strike it should withdraw
    Try(Files.deleteIfExists(guardMarker))
    val inFlight = new java.util.concurrent.atomic.AtomicReference[String](null)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      settleShutdown(inFlight, guardMarker, withdrawProvisional) match {
        case Settled.Kept => println(s"[retry $name] disk-guard kill " +
          "mid-query: own spill caused it, provisional strike kept")
        case Settled.Withdrawn => println(s"[retry $name] clean shutdown " +
          "mid-query: provisional strike withdrawn")
        case Settled.Idle => ()
      }))

    ranked.zipWithIndex.foreach { case ((sql, estLog2), i) =>
      save() // incremental: a kill loses at most the in-flight query
      val est = math.pow(2.0, estLog2)
      println(f"[retry $name] ${i + 1}/${ranked.size} est=$est%.1f s :: ${sql.take(100)}")
      // provisional strike, persisted BEFORE dispatch: if an external
      // kill lands mid-query, the strike is already on disk and counts;
      // a normal outcome (label or clean timeout) withdraws it below.
      strikeProvisional(sql)
      inFlight.set(sql)
      val outcome = Try(executor.time(sql))
      // claim the outcome atomically: if a SIGTERM landed between
      // time() returning and this line, the hook got there first,
      // already settled the strike, and the JVM is dying — settling
      // again here would double-decrement (round-15 advice)
      val claimed = inFlight.getAndSet(null) != null
      outcome match {
        case scala.util.Success(rt) if rt > 0 =>
          if (claimed) withdrawProvisional(sql)
          measured.put(sql, rt)
          println(f"[retry $name] RECORD rt=$rt%.1f s (${measured.size} total)")
        case scala.util.Failure(_: QueryTimeoutException) =>
          if (claimed) withdrawProvisional(sql)
          ownFailed += sql
          println(s"[retry $name] still censored at $timeoutSec s")
        case other =>
          // the provisional strike IS the transient strike — already
          // persisted above, nothing further to increment
          println(s"[retry $name] transient failure " +
            s"(strike ${poison.synchronized(poison.getOrElse(sql, 0))}/$maxStrikes), " +
            s"will retry on resume: $other")
          // a dead SparkContext (driver-side OOM kills it) makes every
          // later attempt fail instantly — the first retry JVM churned
          // through 28 ranked candidates that way. Exit non-zero so the
          // babysitter relaunches into a fresh session; the incremental
          // checkpoint + the persisted poison strikes make the resume
          // lossless AND crash-loop-proof.
          if (spark.sparkContext.isStopped) {
            save()
            Console.err.println(s"[retry $name] ABORT: SparkContext is " +
              "stopped — measurement session dead, exiting for relaunch")
            sys.exit(1)
          }
      }
    }
    save()
    // pool drained: tell the babysitter not to relaunch (delete the
    // marker after refilling the pool to re-arm)
    Files.writeString(Paths.get(cpPath.toString + ".done"),
      s"drained ${ranked.size} candidates; ${measured.size} labels, " +
        s"${ownFailed.size} re-censored\n")
    println(s"[retry $name] done: ${measured.size} labels, " +
      s"${ownFailed.size} re-censored")
    spark.stop()
  }
}
