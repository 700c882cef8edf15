package graft.lab

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicReference

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** The shutdown-hook strike protocol of the deep-tail retry worker
  * (round-15 advice): the provisional poison strike persisted before
  * dispatch is settled by EXACTLY ONE of {shutdown hook, main loop},
  * and the settlement direction depends on the kill source — a routine
  * drain withdraws it, a disk-guard kill of this worker's own spill
  * keeps it (disk_guard.sh touches `<spillRoot>.guardkill` before its
  * SIGTERM). These tests drive [[FailedRetry.settleShutdown]] — the
  * extracted hook body — directly, instead of SIGTERMing a JVM.
  */
class FailedRetrySpec extends AnyFunSuite {

  private def tmpMarker() = {
    val d = Files.createTempDirectory("retry_spec")
    d.resolve("spill.guardkill")
  }

  test("idle shutdown settles nothing") {
    val withdrawn = mutable.Buffer.empty[String]
    val out = FailedRetry.settleShutdown(
      new AtomicReference[String](null), tmpMarker(), withdrawn += _)
    assert(out == FailedRetry.Settled.Idle)
    assert(withdrawn.isEmpty)
  }

  test("routine drain (no marker) withdraws the in-flight strike exactly once") {
    val withdrawn = mutable.Buffer.empty[String]
    val inFlight = new AtomicReference[String]("SELECT 1")
    val marker = tmpMarker()
    val out = FailedRetry.settleShutdown(inFlight, marker, withdrawn += _)
    assert(out == FailedRetry.Settled.Withdrawn)
    assert(withdrawn == Seq("SELECT 1"))
    // re-entry (a second signal delivering the hook again, or the main
    // loop claiming after the hook) finds the reference already claimed
    val again = FailedRetry.settleShutdown(inFlight, marker, withdrawn += _)
    assert(again == FailedRetry.Settled.Idle)
    assert(withdrawn == Seq("SELECT 1"))
  }

  test("disk-guard kill (marker present) keeps the strike and consumes the marker") {
    val withdrawn = mutable.Buffer.empty[String]
    val inFlight = new AtomicReference[String]("SELECT spill")
    val marker = tmpMarker()
    Files.createFile(marker)
    val out = FailedRetry.settleShutdown(inFlight, marker, withdrawn += _)
    assert(out == FailedRetry.Settled.Kept)
    assert(withdrawn.isEmpty, "a guard kill must leave the strike on disk")
    assert(!Files.exists(marker), "the marker is single-use")
  }

  test("main-loop claim beats a later hook: exactly one side settles") {
    // models the normal outcome path: executor.time returned, the main
    // loop claimed via getAndSet, THEN a drain signal lands
    val withdrawn = mutable.Buffer.empty[String]
    val inFlight = new AtomicReference[String]("SELECT 2")
    val claimed = inFlight.getAndSet(null) != null // main loop's claim
    assert(claimed)
    val out = FailedRetry.settleShutdown(inFlight, tmpMarker(), withdrawn += _)
    assert(out == FailedRetry.Settled.Idle)
    assert(withdrawn.isEmpty, "the hook must not settle a claimed outcome")
  }

  test("concurrent hook vs main claim settles exactly once") {
    // the round-15 race: SIGTERM lands while the main thread is between
    // executor.time returning and its claim — whichever side wins the
    // getAndSet settles; the other must see null
    (1 to 50).foreach { i =>
      val inFlight = new AtomicReference[String](s"SELECT $i")
      val settles = new java.util.concurrent.atomic.AtomicInteger(0)
      val marker = tmpMarker()
      val hook = new Thread(() =>
        FailedRetry.settleShutdown(inFlight, marker, _ => settles.incrementAndGet()))
      val main = new Thread(() =>
        if (inFlight.getAndSet(null) != null) settles.incrementAndGet())
      hook.start(); main.start(); hook.join(); main.join()
      assert(settles.get() == 1, s"iteration $i settled ${settles.get()} times")
    }
  }

  test("poison ledger serialization round-trips and drops multi-line SQL") {
    val poison = mutable.LinkedHashMap(
      "SELECT a FROM t" -> 1,
      "bad\nsql" -> 2, // un-round-trippable in a line format: excluded
      "SELECT b FROM u WHERE x\t= 1" -> 2)
    val text = FailedRetry.poisonLines(poison)
    // well-formed: every line parses as <count>\t<sql>, the exact shape
    // main's startup loader expects (split("\t", 2))
    val parsed = text.split("\n").filter(_.nonEmpty).map { l =>
      val Array(n, sql) = l.split("\t", 2)
      sql -> n.toInt
    }.toSeq
    assert(parsed == Seq("SELECT a FROM t" -> 1,
      "SELECT b FROM u WHERE x\t= 1" -> 2))
  }

  test("ledger file written under the hook's lock parses after a simulated drain") {
    // end-to-end shape of the sidecar bytes: strike, persist, hook
    // withdraws, persist — the final file must parse and show the
    // withdrawal happened exactly once (count back to 1, not 0 or -1)
    val dir = Files.createTempDirectory("retry_spec")
    val path = dir.resolve("retry.cp.poison")
    val poison = mutable.LinkedHashMap("q_monster" -> 1) // one genuine earlier strike
    def save(): Unit = poison.synchronized {
      Campaign.saveCheckpoint(path, FailedRetry.poisonLines(poison))
    }
    def withdraw(sql: String): Unit = poison.synchronized {
      if (poison.getOrElse(sql, 0) <= 1) poison.remove(sql)
      else poison.put(sql, poison(sql) - 1)
      save()
    }
    // provisional strike for the in-flight attempt: 1 -> 2
    poison.synchronized { poison.put("q_monster", 2); save() }
    val inFlight = new AtomicReference[String]("q_monster")
    val out = FailedRetry.settleShutdown(inFlight, tmpMarker(), withdraw)
    assert(out == FailedRetry.Settled.Withdrawn)
    val onDisk = Files.readString(path).split("\n").filter(_.nonEmpty).map { l =>
      val Array(n, sql) = l.split("\t", 2); sql -> n.toInt
    }.toMap
    assert(onDisk == Map("q_monster" -> 1),
      "exactly the provisional strike withdrawn — the earlier genuine strike survives")
  }
}
