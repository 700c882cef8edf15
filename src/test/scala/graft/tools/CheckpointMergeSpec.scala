package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.BalancedCheckpoint

/** Merge semantics for multi-stream band campaigns: first measurement
  * wins on SQL collision (labels never flip when re-merging after the
  * primary stream grows), counts are recomputed from the merged
  * population, and a merged header cannot be mistaken for a resumable
  * generator state.
  */
class CheckpointMergeSpec extends AnyFunSuite {

  private def cp(seed: Long, rs: (String, Double)*): BalancedCheckpoint =
    BalancedCheckpoint(seed, iterations = rs.size, produced = rs.size,
      counts = Seq.fill(9)(0L), results = rs, lastSql = None)

  test("dedup by SQL keeps the first stream's measurement") {
    val a = cp(42L, ("SELECT 1", 0.5), ("SELECT 2", 3.0))
    val b = cp(1042L, ("SELECT 2", 7.0), ("SELECT 3", 1.5))
    val m = CheckpointMerge.merge(Seq(a, b))
    assert(m.results == Seq(("SELECT 1", 0.5), ("SELECT 2", 3.0), ("SELECT 3", 1.5)))
  }

  test("counts recomputed over merged population in Log2Partitioner space") {
    val a = cp(42L, ("q1", 0.5), ("q2", 3.0))   // buckets 0 and 1
    val b = cp(7L, ("q3", 5.0), ("q4", 300.0))  // buckets 2 and 8 (clamped)
    val m = CheckpointMerge.merge(Seq(a, b))
    assert(m.counts(0) == 1 && m.counts(1) == 1 && m.counts(2) == 1)
    assert(m.counts(8) == 1, "over-max runtime must clamp into the last bucket")
    assert(m.counts.sum == 4)
  }

  test("merged header is marked non-resumable and round-trips serialize") {
    val m = CheckpointMerge.merge(Seq(cp(42L, ("q1", 0.5)), cp(9L, ("q2", 2.0))))
    assert(m.iterations == -1, "merged checkpoint must not look resumable")
    val rt = BalancedCheckpoint.deserialize(m.serialize)
    assert(rt.results == m.results && rt.counts == m.counts)
  }

  test("merge refuses mixed compute budgets and propagates a matching one") {
    val a = cp(42L, ("q1", 0.5)).copy(budget = Some("x160_c2"))
    val b = cp(7L, ("q2", 2.0)).copy(budget = Some("x160_c32"))
    // mixing a 2-core and a 32-core population would silently blend
    // incomparable runtime labels — must refuse
    intercept[IllegalArgumentException] { CheckpointMerge.merge(Seq(a, b)) }
    // matching budgets merge and the budget rides into the output header
    val c = cp(9L, ("q3", 1.0)).copy(budget = Some("x160_c2"))
    val m = CheckpointMerge.merge(Seq(a, c))
    assert(m.budget.contains("x160_c2"))
    assert(BalancedCheckpoint.deserialize(m.serialize).budget.contains("x160_c2"))
    // a legacy (pre-budget-header) input merges with a warning, not a
    // failure — there is nothing to check it against
    val legacy = cp(11L, ("q4", 4.0))
    assert(CheckpointMerge.merge(Seq(a, legacy)).budget.contains("x160_c2"))
  }
}
