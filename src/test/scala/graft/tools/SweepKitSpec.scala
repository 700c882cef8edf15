package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The concurrency contract [[SweepKit.parSeeds]] gives the sweeps:
  * results come back in seed order (a vote over per-seed prediction
  * columns must line up with the seeds list no matter which thread
  * finished first), and a failing fit fails the whole sweep instead of
  * leaving a null ensemble member behind.
  */
class SweepKitSpec extends AnyFunSuite {

  test("parSeeds preserves seed order regardless of completion order") {
    val seeds = Seq(1L, 2L, 3L, 4L)
    val out = SweepKit.parSeeds(seeds) { s =>
      Thread.sleep((5 - s) * 20) // later seeds finish first
      s * 10
    }
    assert(out == Seq(10L, 20L, 30L, 40L))
  }

  test("parSeeds matches the sequential map byte-for-byte") {
    val seeds = Seq(42L, 7L, 1234L)
    def fit(s: Long): Seq[Double] = {
      val rnd = new scala.util.Random(s)
      Seq.fill(16)(rnd.nextDouble())
    }
    assert(SweepKit.parSeeds(seeds)(fit) == seeds.map(fit))
  }

  test("parSeeds rethrows a member failure after all threads settle") {
    val hit = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      SweepKit.parSeeds(Seq(1L, 2L, 3L)) { s =>
        hit.incrementAndGet()
        if (s == 2L) throw new IllegalStateException("fit died")
        s
      }
    }
    assert(e.getMessage == "fit died")
    assert(hit.get == 3) // the other members still ran to completion
  }
}
