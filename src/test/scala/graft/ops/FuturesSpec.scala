package graft.ops

import scala.concurrent.{Future, Promise}
import scala.concurrent.duration.DurationInt

import org.scalatest.funsuite.AnyFunSuite

class FuturesSpec extends AnyFunSuite {

  test("awaitOr returns the future's value when it completes in time") {
    assert(Futures.awaitOr(Future.successful(42), 1.second)(sys.error("no")) == 42)
  }

  test("awaitOr falls back to the sequential path when the future hangs") {
    val never = Promise[Int]().future // completes never — a wedged job
    assert(Futures.awaitOr(never, 100.millis)(7) == 7)
  }

  test("awaitOr propagates a real failure instead of papering over it") {
    val boom = Future.failed[Int](new IllegalStateException("job died"))
    intercept[IllegalStateException] {
      Futures.awaitOr(boom, 1.second)(0)
    }
    ()
  }
}
