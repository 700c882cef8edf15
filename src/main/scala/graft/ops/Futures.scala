package graft.ops

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

/** Bounded waiting for concurrent backfill jobs (guide §2.6 overlap):
  * the concurrency is an OPTIMIZATION, so a wedged job must degrade to
  * sequential recomputation — never convert the whole query into an
  * unbounded hang (`Await.result(_, Duration.Inf)` did exactly that).
  */
object Futures {
  /** The future's value if it completes within `timeout`, else the
    * sequential `fallback` computed on the caller's thread. Both paths
    * are deterministic for our callers (synopsis passes over the same
    * cached partitions), so the choice cannot move a bit of output.
    * Non-timeout failures propagate — a genuinely failing job must
    * fail the query, not be papered over.
    */
  def awaitOr[T](f: Future[T], timeout: Duration)(fallback: => T): T =
    try Await.result(f, timeout)
    catch { case _: java.util.concurrent.TimeoutException => fallback }
}
