package graft.util

import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicLong

import scala.concurrent.duration.{Duration, DurationInt}
import scala.concurrent.{Await, ExecutionContext, Future, Promise}

import org.apache.spark.sql.SparkSession

/** Shared runner for the concurrent audit-leg pattern (e08/e12/d26):
  * independent read-only DAGs submitted together so the audit's wall
  * time is its widest leg, with two failure behaviors the inline form
  * lacked:
  *
  *  - a FAILED leg cancels its siblings: every leg's Spark jobs run
  *    under one job group (`setJobGroup` is thread-local, so each leg
  *    thread tags its own jobs), and the first failure calls
  *    `cancelJobGroup` + `shutdownNow` — sibling jobs stop promptly
  *    instead of burning cluster time after the gate has already
  *    failed;
  *  - a WEDGED leg surfaces: `Await` uses a generous FINITE timeout
  *    (the pool's threads are non-daemon, so an infinite await on a
  *    stuck job would hang the gate silently forever), and the
  *    timeout path cancels the group like any other failure.
  *
  * Legs must be independent (no temp views, no session-conf writes,
  * leg-local trained artifacts — the existing audit contract); results
  * come back in leg order, so callers' output is byte-identical to the
  * serial form.
  */
object Audits {
  private val seq = new AtomicLong(0L)

  def concurrently[A](spark: SparkSession, name: String, legs: Seq[() => A],
                      timeout: Duration = 30.minutes): Seq[A] = {
    if (legs.isEmpty) return Seq.empty
    val sc = spark.sparkContext
    // unique group id per call: cancellation must never reach jobs of
    // an unrelated concurrent audit in the same session
    val group = s"graft-audit-$name-${seq.incrementAndGet()}"
    val pool = Executors.newFixedThreadPool(legs.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = legs.map { leg =>
        Future {
          sc.setJobGroup(group, s"audit leg of $name", interruptOnCancel = true)
          try leg() finally sc.clearJobGroup()
        }
      }
      // fail-FAST: Future.sequence alone is not (it chains left to
      // right, so a failure in leg N surfaces only after legs 1..N-1
      // complete — siblings would burn cluster time for the widest
      // leg's duration). The first failure completes this promise on
      // the failing leg's own thread (parasitic EC) and wakes the
      // await immediately, so cancellation fires the moment any leg
      // dies, not when the slowest one finishes.
      val firstFailure = Promise[Seq[A]]()
      fs.foreach(_.failed.foreach(firstFailure.tryFailure)(
        ExecutionContext.parasitic))
      Await.result(
        Future.firstCompletedOf(Seq(Future.sequence(fs), firstFailure.future))(
          ExecutionContext.parasitic),
        timeout)
    } catch {
      case t: Throwable =>
        sc.cancelJobGroup(group)
        pool.shutdownNow()
        throw t
    } finally pool.shutdown()
  }
}
