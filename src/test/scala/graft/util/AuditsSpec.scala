package graft.util

import scala.concurrent.TimeoutException
import scala.concurrent.duration.DurationInt

import graft.SparkSpec

class AuditsSpec extends SparkSpec {

  test("results come back in leg order") {
    val got = Audits.concurrently(spark, "spec-order",
      (1 to 4).map(i => () => { Thread.sleep((5 - i) * 50L); i }))
    assert(got == Seq(1, 2, 3, 4))
  }

  test("a failed leg surfaces promptly, not after the slowest sibling") {
    val t0 = System.nanoTime()
    val ex = intercept[IllegalStateException] {
      Audits.concurrently[String](spark, "spec-fail", Seq(
        // the slow sibling is FIRST — a non-fail-fast sequence would
        // block on it for its full sleep before surfacing the failure
        () => { Thread.sleep(8000); "slow" },
        () => { Thread.sleep(100); throw new IllegalStateException("boom") }))
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(ex.getMessage == "boom")
    assert(elapsedSec < 4.0,
      f"failure took $elapsedSec%.1fs to surface — fail-fast regressed")
  }

  test("a wedged leg surfaces as a timeout instead of hanging the gate") {
    intercept[TimeoutException] {
      Audits.concurrently[Int](spark, "spec-wedge",
        Seq(() => { Thread.sleep(60000); 1 }), timeout = 2.seconds)
    }
  }
}
