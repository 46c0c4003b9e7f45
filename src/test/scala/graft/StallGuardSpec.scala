package graft

/** Referees for the bench's in-rep stall abort (VERDICT-r15 item 1b):
  * the watchdog must actually interrupt an in-flight Spark job at the
  * cap (r15's q109 spent 494 s on a rep the cap had condemned), must
  * not touch fast reps, and must keep genuine failures loud.
  */
class StallGuardSpec extends SparkSpec {

  test("a stalled job is cancelled at the cap, not run to completion") {
    // ~2.3e18-row filtered range count: effectively unbounded on this
    // box, and the codegen'd Range loop checks task interruption per
    // batch — the kill must actually land (a cartesian product's
    // nested loop would leave zombie tasks squatting on the test
    // session's 4 threads)
    val t0 = System.nanoTime()
    val (secs, stalled) = StallGuard.timedRun(spark, "slow", 2.0) {
      import org.apache.spark.sql.functions.col
      spark.range(Long.MaxValue >> 2)
        .filter(col("id") % 7 =!= 3).count(): Unit
    }
    val wall = (System.nanoTime() - t0) / 1e9
    assert(stalled, "watchdog did not fire")
    assert(secs >= 2.0, f"returned before the cap: $secs%.2f s")
    // generous bound: cancellation + task teardown, not job runtime
    assert(wall < 30.0, f"cancellation did not interrupt: $wall%.2f s")
  }

  test("a fast rep passes untouched under a generous cap") {
    val (secs, stalled) = StallGuard.timedRun(spark, "fast", 60.0) {
      spark.range(1000L).count(): Unit
    }
    assert(!stalled)
    assert(secs < 60.0)
  }

  test("a genuine failure propagates — the guard must not convert " +
      "crashes into stalls") {
    val e = intercept[RuntimeException] {
      StallGuard.timedRun(spark, "boom", 60.0) {
        throw new RuntimeException("genuine failure")
      }
    }
    assert(e.getMessage == "genuine failure")
  }

  test("the session is reusable after a cancellation (job group " +
      "cleared, no poisoned state)") {
    StallGuard.timedRun(spark, "slow2", 1.0) {
      import org.apache.spark.sql.functions.col
      spark.range(Long.MaxValue >> 2)
        .filter(col("id") % 7 =!= 3).count(): Unit
    }
    assert(spark.range(100L).count() == 100L)
  }
}
