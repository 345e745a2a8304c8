package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bench's quiet-window gate (`Bench.awaitQuiet`) — the
  * mechanism that keeps mid-run host drift from certifying phantom
  * regression flags (round 12: three flags survived an isolated retry that
  * ran inside a ~1.4x drift window the old 1.5x gate waved through). The
  * probe and sleep are injected, so these tests simulate bursts without a
  * SparkSession or wall-clock waits.
  */
class BenchQuietSpec extends AnyFunSuite {
  private val floor = 0.30

  /** A probe that reads `burst` for the first `len` calls, then `quiet`. */
  private def burstProbe(len: Int, burst: Double = 0.9, quiet: Double = 0.31): () => Double = {
    var calls = 0
    () => { calls += 1; if (calls <= len) burst else quiet }
  }

  test("immediately quiet probe consumes no waits") {
    val budget = Array(5)
    val (cal, quiet) =
      Bench.awaitQuiet(() => 0.31, floor, 1.15, budget, 0L, "t")
    assert(quiet && cal == 0.31 && budget(0) == 5)
  }

  test("wait outlasts a finite burst and certifies quiet") {
    val budget = Array(5)
    val (cal, quiet) =
      Bench.awaitQuiet(burstProbe(3), floor, 1.15, budget, 0L, "t")
    assert(quiet, "gate must wait out a 3-probe burst within a 5-wait budget")
    assert(cal == 0.31)
    assert(budget(0) == 2, "exactly 3 waits consumed")
  }

  test("sustained burst exhausts the budget and reports NOT quiet") {
    val budget = Array(4)
    val (cal, quiet) =
      Bench.awaitQuiet(burstProbe(100), floor, 1.15, budget, 0L, "t")
    assert(!quiet, "a burst longer than the budget must not certify quiet")
    assert(cal > 1.15 * floor && budget(0) == 0)
  }

  test("the 1.15x bar rejects the drift band the old 1.5x gate accepted") {
    // round 12's failure mode: probe steady at ~1.4x the floor — under the
    // old 1.5x retry gate, over the new 1.15x one
    val drift = 1.4 * floor
    val budget = Array(3)
    val (_, quiet) =
      Bench.awaitQuiet(() => drift, floor, 1.15, budget, 0L, "t")
    assert(!quiet && budget(0) == 0)
    val (_, oldGate) =
      Bench.awaitQuiet(() => drift, floor, 1.5, Array(3), 0L, "t")
    assert(oldGate, "sanity: the legacy threshold would have certified it")
  }

  test("wait budget is shared across sequential call sites") {
    // per-retried-query calls draw from ONE pool: a sustained burst must
    // exhaust the phase, not get a fresh allowance per query
    val budget = Array(5)
    val probe = burstProbe(100)
    val (_, q1) = Bench.awaitQuiet(probe, floor, 1.15, budget, 0L, "q1")
    assert(!q1 && budget(0) == 0)
    val (_, q2) = Bench.awaitQuiet(probe, floor, 1.15, budget, 0L, "q2")
    assert(!q2, "second site gets no new waits once the pool is drained")
    assert(budget(0) == 0)
  }

  test("reference-window ratio: median of reading/floor, failed samples " +
    "dropped, empty -> None") {
    // quiet window: references at ~1.0-1.2x certify
    assert(Bench.refWindowRatio(Seq((0.33, 0.30), (0.35, 0.31), (0.36, 0.33)))
      .exists(_ < 1.3))
    // degraded data path (the round-13 shape): uniform ~1.8x rejects
    assert(Bench.refWindowRatio(Seq((0.54, 0.30), (0.56, 0.31), (0.60, 0.33)))
      .exists(_ > 1.3))
    // one outlier does not flip the median verdict
    assert(Bench.refWindowRatio(Seq((0.33, 0.30), (2.0, 0.31), (0.36, 0.33)))
      .exists(_ < 1.3))
    // failed samples (-1) are dropped; all-failed -> None (no assessment)
    assert(Bench.refWindowRatio(Seq((-1.0, 0.30), (0.35, 0.31), (-1.0, 0.33)))
      .exists(r => r > 1.0 && r < 1.3))
    assert(Bench.refWindowRatio(Seq((-1.0, 0.30))).isEmpty)
    assert(Bench.refWindowRatio(Seq.empty).isEmpty)
  }

  test("a burst ending mid-phase leaves later queries a quiet window") {
    // first query's waits cover the burst tail; the second query's probe is
    // already quiet and costs nothing — the per-query re-probe is what lets
    // flags raised early in a burst clear once it passes
    val budget = Array(10)
    val probe = burstProbe(4)
    val (_, q1) = Bench.awaitQuiet(probe, floor, 1.15, budget, 0L, "q1")
    val (_, q2) = Bench.awaitQuiet(probe, floor, 1.15, budget, 0L, "q2")
    assert(q1 && q2 && budget(0) == 6)
  }

  // ---- cross-run flag escalation (Bench.escalateFlags) ----

  test("a first-time unconfirmed flag stays unconfirmed and opens a streak") {
    val (esc, unconf, next) =
      Bench.escalateFlags(Map.empty, Seq.empty, Seq("q_a"))
    assert(esc.isEmpty && unconf == Seq("q_a") && next == Map("q_a" -> 1))
  }

  test("the second consecutive unconfirmed flag escalates to certified — " +
    "the channel cannot be ridden indefinitely") {
    val (esc, unconf, next) =
      Bench.escalateFlags(Map("q_a" -> 1), Seq.empty, Seq("q_a"))
    assert(esc == Seq("q_a") && unconf.isEmpty && next == Map("q_a" -> 2))
  }

  test("a cleared query resets its streak by omission; an unrelated flag " +
    "does not inherit another's history") {
    // q_a flagged last run but cleared this run; q_b flags for the first time
    val (esc, unconf, next) =
      Bench.escalateFlags(Map("q_a" -> 2), Seq.empty, Seq("q_b"))
    assert(esc.isEmpty && unconf == Seq("q_b") && next == Map("q_b" -> 1))
    // the reset is real: q_a flagging again later is a FIRST offense
    val (esc2, _, _) = Bench.escalateFlags(next, Seq.empty, Seq("q_a"))
    assert(esc2.isEmpty)
  }

  test("a confirmed regression also extends the streak, so a later noisy " +
    "window cannot demote a repeat offender to unconfirmed") {
    val (_, _, afterConfirmed) =
      Bench.escalateFlags(Map.empty, Seq("q_a"), Seq.empty)
    assert(afterConfirmed == Map("q_a" -> 1))
    val (esc, unconf, _) =
      Bench.escalateFlags(afterConfirmed, Seq.empty, Seq("q_a"))
    assert(esc == Seq("q_a") && unconf.isEmpty,
      "confirmed-then-noisy must escalate on the second appearance")
  }
}
