package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stall-adjudication flags ([[Bench.stallFlags]]) against
  * the observation shapes the rounds actually produced, so the `"stalls"`
  * map in the contract line keeps meaning what the header documents. The
  * numbers below are the round-9 driver artifact's (BENCH_r09.json raw
  * evidence) — the exact shapes that previously needed a judge rerun to
  * adjudicate.
  */
class BenchSpec extends AnyFunSuite {

  test("artifact guard: the recorded run stays unless the new run wins " +
      "on BOTH axes; changed coverage always replaces") {
    val q = Set("q1", "q2")
    // the round-15 incident shape: fewer flags but slower — recorded stays
    assert(Bench.keepRecorded(q, 38, 75.2, q, 35, 87.0))
    // wins both axes -> replaces
    assert(!Bench.keepRecorded(q, 38, 75.2, q, 12, 69.0))
    // equal flags, faster -> replaces (2% slack is on the slow side)
    assert(!Bench.keepRecorded(q, 9, 68.8, q, 9, 68.5))
    // faster but MORE flags -> recorded stays
    assert(Bench.keepRecorded(q, 9, 68.8, q, 26, 66.0))
    // within the 2% slack counts as not-slower
    assert(!Bench.keepRecorded(q, 9, 68.8, q, 8, 69.9))
    // changed coverage always replaces, however noisy
    assert(!Bench.keepRecorded(q, 9, 68.8, Set("q1", "q2", "q3"), 40, 99.0))
    // a different scale factor NEVER replaces (an sf0.001 smoke is
    // trivially "faster" than any sf0.1 recording — r20 near-miss)
    assert(Bench.keepRecorded(q, 9, 68.8, q, 0, 1.0,
      oldSf = "/root/testdata/sf0.1", newSf = "/root/testdata/sf0.001"))
    // same sf: the two-axis rule applies as before
    assert(!Bench.keepRecorded(q, 9, 68.8, q, 0, 60.0,
      oldSf = "/root/testdata/sf0.1", newSf = "/root/testdata/sf0.1"))
    // a different core count never replaces either (r20: the driver's
    // 8-cpu scaling run totals LOWER than 32-cpu at fixture scale and
    // displaced the primary record)
    assert(Bench.keepRecorded(q, 1, 56.5, q, 0, 54.0,
      oldSf = "s", newSf = "s", oldCpus = "32", newCpus = "8"))
    // a pre-r20 record with no cpus metadata compares as same-context
    assert(!Bench.keepRecorded(q, 9, 68.8, q, 0, 60.0,
      oldSf = "s", newSf = "s", oldCpus = "", newCpus = "32"))
  }

  test("quiet host: two agreeing passes with a slower warmup are unflagged") {
    val f = Bench.stallFlags(measured = Seq(2.01, 2.05), warmup = 2.8,
      escalations = 0)
    assert(!f.flagged)
    assert(f.spread < 1.1)
    assert(!f.warmupWon)
  }

  test("warmup winning the pool flags the query (r9 q48 shape: recorded " +
      "value was literally the warmup)") {
    // q48 r9: warmup 4.54 s ran clean, then both measured passes (and two
    // escalations) caught the interference window
    val f = Bench.stallFlags(measured = Seq(6.9, 7.4, 6.1, 6.6),
      warmup = 4.54, escalations = 2)
    assert(f.flagged)
    assert(f.warmupWon)
    assert(f.escalated == 2)
  }

  test("pass spread >3x flags even when escalations recovered a good pass") {
    // r9 q42 shape: warmup absorbed a 46.6 s stall, first pass stalled,
    // escalation measured the real 2 s — best-of records 2.01 but the
    // spread says the window was dirty
    val f = Bench.stallFlags(measured = Seq(8.7, 2.01), warmup = 46.6,
      escalations = 1)
    assert(f.flagged)
    assert(f.spread > 3.0)
    assert(!f.warmupWon) // warmup itself stalled, it did not win
  }

  test("escalation alone flags, so a recovered record still carries " +
      "evidence the loop fired") {
    val f = Bench.stallFlags(measured = Seq(1.5, 1.52, 1.49), warmup = 2.0,
      escalations = 1)
    assert(f.flagged)
    assert(f.escalated == 1)
  }

  test("single measured pass has spread 1 (no self-comparison)") {
    val f = Bench.stallFlags(measured = Seq(3.2), warmup = 4.0,
      escalations = 0)
    assert(f.spread == 1.0)
    assert(!f.flagged)
  }

  test("a marginal warmup win is noise, not a stall (1.5x margin)") {
    // observed live: warmup 1% faster than both passes on a quiet
    // host — must NOT flag, or every quiet artifact carries false
    // pressure-positives
    val f = Bench.stallFlags(measured = Seq(0.56, 0.57), warmup = 0.555,
      escalations = 0)
    assert(!f.warmupWon)
    assert(!f.flagged)
  }

  test("failed warmup (-1) never counts as winning") {
    val f = Bench.stallFlags(measured = Seq(2.0, 2.1), warmup = -1.0,
      escalations = 0)
    assert(!f.warmupWon)
    assert(!f.flagged)
  }

  test("no measured passes at all (every pass errored) stays unflagged — " +
      "the errors list, not stalls, reports that") {
    val f = Bench.stallFlags(measured = Seq.empty, warmup = 3.0,
      escalations = 0)
    assert(!f.flagged)
  }

  test(">3 s tier flags at 1.5x spread (r10 q71 shape: 4.48 s vs a " +
      "3.16 s history sat under the flat 3x threshold unadjudicated)") {
    val f = Bench.stallFlags(measured = Seq(4.48, 3.1), warmup = 5.0,
      escalations = 0)
    assert(f.spreadLimit == 1.5)
    // 4.48/3.1 = 1.45 stays under, but the r10 artifact's actual raw
    // passes would have needed only this much disagreement to flag:
    assert(!f.flagged)
    val g = Bench.stallFlags(measured = Seq(4.8, 3.1), warmup = 5.0,
      escalations = 0)
    assert(g.flagged && g.spread > 1.5)
    // the cheap tier keeps the 3x threshold — 2x jitter is ordinary
    val h = Bench.stallFlags(measured = Seq(0.9, 0.45), warmup = 1.0,
      escalations = 0)
    assert(h.spreadLimit == 3.0 && !h.flagged)
  }
}
