package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-query bench regression detector (r10 verdict item 2)
  * on a synthetic fixture: the suite-level steal gate must no longer
  * be the only eye on a single-query blowup.
  */
class BenchFlagSpec extends AnyFunSuite {

  private val anchor = Map(
    "q_fast" -> 0.10, // tiny: multiplicative jitter, never flagged
    "q_mid" -> 1.00,
    "q_slow" -> 2.00,
    "q_anchorless" -> 0.0) // defensive: zero anchor must not divide

  test("a pagerank-class outlier is flagged even on a warm suite") {
    // suite ratio here is ~1.15 (under the 1.3 steal gate), but one
    // query is 2.2x — exactly the r10 blind spot
    val best = Map(
      "q_fast" -> 0.11,
      "q_mid" -> 2.20,
      "q_slow" -> 2.10,
      "q_new" -> 5.0) // unanchored: never flagged
    val f = Bench.flaggedQueries(best, anchor)
    assert(f.map(_._1) == Seq("q_mid"))
    assert(math.abs(f.head._2 - 2.2) < 1e-9)
  }

  test("multiplicative jitter on tiny queries stays quiet") {
    // 3x ratio but only +0.08s absolute — below FlagFloorSec
    val f = Bench.flaggedQueries(Map("q_fast" -> 0.18), anchor)
    assert(f.isEmpty)
  }

  test("boundary: exactly at the ratio is not a flag, just above is") {
    assert(Bench.flaggedQueries(Map("q_mid" -> 1.5), anchor).isEmpty)
    assert(Bench.flaggedQueries(Map("q_mid" -> 1.51), anchor).nonEmpty)
  }

  test("zero/absent anchors and multiple flags sort by severity") {
    val f = Bench.flaggedQueries(
      Map("q_anchorless" -> 9.0, "q_mid" -> 1.8, "q_slow" -> 4.4), anchor)
    assert(f.map(_._1) == Seq("q_slow", "q_mid"))
  }

  test("isolation re-run CONFIRMS a reproducible regression and CLEARS " +
      "a transient suite hit") {
    // the r11 scenario: two queries flag on suite times; in isolation
    // one still runs 2x its anchor (real regression), the other drops
    // back to ~anchor (steal window during the suite — variance)
    val suiteFlags = Bench.flaggedQueries(
      Map("q_mid" -> 2.20, "q_slow" -> 4.40), anchor)
    assert(suiteFlags.map(_._1) == Seq("q_mid", "q_slow"))
    val isolated = Map("q_mid" -> 2.10, "q_slow" -> 2.05)
    val (confirmed, cleared) =
      Bench.adjudicateFlags(suiteFlags, isolated, anchor)
    assert(confirmed.map(_._1) == Seq("q_mid"))
    val (_, cs, ci) = confirmed.head
    assert(math.abs(cs - 2.2) < 1e-9 && math.abs(ci - 2.1) < 1e-9)
    assert(cleared.map(_._1) == Seq("q_slow"))
    assert(math.abs(cleared.head._3 - 1.025) < 1e-9)
  }

  test("isolation adjudication applies the same floor rule — a tiny " +
      "query cannot confirm through ratio alone") {
    // suite flagged via a big absolute excess, isolated run is 3x its
    // anchor but only +0.05s over it: floor clears it
    val suiteFlags = Seq("q_fast" -> 6.0)
    val (confirmed, cleared) = Bench.adjudicateFlags(
      suiteFlags, Map("q_fast" -> 0.15), anchor)
    assert(confirmed.isEmpty && cleared.map(_._1) == Seq("q_fast"))
  }

  test("a flagged query with no isolated measurement is dropped, not " +
      "silently confirmed") {
    val (confirmed, cleared) = Bench.adjudicateFlags(
      Seq("q_mid" -> 2.0), Map.empty, anchor)
    assert(confirmed.isEmpty && cleared.isEmpty)
  }

  test("isolation re-runs use the suite's min-of-REPEAT discipline — " +
      "one tail sample cannot confirm a flag") {
    // r12 asymmetry: suite times were min-of-2 but isolation was a
    // single runOnce, so a one-shot GC tail became a CONFIRMED verdict
    val flags = Seq("q_mid" -> 2.0, "q_slow" -> 1.8)
    val calls = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    // q_mid: first sample is a 5.5x tail, second is clean — min must
    // win and clear it. q_slow: BOTH samples regressed (min 4.2 →
    // 2.1x its 2.0 anchor, excess 2.2s) — a real regression that
    // survives the min fold and confirms. (r13 shipped this fixture
    // with q_slow samples 2.2/2.1 whose min 2.1 is only 1.05x the
    // anchor — adjudicateFlags correctly CLEARED it and the suite ran
    // red; the fixture, not the production logic, was wrong.)
    val samples = Map("q_mid" -> Seq(5.5, 1.05), "q_slow" -> Seq(4.4, 4.2))
    val isolated = Bench.isolatedTimes(flags, repeat = 2, run = n => {
      val t = samples(n)(calls(n)); calls(n) += 1; t
    })
    assert(calls("q_mid") == 2 && calls("q_slow") == 2)
    assert(isolated == Map("q_mid" -> 1.05, "q_slow" -> 4.2))
    // and the adjudication then clears the tail, confirms the real one
    val (confirmed, cleared) = Bench.adjudicateFlags(flags, isolated, anchor)
    assert(confirmed.map(_._1) == Seq("q_slow"))
    assert(cleared.map(_._1) == Seq("q_mid"))
  }

  test("isolatedTimes clamps a non-positive repeat to one run") {
    val isolated = Bench.isolatedTimes(Seq("q_mid" -> 2.0), repeat = 0,
      run = _ => 1.7)
    assert(isolated == Map("q_mid" -> 1.7))
  }
}
