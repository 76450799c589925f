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
}
