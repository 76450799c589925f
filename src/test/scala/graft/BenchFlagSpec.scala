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
}
