package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ExplainDump

/** Round-close hygiene as a failing test (r11 verdict item 5): every
  * query added in a recent round must land in the ExplainDump headline
  * set the same round it ships, and the headline set must only name
  * real registered queries (a rename would silently crash the dump at
  * round close otherwise).
  */
class ExplainDumpSpec extends AnyFunSuite {

  test("every recent-round query is in the headline plan-dump set") {
    val headline = ExplainDump.headline.toSet
    ExplainDump.recentAdditions.foreach { case (round, qs) =>
      val missing = qs.filterNot(headline)
      assert(missing.isEmpty,
        s"round-$round queries missing from ExplainDump.headline: " +
          missing.mkString(", "))
    }
  }

  test("headline names are unique and all registered") {
    val dups = ExplainDump.headline.groupBy(identity)
      .filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate headline entries: $dups")
    val unknown = ExplainDump.headline
      .filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"headline names not in the registry: $unknown")
  }

  test("recent-addition names are themselves registered queries") {
    val unknown = ExplainDump.recentAdditions.values.flatten.toSeq
      .filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"recentAdditions not in the registry: $unknown")
  }
}
