package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Extensions, Formats, Generated, Registry, Relational, SqlSurface}

/** Registry integrity: the driver gate runs exactly what the families
  * declare — a duplicate query name across families would silently drop
  * one implementation (Map ++ keeps the last), and a query without an
  * oracle silently downgrades to rows-only checking.
  */
class RegistrySpec extends AnyFunSuite {

  private val families = Seq(
    "Generated" -> (Generated.queries.keySet, Generated.oracleSql.keySet),
    "Relational" -> (Relational.queries.keySet, Relational.oracleSql.keySet),
    "SqlSurface" -> (SqlSurface.queries.keySet, SqlSurface.oracleSql.keySet),
    "Extensions" -> (Extensions.queries.keySet, Extensions.oracleSql.keySet),
    "Formats" -> (Formats.queries.keySet, Formats.oracleSql.keySet))

  test("no query name collides across families") {
    val all = families.flatMap(_._2._1.toSeq.map(_ -> 1)).map(_._1)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(Registry.queries.size == all.size)
  }

  test("every declared query has a DuckDB oracle and vice versa") {
    families.foreach { case (name, (qs, os)) =>
      assert(qs == os,
        s"$name mismatch — missing oracles: ${(qs -- os).mkString(", ")}; " +
          s"orphan oracles: ${(os -- qs).mkString(", ")}")
    }
  }
}
