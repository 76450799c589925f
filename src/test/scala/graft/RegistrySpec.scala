package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Analytics, Extensions, Formats, Generated, Registry, Relational, SqlSurface}

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
    "Formats" -> (Formats.queries.keySet, Formats.oracleSql.keySet),
    "Analytics" -> (Analytics.queries.keySet, Analytics.oracleSql.keySet))

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

  test("quantile sketch bounds the exact percentile within one bucket") {
    // the oracle proves engine equivalence; this pins the ESTIMATOR
    // property the sketch advertises — p_ub is an upper bound no more
    // than one bucket width above the exact percentile
    val spark = SparkTestSession.spark
    val sfDir = "/root/testdata/sf0.001"
    val sketch = Registry.queries("q_quantile_sketch")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions._
    // positional (discrete) median — the quantile definition a
    // cumulative-crossing sketch bounds; interpolated percentile can
    // legitimately exceed the crossing bucket's upper edge
    val rows = graft.queries.Util.rd(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    rows.groupBy(_._1).foreach { case (pri, vs) =>
      val sorted = vs.map(_._2).sorted
      val p50 = sorted(math.ceil(sorted.length * 0.5).toInt - 1)
      val ub = sketch(pri).toDouble
      assert(ub >= p50 && ub - 5000.0 <= p50,
        s"$pri: p50_ub $ub not within one bucket above positional $p50")
    }
  }
}
