package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Pipeline, TableIO}
import graft.sources.{FileConfig, GenConfig}

/** The SQL front door: DDL/DML/queries against the governed tables
  * through the DataSourceV2 catalog plugin.
  */
class CatalogSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-sqlcat-").toString
    spark.conf.set("spark.sql.catalog.g", "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.root", r)
    r
  }

  test("CREATE / INSERT / SELECT / SHOW / DROP round-trip") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.sqlns")
    spark.sql("CREATE TABLE g.sqlns.t (foo STRING, bar INT, baz BOOLEAN)")
    spark.sql(
      """INSERT INTO g.sqlns.t
        |SELECT CAST(id AS STRING), CAST(id AS INT), true
        |FROM range(0, 100)""".stripMargin)
    // each INSERT is one snapshot commit
    spark.sql(
      """INSERT INTO g.sqlns.t
        |SELECT CAST(id AS STRING), CAST(id AS INT), false
        |FROM range(100, 150)""".stripMargin)
    assert(TableIO.currentVersion(root, "sqlns", "t") == 2L)
    val got = spark.sql(
      "SELECT count(*) AS n, sum(bar) AS s FROM g.sqlns.t").head()
    assert(got.getLong(0) == 150L && got.getLong(1) == (0 until 150).sum)
    // pushed filters prune + evaluate correctly
    assert(spark.sql(
      "SELECT count(*) FROM g.sqlns.t WHERE bar >= 100").head().getLong(0) == 50L)
    val tables = spark.sql("SHOW TABLES IN g.sqlns")
      .collect().map(_.getString(1))
    assert(tables.contains("t"))
    // INSERT OVERWRITE publishes a replacing snapshot
    spark.sql(
      """INSERT OVERWRITE g.sqlns.t
        |SELECT CAST(id AS STRING), CAST(id AS INT), true
        |FROM range(0, 10)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM g.sqlns.t").head().getLong(0) == 10L)
    // the SQL-written table is a normal governed table underneath
    assert(graft.plans.Mor.read(spark, root, "sqlns", "t").count() == 10L)
    spark.sql("DROP TABLE g.sqlns.t")
    assert(!TableIO.tableExists(root, "sqlns", "t"))
  }

  test("DELETE FROM and TRUNCATE TABLE route to the metadata DML") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.dmlns")
    spark.sql("CREATE TABLE g.dmlns.t (foo STRING, bar INT, baz BOOLEAN)")
    spark.sql(
      """INSERT INTO g.dmlns.t
        |SELECT CAST(id AS STRING), CAST(id AS INT), true
        |FROM range(0, 100)""".stripMargin)
    spark.sql("DELETE FROM g.dmlns.t WHERE bar >= 20 AND bar < 40")
    assert(spark.sql("SELECT count(*) FROM g.dmlns.t").head().getLong(0) == 80L)
    assert(spark.sql("SELECT count(*) FROM g.dmlns.t WHERE bar < 40")
      .head().getLong(0) == 20L)
    spark.sql("TRUNCATE TABLE g.dmlns.t")
    assert(spark.sql("SELECT count(*) FROM g.dmlns.t").head().getLong(0) == 0L)
    // truncate is a snapshot like any other: history stays readable
    assert(graft.plans.Mor.readAt(spark, root, "dmlns", "t", 1L).count() == 100L)
  }

  test("SQL reads apply MOR deletes on tables with delete files") {
    root
    val cfg = GenConfig("mor_ns", "t", FileConfig(50, 4),
      FileConfig(50, 1), FileConfig(50, 1))
    Pipeline.prepare(spark, root, cfg) // 200 data - 50 pos - 50 eq = 100
    val n = spark.sql("SELECT count(*) FROM g.mor_ns.t").head().getLong(0)
    assert(n == 100L)
    // the delete boundary is exact: survivors are bar in [100, 200)
    val mm = spark.sql(
      "SELECT min(bar), max(bar) FROM g.mor_ns.t").head()
    assert(mm.getInt(0) == 100 && mm.getInt(1) == 199)
  }
}
