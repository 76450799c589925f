package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.MvRewrite

/** MV query rewrite: a registered aggregate view answers the exact
  * matching aggregation (plan-asserted: no Aggregate, scans the view),
  * produces identical results to direct execution, and — just as
  * important in a shared session — does NOT touch near-miss queries
  * (subset aggregates, filtered scans, different groupings).
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixture(): (DataFrame, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-").toString
    spark.range(0, 1000)
      .selectExpr("CAST(id % 7 AS STRING) AS g", "id AS v",
        "CAST(id AS DOUBLE) / 3.0 AS p")
      .write.mode("overwrite").parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    base.groupBy("g").agg(count(lit(1)).as("n"), min("p").as("lo"),
        max("p").as("hi"))
      .write.mode("overwrite").parquet(s"$dir/mv")
    (base, dir)
  }

  private def aggOf(base: DataFrame) =
    base.groupBy("g").agg(count(lit(1)).as("n"), min("p").as("lo"),
      max("p").as("hi"))

  test("exact match rewrites to the view; results identical; " +
      "near-misses untouched") {
    val (base, dir) = fixture()
    val direct = aggOf(base).orderBy("g").collect()
    MvRewrite.register(spark, MvRewrite.MvDef("t",
      MvRewrite.pathOf(base).get, Seq("g"),
      Seq(("count", "*", "n"), ("min", "p", "lo"), ("max", "p", "hi")),
      s"$dir/mv"))
    try {
      val q = aggOf(base).orderBy("g")
      val opt = q.queryExecution.optimizedPlan
      assert(!opt.toString.contains("Aggregate"),
        s"aggregate survived the rewrite:\n$opt")
      assert(q.inputFiles.exists(_.contains("/mv")) &&
        !q.inputFiles.exists(_.contains("/base")),
        s"view not scanned: ${q.inputFiles.toSeq}")
      assert(q.collect().toSeq == direct.toSeq)

      // near-miss 1: SUBSET of the view's aggregates — must NOT rewrite
      val subset = base.groupBy("g").agg(count(lit(1)).as("n"))
      assert(subset.queryExecution.optimizedPlan.toString
        .contains("Aggregate"))
      // near-miss 2: filtered scan — a group-level view cannot answer it
      val filtered = aggOf(base.filter(col("v") > 500))
      assert(filtered.queryExecution.optimizedPlan.toString
        .contains("Aggregate"))
      // near-miss 3: a FINER grouping (view can't split its groups)
      val regrouped = base.groupBy("g", "v").agg(count(lit(1)).as("n"),
        min("p").as("lo"), max("p").as("hi"))
      assert(regrouped.inputFiles.exists(_.contains("/base")))
      // near-miss 4: COUNT(NULL) must return 0 per group, NOT the
      // view's stored row count — only non-null literals are
      // count(*)-equivalent
      val countNull = base.groupBy("g")
        .agg(count(lit(null)).as("n"), min("p").as("lo"),
          max("p").as("hi")).orderBy("g")
      assert(countNull.queryExecution.optimizedPlan.toString
        .contains("Aggregate"), "COUNT(NULL) was rewritten to the view")
      assert(countNull.collect().forall(_.getLong(1) == 0L))
    } finally MvRewrite.clear()
  }

  test("coarser grouping rolls the view up instead of scanning base") {
    val (base, dir) = fixture()
    // view at (g, g2); query at (g) — count re-sums, min/max refold
    spark.read.parquet(s"$dir/base")
      .selectExpr("g", "CAST(v % 3 AS STRING) AS g2", "v", "p")
      .write.mode("overwrite").parquet(s"$dir/base2")
    val b2 = spark.read.parquet(s"$dir/base2")
    b2.groupBy("g", "g2").agg(count(lit(1)).as("n"), min("p").as("lo"),
        max("p").as("hi"))
      .write.mode("overwrite").parquet(s"$dir/mv2")
    val direct = aggOf(b2).orderBy("g").collect()
    MvRewrite.register(spark, MvRewrite.MvDef("t2",
      MvRewrite.pathOf(b2).get, Seq("g", "g2"),
      Seq(("count", "*", "n"), ("min", "p", "lo"), ("max", "p", "hi")),
      s"$dir/mv2"))
    try {
      val q = aggOf(b2).orderBy("g")
      assert(q.inputFiles.exists(_.contains("/mv2")) &&
        !q.inputFiles.exists(_.contains("/base2")),
        s"rollup did not use the view: ${q.inputFiles.toSeq}")
      assert(q.collect().toSeq == direct.toSeq)
    } finally MvRewrite.clear()
  }

  test("governed base: rewrite serves the view until DML moves the " +
      "version, then falls back to the live table") {
    import graft.plans.TableIO
    val root = java.nio.file.Files.createTempDirectory("graft-mvg-").toString
    spark.conf.set("spark.sql.catalog.gmvt", "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmvt.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmvt.ns")
    spark.sql("CREATE TABLE gmvt.ns.t (g STRING, v INT)")
    spark.sql("""INSERT INTO gmvt.ns.t
                |SELECT CAST(id % 3 AS STRING), CAST(id AS INT)
                |FROM range(0, 300)""".stripMargin)
    def agg() = spark.sql(
      """SELECT g, count(*) AS n, max(v) AS hi FROM gmvt.ns.t
        |GROUP BY g ORDER BY g""".stripMargin)
    agg().write.mode("overwrite").parquet(s"$root/mv")
    MvRewrite.register(spark, MvRewrite.MvDef("gt",
      MvRewrite.graftPath(root, "ns", "t"), Seq("g"),
      Seq(("count", "*", "n"), ("max", "v", "hi")), s"$root/mv",
      baseVersion = Some(TableIO.currentVersion(root, "ns", "t"))))
    try {
      val q1 = agg()
      assert(q1.inputFiles.exists(_.contains("/mv")),
        s"governed rewrite did not fire: ${q1.inputFiles.toSeq}")
      assert(q1.collect().map(_.getLong(1)).sum == 300L)
      // DML bumps the version: the SAME query must now answer from
      // the live table (stale view declined), seeing the new rows
      spark.sql("INSERT INTO gmvt.ns.t VALUES ('0', 9999)")
      val q2 = agg()
      assert(!q2.inputFiles.exists(_.contains("/mv")),
        "stale view still answered after base DML")
      val rows = q2.collect()
      assert(rows.map(_.getLong(1)).sum == 301L)
      assert(rows.find(_.getString(0) == "0").get.getInt(2) == 9999)
      // CALL refresh_mv recomputes the view and re-pins the version:
      // the rewrite serves again, now with the post-DML content
      val out = spark.sql("CALL gmvt.system.refresh_mv('gt')").collect()
      assert(out.head.getString(0) == "gt" && out.head.getLong(1) >= 0)
      val q3 = agg()
      assert(q3.inputFiles.exists(_.contains("/mv")),
        s"rewrite did not resume after refresh: ${q3.inputFiles.toSeq}")
      val rows3 = q3.collect()
      assert(rows3.map(_.getLong(1)).sum == 301L)
      assert(rows3.find(_.getString(0) == "0").get.getInt(2) == 9999)
    } finally MvRewrite.clear()
  }

  test("an INSERT racing refresh_mv lands on the live-table side — " +
      "the view is declined, never served stale") {
    // Deterministic interleaving, no sleeps: the refreshRaceHook seam
    // fires between refresh()'s version pin and its recompute write —
    // the exact window where a concurrent DML commit would land. The
    // pin-BEFORE-scan ordering makes the race safe by construction
    // (pin older than data => freshness gate declines); this proves it.
    import graft.plans.TableIO
    val root = java.nio.file.Files.createTempDirectory("graft-mvr-").toString
    spark.conf.set("spark.sql.catalog.gmvr", "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmvr.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmvr.ns")
    spark.sql("CREATE TABLE gmvr.ns.t (g STRING, v INT)")
    spark.sql("""INSERT INTO gmvr.ns.t
                |SELECT CAST(id % 3 AS STRING), CAST(id AS INT)
                |FROM range(0, 300)""".stripMargin)
    def agg() = spark.sql(
      """SELECT g, count(*) AS n, max(v) AS hi FROM gmvr.ns.t
        |GROUP BY g ORDER BY g""".stripMargin)
    agg().write.mode("overwrite").parquet(s"$root/mv")
    MvRewrite.register(spark, MvRewrite.MvDef("gr",
      MvRewrite.graftPath(root, "ns", "t"), Seq("g"),
      Seq(("count", "*", "n"), ("max", "v", "hi")), s"$root/mv",
      baseVersion = Some(TableIO.currentVersion(root, "ns", "t"))))
    try {
      assert(agg().inputFiles.exists(_.contains("/mv")))
      MvRewrite.refreshRaceHook = () =>
        spark.sql("INSERT INTO gmvr.ns.t VALUES ('1', 7777)")
      try MvRewrite.refresh(spark, "gr")
      finally MvRewrite.refreshRaceHook = () => ()
      // the racing INSERT moved the version past the refresh's pin:
      // the freshness gate must decline the view and answer from the
      // live table, WITH the racing row
      val q = agg()
      assert(!q.inputFiles.exists(_.contains("/mv")),
        "possibly-stale view served after a racing INSERT")
      val rows = q.collect()
      assert(rows.map(_.getLong(1)).sum == 301L)
      assert(rows.find(_.getString(0) == "1").get.getInt(2) == 7777)
      // a clean (un-raced) refresh re-pins and the rewrite resumes,
      // now folding the raced row into the view
      MvRewrite.refresh(spark, "gr")
      val q2 = agg()
      assert(q2.inputFiles.exists(_.contains("/mv")),
        s"rewrite did not resume after clean refresh: ${q2.inputFiles.toSeq}")
      assert(q2.collect().find(_.getString(0) == "1").get.getInt(2) == 7777)
    } finally MvRewrite.clear()
  }
}
