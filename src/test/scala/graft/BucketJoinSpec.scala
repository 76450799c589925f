package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Spark native bucketing: two tables bucketed on the join key join
  * WITHOUT any exchange — the write-time shuffle is paid once, every
  * subsequent co-bucketed join is shuffle-free (the 100 TB two-fact-
  * table strategy `q_bucket_join` advertises).
  */
class BucketJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("co-bucketed sort-merge join plans with zero exchanges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt-").toString
    (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "va")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/ta").saveAsTable("bkt_a")
    (0L until 1000L).filter(_ % 3 == 0).map(i => (i, i * 2)).toDF("k", "vb")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/tb").saveAsTable("bkt_b")

    val joined = spark.table("bkt_a").hint("merge")
      .join(spark.table("bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"co-bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() == 334) // 0,3,...,999

    // a NON-bucketed copy of the same data does shuffle — the contrast
    // that proves the bucketed plan's exchange-freedom is load-bearing
    val flat = spark.table("bkt_a").hint("merge")
      .join((0L until 1000L).filter(_ % 3 == 0).map(i => (i, i * 2))
        .toDF("k", "vb"), "k")
    assert(flat.queryExecution.executedPlan.toString.contains("Exchange"))

    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
  }
}
