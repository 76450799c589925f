package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted join must be result-identical to the plain join on skewed
  * data (one key holding 90% of rows).
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted inner join equals plain join on skewed keys") {
    val left = spark.range(0, 10000)
      .select((when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")))
        .as("k"), col("id").as("v"))
    val right = Seq((1L, "hot"), (20L, "cold"), (30L, "cold2"))
      .toDF("k", "name")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedInner(left, right, "k", factor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length && salted.sameElements(plain))
  }

  test("q_runtime_bloom actually injects the runtime bloom filter: " +
      "might_contain guards the fact scan") {
    val df = graft.SparkEntry.queries("q_runtime_bloom")(spark,
      "/root/testdata/sf0.01")
    // injection happens at logical optimization — visible pre-action
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter in the plan:\n${plan.take(3000)}")
    assert(df.collect().nonEmpty)
    graft.CacheScope.drain()
  }

  test("q_aqe_skew actually exercises AQE's skew split: the final " +
      "adaptive plan marks the join skew=true") {
    val df = graft.SparkEntry.queries("q_aqe_skew")(spark,
      "/root/testdata/sf0.01")
    val rows = df.collect()
    graft.CacheScope.drain()
    assert(rows.nonEmpty)
    // the executed (post-AQE) plan — the initial plan can't show the
    // split because skew is measured from the real shuffle sizes
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"no skew-split join in the final plan:\n$finalPlan")
  }
}
