package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: a hive-partitioned fact joined to a
  * runtime-filtered dim must carry a dynamicpruning subquery in its
  * partition filters — only qualifying partitions are read.
  */
class DppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("fact scan carries a dynamicpruning partition filter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp-").toString
    (0L until 1000L).map(i => (i, (i % 10).toInt))
      .toDF("v", "part")
      .write.partitionBy("part").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = fact.select(col("part")).distinct()
      .filter(col("part") < 3)
    val joined = fact.join(broadcast(dim), "part")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")
    assert(joined.count() == 300L)
  }
}
