package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time the connected-components loop round by round. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Util.rd(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val out = graft.operators.Graph.connectedComponents(spark, docs)
    val n = out.count()
    println(f"[ccprobe] $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
  }
}
