package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: replicate the connectedComponents loop with per-round
  * timing to see where the wall-clock goes.
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Util.rd(spark, sfDir, "documents")
    val t00 = System.nanoTime()
    val und = graft.operators.Graph.linkEdges(docs)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val edges = und.select(col("u").as("src"), col("v").as("dst"))
      .union(und.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("dst"))
      .cache()
    edges.count()
    println(f"[ccrounds] edges built in ${(System.nanoTime() - t00) / 1e9}%.2fs")
    var labels = docs.select(col("doc_id").as("node"))
      .withColumn("lab", col("node")).localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      val t0 = System.nanoTime()
      val viaN = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("lab", "nl"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("nl").as("nlab"))
      val hopped = labels
        .join(viaN, Seq("node"), "left")
        .select(col("node"), col("lab").as("plab"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab1"))
      val next = hopped
        .join(labels.select(col("node").as("jn"), col("lab").as("jlab")),
          col("lab1") === col("jn"), "left")
        .select(col("node"), col("plab"),
          least(col("lab1"), coalesce(col("jlab"), col("lab1"))).as("lab"))
        .localCheckpoint(true)
      val tCkpt = (System.nanoTime() - t0) / 1e9
      changed = next.filter(col("lab") =!= col("plab")).count()
      println(f"[ccrounds] round $round: ckpt ${tCkpt}%.2fs " +
        f"+count ${(System.nanoTime() - t0) / 1e9 - tCkpt}%.2fs changed=$changed")
      labels = next.select("node", "lab")
    }
    println(f"[ccrounds] total ${(System.nanoTime() - t00) / 1e9}%.2fs")
    spark.stop()
  }
}
