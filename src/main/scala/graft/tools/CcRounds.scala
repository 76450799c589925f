package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: replicate the connectedComponents loop with per-round
  * timing to see where the wall-clock goes.
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    // Arg: an sf dir (documents-derived graph) or a plain integer N
    // (the synthetic N-node graph AnalyticsScaleSmoke uses).
    val arg = args.headOption.getOrElse("/root/testdata/sf0.1")
    val synthetic = arg.forall(_.isDigit)
    val cpus = if (synthetic) sys.env.getOrElse("SPARK_GRAFT_CPUS", "16") else "8"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs =
      if (synthetic) spark.range(arg.toLong).selectExpr("id AS doc_id")
      else graft.queries.Util.rd(spark, arg, "documents")
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
      val jumps = sys.env.getOrElse("SPARK_GRAFT_CC_JUMPS", "2").toInt
      var cur = hopped.withColumnRenamed("lab1", "lab")
      for (j <- 1 to jumps) {
        cur = cur
          .join(labels.select(col("node").as(s"jn$j"), col("lab").as(s"jlab$j")),
            col("lab") === col(s"jn$j"), "left")
          .select(col("node"), col("plab"),
            least(col("lab"), coalesce(col(s"jlab$j"), col("lab"))).as("lab"))
      }
      val next = cur.localCheckpoint(true)
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
