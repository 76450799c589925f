package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.plans.{Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, GenConfig}

object DebugMor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft-dbg-").toString
    val rpf = 500000L
    val cfg = GenConfig("ns", "big", FileConfig(rpf, 20),
      FileConfig(rpf, 4), FileConfig(rpf, 4))
    Pipeline.prepareBulkData(spark, root, cfg)
    Pipeline.prepareDeletes(spark, root, cfg)
    def time(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[mor] $l: $n in ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    val dataFiles = TableIO.filesOf(root, "ns", "big", "data").map(_._1)
    time("plain scan")(spark.read.parquet(dataFiles: _*).count())
    time("scanWithProvenance")(
      Mor.scanWithProvenance(spark, root, "ns", "big").count())
    time("full MOR")(Mor.read(spark, root, "ns", "big").count())
    time("full MOR again")(Mor.read(spark, root, "ns", "big").count())
    time("MOR via anti-join (threshold=0)")(
      Mor.read(spark, root, "ns", "big", bitmapThreshold = 0L).count())
    time("MOR bitmap path again")(Mor.read(spark, root, "ns", "big").count())
    spark.stop()
  }
}
