package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.plans.{Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, GenConfig}

/** Dev probe: isolate the MOR read's cost components at scale —
  * pure scan, scan+DV pos-deletes, full read (DV), full read
  * (anti-join fallback). Args: [rowsPerFileMillions]
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val m = if (args.nonEmpty) args(0).toDouble else 1.0
    val rpf = (m * 1e6).toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft-morprobe-").toString
    val cfg = GenConfig("ns", "big",
      data = FileConfig(rpf, 20),
      posDelete = FileConfig(rpf, 5),
      eqDelete = FileConfig(rpf, 5))
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      System.out.flush(); r
    }
    timed("prepare")(Pipeline.prepareBulkData(spark, root, cfg))
    timed("deletes")(Pipeline.prepareDeletes(spark, root, cfg))
    for (rep <- 1 to 2) {
      timed(s"rep$rep scan-only count")(
        Mor.scanWithProvenance(spark, root, "ns", "big").count())
      timed(s"rep$rep full read count (DV)")(
        Mor.read(spark, root, "ns", "big").count())
      timed(s"rep$rep full read count (anti-join)")(
        Mor.read(spark, root, "ns", "big", bitmapThreshold = 0L).count())
    }
    spark.stop()
  }
}
