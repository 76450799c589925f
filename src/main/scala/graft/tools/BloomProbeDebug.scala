package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dev-only component timing for the indexed bloom probe path. */
object BloomProbeDebug {
  def main(args: Array[String]): Unit = {
    val n = 5000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probedbg] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val dir = Files.createTempDirectory("graft-pd-").toString
    spark.range(n).selectExpr("id AS doc_id",
        "concat('document number ', id, ' body text') AS text")
      .write.parquet(s"$dir/existing")
    val ex = spark.read.parquet(s"$dir/existing")
    val root = Files.createTempDirectory("graft-pd-idx-").toString
    timed("build")(Dedup.buildBloomIndex(spark, ex, root, "corp", "bloom",
      bits = 1 << 26))
    timed("readBloomIndex.count")(
      Dedup.readBloomIndex(spark, root, "corp", "bloom").count())
    timed("fp table count")(
      graft.plans.Mor.read(spark, root, "corp", "bloom_fp").count())
    val b = n / 10
    val batch = spark.range(b).selectExpr(
      s"CASE WHEN id < ${b / 10} THEN id ELSE id + $n END AS doc_id",
      s"concat('document number ', CASE WHEN id < ${b / 10} THEN id " +
        s"ELSE id + $n END, ' body text') AS text")
    batch.write.parquet(s"$dir/batch")
    val batchDf = spark.read.parquet(s"$dir/batch")
    timed("probe 1st")(Dedup.probeBloomIndexed(spark, batchDf, root, "corp",
      "bloom").count())
    timed("probe 2nd")(Dedup.probeBloomIndexed(spark, batchDf, root, "corp",
      "bloom").count())
    spark.stop()
  }
}
