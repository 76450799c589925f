package graft.tools

import org.apache.spark.sql.SparkSession

/** Drive the multimodal decode->resize->feature pipeline over the
  * documents table and print a sample. */
object MediaSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = graft.operators.Multimodal.decodeAndResize(spark, docs, 24)
    println("MEDIA_ROWS=" + feats.count())
    feats.orderBy("doc_id").show(3)
    spark.stop()
  }
}
