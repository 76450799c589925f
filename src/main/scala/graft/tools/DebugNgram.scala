package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHash

object DebugNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${args(1)}]")
      .config("spark.sql.shuffle.partitions", args(1))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[debug] $label: $n rows in ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    time("split only")(docs.select(col("doc_id"),
      split(col("text"), " ").as("w")).count())
    time("shingle hashes")(docs.select(col("doc_id"),
      explode(TextHash.shingleHashes(split(col("text"), " "), 4)).as("sh")).count())
    time("distinct")(docs.select(col("doc_id"),
      explode(TextHash.shingleHashes(split(col("text"), " "), 4)).as("sh"))
      .distinct().count())
    val sh = docs.select(col("doc_id"),
      explode(TextHash.shingleHashes(split(col("text"), " "), 4)).as("sh"))
      .distinct()
    val a = sh.toDF("doc_a", "sh"); val b = sh.toDF("doc_b", "sh")
    val joined = a.join(b, "sh").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)))
    joined.explain("formatted")
    time("self join")(joined.count())
    spark.stop()
  }
}
