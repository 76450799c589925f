package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val bands = 16; val r = 4
    val keyCols = (0 until bands).map { bnd =>
      (0 until r).map { i =>
        when(try_element_at(col("embedding"), lit(bnd * r + i + 1)) > 0f, 1L << i).otherwise(0L)
      }.reduce(_ + _) }
    val bandDf = emb.select(col("vec_id"), posexplode(array(keyCols: _*)).as(Seq("band", "key")))
    var t0 = System.nanoTime()
    val rawPairs = bandDf.toDF("vec_a","band","key").join(bandDf.toDF("vec_b","band","key"), Seq("band","key")).filter(col("vec_a")=!=col("vec_b")).count()
    println(f"raw pairs: $rawPairs cnt in ${(System.nanoTime()-t0)/1e9}%.2fs")
    t0 = System.nanoTime()
    val cand = bandDf.toDF("vec_a","band","key").join(bandDf.toDF("vec_b","band","key"), Seq("band","key")).filter(col("vec_a")=!=col("vec_b")).select("vec_a","vec_b").distinct()
    println(f"distinct: ${cand.count()} in ${(System.nanoTime()-t0)/1e9}%.2fs")
    t0 = System.nanoTime()
    val e = emb.select(col("vec_id"), col("embedding"))
    val joined = cand.join(e.toDF("vec_a","emb_a"), "vec_a").join(e.toDF("vec_b","emb_b"), "vec_b")
      .withColumn("cos", VectorOps.cosine(col("emb_a"), col("emb_b")))
    println(f"cos sum: ${joined.agg(sum(col("cos"))).collect()(0)} in ${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}
