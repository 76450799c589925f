package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch probe: PQ shortlist quality vs exact top-k at several
  * rerank sizes (diagnoses whether low recall is shortlist quality or
  * implementation error).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    println(s"n vectors = ${emb.count()}")
    val exact = Similarity.bruteTopK(emb, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    println("exact top10: " + exact.mkString(", "))
    for (rr <- Seq(20, 40, 80)) {
      val pq = Similarity.pqTopK(emb, 0L, k = 10, rerank = rr).collect()
        .map(_.getLong(0)).toSet
      val rec = (exact.map(_._1).toSet & pq).size / 10.0
      println(s"rerank=$rr -> recall $rec")
    }
    spark.stop()
  }
}
