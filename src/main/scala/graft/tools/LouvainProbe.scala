package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: scan corpus sizes for one where the UNGUARDED colored
  * Louvain sweep decreases Q — the failure mode the r14 monotonicity
  * guard exists for (Graph.LouvainPhases doc). A hit becomes the
  * adversarial fixture in AnalyticsSpec. Args: [nLo nHi]
  */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val (lo, hi) = args match {
      case Array(a, b, _*) => (a.toInt, b.toInt)
      case _ => (8, 128)
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (lo to hi).foreach { n =>
      val docs = (0L until n.toLong).toDF("doc_id")
      val row = graft.operators.Graph
        .louvainRefineImpl(spark, docs, guard = false).collect().head
      graft.CacheScope.drain()
      val (qs, qr) = (row.getLong(2), row.getLong(3))
      if (qr < qs)
        println(s"[louvainprobe] HIT n=$n q_seed=$qs q_refined=$qr")
      else if (n % 20 == 0)
        println(s"[louvainprobe] n=$n ok (q $qs -> $qr)")
    }
    spark.stop()
  }
}
