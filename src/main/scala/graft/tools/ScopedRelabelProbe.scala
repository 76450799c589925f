package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

/** Quick timing/equality probe for the r17 component-scoped capped
  * relabel on the CappedClusterIndexSpec fixture (600 docs, one
  * 300-deep template bucket) — refresh wall time plus bit-equality
  * against a from-scratch rebuild.
  */
object ScopedRelabelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val docs = (0L until 600L).map { id =>
      val body =
        if (id % 2 == 0)
          "boilerplate template body alpha beta gamma delta epsilon zeta"
        else s"unique filler text number $id with trailing entropy word$id"
      (id, body)
    }.toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft-srp-").toString
    timed("build on 400")(PipelineOps.buildClusterIndexCapped(spark,
      docs.filter(col("doc_id") < 400), root, "corp", "clusters"))
    graft.CacheScope.drain()
    timed("refresh 200 (scoped relabel)")(
      PipelineOps.refreshClusterIndexCapped(spark,
        docs.filter(col("doc_id") >= 400), root, "corp", "clusters"))
    graft.CacheScope.drain()
    val root2 = Files.createTempDirectory("graft-srp2-").toString
    timed("from-scratch on 600")(PipelineOps.buildClusterIndexCapped(spark,
      docs, root2, "corp", "clusters"))
    graft.CacheScope.drain()
    val a = PipelineOps.readClusterIndex(spark, root, "corp", "clusters")
    val b = PipelineOps.readClusterIndex(spark, root2, "corp", "clusters")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    require(diff == 0, s"scoped refresh diverged on $diff label rows")
    println("[probe] refresh == rebuild OK")
    spark.stop()
  }
}
