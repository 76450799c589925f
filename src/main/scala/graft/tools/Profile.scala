package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Dev helper: time queries in the EXACT order given (RunOne iterates an
  * unordered Map), after an untimed session warm-up, using the same
  * checksum action as Bench. Args: <sfDir> <name>[,<name>...] [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up: JVM + codegen + parquet reader, untimed
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()
    for (r <- 1 to reps; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.agg(bit_xor(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)))).collect()
      println(f"[profile] rep$r $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      System.out.flush()
    }
    spark.stop()
  }
}
