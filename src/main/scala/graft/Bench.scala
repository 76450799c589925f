package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
object Bench {
  /** A query exceeding this gets one rerun; min is recorded. Every
    * query in the suite runs well under this on a healthy JVM/host. */
  val RerunThresholdSec = 15.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // q_map_fns outputs map columns; allow them in the checksum hash
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed session warm-up: JVM/JIT/codegen/scheduler spin-up was
    // previously absorbed by whichever query ran first alphabetically
    // (~6s charged to ann_ivf in r1/r2 benches)
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val reran = scala.collection.mutable.ListBuffer.empty[String]
    // checksum over every output column — count() let Catalyst prune
    // unreferenced projections, timing a row-count scan instead of the
    // operator being advertised (r1 verdict finding 4); bit_xor cannot
    // overflow under ANSI (sum of hashes does) and stays order-free
    def runOnce(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
      } catch { case e: Throwable =>
        // a failure must be machine-visible in the JSON, not just on
        // stderr — otherwise a time-to-exception reads as a real timing
        // in round-over-round compares (ADVICE r2)
        if (!failed.contains(name)) failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // dev-only filter for micro-benchmarking a subset in isolation
    // (unset — the driver's case — runs the full suite); REPEAT reruns
    // the filtered suite N times in one warm JVM so steal-prone-host
    // noise is visible as run-over-run variance
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
    (2 to repeat).foreach { r =>
      selected.foreach { case (name, fn) =>
        val t = runOnce(name, fn)
        System.err.println(f"[bench] warm run ${r - 1}: $name ${t}%.2fs")
      }
    }
    // deterministic order for stable round-over-round comparison
    val results = selected.map { case (name, fn) =>
      val t1 = runOnce(name, fn)
      // This host degrades episodically (documented: single-thread JVM
      // throughput collapses 30-100x for minutes at a time while the
      // host stays otherwise quiet). Min-of-two on outliers is standard
      // noise-robust benchmarking; the rerun is recorded in the JSON so
      // round-over-round compares can see it.
      val t = if (t1 > RerunThresholdSec && !failed.contains(name)) {
        reran += name
        math.min(t1, runOnce(name, fn))
      } else t1
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val reranJson = reran.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"reran":$reranJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
