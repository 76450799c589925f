package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV / JSON source-format parity (SURVEY.md §2.6 sources & sinks
  * beyond parquet): write a table out in the text format, read it back
  * with the original schema, and hand the result to a query. The oracle
  * runs the same query over the untouched parquet, so a hash match
  * proves the format round-trip is LOSSLESS for every value the table
  * holds — types (longs, doubles, timestamps), quoting/escaping
  * (commas, quotes, newlines, unicode in free text), and nulls.
  *
  * Scale shape: the writers/readers are Spark's own distributed text
  * sources — per-partition split files, schema supplied explicitly (no
  * inference pass over 100 TB), pushdown-friendly. The round-trip
  * directory is memoized per (format, sf dir) so a query re-run reuses
  * the one write job.
  */
object FormatRoundtrip {
  private val cache = scala.collection.concurrent.TrieMap[String, String]()

  /** `orders` through CSV: headered, default quoting; timestamps carry
    * sub-second precision through the default ISO format.
    */
  def csvOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/orders.parquet").schema
    val out = cache.getOrElseUpdate("csv#" + sfDir, {
      val dir = Files.createTempDirectory("graft-csv-").toString
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.mode("overwrite").option("header", "true").csv(s"$dir/orders")
      dir
    })
    spark.read.schema(schema).option("header", "true").csv(s"$out/orders")
  }

  /** `lineitem` through ORC — the other columnar format Spark ships
    * natively: doubles, strings, millisecond timestamps through ORC's
    * own encoders/statistics instead of parquet's.
    */
  def orcLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
    val out = cache.getOrElseUpdate("orc#" + sfDir, {
      val dir = Files.createTempDirectory("graft-orc-").toString
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.mode("overwrite").orc(s"$dir/lineitem")
      dir
    })
    spark.read.schema(schema).orc(s"$out/lineitem")
  }

  /** `documents` through JSON lines: free text with newlines, quotes and
    * unicode must survive the escape/unescape cycle.
    */
  def jsonDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val out = cache.getOrElseUpdate("json#" + sfDir, {
      val dir = Files.createTempDirectory("graft-json-").toString
      spark.read.parquet(s"$sfDir/documents.parquet")
        .write.mode("overwrite").json(s"$dir/documents")
      dir
    })
    spark.read.schema(schema).json(s"$out/documents")
  }

  /** `events` through a Hive-layout partitioned directory
    * (`event_type=<v>/part-*.parquet`): the classic warehouse ingest
    * shape — partition values live in directory names, discovered at
    * read time, and a filter on the partition column prunes whole
    * directories before any file opens (PartitioningSpec asserts the
    * scanned files). The write is one shuffle-free partitionBy job.
    */
  def hivePartitionedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val out = cache.getOrElseUpdate("hive#" + sfDir, {
      val dir = Files.createTempDirectory("graft-hive-").toString
      graft.queries.Util.rdEvents(spark, sfDir)
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(s"$dir/events")
      dir
    })
    spark.read.parquet(s"$out/events")
  }
}
