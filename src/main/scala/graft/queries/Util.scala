package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shared helpers for the oracle-facing query surface. */
object Util {
  def rd(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects; read it as a nanos long and convert to a microsecond
    * timestamp with integer division (ns values exceed 2^53, so
    * float division would lose precision).
    */
  def rdEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Exact money arithmetic: aggregate in DECIMAL (order-independent),
    * publish as DOUBLE (identical IEEE value + schema in Spark and
    * DuckDB, immune to decimal-precision differences between engines).
    */
  def dec(c: Column, scale: Int = 2): Column = c.cast(s"decimal(18,$scale)")
}
