package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shared helpers for the oracle-facing query surface. */
object Util {

  /** Key used to spread a single-split fact scan across cores. The
    * test tables are single-file single-row-group parquet, so Spark
    * plans ONE input task regardless of maxPartitionBytes (byte-range
    * splits can't cross a row group); every per-row cost downstream
    * then runs on one core until the first exchange. At production
    * scale the fact tables arrive as many files/row groups and this
    * exchange disappears — it corrects the local input layout, not the
    * operator. Filters/pruning still push through the repartition to
    * the scan (PushDownPredicates handles RepartitionByExpression).
    * Dimension tables stay unrepartitioned (broadcast sides).
    */
  private val factKeys = Map(
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey")

  def rd(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    factKeys.get(table) match {
      case Some(k) => df.repartition(org.apache.spark.sql.functions.col(k))
      case None => df
    }
  }

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
      // single-file single-row-group input: spread the scan (see rd)
      .repartition(org.apache.spark.sql.functions.col("event_id"))
  }

  /** Exact money arithmetic: aggregate in DECIMAL (order-independent),
    * publish as DOUBLE (identical IEEE value + schema in Spark and
    * DuckDB, immune to decimal-precision differences between engines).
    */
  def dec(c: Column, scale: Int = 2): Column = c.cast(s"decimal(18,$scale)")
}
