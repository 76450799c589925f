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

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark reads only as a nanos long under the legacy flag — and
    * TIMESTAMP(MICROS), which Spark 4 reads as TIMESTAMP_NTZ. The
    * reader adapts to whichever physical type the file carries so a
    * regenerated dataset can't silently break every events query:
    * a long column gets integer-division nanos→micros conversion (ns
    * values exceed 2^53, so float division would lose precision); a
    * timestamp column is used as-is, cast to session-TZ TIMESTAMP
    * (value-preserving under the session-UTC convention).
    */
  def rdEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(spark.read.parquet(s"$sfDir/events.parquet"))
      // single-file single-row-group input: spread the scan (see rd)
      .repartition(org.apache.spark.sql.functions.col("event_id"))
  }

  /** Rewrite `ts` to session-TZ TIMESTAMP regardless of the physical
    * type it was read as (nanos-long or TIMESTAMP_NTZ/TIMESTAMP).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    val tsCol = df.schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts div 1000)")
      case _        => col("ts").cast("timestamp")
    }
    df.withColumn("ts", tsCol)
  }

  /** The embeddings table with `embedding` guaranteed `array<float>` —
    * the type the ANN family's codegen expressions (DotF32) and
    * sign-LSH keys assume. The driver regenerates testdata between
    * rounds (events.ts changed physical type in r7); if `embedding`
    * ever arrives as array<double> (e.g. a generator switch), this
    * cast keeps the ann, dedup_embedding, and emb query families
    * alive instead of failing analysis. A no-op cast is pruned by Catalyst
    * when the type already matches.
    */
  def rdEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val df = rd(spark, sfDir, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case other =>
        // LOUD adaptivity (ADVICE r8): a double→float cast is lossy
        // while the DuckDB oracle computes on the file's own type — an
        // unannounced cast could turn an analysis-time failure into a
        // subtle hash divergence that costs a re-investigation. The
        // fixture guard spec pins the expected type; this flag makes a
        // drift diagnosable from any run's stderr.
        System.err.println(s"[graft] WARNING embeddings.embedding arrived " +
          s"as $other, casting to array<float>; oracle comparisons may " +
          "diverge on precision — check the testdata generation")
        df.withColumn("embedding",
          col("embedding").cast(ArrayType(FloatType)))
    }
  }

  /** Exact money arithmetic: aggregate in DECIMAL (order-independent),
    * publish as DOUBLE (identical IEEE value + schema in Spark and
    * DuckDB, immune to decimal-precision differences between engines).
    */
  def dec(c: Column, scale: Int = 2): Column = c.cast(s"decimal(18,$scale)")
}
