package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's pluggable source interface — Spark-native mirror of the
  * reference's only extension point, `trait DataGenerator`
  * (`main.rs:86-94`: `schema()`, `generate_data_per_file`,
  * `generate_pos_delete_per_file`, `generate_equality_delete_per_file`,
  * `equality_delete_ids`, `register_data_file`).
  *
  * Differences, deliberately: per-file generation is a pure function of
  * the file index (no `&mut self` cursor — all values derive from the
  * global row number), and `register_data_file` disappears because the
  * manifest layer owns file state (SURVEY.md C1/C2). Implementations
  * must be deterministic: same config => same bytes.
  */
trait DataGenerator {
  /** Target table schema (field ids / identifier columns in metadata). */
  def schema: StructType

  /** Names of the equality-delete (identifier) columns — the projection
    * the eq-delete writer applies (`equality_delete_ids`,
    * `fix_schema_generator.rs:134-136`).
    */
  def equalityDeleteCols: Seq[String]

  /** Rows of the i-th data file. */
  def dataFile(spark: SparkSession, fileNth: Int, rowsPerFile: Long): DataFrame

  /** The global positional-delete set (file_path, pos), sorted. */
  def posDeletes(spark: SparkSession, cfg: GenConfig): DataFrame

  /** Equality-delete keys (identifier columns only) for global rows
    * [globalLo, globalHi) — the declarative form of the reference's
    * cursor walk (`fix_schema_generator.rs:138-172`).
    */
  def eqDeleteKeys(spark: SparkSession, globalLo: Long, globalHi: Long): DataFrame

  /** Every file's rows in ONE DataFrame, tagged with the owning file
    * index as `_file` — the input of the single-job bulk write. The
    * default unions per-file batches, which is generic but costs
    * O(fileCount) plan nodes; pure-function generators override it with
    * a single `range` derivation (`_file = id / rowsPerFile`) so a
    * 100k-file config doesn't pay a 100k-node plan.
    */
  def taggedData(spark: SparkSession, fileCount: Int,
      rowsPerFile: Long): DataFrame =
    (0 until fileCount).map { i =>
      dataFile(spark, i, rowsPerFile).withColumn("_file", lit(i))
    }.reduce(_ unionByName _)

  /** Closed-form per-column [min, max] of the i-th data file's long-keyed
    * columns — written into the manifest as Iceberg-style bounds for
    * scan-time file skipping. Pure-function generators know these without
    * a job; default none (files without bounds are never pruned).
    */
  def fileBounds(fileNth: Int, rowsPerFile: Long): Map[String, (Long, Long)] =
    Map.empty
}

/** The reference's fixed-schema generator as a DataGenerator instance. */
object FixSchemaGenerator extends DataGenerator {
  def schema: StructType = FixSchemaGen.dataSchema
  def equalityDeleteCols: Seq[String] = Seq("foo", "bar")
  def dataFile(spark: SparkSession, fileNth: Int, rowsPerFile: Long): DataFrame =
    FixSchemaGen.dataFile(spark, fileNth, rowsPerFile)
  def posDeletes(spark: SparkSession, cfg: GenConfig): DataFrame =
    FixSchemaGen.posDeletes(spark, cfg)
  def eqDeleteKeys(spark: SparkSession, lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      col("id").cast(StringType).as("foo"),
      col("id").cast(IntegerType).as("bar"))
  override def taggedData(spark: SparkSession, fileCount: Int,
      rowsPerFile: Long): DataFrame =
    FixSchemaGen.taggedData(spark, fileCount, rowsPerFile)
  // bar == global row number: file i spans [i*rpf, (i+1)*rpf - 1]
  override def fileBounds(fileNth: Int,
      rowsPerFile: Long): Map[String, (Long, Long)] =
    Map("bar" -> (fileNth * rowsPerFile, (fileNth + 1) * rowsPerFile - 1))
}

/** A second generator proving the trait is schema-polymorphic (the
  * reference has only the fixed impl — `fix_schema_generator.rs` "says
  * as much"): wide schema with timestamp / double / array<float>
  * columns, matching the type surface the testdata exercises
  * (FIXTURES.md note in SURVEY.md §1.2). Every value remains a pure
  * function of the global row number.
  */
object WideSchemaGenerator extends DataGenerator {
  def schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false),
      nullable = false)
  ))
  def equalityDeleteCols: Seq[String] = Seq("id")

  private def project(range: DataFrame): DataFrame = range.select(
    col("id"),
    concat(lit("row-"), col("id")).as("name"),
    expr("timestamp_micros(1704067200000000 + id * 1000000)").as("ts"),
    (col("id") % 97 / lit(97.0)).as("score"),
    transform(sequence(lit(0), lit(3)),
      i => ((col("id") + i) % 11).cast("float")).as("vec")
  )

  def dataFile(spark: SparkSession, fileNth: Int, rowsPerFile: Long): DataFrame =
    project(spark.range(fileNth * rowsPerFile, (fileNth + 1) * rowsPerFile).toDF())

  def posDeletes(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val rpf = cfg.data.rowsPerFile
    spark.range(0L, cfg.actualPosDeletes).select(
      format_string("data/part-%05d.parquet", (col("id") / rpf).cast("int"))
        .as("file_path"),
      (col("id") % rpf).as("pos")
    ).orderBy("file_path", "pos")
  }

  def eqDeleteKeys(spark: SparkSession, lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id"))

  override def taggedData(spark: SparkSession, fileCount: Int,
      rowsPerFile: Long): DataFrame =
    project(spark.range(0L, fileCount * rowsPerFile).toDF())
      .withColumn("_file", expr(s"CAST(id DIV $rowsPerFile AS INT)"))
}
