package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native port of the reference's fixed-schema generator
  * (`fix_schema_generator.rs`). All values are pure functions of the
  * global row number, so generation is a declarative `spark.range`
  * projection — no mutable cursor, no driver-side loops, and it
  * parallelizes across executors at any scale.
  *
  * Data schema (`fix_schema_generator.rs:34-43`):
  *   foo string !null  = global row number as string   (`:85-88`)
  *   bar int    !null  = global row number, identifier (`:90-93`, id field `:36`)
  *   baz bool   !null  = constant true                 (`:95-98`)
  */
object FixSchemaGen {

  /** Field-id + identifier-field metadata mirroring the Iceberg schema
    * (`fix_schema_generator.rs:34-43`): ids 1/2/3, identifier = [2].
    */
  val dataSchema: StructType = StructType(Seq(
    StructField("foo", StringType, nullable = false,
      new MetadataBuilder().putLong("field_id", 1L).build()),
    StructField("bar", IntegerType, nullable = false,
      new MetadataBuilder().putLong("field_id", 2L)
        .putBoolean("identifier", true).build()),
    StructField("baz", BooleanType, nullable = false,
      new MetadataBuilder().putLong("field_id", 3L).build())
  ))

  /** Position-delete schema (`main.rs:16-17,188`, POSITION_DELETE_SCHEMA). */
  val posDeleteSchema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)
  ))

  /** Relative path of the i-th data file under the table location.
    * Mirrors `DefaultFileNameGenerator` with prefix `i.to_string()`
    * (`main.rs:141-142`).
    */
  def dataFilePath(i: Int): String = f"data/part-$i%05d.parquet"
  def posDeleteFilePath(i: Int): String = f"deletes/pos_delete-$i%05d.parquet"
  def eqDeleteFilePath(i: Int): String = f"deletes/equality_delete-$i%05d.parquet"

  private def project(range: DataFrame): DataFrame = range.select(
    col("id").cast(StringType).as("foo"),
    col("id").cast(IntegerType).as("bar"),
    lit(true).as("baz")
  )

  /** One file's batch: rows `[i*rowsPerFile, (i+1)*rowsPerFile)` — the
    * `bias` arithmetic of `generate_data_per_file`
    * (`fix_schema_generator.rs:81-93`).
    */
  def dataFile(spark: SparkSession, fileNth: Int, rowsPerFile: Long): DataFrame =
    project(spark.range(fileNth * rowsPerFile, (fileNth + 1) * rowsPerFile).toDF())

  /** The whole table's data in one DataFrame (for single-job bulk writes
    * at scale — at 100 TB you write once with maxRecordsPerFile, not
    * one job per file).
    */
  def allData(spark: SparkSession, cfg: GenConfig): DataFrame =
    project(spark.range(0L, cfg.data.totalRows).toDF())

  /** All files' rows tagged with their file index, from ONE range —
    * `_file = id / rowsPerFile` (no per-file union branches).
    */
  def taggedData(spark: SparkSession, fileCount: Int,
      rowsPerFile: Long): DataFrame =
    spark.range(0L, fileCount * rowsPerFile).select(
      col("id").cast(StringType).as("foo"),
      col("id").cast(IntegerType).as("bar"),
      lit(true).as("baz"),
      expr(s"CAST(id DIV $rowsPerFile AS INT)").as("_file"))

  /** Positional deletes: the first `min(P, N)` physical rows of the table
    * in file order (`fix_schema_generator.rs:114-132`). Declarative form
    * of the row cursor (C2/C3): file = g / rowsPerFile, pos = g % rowsPerFile,
    * sorted by (file_path, pos) like `SortPositionDeleteWriter`
    * (`main.rs:194-199`).
    */
  def posDeletes(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val rpf = cfg.data.rowsPerFile
    spark.range(0L, cfg.actualPosDeletes).select(
      format_string("data/part-%05d.parquet", (col("id") / rpf).cast(IntegerType))
        .as("file_path"),
      (col("id") % rpf).as("pos")
    ).orderBy("file_path", "pos")
  }

  /** Equality deletes: keys of the next `min(E, N-P)` global rows after the
    * positional range, projected to the equality-id columns (foo, bar) —
    * field-ids [1,2] (`fix_schema_generator.rs:134-172`, `main.rs:242-252`).
    * Works because bar == global row number by construction.
    */
  def eqDeletes(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val start = cfg.actualPosDeletes
    spark.range(start, start + cfg.actualEqDeletes).select(
      col("id").cast(StringType).as("foo"),
      col("id").cast(IntegerType).as("bar")
    )
  }
}
