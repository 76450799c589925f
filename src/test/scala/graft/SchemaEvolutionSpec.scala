package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}
import graft.plans.{Mor, Pipeline, TableIO}
import graft.sources.{FixSchemaGen, GenConfig}

/** Iceberg-style add-column schema evolution: widen the schema without
  * rewriting any existing file; evolved-schema scans fill the new
  * column with null for pre-evolution files (schema-on-read).
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("add-column evolves reads without rewriting old files") {
    val cfg = GenConfig.reference.copy(tableName = "evolve_spec")
    val root = java.nio.file.Files.createTempDirectory("graft-evolve-").toString
    val (ns, t) = (cfg.namespace, cfg.tableName)
    Pipeline.prepare(spark, root, cfg)
    val before = TableIO.filesOf(root, ns, t, "data")
      .map(f => (f._1, java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f._1))))

    TableIO.addColumn(root, ns, t, StructField("qux", LongType, nullable = true))
    val rpf = cfg.data.rowsPerFile
    val df6 = spark.range(5L * rpf, 6L * rpf).select(
      col("id").cast("string").as("foo"), col("id").cast("int").as("bar"),
      lit(true).as("baz"), (col("id") * 2).as("qux"))
    val seq = TableIO.nextSeq(root, ns, t)
    TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root, ns, t,
      FixSchemaGen.dataFilePath(5), df6, "data", seq, recordCount = rpf)))

    val merged = Mor.read(spark, root, ns, t).cache()
    // survivors 4000..4999 from old files (qux null) + 5000..5999 new
    assert(merged.count() == 2 * rpf)
    assert(merged.filter(col("qux").isNull).count() == rpf)
    assert(merged.filter(col("qux") === col("bar") * 2).count() == rpf)
    // old files untouched on disk (no rewrite)
    before.foreach { case (p, mtime) =>
      assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(p)) == mtime, s"file rewritten: $p")
    }
    merged.unpersist()

    // guard rails: non-nullable and duplicate adds are rejected
    intercept[IllegalArgumentException] {
      TableIO.addColumn(root, ns, t,
        StructField("nn", LongType, nullable = false))
    }
    intercept[IllegalArgumentException] {
      TableIO.addColumn(root, ns, t,
        StructField("qux", LongType, nullable = true))
    }
  }

  test("type promotion widens in metadata only; illegal promotions rejected") {
    import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType,
      StringType}
    val cfg = GenConfig.reference.copy(tableName = "widen_spec")
    val root = java.nio.file.Files.createTempDirectory("graft-widen-").toString
    val (ns, t) = (cfg.namespace, cfg.tableName)
    Pipeline.prepare(spark, root, cfg)
    val mtimes = TableIO.filesOf(root, ns, t, "data")
      .map(f => (f._1, java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f._1))))

    // float->double promotion needs a float column first
    TableIO.addColumn(root, ns, t,
      StructField("w", FloatType, nullable = true))
    TableIO.widenColumn(root, ns, t, "bar", LongType)
    TableIO.widenColumn(root, ns, t, "w", DoubleType)
    val sch = TableIO.readSchema(root, ns, t)
    assert(sch("bar").dataType == LongType)
    assert(sch("w").dataType == DoubleType)
    // field id preserved across promotion (rename/drop still resolve)
    assert(sch("bar").metadata.getLong(TableIO.FieldIdKey) == 2L)

    // the evolved scan upcasts old INT32 files; eq-deletes (bar int32,
    // seq 3) still erase their keys from the widened column
    val merged = Mor.read(spark, root, ns, t)
    assert(merged.schema("bar").dataType == LongType)
    assert(merged.count() == cfg.expectedSurvivingRows)
    assert(merged.agg(min(col("bar"))).head.getLong(0) ==
      (cfg.actualPosDeletes + cfg.actualEqDeletes).toLong)

    // metadata-only: no data file rewritten
    mtimes.foreach { case (p, mtime) =>
      assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(p)) == mtime, s"file rewritten: $p")
    }

    // narrowing and cross-kind promotions are rejected
    intercept[IllegalArgumentException] {
      TableIO.widenColumn(root, ns, t, "bar", IntegerType)
    }
    intercept[IllegalArgumentException] {
      TableIO.widenColumn(root, ns, t, "foo", DoubleType)
    }
    intercept[IllegalArgumentException] {
      TableIO.widenColumn(root, ns, t, "bar", StringType)
    }
    intercept[IllegalArgumentException] {
      TableIO.widenColumn(root, ns, t, "absent", LongType)
    }
  }
}
