package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, GenConfig, WideSchemaGenerator}
import graft.functions.VectorCentroid

/** Generator polymorphism (the trait the reference only stubs,
  * `main.rs:86-94`): the same pipeline + MOR reader must work for a
  * generator with timestamp / double / array<float> columns and a
  * single-column identifier, schema loaded from the committed
  * schema.json, equality keys inferred from the delete files.
  */
class GeneratorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("wide-schema generator: pipeline + MOR + time travel") {
    val root = Files.createTempDirectory("graft-wide-").toString
    val cfg = GenConfig("ns", "wide", FileConfig(50, 4),
      FileConfig(40, 1), FileConfig(60, 1))
    Pipeline.prepare(spark, root, cfg, WideSchemaGenerator)

    // schema round-trips through schema.json with exotic types
    // (names/types/nullability; DDL additionally assigns field ids)
    val schema = TableIO.readSchema(root, "ns", "wide")
    assert(schema.map(f => (f.name, f.dataType, f.nullable)) ==
      WideSchemaGenerator.schema.map(f => (f.name, f.dataType, f.nullable)))
    assert(schema.fields.forall(_.metadata.contains(TableIO.FieldIdKey)))

    // MOR: 200 - 40 - 60 = 100 surviving rows = ids [100, 200)
    val rows = Mor.read(spark, root, "ns", "wide").orderBy("id").collect()
    assert(rows.length == 100)
    assert(rows.head.getLong(0) == 100L && rows.last.getLong(0) == 199L)
    assert(rows.head.getString(1) == "row-100")
    assert(rows.head.getSeq[Float](4).length == 4)

    // time travel: v1 all 200, v2 minus pos deletes, v3 merged
    assert(Mor.readAt(spark, root, "ns", "wide", 1L).count() == 200L)
    assert(Mor.readAt(spark, root, "ns", "wide", 2L).count() == 160L)
    assert(Mor.readAt(spark, root, "ns", "wide", 3L).count() == 100L)
  }

  test("VectorCentroid aggregator computes exact per-label centroids") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1f, 2f)), (0, Seq(3f, 4f)), (1, Seq(10f, 20f)))
      .toDF("label", "embedding")
    val got = df.groupBy("label")
      .agg(udaf(VectorCentroid).apply(col("embedding")).as("centroid"))
      .orderBy("label").collect()
    assert(got(0).getSeq[Double](1) == Seq(2.0, 3.0))
    assert(got(1).getSeq[Double](1) == Seq(10.0, 20.0))
  }
}
