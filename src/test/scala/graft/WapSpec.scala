package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{Mor, Pipeline, TableIO, Wap}
import graft.sources.{FixSchemaGen, GenConfig}

/** Write-audit-publish: staged commits invisible to main, auditable
  * via the tagged version, published or rejected as pure metadata.
  */
class WapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stage hides commits from main; publish fast-forwards; reject discards") {
    val cfg = GenConfig.reference.copy(tableName = "wap_spec")
    val root = java.nio.file.Files.createTempDirectory("graft-wap-").toString
    Pipeline.prepare(spark, root, cfg)
    val (ns, t) = (cfg.namespace, cfg.tableName)
    val n0 = Mor.read(spark, root, ns, t).count()
    val rpf = cfg.data.rowsPerFile

    def appendFile(i: Int): Unit = {
      val df = spark.range(i * rpf, (i + 1) * rpf).select(
        col("id").cast("string").as("foo"), col("id").cast("int").as("bar"),
        lit(true).as("baz"))
      TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root,
        ns, t, FixSchemaGen.dataFilePath(i), df, "data",
        TableIO.nextSeq(root, ns, t), recordCount = rpf)))
    }

    val staged = Wap.stage(root, ns, t) { appendFile(5) }
    // main unchanged; audit view has the extra rows via tag and version
    assert(Mor.read(spark, root, ns, t).count() == n0)
    assert(Mor.readRef(spark, root, ns, t, s"audit-v$staged").count() == n0 + rpf)
    assert(Mor.readAt(spark, root, ns, t, staged).count() == n0 + rpf)

    Wap.publish(root, ns, t, staged)
    assert(Mor.read(spark, root, ns, t).count() == n0 + rpf)
    assert(TableIO.readRefs(root, ns, t).isEmpty)

    // a rejected staging leaves main at the published state
    val n1 = Mor.read(spark, root, ns, t).count()
    val staged2 = Wap.stage(root, ns, t) { appendFile(6) }
    Wap.reject(root, ns, t, staged2)
    assert(Mor.read(spark, root, ns, t).count() == n1)
    assert(TableIO.readRefs(root, ns, t).isEmpty)

    // an empty stage body is an error
    intercept[IllegalArgumentException] { Wap.stage(root, ns, t) {} }
  }
}
