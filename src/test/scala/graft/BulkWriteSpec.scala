package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, GenConfig}

/** The bulk (single-job) phase-1 write path must produce files with
  * exactly the same content and manifest as the per-file path.
  */
class BulkWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bulk data write equals per-file write") {
    val cfg = GenConfig("ns", "t", FileConfig(100, 4),
      FileConfig(0, 0), FileConfig(0, 0))
    val rootA = Files.createTempDirectory("graft-bulk-a-").toString
    val rootB = Files.createTempDirectory("graft-bulk-b-").toString
    Pipeline.prepare(spark, rootA, cfg)
    Pipeline.prepareBulkData(spark, rootB, cfg)

    assert(TableIO.readManifest(rootA, "ns", "t") ==
      TableIO.readManifest(rootB, "ns", "t"))

    // identical per-file contents (path + row index + values)
    def snapshot(root: String) =
      Mor.scanWithProvenance(spark, root, "ns", "t")
        .select("_file", "_pos", "foo", "bar", "baz")
        .collect().map(_.toSeq).sortBy(_.toString)
    assert(snapshot(rootA).sameElements(snapshot(rootB)))
  }
}
