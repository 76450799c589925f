package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Maintenance, Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, GenConfig}

/** Compaction (MOR -> copy-on-write rewrite) and snapshot expiry. */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def prepared(): (String, GenConfig) = {
    val root = Files.createTempDirectory("graft-maint-").toString
    val cfg = GenConfig("ns", "t", FileConfig(50, 4),
      FileConfig(50, 1), FileConfig(50, 1))
    Pipeline.prepare(spark, root, cfg)
    (root, cfg)
  }

  test("compaction preserves the merged view and drops delete files") {
    val (root, _) = prepared()
    val before = Mor.read(spark, root, "ns", "t")
      .orderBy("bar").collect().map(_.toSeq)
    val v = Maintenance.compact(spark, root, "ns", "t")
    assert(v == 4L)
    val m = TableIO.readManifest(root, "ns", "t")
    assert(m.nonEmpty && m.forall(_.content == "data")) // no delete entries
    val after = Mor.read(spark, root, "ns", "t")
      .orderBy("bar").collect().map(_.toSeq)
    assert(after.sameElements(before))
    // pre-compaction time travel still works
    assert(Mor.readAt(spark, root, "ns", "t", 1L).count() == 200L)
    assert(Mor.readAt(spark, root, "ns", "t", 3L).count() == 100L)
  }

  test("expireSnapshots removes dead files, keeps the live view") {
    val (root, _) = prepared()
    Maintenance.compact(spark, root, "ns", "t")
    val removed = Maintenance.expireSnapshots(root, "ns", "t",
      keepFromVersion = 4L)
    // the original data + delete files are all dead after compaction
    assert(removed.nonEmpty)
    assert(removed.forall(p => !Files.exists(
      TableIO.tableDir(root, "ns", "t").resolve(p))))
    assert(Mor.read(spark, root, "ns", "t").count() == 100L)
    // expired version's manifest is gone
    assert(!Files.exists(Paths.get(root, "ns", "t", "manifest/v1.json")))
  }
}
