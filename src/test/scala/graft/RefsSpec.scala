package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Mor, Pipeline, TableIO}
import graft.sources.GenConfig

/** Named refs (Iceberg branches/tags) + rollback_to_snapshot: pointer
  * moves over the versioned manifests — metadata-only, history
  * preserving, tags immutable.
  */
class RefsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(name: String): (String, String, String) = {
    val cfg = GenConfig.reference.copy(tableName = name)
    val root = java.nio.file.Files.createTempDirectory("graft-refs-").toString
    Pipeline.prepare(spark, root, cfg)
    (root, cfg.namespace, cfg.tableName)
  }

  test("tags pin snapshots; branches advance; tags cannot be re-pointed") {
    val (root, ns, t) = freshTable("refs_spec")
    val N = GenConfig.reference.data.totalRows
    val P = GenConfig.reference.actualPosDeletes
    val E = GenConfig.reference.actualEqDeletes

    TableIO.setRef(root, ns, t, "after_data", "tag", 1L)
    TableIO.setRef(root, ns, t, "dev", "branch", 2L)
    assert(Mor.readRef(spark, root, ns, t, "after_data").count() == N)
    assert(Mor.readRef(spark, root, ns, t, "dev").count() == N - P)

    // branch advances; tag re-point rejected; tag->branch flip rejected
    TableIO.setRef(root, ns, t, "dev", "branch", 3L)
    assert(Mor.readRef(spark, root, ns, t, "dev").count() == N - P - E)
    intercept[IllegalArgumentException] {
      TableIO.setRef(root, ns, t, "after_data", "tag", 2L)
    }
    intercept[IllegalArgumentException] {
      TableIO.setRef(root, ns, t, "after_data", "branch", 2L)
    }
    // refs to unknown versions rejected; unknown ref read throws
    intercept[IllegalArgumentException] {
      TableIO.setRef(root, ns, t, "future", "tag", 99L)
    }
    intercept[NoSuchElementException] {
      Mor.readRef(spark, root, ns, t, "nope")
    }

    TableIO.dropRef(root, ns, t, "dev")
    assert(TableIO.readRefs(root, ns, t).keySet == Set("after_data"))
  }

  test("rollback publishes a new version equal to the target; history survives") {
    val (root, ns, t) = freshTable("rollback_spec")
    val N = GenConfig.reference.data.totalRows
    val P = GenConfig.reference.actualPosDeletes
    val E = GenConfig.reference.actualEqDeletes

    assert(TableIO.currentVersion(root, ns, t) == 3L)
    val v = TableIO.rollback(root, ns, t, 1L)
    assert(v == 4L && TableIO.currentVersion(root, ns, t) == 4L)
    // current view = the data-only snapshot; prior versions still readable
    assert(Mor.read(spark, root, ns, t).count() == N)
    assert(Mor.readAt(spark, root, ns, t, 3L).count() == N - P - E)
    assert(TableIO.readManifestAt(root, ns, t, 4L) ==
      TableIO.readManifestAt(root, ns, t, 1L))
    // snapshots table: rollback shows as an overwrite (files left)
    val snaps = TableIO.snapshotsDf(spark, root, ns, t)
      .orderBy("version").collect()
    assert(snaps.map(_.getString(1)).toSeq ==
      Seq("append", "append", "append", "overwrite"))
    intercept[IllegalArgumentException] { TableIO.rollback(root, ns, t, 99L) }
  }
}
