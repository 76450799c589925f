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

  test("rewritePositionDeletes consolidates, dedupes, and preserves gates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (root, cfg) = prepared() // 200 rows, 50 pos-deletes, 50 eq-deletes
    val (ns, t) = ("ns", "t")
    // post-delete append (seq 4): rows [200, 250)
    val df5 = spark.range(200, 250).select(
      col("id").cast("string").as("foo"), col("id").cast("int").as("bar"),
      lit(true).as("baz"))
    TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root, ns, t,
      graft.sources.FixSchemaGen.dataFilePath(4), df5, "data",
      TableIO.nextSeq(root, ns, t), recordCount = 50)))
    // late pos-delete (seq 5): first 10 rows of the appended file PLUS
    // 5 duplicate targets already deleted at seq 2
    val late = spark.range(0, 10).select(
        lit(graft.sources.FixSchemaGen.dataFilePath(4)).as("file_path"),
        col("id").as("pos"))
      .union(spark.range(0, 5).select(
        lit(graft.sources.FixSchemaGen.dataFilePath(0)).as("file_path"),
        col("id").as("pos")))
    TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root, ns, t,
      "deletes/pos_delete-late.parquet", late, "pos_delete",
      TableIO.nextSeq(root, ns, t), recordCount = 15)))

    val before = Mor.read(spark, root, ns, t).orderBy("bar").collect().map(_.toSeq)
    assert(before.length == 100 + 40) // (200-50-50) + (50-10)
    val v = Maintenance.rewritePositionDeletes(spark, root, ns, t)
    assert(v == 6L && TableIO.currentVersion(root, ns, t) == 6L)

    // merged view byte-identical; duplicate targets collapsed (65 -> 60
    // rows: the 5 re-deleted positions keep only their max seq); one
    // consolidated file per original seq, committed at that seq
    val after = Mor.read(spark, root, ns, t).orderBy("bar").collect().map(_.toSeq)
    assert(after.sameElements(before))
    val pos = TableIO.readManifest(root, ns, t).filter(_.content == "pos_delete")
    assert(pos.map(_.seq).sorted == Seq(2L, 5L))
    assert(pos.map(_.recordCount).sum == 60L)
    assert(pos.find(_.seq == 5L).get.recordCount == 15L) // 10 new + 5 dup moved up
    // time travel behind the rewrite unchanged
    assert(Mor.readAt(spark, root, ns, t, 3L).count() == 100L)

    // after compaction every pos-delete row is dangling: rewrite purges
    // them all and the manifest carries zero pos-delete files
    Maintenance.compact(spark, root, ns, t)
    assert(Maintenance.rewritePositionDeletes(spark, root, ns, t) ==
      TableIO.currentVersion(root, ns, t))
    assert(TableIO.readManifest(root, ns, t).forall(_.content == "data"))
  }

  test("compactSmall merges within seq groups; gating and view unchanged") {
    import org.apache.spark.sql.functions._
    val (root, cfg) = prepared() // 4 files x 50 rows seq1; 50 pos, 50 eq
    val (ns, t) = ("ns", "t")
    // a later small append at its own seq
    val seq4 = TableIO.nextSeq(root, ns, t)
    val extra = (4 to 5).map { i =>
      val df = spark.range(i * 50L, (i + 1) * 50L).select(
        col("id").cast("string").as("foo"), col("id").cast("int").as("bar"),
        lit(true).as("baz"))
      TableIO.writeExactFile(spark, root, ns, t,
        graft.sources.FixSchemaGen.dataFilePath(i), df, "data", seq4,
        recordCount = 50L)
    }
    TableIO.commit(root, ns, t, extra)

    val before = Mor.read(spark, root, ns, t).orderBy("bar").collect().map(_.toSeq)
    assert(before.length == 100 + 100) // (200-50-50) + 100 appended
    Maintenance.compactSmall(spark, root, ns, t)

    val m = TableIO.readManifest(root, ns, t)
    val dataE = m.filter(_.content == "data")
    // one merged file per seq group, seqs preserved; pos-deletes purged
    assert(dataE.size == 2 && dataE.map(_.seq).sorted == Seq(1L, seq4))
    assert(m.count(_.content == "pos_delete") == 0)
    assert(m.count(_.content == "eq_delete") == 1) // still present, gate intact
    val after = Mor.read(spark, root, ns, t).orderBy("bar").collect().map(_.toSeq)
    assert(after.sameElements(before))
    // history: pre-binpack versions still read correctly
    assert(Mor.readAt(spark, root, ns, t, 3L).count() == 100L)
    // idempotent: a second pass has nothing to merge
    val v = TableIO.currentVersion(root, ns, t)
    assert(Maintenance.compactSmall(spark, root, ns, t) == v)
  }

  test("row lineage survives compaction and binpack (materialized ids " +
      "win over firstRowId inheritance)") {
    import org.apache.spark.sql.functions._
    val (root, _) = prepared() // 200 rows, 50 pos + 50 eq deletes
    def lineage(): Map[Int, Long] = Mor.readLineage(spark, root, "ns", "t")
      .select("bar", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val before = lineage()
    assert(before.size == 100 && before.values.toSet.size == 100)
    Maintenance.compact(spark, root, "ns", "t")
    assert(lineage() == before, "compaction changed row ids")
    // a post-compaction append continues the id space monotonically —
    // never reuses an id, even though the compacted entries were
    // re-stamped with fresh (unused) firstRowIds
    val highWater = before.values.max
    val df = spark.range(900, 920).select(
      col("id").cast("string").as("foo"), col("id").cast("int").as("bar"),
      lit(true).as("baz"))
    TableIO.commit(root, "ns", "t", Seq(TableIO.writeExactFile(spark, root,
      "ns", "t", graft.sources.FixSchemaGen.dataFilePath(7), df, "data",
      TableIO.nextSeq(root, "ns", "t"), recordCount = 20L)))
    val appended = lineage()
    assert(before.forall { case (k, v) => appended(k) == v })
    val newIds = appended.filterNot(kv => before.contains(kv._1)).values
    assert(newIds.size == 20 && newIds.forall(_ > highWater))
    // binpack (small-file merge) preserves ids the same way
    Maintenance.compactSmall(spark, root, "ns", "t")
    assert(lineage() == appended, "binpack changed row ids")
  }

  test("removeOrphanFiles deletes only never-committed debris") {
    val (root, _) = prepared()
    val dir = TableIO.tableDir(root, "ns", "t")
    // orphan debris: a stray data file and a stray delete file
    Files.write(dir.resolve("data/part-99999.parquet"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("deletes/pos_delete-stray.parquet"), Array[Byte](4))
    val nBefore = Mor.read(spark, root, "ns", "t").count()

    val removed = Maintenance.removeOrphanFiles(root, "ns", "t")
    assert(removed == Seq("data/part-99999.parquet",
      "deletes/pos_delete-stray.parquet"))
    assert(!Files.exists(dir.resolve("data/part-99999.parquet")))
    // every referenced file (current AND historical) survives; reads and
    // time travel are untouched
    assert(Mor.read(spark, root, "ns", "t").count() == nBefore)
    assert(Mor.readAt(spark, root, "ns", "t", 1L).count() == 200L)
    // idempotent: second pass removes nothing
    assert(Maintenance.removeOrphanFiles(root, "ns", "t").isEmpty)
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
