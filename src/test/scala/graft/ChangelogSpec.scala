package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{Mor, Pipeline, TableIO}
import graft.sources.{FixSchemaGen, GenConfig}

/** CDC changelog scan: per-commit inserts/deletes, no re-emission of
  * already-dead rows, physical dedupe when one row is hit by several
  * new delete files, silence on content-preserving rewrite snapshots,
  * and LOUD failure crossing a rollback (content changed, but not
  * append-derivably — a silent skip would let consumers diverge).
  */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cfgRef = GenConfig.reference
  private val N = cfgRef.data.totalRows
  private val P = cfgRef.actualPosDeletes
  private val E = cfgRef.actualEqDeletes

  test("changelog replays the reference pipeline's three commits") {
    val cfg = cfgRef.copy(tableName = "changes_spec")
    val root = java.nio.file.Files.createTempDirectory("graft-cdc-").toString
    Pipeline.prepare(spark, root, cfg)
    val (ns, t) = (cfg.namespace, cfg.tableName)

    val byStep = Mor.readChanges(spark, root, ns, t, 0L, 3L)
      .groupBy("_change_version", "_change_type").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byStep == Map((1, "insert") -> N, (2, "delete") -> P,
      (3, "delete") -> E))

    // an append AFTER the deletes emits only inserts
    val rpf = cfg.data.rowsPerFile
    val df6 = spark.range(5L * rpf, 6L * rpf).select(
      col("id").cast("string").as("foo"), col("id").cast("int").as("bar"),
      lit(true).as("baz"))
    TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root, ns, t,
      FixSchemaGen.dataFilePath(5), df6, "data",
      TableIO.nextSeq(root, ns, t), recordCount = rpf)))
    val step4 = Mor.readChanges(spark, root, ns, t, 3L, 4L)
    assert(step4.filter(col("_change_type") === "insert").count() == rpf)
    assert(step4.filter(col("_change_type") === "delete").count() == 0)

    // a ROLLBACK changes content non-append-derivably: any changelog
    // range crossing it fails loudly (a silent empty batch would let a
    // CDC consumer diverge forever); ranges strictly past it work again
    TableIO.rollback(root, ns, t, 1L)
    val ex = intercept[IllegalStateException] {
      Mor.readChanges(spark, root, ns, t, 4L, 5L)
    }
    assert(ex.getMessage.contains("rollback"))
    val df7 = spark.range(6L * rpf, 6L * rpf + 7).select(
      col("id").cast("string").as("foo"), col("id").cast("int").as("bar"),
      lit(true).as("baz"))
    TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root, ns, t,
      FixSchemaGen.dataFilePath(6), df7, "data",
      TableIO.nextSeq(root, ns, t), recordCount = 7)))
    val past = Mor.readChanges(spark, root, ns, t, 5L, 6L)
    assert(past.filter(col("_change_type") === "insert").count() == 7)
  }

  test("changelog fails loudly crossing the expiry horizon, works past it") {
    // readManifestAt reads a MISSING manifest as empty — fine for v0,
    // catastrophic for an expired base: prev would read empty and the
    // whole snapshot would be re-emitted as fabricated inserts to any
    // consumer whose checkpoint fell behind expireSnapshots. Pin the
    // loud-failure contract instead.
    val cfg = cfgRef.copy(tableName = "cdc_expire")
    val root = java.nio.file.Files.createTempDirectory("graft-cdcexp-").toString
    val (ns, t) = (cfg.namespace, cfg.tableName)
    Pipeline.prepare(spark, root, cfg) // v1 data, v2 pos-del, v3 eq-del
    graft.plans.Maintenance.expireSnapshots(root, ns, t, keepFromVersion = 2L)
    val ex = intercept[IllegalStateException] {
      Mor.readChanges(spark, root, ns, t, 0L, 3L)
    }
    assert(ex.getMessage.contains("expired"))
    // a range whose base AND steps are retained still works
    val ok = Mor.readChanges(spark, root, ns, t, 2L, 3L)
    assert(ok.filter(col("_change_type") === "delete").count() == E)
    // and a range beyond the table's history is rejected, not empty
    intercept[IllegalArgumentException] {
      Mor.readChanges(spark, root, ns, t, 3L, 9L)
    }
  }

  test("change feed: checkpointed offsets, at-least-once on failure") {
    import graft.plans.ChangeFeed
    val cfg = cfgRef.copy(tableName = "feed_spec")
    val root = java.nio.file.Files.createTempDirectory("graft-feed-").toString
    val (ns, t) = (cfg.namespace, cfg.tableName)
    val ckpt = java.nio.file.Paths.get(root, "feed.offset")
    // phase 1 only: data commit
    Pipeline.prepareData(spark, root, cfg)
    val seen = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    def drain(): Unit = {
      ChangeFeed.processAvailable(spark, root, ns, t, ckpt) { df =>
        seen ++= df.groupBy("_change_type").count().collect()
          .map(r => (r.getString(0), r.getLong(1)))
      }
    }
    drain()
    assert(seen.toSeq == Seq(("insert", N)))
    // nothing new: callback must not fire
    seen.clear(); drain()
    assert(seen.isEmpty && ChangeFeed.offsetOf(ckpt) == 1L)
    // the delete phases arrive; a FAILING callback must not advance
    Pipeline.prepareDeletes(spark, root, cfg)
    intercept[RuntimeException] {
      ChangeFeed.processAvailable(spark, root, ns, t, ckpt) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    assert(ChangeFeed.offsetOf(ckpt) == 1L) // unchanged -> replay
    drain()
    assert(seen.sortBy(_._1).toSeq == Seq(("delete", P + E)))
    assert(ChangeFeed.offsetOf(ckpt) == 3L)
  }

  // --- replace-shaped commits: content-preserving vs content-changing ---

  /** 5 files x 1000 rows with per-file `bar` bounds — the DmlSpec
    * fixture: deleteWhere can drop fully-covered files as pure
    * metadata, the exact commits the pre-marker changelog swallowed.
    */
  private def boundedTable(prefix: String): (String, String, String) = {
    val root = java.nio.file.Files.createTempDirectory(prefix).toString
    def fileDf(i: Int) = spark.range(i * 1000L, (i + 1) * 1000L).select(
      col("id").cast("string").as("foo"),
      col("id").cast("int").as("bar"), lit(true).as("baz"))
    TableIO.createNamespace(root, "ns")
    TableIO.createTableIfNotExists(root, "ns", "t", fileDf(0).schema)
    TableIO.commit(root, "ns", "t", (0 until 5).map { i =>
      TableIO.writeExactFile(spark, root, "ns", "t",
        f"data/part-$i%05d.parquet", fileDf(i), "data", 1L,
        recordCount = 1000L,
        bounds = Map("bar" -> (i * 1000L, i * 1000L + 999L)))
    })
    (root, "ns", "t")
  }

  test("changelog synthesizes deletes across a mixed DELETE WHERE: the " +
      "dropped file's rows AND the boundary pos-deletes, each once") {
    import graft.plans.Dml
    val (root, ns, t) = boundedTable("graft-cdc-dml-")
    // file 2 ([2000,2999]) fully covered -> leaves the manifest with no
    // delete row written; files 1 and 3 get 701 boundary pos-deletes —
    // ONE replace-shaped commit carrying both halves
    val v = Dml.deleteWhere(spark, root, ns, t, "bar", 1500L, 3200L)
    assert(v == 2L)
    val ch = Mor.readChanges(spark, root, ns, t, v - 1, v)
    assert(ch.filter(col("_change_type") === "insert").count() == 0)
    val del = ch.filter(col("_change_type") === "delete")
    assert(del.count() == 1701L) // 1000 synthesized + 701 pos-deleted
    // the exact row set, not just the cardinality: sum over [1500,3200]
    assert(del.agg(sum("bar")).head.getLong(0) == (1500L + 3200L) * 1701L / 2)
    // and the changelog-reconstructed view matches the direct read
    assert(Mor.read(spark, root, ns, t).count() == 3299L)
  }

  test("changelog emits every still-alive row as a delete across " +
      "TRUNCATE, with lineage ids") {
    import graft.plans.Dml
    val (root, ns, t) = boundedTable("graft-cdc-trunc-")
    // v2 drops file 0 (rows 0..999) -> already dead before the truncate
    assert(Dml.deleteWhere(spark, root, ns, t, "bar", 0L, 999L) == 2L)
    val v = Dml.truncate(root, ns, t)
    assert(v == 3L)
    val ch = Mor.readChanges(spark, root, ns, t, v - 1, v, withLineage = true)
    val del = ch.filter(col("_change_type") === "delete")
    // only the 4000 rows alive at v2 — re-emitting file 0's would
    // double-delete downstream
    assert(del.count() == 4000L)
    assert(del.agg(sum("bar")).head.getLong(0) == (1000L + 4999L) * 4000L / 2)
    // synthesized deletes carry stable row ids (commit assigned 0..4999)
    assert(del.agg(sum("_row_id")).head.getLong(0) ==
      (1000L + 4999L) * 4000L / 2)
  }

  test("changelog stays silent across marked compaction but fails " +
      "loudly on an unmarked replace-shaped commit") {
    val (root, ns, t) = boundedTable("graft-cdc-mark-")
    graft.plans.Maintenance.compact(spark, root, ns, t)
    val v = TableIO.currentVersion(root, ns, t)
    // marked "replace": content-preserving, nothing to emit
    assert(Mor.readChanges(spark, root, ns, t, v - 1, v).count() == 0)
    // a writer that removes entries WITHOUT a marker (crashed between
    // publish and sidecar, or foreign code): the changelog must refuse
    // rather than guess silently either way
    val manifest = TableIO.readManifest(root, ns, t)
    val v2 = TableIO.commitReplacing(root, ns, t, manifest.drop(1))
    val ex = intercept[IllegalStateException] {
      Mor.readChanges(spark, root, ns, t, v2 - 1, v2)
    }
    assert(ex.getMessage.contains("marker"))
  }

  test("a row hit by a new pos- AND eq-delete in one commit emits once") {
    val cfg = cfgRef.copy(tableName = "cdc_dedupe")
    val root = java.nio.file.Files.createTempDirectory("graft-cdc2-").toString
    val (ns, t) = (cfg.namespace, cfg.tableName)
    import spark.implicits._
    val data = spark.range(0, 10).select(
      col("id").cast("string").as("foo"), col("id").cast("int").as("bar"),
      lit(true).as("baz"))
    TableIO.createNamespace(root, ns)
    TableIO.createTableIfNotExists(root, ns, t, data.schema)
    TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root, ns, t,
      "data/part-00000.parquet", data, "data", 1L, recordCount = 10)))
    // one commit carrying BOTH delete kinds aimed at row 0 (plus a
    // distinct eq-only kill of row 3)
    val pos = Seq(("data/part-00000.parquet", 0L)).toDF("file_path", "pos")
    val eq = Seq(("0", 0), ("3", 3)).toDF("foo", "bar")
    TableIO.commit(root, ns, t, Seq(
      TableIO.writeExactFile(spark, root, ns, t,
        "deletes/pos_delete-0.parquet", pos, "pos_delete", 2L, recordCount = 1),
      TableIO.writeExactFile(spark, root, ns, t,
        "deletes/equality_delete-0.parquet", eq, "eq_delete", 2L,
        recordCount = 2)))

    val changes = Mor.readChanges(spark, root, ns, t, 1L, 2L)
      .filter(col("_change_type") === "delete")
    assert(changes.count() == 2) // rows 0 and 3, row 0 exactly once
    assert(changes.select("bar").as[Int].collect().sorted.toSeq == Seq(0, 3))
    // and the live view agrees
    assert(Mor.read(spark, root, ns, t).count() == 8)
  }
}
