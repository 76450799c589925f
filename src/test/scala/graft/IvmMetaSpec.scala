package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{Ivm, Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, GenConfig}

/** Metadata-only counts and incremental view maintenance. */
class IvmMetaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("countFromMetadata answers without touching any data file") {
    val root = Files.createTempDirectory("graft-meta-").toString
    val cfg = GenConfig("ns", "t", FileConfig(50, 4),
      FileConfig(50, 1), FileConfig(0, 0))
    Pipeline.prepare(spark, root, cfg)
    assert(Mor.countFromMetadata(root, "ns", "t") === Some(150L)) // 200 - 50
    assert(Mor.countFromMetadata(root, "ns", "t", Some(1L)) === Some(200L))
    // the brutal proof of "no scan": remove the physical data files;
    // the metadata count still answers (a real scan would throw)
    TableIO.filesOf(root, "ns", "t", "data")
      .foreach { case (p, _) => Files.delete(Paths.get(p)) }
    assert(Mor.countFromMetadata(root, "ns", "t") === Some(150L))
  }

  test("countFromMetadata refuses when equality deletes are present") {
    val root = Files.createTempDirectory("graft-meta-").toString
    val cfg = GenConfig("ns", "t", FileConfig(50, 4),
      FileConfig(50, 1), FileConfig(50, 1))
    Pipeline.prepare(spark, root, cfg)
    assert(Mor.countFromMetadata(root, "ns", "t").isEmpty)
    // the data-only prefix of history still answers from metadata
    assert(Mor.countFromMetadata(root, "ns", "t", Some(2L)) === Some(150L))
  }

  test("row lineage: ids survive deletes and are never reused") {
    import graft.plans.Dml
    val root = Files.createTempDirectory("graft-lineage-").toString
    val cfg = GenConfig("ns", "t", FileConfig(100, 3),
      FileConfig(0, 0), FileConfig(0, 0))
    Pipeline.prepare(spark, root, cfg) // 300 rows, ids 0..299 (= bar)
    Dml.deleteWhere(spark, root, "ns", "t", "bar", 0L, 99L)
    // survivors keep their ids through the delete (positions unshifted)
    val after = Mor.readLineage(spark, root, "ns", "t")
      .collect().map(r => (r.getInt(1), r.getLong(3))).toMap
    assert(after.size == 200 && after.forall { case (bar, rid) => rid == bar })
    // truncate empties the LIVE manifest, but the high-water mark
    // persists: the next append must not reuse ids 0..299
    Dml.truncate(root, "ns", "t")
    val extra = spark.range(0, 50).select(
      col("id").cast("string").as("foo"),
      col("id").cast("int").as("bar"), lit(true).as("baz"))
    val seq = TableIO.nextSeq(root, "ns", "t")
    TableIO.commit(root, "ns", "t", Seq(TableIO.writeExactFile(spark, root,
      "ns", "t", "data/part-00009.parquet", extra, "data", seq,
      recordCount = 50L)))
    val rids = Mor.readLineage(spark, root, "ns", "t")
      .collect().map(_.getLong(3)).sorted
    assert(rids.head >= 300L && rids.distinct.length == 50)
  }

  test("ivm state folds one snapshot per batch and matches recompute") {
    val root = Files.createTempDirectory("graft-ivm-").toString
    val cfg = GenConfig("ns", "t", FileConfig(100, 3),
      FileConfig(100, 1), FileConfig(100, 1))
    Pipeline.prepare(spark, root, cfg)
    val ckpt = Paths.get(root, "ivm.ckpt")
    Ivm.catchUp(spark, root, "ns", "t", "agg", ckpt,
      pmod(col("bar"), lit(7)), "bar")
    // one state commit per base snapshot, offset at the base head
    assert(TableIO.currentVersion(root, "ns", "agg") == 3L)
    assert(graft.plans.ChangeFeed.offsetOf(ckpt) == 3L)
    def stateRows() = Mor.read(spark, root, "ns", "agg").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Mor.read(spark, root, "ns", "t")
      .groupBy(pmod(col("bar"), lit(7)).cast("long").as("k"))
      .agg(count(lit(1)).as("n"), sum(col("bar").cast("long")).as("sum_v"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stateRows() == expected)
    // idempotent when nothing new committed
    Ivm.catchUp(spark, root, "ns", "t", "agg", ckpt,
      pmod(col("bar"), lit(7)), "bar")
    assert(TableIO.currentVersion(root, "ns", "agg") == 3L)
    // a new base append folds incrementally (state v4, counts grow)
    val extra = spark.range(1000, 1100).select(
      col("id").cast("string").as("foo"),
      col("id").cast("int").as("bar"), lit(true).as("baz"))
    val seq = TableIO.nextSeq(root, "ns", "t")
    TableIO.commit(root, "ns", "t", Seq(TableIO.writeExactFile(spark, root,
      "ns", "t", "data/part-00099.parquet", extra, "data", seq,
      recordCount = 100L, bounds = Map("bar" -> (1000L, 1099L)))))
    Ivm.catchUp(spark, root, "ns", "t", "agg", ckpt,
      pmod(col("bar"), lit(7)), "bar")
    assert(TableIO.currentVersion(root, "ns", "agg") == 4L)
    assert(stateRows().map(_._2).sum == 200L) // 300 - 100 - 100 + 100
    // crash between state commit and checkpoint advance: the state is
    // at v4 but the checkpoint still names batch 3. A naive restart
    // would refold the signed delta (NOT idempotent); the reconciled
    // restart must skip the fold and only advance the checkpoint.
    Files.writeString(ckpt, "3")
    val before = stateRows()
    Ivm.catchUp(spark, root, "ns", "t", "agg", ckpt,
      pmod(col("bar"), lit(7)), "bar")
    assert(TableIO.currentVersion(root, "ns", "agg") == 4L) // no new commit
    assert(graft.plans.ChangeFeed.offsetOf(ckpt) == 4L)     // advanced
    assert(stateRows() == before)                           // not refolded
    // a METADATA-ONLY delete on the base (the appended file's bounds
    // [1000,1099] fully cover the range, so the file just leaves the
    // manifest — zero delete rows written): the pre-marker changelog
    // emitted NOTHING for this commit and the view silently diverged
    // forever; with synthesized deletes the fold must land exactly on
    // the recompute
    val dv = graft.plans.Dml.deleteWhere(spark, root, "ns", "t",
      "bar", 1000L, 1099L)
    assert(TableIO.readManifest(root, "ns", "t")
      .count(_.content != "data") == 2, // only the original pipeline's
      "fixture drift: the deleteWhere was supposed to be metadata-only")
    assert(dv == 5L)
    Ivm.catchUp(spark, root, "ns", "t", "agg", ckpt,
      pmod(col("bar"), lit(7)), "bar")
    assert(stateRows() == expected, // back to the pre-append recompute
      "view diverged across a metadata-only DELETE WHERE")
  }

  test("streaming IVM: the CDC-source-driven fold matches recompute and " +
      "a fresh-checkpoint rerun cannot double-fold") {
    val root = Files.createTempDirectory("graft-sivm-").toString
    val cfg = GenConfig("ns", "t", FileConfig(100, 3),
      FileConfig(100, 1), FileConfig(100, 1))
    Pipeline.prepare(spark, root, cfg)
    Ivm.streamMaintain(spark, root, "ns", "t", "agg",
      pmod(col("bar"), lit(7)), "bar")
    assert(TableIO.currentVersion(root, "ns", "agg") == 3L)
    def stateRows() = Mor.read(spark, root, "ns", "agg").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Mor.read(spark, root, "ns", "t")
      .groupBy(pmod(col("bar"), lit(7)).cast("long").as("k"))
      .agg(count(lit(1)).as("n"), sum(col("bar").cast("long")).as("sum_v"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stateRows() == expected)
    // a rerun with a FRESH checkpoint re-delivers every batch with ids
    // restarting at 0 — all behind the state version: the replay guard
    // must skip them all, leaving the state bit-identical. (The default
    // checkpoint RESUMES — a fresh one is the worst case.)
    Ivm.streamMaintain(spark, root, "ns", "t", "agg",
      pmod(col("bar"), lit(7)), "bar",
      checkpoint = Some(Files.createTempDirectory("sivm-fresh-").toString))
    assert(TableIO.currentVersion(root, "ns", "agg") == 3L)
    assert(stateRows() == expected)
  }

  test("join IVM: multiplicities fold, partial retraction decrements, " +
      "offsets ride the commit") {
    import graft.plans.Dml
    val root = Files.createTempDirectory("graft-ivmjoin-").toString
    val ns = "ns"
    TableIO.createNamespace(root, ns)
    def commitRows(t: String, file: String, rows: Seq[(Long, Long, Long)],
        vcol: String): Unit = {
      import spark.implicits._
      val df = rows.toDF("k", vcol, "rid")
      TableIO.createTableIfNotExists(root, ns, t, df.schema)
      TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root,
        ns, t, file, df, "data", TableIO.nextSeq(root, ns, t),
        bounds = TableIO.longBounds(df, Seq("rid")))))
    }
    // A v1: DUPLICATE (k, av) rows -> the view row must carry n=2
    commitRows("ja", "data/a0.parquet",
      Seq((1L, 5L, 0L), (1L, 5L, 1L), (2L, 6L, 2L)), "av")
    commitRows("jb", "data/b0.parquet", Seq((1L, 7L, 0L)), "bv")
    Ivm.catchUpJoin(spark, root, ns, "ja", "jb", "jv", "k", "av", "bv")
    def state(): Set[(Long, Long, Long, Long)] =
      Mor.read(spark, root, ns, "jv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(state() == Set((1L, 5L, 7L, 2L)))
    assert(TableIO.readProps(root, ns, "jv", "ivm_join")
      === Some(Map("va" -> 1L, "vb" -> 1L)))
    assert(TableIO.currentVersion(root, ns, "jv") == 2L) // = va + vb

    // partial retraction through the POS-DELETE path (rid 1 is a
    // boundary row of a0, not a covered file): n decrements 2 -> 1
    Dml.deleteWhere(spark, root, ns, "ja", "rid", 1L, 1L)
    Ivm.catchUpJoin(spark, root, ns, "ja", "jb", "jv", "k", "av", "bv")
    assert(state() == Set((1L, 5L, 7L, 1L)))
    assert(TableIO.readProps(root, ns, "jv", "ivm_join")
      === Some(Map("va" -> 2L, "vb" -> 1L)))

    // late B append joins the RETRACTED A (time-travel co-offset): the
    // k=1 group matches only rid 0 now; k=2 appears for the first time
    commitRows("jb", "data/b1.parquet", Seq((1L, 8L, 1L), (2L, 9L, 2L)), "bv")
    Ivm.catchUpJoin(spark, root, ns, "ja", "jb", "jv", "k", "av", "bv")
    assert(state() == Set((1L, 5L, 7L, 1L), (1L, 5L, 8L, 1L),
      (2L, 6L, 9L, 1L)))
    assert(TableIO.currentVersion(root, ns, "jv") == 4L)
    // idempotent re-entry: nothing to fold, nothing committed
    Ivm.catchUpJoin(spark, root, ns, "ja", "jb", "jv", "k", "av", "bv")
    assert(TableIO.currentVersion(root, ns, "jv") == 4L)
  }

  test("the maintained join view replicates like any governed table") {
    import graft.streaming.Replication
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ivmrep-").toString
    val ns = "ns"
    TableIO.createNamespace(root, ns)
    def commitRows(t: String, file: String, rows: Seq[(Long, Long, Long)],
        vcol: String): Unit = {
      val df = rows.toDF("k", vcol, "rid")
      TableIO.createTableIfNotExists(root, ns, t, df.schema)
      TableIO.commit(root, ns, t, Seq(TableIO.writeExactFile(spark, root,
        ns, t, file, df, "data", TableIO.nextSeq(root, ns, t))))
    }
    commitRows("ra", "data/a0.parquet",
      Seq((1L, 5L, 0L), (2L, 6L, 1L)), "av")
    commitRows("rb", "data/b0.parquet", Seq((1L, 7L, 0L)), "bv")
    Ivm.catchUpJoin(spark, root, ns, "ra", "rb", "rv", "k", "av", "bv")
    TableIO.createTableIfNotExists(root, ns, "rv_mirror",
      Mor.read(spark, root, ns, "rv").schema)
    def content(t: String): Set[(Long, Long, Long, Long)] =
      Mor.read(spark, root, ns, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    // the state table's commits are commitReplacing(overwrite) — the
    // changelog a mirror tails is entirely the synthesized-delete path
    val q = Replication.replicate(spark, root, ns, "rv", root, ns,
      "rv_mirror", keyCols = Seq("k", "av", "bv"),
      checkpoint = s"$root/_rep_ckpt")
    try {
      q.processAllAvailable()
      assert(content("rv_mirror") == content("rv"))
      assert(content("rv_mirror") == Set((1L, 5L, 7L, 1L)))
      // a refresh rewrites the whole state snapshot; the mirror must
      // converge (old rows retracted, new multiplicities in)
      commitRows("rb", "data/b1.parquet",
        Seq((1L, 7L, 1L), (2L, 9L, 2L)), "bv")
      Ivm.catchUpJoin(spark, root, ns, "ra", "rb", "rv", "k", "av", "bv")
      q.processAllAvailable()
      assert(content("rv_mirror") == content("rv"))
      assert(content("rv_mirror") ==
        Set((1L, 5L, 7L, 2L), (2L, 6L, 9L, 1L)))
    } finally q.stop()
  }
}
