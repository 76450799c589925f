package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Maintenance, ManifestEntry, Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, GenConfig}
import org.apache.spark.sql.types._

/** Optimistic-concurrency commit protocol + ref-protected expiry. */
class CommitProtocolSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("foo", StringType, nullable = false),
    StructField("bar", IntegerType, nullable = false)))

  private def newTable(): String = {
    val root = Files.createTempDirectory("graft-race-").toString
    TableIO.createNamespace(root, "ns")
    TableIO.createTableIfNotExists(root, "ns", "t", schema)
    root
  }

  test("concurrent fast-appends all land as consecutive versions") {
    val root = newTable()
    val threads = 4; val per = 10
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        try {
          (0 until per).foreach { i =>
            TableIO.commit(root, "ns", "t", Seq(ManifestEntry(
              s"data/part-t$t-$i.parquet", "data", 1L, 10L)))
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"commit threw: ${errs.peek()}")
    // every append landed exactly once, each as its own snapshot
    assert(TableIO.currentVersion(root, "ns", "t") == threads * per)
    val paths = TableIO.readManifest(root, "ns", "t").map(_.path)
    assert(paths.size == threads * per && paths.distinct.size == paths.size)
  }

  test("a lost publish race retries against the interloper's manifest") {
    val root = newTable()
    TableIO.commit(root, "ns", "t",
      Seq(ManifestEntry("data/a.parquet", "data", 1L, 10L)))
    // simulate a racing committer that published v2 between our read
    // and our publish: pre-create v2 (the interloper's snapshot)
    val dir = TableIO.tableDir(root, "ns", "t")
    Files.copy(dir.resolve("manifest/v1.json"), dir.resolve("manifest/v2.json"))
    val v = TableIO.commit(root, "ns", "t",
      Seq(ManifestEntry("data/b.parquet", "data", 2L, 10L)))
    assert(v == 3L) // landed AFTER the interloper, not over it
    val paths = TableIO.readManifest(root, "ns", "t").map(_.path).toSet
    assert(paths == Set("data/a.parquet", "data/b.parquet"))
  }

  test("commitAppendExpecting: exactly one of two same-expected racers " +
      "lands, and row ids never overlap the base — even with a stale " +
      "row-id mark") {
    val root = newTable()
    // two racers both planned against v0, started together: the
    // manifest hard-link is the CAS, so exactly one Right(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[Either[Long, Long]]()
    val ts = (0 until 2).map { t =>
      new Thread(() => {
        gate.await()
        results.add(TableIO.commitAppendExpecting(root, "ns", "t",
          Seq(ManifestEntry(s"data/r$t.parquet", "data", 1L, 10L)),
          expected = 0L))
      })
    }
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val rs = results.iterator().asScala.toSeq
    assert(rs.count(_ == Right(1L)) == 1, s"results: $rs")
    assert(rs.count(_.isLeft) == 1, s"results: $rs")
    assert(TableIO.currentVersion(root, "ns", "t") == 1L)

    // stale-mark scenario (ADVICE r13): a crashed writer left
    // next-row-id.text behind its published manifest. The next
    // expecting-append must still assign ids ABOVE the base manifest's
    // high-water mark — non-overlap is a property of the commit's
    // inputs, not of mark-write timing.
    val dir = TableIO.tableDir(root, "ns", "t")
    Files.writeString(dir.resolve("next-row-id.text"), "0")
    assert(TableIO.commitAppendExpecting(root, "ns", "t",
      Seq(ManifestEntry("data/next.parquet", "data", 2L, 10L)),
      expected = 1L) == Right(2L))
    val ranges = TableIO.readManifest(root, "ns", "t")
      .flatMap(e => e.firstRowId.map(id => (id, id + e.recordCount)))
      .sortBy(_._1)
    assert(ranges.size == 2)
    ranges.sliding(2).foreach { case Seq((_, hiA), (loB, _)) =>
      assert(loB >= hiA, s"overlapping firstRowId ranges: $ranges")
    }
  }

  test("replacing commit refuses when the base snapshot moved") {
    val root = newTable()
    TableIO.commit(root, "ns", "t",
      Seq(ManifestEntry("data/a.parquet", "data", 1L, 10L)))
    val dir = TableIO.tableDir(root, "ns", "t")
    // the rewrite was planned from v1; an interloper publishes v2
    // before the rewrite commits
    Files.copy(dir.resolve("manifest/v1.json"), dir.resolve("manifest/v2.json"))
    intercept[java.util.ConcurrentModificationException] {
      TableIO.commitReplacing(root, "ns", "t",
        Seq(ManifestEntry("data/rewrite.parquet", "data", 1L, 15L)),
        expectedVersion = Some(1L))
    }
  }

  test("compaction never erases a concurrent append (CAS + retry)") {
    // The lost-update race: compact plans its rewritten manifest from
    // version v; an append lands at v+1 while the rewrite runs; a commit
    // NOT CASed on v would publish the rewrite as v+2 with the appended
    // file silently missing. compact CASes on its planned version now,
    // so whatever the interleaving, every appended row must survive.
    import org.apache.spark.sql.functions._
    val root = newTable()
    def append(idx: Int, lo: Int, n: Int): Unit = {
      val df = spark.range(lo, lo + n).select(
        col("id").cast("string").as("foo"), col("id").cast("int").as("bar"))
      TableIO.commit(root, "ns", "t", Seq(TableIO.writeExactFile(spark, root,
        "ns", "t", s"data/app-$idx.parquet", df, "data",
        TableIO.nextSeq(root, "ns", "t"), recordCount = n)))
    }
    append(0, 0, 50); append(1, 50, 50)
    val appender = new Thread(() => (2 until 7).foreach { i =>
      append(i, i * 50, 50); Thread.sleep(20)
    })
    appender.start()
    try {
      // retry on CAS failure exactly as a production maintenance job
      // would; every attempt that loses the race must leave the table
      // byte-identical (its staged files are never referenced)
      var done = false; var tries = 0
      while (!done && tries < 25) {
        tries += 1
        try { Maintenance.compact(spark, root, "ns", "t"); done = true }
        catch { case _: java.util.ConcurrentModificationException => }
      }
      assert(done, "compact never won the CAS in 25 tries")
    } finally appender.join()
    val rows = Mor.read(spark, root, "ns", "t")
    assert(rows.count() == 350L)
    assert(rows.agg(sum(col("bar"))).head().getLong(0) == (0L until 350L).sum)
  }

  test("expiry never removes a snapshot a ref pins") {
    val root = Files.createTempDirectory("graft-expire-").toString
    val cfg = GenConfig("ns", "t", FileConfig(50, 4),
      FileConfig(50, 1), FileConfig(50, 1))
    Pipeline.prepare(spark, root, cfg) // v1 data, v2 pos, v3 eq
    TableIO.setRef(root, "ns", "t", "audit", "tag", 1L)
    val removed = Maintenance.expireSnapshots(root, "ns", "t", 3L)
    // v2's manifest is gone (time travel below the horizon)...
    assert(TableIO.readManifestAt(root, "ns", "t", 2L).isEmpty)
    // ...but the tagged v1 still reads in full, every file intact
    assert(Mor.readRef(spark, root, "ns", "t", "audit").count() == 200L)
    // and nothing the tag references was deleted
    val tagged = TableIO.readManifestAt(root, "ns", "t", 1L).map(_.path).toSet
    assert(removed.toSet.intersect(tagged).isEmpty)
  }
}
