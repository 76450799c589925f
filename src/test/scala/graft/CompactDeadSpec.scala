package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Maintenance, Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, FixSchemaGenerator, GenConfig}

/** Edge semantics of [[Maintenance.compactDeadFiles]] (r10 verdict
  * item 4 — the operation that consumes mor_delete_stats' compaction
  * queue). The generated-table happy path (two fully-dead files
  * dropped, all their delete rows purged, merged view unchanged) is
  * oracle-checked by `gen_compact_dead` / `gen_compact_dead_meta`;
  * this spec pins what must NOT happen:
  *  - a partially-dead file stays (only deleted_frac = 1.0 qualifies);
  *  - a file is not dead when its full cover includes a delete the
  *    seq gate rejects (delete committed BEFORE the data file);
  *  - the operation is idempotent — a second call is a version no-op.
  */
class CompactDeadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("only fully-dead, seq-covered files are dropped; idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dead-").toString
    // v1: 3x10 data rows (seq 1); v2: 12 pos deletes = file 0 fully
    // dead + 2 rows of file 1 (seq 2); v3: 0 eq deletes
    val cfg = GenConfig("ns", "t", FileConfig(10, 3), FileConfig(12, 1),
      FileConfig(0, 1))
    Pipeline.prepare(spark, root, cfg)

    // v4: a LATE data file (seq 4), then v5: deletes covering all its
    // rows but committed at seq 2 < 4 — gated off, so NOT dead
    val late = FixSchemaGenerator.dataFile(spark, 9, 10)
    val e1 = TableIO.writeExactFile(spark, root, "ns", "t",
      "data/part-00090.parquet", late, "data", seq = 4L, recordCount = 10)
    TableIO.commit(root, "ns", "t", Seq(e1))
    val stale = (0L until 10L).map(p => ("data/part-00090.parquet", p))
      .toDF("file_path", "pos")
    val e2 = TableIO.writeExactFile(spark, root, "ns", "t",
      "deletes/pos_delete-stale.parquet", stale, "pos_delete",
      seq = 2L, recordCount = 10)
    TableIO.commit(root, "ns", "t", Seq(e2))

    val before = Mor.read(spark, root, "ns", "t").count()
    val v = Maintenance.compactDeadFiles(spark, root, "ns", "t")
    // only file 0 is dead: file 1 is 2/10 deleted, file 2 untouched,
    // the late file's full cover is seq-gated off
    val data = TableIO.readManifest(root, "ns", "t")
      .filter(_.content == "data").map(_.path).sorted
    assert(data == Seq("data/part-00001.parquet",
      "data/part-00002.parquet", "data/part-00090.parquet"))
    // merged view identical, through both delete-apply paths
    assert(Mor.read(spark, root, "ns", "t").count() == before)
    assert(Mor.read(spark, root, "ns", "t", bitmapThreshold = 0L)
      .count() == before)
    // the delete-rewrite pass purges file 0's 10 rows (dangling) AND
    // the 10 stale rows (they can never apply: data seq 4 > delete
    // seq 2 — sound to drop, and crucially their TARGET FILE was not);
    // only file 1's 2 live rows remain, at their ORIGINAL seq
    val pos = TableIO.filesOf(root, "ns", "t", "pos_delete")
    val kept = spark.read.parquet(pos.map(_._1): _*)
      .select("file_path").as[String].collect()
    assert(kept.toSeq == Seq.fill(2)("data/part-00001.parquet"))
    val seqs = TableIO.readManifest(root, "ns", "t")
      .filter(_.content == "pos_delete").map(_.seq)
    assert(seqs == Seq(2L))
    // second call: nothing dead anymore -> version unchanged
    assert(Maintenance.compactDeadFiles(spark, root, "ns", "t") == v)

    // a ZERO-ROW data file is trivially dead — droppable with no
    // delete evidence (the seq-gated cover is unsatisfiable at rc=0,
    // so without the explicit empty-file rule it lingered forever)
    val empty = FixSchemaGenerator.dataFile(spark, 0, 10).limit(0)
    val e3 = TableIO.writeExactFile(spark, root, "ns", "t",
      "data/part-00099.parquet", empty, "data", seq = 5L, recordCount = 0)
    TableIO.commit(root, "ns", "t", Seq(e3))
    val v2 = Maintenance.compactDeadFiles(spark, root, "ns", "t")
    assert(v2 > v)
    val dataAfter = TableIO.readManifest(root, "ns", "t")
      .filter(_.content == "data").map(_.path)
    assert(!dataAfter.contains("data/part-00099.parquet"))
    assert(Mor.read(spark, root, "ns", "t").count() == before)
  }
}
