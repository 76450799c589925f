package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.PipelineOps
import graft.plans.TableIO

/** The persisted near-dup cluster index (r11 verdict item 1): cluster
  * once into governed tables, consume labels many times — and an
  * incremental refresh must be BIT-IDENTICAL to reclustering the union
  * corpus from scratch, including relabelling rows committed before
  * the delta arrived (which is why the label snapshot is REPLACED
  * under the commit protocol, not appended).
  */
class ClusterIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Corpus with forced near-dup groups: docs 3k/3k+1 share identical
    * text (guaranteed LSH pairs), 3k+2 is unique filler.
    */
  private def docsDf(n: Int, idOffset: Long = 0L) = {
    import spark.implicits._
    (0 until n).map { i =>
      val id = idOffset + i
      val body =
        if (i % 3 < 2)
          s"shared corpus body alpha beta gamma delta epsilon zeta ${i / 3}"
        else s"unique filler text number $i with trailing entropy word$i"
      (id, body)
    }.toDF("doc_id", "text")
  }

  private def labelsOf(root: String): Seq[(Long, Long)] = {
    val out = PipelineOps.readClusterIndex(spark, root, "corp", "clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    CacheScope.drain()
    out
  }

  test("build + change-fold refresh is bit-identical to a from-scratch " +
      "rebuild of the union corpus") {
    val docs = docsDf(90)
    val batch1 = docs.filter(col("doc_id") % 3 =!= 0)
    val batch2 = docs.filter(col("doc_id") % 3 === 0)

    val rebuildRoot = Files.createTempDirectory("graft-clidx-a-").toString
    PipelineOps.buildClusterIndex(spark, docs, rebuildRoot, "corp", "clusters")
    CacheScope.drain()

    val refreshRoot = Files.createTempDirectory("graft-clidx-b-").toString
    PipelineOps.buildClusterIndex(spark, batch1, refreshRoot, "corp",
      "clusters")
    CacheScope.drain()
    PipelineOps.refreshClusterIndex(spark, batch2, refreshRoot, "corp",
      "clusters")
    CacheScope.drain()

    assert(labelsOf(refreshRoot) == labelsOf(rebuildRoot))
    // the PAIR tables converged to the same set too (the labels only
    // HAPPENING to match while the pair sets diverged would be a
    // latent bug waiting for a different corpus)
    def pairsOf(root: String) = {
      val out = graft.plans.Mor.read(spark, root, "corp", "clusters_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      CacheScope.drain()
      out
    }
    val p = pairsOf(refreshRoot)
    assert(p == pairsOf(rebuildRoot) && p.nonEmpty)
  }

  test("refresh RELABELS pre-existing rows via a replacing commit " +
      "with the overwrite marker") {
    // existing near-dup group {10, 11}: min-label 10. The delta doc 5
    // shares their text, so the merged group's label becomes 5 — rows
    // committed BEFORE the delta must change, which an append-only
    // label table cannot express.
    import spark.implicits._
    val base = Seq(
      (10L, "same exact body tokens one two three four five six"),
      (11L, "same exact body tokens one two three four five six"),
      (20L, "unrelated filler content omega psi chi phi upsilon tau"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (5L, "same exact body tokens one two three four five six"))
      .toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft-clidx-c-").toString
    PipelineOps.buildClusterIndex(spark, base, root, "corp", "clusters")
    CacheScope.drain()
    assert(labelsOf(root) == Seq((10L, 10L), (11L, 10L)))
    val vBuild = TableIO.currentVersion(root, "corp", "clusters")

    PipelineOps.refreshClusterIndex(spark, delta, root, "corp", "clusters")
    CacheScope.drain()
    assert(labelsOf(root) == Seq((5L, 5L), (10L, 5L), (11L, 5L)))

    // snapshot history: the refresh REPLACED the label snapshot (one
    // new version, content-changing marker) — time travel still sees
    // the pre-refresh labels, the changelog sees a relabel, and the
    // sig/pair tables grew by plain appends
    val vNow = TableIO.currentVersion(root, "corp", "clusters")
    assert(vNow == vBuild + 1)
    assert(TableIO.replaceOperation(root, "corp", "clusters", vNow)
      .contains("overwrite"))
    assert(TableIO.replaceOperation(root, "corp", "clusters", vBuild).isEmpty)
  }

  test("a second build over a committed index refuses loudly") {
    val root = Files.createTempDirectory("graft-clidx-d-").toString
    PipelineOps.buildClusterIndex(spark, docsDf(12), root, "corp", "clusters")
    CacheScope.drain()
    val e = intercept[IllegalArgumentException](
      PipelineOps.buildClusterIndex(spark, docsDf(12), root, "corp",
        "clusters"))
    assert(e.getMessage.contains("refreshClusterIndex"))
    CacheScope.drain()
  }
}
