package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Row-level DML beyond upsert: DELETE FROM t WHERE <range predicate>
  * (Iceberg's delete-by-filter / RowLevelOperations shape). The cost
  * model is the point:
  *
  *   - files whose bounds lie FULLY inside the range leave the manifest
  *     — pure metadata, no file opened, no delete row written;
  *   - files partially overlapping get position-delete rows for exactly
  *     their matching rows, computed by scanning ONLY those files;
  *   - files outside the range are never read or touched.
  *
  * So a "delete one day from a year of data" commit costs metadata +
  * a scan of the boundary files, independent of table size. History is
  * preserved (old manifests untouched); the commit appears in the
  * snapshots table as an overwrite when files were dropped.
  */
object Dml {

  /** TRUNCATE TABLE: publish an empty snapshot — O(1) metadata, no
    * file touched; prior versions stay readable (time travel), so
    * truncate is also instantly rollback-able.
    */
  def truncate(root: String, ns: String, table: String): Long =
    TableIO.commitReplacing(root, ns, table, Nil,
      operation = Some("delete"))

  /** Delete all rows with `column` in [lo, hi]. Returns the new
    * snapshot version (or the current one when nothing matched).
    */
  def deleteWhere(spark: SparkSession, root: String, ns: String,
      table: String, column: String, lo: Long, hi: Long): Long = {
    val manifest = TableIO.readManifest(root, ns, table)
    val dataEntries = manifest.filter(_.content == "data")
    val fullyCovered = dataEntries.filter(e =>
      e.bounds.get(column).exists { case (l, h) => l >= lo && h <= hi })
    val fullSet = fullyCovered.map(_.path).toSet
    val touched = dataEntries.filterNot(e => fullSet(e.path))
      .filter(_.mayContain(column, lo, hi))

    val seq = TableIO.nextSeq(root, ns, table)
    val newDeletes =
      if (touched.isEmpty) Nil
      else {
        val matches = Mor.scanWithProvenance(spark, root, ns, table,
            onlyPaths = Some(touched.map(_.path).toSet))
          .filter(col(column).between(lo, hi))
          .select(col("_file").as("file_path"), col("_pos").as("pos"))
          .orderBy("file_path", "pos")
        val n = matches.count()
        if (n == 0) Nil
        else Seq(TableIO.writeExactFile(spark, root, ns, table,
          s"deletes/pos_delete-dml-s$seq.parquet", matches, "pos_delete",
          seq, recordCount = n))
      }
    if (fullyCovered.isEmpty && newDeletes.isEmpty)
      TableIO.currentVersion(root, ns, table)
    else
      TableIO.commitReplacing(root, ns, table,
        manifest.filterNot(e => e.content == "data" && fullSet(e.path)) ++
          newDeletes,
        // content-CHANGING when files leave the manifest: the changelog
        // must synthesize their alive rows as deletes, not skip the
        // commit as compaction. A pos-delete-only boundary commit stays
        // append-shaped and needs no marker.
        operation = if (fullyCovered.isEmpty) None else Some("delete"))
  }
}
