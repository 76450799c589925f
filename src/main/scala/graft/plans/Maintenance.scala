package graft.plans

import java.nio.file.{Files, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Table maintenance — the operations a MOR table needs to stay healthy
  * at scale (Iceberg's rewrite_data_files / expire_snapshots analogues).
  * Neither exists in the reference (it only writes); both are implied by
  * operating its output long-term.
  */
object Maintenance {

  /** Compaction: materialize the current MOR view into fresh data files
    * and commit a snapshot whose manifest carries ONLY those files — the
    * merge-on-read to copy-on-write rewrite (Iceberg
    * `rewrite_data_files` + delete-file removal). Read cost after
    * compaction drops to a plain scan (no anti-joins). Time travel to
    * pre-compaction versions still works: old manifests and files are
    * untouched until `expireSnapshots`.
    *
    * Returns the new snapshot version.
    */
  def compact(spark: SparkSession, root: String, ns: String, table: String,
      targetFileCount: Int = 0): Long = {
    val dir = TableIO.tableDir(root, ns, table)
    val merged = Mor.read(spark, root, ns, table)
    val v = TableIO.currentVersion(root, ns, table)
    val nFiles = if (targetFileCount > 0) targetFileCount
      else math.max(1, TableIO.filesOf(root, ns, table, "data").size / 2)
    val stage = Files.createTempDirectory(dir, ".compact")
    try {
      merged.repartition(nFiles)
        .write.mode("overwrite").parquet(stage.resolve("out").toString)
      val parts = Files.list(stage.resolve("out")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
      val seq = TableIO.nextSeq(root, ns, table)
      val moved = parts.zipWithIndex.map { case (p, i) =>
        val rel = f"data/compacted-v${v + 1}%d-$i%05d.parquet"
        val target = dir.resolve(rel)
        Files.move(p, target, StandardCopyOption.REPLACE_EXISTING)
        rel
      }
      // per-file record counts in ONE metadata-only job (count(*) over
      // grouped _metadata.file_name reads just parquet footers), instead
      // of one count job per output file.
      import org.apache.spark.sql.functions._
      val counts = spark.read
        .parquet(moved.map(r => dir.resolve(r).toString): _*)
        .groupBy(col("_metadata.file_name").as("fn"))
        .count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val entries = moved.map { rel =>
        ManifestEntry(rel, "data", seq,
          counts.getOrElse(rel.split('/').last, 0L))
      }
      TableIO.commitReplacing(root, ns, table, entries)
    } finally {
      Files.walk(stage).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
  }

  /** Expire snapshots older than `keepFromVersion`: delete their
    * manifest files and any data/delete file no longer referenced by a
    * surviving manifest (Iceberg `expire_snapshots` + orphan cleanup).
    * Time travel earlier than `keepFromVersion` stops working — that is
    * the point (bounded metadata + storage).
    */
  def expireSnapshots(root: String, ns: String, table: String,
      keepFromVersion: Long): Seq[String] = {
    val dir = TableIO.tableDir(root, ns, table)
    val current = TableIO.currentVersion(root, ns, table)
    require(keepFromVersion <= current, s"keepFrom $keepFromVersion > $current")
    val live = (keepFromVersion to current)
      .flatMap(v => TableIO.readManifestAt(root, ns, table, v))
      .map(_.path).toSet
    val dead = (0L until keepFromVersion)
      .flatMap(v => TableIO.readManifestAt(root, ns, table, v))
      .map(_.path).toSet -- live
    dead.toSeq.sorted.foreach { rel =>
      Files.deleteIfExists(dir.resolve(rel))
    }
    (0L until keepFromVersion).foreach { v =>
      Files.deleteIfExists(dir.resolve(s"manifest/v$v.json"))
    }
    dead.toSeq.sorted
  }
}
