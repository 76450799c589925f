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
  /** `clusterBy` additionally RANGE-clusters the rewrite on a long-typed
    * column (Iceberg sort-order rewrite / the poor man's Z-order for one
    * dimension): each output file holds a contiguous, non-overlapping
    * key range, recorded as manifest bounds — so a later
    * `Mor.Prune(key, lo, hi)` scan skips every file outside the range.
    * Clustering is WHY bounds prune well: after an unordered write each
    * file's [min,max] spans the whole domain and nothing can be skipped.
    */
  def compact(spark: SparkSession, root: String, ns: String, table: String,
      targetFileCount: Int = 0, clusterBy: Option[String] = None): Long = {
    val dir = TableIO.tableDir(root, ns, table)
    val merged = Mor.read(spark, root, ns, table)
    val v = TableIO.currentVersion(root, ns, table)
    val nFiles = if (targetFileCount > 0) targetFileCount
      else math.max(1, TableIO.filesOf(root, ns, table, "data").size / 2)
    val stage = Files.createTempDirectory(dir, ".compact")
    try {
      import org.apache.spark.sql.functions._
      val arranged = clusterBy match {
        case Some(k) =>
          merged.repartitionByRange(nFiles, col(k)).sortWithinPartitions(k)
        case None => merged.repartition(nFiles)
      }
      arranged.write.mode("overwrite").parquet(stage.resolve("out").toString)
      val parts = Files.list(stage.resolve("out")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
      val seq = TableIO.nextSeq(root, ns, table)
      val moved = parts.zipWithIndex.map { case (p, i) =>
        val rel = f"data/compacted-v${v + 1}%d-$i%05d.parquet"
        val target = dir.resolve(rel)
        Files.move(p, target, StandardCopyOption.REPLACE_EXISTING)
        rel
      }
      // per-file record counts (+ cluster-key bounds) in ONE
      // metadata/stats job over grouped _metadata.file_name, instead of
      // one job per output file.
      val scanned = spark.read
        .parquet(moved.map(r => dir.resolve(r).toString): _*)
      val statsDf = clusterBy match {
        case Some(k) => scanned
          .groupBy(col("_metadata.file_name").as("fn"))
          .agg(count(lit(1)).as("n"),
            min(col(k).cast("long")).as("lo"), max(col(k).cast("long")).as("hi"))
        case None => scanned
          .groupBy(col("_metadata.file_name").as("fn"))
          .agg(count(lit(1)).as("n"),
            lit(null).cast("long").as("lo"), lit(null).cast("long").as("hi"))
      }
      val stats = statsDf.collect().map { r =>
        r.getString(0) -> (r.getLong(1),
          if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))
      }.toMap
      val entries = moved.map { rel =>
        val (n, b) = stats.getOrElse(rel.split('/').last, (0L, None))
        ManifestEntry(rel, "data", seq, n,
          clusterBy.zip(b).map { case (k, lohi) => k -> lohi }.toMap)
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
