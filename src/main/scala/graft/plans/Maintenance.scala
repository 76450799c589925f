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
  /** `clusterBy` additionally clusters the rewrite on long-typed
    * columns (Iceberg sort-order / z-order rewrite): each output file
    * holds a tight range of the cluster key, recorded as manifest bounds
    * per column — so a later `Mor.Prune` scan skips every file outside
    * the queried range. Clustering is WHY bounds prune well: after an
    * unordered write each file's [min,max] spans the whole domain and
    * nothing can be skipped.
    *
    * One column range-clusters lexicographically. With `zorder = true`
    * and 2+ columns, files are clustered by the Morton interleave
    * ([[graft.functions.ZOrder.zvalue]]) instead: every dimension's
    * bounds stay tight simultaneously, so a predicate on ANY clustered
    * column (or several at once) prunes — lexicographic sort only ever
    * prunes well on the leading column. This is the Iceberg/Delta
    * z-order rewrite, and at 100 TB it is what keeps multi-dimension
    * slice queries from scanning the world.
    */
  def compact(spark: SparkSession, root: String, ns: String, table: String,
      targetFileCount: Int = 0, clusterBy: Seq[String] = Nil,
      zorder: Boolean = false, hilbert: Boolean = false): Long = {
    val dir = TableIO.tableDir(root, ns, table)
    // The planned version is read FIRST and CASed at commit
    // (expectedVersion below): a concurrent append landing between plan
    // and publish would otherwise be silently dropped from the rewritten
    // manifest — the classic compaction lost-update. Reading v before
    // the snapshot resolves keeps the race conservative: an interleaved
    // commit can only make the CAS fail (re-plan), never pass stale.
    val v = TableIO.currentVersion(root, ns, table)
    // lineage read: each surviving row carries its stable _row_id, which
    // the rewrite MATERIALIZES as a physical column in the compacted
    // files (Iceberg v3 row-id preservation through rewrites) — normal
    // reads project the table schema and never see it; lineage reads
    // prefer it over firstRowId + position
    val merged = Mor.readLineage(spark, root, ns, table)
    val nFiles = if (targetFileCount > 0) targetFileCount
      else math.max(1, TableIO.filesOf(root, ns, table, "data").size / 2)
    val stage = Files.createTempDirectory(dir, ".compact")
    try {
      import org.apache.spark.sql.functions._
      val arranged =
        if (clusterBy.isEmpty) merged.repartition(nFiles)
        else if (hilbert) {
          // loud misconfiguration failure, not a silent fall-through to
          // the z-order/lexical branch: the Hilbert curve here is 2-D
          require(clusterBy.size == 2,
            s"hilbert clustering requires exactly 2 cluster columns, " +
              s"got ${clusterBy.size}: ${clusterBy.mkString(", ")}")
          val h = graft.functions.ZOrder.hvalue(
            col(clusterBy(0)), col(clusterBy(1)))
          merged.withColumn("_h", h)
            .repartitionByRange(nFiles, col("_h"))
            .sortWithinPartitions("_h")
            .drop("_h")
        } else if (zorder && clusterBy.size >= 2) {
          val z = graft.functions.ZOrder.zvalue(clusterBy.map(col))
          merged.withColumn("_z", z)
            .repartitionByRange(nFiles, col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
        } else {
          merged.repartitionByRange(nFiles, clusterBy.map(col): _*)
            .sortWithinPartitions(clusterBy.head, clusterBy.tail: _*)
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
      // per-file record counts (+ per-column cluster-key bounds) in ONE
      // metadata/stats job over grouped _metadata.file_name, instead of
      // one job per output file.
      val scanned = spark.read
        .parquet(moved.map(r => dir.resolve(r).toString): _*)
      val aggs = count(lit(1)).as("n") +: clusterBy.flatMap(k => Seq(
        min(col(k).cast("long")).as(s"lo_$k"),
        max(col(k).cast("long")).as(s"hi_$k")))
      val stats = scanned
        .groupBy(col("_metadata.file_name").as("fn"))
        .agg(aggs.head, aggs.tail: _*)
        .collect().map { r =>
          // row layout: fn, n, lo_k1, hi_k1, lo_k2, hi_k2, ...
          val bounds = clusterBy.zipWithIndex.map { case (k, j) =>
            k -> (r.getLong(2 * j + 2), r.getLong(2 * j + 3))
          }.toMap
          r.getString(0) -> (r.getLong(1), bounds)
        }.toMap
      val entries = moved.map { rel =>
        val (n, b) = stats.getOrElse(rel.split('/').last,
          (0L, Map.empty[String, (Long, Long)]))
        ManifestEntry(rel, "data", seq, n, b)
      }
      // props entries (committed table properties, e.g. a bloom index's
      // (bits, kHashes)) survive compaction: they describe the rows'
      // interpretation, which the rewrite preserves
      val props = TableIO.readManifest(root, ns, table)
        .filter(_.content == TableIO.PropsContent)
      TableIO.commitReplacing(root, ns, table, entries ++ props,
        expectedVersion = Some(v), operation = Some("replace"))
    } finally {
      Files.walk(stage).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
  }

  /** Binpack compaction (Iceberg `rewrite_data_files` with the binpack
    * strategy): merge only files SMALLER than `smallBytes`, leaving
    * right-sized files untouched — the incremental maintenance a
    * streaming-ingest table needs (every micro-batch commit makes one
    * small file; rewriting the whole table per cleanup is how
    * maintenance costs explode at scale).
    *
    * Sequence preservation is the crux: files are grouped BY their
    * commit seq and each group's merged file keeps that seq, so
    * equality-delete gating (data_seq < delete_seq) is unchanged —
    * merging across seqs would resurrect rows an upsert's deletes had
    * killed. The group's pos-deletes are applied during the rewrite
    * (their rows vanish; the dangling delete rows are purged by the
    * [[rewritePositionDeletes]] pass this triggers); eq-deletes
    * re-apply at read time with the same gate, now matching nothing.
    * Bounds merge as per-column unions; blooms OR together when every
    * member has one (both sound supersets). Returns the new version.
    */
  def compactSmall(spark: SparkSession, root: String, ns: String,
      table: String, smallBytes: Long = 4L << 20,
      minGroup: Int = 2): Long = {
    val dir = TableIO.tableDir(root, ns, table)
    // planned version first, manifest AT that version, CAS at commit —
    // same lost-update discipline as [[compact]]
    val v = TableIO.currentVersion(root, ns, table)
    val manifest = TableIO.readManifestAt(root, ns, table, v)
    val small = manifest.filter(e => e.content == "data" &&
      Files.size(dir.resolve(e.path)) < smallBytes)
    val groups = small.groupBy(_.seq).filter(_._2.size >= minGroup)
    if (groups.isEmpty) return v
    val newEntries = groups.toSeq.sortBy(_._1).map { case (seq, files) =>
      // lineage read for the same reason as compact: the merged file
      // materializes its rows' preserved _row_ids
      val merged = Mor.readLineage(spark, root, ns, table,
        onlyPaths = Some(files.map(_.path).toSet))
      val bounds = files.flatMap(_.bounds.keys).distinct.sorted.flatMap { c =>
        val bs = files.flatMap(_.bounds.get(c))
        if (bs.size < files.size) None // a member lacks it: no sound union
        else Some(c -> (bs.map(_._1).min, bs.map(_._2).max))
      }.toMap
      val blooms = files.head.blooms.keys.toSeq.sorted.flatMap { c =>
        val ws = files.map(_.blooms.get(c))
        if (ws.exists(w => w.isEmpty || w.get.length != ws.head.get.length))
          None
        else Some(c -> ws.map(_.get).reduce((a, b) =>
          a.zip(b).map { case (x, y) => x | y }))
      }.toMap
      TableIO.writeExactFile(spark, root, ns, table,
        f"data/binpack-v${v + 1}%d-s$seq%d.parquet", merged, "data", seq,
        bounds = bounds, blooms = blooms)
    }
    val replaced = groups.values.flatten.map(_.path).toSet
    TableIO.commitReplacing(root, ns, table,
      manifest.filterNot(e => e.content == "data" && replaced(e.path)) ++
        newEntries, expectedVersion = Some(v), operation = Some("replace"))
    // purge the now-dangling pos-delete rows of the rewritten files
    rewritePositionDeletes(spark, root, ns, table)
  }

  /** Drop FULLY-DEAD data files: files whose every row is position-
    * deleted — exactly the `deleted_frac = 1.0` rows of the
    * `mor_delete_stats` observability view, which until now surfaced
    * the compaction queue without anything consuming it (r10 verdict
    * item 4). A dead file contributes nothing to any current read yet
    * still costs a scan + anti-join per query, so this is the cheapest
    * possible rewrite: there are no surviving rows, the "rewrite" is
    * removing the file from the manifest under the same
    * planned-version CAS as [[compact]], and the now-dangling
    * pos-delete rows are purged by [[rewritePositionDeletes]]. The
    * reference writes this delete debt (`/root/reference/src/main.rs:
    * 163-276`); this closes its MOR lifecycle loop.
    *
    * Deadness is decided from metadata + delete files only — the
    * seq-gated (data_seq <= delete_seq) count of distinct in-range
    * positions per file, compared to the manifest record count. The
    * data files themselves are never opened: the point of the
    * operation is that nobody ever needs to read them again.
    * Equality deletes are ignored here — their per-file kill count
    * would require reading data, which [[compact]] handles.
    * Returns the new snapshot version (or the current one untouched
    * when no file is fully dead — the operation is idempotent).
    */
  def compactDeadFiles(spark: SparkSession, root: String, ns: String,
      table: String): Long = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val v = TableIO.currentVersion(root, ns, table)
    val manifest = TableIO.readManifestAt(root, ns, table, v)
    val posEntries = manifest.filter(_.content == "pos_delete")
    // a ZERO-ROW data file is trivially dead — no delete evidence
    // needed (and none can exist: the seq-gated cover below is
    // unsatisfiable for record_count = 0, which previously made empty
    // files the one dead shape this operation could never collect)
    val emptyDead = manifest
      .filter(e => e.content == "data" && e.recordCount == 0L)
      .map(_.path).toSet
    val coveredDead: Set[String] =
      if (posEntries.isEmpty) Set.empty
      else {
        val dir = TableIO.tableDir(root, ns, table)
        val pd = Mor.readDeletes(spark,
          posEntries.map(e => (dir.resolve(e.path).toString, e.seq))).get
        val dataMeta = manifest
          .filter(e => e.content == "data" && e.recordCount > 0L)
          .map(e => (e.path, e.seq, e.recordCount))
          .toDF("file_path", "_dataseq", "_rc")
        pd.join(broadcast(dataMeta), Seq("file_path"))
          .filter(col("_dataseq") <= col("_dseq") &&
            col("pos") >= 0 && col("pos") < col("_rc"))
          .groupBy("file_path", "_rc")
          .agg(count_distinct(col("pos")).as("n"))
          .filter(col("n") === col("_rc"))
          .select("file_path")
          .collect().map(_.getString(0)).toSet // bounded: one row/dead FILE
      }
    val dead = emptyDead ++ coveredDead
    if (dead.isEmpty) return v
    TableIO.commitReplacing(root, ns, table,
      manifest.filterNot(e => e.content == "data" && dead(e.path)),
      expectedVersion = Some(v), operation = Some("replace"))
    // purge the dropped files' now-dangling delete rows (seq grouping
    // of any surviving delete rows is preserved by the rewrite)
    rewritePositionDeletes(spark, root, ns, table)
  }

  /** Rewrite position-delete files (Iceberg
    * `rewrite_position_delete_files`): consolidate the accumulated
    * small pos-delete files and purge dead rows — rows whose target
    * file left the manifest (dangling after compaction of other
    * partitions), rows that can never apply (target data committed
    * after the delete), and duplicate (file, pos) targets (the highest
    * delete seq subsumes the rest, since the gate is data_seq <=
    * delete_seq against a fixed target file).
    *
    * Sequence preservation is the correctness crux: rewritten rows are
    * grouped by their ORIGINAL delete sequence and each group's file is
    * committed at that seq — writing them at the rewrite commit's seq
    * would wrongly delete data files committed between the original
    * delete and the rewrite. Old manifests/files stay untouched, so
    * time travel is unaffected.
    *
    * Scale shape: one broadcast manifest join + one (file,pos) hash
    * aggregate over the delete side only — the data side is never read.
    * Returns the new snapshot version.
    */
  def rewritePositionDeletes(spark: SparkSession, root: String, ns: String,
      table: String): Long = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // planned version first + CAS at commit, as in [[compact]]
    val v = TableIO.currentVersion(root, ns, table)
    val manifest = TableIO.readManifestAt(root, ns, table, v)
    val posEntries = manifest.filter(_.content == "pos_delete")
    if (posEntries.isEmpty) return v
    val dir = TableIO.tableDir(root, ns, table)
    val pd = Mor.readDeletes(spark,
      posEntries.map(e => (dir.resolve(e.path).toString, e.seq))).get
    val dataSeqs = manifest.filter(_.content == "data")
      .map(e => (e.path, e.seq)).toDF("file_path", "_dataseq")
    val live = pd.join(broadcast(dataSeqs), Seq("file_path"))
      .filter(col("_dataseq") <= col("_dseq"))
      .groupBy("file_path", "pos").agg(max("_dseq").as("_dseq"))
      .cache()
    try {
      val seqs = live.select("_dseq").distinct().as[Long].collect().sorted
      val newV = v + 1
      val newEntries = seqs.map { sq =>
        val rows = live.filter(col("_dseq") === sq)
          .select("file_path", "pos").orderBy("file_path", "pos")
        TableIO.writeExactFile(spark, root, ns, table,
          s"deletes/pos_rewrite-v$newV-s$sq.parquet", rows, "pos_delete", sq)
      }
      TableIO.commitReplacing(root, ns, table,
        manifest.filterNot(_.content == "pos_delete") ++ newEntries,
        expectedVersion = Some(v), operation = Some("replace"))
    } finally live.unpersist()
  }

  /** Remove ORPHAN files: parquet files under data/ and deletes/ that
    * no manifest version references — debris from crashed writes or
    * interrupted compactions (Iceberg `remove_orphan_files`). Distinct
    * from [[expireSnapshots]], which removes files an EXPIRED manifest
    * referenced; an orphan was never committed at all, so no read at
    * any version can see it and deletion is always safe. Pure metadata
    * + directory listing — O(#files), no data read. Returns the
    * removed relative paths.
    */
  def removeOrphanFiles(root: String, ns: String, table: String): Seq[String] = {
    val dir = TableIO.tableDir(root, ns, table)
    val referenced = (0L to TableIO.currentVersion(root, ns, table))
      .flatMap(v => TableIO.readManifestAt(root, ns, table, v))
      .map(_.path).toSet
    val candidates = Seq("data", "deletes").flatMap { sub =>
      val d = dir.resolve(sub)
      if (!Files.isDirectory(d)) Nil
      else Files.walk(d).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .map(p => dir.relativize(p).toString).toSeq
    }
    val orphans = candidates.filterNot(referenced).sorted
    orphans.foreach(rel => Files.deleteIfExists(dir.resolve(rel)))
    orphans
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
    // named refs pin their snapshots: a branch/tag older than the
    // retention horizon survives expiry with every file it references
    // (Iceberg's expire_snapshots never removes a ref's snapshot —
    // otherwise creating a tag and expiring would corrupt the ref)
    val pinned = TableIO.readRefs(root, ns, table).values.map(_._2).toSet
    val keepVersions = (keepFromVersion to current).toSet ++ pinned
    val live = keepVersions.toSeq
      .flatMap(v => TableIO.readManifestAt(root, ns, table, v))
      .map(_.path).toSet
    val dead = (0L until keepFromVersion).filterNot(keepVersions)
      .flatMap(v => TableIO.readManifestAt(root, ns, table, v))
      .map(_.path).toSet -- live
    dead.toSeq.sorted.foreach { rel =>
      Files.deleteIfExists(dir.resolve(rel))
    }
    (0L until keepFromVersion).filterNot(keepVersions).foreach { v =>
      Files.deleteIfExists(dir.resolve(s"manifest/v$v.json"))
    }
    dead.toSeq.sorted
  }
}
