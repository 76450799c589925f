package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.BitmapFunctions.bitmapContains

/** Merge-on-read scan — the read semantics the reference's output defines
  * (SURVEY.md §2.5, implied by `main.rs:163-276`):
  *
  *   R1 scan all data files of the chosen snapshot
  *   R2 anti-join positional deletes on (file_path, pos),
  *      gated by data_seq <= delete_seq
  *   R3 anti-join equality deletes on the identifier columns,
  *      gated by data_seq < delete_seq
  *
  * Physical provenance comes from the parquet metadata columns
  * `_metadata.file_name` / `_metadata.row_index` (Spark >= 3.5), so no
  * custom source is needed.
  *
  * Positional deletes apply as per-file deletion vectors (the
  * Iceberg/Delta DV design): bitmaps are built distributedly — one
  * shuffle of the (small) delete side on its target file — then
  * broadcast-joined to the scan and probed by a native codegen
  * expression, so the 100 TB data side never shuffles and the per-row
  * filter stays inside whole-stage codegen. Equality deletes apply as a
  * shuffle-hash `left_anti` join. Every delete row carries its OWN
  * file's commit sequence (`_dseq`), so multi-snapshot tables gate
  * correctly (r1 collapsed to the max seq per content type, which could
  * delete data committed after an older delete snapshot).
  */
object Mor {

  /** A range predicate `column BETWEEN lo AND hi` used for manifest-level
    * FILE SKIPPING: data files whose recorded bounds cannot intersect the
    * range are dropped from the scan before Spark ever opens them — the
    * Iceberg lower/upper-bounds pruning that dominates at 100 TB (the
    * fastest file read is the one that never happens). Purely an
    * optimization: files without bounds for the column are kept, and the
    * caller still applies the row-level filter (bounds are
    * file-granular).
    */
  final case class Prune(column: String, lo: Long, hi: Long)

  /** A point predicate `column = value` pruned via per-file BLOOM
    * filters: skips files whose bloom proves the value absent. This is
    * the pruner for high-cardinality scattered columns where [min,max]
    * bounds span the whole domain and never skip anything (hashed ids,
    * content fingerprints). Files without a bloom for the column are
    * kept; the caller still applies the row filter (false positives
    * admit a file, never a wrong row).
    */
  final case class PruneEq(column: String, value: String)

  /** A DISJUNCTIVE point-set predicate `column IN (values)` for
    * bucket-partitioned reads: a file survives if its bounds may contain
    * ANY of the values. This is how a multi-term index lookup prunes —
    * each query term hashes to one bucket, and the scan must touch the
    * union of those buckets (a conjunction of single-value [[Prune]]s
    * would demand one file to hold them all and prune everything).
    */
  final case class PruneIn(column: String, values: Seq[Long])

  /** Files of one content type (absolute path, seq) at a manifest
    * version — `None` means the current snapshot. Data files are
    * additionally bounds-pruned when `prunes` are given (a CONJUNCTION:
    * a file survives only if its bounds can intersect every predicate —
    * with z-order-clustered files that skips on each dimension
    * independently).
    */
  private def filesAt(root: String, ns: String, table: String,
      content: String, version: Option[Long],
      prunes: Seq[Prune] = Nil,
      pruneEqs: Seq[PruneEq] = Nil,
      pruneIns: Seq[PruneIn] = Nil): Seq[(String, Long)] = {
    val dir = TableIO.tableDir(root, ns, table)
    val entries = version match {
      case Some(v) => TableIO.readManifestAt(root, ns, table, v)
      case None => TableIO.readManifest(root, ns, table)
    }
    entries.filter(_.content == content)
      .filter(e => prunes.forall(p => e.mayContain(p.column, p.lo, p.hi)))
      .filter(e => pruneEqs.forall(p => e.mayContainEq(p.column, p.value)))
      .filter(e => pruneIns.forall(p =>
        p.values.exists(v => e.mayContain(p.column, v, v))))
      .map(e => (dir.resolve(e.path).toString, e.seq))
  }

  private def manifestAt(root: String, ns: String, table: String,
      version: Option[Long]): Seq[ManifestEntry] = version match {
    case Some(v) => TableIO.readManifestAt(root, ns, table, v)
    case None => TableIO.readManifest(root, ns, table)
  }

  /** (basename, seq) pairs for a file list. The read path keys seq
    * attachment and deletion vectors on `_metadata.file_name` (cheap,
    * unlike per-row path surgery), which is only sound while basenames
    * are unique across the snapshot's directories — a duplicate would
    * duplicate join rows and could attach a newer file's seq to an older
    * delete (ADVICE r2). Generators emit unique names; this guard turns
    * a silent wrong answer into a loud error if that ever changes.
    */
  private def basenameSeqs(files: Seq[(String, Long)]): Seq[(String, Long)] = {
    val bn = files.map { case (abs, seq) => (abs.split('/').last, seq) }
    require(bn.map(_._1).distinct.size == bn.size,
      s"duplicate file basenames across directories break _fname keying: " +
        bn.groupBy(_._1).filter(_._2.size > 1).keys.mkString(", "))
    bn
  }

  /** Data scan with provenance columns `_file` (path relative to the
    * table dir, matching manifest/pos-delete paths) and `_pos` (row index
    * within the file) plus the file's commit sequence number.
    */
  def scanWithProvenance(spark: SparkSession, root: String, ns: String,
      table: String, version: Option[Long] = None,
      prune: Seq[Prune] = Nil,
      pruneEq: Seq[PruneEq] = Nil,
      onlyPaths: Option[Set[String]] = None,
      pruneIn: Seq[PruneIn] = Nil,
      keepFileRowId: Boolean = false,
      uriFor: String => String = identity): DataFrame = {
    val dataFiles0 =
      filesAt(root, ns, table, "data", version, prune, pruneEq, pruneIn)
    val dir = TableIO.tableDir(root, ns, table)
    val dataFiles = onlyPaths match {
      case Some(keep) => dataFiles0.filter { case (abs, _) =>
        keep.contains(dir.relativize(java.nio.file.Paths.get(abs)).toString) }
      case None => dataFiles0
    }
    // a pruned-to-nothing scan or a legitimately empty snapshot
    // (post-TRUNCATE) reads as empty; only a never-committed table is
    // an error
    require(prune.nonEmpty || pruneEq.nonEmpty || pruneIn.nonEmpty ||
      onlyPaths.nonEmpty || dataFiles.nonEmpty ||
      version.getOrElse(TableIO.currentVersion(root, ns, table)) > 0,
      s"no data files in $ns.$table")
    if (dataFiles.isEmpty) {
      // every file pruned: an empty relation with the scan's schema —
      // a query range outside all bounds is a result, not an error
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val lineage =
        if (keepFileRowId) Seq(StructField("_row_id", LongType)) else Nil
      val schema = StructType(TableIO.readSchema(root, ns, table).fields ++
        lineage ++
        Seq(StructField("_file", org.apache.spark.sql.types.StringType),
          StructField("_fname", org.apache.spark.sql.types.StringType),
          StructField("_pos", LongType), StructField("_seq", LongType)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    // `_metadata.file_name` is a direct metadata field: per-row path
    // string surgery (split/element_at over file_path) measured 100x
    // slower than the plain scan on 10M rows.
    val schema0 = TableIO.readSchema(root, ns, table)
    // lineage reads extend the read schema with the OPTIONAL materialized
    // `_row_id` column compaction writes (Iceberg v3: a rewritten file
    // carries its rows' preserved ids physically; files without the
    // column — every normally-appended file — read it as null and
    // inherit firstRowId + position instead)
    val schema =
      if (!keepFileRowId) schema0
      else org.apache.spark.sql.types.StructType(schema0.fields :+
        org.apache.spark.sql.types.StructField("_row_id",
          org.apache.spark.sql.types.LongType))
    // id-based column resolution (rename/drop survive; old files'
    // values surface under evolved names)
    if (schema.fields.exists(_.metadata.contains(TableIO.FieldIdKey)))
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val df = spark.read
      .schema(schema)
      .parquet(dataFiles.map(f => uriFor(f._1)): _*)
      .select(col("*"),
        // file name is unique within a table, so `data/<name>` equals the
        // manifest-relative path the delete files carry.
        concat(lit("data/"), col("_metadata.file_name")).as("_file"),
        col("_metadata.file_name").as("_fname"),
        col("_metadata.row_index").as("_pos"))
    // Attach each file's sequence number (tiny manifest join, broadcast).
    import spark.implicits._
    val seqDf = basenameSeqs(dataFiles).toDF("_fname", "_seq")
    df.join(broadcast(seqDf), Seq("_fname"), "left")
  }

  /** Delete files of one content type, each row tagged with its OWN
    * file's commit sequence as `_dseq` (via `_metadata.file_name`, same
    * broadcast-join shape as the data side).
    */
  private[plans] def readDeletes(spark: SparkSession,
      files: Seq[(String, Long)],
      uriFor: String => String = identity): Option[DataFrame] = {
    if (files.isEmpty) None
    else {
      import spark.implicits._
      val seqDf = basenameSeqs(files).toDF("_dfname", "_dseq")
      Some(spark.read.parquet(files.map(f => uriFor(f._1)): _*)
        .withColumn("_dfname", col("_metadata.file_name"))
        .join(broadcast(seqDf), Seq("_dfname"))
        .drop("_dfname"))
    }
  }

  /** Max positional-delete rows handled via deletion vectors. Above this
    * — or when any data file's row count exceeds Int range (positions
    * are row indexes, so the manifest's recordCount bounds them with no
    * extra job; ADVICE r1: pos.toInt must never wrap), or when the
    * worst-case broadcast size exceeds [[MaxBitmapBroadcastBytes]] — the
    * reader falls back to the anti-join. Bitmap memory is ~maxPos/8
    * bytes per file (a 1M-row file's vector is 125 KB).
    */
  val BitmapDeleteThreshold = 50000000L

  /** Cap on the summed worst-case deletion-vector size (sum of data
    * recordCount/8). Beyond it the broadcast would strain the driver —
    * the anti-join path takes over (at that scale a shuffle join of DVs
    * to files is the design; not needed for this engine's workloads).
    */
  val MaxBitmapBroadcastBytes: Long = 256L << 20

  /** The merged view: data minus positional minus equality deletes.
    * `bitmapThreshold` caps the deletion-vector strategy for positional
    * deletes (0 forces the anti-join fallback). `asOfVersion` time
    * travels: the scan, the deletes, and the seq gates all come from
    * that snapshot's manifest (Iceberg `VERSION AS OF`). `uriFor`
    * rewrites each resolved file path into the URI the scan opens —
    * identity for local storage, a `graftrest://host:port/...`
    * mapping to read the table's bytes THROUGH the loopback HTTP
    * object store ([[RestObjectFileSystem]], the reference's
    * consumer-side S3 configuration): the plan is unchanged, only the
    * byte transport moves.
    */
  def read(spark: SparkSession, root: String, ns: String, table: String,
      bitmapThreshold: Long = BitmapDeleteThreshold,
      asOfVersion: Option[Long] = None,
      prune: Seq[Prune] = Nil,
      keepProvenance: Boolean = false,
      pruneEq: Seq[PruneEq] = Nil,
      onlyPaths: Option[Set[String]] = None,
      pruneIn: Seq[PruneIn] = Nil,
      keepFileRowId: Boolean = false,
      uriFor: String => String = identity): DataFrame = {
    var df = scanWithProvenance(spark, root, ns, table, asOfVersion, prune,
      pruneEq, onlyPaths, pruneIn, keepFileRowId, uriFor)
    val manifest = manifestAt(root, ns, table, asOfVersion)

    // R2: positional deletes apply to files committed at or before the
    // delete's sequence (Iceberg v2: data_seq <= delete_seq).
    val posFiles = filesAt(root, ns, table, "pos_delete", asOfVersion)
    val posTotal = manifest.filter(_.content == "pos_delete")
      .map(_.recordCount).sum
    if (posTotal > 0) {
      val pd = readDeletes(spark, posFiles, uriFor).get
      // Positions are row indexes within a data file, so the manifest's
      // recordCounts bound them — the Int-wrap guard (ADVICE r1) and the
      // broadcast-size cap are pure metadata checks, no extra job. Under
      // file skipping only surviving files need deletion vectors.
      val dataEntries = manifest.filter(_.content == "data")
        .filter(e => prune.forall(p => e.mayContain(p.column, p.lo, p.hi)))
        .filter(e => pruneEq.forall(p => e.mayContainEq(p.column, p.value)))
        .filter(e => pruneIn.forall(p =>
          p.values.exists(v => e.mayContain(p.column, v, v))))
        .filter(e => onlyPaths.forall(_.contains(e.path)))
        // (conjunction over all prune predicates, matching filesAt)
      val useBitmap = posTotal <= bitmapThreshold &&
        dataEntries.forall(e =>
          e.recordCount >= 0 && e.recordCount <= Int.MaxValue.toLong) &&
        dataEntries.map(_.recordCount / 8 + 8).sum <= MaxBitmapBroadcastBytes
      if (useBitmap) {
        basenameSeqs(dataEntries.map(e => (e.path, e.seq))) // uniqueness guard
        val dv = buildDeletionVectors(spark, pd,
          dataEntries.map(e => (e.path, e.path.split('/').last, e.seq)))
        df = df.join(broadcast(dv), Seq("_fname"), "left")
          .filter(col("_dv").isNull || !bitmapContains(col("_dv"), col("_pos")))
          .drop("_dv")
      } else {
        df = df.join(pd,
          df("_file") === pd("file_path") && df("_pos") === pd("pos") &&
            df("_seq") <= pd("_dseq"),
          "left_anti")
      }
    }

    // R3: equality deletes remove rows whose identifier columns match a
    // delete row with a STRICTLY higher sequence (Iceberg v2 semantics).
    // The delete files' own columns ARE the identifier set (the Iceberg
    // equality_ids contract), so the join keys come from their schema.
    // Different snapshots may delete on DIFFERENT identifier sets (the
    // pipeline's (foo,bar) deletes vs an upsert's key-only deletes), so
    // files are grouped by their column set — driver-side footer reads,
    // O(#delete files) metadata — and each set anti-joins separately;
    // a single mixed-schema scan would silently drop columns.
    filesAt(root, ns, table, "eq_delete", asOfVersion)
      .groupBy(f => spark.read.parquet(uriFor(f._1)).schema.fieldNames.toSeq)
      .toSeq.sortBy(_._1.mkString(","))
      .foreach { case (_, files) =>
        val ed0 = readDeletes(spark, files, uriFor).get
        // shuffle_hash: the delete side is much smaller than the data side
        // but can exceed the broadcast threshold; hashing it avoids the
        // sort-merge path's full sort of the data side.
        val ed = ed0.hint("shuffle_hash")
        val keys = ed0.columns.filterNot(_ == "_dseq")
        val cond = keys.map(k => df(k) === ed(k)).reduce(_ && _) &&
          df("_seq") < ed("_dseq")
        df = df.join(ed, cond, "left_anti")
      }

    val cols = TableIO.readSchema(root, ns, table).fieldNames
    val lineageCols = if (keepFileRowId) Seq("_row_id") else Nil
    if (keepProvenance)
      df.select((cols.toSeq ++ lineageCols ++
        Seq("_file", "_pos", "_seq")).map(col): _*)
    else df.select((cols.toSeq ++ lineageCols).map(col): _*)
  }

  /** Per-file deletion vectors, built distributedly — no driver-side
    * merge (r1 collected partial bitmaps and merged them on the driver,
    * a bottleneck and an OOM risk at scale). Build shape, all codegen'd
    * until the final #files-row assembly:
    *
    *   1. seq-gate each delete row against its TARGET file's data seq
    *      (broadcast manifest join; rows for files absent from the
    *      manifest drop out, matching r1's eligible-set behavior);
    *   2. partial-aggregate 64-bit bitmap words per (file, pos>>6) with
    *      bit_or — map-side combine compresses dense delete runs 64x
    *      before the only shuffle;
    *   3. assemble each file's word list into its vector (one row per
    *      data file — small enough to broadcast under the caps).
    */
  private def buildDeletionVectors(spark: SparkSession, posDeletes: DataFrame,
      dataFiles: Seq[(String, String, Long)]): DataFrame = {
    import spark.implicits._
    // keyed on the delete rows' file_path AS WRITTEN (the manifest
    //-relative path): per-row path surgery (substring_index) on the
    // delete side measured ~5x the whole build — the broadcast manifest
    // row maps path -> file_name instead, computed once on the driver
    val seqDf = dataFiles.toDF("file_path", "_fname", "_dataseq")
    posDeletes
      .select(col("file_path"), col("pos"), col("_dseq"))
      .join(broadcast(seqDf), Seq("file_path"))
      .filter(col("_dataseq") <= col("_dseq"))
      .groupBy(col("_fname"), shiftright(col("pos"), 6).as("_w"))
      .agg(expr("bit_or(shiftleft(1L, cast(pos % 64 AS int)))").as("_word"))
      .groupBy("_fname")
      .agg(collect_list(struct(col("_w"), col("_word"))).as("_ws"))
      .as[(String, Seq[(Long, Long)])]
      .map { case (f, ws) =>
        val maxW = ws.iterator.map(_._1).max
        require(maxW < (1L << 25),
          s"deletion-vector word index $maxW out of range for $f")
        val arr = new Array[Long](maxW.toInt + 1)
        ws.foreach { case (w, word) => arr(w.toInt) = word }
        (f, arr)
      }
      .toDF("_fname", "_dv")
  }

  /** R4: the merged count — what `print_summary` predicts arithmetically
    * (`main.rs:334-345`); this engine computes the true value.
    */
  def mergedCount(spark: SparkSession, root: String, ns: String,
      table: String): Long = read(spark, root, ns, table).count()

  /** Snapshot time travel: the MOR view as of manifest version
    * `asOfVersion` — deletes committed after that snapshot are ignored
    * (Iceberg `VERSION AS OF`). Same gated logic as `read` (r1 shipped a
    * separate ungated implementation: data appended after a delete
    * snapshot would have been wrongly deleted when time-traveled).
    */
  def readAt(spark: SparkSession, root: String, ns: String, table: String,
      asOfVersion: Long): DataFrame =
    read(spark, root, ns, table, BitmapDeleteThreshold, Some(asOfVersion))

  /** CDC changelog scan (Iceberg's changelog / Delta CDF): row-level
    * changes between two snapshot versions, one pass per commit.
    * Per version v in (from, to]:
    *
    *   - data files ADDED at v emit their rows as `insert` — a plain
    *     scan of just those files (the append fast path: no join at all
    *     for append-only traffic, the overwhelmingly common case);
    *   - delete files ADDED at v emit `delete` rows: ONLY the new
    *     delete files are applied (seq-gated, per identifier set)
    *     against the view as of v-1 — rows already dead at v-1 can't
    *     re-emit, and a row hit by both a new pos- and eq-delete
    *     dedupes on its physical identity (_file, _pos);
    *   - snapshots that REMOVE files (compaction rewrites, rollbacks)
    *     produce no change rows — the Iceberg changelog rule: a rewrite
    *     changes no logical row, and a rollback's changes were already
    *     reported when the rolled-back commits happened.
    *
    * Scale shape: inserts are pure incremental scans; deletes join the
    * (small) new-delete side against one prior snapshot — never a diff
    * of two full snapshots.
    */
  /** COUNT(*) answered from manifest metadata alone — no data file is
    * opened (Iceberg answers `SELECT count(*)` the same way: aggregate
    * pushdown into the manifest record counts). Valid when the snapshot
    * carries no equality deletes AND every pos-delete row references a
    * live data file exactly once — both guaranteed by this engine's
    * writers (and restored by `rewritePositionDeletes`, which purges
    * dangling and duplicate targets after compactions). Returns None
    * when eq-deletes are present: their matches are data-dependent, so
    * the caller must fall back to the MOR scan. At 100 TB this is the
    * difference between O(#files) metadata and a full-corpus scan.
    */
  def countFromMetadata(root: String, ns: String, table: String,
      version: Option[Long] = None): Option[Long] = {
    val entries = version
      .map(v => TableIO.readManifestAt(root, ns, table, v))
      .getOrElse(TableIO.readManifest(root, ns, table))
    if (entries.exists(_.content == "eq_delete")) None
    else Some(entries.filter(_.content == "data").map(_.recordCount).sum -
      entries.filter(_.content == "pos_delete").map(_.recordCount).sum)
  }

  /** MOR read with Iceberg-v3 row lineage: every surviving row carries
    * its STABLE `_row_id`. For normally-appended files that is the
    * file's committed firstRowId + the row's physical position; files
    * rewritten by compaction carry their rows' preserved ids as a
    * MATERIALIZED `_row_id` parquet column (Iceberg v3 inheritance:
    * explicit value wins, absent inherits), so ids survive compaction
    * too. Ids survive positional deletes (positions don't shift),
    * equality deletes, and appends (monotonic high-water assignment,
    * never reused) — the identity a downstream incremental consumer
    * keys on. Files committed before lineage existed surface `_row_id`
    * as null (unknown, never fabricated). One broadcast of O(#files)
    * (file, firstRowId) rows on top of the gated read.
    */
  def readLineage(spark: SparkSession, root: String, ns: String,
      table: String, asOfVersion: Option[Long] = None,
      onlyPaths: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    val df = read(spark, root, ns, table, asOfVersion = asOfVersion,
      keepProvenance = true, onlyPaths = onlyPaths, keepFileRowId = true)
    val ids = manifestAt(root, ns, table, asOfVersion)
      .filter(_.content == "data")
      .map(e => (e.path, e.firstRowId.getOrElse(-1L)))
      .toDF("_file", "_frid")
    val schemaCols = TableIO.readSchema(root, ns, table).fieldNames.toSeq
    df.join(broadcast(ids), Seq("_file"), "left")
      .withColumn("_row_id", coalesce(col("_row_id"),
        when(col("_frid") >= 0, col("_frid") + col("_pos"))))
      .select((schemaCols :+ "_row_id").map(col): _*)
  }

  /** MIN/MAX of a column answered from the manifest's per-file bounds —
    * the other half of aggregate pushdown into metadata. Valid only
    * when the snapshot carries NO deletes at all (any delete might
    * remove exactly the extreme row) and every data file records bounds
    * for the column; returns None otherwise and the caller scans.
    */
  def minMaxFromMetadata(root: String, ns: String, table: String,
      column: String, version: Option[Long] = None): Option[(Long, Long)] = {
    val entries = version
      .map(v => TableIO.readManifestAt(root, ns, table, v))
      .getOrElse(TableIO.readManifest(root, ns, table))
    val data = entries.filter(_.content == "data")
    if (entries.size != data.size || data.isEmpty ||
        !data.forall(_.bounds.contains(column))) None
    else Some((data.map(_.bounds(column)._1).min,
      data.map(_.bounds(column)._2).max))
  }

  def readChanges(spark: SparkSession, root: String, ns: String,
      table: String, fromVersion: Long, toVersion: Long,
      withLineage: Boolean = false): DataFrame = {
    import spark.implicits._
    val dir = TableIO.tableDir(root, ns, table)
    val schema = TableIO.readSchema(root, ns, table)
    val schemaCols0 = schema.fieldNames.toSeq
    // with lineage, every change row carries its stable _row_id — the
    // key an incremental consumer correlates inserts/deletes on
    val schemaCols = if (withLineage) schemaCols0 :+ "_row_id" else schemaCols0
    // The range must name real, still-retained snapshots. readManifestAt
    // returns empty for a MISSING manifest — right for v0 (the empty
    // initial table), catastrophic for an expired base: prev would read
    // as empty and the whole snapshot would be fabricated as inserts,
    // silently re-emitting every surviving row to a consumer whose
    // checkpoint fell behind the expireSnapshots horizon. Fail loudly on
    // both ends instead.
    val curV = TableIO.currentVersion(root, ns, table)
    require(0L <= fromVersion && fromVersion <= toVersion && toVersion <= curV,
      s"changelog range [$fromVersion, $toVersion] outside $ns.$table's " +
        s"history [0, $curV]")
    val parts = ((fromVersion + 1) to toVersion).flatMap { v =>
      // A rollback CHANGES content but looks replace-shaped; silently
      // skipping it (as for content-preserving compaction) would let
      // every changelog consumer diverge. Fail loudly instead — the
      // consumer must reconsume or deliberately re-point its offset.
      if (TableIO.isRollback(root, ns, table, v))
        throw new IllegalStateException(
          s"$ns.$table v$v is a rollback: the changelog across it is not " +
            "append-derivable — reset the consumer (reconsume from " +
            s"scratch, or re-point its offset past v$v deliberately)")
      Seq(v - 1, v).filter(_ >= 1L).foreach { w =>
        if (!TableIO.manifestExists(root, ns, table, w))
          throw new IllegalStateException(
            s"$ns.$table v$w was expired (expireSnapshots): the changelog " +
              s"across it is gone — reset the consumer (reconsume from " +
              "scratch, or re-point its offset into the retained history)")
      }
      val prev = TableIO.readManifestAt(root, ns, table, v - 1)
      val cur = TableIO.readManifestAt(root, ns, table, v)
      val prevKeys = prev.map(e => (e.path, e.content)).toSet
      val curKeys = cur.map(e => (e.path, e.content)).toSet
      val dropped = prev.filterNot(e => curKeys((e.path, e.content)))
      val added = cur.filterNot(e => prevKeys((e.path, e.content)))
      // A commit that REMOVES manifest entries is replace-shaped. Its
      // operation marker (stamped by commitReplacing's call sites) says
      // whether content was preserved:
      //   "replace"              compaction/binpack/pos-delete rewrite —
      //                          same logical rows, emit nothing;
      //   "delete"/"overwrite"   DELETE WHERE dropping covered files,
      //                          TRUNCATE, INSERT OVERWRITE, partition
      //                          refresh — synthesize deletes for the
      //                          dropped files' alive rows, then process
      //                          the commit's ADDED entries as usual
      //                          (a mixed DELETE WHERE also carries
      //                          boundary pos-deletes; an overwrite also
      //                          carries inserts);
      //   unmarked               unknown writer or a crash between
      //                          publish and marker — fail LOUDLY. The
      //                          pre-marker behavior (silent skip) let a
      //                          CDC consumer miss every metadata-only
      //                          DELETE WHERE / TRUNCATE forever.
      val replaceOp =
        if (dropped.isEmpty) None
        else TableIO.replaceOperation(root, ns, table, v)
      val droppedChanges: Seq[DataFrame] =
        if (dropped.isEmpty) Seq.empty
        else replaceOp match {
          case Some("replace") => Seq.empty // content-preserving rewrite
          case Some("delete") | Some("overwrite") =>
            // Dropping a DELETE file while its target data files remain
            // would RESURRECT rows — not expressible as insert/delete of
            // current content without diffing, and no writer here does
            // it (truncate drops everything; deleteWhere keeps delete
            // files). Guard loudly rather than emit wrong changes.
            val prevDataKept = prev.filter(e =>
              e.content == "data" && curKeys((e.path, e.content)))
            if (dropped.exists(_.content != "data") && prevDataKept.nonEmpty)
              throw new IllegalStateException(
                s"$ns.$table v$v drops delete files while keeping data " +
                  "files — rows may resurrect; the changelog cannot " +
                  "derive this commit (reset the consumer)")
            val droppedData = dropped.filter(_.content == "data")
            if (droppedData.isEmpty) Seq.empty
            else {
              // Alive rows of exactly the dropped files, as of the prior
              // snapshot (pos/eq deletes applied — rows already dead
              // must not be re-emitted as deletes). onlyPaths restricts
              // the scan to the dropped files: a partition-scoped
              // overwrite costs a scan of the replaced partitions, never
              // the table.
              val paths = droppedData.map(_.path).toSet
              val alive =
                if (withLineage) readLineage(spark, root, ns, table,
                  asOfVersion = Some(v - 1), onlyPaths = Some(paths))
                else read(spark, root, ns, table,
                  asOfVersion = Some(v - 1), onlyPaths = Some(paths))
              Seq(alive.select(schemaCols.map(col): _*)
                .withColumn("_change_type", lit("delete")))
            }
          case other =>
            throw new IllegalStateException(
              s"$ns.$table v$v removes manifest entries but carries " +
                s"operation marker $other: the changelog cannot tell a " +
                "content-preserving rewrite from a content-changing " +
                "overwrite — reset the consumer (reconsume from scratch, " +
                s"or re-point its offset past v$v deliberately)")
        }
      if (replaceOp.contains("replace")) Seq.empty[DataFrame]
      else {
        // Data files the commit kept — when it also DROPPED files, the
        // added-delete scan below is restricted to these: rows of the
        // dropped files are already fully emitted as synthesized deletes
        // (they were alive at v-1), so matching them again through a new
        // pos/eq-delete would double-emit.
        val keptPrevData = prev.filter(e =>
          e.content == "data" && curKeys((e.path, e.content)))
          .map(_.path).toSet
        val addedData = added.filter(_.content == "data")
        val inserts =
          if (addedData.isEmpty) None
          else Some {
            if (schema.fields.exists(_.metadata.contains(TableIO.FieldIdKey)))
              spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
            val raw = spark.read.schema(schema)
              .parquet(addedData.map(e => dir.resolve(e.path).toString): _*)
            val withId = if (!withLineage) raw else {
              val frids = addedData
                .map(e => (e.path.split('/').last, e.firstRowId.getOrElse(-1L)))
                .toDF("_fname", "_frid")
              raw.withColumn("_fname", col("_metadata.file_name"))
                .withColumn("_pos", col("_metadata.row_index"))
                .join(broadcast(frids), Seq("_fname"), "left")
                .withColumn("_row_id",
                  when(col("_frid") >= 0, col("_frid") + col("_pos")))
            }
            withId.select(schemaCols.map(col): _*)
              .withColumn("_change_type", lit("insert"))
          }
        val addedPos = added.filter(_.content == "pos_delete")
          .map(e => (dir.resolve(e.path).toString, e.seq))
        val addedEq = added.filter(_.content == "eq_delete")
          .map(e => (dir.resolve(e.path).toString, e.seq))
        val deletes =
          if (addedPos.isEmpty && addedEq.isEmpty) None
          else Some {
            // pos-deletes NAME their target files, so a pos-only commit
            // restricts the prior-snapshot scan to exactly those files —
            // at corpus scale a commit deleting rows in a handful of
            // files must not scan the world. Eq-deletes match by value
            // and can land anywhere, so any eq file forces the full
            // prior view.
            val targetPaths =
              if (addedEq.nonEmpty) {
                if (dropped.isEmpty) None else Some(keptPrevData)
              } else {
                val named = spark.read.parquet(addedPos.map(_._1): _*)
                  .select("file_path").distinct()
                  .collect().map(_.getString(0)).toSet
                Some(if (dropped.isEmpty) named
                  else named.intersect(keptPrevData))
              }
            val alive = read(spark, root, ns, table,
              asOfVersion = Some(v - 1), keepProvenance = true,
              onlyPaths = targetPaths)
            var cands = Seq.empty[DataFrame]
            readDeletes(spark, addedPos).foreach { pd =>
              cands :+= alive.join(pd,
                alive("_file") === pd("file_path") &&
                  alive("_pos") === pd("pos") &&
                  alive("_seq") <= pd("_dseq"), "left_semi")
            }
            addedEq.groupBy(f => spark.read.parquet(f._1).schema.fieldNames.toSeq)
              .toSeq.sortBy(_._1.mkString(","))
              .foreach { case (_, files) =>
                val ed0 = readDeletes(spark, files).get
                val ed = ed0.hint("shuffle_hash")
                val keys = ed0.columns.filterNot(_ == "_dseq")
                val cond = keys.map(k => alive(k) === ed(k)).reduce(_ && _) &&
                  alive("_seq") < ed("_dseq")
                cands :+= alive.join(ed, cond, "left_semi")
              }
            val deduped = cands.reduce(_ union _)
              .dropDuplicates("_file", "_pos")
            val withId = if (!withLineage) deduped else {
              val frids = prev.filter(_.content == "data")
                .map(e => (e.path, e.firstRowId.getOrElse(-1L)))
                .toDF("_file", "_frid")
              deduped.join(broadcast(frids), Seq("_file"), "left")
                .withColumn("_row_id",
                  when(col("_frid") >= 0, col("_frid") + col("_pos")))
            }
            withId.select(schemaCols.map(col): _*)
              .withColumn("_change_type", lit("delete"))
          }
        (droppedChanges ++ inserts.toSeq ++ deletes.toSeq)
          .map(_.withColumn("_change_version", lit(v.toInt)))
      }
    }
    if (parts.isEmpty) {
      import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
      val lineageField =
        if (withLineage) Seq(StructField("_row_id", LongType)) else Nil
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.fields ++ lineageField ++ Seq(
          StructField("_change_type", StringType, nullable = false),
          StructField("_change_version", IntegerType, nullable = false))))
    } else parts.reduce(_ union _)
  }

  /** Read the table at a named ref (branch or tag) — `VERSION AS OF
    * 'ref'` / Iceberg branch reads. The ref resolves to a snapshot
    * version; the fully gated read path then applies as usual.
    */
  def readRef(spark: SparkSession, root: String, ns: String, table: String,
      ref: String): DataFrame =
    readAt(spark, root, ns, table, TableIO.resolveRef(root, ns, table, ref))

  /** Incremental read: rows appended between two snapshot versions
    * (Iceberg incremental scan). With the reference workload only
    * version 1 appends data, so (0, 1] is the whole table and (1, 3]
    * is empty — general tables see per-commit increments.
    */
  def readIncremental(spark: SparkSession, root: String, ns: String,
      table: String, fromVersion: Long, toVersion: Long): DataFrame = {
    val dir = TableIO.tableDir(root, ns, table)
    val before = TableIO.readManifestAt(root, ns, table, fromVersion)
      .filter(_.content == "data").map(_.path).toSet
    val added = TableIO.readManifestAt(root, ns, table, toVersion)
      .filter(e => e.content == "data" && !before.contains(e.path))
    val schema = TableIO.readSchema(root, ns, table)
    if (added.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    } else {
      if (schema.fields.exists(_.metadata.contains(TableIO.FieldIdKey)))
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      spark.read.schema(schema)
        .parquet(added.map(e => dir.resolve(e.path).toString): _*)
    }
  }
}
