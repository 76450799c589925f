package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read scan — the read semantics the reference's output defines
  * (SURVEY.md §2.5, implied by `main.rs:163-276`):
  *
  *   R1 scan all data files of the current snapshot
  *   R2 anti-join positional deletes on (file_path, pos),
  *      gated by data_seq <= delete_seq
  *   R3 anti-join equality deletes on the identifier columns,
  *      gated by data_seq < delete_seq
  *
  * Physical provenance comes from the parquet metadata columns
  * `_metadata.file_name` / `_metadata.row_index` (Spark >= 3.5), so no
  * custom source is needed. Positional deletes apply as broadcast
  * per-file bitmaps (deletion vectors — a scan filter; anti-join
  * fallback above a threshold); equality deletes as a shuffle-hash
  * `left_anti` join. The shape that scales: the 100 TB data side never
  * shuffles for positional deletes and only key-shuffles for equality
  * deletes.
  */
object Mor {

  /** Data scan with provenance columns `_file` (path relative to the
    * table dir, matching manifest/pos-delete paths) and `_pos` (row index
    * within the file) plus the file's commit sequence number.
    */
  def scanWithProvenance(spark: SparkSession, root: String, ns: String,
      table: String): DataFrame = {
    val dataFiles = TableIO.filesOf(root, ns, table, "data")
    require(dataFiles.nonEmpty, s"no data files in $ns.$table")
    // `_metadata.file_name` is a direct metadata field: per-row path
    // string surgery (split/element_at over file_path) measured 100x
    // slower than the plain scan on 10M rows.
    val df = spark.read
      .schema(TableIO.readSchema(root, ns, table))
      .parquet(dataFiles.map(_._1): _*)
      .select(col("*"),
        // file name is unique within a table, so `data/<name>` equals the
        // manifest-relative path the delete files carry.
        concat(lit("data/"), col("_metadata.file_name")).as("_file"),
        col("_metadata.file_name").as("_fname"),
        col("_metadata.row_index").as("_pos"))
    // Attach each file's sequence number (tiny manifest join, broadcast).
    import spark.implicits._
    val seqDf = dataFiles.map { case (abs, seq) =>
      (abs.split('/').last, seq)
    }.toDF("_fname", "_seq")
    df.join(broadcast(seqDf), Seq("_fname"), "left")
  }

  private def readDeletes(spark: SparkSession, root: String, ns: String,
      table: String, content: String): Option[DataFrame] = {
    val files = TableIO.filesOf(root, ns, table, content)
    if (files.isEmpty) None
    else {
      // All files of one content type share a commit seq in this engine
      // (one snapshot per phase); take the max to be conservative.
      val seq = files.map(_._2).max
      Some(spark.read.parquet(files.map(_._1): _*).withColumn("_dseq", lit(seq)))
    }
  }

  /** Max positional-delete rows handled via broadcast bitmaps. Above
    * this (or when any file's bitmap would exceed ~int positions) the
    * reader falls back to the anti-join. At petabyte scale the same
    * bitmap technique applies but bitmaps are joined to tasks per file
    * instead of broadcast wholesale (the Iceberg/Delta deletion-vector
    * design); the broadcast variant is right up to tens of millions of
    * deletes (a 1M-row file's bitmap is 125 KB).
    */
  val BitmapDeleteThreshold = 50000000L

  /** The merged view: data minus positional minus equality deletes.
    * `bitmapThreshold` caps the broadcast-bitmap strategy for positional
    * deletes (0 forces the anti-join fallback).
    */
  def read(spark: SparkSession, root: String, ns: String,
      table: String, bitmapThreshold: Long = BitmapDeleteThreshold): DataFrame = {
    var df = scanWithProvenance(spark, root, ns, table)

    // R2: positional deletes apply to files committed at or before the
    // delete's sequence (Iceberg v2: data_seq <= delete_seq). Applied as
    // broadcast per-file bitmaps (a filter on the scan — no join, no
    // sort, no shuffle of the data side): deletes are (file, pos) with
    // pos bounded by file length, exactly a deletion vector.
    val posTotal = TableIO.readManifest(root, ns, table)
      .filter(_.content == "pos_delete").map(_.recordCount).sum
    if (posTotal > 0 && posTotal <= bitmapThreshold) {
      df = applyPosDeleteBitmaps(spark, root, ns, table, df)
    } else if (posTotal > 0) {
      readDeletes(spark, root, ns, table, "pos_delete").foreach { pd =>
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
    readDeletes(spark, root, ns, table, "eq_delete").foreach { ed0 =>
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
    df.select(cols.head, cols.tail: _*)
  }

  /** Build per-file delete bitmaps from the positional-delete files and
    * apply them as a broadcast filter, honoring the sequence gate
    * (a file's deletes count only if data_seq <= delete_seq; gated
    * per file at build time using the manifest).
    */
  private def applyPosDeleteBitmaps(spark: SparkSession, root: String,
      ns: String, table: String, df: DataFrame): DataFrame = {
    import spark.implicits._
    val posFiles = TableIO.filesOf(root, ns, table, "pos_delete")
    if (posFiles.isEmpty) return df
    val deleteSeq = posFiles.map(_._2).max
    // files whose data sequence permits these deletes (here always all;
    // general tables may append data after the delete snapshot)
    val eligible = TableIO.readManifest(root, ns, table)
      .filter(e => e.content == "data" && e.seq <= deleteSeq)
      .map(_.path.split('/').last).toSet
    // distributed partial bitmaps -> merged on the driver -> broadcast
    val partials = spark.read.parquet(posFiles.map(_._1): _*)
      .select($"file_path", $"pos").as[(String, Long)]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.Map[String, java.util.BitSet]()
        it.foreach { case (f, p) =>
          acc.getOrElseUpdate(f, new java.util.BitSet()).set(p.toInt)
        }
        acc.iterator.map { case (f, bs) => (f, bs.toLongArray) }
      }.collect()
    val merged = scala.collection.mutable.Map[String, java.util.BitSet]()
    partials.foreach { case (f, words) =>
      val name = f.split('/').last
      if (eligible(name)) {
        val bs = java.util.BitSet.valueOf(words)
        merged.get(name) match {
          case Some(m) => m.or(bs)
          case None => merged(name) = bs
        }
      }
    }
    val bcast = spark.sparkContext.broadcast(merged.toMap)
    val keep = udf { (name: String, pos: Long) =>
      bcast.value.get(name) match {
        case Some(bs) => !bs.get(pos.toInt)
        case None => true
      }
    }
    df.filter(keep(org.apache.spark.sql.functions.col("_fname"),
      org.apache.spark.sql.functions.col("_pos")))
  }

  /** R4: the merged count — what `print_summary` predicts arithmetically
    * (`main.rs:334-345`); this engine computes the true value.
    */
  def mergedCount(spark: SparkSession, root: String, ns: String,
      table: String): Long = read(spark, root, ns, table).count()

  /** Snapshot time travel: the MOR view as of manifest version
    * `asOfVersion` — deletes committed after that snapshot are ignored
    * (Iceberg `VERSION AS OF` semantics; the reference's three commits
    * make versions 1/2/3 observable states of the same table).
    */
  def readAt(spark: SparkSession, root: String, ns: String, table: String,
      asOfVersion: Long): DataFrame = {
    val dir = TableIO.tableDir(root, ns, table)
    val entries = TableIO.readManifestAt(root, ns, table, asOfVersion)
    def files(content: String) =
      entries.filter(_.content == content)
        .map(e => (dir.resolve(e.path).toString, e.seq))
    val dataFiles = files("data")
    require(dataFiles.nonEmpty, s"no data files at version $asOfVersion")
    var df = spark.read
      .schema(TableIO.readSchema(root, ns, table))
      .parquet(dataFiles.map(_._1): _*)
      .select(col("*"),
        concat(lit("data/"), col("_metadata.file_name")).as("_file"),
        col("_metadata.row_index").as("_pos"))
    val pos = files("pos_delete")
    if (pos.nonEmpty) {
      val pd = spark.read.parquet(pos.map(_._1): _*)
      df = df.join(pd,
        df("_file") === pd("file_path") && df("_pos") === pd("pos"), "left_anti")
    }
    val eq = files("eq_delete")
    if (eq.nonEmpty) {
      val ed = spark.read.parquet(eq.map(_._1): _*)
      df = df.join(ed, ed.columns.toSeq, "left_anti")
    }
    val cols = TableIO.readSchema(root, ns, table).fieldNames
    df.select(cols.head, cols.tail: _*)
  }

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
      spark.read.schema(schema)
        .parquet(added.map(e => dir.resolve(e.path).toString): _*)
    }
  }
}
