package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.plans.{Mor, Partitioning, TableIO}

/** Structured Streaming SOURCE over a governed table — `readStream`
  * tails the snapshot log (the Iceberg streaming-read surface: each
  * committed snapshot becomes a micro-batch, the snapshot VERSION is
  * the stream offset).
  *
  * {{{
  *   spark.readStream.format("graft-table")
  *     .option("root", root).option("namespace", ns).option("table", t)
  *     .option("mode", "append" | "cdc")        // default append
  *     .load()
  * }}}
  *
  * - `append` mode emits the rows each snapshot INSERTED, in the table
  *   schema. Delete/overwrite commits contribute nothing (documented
  *   skip — the Iceberg `streaming-skip-delete-snapshots` behavior);
  *   consumers needing them use `cdc`.
  * - `cdc` mode emits the full change rows (`_change_type` insert /
  *   delete, `_change_version`) from [[Mor.readChanges]] — a streaming
  *   changelog a downstream materialization can fold.
  *
  * Scale + delivery: offsets are ONE long; the versioned manifests are
  * the log (no extra retention machinery — [[
  * graft.plans.Maintenance.expireSnapshots]] bounds it, and expiring
  * past an active checkpoint fails the next batch loudly rather than
  * silently skipping). Batch planning is O(files added in the version
  * range) manifest metadata; the data read is the ordinary pruned
  * parquet scan. Exactly-once end-to-end comes from Spark's offset log
  * + an idempotent sink, the standard streaming contract.
  */
class GraftTableStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def parse(parameters: Map[String, String]): (String, String, String, String) = {
    def req(k: String) = parameters.getOrElse(k,
      throw new IllegalArgumentException(s"graft-table source requires option '$k'"))
    val mode = parameters.getOrElse("mode", "append")
    require(mode == "append" || mode == "cdc", s"mode must be append|cdc, got '$mode'")
    (req("root"), req("namespace"), req("table"), mode)
  }

  private def parseMaxVersions(parameters: Map[String, String]): Option[Long] =
    parameters.get("maxVersionsPerBatch").map { v =>
      val n = v.toLong
      require(n > 0, s"maxVersionsPerBatch must be positive, got $n")
      n
    }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (root, ns, t, mode) = parse(parameters)
    (shortName(), GraftTableSource.schemaFor(root, ns, t, mode))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (root, ns, t, mode) = parse(parameters)
    new GraftTableSource(sqlContext, root, ns, t, mode,
      parseMaxVersions(parameters), metadataPath)
  }

  /** `writeStream.format("graft-table")` — every micro-batch lands as
    * one snapshot commit. Options: `root`/`namespace`/`table`
    * (required), `streamId` (distinguishes concurrent writers into one
    * table; default "s0"), `statsColumns` (comma list → per-file
    * manifest bounds, so streamed files prune like batch-written ones).
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    def req(k: String) = parameters.getOrElse(k,
      throw new IllegalArgumentException(s"graft-table sink requires option '$k'"))
    require(outputMode == OutputMode.Append(),
      s"graft-table sink is append-only (snapshot commits); got $outputMode")
    new GraftTableSink(req("root"), req("namespace"), req("table"),
      parameters.getOrElse("streamId", "s0"),
      parameters.get("statsColumns").toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)))
  }
}

object GraftTableSource {
  private[streaming] def schemaFor(root: String, ns: String, t: String,
      mode: String): StructType = {
    val base = TableIO.readSchema(root, ns, t)
    if (mode == "append") base
    else StructType(base.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_change_version", IntegerType, nullable = false)))
  }
}

/** @param maxVersions admission control (the `maxFilesPerTrigger` of
  *   the snapshot log): cap each micro-batch at this many snapshot
  *   versions, so a stream starting against a long backlog (a fresh
  *   tail of a 10k-commit table, or catch-up after downtime) plans
  *   bounded batches instead of one batch spanning the entire history.
  *   The last OFFERED offset is persisted under the source's
  *   checkpoint `metadataPath` (the v1 FileStreamSource pattern) so a
  *   restart resumes capping from where it left off; if that marker is
  *   ever lost while the offset log survives, the next `getBatch`
  *   fails loudly (end < start) rather than silently replanning.
  */
class GraftTableSource(sqlContext: SQLContext, root: String, ns: String,
    t: String, mode: String, maxVersions: Option[Long] = None,
    metadataPath: String = "") extends Source {

  override val schema: StructType = GraftTableSource.schemaFor(root, ns, t, mode)

  private val highWaterFile: Option[java.nio.file.Path] =
    maxVersions.filter(_ => metadataPath.nonEmpty).map { _ =>
      // Spark hands the checkpoint source dir as a Hadoop path that may
      // carry a scheme ("file:/ckpt/sources/0"); Paths.get would treat
      // that as a RELATIVE path named "file:..." under the CWD
      val local = metadataPath.stripPrefix("file://")
        .stripPrefix("file:")
      java.nio.file.Paths.get(local, "graft-highwater")
    }

  /** Furthest version offered to the engine (admission-control state). */
  private var highWater: Long = highWaterFile match {
    case Some(p) if java.nio.file.Files.isRegularFile(p) =>
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong
    case _ => 0L
  }

  private def persistHighWater(v: Long): Unit = highWaterFile.foreach { p =>
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Current snapshot version capped by admission control; None until
    * the first commit exists.
    */
  override def getOffset: Option[Offset] = {
    val v = TableIO.currentVersion(root, ns, t)
    if (v <= 0L) None
    else {
      val offered = maxVersions.fold(v)(m => math.min(v, highWater + m))
      if (offered > highWater) { highWater = offered; persistHighWater(offered) }
      Some(LongOffset(offered))
    }
  }

  // restart path hands back SerializedOffset(json) — both shapes carry
  // the version as their json payload
  private def versionOf(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(0L)
    val to = versionOf(end)
    val cur = TableIO.currentVersion(root, ns, t)
    require(to <= cur,
      s"stream offset v$to is ahead of $ns.$t (v$cur) — checkpoint from another table?")
    require(to >= from,
      s"stream batch end v$to is behind its start v$from on $ns.$t — the " +
        "admission-control high-water marker regressed relative to the " +
        "offset log (lost checkpoint file?); restore it or drop " +
        "maxVersionsPerBatch for one run")
    // recovery replays the last planned batch before new offsets are
    // polled — fold it into the admission high-water so capping resumes
    // from the offset log's frontier, not behind it
    if (to > highWater) { highWater = to; persistHighWater(to) }
    val changes = Mor.readChanges(sqlContext.sparkSession, root, ns, t, from, to)
    val batch = if (mode == "cdc") changes
      else changes.filter(col("_change_type") === "insert")
        .drop("_change_type", "_change_version")
    // schema-ordered projection: the engine splices this plan where the
    // source relation sat and matches attributes positionally
    Bridge.asStreaming(batch.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftTableSource[$ns.$t, $mode]"
}

/** Structured Streaming SINK into a governed table: micro-batch →
  * snapshot commit, EXACTLY-ONCE. The batch id is carved into the
  * committed data-file names (`stream-<streamId>-b<batchId>…`), so the
  * replay marker travels INSIDE the atomically-published manifest — the
  * Iceberg pattern of stamping the snapshot summary with the epoch id,
  * without a side channel that could diverge from the commit. A
  * restarted query re-offers the last batch; [[GraftTableSink.addBatch]]
  * finds its id already in the manifest and drops it. The marker also
  * carries the streaming QUERY id (stable per checkpoint), so a NEW
  * query with a fresh checkpoint — whose batch ids restart at 0 —
  * writing into a pre-populated table fails loudly instead of having
  * its early batches silently swallowed by the replay guard.
  *
  * Partitioned tables route through the partitioned writer (one file
  * per partition value per batch, partition values in the manifest), so
  * streamed data prunes identically to batch-written data.
  */
class GraftTableSink(root: String, ns: String, t: String,
    streamId: String, statsCols: Seq[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // stable per-checkpoint query id (set by the stream execution thread;
    // absent when addBatch is driven directly, e.g. from a replay test)
    val qid = Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
    val (last, lastQid) = GraftTableSink.lastBatchInfo(root, ns, t, streamId)
    if (batchId <= last) {
      // Spark re-offers at most the LAST committed batch (crash between
      // sink commit and offset-log write) — and only from the same query
      // run. Anything else behind the high-water mark is a fresh
      // checkpoint colliding with a pre-populated table: batch ids
      // restarted at 0, and silently dropping them would lose data.
      val sameRun = (qid, lastQid) match {
        case (Some(a), Some(b)) => a == b
        case _ => true // legacy marker or direct call — can't distinguish
      }
      if (batchId == last && sameRun) return
      throw new IllegalStateException(
        s"graft-table sink: batch $batchId is behind $ns.$t's committed " +
          s"high-water b$last for streamId '$streamId'" +
          lastQid.fold("")(q => s" (written by query $q)") +
          " — a fresh checkpoint is writing into a pre-populated table. " +
          "Resume the original checkpoint, or use a distinct streamId.")
    }
    val batch = Bridge.asBatch(data)
    TableIO.createNamespace(root, ns)
    TableIO.createTableIfNotExists(root, ns, t, batch.schema)
    val seq = TableIO.nextSeq(root, ns, t)
    val tag = GraftTableSink.tag(streamId, batchId, qid)
    val entries = Partitioning.readSpec(root, ns, t) match {
      case Some(spec) =>
        Partitioning.writePartitioned(spark, root, ns, t, batch, spec, seq,
          filePrefix = tag)
      case None =>
        Seq(TableIO.writeExactFile(spark, root, ns, t,
          s"data/$tag.parquet", batch, "data", seq,
          bounds = TableIO.longBounds(batch, statsCols)))
    }
    // an empty batch still commits its marker file (0 rows): the replay
    // guard must see every delivered batch id, rows or not
    TableIO.commit(root, ns, t, entries)
  }

  override def toString: String = s"GraftTableSink[$ns.$t, $streamId]"
}

object GraftTableSink {
  // query id is hyphen-stripped hex so the only '-' in a tag are the
  // field separators — keeps the batch-id regex unambiguous
  private def tag(streamId: String, batchId: Long, qid: Option[String]) =
    f"stream-$streamId-b$batchId%05d" +
      qid.fold("")(q => s"-q${q.replace("-", "")}")

  private val tagRe = """stream-(.+)-b(\d+)(?:-q([0-9a-fA-F]+))?""".r

  /** Highest batch id this stream has committed to the table, read from
    * the manifest (−1 if none) — O(#files) metadata, no data scan.
    */
  def lastBatch(root: String, ns: String, t: String,
      streamId: String): Long = lastBatchInfo(root, ns, t, streamId)._1

  /** (highest committed batch id, query id that wrote it) for this
    * stream — the query id is None for pre-query-id markers or when the
    * table has no commits from this stream.
    */
  def lastBatchInfo(root: String, ns: String, t: String,
      streamId: String): (Long, Option[String]) = {
    if (!TableIO.tableExists(root, ns, t)) return (-1L, None)
    TableIO.readManifest(root, ns, t)
      .flatMap(e => tagRe.findFirstMatchIn(e.path)
        .filter(_.group(1) == streamId)
        .map(m => (m.group(2).toLong, Option(m.group(3)))))
      .foldLeft((-1L, Option.empty[String])) { (acc, cur) =>
        if (cur._1 > acc._1) cur else acc
      }
  }
}
