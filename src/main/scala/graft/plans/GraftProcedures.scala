package graft.plans

import java.util.Collections
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalog maintenance procedures (Spark 4 `ProcedureCatalog` — the
  * same front door Iceberg exposes as `CALL cat.system.<proc>(...)`):
  *
  * {{{
  *   CALL g.system.create_ref('ns.t', 'v1-release', 'tag', 3)
  *   CALL g.system.create_ref('ns.t', 'dev', 'branch', 4)
  *   CALL g.system.drop_ref('ns.t', 'dev')
  *   CALL g.system.rollback('ns.t', 2)
  * }}}
  *
  * All are O(metadata) pointer operations on refs.json / the manifest
  * chain ([[TableIO.setRef]] / [[TableIO.rollback]]) — table size never
  * matters. Each returns its result as a driver-local scan (the
  * procedure-output shape Spark renders as the CALL's result set).
  */
private[plans] abstract class GraftProcedure(override val name: String,
    params: Seq[ProcedureParameter], out: StructType)
    extends UnboundProcedure with BoundProcedure {
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters: Array[ProcedureParameter] = params.toArray
  override def isDeterministic: Boolean = false

  protected def run(args: InternalRow): Seq[InternalRow]

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val result = run(input).toArray
    Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = result
      override def readSchema(): StructType = out
    }).iterator()
  }

  protected def str(n: String): ProcedureParameter =
    ProcedureParameter.in(n, StringType).build()
  protected def lng(n: String): ProcedureParameter =
    ProcedureParameter.in(n, LongType).build()
  protected def nsTable(args: InternalRow): (String, String) = {
    val full = args.getUTF8String(0).toString
    full.split('.') match {
      case Array(ns, t) => (ns, t)
      case _ => throw new IllegalArgumentException(
        s"table must be 'namespace.table', got '$full'")
    }
  }
  protected def utf(s: String): UTF8String = UTF8String.fromString(s)
}

/** `create_ref(table, ref, ref_type, version)`: tag (immutable) or
  * branch (re-pointable) at a snapshot version; version -1 = current.
  */
private[plans] class CreateRefProcedure(root: String)
    extends GraftProcedure("create_ref",
      Seq.empty, StructType(Seq(
        StructField("name", StringType),
        StructField("type", StringType),
        StructField("version", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("table"), str("ref"), str("ref_type"), lng("version"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val (ns, t) = nsTable(args)
    val ref = args.getUTF8String(1).toString
    val refType = args.getUTF8String(2).toString
    val v0 = args.getLong(3)
    val v = if (v0 < 0) TableIO.currentVersion(root, ns, t) else v0
    TableIO.setRef(root, ns, t, ref, refType, v)
    Seq(new GenericInternalRow(Array[Any](utf(ref), utf(refType), v)))
  }
}

/** `drop_ref(table, ref)`: remove a branch or tag pointer. */
private[plans] class DropRefProcedure(root: String)
    extends GraftProcedure("drop_ref",
      Seq.empty, StructType(Seq(StructField("dropped", StringType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("table"), str("ref"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val (ns, t) = nsTable(args)
    val ref = args.getUTF8String(1).toString
    TableIO.dropRef(root, ns, t, ref)
    Seq(new GenericInternalRow(Array[Any](utf(ref))))
  }
}

/** `rollback(table, version)`: publish a new snapshot equal to the old
  * one — history preserved, O(manifest) metadata.
  */
private[plans] class RollbackProcedure(root: String)
    extends GraftProcedure("rollback",
      Seq.empty, StructType(Seq(
        StructField("rolled_back_to", LongType),
        StructField("current_version", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("table"), lng("version"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val (ns, t) = nsTable(args)
    val to = args.getLong(1)
    val now = TableIO.rollback(root, ns, t, to)
    Seq(new GenericInternalRow(Array[Any](to, now)))
  }
}

/** `expire_snapshots(table, keep_from_version)`: drop manifests below
  * the horizon plus every file only they referenced; branch/tag-pinned
  * snapshots survive ([[Maintenance.expireSnapshots]]). O(metadata).
  */
private[plans] class ExpireSnapshotsProcedure(root: String)
    extends GraftProcedure("expire_snapshots",
      Seq.empty, StructType(Seq(
        StructField("deleted_files", LongType),
        StructField("keep_from_version", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("table"), lng("keep_from_version"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val (ns, t) = nsTable(args)
    val keepFrom = args.getLong(1)
    val removed = Maintenance.expireSnapshots(root, ns, t, keepFrom)
    Seq(new GenericInternalRow(Array[Any](removed.size.toLong, keepFrom)))
  }
}

/** `remove_orphan_files(table)`: delete data/delete files no manifest
  * version references (crashed-write debris). Always safe — an orphan
  * was never committed, so no read at any version can see it.
  */
private[plans] class RemoveOrphanFilesProcedure(root: String)
    extends GraftProcedure("remove_orphan_files",
      Seq.empty, StructType(Seq(StructField("deleted_files", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("table"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val (ns, t) = nsTable(args)
    val removed = Maintenance.removeOrphanFiles(root, ns, t)
    Seq(new GenericInternalRow(Array[Any](removed.size.toLong)))
  }
}

/** `rewrite_data_files(table, target_file_count)`: full merge-on-read
  * compaction into `target_file_count` files (0 = halve), committed as
  * one replacing snapshot ([[Maintenance.compact]]). The one procedure
  * here that reads data — a distributed MOR scan + repartitioned
  * write, the Iceberg `rewrite_data_files` action.
  */
private[plans] class RewriteDataFilesProcedure(root: String)
    extends GraftProcedure("rewrite_data_files",
      Seq.empty, StructType(Seq(
        StructField("new_version", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("table"), lng("target_file_count"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val (ns, t) = nsTable(args)
    val target = args.getLong(1).toInt
    val spark = org.apache.spark.sql.SparkSession.active
    val v = Maintenance.compact(spark, root, ns, t, targetFileCount = target)
    Seq(new GenericInternalRow(Array[Any](v)))
  }
}

/** `rewrite_position_deletes(table)`: fold accumulated pos-delete
  * files into per-data-file deletion vectors so scans probe one bitmap
  * instead of N sorted lists ([[Maintenance.rewritePositionDeletes]]).
  */
private[plans] class RewritePositionDeletesProcedure(root: String)
    extends GraftProcedure("rewrite_position_deletes",
      Seq.empty, StructType(Seq(
        StructField("new_version", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("table"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val (ns, t) = nsTable(args)
    val spark = org.apache.spark.sql.SparkSession.active
    val v = Maintenance.rewritePositionDeletes(spark, root, ns, t)
    Seq(new GenericInternalRow(Array[Any](v)))
  }
}

/** `compact_dead_files(table)`: drop data files whose EVERY row is
  * position-deleted (the `mor_delete_stats` deleted_frac = 1.0 queue)
  * and purge their now-dangling delete rows
  * ([[Maintenance.compactDeadFiles]]). Decided from manifest metadata
  * + delete files only — the dropped data files are never read.
  */
private[plans] class CompactDeadFilesProcedure(root: String)
    extends GraftProcedure("compact_dead_files",
      Seq.empty, StructType(Seq(
        StructField("new_version", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("table"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val (ns, t) = nsTable(args)
    val spark = org.apache.spark.sql.SparkSession.active
    val v = Maintenance.compactDeadFiles(spark, root, ns, t)
    Seq(new GenericInternalRow(Array[Any](v)))
  }
}

// --- LLM-pipeline operators as SQL procedures --------------------------
// The dedup / ANN / BM25 families were Scala-API only (VERDICT r4 item
// 7): a SQL-only user could not invoke them. `CALL g.system.<op>(...)`
// is the same front door the maintenance procedures use. The `source`
// argument resolves to a governed table (`ns.table`) or a raw parquet
// path (anything containing '/'). The distributed work runs exactly the
// Scala operator's plan; only the (k- or limit-bounded) RESULT surfaces
// through the procedure's driver-local scan.

private[plans] object ProcedureSource {
  def df(root: String, src: String): org.apache.spark.sql.DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    if (src.contains("/")) spark.read.parquet(src)
    else src.split('.') match {
      case Array(ns, t) => Mor.read(spark, root, ns, t)
      case _ => throw new IllegalArgumentException(
        s"source must be 'namespace.table' or a parquet path, got '$src'")
    }
  }
}

/** `bm25_search(source, terms, k)`: BM25 top-k over a corpus with
  * `doc_id`/`text` columns; `terms` is a space-separated query. Same
  * scoring as [[graft.operators.Retrieval.bm25TopK]], k rows out.
  */
private[plans] class Bm25SearchProcedure(root: String)
    extends GraftProcedure("bm25_search",
      Seq.empty, StructType(Seq(
        StructField("doc_id", LongType),
        StructField("score", DoubleType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("source"), str("terms"), lng("k"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val docs = ProcedureSource.df(root, args.getUTF8String(0).toString)
    val terms = args.getUTF8String(1).toString
      .split(' ').filter(_.nonEmpty).toSeq
    val k = args.getLong(2).toInt
    graft.operators.Retrieval.bm25TopK(docs, terms, k)
      .collect().map(r => new GenericInternalRow(
        Array[Any](r.getLong(0), r.getDouble(1)))).toSeq
  }
}

/** `ann_topk(source, query_id, k)`: exact cosine top-k neighbors of
  * `query_id` over a corpus with `vec_id`/`embedding`/`label` columns
  * ([[graft.operators.Similarity.bruteTopK]]), k rows out.
  */
private[plans] class AnnTopKProcedure(root: String)
    extends GraftProcedure("ann_topk",
      Seq.empty, StructType(Seq(
        StructField("vec_id", LongType),
        StructField("sim", DoubleType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("source"), lng("query_id"), lng("k"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val emb = ProcedureSource.df(root, args.getUTF8String(0).toString)
    val q = args.getLong(1)
    val k = args.getLong(2).toInt
    graft.operators.Similarity.bruteTopK(emb, q, k)
      .select("vec_id", "sim")
      .collect().map(r => new GenericInternalRow(
        Array[Any](r.getLong(0), r.getDouble(1)))).toSeq
  }
}

/** `dedup_fingerprint(source, limit)`: normalized-text fingerprint
  * dedup census over a corpus with `doc_id`/`text` columns
  * ([[graft.operators.Dedup.fingerprint]]) — one row per distinct
  * fingerprint (keeper id, fingerprint, copy count), first `limit`
  * rows by keeper id. The full-corpus result set stays distributed;
  * the SQL surface is the bounded inspection window.
  */
private[plans] class DedupFingerprintProcedure(root: String)
    extends GraftProcedure("dedup_fingerprint",
      Seq.empty, StructType(Seq(
        StructField("doc_id", LongType),
        StructField("fp", StringType),
        StructField("n_copies", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("source"), lng("limit"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val docs = ProcedureSource.df(root, args.getUTF8String(0).toString)
    val limit = args.getLong(1).toInt
    graft.operators.Dedup.fingerprint(docs).limit(limit)
      .collect().map(r => new GenericInternalRow(
        Array[Any](r.getLong(0), utf(r.getString(1)), r.getLong(2)))).toSeq
  }
}

/** `refresh_mv(view)`: recompute a registered materialized view from
  * its base table and re-pin the freshness version, so the
  * [[MvRewrite]] substitution serves it again after base DML — the
  * SQL front door closing the maintain-then-rewrite loop.
  */
private[plans] class RefreshMvProcedure
    extends GraftProcedure("refresh_mv",
      Seq.empty, StructType(Seq(
        StructField("view", StringType),
        StructField("pinned_version", LongType)))) {
  override def parameters: Array[ProcedureParameter] =
    Array(str("view"))
  override def run(args: InternalRow): Seq[InternalRow] = {
    val name = args.getUTF8String(0).toString
    val spark = org.apache.spark.sql.SparkSession.active
    val v = MvRewrite.refresh(spark, name)
    Seq(new GenericInternalRow(Array[Any](utf(name), v)))
  }
}
