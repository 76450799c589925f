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
