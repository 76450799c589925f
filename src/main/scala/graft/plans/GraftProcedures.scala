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
