package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the portable text-hash primitives.
  *
  * The pure higher-order-function formulation
  * (`aggregate(transform(split(s, '')...))`) is semantically identical
  * but runs interpreted per character — measured 100x slower on long
  * documents. These expressions keep the identical modular arithmetic
  * (so the DuckDB oracle still reproduces every value exactly) inside a
  * JIT-compiled loop, invoked from generated code via a static helper so
  * whole-stage codegen spans are preserved.
  */
object HashExprs {
  final val P = 1000000007L
  final val Base = 31L

  /** Polynomial rolling hash over Unicode codepoints — the exact fold
    * DuckDB computes as list_reduce(list_transform(string_split(s, ''),
    * c -> unicode(c)), (a,b) -> (a*31+b) % P).
    */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * Base + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** 32-bit SimHash from an array of word hashes: bit i set iff more
    * than half the words have bit i set.
    */
  def simhash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 32) {
        counts(i) += ((h >> i) & 1L).toInt
        i += 1
      }
      j += 1
    }
    var sim = 0L
    var i = 0
    while (i < 32) {
      if (2L * counts(i) > n) sim |= (1L << i)
      i += 1
    }
    sim
  }
}

case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashExprs.polyHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashExprs$$.MODULE$$.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashExprs.simhash32(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashExprs$$.MODULE$$.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** Column API for PolyHash (string -> bigint). */
  def polyHash(c: Column): Column = Bridge.column(PolyHash(Bridge.expression(c)))

  /** Column API for SimHash32 (array<bigint> -> bigint). */
  def simhash32(c: Column): Column = Bridge.column(SimHash32(Bridge.expression(c)))
}
