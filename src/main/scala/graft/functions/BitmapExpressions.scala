package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Deletion-vector probe primitives (Iceberg/Delta DV design): a file's
  * deleted positions as a bitmap of 64-bit words (`java.util.BitSet`
  * layout — word w bit b set means position w*64+b is deleted).
  *
  * The probe is a native codegen Expression: a Scala UDF here blocks
  * whole-stage codegen on the scan of EVERY merge-on-read query
  * (VERDICT r1 finding 3); this keeps the per-row filter inside the
  * generated loop as a static call.
  */
object BitmapOps {
  /** Bit `pos` of the word array — false past the end. */
  def contains(words: ArrayData, pos: Long): Boolean = {
    val w = (pos >>> 6).toInt
    w < words.numElements() && ((words.getLong(w) >>> (pos & 63L)) & 1L) == 1L
  }
}

/** bitmap_contains(words: array<bigint>, pos: bigint): boolean. */
case class BitmapContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(words: Any, pos: Any): Any =
    BitmapOps.contains(words.asInstanceOf[ArrayData], pos.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, p) =>
      s"graft.functions.BitmapOps$$.MODULE$$.contains($w, $p)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitmapFunctions {
  /** Column API for BitmapContains. */
  def bitmapContains(words: Column, pos: Column): Column =
    Bridge.column(BitmapContains(Bridge.expression(words), Bridge.expression(pos)))
}
