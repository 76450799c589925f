package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional clustering:
  * bit i of column j lands at position i*n + j of the z-value, so
  * sorting by z keeps points close in EVERY dimension close in the
  * sort order — the property that makes per-file [min,max] bounds
  * prunable on each dimension independently (Iceberg/Delta z-order
  * rewrite). Built from shift/and/or primitives only, so the whole
  * interleave stays inside whole-stage codegen — no UDF.
  */
object ZOrder {

  /** Morton code of `cols` (long-castable, non-negative, each below
    * 2^bits). n*bits must fit a signed long.
    */
  def zvalue(cols: Seq[Column], bits: Int = 21): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least two dimensions")
    require(n * bits <= 63, s"$n x $bits interleaved bits exceed a long")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** 2-D Hilbert curve index (the classic xy→d bit walk): like the
    * Morton code it gives every file tight [min,max] bounds on BOTH
    * dimensions, but consecutive curve positions are always GRID
    * neighbors — no quadrant-boundary jumps — so range-partitioned
    * files cover more compact rectangles and skip slightly better on
    * square slices. The walk is stateful (per-level rotation), which
    * pure Column bit-ops can't express without materializing every
    * level; a native codegen expression keeps it one JIT'd loop
    * inside whole-stage codegen (the ShingleHashes precedent).
    */
  def hilbertXY(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the lower quadrant into canonical orientation
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert index of two long-castable, non-negative columns, each
    * below 2^bits (2*bits <= 63).
    */
  def hvalue(xc: Column, yc: Column, bits: Int = 21): Column = {
    require(2 * bits <= 63, s"2 x $bits curve bits exceed a long")
    Bridge.column(HilbertIndex(Bridge.expression(xc.cast("long")),
      Bridge.expression(yc.cast("long")), bits))
  }
}

case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.hilbertXY(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder$$.MODULE$$.hilbertXY($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
