package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
}
