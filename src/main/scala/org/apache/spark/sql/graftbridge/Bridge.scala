package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `col.expr` surface;
  * the supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This bridge re-exports the two conversions for graft's
  * custom Catalyst expressions — the standard packaging technique for
  * Spark extensions that ship native expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
