package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `col.expr` surface;
  * the supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This bridge re-exports the two conversions for graft's
  * custom Catalyst expressions — the standard packaging technique for
  * Spark extensions that ship native expressions — plus the
  * plan-to-DataFrame constructor custom relations need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a hand-built logical plan (e.g. a LogicalRelation
    * wrapping a custom FileIndex) — `Dataset.ofRows` is `private[sql]`.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a native expression as a SQL function on a live session
    * (`sessionState` is `private[sql]`; extensions normally install at
    * session build via `spark.sql.extensions`).
    */
  def registerFunction(spark: SparkSession, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name, usage),
        builder)
}
