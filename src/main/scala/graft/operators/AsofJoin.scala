package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark's DataFrame API
  * lacks natively. Composed from built-ins per the preference order
  * (compose > custom plan): union both sides tagged by origin, sort each
  * key's timeline once with a window, carry the latest right-side value
  * forward with `last(ignoreNulls)`, and keep the left rows. One shuffle
  * on the key — same cost class as a sort-merge join, no per-key loops,
  * no range explosion — so it scales to 100 TB timelines (the window
  * sort is per key-partition and spills).
  */
object AsofJoin {

  /** For each left row, attach `valueCol` of the right row with the same
    * `keyCol` and the greatest `ordCol` <= the left row's `ordCol`
    * (inclusive semantics, like `ASOF JOIN ... ON l.ord >= r.ord`).
    * Adds `asof_<valueCol>` and `asof_<ordCol>` (null when no earlier
    * right row exists). `ordCol` values should be unique per key on the
    * right side for deterministic results.
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    // right rows tag 0, left rows tag 1: at equal ord the right row
    // sorts first and is therefore visible to the left row (>= match).
    val r = right.select(col(keyCol), col(ordCol),
      lit(0).as("_side"),
      col(valueCol).as("_rv"), col(ordCol).as("_rord"))
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("_rord", lit(null).cast(right.schema(ordCol).dataType))
    val united = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(ordCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    united
      .withColumn("_last_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .withColumn("_last_rord", last(col("_rord"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv", "_rord")
      .withColumnRenamed("_last_rv", s"asof_$valueCol")
      .withColumnRenamed("_last_rord", s"asof_$ordCol")
  }
}
