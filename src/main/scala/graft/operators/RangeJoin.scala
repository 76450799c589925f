package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — matches rows whose ordering values fall
  * within a radius, WITHOUT an equi key. A naive theta join
  * (`p.t BETWEEN c.t - r AND c.t`) plans as a nested-loop over n*m
  * pairs; the scalable shape buckets the ordering value at width == r so
  * every qualifying pair shares one of two adjacent buckets, turning the
  * range predicate into an equi-join on the bucket plus an exact filter:
  * one key shuffle, candidates linear in the true match count (this is
  * the standard bucketed range-join optimization, e.g. Spark's own
  * range-join hints on Databricks / the interval-join of stream
  * processors).
  */
object RangeJoin {

  /** For each left row (keyed `idCol`, ordered `t`), aggregate the right
    * rows with `t` in `[left.t - radius, left.t]`: match count and exact
    * decimal sum of `valueCol`. Left rows with no match drop out (inner
    * semantics). Bucket membership: a right row at bucket `b = t DIV
    * radius` can only match left rows in buckets `b` or `b + 1`, so each
    * left row probes its own and the preceding bucket — exactly one of
    * the two equi-join branches can match a given right row, no dedup
    * needed.
    */
  def aggregateInRange(left: DataFrame, right: DataFrame, idCol: String,
      radius: Long, valueCol: String): DataFrame = {
    val l = left.select(col(idCol), col("t"),
      explode(array(expr(s"t DIV $radius"), expr(s"t DIV $radius - 1")))
        .as("_b"))
    val r = right.select(col("t").as("_rt"),
      col(valueCol).as("_rv"),
      expr(s"t DIV $radius").as("_b"))
    l.join(r, "_b")
      .filter(col("_rt") >= col("t") - radius && col("_rt") <= col("t"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_matches"),
        sum(col("_rv").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy(idCol)
  }
}
