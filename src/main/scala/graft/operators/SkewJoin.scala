package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys. AQE's skew-join handles most cases at
  * runtime; explicit salting is the deterministic fallback when one key
  * dominates so heavily that even split shuffle blocks overwhelm a task
  * (the classic 100 TB hot-key problem).
  *
  * Left rows get a deterministic salt in [0, factor); right rows are
  * replicated `factor` times (one per salt) so every (key, salt) bucket
  * joins locally. Join cardinality and results are identical to the
  * unsalted join; the shuffle key space is `factor`x wider.
  */
object SkewJoin {

  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 0)
    // deterministic per-row salt: stable hash of the whole left row
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(factor)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
