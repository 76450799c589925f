package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise centroid of float vectors — the building
  * block of IVF index construction (per-label / per-cluster centroids).
  * Demonstrates the engine's custom-aggregate surface
  * (`org.apache.spark.sql.expressions.Aggregator`); the oracle-checked
  * twin (`q_centroid`) uses the exact-decimal built-in formulation since
  * double summation order across partitions is engine-specific.
  */
object VectorCentroid extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
  def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    val s = if (sums.isEmpty) new Array[Double](v.length) else sums
    var i = 0
    while (i < v.length) { s(i) += v(i); i += 1 }
    (s, n + 1)
  }

  def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
