package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

/** The engine's native Catalyst expressions exposed as SQL functions, so
  * `spark.sql("... graft_polyhash(text) ...")` plans the same
  * whole-stage-codegen expression the DataFrame API uses. Two install
  * paths, both standard Spark extension technique:
  *
  *   - `GraftSparkExtensions` for session build time
  *     (`spark.sql.extensions=graft.functions.GraftSparkExtensions`),
  *   - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {

  /** (name, arity description, builder) for every exposed expression. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_polyhash", "graft_polyhash(str) - portable rolling hash",
      c => PolyHash(c.head)),
    ("graft_simhash32", "graft_simhash32(word_hashes) - 32-bit SimHash",
      c => SimHash32(c.head)),
    ("graft_word_hashes", "graft_word_hashes(words) - per-word polyhash",
      c => WordHashes(c.head)),
    ("graft_shingle_hashes",
      "graft_shingle_hashes(words, n) - hashed word n-grams",
      c => ShingleHashes(c.head, c(1).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"shingle width must be an integer literal, got $other")
      })),
    ("graft_dot_f32", "graft_dot_f32(a, b) - float-array dot product",
      c => DotF32(c(0), c(1))),
    ("graft_bitmap_contains",
      "graft_bitmap_contains(words, pos) - deletion-vector probe",
      c => BitmapContains(c(0), c(1))),
    ("graft_normalize",
      "graft_normalize(str) - one-pass dedup text normalization",
      c => NormalizeText(c.head)),
    ("graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity",
      c => JaroWinkler(c(0), c(1))),
    ("graft_hilbert",
      "graft_hilbert(x, y) - 2-D Hilbert curve index (21 bits/dim)",
      // explicit long casts: the expression core is long-typed and the
      // SQL surface should accept int columns/literals
      c => HilbertIndex(
        org.apache.spark.sql.catalyst.expressions.Cast(c(0),
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(c(1),
          org.apache.spark.sql.types.LongType), 21))
  )

  /** Install on a live session's function registry. */
  def register(spark: SparkSession): Unit = all.foreach {
    case (name, usage, builder) =>
      Bridge.registerFunction(spark, name, usage, builder)
  }

  /** Install through the SparkSessionExtensions injection points. */
  def inject(e: SparkSessionExtensions): Unit = all.foreach {
    case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage), builder))
  }
}

/** `spark.sql.extensions` entry point: native SQL functions plus the
  * row-level DML rule (MERGE INTO / UPDATE / predicate DELETE over
  * [[graft.plans.GraftCatalog]] tables, executed merge-on-read).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(e)
    e.injectResolutionRule(s => new graft.plans.GraftRowLevelSqlRule(s))
  }
}
