package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd primitive —
  * the record-linkage workhorse Spark lacks (it ships only
  * levenshtein). The core computes the EXACT Jaro rational in long
  * arithmetic: jNum = m²·|t| + m²·|s| + (m-tr)·|s|·|t| over
  * jDen = 3·|s|·|t|·m, with the Winkler prefix boost folded in as
  * (10·jNum + L·(jDen-jNum)) / (10·jDen). Conventions follow the
  * classic algorithm (and DuckDB's jaro_winkler_similarity, the
  * oracle): match window max(|s|,|t|)/2 - 1, greedy left-to-right
  * matching, transpositions = (mismatched matched positions) / 2
  * with INTEGER halving, prefix capped at 4, boost only when
  * jaro > 0.7 (strict), empty input -> 0.0 (even for two empties).
  *
  * [[JaroWinklerGe]] does the threshold test entirely in long
  * arithmetic (tau = tauNum/tauDen) — no float round-off at the
  * decision boundary — which is what the oracle-checked fuzzy-join
  * query uses. [[JaroWinkler]] returns the similarity as ONE IEEE
  * division of the two exact longs (deterministic, but a different
  * rounding path than engines that compute j then boost in floats —
  * filter with [[JaroWinklerGe]] when comparing against them).
  *
  * Long-range bound: jDen = 3·|s|·|t|·m <= 3·L³ stays inside a Long
  * up to L ~ 1.4e6 chars per side, enforced loudly in [[jaroParts]]
  * (far beyond linkage keys; time is O(|s|·window) anyway, so this is
  * not a document-scale primitive). [[JaroWinklerGe]]'s comparison
  * multiplies by tauDen on top of that, so it guards its own headroom
  * and falls back to an exact BigInt comparison when
  * 14·jDen·max(tauNum, tauDen) could overflow — correctness never
  * depends on tauDen staying small.
  */
object StringSim {
  /** (jNum, jDen, prefixLen), or (0,0,0) when there are no matches. */
  def jaroParts(sU: UTF8String, tU: UTF8String): Array[Long] = {
    val s = sU.toString
    val t = tU.toString
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return Array(0L, 0L, 0L)
    // jNum <= 3·L³ must stay inside a Long: fail loudly rather than
    // silently wrap (house discipline for out-of-envelope inputs)
    require(math.max(l1, l2) <= 1400000,
      s"jaro-winkler inputs limited to 1.4e6 chars (got $l1, $l2): " +
        "the exact long rational 3*|s|*|t|*m would overflow")
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val sM = new Array[Boolean](l1)
    val tM = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!tM(j) && s.charAt(i) == t.charAt(j)) {
          sM(i) = true; tM(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return Array(0L, 0L, 0L)
    var k = 0
    var diffs = 0
    i = 0
    while (i < l1) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) diffs += 1
        k += 1
      }
      i += 1
    }
    val tr = diffs / 2
    val mL = m.toLong
    val jNum = mL * mL * l2 + mL * mL * l1 + (mL - tr) * l1.toLong * l2
    val jDen = 3L * l1 * l2 * mL
    var l = 0
    val maxPref = math.min(4, math.min(l1, l2))
    while (l < maxPref && s.charAt(l) == t.charAt(l)) l += 1
    Array(jNum, jDen, l)
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val p = jaroParts(a, b)
    if (p(1) == 0L) return 0.0
    val jNum = p(0); val jDen = p(1); val l = p(2)
    if (10L * jNum > 7L * jDen)
      (10L * jNum + l * (jDen - jNum)).toDouble / (10L * jDen).toDouble
    else jNum.toDouble / jDen.toDouble
  }

  def jaroWinklerGe(a: UTF8String, b: UTF8String,
      tauNum: Long, tauDen: Long): Boolean = {
    val p = jaroParts(a, b)
    if (p(1) == 0L) return tauNum <= 0L
    // tau < 0 always passes (the similarity is a nonnegative
    // rational) — and must short-circuit HERE: the headroom guard
    // below scales by max(tauNum, tauDen), which ignores the
    // MAGNITUDE of a negative tauNum, so a large-negative tau could
    // satisfy the guard yet wrap tauNum·10·jDen in the fast path
    // (r10 advisory; latent — all call sites pass tau >= 0).
    if (tauNum < 0L) return true
    val jNum = p(0); val jDen = p(1); val l = p(2)
    // Headroom: the boosted numerator is <= 14·jDen (jNum <= jDen,
    // prefix <= 4), so every product below fits a Long iff
    // 14·jDen·max(tauNum, tauDen) does. Otherwise compare in BigInt —
    // exact at any tau scale, just slower on pathological inputs.
    // tauNum is nonnegative past the short-circuit above.
    val scale = math.max(math.max(tauNum, tauDen), 1L)
    if (jDen <= Long.MaxValue / 14L / scale) {
      if (10L * jNum > 7L * jDen)
        (10L * jNum + l * (jDen - jNum)) * tauDen >= tauNum * 10L * jDen
      else jNum * tauDen >= tauNum * jDen
    } else {
      val bn = BigInt(jNum); val bd = BigInt(jDen)
      if (bn * 10 > bd * 7)
        (bn * 10 + BigInt(l) * (bd - bn)) * tauDen >= BigInt(tauNum) * 10 * bd
      else bn * tauDen >= BigInt(tauNum) * bd
    }
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim$$.MODULE$$.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerGe(left: Expression, right: Expression,
    tauNum: Long, tauDen: Long) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinklerGe(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], tauNum, tauDen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim$$.MODULE$$.jaroWinklerGe($a, $b, ${tauNum}L, ${tauDen}L)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Column API: Jaro-Winkler similarity (string, string -> double). */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: exact-rational threshold test jw >= tauNum/tauDen. */
  def jaroWinklerGe(a: Column, b: Column, tauNum: Long, tauDen: Long): Column =
    Bridge.column(JaroWinklerGe(Bridge.expression(a), Bridge.expression(b),
      tauNum, tauDen))
}
