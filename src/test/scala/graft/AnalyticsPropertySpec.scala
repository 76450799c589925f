package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
import graft.functions.StringSim
import graft.operators.Sketches

/** Property tests for the round-10 exact-arithmetic guards: the
  * Jaro-Winkler threshold test must give the same verdict through its
  * long fast path and its BigInt overflow fallback (tau is a RATIO —
  * scaling numerator and denominator together may change the code
  * path, never the answer), and the quantile sketch must be EXACT
  * whenever the group fits inside the sample (bottom-K of n <= K rows
  * is the whole group, so the positional estimate IS the positional
  * quantile).
  */
class AnalyticsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val shortStr =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n,
      Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))

  test("jaroWinklerGe: long fast path == BigInt fallback for every " +
      "tau scaling") {
    val cases = for {
      s <- shortStr
      t <- shortStr
      den <- Gen.choose(1L, 100L)
      num <- Gen.choose(0L, den)
    } yield (s, t, num, den)
    val prop = Prop.forAll(cases) { case (s, t, num, den) =>
      // scaling tau's numerator and denominator together forces the
      // fallback (14*jDen*scale overflows) without changing the ratio
      val f = Long.MaxValue / 20 / den
      StringSim.jaroWinklerGe(u(s), u(t), num, den) ==
        StringSim.jaroWinklerGe(u(s), u(t), num * f, den * f)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200)
        .withInitialSeed(Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("jaroWinklerGe: negative tau always passes, at any magnitude") {
    // r10 advisory: a large-magnitude negative tauNum could slip past
    // the headroom guard (scale ignored its magnitude) and wrap
    // tauNum*10*jDen to a wrong verdict; the short-circuit makes the
    // sign case exact regardless of magnitude
    for (tauNum <- Seq(-1L, -1000L, Long.MinValue + 1, Long.MinValue)) {
      assert(StringSim.jaroWinklerGe(u("abcd"), u("abce"), tauNum, 3L))
      assert(StringSim.jaroWinklerGe(u("abcd"), u("wxyz"), tauNum, 3L))
    }
    // empty-match case keeps its own rule: 0 >= tau iff tauNum <= 0
    assert(StringSim.jaroWinklerGe(u(""), u("x"), -5L, 3L))
    assert(!StringSim.jaroWinklerGe(u(""), u("x"), 5L, 3L))
  }

  test("quantile sketch is exact when the group fits in the sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val groups = for {
      nG <- Gen.choose(1, 3)
      sizes <- Gen.listOfN(nG, Gen.choose(1, 60)) // well under QK=128
      vals <- Gen.sequence[Seq[Seq[Double]], Seq[Double]](
        sizes.map(n => Gen.listOfN(n,
          Gen.choose(0, 10000).map(_ / 10.0)).map(_.toSeq)))
    } yield vals
    val prop = Prop.forAll(groups) { vals =>
      val rows = vals.zipWithIndex.flatMap { case (vs, g) =>
        vs.zipWithIndex.map { case (v, i) =>
          (s"g$g", g * 1000L + i, v)
        }
      }
      val df = rows.toDF("grp", "k", "v")
      val got = Sketches.quantileSketch(df, "grp", col("k"), col("v"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      vals.zipWithIndex.forall { case (vs, g) =>
        val sorted = vs.sorted
        val n = sorted.length
        def positional(q: Int) = // value at rank ceil(n*q/100), 1-based
          sorted(((n * q + 99) / 100).max(1) - 1)
        val (nSample, p50, p95, p50Exact) = got(s"g$g")
        nSample == n.toLong && p50 == positional(50) &&
          p95 == positional(95) && p50Exact == positional(50)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8)
        .withInitialSeed(Seed(11L)), prop)
    assert(res.passed, res.status.toString)
  }
}
