package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, HashFunctions}

/** SQL-registered native functions must plan the same expressions as
  * the DataFrame API — one implementation, two surfaces.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("SQL and DataFrame surfaces agree on every exposed function") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("the quick brown fox jumps over the lazy dog", 1L),
        ("a b", 2L), ("", 3L))
      .toDF("text", "id").createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_polyhash(text) AS h,
        |  graft_word_hashes(split(text, ' ')) AS wh,
        |  graft_simhash32(graft_word_hashes(split(text, ' '))) AS sh,
        |  graft_shingle_hashes(split(text, ' '), 3) AS sh3,
        |  graft_normalize(upper(text)) AS nrm
        |FROM fn_docs ORDER BY id""".stripMargin).collect()
    val viaDf = spark.table("fn_docs")
      .select(col("id"), HashFunctions.polyHash(col("text")).as("h"),
        HashFunctions.wordHashes(split(col("text"), " ")).as("wh"),
        HashFunctions.simhash32(
          HashFunctions.wordHashes(split(col("text"), " "))).as("sh"),
        HashFunctions.shingleHashes(split(col("text"), " "), 3).as("sh3"),
        HashFunctions.normalizeText(upper(col("text"))).as("nrm"))
      .orderBy("id").collect()
    viaSql.zip(viaDf).foreach { case (a, b) => assert(a == b) }
  }

  test("jaro-winkler matches the classic reference values") {
    import graft.functions.StringSim
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = StringSim.jaroWinkler(u(a), u(b))
    // canonical pairs, values cross-checked against DuckDB's
    // jaro_winkler_similarity (the oracle engine)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-15)
    assert(math.abs(jw("duane", "dwayne") - 0.8400000000000001) < 1e-12)
    // integer transposition halving: 3 mismatched positions -> tr=1
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444444444) < 1e-15)
    // no boost below jaro 0.7 even with a common prefix
    assert(math.abs(jw("abcdxxxx", "abcdyyyyzzzz") - 0.611111111111111) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0 && jw("a", "") == 0.0 && jw("", "") == 0.0)
    // the exact-rational threshold test agrees with the double at
    // non-boundary taus
    assert(StringSim.jaroWinklerGe(u("martha"), u("marhta"), 96, 100))
    assert(!StringSim.jaroWinklerGe(u("martha"), u("marhta"), 97, 100))
    // threshold exactly ON the value: rational test includes it
    assert(StringSim.jaroWinklerGe(u("duane"), u("dwayne"), 84, 100))
    // huge tauDen exceeds the long-arithmetic headroom guard and takes
    // the exact BigInt path — same verdicts as the scaled-down tau
    val bigDen = Long.MaxValue / 10
    assert(StringSim.jaroWinklerGe(u("martha"), u("marhta"),
      bigDen / 100 * 96, bigDen))
    assert(!StringSim.jaroWinklerGe(u("martha"), u("marhta"),
      bigDen / 100 * 97, bigDen))
    // out-of-envelope input fails loudly instead of wrapping
    val huge = "x" * 1500000
    val ex = intercept[IllegalArgumentException] {
      StringSim.jaroWinkler(u(huge), u(huge))
    }
    assert(ex.getMessage.contains("1.4e6"))
  }

  test("the SQL surface is Catalyst-native: foldable and codegen'd") {
    GraftFunctions.register(spark)
    // a literal argument CONSTANT-FOLDS at plan time ('x' -> 120) —
    // only a real Catalyst expression gets that treatment; a UDF stays
    // opaque to the optimizer
    val folded = spark.sql("SELECT graft_polyhash('x') AS h")
      .queryExecution.executedPlan.toString
    assert(folded.contains("120 AS h"), folded)
    // over a real operator (Range), the projection runs inside
    // whole-stage codegen (the starred `*(n)` stage prefix)
    val plan = spark.sql(
      "SELECT graft_polyhash(CAST(id AS STRING)) AS h FROM range(10)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"),
      plan)
  }

  test("extensions entry point injects the same registry") {
    // the injection list and the live-register list must stay in sync
    assert(GraftFunctions.all.map(_._1).distinct.size ==
      GraftFunctions.all.size)
    assert(GraftFunctions.all.map(_._1).forall(_.startsWith("graft_")))
  }
}
