package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The one-pass dual-shape guards (r18, VERDICT r17 item 4) must read
  * EXACTLY the numbers the two single-shape guards read — the routers'
  * comparisons (and their SQL oracle replays) are defined over those
  * integers, so any divergence re-routes silently. Pinned on a mixed
  * clone-dense/unique corpus (both shapes' buckets non-trivial) and on
  * the empty corpus (the null-sum edge both implementations must map
  * to zeros). Package graft.operators: the single-shape guards are
  * operator-private by design.
  */
class DualGuardSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("text dual-shape guard equals the two single-shape guards, " +
      "including the empty corpus") {
    val boiler = spark.range(5000L).selectExpr("id AS doc_id",
      """CASE WHEN id % 10 = 0
        |  THEN concat('boilerplate template number ', id % 100,
        |              ' repeated across the crawl')
        |  ELSE concat('unique document ', id, ' body text words here')
        |END AS text""".stripMargin)
    val sig = Dedup.minhashSignatures(boiler).cache()
    sig.count()
    val (bp4, br4) = Dedup.sigBandVolume(sig, 4)
    val (bp2, _) = Dedup.sigBandVolume(sig, 2)
    assert(Dedup.sigBandVolumeDual(sig) == ((bp4, br4, bp2)))
    // the corpus exercises both regimes: clone buckets past the cap
    // and a unique tail (a degenerate fixture would pin nothing)
    assert(bp4 > br4 && bp2 > 0)
    sig.unpersist()

    val empty = boiler.filter("doc_id < 0")
    assert(Dedup.sigBandVolumeDual(Dedup.minhashSignatures(empty))
      == ((0L, 0L, 0L)))
  }

  test("embedding dual-shape guard equals the two single-shape guards, " +
      "including the empty corpus") {
    import org.apache.spark.sql.functions._
    val emb = spark.range(800L).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
             |  i -> CAST((pmod(xxhash64(id % 40, i), 1000) - 500) / 500.0
             |       AS FLOAT))""".stripMargin).as("embedding"))
    def one(bands: Int, r: Int): (Long, Long) = {
      val st = Similarity.bandStatsRaw(emb, bands, r).head()
      (if (st.isNullAt(0)) 0L else st.getLong(0),
        if (st.isNullAt(1)) 0L else st.getLong(1))
    }
    val (bp16, br16) = one(16, 4)
    val (bp8, _) = one(8, 8)
    assert(Similarity.bandStatsDual(emb, 16, 4) == ((bp16, br16, bp8)))
    // id % 40 makes 20-deep sign-identical groups: both shapes carry
    // real collision mass
    assert(bp16 > br16 && bp8 > 0)

    val empty = emb.filter("vec_id < 0")
    assert(Similarity.bandStatsDual(empty, 16, 4) == ((0L, 0L, 0L)))
    // no halved shape exists at odd band counts — the router falls
    // back to the single-shape guard; the dual must refuse loudly
    intercept[IllegalArgumentException](
      Similarity.bandStatsDual(emb, 3, 4))
  }
}
