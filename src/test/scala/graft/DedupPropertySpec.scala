package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.operators.Dedup

/** Property tests for the probabilistic cross-corpus dedup paths: for
  * random corpora (shared vocabulary so fingerprint overlap actually
  * occurs, duplicate incoming ids allowed, tiny blooms forcing real
  * false positives), the bloom-prefiltered result must be ROW-identical
  * to the plain anti-join — the no-false-negatives + exact-confirm
  * contract, checked across many shapes rather than one fixture.
  */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")
  private val text = for {
    n <- Gen.choose(1, 6)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  private case class Corpus(incoming: Seq[(Long, String)],
      existing: Seq[(Long, String)], bits: Int)

  private val corpora: Gen[Corpus] = for {
    nIn <- Gen.choose(1, 15)
    nEx <- Gen.choose(0, 15)
    // ids drawn from a small range: duplicate incoming doc_ids are
    // likely, exercising the multiplicity re-expansion
    inRows <- Gen.listOfN(nIn, Gen.zip(Gen.choose(1L, 8L), text))
    exRows <- Gen.listOfN(nEx, Gen.zip(Gen.choose(100L, 120L), text))
    bits <- Gen.oneOf(64, 128, 1 << 10)
  } yield Corpus(inRows, exRows, bits)

  test("bloom prefilter == plain anti-join for random corpora, " +
      "duplicate ids, and tiny blooms") {
    import spark.implicits._
    val prop = Prop.forAll(corpora) { c =>
      val incoming = c.incoming.toDF("doc_id", "text")
      val existing = c.existing.toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      rows(Dedup.bloomPrefilterNew(incoming, existing, bits = c.bits)) ==
        rows(Dedup.crossCorpusNew(incoming, existing))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  // Longer repeated-phrase texts so some pairs actually clear the
  // 4-shingle / tau=0.8 bar; perturbations keep others below it.
  private val nearDupCorpus: Gen[Seq[(Long, String)]] = for {
    nBase <- Gen.choose(2, 5)
    bases <- Gen.listOfN(nBase, Gen.listOfN(8, word).map(_.mkString(" ")))
    variants <- Gen.listOfN(nBase, Gen.zip(Gen.choose(0, 2), word))
  } yield bases.zip(variants).zipWithIndex.flatMap {
    case ((b, (kind, wd)), i) =>
      val copy = kind match {
        case 0 => b // exact copy
        case 1 => s"$b $wd" // one-word append
        case _ => s"$wd $b $wd $wd" // wrapped
      }
      Seq((i * 10L, b), (i * 10L + 1, copy))
  }

  test("prefix-filtered Jaccard == full inverted-join Jaccard " +
      "for random near-dup corpora") {
    import spark.implicits._
    val prop = Prop.forAll(nearDupCorpus) { rows =>
      val docs = rows.toDF("doc_id", "text")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq.sorted
      pairs(Dedup.prefixJaccard(docs)) == pairs(Dedup.ngramJaccard(docs))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10)
        .withInitialSeed(Seed(7L)),
      prop)
    assert(res.passed, res.status.toString)
  }
}
