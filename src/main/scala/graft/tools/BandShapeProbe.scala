package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MEASUREMENT harness for VERDICT r16 item 1 (density-adaptive
  * banding): what do the router guard aggregates actually READ — at
  * BOTH candidate band shapes — on the corpora that must route each
  * way? The adaptive rule must (a) keep every production testdata
  * corpus bit-identical (exact route), (b) send the adversarial dense
  * eval corpora to the re-banded capped branch the r16 ledger measured
  * at 0.97 recall, and (c) be a pure function of the stats the guard
  * already computes. This probe prints those stats so the thresholds
  * are chosen from measurement, not guessed.
  *
  * Embedding side: 16 bands x 4 sign bits ("16x4") vs the re-banded
  * 8 bands x 8 bits ("8x8"). Text side: the MinHash 4 bands x 4 rows
  * ("4x4") vs 2 bands x 8 rows ("2x8").
  */
object BandShapeProbe {
  // the REAL banding the embedding routers read — not a probe-local
  // copy (r17 advice: the text side already calls Dedup.sigBands for
  // exactly this reason; a hand copy of the 16x4/8x8 key layout would
  // calibrate thresholds against stale code if the layout changed)
  private def embBands(emb: DataFrame, bands: Int, r: Int): DataFrame =
    graft.operators.Similarity.bandKeys(emb, bands, r)

  /** (bp = sum cnt^2, br = sum cnt, maxBucket) over (band, key). */
  private def stats(bandRows: DataFrame): (Long, Long, Long) = {
    val st = bandRows.groupBy("band", "key").agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt") * col("cnt")), sum(col("cnt")), max(col("cnt")))
      .head()
    (if (st.isNullAt(0)) 0L else st.getLong(0),
      if (st.isNullAt(1)) 0L else st.getLong(1),
      if (st.isNullAt(2)) 0L else st.getLong(2))
  }

  private def report(name: String, shape: String, s: (Long, Long, Long),
      cap: Int = 8): Unit = {
    val (bp, br, mx) = s
    val depth = if (br == 0) 0.0 else bp.toDouble / br
    println(f"[bandshape] $name%-28s $shape%5s bp=$bp%14d br=$br%10d " +
      f"maxBucket=$mx%8d meanDepth=$depth%12.1f  bp/(br*cap)=${
        if (br == 0) 0.0 else bp.toDouble / (br * cap)}%10.2f")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- embedding side -------------------------------------------
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def dense(copies: Int, stride: Int): DataFrame =
      emb.filter(pmod(col("vec_id"), lit(stride.toLong)) === 0L &&
          col("vec_id") < lit(graft.operators.Similarity.MaxEvalBaseId))
        .select(col("vec_id"), col("embedding"),
          explode(array((0 until copies).map(lit): _*)).as("c"))
        .select((col("vec_id") * copies + col("c")).as("vec_id"),
          col("embedding"))
    val embCorpora = Seq(
      "base" -> emb,
      "dense c10 s10 (eval ledger)" -> dense(10, 10),
      "dense c30 s10" -> dense(30, 10),
      "dense c125 s10" -> dense(125, 10))
    for ((nm, df) <- embCorpora) {
      val d = df.cache()
      d.count()
      report(s"emb/$nm", "16x4", stats(embBands(d, 16, 4)))
      report(s"emb/$nm", "8x8", stats(embBands(d, 8, 8)))
      d.unpersist()
    }

    // ---- text side ------------------------------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // CappedClusterIndexSpec's dense shape: half the docs are EXACT
    // copies of one template
    val denseText = (0L until 600L).map { id =>
      val body =
        if (id % 2 == 0)
          "boilerplate template body alpha beta gamma delta epsilon zeta"
        else s"unique filler text number $id with trailing entropy word$id"
      (id, body)
    }.toDF("doc_id", "text")
    // DedupScaleSmoke's boilerplate shape at 100k docs: 10% spread
    // over 100 templates
    val boiler = spark.range(100000L).selectExpr("id AS doc_id",
      """CASE WHEN id % 10 = 0
        |  THEN concat('boilerplate template number ', id % 1000,
        |              ' repeated across the crawl')
        |  ELSE concat('unique document ', id, ' body text words here')
        |END AS text""".stripMargin)
    val textCorpora = Seq(
      "docs base" -> docs,
      "dense 600 (spec shape)" -> denseText,
      "boiler 100k (smoke shape)" -> boiler)
    for ((nm, df) <- textCorpora) {
      val sig = graft.operators.Dedup.minhashSignatures(df).cache()
      sig.count()
      // the REAL banding the routers read — not a probe-local copy
      // (r17 review: a hand copy could calibrate thresholds against
      // stale code if the layout ever changes)
      report(s"text/$nm", "4x4", stats(graft.operators.Dedup.sigBands(sig, 4)))
      report(s"text/$nm", "2x8", stats(graft.operators.Dedup.sigBands(sig, 2)))
      sig.unpersist()
    }
    spark.stop()
  }
}
