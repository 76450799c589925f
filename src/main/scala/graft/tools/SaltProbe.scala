package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** MEASUREMENT harness for VERDICT r15 item 4: does a MULTIPLICATIVE
  * per-band mix in the dense-bucket cap's Knuth rank beat the shipped
  * ADDITIVE salt? The additive rank
  * ((id % 2^31)·A + band·c + key·d) mod 2^32 orders every bucket's
  * members by the SAME id permutation (the band/key terms only shift
  * it, reordering via wraparound alone), so a clone group — identical
  * vectors, identical buckets in all 16 bands — keeps largely the same
  * cap survivors per band and union pair coverage stays ~cap² however
  * many bands run. A multiplicative mix
  * (((id % 2^31) + band·c + key·d) mod 2^31)·A mod 2^32 gives each
  * (band, key) an independent id permutation: each band caps a
  * DIFFERENT subset, so the union of per-band survivor cliques can
  * cover up to bands× more true pairs at the SAME bounded work
  * (cap² per bucket per band — the bound is salt-independent).
  *
  * Both ranks are pure positive-integer arithmetic (id pre-reduced so
  * the product stays in Int64) — either is oracle-replayable, so the
  * probe's verdict decides which ships. Ground truth per corpus is the
  * TRUE all-pairs cosine ≥ tau set (the recallEvalRebanded gold
  * standard), measured at two clone depths (30, 125 — the r15 ledger's
  * regimes) for the production 16x4 banding and the re-banded 8x8
  * mitigation, under each salt.
  */
object SaltProbe {
  private def bandRows(emb: DataFrame, bands: Int, r: Int): DataFrame = {
    val keyCols = (0 until bands).map { bnd =>
      (0 until r).map { i =>
        when(try_element_at(col("embedding"), lit(bnd * r + i + 1)) > 0f,
          1L << i).otherwise(0L)
      }.reduce(_ + _)
    }
    emb.select(col("vec_id"),
      posexplode(array(keyCols: _*)).as(Seq("band", "key")))
  }

  /** Capped near-dup pairs under a chosen rank expression. */
  private def cappedPairs(emb: DataFrame, bands: Int, r: Int, cap: Int,
      tau: Double, multiplicative: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rank =
      if (!multiplicative)
        pmod(pmod(col("vec_id"), lit(2147483648L)) * lit(2654435761L)
          + col("band") * lit(40503L) + col("key") * lit(69069L),
          lit(4294967296L))
      else
        pmod(pmod(pmod(col("vec_id"), lit(2147483648L))
            + col("band") * lit(40503L) + col("key") * lit(69069L),
          lit(2147483648L)) * lit(2654435761L), lit(4294967296L))
    val capped = graft.CacheScope.cached(
      bandRows(emb, bands, r).withColumn("bn", row_number().over(
        Window.partitionBy("band", "key").orderBy(
          rank.asc, col("vec_id").asc)))
        .filter(col("bn") <= cap).drop("bn"))
    val e = emb.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    capped.toDF("vec_a", "band", "key")
      .repartition(col("band"), col("key"))
      .join(capped.toDF("vec_b", "band", "key"), Seq("band", "key"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
      .join(e.toDF("vec_a", "emb_a", "norm_a"), "vec_a")
      .join(e.toDF("vec_b", "emb_b", "norm_b"), "vec_b")
      .filter(VectorOps.cosinePre(
        VectorOps.dot(col("emb_a"), col("emb_b")),
        col("norm_a"), col("norm_b")) >= tau)
      .select("vec_a", "vec_b")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tau = 0.4
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    Seq(30, 125).foreach { copies =>
      val stride = 10
      // bounded base sample, mirroring Similarity.denseEvalCorpus's
      // MaxEvalBaseId (r16 review): the all-pairs ground truth below
      // must never scale with the embeddings table this probe is
      // pointed at
      val dense = graft.CacheScope.cached(
        emb.filter(pmod(col("vec_id"), lit(stride.toLong)) === 0L &&
            col("vec_id") < lit(graft.operators.Similarity.MaxEvalBaseId))
          .select(col("vec_id"), col("embedding"),
            explode(array((0 until copies).map(lit): _*)).as("c"))
          .select((col("vec_id") * copies + col("c")).as("vec_id"),
            col("embedding")))
      val nVec = dense.count()
      // TRUE all-pairs ground truth (bounded adversarial sample only)
      val e = dense.select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"))
      val nTrue = e.toDF("vec_a", "emb_a", "norm_a")
        .join(broadcast(e.toDF("vec_b", "emb_b", "norm_b")),
          col("vec_a") < col("vec_b"))
        .filter(VectorOps.cosinePre(
          VectorOps.dot(col("emb_a"), col("emb_b")),
          col("norm_a"), col("norm_b")) >= tau)
        .count()
      println(f"[saltprobe] depth=$copies%d nVec=$nVec%d truePairs=$nTrue%d")
      for {
        (bands, r, label) <- Seq((16, 4, "16x4"), (8, 8, "8x8"))
        mult <- Seq(false, true)
      } {
        val salt = if (mult) "multiplicative" else "additive"
        val n = cappedPairs(dense, bands, r, cap = 8, tau, mult).count()
        graft.CacheScope.drain()
        println(f"[saltprobe] depth=$copies%3d banding=$label%s cap=8 " +
          f"salt=$salt%-14s pairs=$n%7d recall=${n.toDouble / nTrue}%.4f")
      }
      graft.CacheScope.drain()
    }
    spark.stop()
  }
}
