package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextHash, VectorOps}

/** Deduplication operators over a documents table (doc_id, text) — the
  * core of an LLM training-data pipeline. Five families, in increasing
  * robustness-to-edits order: exact, normalized fingerprint, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding cosine.
  *
  * Scale design: everything is hash-partitioned dataflow — no
  * driver-side state. Exact/fingerprint are single shuffles on the key.
  * N-gram Jaccard joins on shingle (its cost is bounded by shared
  * shingles; at 100 TB you run MinHash LSH instead, which is linear in
  * corpus size + candidate pairs). All thresholds/seeds are fixed
  * constants so results are reproducible and oracle-checkable.
  */
object Dedup {

  /** Lowercase, strip non-alphanumerics, collapse whitespace. */
  def normalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Exact dedup: one survivor (min doc_id) per identical text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Fingerprint dedup: md5 of normalized text (md5 is identical across
    * engines, unlike xxhash64/murmur).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(normalize(col("text"))).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "fp", "n_copies")
      .orderBy("doc_id")

  /** Exact n-gram Jaccard near-dup pairs: distinct word n-gram shingles
    * per doc, self-join on shingle, J = |A∩B| / (|A|+|B|-|A∩B|) >= tau.
    * Outputs integer evidence (shared, sizes) — no float columns — so
    * the oracle comparison is exact.
    */
  def ngramJaccard(docs: DataFrame, n: Int = 4, tau: Double = 0.8): DataFrame = {
    // Shingles are rolling-hashed to longs inside the array transform and
    // deduplicated with a hash aggregate: array_distinct over string
    // arrays is O(k^2) string comparisons per doc (measured 9x slower).
    val sh = docs.select(col("doc_id"),
      explode(TextHash.shingleHashes(split(col("text"), " "), n)).as("sh"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.toDF("doc_a", "sh")
    val b = sh.toDF("doc_b", "sh")
    a.join(b, "sh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
      .join(sizes.toDF("doc_a", "size_a"), "doc_a")
      .join(sizes.toDF("doc_b", "size_b"), "doc_b")
      .filter(col("shared") / (col("size_a") + col("size_b") - col("shared")) >= tau)
      .select("doc_a", "doc_b", "shared", "size_a", "size_b")
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signature per document: 16 permutation-mins over the
    * rolling-hashed shingle set.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 4): DataFrame = {
    // No distinct needed: min over the shingle multiset equals min over
    // the set, so duplicates cannot change any signature component.
    val sh = docs.select(col("doc_id"),
      explode(TextHash.shingleHashes(split(col("text"), " "), n)).as("h"))
    val mins = TextHash.minhashSeeds.zipWithIndex.map { case ((a, b), j) =>
      min(TextHash.rehash(col("h"), a, b)).as(s"s$j")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH candidate pairs: 4 bands x 4 rows; docs sharing any
    * band bucket become a candidate pair. This is the linear-scale
    * near-dup path for 100 TB: cost is O(corpus) signatures + one
    * shuffle per band on the band key — never all-pairs.
    */
  def minhashLsh(docs: DataFrame, n: Int = 4): DataFrame = {
    val sig = minhashSignatures(docs, n)
    // Single pass over the signatures: explode each row into its 4 band
    // keys (a union of per-band selects would recompute the whole
    // signature pipeline once per band — 4x the work).
    val bandArray = array((0 until 4).map { bnd =>
      concat_ws(":", (0 until 4).map(r => col(s"s${bnd * 4 + r}")): _*)
    }: _*)
    val bands = sig.select(col("doc_id"),
        posexplode(bandArray).as(Seq("band", "key")))
    val a = bands.toDF("doc_a", "band", "key")
    val b = bands.toDF("doc_b", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup pairs: 32-bit fingerprint from word hashes;
    * pairs with hamming distance <= maxDist. The pair join is a
    * broadcast nested-loop at test scale; the scale path blocks on
    * fingerprint prefixes (documented, not needed for correctness).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 1): DataFrame = {
    val withSim = docs.select(col("doc_id"),
      TextHash.simhash32(graft.functions.HashFunctions.wordHashes(
        split(col("text"), " "))).as("sim"))
    val a = withSim.toDF("doc_a", "sim_a")
    val b = withSim.toDF("doc_b", "sim_b")
    a.join(b, col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= maxDist)
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding near-dup pairs: exact all-pairs cosine >= tau. Exact by
    * design so the oracle can verify it; the approximate scale path is
    * `Similarity.lshBuckets` (sign-LSH) which bounds candidate pairs.
    */
  def embeddingCosine(emb: DataFrame, tau: Double = 0.4): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val a = e.toDF("vec_a", "emb_a", "norm_a")
    val b = e.toDF("vec_b", "emb_b", "norm_b")
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        VectorOps.cosinePre(VectorOps.dot(col("emb_a"), col("emb_b")),
          col("norm_a"), col("norm_b")))
      .filter(col("cosine") >= tau)
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }
}
