package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text retrieval over the corpus: BM25 scoring in the inverted-index
  * shape. Not in the reference (whose surface is the generated Iceberg
  * table, SURVEY.md §2) — this is north-star extension surface: corpus
  * search is how a training-data pipeline pulls topical slices and
  * audits contamination hits.
  *
  * Scale shape (the part that must survive 100 TB): the corpus side is
  * one scan -> explode -> two key shuffles (per-(doc,term) tf, per-doc
  * length), the query side is a handful of literal terms broadcast to
  * the postings join, and the result is a TakeOrdered top-k. Nothing is
  * ever quadratic and no corpus-sized structure reaches the driver. A
  * production deployment materializes `tf`/`dl` once as committed tables
  * (the inverted index) and reruns only the scoring join per query —
  * the same train-once/search-many split the persisted PQ index uses.
  */
object Retrieval {

  /** BM25 top-k: score = sum over query terms of
    * `idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` with the classic
    * `idf = ln((N-df+0.5)/(df+0.5)+1)`. Per-term contributions are
    * floored to scaled longs (`floor(x*1e7)`) before the per-doc sum, so
    * the aggregation is order-independent and engine-portable — the
    * established fixed-point discipline of the ANN family.
    *
    * Residual risk (ADVICE r3, accepted): unlike the md5/polyHash
    * exact-integer paths, `ln` is transcendental and not guaranteed
    * correctly rounded, so a 1-ulp difference between the JVM's and
    * another engine's libm could flip `floor` at a boundary and perturb
    * a score's 7th decimal. Inputs here are small integer ratios whose
    * logs sit far from floor boundaries at 1e-7 granularity (verified
    * green against DuckDB every round); an engine-portable deployment
    * that must be bit-exact should compare `s_fp` within ±1 per term
    * instead of exactly.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String],
      k: Int = 15, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("term"))
    // postings restricted to the query's terms BEFORE any shuffle
    val tf = words.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val consts = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    score(tf, dl, consts, k, k1, b)
  }

  /** The scoring join shared by the scan path and the indexed path:
    * identical arithmetic, so both produce identical rankings.
    */
  private def score(tf: DataFrame, dl: DataFrame, consts: DataFrame,
      k: Int, k1: Double, b: Double): DataFrame = {
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        floor(log((col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0))
          * (col("tf") * lit(k1 + 1))
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl") / col("avgdl")))
          * lit(1e7)).cast("long").as("s_fp"))
      .groupBy("doc_id").agg(sum("s_fp").as("s_fp"))
      .select(col("doc_id"), (col("s_fp").cast("double") / lit(1e7)).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Persist the inverted index as committed tables — tokenize ONCE,
    * search many: `bm25_postings(doc_id, term, tf)`,
    * `bm25_doclen(doc_id, dl)`, `bm25_stats(n_docs, avgdl)`. A search
    * then touches only the query terms' postings (a pushed-down filter
    * on the postings scan — at scale, term-partitioned files make it a
    * partition-pruned read), never the corpus text. The index tables
    * version/travel/compact like any other data, the same
    * train-once/search-many split the persisted PQ index uses.
    */
  def buildIndex(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      root: String, ns: String, termBuckets: Int = 16,
      docBuckets: Int = 8): Unit = {
    import graft.plans.{Mor, PartitionSpec, Partitioning, TableIO}
    val words = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // corpus-scale index tables are BUCKET-PARTITIONED committed writes:
    // one distributed shuffle fans the postings out term-bucket-per-file
    // (never a one-task single-file write), and each file's manifest
    // entry records its bucket — so a search's postings read prunes to
    // exactly its query terms' buckets before any file is opened.
    Partitioning.preparePartitioned(spark, root, ns, "bm25_postings", tf,
      PartitionSpec("bucket", "term", termBuckets))
    // doclen and stats derive from the postings JUST COMMITTED (dl =
    // sum of a doc's term frequencies), so the corpus is tokenized
    // exactly once, in the postings write job — every later stage reads
    // the 100x-smaller index table, not the text
    val postings = Mor.read(spark, root, ns, "bm25_postings")
    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    Partitioning.preparePartitioned(spark, root, ns, "bm25_doclen", dl,
      PartitionSpec("bucket", "doc_id", docBuckets))
    // stats is ONE row — the single-file writer is the right tool here
    TableIO.createTableIfNotExists(root, ns, "bm25_stats", stats.schema)
    TableIO.commit(root, ns, "bm25_stats",
      Seq(TableIO.writeExactFile(spark, root, ns, "bm25_stats",
        "data/part-00000.parquet", stats, "data", 1L)))
  }

  /** Search against the persisted index: identical results to
    * [[bm25TopK]] (same scoring arithmetic over materialized postings).
    */
  def searchIndexed(spark: org.apache.spark.sql.SparkSession,
      root: String, ns: String, queryTerms: Seq[String],
      k: Int = 15, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.plans.{Mor, Partitioning}
    // partition-pruned postings read: each query term names one bucket,
    // and the scan opens only the UNION of those buckets' files (a
    // disjunctive PruneIn — indexes written before bucketing took
    // effect have no spec and read unpruned, still correct)
    val pruneIn = Partitioning.readSpec(root, ns, "bm25_postings").toSeq
      .map(sp => Mor.PruneIn(sp.fieldName,
        queryTerms.map(sp.valueOfString).distinct))
    val tf = Mor.read(spark, root, ns, "bm25_postings", pruneIn = pruneIn)
      .filter(col("term").isin(queryTerms: _*))
    val dl = Mor.read(spark, root, ns, "bm25_doclen")
    val consts = Mor.read(spark, root, ns, "bm25_stats")
    score(tf, dl, consts, k, k1, b)
  }
}
