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
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String],
      k: Int = 15, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("term"))
    // postings restricted to the query's terms BEFORE any shuffle
    val tf = words.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val consts = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
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
}
