package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{Graph, Sketches, TimeSeriesOps}
import Util._

/** Approximate-analytics and graph operators (round 9): KMV sketches
  * for distinct/overlap estimation, PageRank + triangle counting over
  * a deterministic link graph, and exact-arithmetic EWMA smoothing.
  * Every query has a bit-exact DuckDB oracle — the estimators are
  * deterministic (shared md5-based hashing, integer fixed-point, IEEE
  * division of agreed operands), so even the *approximate* answers
  * hash-match across engines.
  */
object Analytics {

  private val corpusA = "doc_id % 2 = 0"
  private val corpusB = "doc_id % 3 = 0"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_kmv_distinct" -> ((s, dir) =>
      Sketches.kmvDistinct(rd(s, dir, "documents"), "source", col("text"))),
    // INCREMENTAL sketch maintenance under the oracle: the corpus
    // arrives in two batches — the persisted state is built from the
    // first and FOLDED forward with only the second — then the
    // estimate reads off the state table. The oracle sketches the full
    // corpus from scratch, so a refresh that missed, doubled, or
    // stale-read anything diverges (the bm25_refreshed pattern applied
    // to sketch state).
    "sketch_kmv_incremental" -> ((s, dir) => {
      val root = graft.plans.GeneratedTables.ensureCustom(dir + "#kmvinc") {
        r =>
          val d = rd(s, dir, "documents")
          val path = s"$r/kmv_state"
          Sketches.buildKmvState(d.filter(col("doc_id") % 3 =!= 0),
            "source", col("text"), path)
          Sketches.refreshKmvState(s, d.filter(col("doc_id") % 3 === 0),
            "source", col("text"), path)
          ()
      }
      Sketches.kmvEstimateFromState(s, s"$root/kmv_state", "source")
    }),
    "sketch_hll_estimate" -> ((s, dir) =>
      Sketches.hllEstimate(rd(s, dir, "documents"), "source", col("text"))),
    "sketch_quantile" -> ((s, dir) =>
      Sketches.quantileSketch(rd(s, dir, "orders"), "o_orderpriority",
        col("o_orderkey"), col("o_totalprice"))),
    "sketch_quantile_merged" -> ((s, dir) =>
      Sketches.quantileSketchMerged(rd(s, dir, "orders"),
        "o_orderpriority", col("o_orderkey"), col("o_totalprice"))),
    "sketch_kmv_overlap" -> ((s, dir) => {
      val d = rd(s, dir, "documents")
      Sketches.kmvOverlap(
        a = d.filter(col("doc_id") % 2 === 0),
        b = d.filter(col("doc_id") % 3 === 0),
        valueCol = "text")
    }),
    "sketch_kmv_difference" -> ((s, dir) => {
      val d = rd(s, dir, "documents")
      Sketches.kmvDifference(
        a = d.filter(col("doc_id") % 2 === 0),
        b = d.filter(col("doc_id") % 3 === 0),
        valueCol = "text")
    }),
    // HLL set algebra: registers merge by per-bucket max — the
    // cluster-aggregation property, same corpus split as kmv_overlap
    "sketch_hll_union" -> ((s, dir) => {
      val d = rd(s, dir, "documents")
      Sketches.hllUnion(
        a = d.filter(col("doc_id") % 2 === 0),
        b = d.filter(col("doc_id") % 3 === 0),
        valueCol = "text")
    }),
    "graph_pagerank" -> ((s, dir) => Graph.pagerank(s, rd(s, dir, "documents"))),
    // property-graph centrality: rank split proportional to edge weights
    "graph_wpagerank" -> ((s, dir) =>
      Graph.weightedPagerank(s, rd(s, dir, "documents"))),
    "graph_ppr" -> ((s, dir) =>
      Graph.personalizedPagerank(s, rd(s, dir, "documents"))),
    "graph_hits" -> ((s, dir) => Graph.hits(s, rd(s, dir, "documents"))),
    "graph_sssp" -> ((s, dir) => Graph.sssp(s, rd(s, dir, "documents"))),
    "graph_degree_dist" -> ((s, dir) =>
      Graph.degreeDist(s, rd(s, dir, "documents"))),
    // structural fingerprint: Pearson correlation of endpoint degrees
    "graph_assortativity" -> ((s, dir) =>
      Graph.assortativity(s, rd(s, dir, "documents"))),
    // bipartite (order, part) projection: co-purchase support + lift
    "graph_cooccurrence" -> ((s, dir) =>
      Graph.cooccurrence(rd(s, dir, "lineitem"))),
    "graph_triangles" -> ((s, dir) => Graph.triangles(s, rd(s, dir, "documents"))),
    "graph_components" -> ((s, dir) =>
      Graph.connectedComponents(s, rd(s, dir, "documents"))),
    "graph_bfs" -> ((s, dir) => Graph.bfs(s, rd(s, dir, "documents"))),
    "graph_link_prediction" -> ((s, dir) =>
      Graph.linkPrediction(s, rd(s, dir, "documents"))),
    "graph_kcore" -> ((s, dir) => Graph.kcore(s, rd(s, dir, "documents"))),
    // community-quality eval: Newman Q of the 3-round label partition
    "graph_modularity" -> ((s, dir) =>
      Graph.modularity(s, rd(s, dir, "documents"))),
    // one synchronous Louvain sweep refining the modularity seed
    // partition — Q before/after with exact integer numerators
    "graph_louvain" -> ((s, dir) =>
      Graph.louvainRefine(s, rd(s, dir, "documents"))),
    // k-truss building block: per-edge triangle-support histogram
    "graph_edge_support" -> ((s, dir) =>
      Graph.edgeSupport(s, rd(s, dir, "documents"))),
    // ... and the full peel: the edge-level density filter
    "graph_ktruss" -> ((s, dir) => Graph.ktruss(s, rd(s, dir, "documents"))),
    "ts_ewma" -> ((s, dir) => TimeSeriesOps.ewmaLast(rdEvents(s, dir))),
    "ts_funnel" -> ((s, dir) => TimeSeriesOps.funnel(rdEvents(s, dir))),
    // the funnel within native session_window sessions (the oracle
    // sessionizes relationally — independent implementations)
    "ts_session_funnel" -> ((s, dir) =>
      TimeSeriesOps.sessionFunnel(rdEvents(s, dir))),
    "ts_retention" -> ((s, dir) => TimeSeriesOps.retention(rdEvents(s, dir))),
    "ts_holt" -> ((s, dir) => TimeSeriesOps.holt(rdEvents(s, dir))),
    "ts_concurrency" -> ((s, dir) => TimeSeriesOps.concurrency(rdEvents(s, dir))),
    "ts_anomaly_mad" -> ((s, dir) => TimeSeriesOps.anomalyMad(rdEvents(s, dir))),
    "ts_autocorr" -> ((s, dir) => TimeSeriesOps.autocorr(rdEvents(s, dir))),
    "ts_changepoint" -> ((s, dir) => TimeSeriesOps.changepoint(rdEvents(s, dir))),
    "ts_holt_winters" -> ((s, dir) => TimeSeriesOps.holtWinters(rdEvents(s, dir))),
    "text_kl_divergence" -> ((s, dir) =>
      graft.operators.TextAnalysis.klDivergence(rd(s, dir, "documents"))),
    "text_collocations" -> ((s, dir) =>
      graft.operators.TextAnalysis.collocations(rd(s, dir, "documents"))),
    "text_tfidf_keywords" -> ((s, dir) =>
      graft.operators.TextAnalysis.tfidfKeywords(rd(s, dir, "documents"))),
    // corpus-shape eval: least-squares Zipf exponent over top terms
    "text_zipf" -> ((s, dir) =>
      graft.operators.TextAnalysis.zipf(rd(s, dir, "documents"))),
    "ts_transitions" -> ((s, dir) => TimeSeriesOps.transitions(rdEvents(s, dir))),
    "ts_decompose" -> ((s, dir) => TimeSeriesOps.decompose(rdEvents(s, dir))),
    // decompose x anomalyMad composed: which days break the weekly shape
    "ts_residual_anomaly" -> ((s, dir) =>
      TimeSeriesOps.residualAnomaly(rdEvents(s, dir))),
    "ts_paths" -> ((s, dir) => TimeSeriesOps.paths(rdEvents(s, dir))),
    "ts_xcorr" -> ((s, dir) => TimeSeriesOps.xcorr(rdEvents(s, dir))),
    "ts_forecast_eval" -> ((s, dir) =>
      TimeSeriesOps.forecastEval(rdEvents(s, dir))),
    // sketches compose with streaming windows: per-(hopping window,
    // type) distinct-user HLL next to the exact count — the windowed
    // distinct a stream would pay a full dedup shuffle for, answered
    // from m registers per group
    "sketch_hopping_hll" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val expanded = rdEvents(s, dir)
        .select(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"), col("user_id"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          col("event_type"), col("user_id"))
      Sketches.hllEstimateGrouped(expanded, Seq("bucket", "event_type"),
        col("user_id").cast("string"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sketch_kmv_distinct" -> Sketches.kmvDistinctSql("source"),
    // incremental maintenance changes execution, never results: the
    // refreshed state must estimate exactly like a from-scratch sketch
    "sketch_kmv_incremental" -> Sketches.kmvDistinctSql("source"),
    "sketch_kmv_overlap" -> Sketches.kmvOverlapSql(corpusA, corpusB),
    "sketch_kmv_difference" -> Sketches.kmvDifferenceSql(corpusA, corpusB),
    "sketch_hll_union" -> Sketches.hllUnionSql(corpusA, corpusB),
    "sketch_hll_estimate" -> Sketches.hllEstimateSql("source"),
    "sketch_quantile" -> Sketches.quantileSketchSql,
    // the distributed merge changes execution, never results: shares
    // the one-shot sketch's oracle (same-answer-rewrite pattern)
    "sketch_quantile_merged" -> Sketches.quantileSketchSql,
    "graph_pagerank" -> Graph.pagerankSql,
    "graph_wpagerank" -> Graph.weightedPagerankSql,
    "graph_ppr" -> Graph.personalizedPagerankSql,
    "graph_hits" -> Graph.hitsSql,
    "graph_sssp" -> Graph.ssspSql(),
    "graph_degree_dist" -> Graph.degreeDistSql,
    "graph_assortativity" -> Graph.assortativitySql,
    "graph_cooccurrence" -> Graph.cooccurrenceSql(),
    "graph_triangles" -> Graph.trianglesSql,
    "graph_components" -> Graph.connectedComponentsSql,
    "graph_bfs" -> Graph.bfsSql(),
    "graph_link_prediction" -> Graph.linkPredictionSql(),
    "graph_kcore" -> Graph.kcoreSql(),
    "graph_modularity" -> Graph.modularitySql,
    "graph_louvain" -> Graph.louvainRefineSql,
    "graph_edge_support" -> Graph.edgeSupportSql,
    "graph_ktruss" -> Graph.ktrussSql(),
    "ts_ewma" -> TimeSeriesOps.ewmaLastSql,
    "ts_funnel" -> TimeSeriesOps.funnelSql(),
    "ts_session_funnel" -> TimeSeriesOps.sessionFunnelSql(),
    "ts_retention" -> TimeSeriesOps.retentionSql,
    "ts_holt" -> TimeSeriesOps.holtSql,
    "ts_concurrency" -> TimeSeriesOps.concurrencySql,
    "ts_anomaly_mad" -> TimeSeriesOps.anomalyMadSql,
    "ts_autocorr" -> TimeSeriesOps.autocorrSql,
    "ts_changepoint" -> TimeSeriesOps.changepointSql,
    "ts_xcorr" -> TimeSeriesOps.xcorrSql,
    "ts_forecast_eval" -> TimeSeriesOps.forecastEvalSql,
    "sketch_hopping_hll" ->
      s"""WITH w AS (SELECT event_type, user_id,
         |    strftime(time_bucket(INTERVAL '30 minutes', ts)
         |      - o * INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS bucket
         |  FROM events, (SELECT unnest([0, 1]) AS o) t),
         |h AS (SELECT bucket, event_type,
         |        ${Sketches.hash60Sql("CAST(user_id AS VARCHAR)")} AS h
         |      FROM w),
         |rr AS (SELECT bucket, event_type, h % ${Sketches.HllM} AS br,
         |         h // ${Sketches.HllM} AS h2 FROM h),
         |regs AS (SELECT bucket, event_type, br,
         |    max(CASE WHEN h2 = 0 THEN ${Sketches.HllRhoCap}
         |        ELSE least(CAST(log2(h2 & (-h2)) AS INT) + 1,
         |          ${Sketches.HllRhoCap}) END) AS r
         |  FROM rr GROUP BY 1, 2, 3),
         |z AS (SELECT bucket, event_type,
         |    sum(1.0 / CAST(CAST(1 AS BIGINT) << r AS DOUBLE))
         |      + CAST(${Sketches.HllM} - count(*) AS DOUBLE) AS z
         |  FROM regs GROUP BY 1, 2),
         |ex AS (SELECT bucket, event_type,
         |         count(DISTINCT user_id) AS n_exact
         |       FROM w GROUP BY 1, 2)
         |SELECT ex.bucket, ex.event_type, n_exact,
         |  ${Sketches.HllAlphaM2} / z AS est_distinct
         |FROM ex JOIN z USING (bucket, event_type)
         |ORDER BY bucket, event_type""".stripMargin,
    "ts_holt_winters" -> TimeSeriesOps.holtWintersSql,
    "text_kl_divergence" -> graft.operators.TextAnalysis.klDivergenceSql,
    "text_collocations" -> graft.operators.TextAnalysis.collocationsSql(),
    "text_tfidf_keywords" -> graft.operators.TextAnalysis.tfidfKeywordsSql(),
    "text_zipf" -> graft.operators.TextAnalysis.zipfSql(),
    "ts_transitions" -> TimeSeriesOps.transitionsSql,
    "ts_decompose" -> TimeSeriesOps.decomposeSql,
    "ts_residual_anomaly" -> TimeSeriesOps.residualAnomalySql,
    "ts_paths" -> TimeSeriesOps.pathsSql()
  )
}
