package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, PipelineOps, Sketches}

/** Pins the r10-verdict item-3 discipline: operator-internal caches
  * are registered in [[CacheScope]] and a harness drain after the
  * consuming action leaves the session CacheManager EMPTY — no cache
  * entry outlives the query that built it (previously the graph family
  * leaked ~10 cached edge relations per bench session).
  */
class CacheScopeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDf(n: Int) = {
    import spark.implicits._
    (0 until n)
      .map(i => (i.toLong, s"text body $i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
  }

  private def cacheManagerEmpty: Boolean =
    spark.sharedState.cacheManager.isEmpty

  test("graph operators register caches; drain empties the CacheManager") {
    // isolate from any earlier suite in the shared session (other
    // specs may cache outside the ledger and legitimately not drain)
    CacheScope.drain()
    spark.catalog.clearCache()
    val docs = docsDf(200)
    // one linear-lineage iterator, one doubly-referencing loop, one
    // wedge-join family — together they cover every Graph cache site
    Graph.pagerank(spark, docs).collect()
    Graph.connectedComponents(spark, docs).collect()
    Graph.triangles(spark, docs).collect()
    assert(CacheScope.pendingCount > 0,
      "graph operators should have registered scoped caches")
    CacheScope.drain()
    assert(CacheScope.pendingCount == 0)
    assert(cacheManagerEmpty,
      "a drained session must hold zero cached plans")
  }

  test("sketch overlap and dedup clusters are scoped too") {
    CacheScope.drain()
    spark.catalog.clearCache()
    val docs = docsDf(300)
    Sketches.kmvOverlap(docs.filter("doc_id % 2 = 0"),
      docs.filter("doc_id % 3 = 0"), "text").collect()
    PipelineOps.dedupClusters(docs).collect()
    assert(CacheScope.pendingCount > 0)
    CacheScope.drain()
    assert(cacheManagerEmpty)
  }

  test("drain is idempotent and safe when empty") {
    CacheScope.drain()
    CacheScope.drain()
    assert(CacheScope.pendingCount == 0)
  }
}
