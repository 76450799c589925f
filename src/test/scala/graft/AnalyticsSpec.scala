package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.{Graph, Sketches, TimeSeriesOps}

/** Unit tests for the round-9 analytics operators. The graph tests
  * recompute the expected answer with an independent local simulation
  * over the operator's own (deterministic) edge list, so they assert
  * EXACT equality, not just sanity bounds.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDf(n: Int) = {
    import spark.implicits._
    (0 until n)
      .map(i => (i.toLong, s"text body $i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
  }

  // ---- KMV sketches ----

  test("kmv: exact when group has fewer distinct values than K") {
    val out = Sketches
      .kmvDistinct(docsDf(100), "source", col("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.length == 4)
    // 100 docs over 4 sources, all texts distinct: 25 per group, exact
    assert(out.forall { case (_, nSketch, est) => nSketch == 25 && est == 25.0 })
  }

  test("kmv: estimate within 20% when distinct >> K") {
    val out = Sketches
      .kmvDistinct(docsDf(20000), "source", col("text"))
      .collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    // 5000 distinct per group, K=256 -> ~6% RSE; 20% is > 3 sigma
    assert(out.forall { case (nSketch, est) =>
      nSketch == Sketches.K && math.abs(est - 5000.0) / 5000.0 < 0.2
    })
  }

  test("kmv: merged union sketch == sketch of the union (mergeability)") {
    val d = docsDf(12000)
    val a = d.filter(col("doc_id") % 2 === 0)
    val b = d.filter(col("doc_id") % 3 === 0)
    val merged = Sketches
      .kmvOverlap(a, b, "text")
      .collect()
      .head
    // sketch the union corpus directly, as one group
    import org.apache.spark.sql.functions.lit
    val direct = Sketches
      .kmvDistinct(a.union(b).withColumn("g", lit("all")), "g", col("text"))
      .collect()
      .head
      .getDouble(3)
    assert(merged.getAs[Double]("est_union") == direct)
    // ground truth: |A|=6000, |B|=4000, |A∩B|=2000, |A∪B|=8000
    assert(math.abs(merged.getAs[Double]("est_a") - 6000) / 6000.0 < 0.2)
    assert(math.abs(merged.getAs[Double]("est_union") - 8000) / 8000.0 < 0.2)
    assert(math.abs(merged.getAs[Double]("est_intersection") - 2000) / 2000.0 < 0.35)
  }

  test("forecast backtest: zero error on constant series; " +
      "single-event users excluded") {
    import spark.implicits._
    // constant series: both forecasters are exact, no wins either way
    val const = (0 until 50).flatMap(u => (0 until 10).map(i =>
      (u.toLong * 1000 + i, new java.sql.Timestamp(1700000000000L + i * 1000L),
        u.toLong, 7.5, "view")))
      .toDF("event_id", "ts", "user_id", "value", "event_type")
    val r = TimeSeriesOps.forecastEval(const).collect().head
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(r.getLong(3) == 0L)
    // single-event users are excluded (no naive prediction exists)
    val single = Seq((1L, new java.sql.Timestamp(1700000000000L), 9L, 3.0,
      "view")).toDF("event_id", "ts", "user_id", "value", "event_type")
    assert(TimeSeriesOps.forecastEval(const.union(single))
      .collect().head.getLong(0) == 50L)
  }

  test("incremental KMV state refresh is bit-identical to a rebuild") {
    import org.apache.spark.sql.functions.col
    val d = docsDf(9000) // 2250 distinct per source, well past K=256
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-").toString
    val inc = s"$dir/inc"
    val full = s"$dir/full"
    Sketches.buildKmvState(d.filter(col("doc_id") % 3 =!= 0),
      "source", col("text"), inc)
    Sketches.refreshKmvState(spark, d.filter(col("doc_id") % 3 === 0),
      "source", col("text"), inc)
    Sketches.buildKmvState(d, "source", col("text"), full)
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(identity).toSeq
    assert(rows(inc) == rows(full),
      "refreshed state differs from a from-scratch rebuild")
    // and the estimate read off the state equals the direct operator
    val got = Sketches.kmvEstimateFromState(spark, inc, "source")
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    val want = Sketches.kmvDistinct(d, "source", col("text"))
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(got == want)
  }

  test("quantile sketch: mergeable (split-sketch union == one-shot) " +
      "and rank-accurate at K >> n") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // value domain 0..9999 keyed by id, two groups
    val d = spark.range(0, 10000)
      .selectExpr("CAST(id % 2 AS STRING) AS g", "id AS k",
        "CAST(id AS DOUBLE) AS v")
    val got = Sketches.quantileSketch(d, "g", col("k"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    got.foreach { case (g, nRows, nSample, p50, p95, p50Exact) =>
      assert(nRows == 5000L && nSample == Sketches.QK.toLong)
      // sample quantile of a uniform 0..9999 population: rank RSE is
      // sqrt(q(1-q)/K) ~ 4.4% at the median; 15% is > 3 sigma
      assert(math.abs(p50 - p50Exact) / 10000.0 < 0.15,
        s"$g: p50_est $p50 vs exact $p50Exact")
      assert(p95 >= p50 && math.abs(p95 - 9500.0) / 10000.0 < 0.15,
        s"$g: p95_est $p95")
    }
    // MERGEABILITY — the property that makes this a distributed
    // aggregation: bottom-K-by-hash of (A ∪ B) == bottom-K of
    // (bottomK(A) ∪ bottomK(B)). Split the corpus, sketch each half
    // via the operator (single group), merge, and compare to the
    // one-shot sketch of the whole.
    val whole = d.withColumn("g", lit("all"))
    def bottomK(df: org.apache.spark.sql.DataFrame) = df
      .select(Sketches.hash60(col("k").cast("string")).as("h"), col("v"))
      .orderBy("h", "v").limit(Sketches.QK)
    val oneShot = bottomK(whole).collect().map(r => (r.getLong(0),
      r.getDouble(1))).sortBy(identity)
    val partA = bottomK(whole.filter(col("k") < 5000))
    val partB = bottomK(whole.filter(col("k") >= 5000))
    val merged = partA.union(partB)
      .orderBy("h", "v").limit(Sketches.QK)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(identity)
    assert(merged.toSeq == oneShot.toSeq,
      "merged split sketches differ from the one-shot sketch")
  }

  test("hll estimate matches an exact local register replay") {
    val docs = docsDf(3000) // 750 distinct texts per source
    val rows = docs.collect().map(r => (r.getString(2), r.getString(1)))
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    }
    val m = Sketches.HllM
    def rho(h2: Long): Int =
      if (h2 == 0) Sketches.HllRhoCap
      else math.min(java.lang.Long.numberOfTrailingZeros(h2) + 1,
        Sketches.HllRhoCap)
    // register per (source, bucket); keep as Seq — a Map-to-Map .map
    // would collapse same-source entries
    val regs: Seq[(String, Int)] = rows
      .map { case (src, txt) => (src, h60(txt)) }
      .groupBy { case (src, h) => (src, h % m) }
      .toSeq
      .map { case ((src, _), vs) =>
        (src, vs.map { case (_, h) => rho(h / m) }.max)
      }
    val z = regs.groupBy(_._1).map { case (src, rs) =>
      src -> (rs.map(t => 1.0 / (1L << t._2).toDouble).sum +
        (m - rs.size).toDouble)
    }
    val wantEst = z.map { case (src, zz) => src -> 0.709 * 4096.0 / zz }
    val got = Sketches.hllEstimate(docs, "source", col("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 4)
    got.foreach { case (src, nExact, est) =>
      assert(nExact == 750L)
      assert(est == wantEst(src), s"$src: $est != ${wantEst(src)}")
      // estimator sanity: within a loose factor of truth at n/m ~ 12
      assert(est > 0.3 * nExact && est < 3.0 * nExact)
    }
  }

  // ---- Graph ----

  /** Local exact replay of the fixed-point PageRank over a collected
    * edge list.
    */
  private def localPagerank(
      n: Int,
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val base = Graph.Scale * 15 / 100
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = (0 until n).map(i => i.toLong -> Graph.Scale).toMap
    for (_ <- 1 to Graph.Iterations) {
      val s = edges
        .groupBy(_._2)
        .view
        .mapValues(_.map { case (u, _) => r(u) / outdeg(u) }.sum)
        .toMap
      r = (0 until n).map { i =>
        i.toLong -> (base + (85 * s.getOrElse(i.toLong, 0L)) / 100)
      }.toMap
    }
    r
  }

  test("pagerank matches an exact local simulation") {
    val n = 200
    val docs = docsDf(n)
    val edges = Graph
      .linkEdges(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val expected = localPagerank(n, edges).toSeq
      .sortBy { case (node, r) => (-r, node) }
      .take(20)
    val got = Graph
      .pagerank(spark, docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got == expected)
    // every rank carries at least the teleport mass
    assert(got.forall(_._2 >= Graph.Scale * 15 / 100))
  }

  test("weighted pagerank matches an exact local simulation") {
    val n = 200
    val docs = docsDf(n)
    // the operator's own directed edges, with its weight function
    // replayed locally via the Spark expression (collected once)
    val ew = Graph.linkEdges(docs)
      .withColumn("w", graft.operators.Sketches.hash60(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.col("src").cast("string"),
          org.apache.spark.sql.functions.lit(":"),
          org.apache.spark.sql.functions.col("dst").cast("string")))
        % 9L + 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val base = Graph.Scale * 15 / 100
    val wsum = ew.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = (0 until n).map(i => i.toLong -> Graph.Scale).toMap
    for (_ <- 1 to Graph.Iterations) {
      val s = ew.groupBy(_._2).view
        .mapValues(_.map { case (u, _, w) => r(u) * w / wsum(u) }.sum)
        .toMap
      r = (0 until n).map { i =>
        i.toLong -> (base + 85 * s.getOrElse(i.toLong, 0L) / 100)
      }.toMap
    }
    val expected = r.toSeq.sortBy { case (node, rk) => (-rk, node) }.take(20)
    val got = Graph.weightedPagerank(spark, docs)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    graft.CacheScope.drain()
    assert(got == expected)
  }

  test("leakage-safe split: no near-dup cluster ever spans splits") {
    import spark.implicits._
    // force near-dup pairs: docs 2k and 2k+1 share identical text
    val docs = (0 until 120)
      .map(i => (i.toLong,
        s"shared body text token alpha beta gamma delta epsilon ${i / 2}",
        s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val assign = graft.operators.PipelineOps.leakageSafeAssignment(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3)))
    graft.CacheScope.drain()
    // every group maps to exactly one split — the defining invariant
    val spansByGroup = assign.groupBy(_._2)
      .values.count(_.map(_._3).distinct.size > 1)
    assert(spansByGroup == 0)
    // the identical-text pairs really did cluster together
    val grpOf = assign.map(a => a._1 -> a._2).toMap
    (0 until 120 by 2).foreach { i =>
      assert(grpOf(i.toLong) == grpOf(i.toLong + 1),
        s"docs $i/${i + 1} share text but split groups differ")
    }
    // summary consistency: leaky = docs whose doc-level label differs
    val summary = graft.operators.PipelineOps.leakageSafeSplit(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    graft.CacheScope.drain()
    val leaky = assign.count(a => a._3 != a._4).toLong
    assert(summary.values.map(_._3).sum == leaky)
    assert(summary.values.map(_._1).sum == 120L)
  }

  test("hll union: merged registers estimate EXACTLY like a one-shot " +
      "sketch of the union corpus") {
    val d = docsDf(300)
    val a = d.filter(col("doc_id") % 2 === 0)
    val b = d.filter(col("doc_id") % 3 === 0)
    val viaMerge = Sketches.hllUnion(a, b, "text")
      .collect().head.getAs[Double]("est_union")
    // one-shot: the union corpus through hllEstimate directly (the
    // distinct() only dedups DataFrame rows — the sketch itself is
    // duplicate-insensitive either way)
    val union = a.union(b).distinct()
      .withColumn("g", org.apache.spark.sql.functions.lit("x"))
    val direct = Sketches.hllEstimate(union, "g", col("text"))
      .collect().head.getAs[Double]("est_distinct")
    assert(viaMerge == direct,
      s"merge law broken: $viaMerge != $direct")
    graft.CacheScope.drain()
  }

  test("zipf slope matches an exact local least-squares") {
    import spark.implicits._
    // 4 terms with frequencies 12, 6, 4, 3 — an exact f = 12/r power
    // law, so the ln-ln points are collinear with slope -1 (NOT a
    // geometric sequence, which is linear in r, not ln r)
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val docs = Seq((0L, words.mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val row = graft.operators.TextAnalysis.zipf(docs).collect().head
    assert(row.getLong(0) == 4)
    // local replay with the operator's own fixed-point quantization
    val pts = Seq((1, 12), (2, 6), (3, 4), (4, 3)).map { case (r, c) =>
      (math.floor(math.log(r) * 1e6).toLong,
        math.floor(math.log(c) * 1e6).toLong)
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    assert(row.getLong(1) == n * sxy - sx * sy)
    assert(row.getLong(2) == n * sxx - sx * sx)
    // the quantized slope of an exact power law is -1 to ~1e-6
    assert(math.abs(row.getDouble(3) + 1.0) < 1e-5)
  }

  test("emb outliers: clean clusters are quiet, a planted corrupt " +
      "vector is flagged") {
    import spark.implicits._
    import graft.operators.Similarity
    // 4 exactly-tight clusters at distinct corners of [0,1]^4 (all
    // members identical: zero within-cluster distance, so ANY nonzero
    // deviation is anomalous — a uniform spread would legitimately
    // flag its own tails, since max (x-mean)^2 is 3x the mean there)
    def vec(c: Int): Array[Float] = Array.tabulate(4)(p =>
      if ((c >> p) % 2 == 1) 1.0f else 0.0f)
    val clean = (0 until 80).map(i => (i.toLong, vec(i % 4), i % 4))
      .toDF("vec_id", "embedding", "label")
    val quiet = Similarity.embOutliers(clean, kClusters = 4, iters = 2)
      .collect()
    graft.CacheScope.drain()
    assert(quiet.map(_.getLong(2)).sum == 0L,
      "clean clusters must produce zero outliers")
    // plant one corrupt embedding (all-9s — the mis-encode shape)
    val corrupt = clean.union(
      Seq((999L, Array.fill(4)(9.0f), 0)).toDF("vec_id", "embedding", "label"))
    val flagged = Similarity.embOutliers(corrupt, kClusters = 4, iters = 2)
      .collect()
    graft.CacheScope.drain()
    assert(flagged.map(_.getLong(2)).sum == 1L,
      s"exactly the planted vector should flag: ${flagged.mkString(",")}")
  }

  test("ktruss matches an exact local peel") {
    val docs = docsDf(300)
    var alive = Graph.linkEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toSet
    val k = 3
    var changed = true
    while (changed) {
      val adj = (alive.toSeq ++ alive.toSeq.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val next = alive.filter { case (u, v) =>
        (adj(u) intersect adj(v)).size >= k - 2
      }
      changed = next != alive
      alive = next
    }
    val row = Graph.ktruss(spark, docs, k).collect().head
    graft.CacheScope.drain()
    assert(row.getLong(1) == alive.size.toLong)
    assert(row.getLong(2) ==
      alive.flatMap(e => Seq(e._1, e._2)).size.toLong)
  }

  test("edge support is consistent with the triangle count") {
    val docs = docsDf(300)
    val hist = Graph.edgeSupport(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tri = Graph.triangles(spark, docs).collect().head
    graft.CacheScope.drain()
    // Σ support·n_edges = 3 × triangles (each triangle supports 3
    // edges), and the histogram covers every undirected edge
    assert(hist.map { case (s, n) => s * n }.sum ==
      3L * tri.getAs[Long]("n_triangles"))
    assert(hist.map(_._2).sum == tri.getAs[Long]("n_edges"))
  }

  test("assortativity matches an exact local Pearson over endpoint degrees") {
    val n = 200
    val docs = docsDf(n)
    val und = Graph.linkEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toSeq
    graft.CacheScope.drain()
    val sym = und ++ und.map(_.swap)
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = sym.map { case (u, v) => (deg(u), deg(v)) }
    val cnt = xs.size.toLong
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    val expected = (cnt * sxy - sx * sy).toDouble /
      (math.sqrt((cnt * sxx - sx * sx).toDouble) *
        math.sqrt((cnt * syy - sy * sy).toDouble))
    val row = Graph.assortativity(spark, docs).collect().head
    graft.CacheScope.drain()
    assert(row.getLong(0) == und.size.toLong)
    assert(math.abs(row.getDouble(1) - expected) < 1e-6)
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }

  test("modularity matches an exact local simulation") {
    val n = 200
    val docs = docsDf(n)
    val und = Graph.linkEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toSeq
    val sym = und ++ und.map(_.swap)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // 3 rounds of neighbor-min folded with own label
    var lab = (0 until n).map(i => i.toLong -> i.toLong).toMap
    for (_ <- 1 to Graph.ModularityRounds) {
      lab = lab.map { case (v, l) =>
        val nmin = adj.getOrElse(v, Seq.empty).map(lab).reduceOption(_ min _)
        v -> math.min(l, nmin.getOrElse(l))
      }
    }
    val m = und.size.toLong
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val communities = lab.values.toSet
    val qNum = communities.toSeq.map { c =>
      val members = lab.collect { case (v, l) if l == c => v }.toSet
      val ec = und.count { case (u, v) => members(u) && members(v) }.toLong
      val dc = members.toSeq.map(v => deg.getOrElse(v, 0L)).sum
      4L * m * ec - dc * dc
    }.sum
    val row = Graph.modularity(spark, docs).collect().head
    graft.CacheScope.drain()
    assert(row.getLong(0) == communities.size.toLong)
    assert(row.getLong(1) == m)
    assert(row.getLong(2) == qNum)
    assert(math.abs(row.getDouble(3) -
      qNum.toDouble / (4.0 * m * m)) < 1e-12)
    // a 3-hop local partition on this graph should be genuinely
    // non-trivial: several communities, positive Q
    assert(communities.size > 1 && qNum > 0)
  }

  test("louvain refinement matches an exact local simulation of the " +
      "colored sweep and does not decrease Q") {
    val n = 200
    val docs = docsDf(n)
    val und = Graph.linkEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toSeq
    val sym = und ++ und.map(_.swap)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = und.size.toLong
    var lab = (0 until n).map(i => i.toLong -> i.toLong).toMap
    for (_ <- 1 to Graph.ModularityRounds) {
      lab = lab.map { case (v, l) =>
        val nmin = adj.getOrElse(v, Seq.empty).map(lab).reduceOption(_ min _)
        v -> math.min(l, nmin.getOrElse(l))
      }
    }
    val seedLab = lab
    def qNumOf(lm: Map[Long, Long]): Long =
      lm.values.toSet.toSeq.map { (c: Long) =>
        val members = lm.collect { case (v, l) if l == c => v }.toSet
        val ec = und.count { case (u, v) => members(u) && members(v) }.toLong
        val dc = members.toSeq.map(v => deg.getOrElse(v, 0L)).sum
        4L * m * ec - dc * dc
      }.sum
    // the colored sweep: phase k moves only nodes with id % phases == k,
    // gains against the partition UPDATED by earlier phases; each
    // phase's candidate is accepted only if exact Q does not drop
    // (the r14 monotonicity guard)
    var qPrev = qNumOf(lab)
    var rejected = 0L
    for (k <- 0 until Graph.LouvainPhases) {
      val labNow = lab
      // keys is a SET: map-to-degree would dedupe equal degrees
      // before summing — toSeq first
      val sig = labNow.keys.toSeq.groupBy(labNow).view
        .mapValues(_.map(v => deg.getOrElse(v, 0L)).sum).toMap
      val moves = labNow.keys
        .filter(v => v % Graph.LouvainPhases == k)
        .flatMap { i =>
          val a = labNow(i)
          val di = deg.getOrElse(i, 0L)
          val kc = adj.getOrElse(i, Seq.empty).groupBy(labNow).view
            .mapValues(_.size.toLong).toMap
          val kia = kc.getOrElse(a, 0L)
          val cands = kc.keys.filter(_ != a).map { c =>
            (c, 4L * m * (kc(c) - kia)
              - 2L * di * (sig(c) - (sig(a) - di)))
          }.filter(_._2 > 0L)
          if (cands.isEmpty) None
          else Some(i -> cands.minBy { case (c, g) => (-g, c) }._1)
        }.toMap
      val cand = labNow.map { case (v, l) => v -> moves.getOrElse(v, l) }
      val qc = qNumOf(cand)
      if (qc >= qPrev) { lab = cand; qPrev = qc } else rejected += 1L
    }
    val row = Graph.louvainRefine(spark, docs).collect().head
    graft.CacheScope.drain()
    assert(row.getLong(0) == seedLab.values.toSet.size.toLong)
    assert(row.getLong(1) == lab.values.toSet.size.toLong)
    assert(row.getLong(2) == qNumOf(seedLab))
    assert(row.getLong(3) == qNumOf(lab))
    assert(row.getLong(6) == rejected)
    // with the guard, not degrading the seed partition is an
    // INVARIANT — and on this corpus the sweep should also find
    // genuine improvements
    assert(row.getLong(3) >= row.getLong(2))
  }

  test("personalized pagerank matches an exact local simulation " +
      "and concentrates mass near the seeds") {
    val n = 200
    val docs = docsDf(n)
    val edges = Graph
      .linkEdges(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val base = Graph.Scale * 15 / 100
    def seed(i: Long): Long = if (i % Graph.PprSeedMod == 0) 1L else 0L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = (0 until n).map(i =>
      i.toLong -> seed(i.toLong) * Graph.Scale).toMap
    for (_ <- 1 to Graph.Iterations) {
      val s = edges
        .groupBy(_._2)
        .view
        .mapValues(_.map { case (u, _) => r(u) / outdeg(u) }.sum)
        .toMap
      r = (0 until n).map { i =>
        i.toLong ->
          (seed(i.toLong) * base + (85 * s.getOrElse(i.toLong, 0L)) / 100)
      }.toMap
    }
    val expected = r.toSeq.filter(_._2 > 0)
      .sortBy { case (node, rk) => (-rk, node) }
      .take(20)
    val got = Graph.personalizedPagerank(spark, docs)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == expected)
    // seeds carry at least their own teleport mass; everything
    // returned is reachable (nonzero)
    assert(got.forall(_._2 > 0L))
    assert(got.filter(t => t._1 % Graph.PprSeedMod == 0)
      .forall(_._2 >= base))
  }

  test("sssp matches an exact local Bellman-Ford replay") {
    val n = 200
    val docs = docsDf(n)
    val und = Graph.linkEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    }
    val wEdges = und.flatMap { case (u, v) =>
      val w = h60(s"$u:$v") % 9 + 1
      Seq((u, v, w), (v, u, w))
    }
    var dist = (0L until 5L).map(_ -> 0L).toMap
    for (_ <- 1 to Graph.SsspHops) {
      val relaxed = wEdges.flatMap { case (s, d, w) =>
        dist.get(s).map(c => d -> (c + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val expected = dist.toSeq.sorted
    val got = Graph.sssp(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // seeds at cost 0; all weights >= 1 so non-seeds cost >= 1
    assert(got.filter(_._1 < 5).forall(_._2 == 0L))
    assert(got.filter(_._1 >= 5).forall(_._2 >= 1L))
  }

  test("hits matches an exact local simulation") {
    val n = 200
    val docs = docsDf(n)
    val edges = Graph
      .linkEdges(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    var h = (0 until n).map(_.toLong -> 1L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to Graph.Iterations) {
      a = edges.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => h.getOrElse(u, 0L) }.sum).toMap
      h = edges.groupBy(_._1).view
        .mapValues(_.map { case (_, v) => a.getOrElse(v, 0L) }.sum).toMap
    }
    val expected = (0 until n)
      .map(i => (i.toLong, a.getOrElse(i.toLong, 0L), h.getOrElse(i.toLong, 0L)))
      .sortBy { case (node, auth, _) => (-auth, node) }
      .take(20)
    val got = Graph.hits(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.head._2 > 0L)
  }

  test("pagerank's plan stays bounded when iterations are raised") {
    // pagerank's loop relation is referenced once per round, so the
    // analyzed plan grows LINEARLY (~8 nodes/round) — harmless at the
    // default 5 iterations and not worth an extra Spark job per round,
    // but anyone raising iterations inherits a planning-time surprise
    // without the every-CheckpointEvery-rounds truncation. At 17
    // rounds the last checkpoint lands on round 16, so the final plan
    // is one round of lineage over a LogicalRDD.
    // the cached edge relation's analyzed lineage (~40 nodes) rides in
    // every plan — cache() never truncates plans — so the pin is
    // CONSTANCY across checkpoint cycles (17 and 25 are both one round
    // past a checkpoint), not an absolute count; unbounded lineage
    // would add ~8 nodes per extra round (64 over the 8-round gap)
    def nodesAt(iters: Int): Int = Graph
      .pagerank(spark, docsDf(50), iterations = iters)
      .queryExecution.analyzed.collect { case p => p }.size
    val n17 = nodesAt(17)
    val n25 = nodesAt(25)
    assert(n17 == n25, s"plan grew across checkpoint cycles: $n17 " +
      s"nodes at 17 iterations vs $n25 at 25 (CheckpointEvery broken?)")
    val plan = Graph.pagerank(spark, docsDf(50), iterations = 17)
      .queryExecution.analyzed
    assert(plan.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }.nonEmpty, "no LogicalRDD in the plan — checkpoint truncation lost")
  }

  test("triangles matches a brute-force local count") {
    val n = 300
    val docs = docsDf(n)
    val und = Graph
      .linkEdges(docs)
      .select(
        org.apache.spark.sql.functions.least(col("src"), col("dst")),
        org.apache.spark.sql.functions.greatest(col("src"), col("dst")))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = (for {
      (u, v) <- und.iterator
      w <- nodes if v < w
      if und((v, w)) && und((u, w))
    } yield 1).size
    val row = Graph.triangles(spark, docs).collect().head
    assert(row.getAs[Long]("n_edges") == und.size.toLong)
    assert(row.getAs[Long]("n_triangles") == expected.toLong)
  }

  test("kcore matches a local peel simulation and converges with margin") {
    val n = 300
    val docs = docsDf(n)
    val und = Graph
      .linkEdges(docs)
      .select(
        org.apache.spark.sql.functions.least(col("src"), col("dst")),
        org.apache.spark.sql.functions.greatest(col("src"), col("dst")))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val k = 4
    var alive = und.flatMap(e => Seq(e._1, e._2))
    var rounds = 0
    var stable = false
    while (!stable) {
      rounds += 1
      val deg = alive.toSeq.map { v =>
        v -> und.count(e =>
          (e._1 == v && alive(e._2)) || (e._2 == v && alive(e._1)))
      }.toMap
      val next = alive.filter(deg(_) >= k)
      stable = next == alive
      alive = next
    }
    // the oracle unrolls KcoreRounds: require real convergence margin
    assert(rounds <= Graph.KcoreRounds - 2,
      s"peel took $rounds rounds; oracle unrolls ${Graph.KcoreRounds}")
    val expected = alive.toSeq.sorted.map { v =>
      v -> und.count(e =>
        (e._1 == v && alive(e._2)) || (e._2 == v && alive(e._1))).toLong
    }
    val got = Graph.kcore(spark, docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  // ---- EWMA ----

  private def eventsDf(rows: Seq[(Long, Long, Long, Double)]) = {
    import spark.implicits._
    rows
      .toDF("event_id", "epoch_s", "user_id", "value")
      .select(
        col("event_id"),
        col("epoch_s").cast("timestamp").as("ts"),
        col("user_id"),
        col("value"))
  }

  test("ewma of a constant series is the constant (fixed-point exact)") {
    // 30 events > 21-tail: exercises the window truncation too
    val rows = (0 until 30).map(i => (i.toLong, 1000L + i, 7L, 2.5))
    val out = TimeSeriesOps.ewmaLast(eventsDf(rows)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_tail") == 21)
    assert(out.head.getAs[Double]("ewma") == 2.5)
  }

  test("funnel counts strictly-ordered step completion per user") {
    // u1 completes all 3 in order; u2's click precedes their first
    // view (step 2 not reached); u3 stops after click; u4 purchases
    // without ever viewing (reaches nothing)
    val rows = Seq(
      (0L, 100L, 1L, "view"), (1L, 200L, 1L, "click"),
      (2L, 300L, 1L, "purchase"),
      (3L, 100L, 2L, "click"), (4L, 200L, 2L, "view"),
      (5L, 100L, 3L, "view"), (6L, 200L, 3L, "click"),
      (7L, 100L, 4L, "purchase"))
    import spark.implicits._
    val ev = rows
      .toDF("event_id", "epoch_s", "user_id", "event_type")
      .select(col("event_id"), col("epoch_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    val r = TimeSeriesOps.funnel(ev).collect().head
    assert(r.getAs[Long]("n_step1") == 3) // u1, u2, u3 viewed
    assert(r.getAs[Long]("n_step2") == 2) // u1, u3 clicked after view
    assert(r.getAs[Long]("n_step3") == 1) // u1 purchased after click
  }

  test("retention buckets cohorts by first-event week") {
    // 2024-01-01 is a Monday; weeks are Monday-truncated
    val rows = Seq(
      (0L, "2024-01-01 10:00:00", 1L), // u1 cohort W0, active W0
      (1L, "2024-01-16 10:00:00", 1L), // u1 active W2
      (2L, "2024-01-03 10:00:00", 2L), // u2 cohort W0, W0 only
      (3L, "2024-01-08 10:00:00", 3L), // u3 cohort W1
      (4L, "2024-01-15 10:00:00", 3L)) // u3 active W1+1
    import spark.implicits._
    val ev = rows
      .toDF("event_id", "ts_s", "user_id")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"))
    val got = TimeSeriesOps
      .retention(ev)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L), // u1+u2 active in their cohort week
      ("2024-01-01", 2L, 1L), // u1 back in week 2
      ("2024-01-08", 0L, 1L), // u3 cohort
      ("2024-01-08", 1L, 1L))) // u3 back next week
  }

  test("kl divergence is exactly zero for an identical distribution " +
      "and positive for a skewed one") {
    import spark.implicits._
    // src A and B have IDENTICAL word distributions -> p == q for
    // every term of each source -> every fixed-point term is 0
    val same = Seq(
      (0L, "alpha beta gamma", "a"), (1L, "alpha beta gamma", "b"))
      .toDF("doc_id", "text", "source")
    val z = graft.operators.TextAnalysis.klDivergence(same).collect()
    assert(z.forall(_.getAs[Double]("kl") == 0.0))
    // skewed: source b is all-alpha, corpus is mixed -> positive drift
    val skew = Seq(
      (0L, "alpha beta gamma delta", "a"), (1L, "alpha alpha alpha alpha", "b"))
      .toDF("doc_id", "text", "source")
    val k = graft.operators.TextAnalysis
      .klDivergence(skew)
      .collect()
      .map(r => (r.getString(0), r.getDouble(2)))
      .toMap
    assert(k("b") > 0.1)
  }

  // ---- Connected components / BFS ----

  test("connected components matches a local union-find over the same edges") {
    val n = 200
    val docs = docsDf(n)
    val edges = Graph
      .linkEdges(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // local union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u.toInt), find(v.toInt))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    // union-find root is NOT guaranteed minimal per component without
    // full path compression ordering; normalize both sides to
    // min-node-per-component
    val minOf = expected.toSeq.groupBy(_._2).map { case (root, m) =>
      root -> m.map(_._1).min
    }
    val want = expected.view.mapValues(minOf).toMap
    val got = Graph
      .connectedComponents(spark, docs)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == want)
  }

  test("bfs hop counts match a local Dijkstra-free BFS") {
    val n = 200
    val docs = docsDf(n)
    val und = Graph
      .linkEdges(docs)
      .collect()
      .flatMap(r => Seq(
        (r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    val distExp = collection.mutable.Map[Long, Int]()
    var frontier = (0L until 5L).toSet
    frontier.foreach(s => distExp(s) = 0)
    var h = 0
    while (frontier.nonEmpty && h < Graph.MaxHops) {
      h += 1
      frontier = frontier
        .flatMap(u => und.getOrElse(u, Set.empty))
        .filterNot(distExp.contains)
      frontier.foreach(v => distExp(v) = h)
    }
    val got = Graph
      .bfs(spark, docs)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(got == distExp.toMap)
  }

  // ---- Sweep-line concurrency / MAD / autocorrelation ----

  private def valuedEvents(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows
      .toDF("event_id", "epoch_s", "user_id", "event_type", "value")
      .select(col("event_id"), col("epoch_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  test("concurrency counts overlapping intervals, end-exclusive") {
    // type A: [100,110) [105,115) [110,120) -> peak 2 (the interval
    // ending at 110 does NOT overlap the one starting at 110)
    // type B: three nested -> peak 3
    val ev = valuedEvents(Seq(
      (0L, 100L, 1L, "A", 10.0), (1L, 105L, 1L, "A", 10.0),
      (2L, 110L, 1L, "A", 10.0),
      (3L, 200L, 1L, "B", 30.0), (4L, 205L, 1L, "B", 20.0),
      (5L, 210L, 1L, "B", 10.0)))
    val got = TimeSeriesOps
      .concurrency(ev)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("A", 2L, 3L), ("B", 3L, 3L)))
  }

  test("concurrency two-level prefix sum equals the single-window sweep " +
      "across bucket boundaries") {
    // intervals spanning several minute-buckets, with ties at bucket
    // edges — the shape that would expose an offset/ordering bug
    val rows = (0 until 300).map { i =>
      (i.toLong, 1000L + (i * 37) % 400, 1L, "T", (i % 90).toDouble)
    }
    val got = TimeSeriesOps.concurrency(valuedEvents(rows)).collect().head
    // local single-pass sweep
    val deltas = rows.flatMap { case (id, t, _, _, v) =>
      Seq((t, 1L, id), (t + v.toLong, -1L, id))
    }.sortBy { case (t, d, id) => (t, d, id) }
    var cur = 0L; var peak = 0L
    deltas.foreach { case (_, d, _) => cur += d; peak = math.max(peak, cur) }
    assert(got.getAs[Long]("max_concurrent") == peak)
    assert(got.getAs[Long]("n_intervals") == 300L)
  }

  test("MAD anomaly detection is robust to a single wild value") {
    // 20 values at 10.0 +- 0.5, one wild 400.0: the wild value is the
    // only outlier, and it cannot inflate MAD the way it inflates
    // stddev
    val rows = (0 until 20).map(i =>
      (i.toLong, 1000L + i, 1L, "A", 10.0 + (i % 2) * 0.5)) :+
      (20L, 1020L, 1L, "A", 400.0)
    val got = TimeSeriesOps.anomalyMad(valuedEvents(rows)).collect().head
    assert(got.getAs[Long]("n_events") == 21)
    assert(got.getAs[Long]("n_outliers") == 1)
    assert(got.getAs[Double]("mad") == 0.5)
  }

  test("autocorrelation is +1 for a strictly alternating-free ramp and " +
      "-1 for a perfect alternation") {
    // ramp: x_{t+1} = x_t + 1 -> lag-1 pairs are perfectly correlated
    val ramp = (0 until 50).map(i =>
      (i.toLong, 1000L + i, 1L, "A", i.toDouble))
    // alternation around a mean -> perfectly anti-correlated
    val alt = (0 until 50).map(i =>
      (100L + i, 2000L + i, 2L, "A", if (i % 2 == 0) 1.0 else -1.0))
    val got = TimeSeriesOps
      .autocorr(valuedEvents(ramp ++ alt))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    assert(math.abs(got(1L) - 1.0) < 1e-12)
    assert(math.abs(got(2L) + 1.0) < 1e-9)
  }

  test("holt: constant series is a fixpoint (level = const, trend = 0)") {
    val rows = (0 until 30).map(i => (i.toLong, 1000L + i, 1L, "A", 7.25))
    val got = TimeSeriesOps.holt(valuedEvents(rows)).collect().head
    assert(got.getAs[Int]("n_tail") == TimeSeriesOps.HoltW)
    assert(got.getAs[Double]("level") == 7.25)
    assert(got.getAs[Double]("trend") == 0.0)
    assert(got.getAs[Double]("forecast") == 7.25)
  }

  test("holt matches an exact BigInt recurrence replay and tracks a ramp") {
    // x_t = 3t: the local replay runs the textbook recurrence in exact
    // rationals; the operator's convolution must agree to the last bit
    val rows = (0 until 25).map(i =>
      (i.toLong, 1000L + i, 1L, "A", 3.0 * i))
    val tail = (25 - TimeSeriesOps.HoltW until 25).map(i =>
      BigInt(math.floor(3.0 * i * 10000).toLong))
    // replay: numerators (ln, bn) over denominator dn
    var ln = tail.head; var bn = BigInt(0); var dn = BigInt(1)
    tail.tail.foreach { x =>
      val nl = 2 * x * dn + 2 * ln + 2 * bn
      val nb = x * dn - ln + 3 * bn
      ln = nl; bn = nb; dn *= 4
    }
    val expLevel = (BigDecimal(ln) / BigDecimal(dn) / 10000).toDouble
    val got = TimeSeriesOps.holt(valuedEvents(rows)).collect().head
    val gotLevel = got.getAs[Double]("level")
    val gotTrend = got.getAs[Double]("trend")
    // exact equality of the integer numerators via the published values
    assert(math.abs(gotLevel - expLevel) < 1e-9)
    // a linear ramp's trend estimate converges near the slope (3.0)
    assert(math.abs(gotTrend - 3.0) < 0.2)
    assert(got.getAs[Double]("forecast") == gotLevel + got.getAs[Double]("trend")
      || math.abs(got.getAs[Double]("forecast") - (gotLevel + gotTrend)) < 1e-9)
  }

  test("holt-winters matches an exact BigInt recurrence replay on a " +
      "seasonal ramp") {
    // x_t = 2t + season bump: the replay runs the coupled textbook
    // recurrences (alpha=beta=gamma=1/2) in exact rationals
    val m = TimeSeriesOps.HwM
    val bump = Seq(5.0, 0.0, -3.0, 1.0)
    val rows = (0 until 30).map(i =>
      (i.toLong, 1000L + i, 1L, "A", 2.0 * i + bump(i % m)))
    val w = TimeSeriesOps.HwW
    val tail = (30 - w until 30).map(i =>
      BigInt(math.floor((2.0 * i + bump(i % m)) * 10000).toLong))
    // numerators over common denominator dn
    var ln = tail.head
    var bn = BigInt(0)
    val sn = Array.fill(m)(BigInt(0))
    var dn = BigInt(1)
    for (t <- 1 until w) {
      val x = tail(t)
      val slot = t % m
      val nl2 = ln + bn - sn(slot) + x * dn // den 2*dn
      val nb = nl2 - 2 * ln + 2 * bn // den 4*dn
      val ns = 2 * sn(slot) - nl2 + 2 * x * dn // den 4*dn
      for (j <- 0 until m if j != slot) sn(j) *= 4
      ln = 2 * nl2; bn = nb; sn(slot) = ns; dn *= 4
    }
    val fSlot = w % m
    def toD(v: BigInt) = (BigDecimal(v) / BigDecimal(dn) / 10000).toDouble
    val got = TimeSeriesOps.holtWinters(valuedEvents(rows)).collect().head
    assert(got.getAs[Int]("n_tail") == w)
    assert(math.abs(got.getAs[Double]("level") - toD(ln)) < 1e-9)
    assert(math.abs(got.getAs[Double]("trend") - toD(bn)) < 1e-9)
    assert(math.abs(got.getAs[Double]("season") - toD(sn(fSlot))) < 1e-9)
    // the trend estimate tracks the deseasonalized slope
    assert(math.abs(got.getAs[Double]("trend") - 2.0) < 1.0)
  }

  test("changepoint finds a planted level shift, brute-force-verified") {
    // user 1: level 2.0 for 12 events then 9.0 for 8 -> cp at k=12;
    // user 2: deterministic pseudo-noise, verified by brute force
    val rows =
      (0 until 20).map(i => (i.toLong, 1000L + i, 1L, "A",
        if (i < 12) 2.0 else 9.0)) ++
      (0 until 15).map(i => (100L + i, 2000L + i, 2L, "A",
        ((i * 37) % 11).toDouble))
    val got = TimeSeriesOps.changepoint(valuedEvents(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L)._1 == 12L)
    // brute force for user 2: d_k = n*c_k - k*S over y = 1e4-scaled
    val ys = (0 until 15).map(i => ((i * 37) % 11).toLong * 10000)
    val n = ys.size.toLong
    val s = ys.sum
    val (bk, bd) = (1 until 15).map { k =>
      (k.toLong, math.abs(n * ys.take(k).sum - k * s))
    }.maxBy { case (k, d) => (d, -k) }
    assert(got(2L) == ((bk, bd)))
  }

  test("ewma weights the latest value by ~1/2 and matches hand arithmetic") {
    // two events: older value 1.0 (weight 2^19), latest 3.0 (weight 2^20)
    val rows = Seq((0L, 1000L, 1L, 1.0), (1L, 1001L, 1L, 3.0))
    val out = TimeSeriesOps.ewmaLast(eventsDf(rows)).collect().head
    val num = 30000L * (1L << 20) + 10000L * (1L << 19)
    val den = (1L << 20) + (1L << 19)
    assert(out.getAs[Double]("ewma") == num.toDouble / den / 10000.0)
    assert(out.getAs[Long]("n_tail") == 2)
  }
}
