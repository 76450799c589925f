package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** The relational operator surface (SURVEY.md §2.6 parity plan) over the
  * driver's TPC-H-ish testdata: scans, filters/projections, joins
  * (broadcast / shuffle / semi / anti), aggregations, rollup/cube,
  * windows, sorts/limits, set ops, scalar/date/JSON functions.
  *
  * Scale notes: dimension joins are explicitly `broadcast()`; aggregates
  * are Catalyst two-phase hash aggregates (map-side partial combine);
  * every filter/projection is expressed declaratively so pushdown and
  * column pruning reach the parquet scans.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- aggregation -----------------------------------------------------
    // TPC-H Q1-shaped: two-phase hash aggregate over the fact table.
    "q1_agg" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_distinct" -> ((s, dir) => {
      rd(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"))
    }),

    // --- filter + projection (pushdown / pruning) ------------------------
    "q_filter_proj" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    }),

    // --- joins -----------------------------------------------------------
    // Fact x small dim: explicitly broadcast (no shuffle of lineitem).
    "q_join_broadcast" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
      val part = rd(s, dir, "part")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy("p_brand")
    }),

    // Star join through three dims to the fact table.
    "q_join_multi" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      val c = rd(s, dir, "customer")
      val n = rd(s, dir, "nation")
      val r = rd(s, dir, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("r_name")
    }),

    // TPC-H Q3 (shipping priority, adapted to the test schema): the
    // classic filter-early / join-narrow / limit-late plan — selective
    // predicates on BOTH fact sides push to the scans, the filtered
    // customer dim broadcasts, and a top-10 WindowGroupLimit-free
    // global sort runs over the (small) aggregated result. Revenue
    // accumulates as DECIMAL (order-free exact sums), cast to double
    // only at output.
    "q_tpch_q3" -> ((s, dir) => {
      val c = rd(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = rd(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-06-01"))
      val l = rd(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 (local supplier volume): the 6-table join with the
    // non-key c_nationkey = s_nationkey condition that forces the
    // planner to place the customer join AFTER supplier resolves its
    // nation — dims broadcast, facts shuffle once on orderkey.
    "q_tpch_q5" -> ((s, dir) => {
      val c = rd(s, dir, "customer")
      val o = rd(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      val l = rd(s, dir, "lineitem")
      val su = rd(s, dir, "supplier")
      val n = rd(s, dir, "nation")
      val r = rd(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    // lost to returns — a big-group aggregate (one group per customer)
    // followed by a global top-k, the shape where the aggregate must
    // partial-combine map-side before the shuffle.
    "q_tpch_q10" -> ((s, dir) => {
      val c = rd(s, dir, "customer")
      val o = rd(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-07-01"))
      val l = rd(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = rd(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter):
    // the selective orders filter builds a bloom filter at runtime that
    // prunes lineitem rows BEFORE the join shuffle — the row-level
    // runtime filter that complements q_dpp's partition-level pruning.
    // Disabling size-based broadcast (in the clone only) keeps the
    // join a shuffle join, which is what the filter exists for; at
    // 100 TB this is the difference between shuffling the full fact
    // table and shuffling the ~1/5 that can match. SkewJoinSpec pins
    // that might_contain is actually in the plan.
    "q_runtime_bloom" -> ((s, dir) => {
      // a CLONED session scopes the thresholds to this query: the test
      // tables are MBs, so at session defaults both join sides are
      // broadcastable-by-size and InjectRuntimeFilter rightly skips
      // (broadcast joins don't need the filter). Production keeps the
      // defaults — a 100 TB fact side passes the gates on its own.
      val s2 = s.newSession()
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.sql.shuffle.partitions"))
      // raw scans (no post-scan repartition): InjectRuntimeFilter
      // pattern-matches a selective Filter DIRECTLY over the creation
      // scan and sizes the application side by its scan
      val l = s2.read.parquet(s"$dir/lineitem.parquet")
      val o = s2.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice"))).cast("double").as("total_price"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q18 (large-volume customers): aggregate the fact, filter
    // the GROUPS (HAVING), then semi-join the qualifying keys back
    // into a 3-table join — the plan where the optimizer must reuse
    // the aggregation's partitioning instead of re-shuffling, and the
    // group-filter must run BEFORE the wide join. Quantities are
    // integer-valued doubles, so their sums are exact and order-free.
    "q_tpch_q18" -> ((s, dir) => {
      val l = rd(s, dir, "lineitem")
      val big = l.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
        .select(col("l_orderkey").as("big_okey"))
      val o = rd(s, dir, "orders")
      val c = rd(s, dir, "customer")
      l.join(big, l("l_orderkey") === col("big_okey"), "left_semi")
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
    }),

    // Semi join (EXISTS).
    "q_semi_join" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      val big = rd(s, dir, "lineitem").filter(col("l_quantity") > 49)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // Anti join (NOT EXISTS) — same shape as the MOR delete application.
    "q_anti_join" -> ((s, dir) => {
      val c = rd(s, dir, "customer")
      val o = rd(s, dir, "orders").filter(col("o_totalprice") > 450000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // --- grouping sets ---------------------------------------------------
    "q_rollup" -> ((s, dir) => {
      // SQL form: Dataset-level lineage tags trip DetectAmbiguousSelfJoin
      // on rollup-after-join; the SQL path builds the identical plan.
      Seq("orders", "customer", "nation", "region")
        .foreach(t => rd(s, dir, t).createOrReplaceTempView(t))
      s.sql(
        """SELECT COALESCE(r_name, 'ALL') AS region,
          |  COALESCE(n_name, 'ALL') AS nation,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY region, nation""".stripMargin)
    }),

    "q_cube" -> ((s, dir) => {
      rd(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))
        .orderBy("status", "priority")
    }),

    // Pivot-style conditional aggregation.
    "q_pivot" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      def cnt(status: String) =
        sum(when(col("o_orderstatus") === status, 1).otherwise(0))
          .cast("long")
      o.groupBy("o_orderpriority")
        .agg(cnt("F").as("n_f"), cnt("O").as("n_o"), cnt("P").as("n_p"))
        .orderBy("o_orderpriority")
    }),

    // --- windows ---------------------------------------------------------
    // Top-5 orders per market segment (rank window, deterministic ties).
    "q_window_topk" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      val c = rd(s, dir, "customer")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rn")
    }),

    // Running sum per user (frame window; exact decimal arithmetic).
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      rdEvents(s, dir)
        .filter(col("user_id") % 100 === 0)
        .withColumn("running_value",
          sum(dec(col("value"), 4)).over(w).cast("double"))
        .select("user_id", "event_id", "event_type", "running_value")
        .orderBy("user_id", "event_id")
    }),

    // --- cumulative distinct count (the COUNT(DISTINCT) OVER rewrite) ----
    // Spark (correctly) refuses DISTINCT aggregates over windows; the
    // scalable rewrite is first-occurrence reduction: min(ts) per
    // (type, user) — one shuffle on the composite key — collapses the
    // stream to one row per distinct entity BEFORE any window runs, then
    // the cumulative sum operates on the tiny per-day relation. A direct
    // windowed distinct would carry per-partition state proportional to
    // the distinct-user count; this shape is linear + a small window.
    "q_cumulative_distinct" -> ((s, dir) => {
      val firstDay = rdEvents(s, dir)
        .groupBy("event_type", "user_id")
        .agg(min(to_date(col("ts"))).as("day"))
      val daily = firstDay.groupBy("event_type", "day")
        .agg(count(lit(1)).as("n_new_users"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("cum_users", sum("n_new_users").over(w))
        .select("event_type", "day", "n_new_users", "cum_users")
        .orderBy("event_type", "day")
    }),

    // Navigation window: lag/lead over each customer's order history.
    "q_window_nav" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      rd(s, dir, "orders")
        .filter(col("o_custkey") % 100 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // --- sort / limit ----------------------------------------------------
    "q_sort_limit" -> ((s, dir) => {
      rd(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(100)
    }),

    // --- set operations --------------------------------------------------
    "q_set_union" -> ((s, dir) => {
      val a = rd(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = rd(s, dir, "customer").filter(col("c_acctbal") > 1000)
        .select(col("c_custkey").as("k"))
      a.union(b).distinct().orderBy("k")
    }),

    "q_set_intersect" -> ((s, dir) => {
      val a = rd(s, dir, "customer").select(col("c_custkey").as("k"))
      val b = rd(s, dir, "orders").select(col("o_custkey").as("k"))
      a.intersect(b).orderBy("k")
    }),

    "q_set_except" -> ((s, dir) => {
      val a = rd(s, dir, "customer").select(col("c_custkey").as("k"))
      val b = rd(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("k"))
      a.except(b).orderBy("k")
    }),

    // --- scalar functions ------------------------------------------------
    "q_scalar_fns" -> ((s, dir) => {
      rd(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_up"),
          lower(col("p_type")).as("type_lo"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 10).as("name_10"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          abs(col("p_size") - 25).as("size_dist"),
          dec(col("p_retailprice")).cast("double").as("price2"))
        .orderBy("p_partkey")
        .limit(500)
    }),

    // --- date functions --------------------------------------------------
    "q_date_agg" -> ((s, dir) => {
      rd(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("y", "m")
    }),

    // --- JSON ------------------------------------------------------------
    "q_json" -> ((s, dir) => {
      rdEvents(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
          dec(col("value"), 4).as("v"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("sum_value"))
        .orderBy("k")
    }),

    // --- dynamic partition pruning ---------------------------------------
    // The fact side is written hive-partitioned by day; the dim side is
    // a filtered day list only known at runtime. Catalyst plants a
    // dynamicpruning subquery in the fact scan's PartitionFilters, so
    // only the dim's surviving days are ever read (DppSpec asserts the
    // subquery in the plan). At 100 TB this is the date-dim star-join
    // pattern: the fact scan reads the qualifying days, not the table.
    "q_dpp" -> ((s, dir) => {
      val r = graft.plans.GeneratedTables.ensureCustom(dir + "#dpp") { root =>
        rdEvents(s, dir).withColumn("day", to_date(col("ts")))
          .write.partitionBy("day").parquet(root + "/events_by_day")
      }
      val fact = s.read.parquet(r + "/events_by_day")
      // Tuesdays only (weekday: Monday=0) — selective, data-dependent
      val dim = fact.select(col("day")).distinct()
        .filter(weekday(col("day")) === 1)
      fact.join(broadcast(dim), "day")
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"), 4)).cast("double").as("sum_value"))
        .orderBy("day")
    }),

    // --- salted skew join ------------------------------------------------
    // Deterministic salting for hot keys: left rows get a stable salt,
    // the (small) right side replicates once per salt, the join runs on
    // (key, salt) — identical results, factor-x wider shuffle key space
    // so no single task holds a hot key's whole block (the explicit
    // fallback when AQE skew splitting isn't enough at 100 TB).
    "q_skew_join" -> ((s, dir) => {
      val left = rd(s, dir, "lineitem").select(
        col("l_orderkey").as("okey"),
        dec(col("l_extendedprice"), 4).as("price"))
      val right = rd(s, dir, "orders").select(
        col("o_orderkey").as("okey"), col("o_orderstatus"))
      graft.operators.SkewJoin.saltedInner(left, right, "okey")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_items"),
          sum(col("price")).cast("double").as("total"))
        .orderBy("o_orderstatus")
    }),

    // AQE skew-join: the RUNTIME answer to the same skew q_skew_join
    // solves statically with salting — Spark measures the shuffle's
    // actual partition sizes and splits the oversized ones into
    // parallel sub-joins (skew=true on the final SortMergeJoin,
    // spec-pinned in AqeSkewSpec). 80% of the fact rows collapse onto
    // one synthetic hot key; thresholds are scoped to a cloned session
    // because the MB-scale test shuffle sits far under the production
    // defaults (256MB / 5x median).
    "q_aqe_skew" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "800b")
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "800b")
      s2.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "1b")
      // the join feeds an aggregation, which imposes a distribution
      // requirement on the join's output; without force, AQE declines
      // to split (the split breaks that distribution and needs an
      // extra shuffle — the right trade when one straggler partition
      // holds 80% of the data)
      s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.shuffle.partitions", "100")
      def skey(c: org.apache.spark.sql.Column) =
        when(pmod(c, lit(10)) < 8, 0L).otherwise(c)
      // the single-file test scan is ONE map task, and AQE splits a
      // skewed reduce partition by MAPPER ranges — one mapper means
      // nothing to split. Spread the scan first (production fact
      // tables arrive as many files; this exchange doesn't exist
      // there).
      val l = s2.read.parquet(s"$dir/lineitem.parquet")
        .repartition(8)
        .select(skey(col("l_orderkey")).as("skey"),
          dec(col("l_extendedprice"), 4).as("price"))
      // dim without an aggregate: OptimizeSkewedJoin pattern-matches
      // Sort-over-shuffle on BOTH join inputs, and a distinct's final
      // HashAggregate between them defeats the match. The tail keys
      // are unique already (o_orderkey is the key); the hot key is one
      // literal row.
      val d = s2.read.parquet(s"$dir/orders.parquet")
        .filter(pmod(col("o_orderkey"), lit(10)) >= 8)
        .select(col("o_orderkey").as("skey"))
        .union(s2.range(1).select(lit(0L).as("skey")))
      l.join(d, "skey")
        .groupBy(when(col("skey") === 0L, "hot").otherwise("tail")
          .as("bucket"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("price")).cast("double").as("total"))
        .orderBy("bucket")
    }),

    // --- materialized-view query rewrite ---------------------------------
    // The aggregate below never executes against lineitem: the MV
    // substitution rule (plans/MvRewrite.scala) recognizes the exact
    // (group set, aggregate set) over the registered base scan and
    // swaps in the |groups|-row view — the 100 TB answer to repeated
    // aggregations (full scan once, kept current by the IVM layer).
    // Exact-set matching means no OTHER query in the shared session
    // can silently re-route. Min/max/count only: they are exact on
    // doubles, so view-computed and direct results are bit-identical.
    "q_mv_rewrite" -> ((s, dir) => {
      import graft.plans.MvRewrite
      def aggOf(df: DataFrame) = df.groupBy("l_returnflag").agg(
        count(lit(1)).as("n_rows"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      val base = s.read.parquet(s"$dir/lineitem.parquet")
      val root = graft.plans.GeneratedTables.ensureCustom(dir + "#mv") { r =>
        aggOf(base).write.mode("overwrite").parquet(r + "/mv_li_flag")
      }
      MvRewrite.register(s, MvRewrite.MvDef("li_by_flag",
        MvRewrite.pathOf(base).getOrElse(sys.error("no scan path")),
        Seq("l_returnflag"),
        Seq(("count", "*", "n_rows"), ("min", "l_extendedprice", "min_price"),
          ("max", "l_extendedprice", "max_price")),
        root + "/mv_li_flag"))
      aggOf(base).orderBy("l_returnflag")
    }),

    // --- materialized-view ROLL-UP rewrite -------------------------------
    // The view is grouped by (l_returnflag, l_linestatus); the query
    // groups by l_returnflag only. The rule re-aggregates the view at
    // the coarser grain (count -> sum of counts, min/max fold again) —
    // exact for these functions — so the scan still reads |fine
    // groups| rows, never lineitem.
    "q_mv_rollup" -> ((s, dir) => {
      import graft.plans.MvRewrite
      val base = s.read.parquet(s"$dir/lineitem.parquet")
      // agg set {count, min} differs from q_mv_rewrite's view on
      // purpose: with exact-set matching, neither query can land on
      // the other's view in the shared session
      val root = graft.plans.GeneratedTables.ensureCustom(dir + "#mv2") { r =>
        base.groupBy("l_returnflag", "l_linestatus").agg(
          count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("min_price"))
          .write.mode("overwrite").parquet(r + "/mv_li_fs")
      }
      MvRewrite.register(s, MvRewrite.MvDef("li_by_flag_status",
        MvRewrite.pathOf(base).getOrElse(sys.error("no scan path")),
        Seq("l_returnflag", "l_linestatus"),
        Seq(("count", "*", "n_rows"), ("min", "l_extendedprice", "min_price")),
        root + "/mv_li_fs"))
      base.groupBy("l_returnflag").agg(
          count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("min_price"))
        .orderBy("l_returnflag")
    }),

    // --- fuzzy self-join (record linkage) --------------------------------
    // Jaro-Winkler matching over DISTINCT part names with first-letter
    // blocking: the pair join is bounded by the name VOCABULARY (which
    // saturates), not the row count — per-name row counts are carried
    // as a linear aggregation. The threshold test runs in exact long
    // arithmetic inside a native codegen expression (JaroWinklerGe), so
    // there is no float round-off at the decision boundary. At 100 TB
    // you widen blocking to redundant keys (q-grams, phonetic codes) —
    // the same bounded-vocabulary shape.
    "q_fuzzy_join" -> ((s, dir) => {
      val names = rd(s, dir, "part").groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("cnt"))
      val a = names.select(col("name").as("name_a"), col("cnt").as("cnt_a"))
      val b = names.select(col("name").as("name_b"), col("cnt").as("cnt_b"))
      a.join(b, substring(col("name_a"), 1, 1) === substring(col("name_b"), 1, 1)
          && col("name_a") < col("name_b"))
        .filter(graft.functions.StringSimilarity.jaroWinklerGe(
          col("name_a"), col("name_b"), 89, 100))
        .select("name_a", "name_b", "cnt_a", "cnt_b")
        .orderBy("name_a", "name_b")
    }),

    // --- bucketed co-partitioned join (shuffle-free) ---------------------
    // Both fact tables persisted bucketed on the join key (Spark native
    // bucketing): the sort-merge join reads bucket i against bucket i
    // directly — NO exchange on either side (BucketJoinSpec asserts the
    // plan). At 100 TB this is THE two-fact-table join strategy: the
    // shuffle happens once at write time and every subsequent join of
    // any two co-bucketed tables is exchange-free.
    "q_bucket_join" -> ((s, dir) => {
      graft.plans.GeneratedTables.ensureCustom(dir + "#buckets") { root =>
        rd(s, dir, "orders").write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", root + "/bj_orders").saveAsTable("bj_orders")
        rd(s, dir, "lineitem").write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", root + "/bj_lineitem").saveAsTable("bj_lineitem")
      }
      s.table("bj_orders").hint("merge")
        .join(s.table("bj_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice"), 4)).cast("double").as("revenue"))
        .orderBy("o_orderstatus")
    }),

    // --- VARIANT (Spark 4 semi-structured type) --------------------------
    // Build a nested variant from typed columns (no float formatting —
    // engine-portable), then navigate it back out with typed
    // extraction: the open-schema ingestion path Spark 4 adds over
    // get_json_object string probing. The binary variant encoding is
    // exercised end to end; the oracle reads the source columns
    // directly, so a hash match proves the variant round-trip is
    // lossless. try_variant_get on a missing path must yield null.
    "q_variant" -> ((s, dir) => {
      rdEvents(s, dir)
        .select(col("event_id"),
          parse_json(to_json(struct(
            struct(col("event_type").as("type")).as("meta"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))))
            .as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("variant_get(v, '$.meta.type', 'string')").as("typ"),
          expr("try_variant_get(v, '$.missing', 'int')").as("absent"))
        .orderBy("event_id")
    }),

    // --- time-bucketed aggregation (batch form of a tumbling window) -----
    "q_events_window" -> ((s, dir) => {
      rdEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"), 4)).cast("double").as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket", "event_type")
    }),

    // the SAME aggregation replayed through Structured Streaming
    // (readStream parquet source -> watermarked window agg ->
    // AvailableNow drain -> memory sink); shares the batch oracle
    "stream_window_counts" -> ((s, dir) =>
      graft.streaming.EventsStream.replayWindowedCounts(s, dir)),

    // watermark-bounded stateful dedup replayed over the finite table;
    // first-occurrence state dedup must equal batch DISTINCT
    "stream_dedup" -> ((s, dir) =>
      graft.streaming.EventsStream.replayDedupCounts(s, dir)),

    // stream-stream interval join (clicks x purchases within 1h)
    // replayed; must equal the batch range join row-for-row
    "stream_join" -> ((s, dir) =>
      graft.streaming.EventsStream.replayIntervalJoin(s, dir)),

    // event-time-timeout sessionization (flatMapGroupsWithState with
    // order-free fixed-point sums) replayed; the oracle reproduces the
    // emission contract with gaps-and-islands + the final watermark
    "stream_sessions" -> ((s, dir) =>
      graft.streaming.EventsStream.replaySessionStats(s, dir)),

    // the PRODUCTION streaming sink under the gate: events replayed
    // through writeStream.format("graft-table") (exactly-once snapshot
    // commits), read back via the MOR scan, aggregated — must equal
    // the same aggregate over the original table
    "stream_ingest" -> ((s, dir) => {
      val root = graft.plans.GeneratedTables.ensureCustom(
        dir + "#streamingest") { root =>
        graft.streaming.EventsStream.ingestAndAggregate(s, dir, root,
          "stream", "events_ingest")
      }
      graft.plans.Mor.read(s, root, "stream", "events_ingest")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    // Hopping (sliding) windows: 1-hour windows every 30 minutes —
    // each event contributes to exactly two overlapping buckets.
    // Spark's window() expands the event to its covering windows
    // BEFORE the aggregation (a flatMap, not a self-join); the oracle
    // replays the expansion with a two-offset unnest.
    "q_hopping_window" -> ((s, dir) => {
      rdEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"), 4)).cast("double").as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket", "event_type")
    }),

    // Session windows (gap-based, the batch twin of the streaming
    // sessionizer): Spark's native session_window merges a user's
    // events closer than the gap; the oracle replays it with
    // lag + cumulative-sum session ids — the same semantics spelled
    // out relationally.
    "q_session_window" -> ((s, dir) => {
      rdEvents(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"), 4)).cast("double").as("sum_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "session_start")
    }),

    // --- ordered string aggregation --------------------------------------
    "q_listagg" -> ((s, dir) => {
      val su = rd(s, dir, "supplier")
      val n = rd(s, dir, "nation")
      su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(concat_ws(",", array_sort(collect_list(col("s_name"))))
          .as("suppliers"),
          count(lit(1)).as("n_supp"))
        .orderBy("n_name")
    })
  )

  /** Shared by the batch query and its streaming replay — one oracle,
    * two execution engines.
    */
  private val eventsWindowSql: String =
    """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
        |FROM lineitem""".stripMargin,

    "q_filter_proj" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin,

    "q_join_broadcast" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_multi" ->
      """SELECT r_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // the salted join's runtime twin: same skew, same answer
    "q_aqe_skew" ->
      """WITH l AS (SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
        |      ELSE l_orderkey END AS skey,
        |    CAST(l_extendedprice AS DECIMAL(18,4)) AS price
        |  FROM lineitem),
        |d AS (SELECT o_orderkey AS skey FROM orders
        |      WHERE o_orderkey % 10 >= 8
        |      UNION ALL SELECT 0)
        |SELECT CASE WHEN skey = 0 THEN 'hot' ELSE 'tail' END AS bucket,
        |  count(*) AS n_items, CAST(sum(price) AS DOUBLE) AS total
        |FROM l JOIN d USING (skey)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_runtime_bloom" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING sum(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1998-06-01'
        |  AND l_shipdate > DATE '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "q_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_window_topk" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,4)))
        |       OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running_value
        |FROM events WHERE user_id % 100 = 0
        |ORDER BY user_id, event_id""".stripMargin,

    "q_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
        |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price
        |FROM orders WHERE o_custkey % 100 = 0
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_set_union" ->
      """SELECT o_custkey AS k FROM orders
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 1000
        |ORDER BY k""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT
        |SELECT o_custkey FROM orders
        |ORDER BY k""".stripMargin,

    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 450000
        |ORDER BY k""".stripMargin,

    "q_scalar_fns" ->
      """SELECT p_partkey, upper(p_brand) AS brand_up, lower(p_type) AS type_lo,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substring(p_name, 1, 10) AS name_10,
        |  p_brand || '#' || p_type AS brand_type,
        |  abs(p_size - 25) AS size_dist,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price2
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,

    "q_date_agg" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,

    "q_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    // DPP changes which partitions are READ, never results: Tuesdays
    // aggregated directly (isodow: Monday=1, so Tuesday=2)
    "q_dpp" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE isodow(CAST(ts AS DATE)) = 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the first-occurrence rewrite equals the naive windowed distinct
    "q_cumulative_distinct" ->
      """WITH f AS (SELECT event_type, user_id, min(CAST(ts AS DATE)) AS day
        |           FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, day, count(*) AS n_new_users
        |      FROM f GROUP BY 1, 2)
        |SELECT event_type, day, n_new_users,
        |  CAST(sum(n_new_users) OVER (PARTITION BY event_type ORDER BY day)
        |    AS BIGINT) AS cum_users
        |FROM d ORDER BY event_type, day""".stripMargin,

    // salting changes execution, never results: the plain join
    "q_skew_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the roll-up rewrite changes execution, never results
    "q_mv_rollup" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  min(l_extendedprice) AS min_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the rewrite changes execution, never results: the plain aggregate
    "q_mv_rewrite" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // DuckDB's jaro_winkler_similarity follows the same classic
    // conventions the native expression implements; 0.89 sits in a gap
    // of the similarity-value lattice for this corpus, so the float
    // boundary cannot flip a pair
    "q_fuzzy_join" ->
      """WITH n AS (SELECT p_name AS name, count(*) AS cnt FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  a.cnt AS cnt_a, b.cnt AS cnt_b
        |FROM n a JOIN n b
        |  ON substr(a.name, 1, 1) = substr(b.name, 1, 1) AND a.name < b.name
        |WHERE jaro_winkler_similarity(a.name, b.name) >= 0.89
        |ORDER BY name_a, name_b""".stripMargin,

    // bucketing changes execution, never results: the plain join
    "q_bucket_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the variant was built from these source columns, so reading them
    // straight proves the Spark-side variant round-trip lossless
    "q_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  event_type AS typ, CAST(NULL AS INTEGER) AS absent
        |FROM events ORDER BY event_id""".stripMargin,

    "q_events_window" -> eventsWindowSql,
    // identical oracle: a finite streaming replay MUST equal the batch
    // aggregate (lambda-architecture collapse, checked to the hash)
    "stream_window_counts" -> eventsWindowSql,

    // streaming first-occurrence dedup == batch DISTINCT
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n_users
        |FROM (SELECT DISTINCT user_id, event_type FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the interval join's batch twin: purchases within [click, click+1h]
    "stream_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  epoch_us(p.ts) AS purchase_us,
        |  CAST(floor(p.value * 10000.0) AS BIGINT) AS value_fp
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 3600 SECONDS
        |ORDER BY click_id, purchase_us, value_fp""".stripMargin,

    // gaps-and-islands sessionization + the emission contract: a
    // session is visible iff a later same-user event closed it (it is
    // not the user's last island) OR the stream's final watermark
    // (max event ms, zero delay) passed last_ts + gap
    "stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t,
        |    CAST(floor(value * 10000.0) AS BIGINT) AS value_fp
        |  FROM events),
        |mx AS (SELECT max(t) AS wm FROM e),
        |s AS (SELECT user_id, t, value_fp,
        |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |           > 1800000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s2 AS (SELECT user_id, t, value_fp,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sid
        |  FROM s),
        |sess AS (SELECT user_id, sid, count(*) AS n_events,
        |    CAST(sum(value_fp) AS BIGINT) AS value_fp, max(t) AS last_t
        |  FROM s2 GROUP BY user_id, sid),
        |em AS (SELECT user_id, n_events, value_fp
        |  FROM sess, mx
        |  WHERE sid < (SELECT max(s3.sid) FROM sess s3
        |               WHERE s3.user_id = sess.user_id)
        |     OR last_t + 1800000 < wm)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(sum(value_fp) AS BIGINT) AS value_fp
        |FROM em GROUP BY user_id ORDER BY user_id""".stripMargin,

    // ingest -> exactly-once commits -> MOR scan must be lossless
    "stream_ingest" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // each event covers starts floor30(ts) and floor30(ts) - 30min
    "q_hopping_window" ->
      """WITH h AS (SELECT event_type, value,
        |    time_bucket(INTERVAL '30 minutes', ts)
        |      - o * INTERVAL '30 minutes' AS b
        |  FROM events, (SELECT unnest([0, 1]) AS o) t)
        |SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM h GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "q_session_window" ->
      """WITH d AS (SELECT user_id, ts, value,
        |    CASE WHEN epoch_us(ts::TIMESTAMP) -
        |      lag(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
        |      >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM d)
        |SELECT user_id,
        |  strftime(min(ts)::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,

    "q_listagg" ->
      """SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
        |  count(*) AS n_supp
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
