package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing over the event stream: per-key exponentially
  * weighted moving average (EWMA), the standard low-latency trend
  * signal for metric streams (monitoring, rate estimation, freshness
  * weighting of per-source quality in a crawl pipeline).
  *
  * EWMA is a sequential recurrence, which is the enemy of both
  * distributed execution and cross-engine reproducibility. Two exact
  * choices sidestep both problems:
  *
  *  - decay r = 1/2 (half-life of one event): the weights 2^-m are
  *    exact powers of two, so the windowed reformulation
  *    ewma = sum(x_m * 2^(W-m)) / sum(2^(W-m)) over the last W+1
  *    events uses only exact integer weights — no pow() rounding
  *    drift between engines. Truncating the window at W=20 lags
  *    changes the result by < 2^-20 of the oldest value, and the
  *    truncation is IDENTICAL on both sides, so the oracle still
  *    matches bit-for-bit.
  *  - fixed-point values: x is floored to 1e-4 units before the
  *    weighted sum, making the numerator/denominator exact longs;
  *    the single final division of two agreed longs is IEEE-exact.
  *
  * Scale: one window (rank within key) + one aggregation, both
  * partitioned by the series key. The rank-limit (<= 21 rows per key)
  * is a WindowGroupLimit, so each map task forwards at most 21 rows
  * per key to the shuffle — the tail selection never materializes a
  * full per-key history.
  */
object TimeSeriesOps {

  /** Tail length: weights 2^20 .. 2^0 over the last 21 events. */
  val WindowLags = 20

  /** Per-key EWMA of `value` at the latest event, keyed by user.
    * Returns (user_id, n_tail, ewma) with n_tail the number of events
    * that contributed (< 21 for short series).
    */
  def ewmaLast(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("rnd", row_number().over(w))
      .filter(col("rnd") <= WindowLags + 1) // WindowGroupLimit: partial
      .select(
        col("user_id"),
        floor(col("value") * 10000).cast("long").as("x_fp"),
        // lag m = rnd-1, weight 2^(20-m) = 2^(21-rnd), exact
        expr(s"CAST(pow(2, ${WindowLags + 1} - rnd) AS BIGINT)").as("wt"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_tail"),
        sum(col("x_fp") * col("wt")).as("num"),
        sum(col("wt")).as("den"))
      .select(
        col("user_id"),
        col("n_tail"),
        (col("num").cast("double") / col("den") / 10000.0).as("ewma"))
  }

  /** Ordered-funnel analysis: how many users reach step i of a
    * strictly-ordered event sequence (each step's event must occur
    * AFTER the user's earliest completion of the previous step — the
    * standard product-analytics funnel). Returns one row with a count
    * per step.
    *
    * Scale: one filtered scan + per-user min-aggregation per step,
    * each co-partitioned on user_id; step relations are one row per
    * qualifying user, so the per-step join input shrinks
    * monotonically down the funnel. No window over full histories, no
    * per-user event sorting.
    */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    var cur = events
      .filter(col("event_type") === steps.head)
      .groupBy("user_id")
      .agg(min("ts").as("t"))
    var out = cur.agg(count(lit(1)).as("n_step1"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      cur = events
        .filter(col("event_type") === st)
        .join(cur, "user_id")
        .filter(col("ts") > col("t"))
        .groupBy("user_id")
        .agg(min("ts").as("t"))
      out = out.crossJoin(cur.agg(count(lit(1)).as(s"n_step${i + 2}")))
    }
    out
  }

  /** Oracle twin of [[funnel]] for the default 3-step sequence. */
  def funnelSql(steps: Seq[String] = Seq("view", "click", "purchase")): String = {
    val ctes = steps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id, min(ts) AS t FROM events
           |  WHERE event_type = '$st' GROUP BY user_id)""".stripMargin
      else
        s"""s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t
           |  FROM events e JOIN s$i USING (user_id)
           |  WHERE e.event_type = '$st' AND e.ts > s$i.t
           |  GROUP BY e.user_id)""".stripMargin
    }
    val sel = steps.indices
      .map(i => s"(SELECT count(*) FROM s${i + 1}) AS n_step${i + 1}")
      .mkString(",\n  ")
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT $sel""".stripMargin
  }

  /** Sessionized funnel: the [[funnel]] step sequence required to
    * complete WITHIN ONE SESSION — the product question behind most
    * funnel dashboards is "did the user convert in that visit", not
    * "ever later". Composes the ts family with the streaming surface's
    * session semantics: sessions come from Spark's native
    * `session_window` (the same 30-minute-gap rule as
    * `q_session_window`), while the oracle rebuilds them relationally
    * (lag + cumulative-sum session ids), so the sessionizers are
    * independent implementations checked against each other. Returns
    * one row: total sessions plus the count of sessions whose events
    * complete each step prefix in strict time order.
    *
    * Scale shape: session bounds are one sessionized aggregation over
    * events; tagging is an equi-join on user_id against that user's
    * (few) bounds with the range predicate as the join filter; each
    * step is one co-partitioned join + min-aggregation keyed by
    * (user, session) — state one row per session per step, and the
    * 1-row step counts cross-join at the end (bounded constants).
    */
  def sessionFunnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      gap: String = "30 minutes"): DataFrame = {
    val bounds = events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_ev"))
      .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"))
    // Tag events by (user, calendar day) rather than user alone: a
    // user whose gaps all exceed the session gap has one session PER
    // EVENT, and a user_id-only join would fan out events_u x
    // sessions_u (quadratic on exactly the sparse-gap distribution).
    // Each session expands to the days it touches (gap-bounded
    // sessions span few), so the join is bounded by events-per-day x
    // sessions-per-day per user. The range filter is unchanged — this
    // is purely an execution-shape change, not a semantic one.
    val expanded = bounds
      .select(col("user_id"), col("ws"), col("we"),
        explode(sequence(to_date(col("ws")), to_date(col("we")))).as("d"))
    val tagged = events.select("user_id", "ts", "event_type")
      .withColumn("d", to_date(col("ts")))
      .join(expanded, Seq("user_id", "d"))
      .filter(col("ts") >= col("ws") && col("ts") < col("we"))
    var cur = tagged.filter(col("event_type") === steps.head)
      .groupBy("user_id", "ws").agg(min("ts").as("t"))
    var out = bounds.agg(count(lit(1)).as("n_sessions"))
      .crossJoin(cur.agg(count(lit(1)).as("n_step1")))
    for ((st, i) <- steps.tail.zipWithIndex) {
      cur = tagged.filter(col("event_type") === st)
        .join(cur, Seq("user_id", "ws"))
        .filter(col("ts") > col("t"))
        .groupBy("user_id", "ws").agg(min("ts").as("t"))
      out = out.crossJoin(cur.agg(count(lit(1)).as(s"n_step${i + 2}")))
    }
    out
  }

  /** Oracle twin of [[sessionFunnel]]: the q_session_window
    * lag+cumsum sessionizer, then the funnel CTE chain keyed by
    * (user, session).
    */
  def sessionFunnelSql(
      steps: Seq[String] = Seq("view", "click", "purchase")): String = {
    val ctes = steps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id, sess, min(ts) AS t FROM s
           |  WHERE event_type = '$st' GROUP BY 1, 2)""".stripMargin
      else
        s"""s${i + 1} AS (SELECT s.user_id, s.sess, min(s.ts) AS t
           |  FROM s JOIN s$i ON s.user_id = s$i.user_id
           |    AND s.sess = s$i.sess
           |  WHERE s.event_type = '$st' AND s.ts > s$i.t
           |  GROUP BY 1, 2)""".stripMargin
    }
    val sel = steps.indices
      .map(i => s"(SELECT count(*) FROM s${i + 1}) AS n_step${i + 1}")
      .mkString(",\n  ")
    s"""WITH d AS (SELECT user_id, ts, event_type,
       |    CASE WHEN epoch_us(ts::TIMESTAMP) -
       |      lag(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
       |      >= 1800000000 THEN 1 ELSE 0 END AS new_s
       |  FROM events),
       |s AS (SELECT user_id, ts, event_type,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS UNBOUNDED PRECEDING) AS sess
       |  FROM d),
       |${ctes.mkString(",\n")}
       |SELECT (SELECT count(*) FROM
       |    (SELECT DISTINCT user_id, sess FROM s) q) AS n_sessions,
       |  $sel""".stripMargin
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; for each (cohort week, week offset), how many of
    * that cohort were active. The date arithmetic is all-integer
    * (Monday-truncated weeks, day-difference div 7), so counts are
    * exact.
    *
    * Scale: distinct (user, week) first — the only pass over raw
    * events — then per-user min and one counting aggregation; state
    * is per-user-week, not per-event.
    */
  def retention(events: DataFrame): DataFrame = {
    val wk = events
      .select(
        col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
    wk.join(cohort, "user_id")
      .select(
        col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Oracle twin of [[retention]]. */
  def retentionSql: String =
    s"""WITH wk AS (SELECT DISTINCT user_id,
       |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
       |c AS (SELECT user_id, min(week) AS cohort_week FROM wk
       |      GROUP BY user_id)
       |SELECT c.cohort_week,
       |  date_diff('day', c.cohort_week, wk.week) // 7 AS week_offset,
       |  count(*) AS n_users
       |FROM wk JOIN c USING (user_id)
       |GROUP BY c.cohort_week, week_offset""".stripMargin

  /** Holt tail length: the trend recursion runs over the newest
    * [[HoltW]] events per key.
    */
  val HoltW = 16

  /** Exact dyadic coefficient tables for Holt's linear trend with
    * alpha = beta = 1/2 over a tail of n observations (oldest = index
    * 0), for every n in 1..maxW.
    *
    * The recurrences l_t = a*x_t + (1-a)(l_{t-1} + b_{t-1}),
    * b_t = b*(l_t - l_{t-1}) + (1-b)*b_{t-1} are LINEAR in the
    * observations, so the final (level, trend) is an integer-coefficient
    * convolution over the tail once everything is scaled by 4^(n-1):
    * substituting a = b = 1/2 gives the one-step update
    *   l' = (2*x_t*4^d + 2*lc + 2*bc) / 4^(d+1)
    *   b' = (  x_t*4^d -   lc + 3*bc) / 4^(d+1)
    * with init l = x_0, b = 0. Tracking numerators symbolically yields,
    * per tail length n, integer vectors cl/cb with common denominator
    * 4^(n-1) — the same "sequential recurrence as exact integer
    * weighted sum" move as [[ewmaLast]], one order up (matrix instead
    * of scalar decay). Returns rows (n, idx, cl, cb).
    */
  def holtCoefficients(maxW: Int = HoltW): Seq[(Int, Int, Long, Long)] =
    (1 to maxW).flatMap { n =>
      val lc = Array.fill(n)(BigInt(0))
      val bc = Array.fill(n)(BigInt(0))
      lc(0) = BigInt(1)
      var den = BigInt(1)
      for (t <- 1 until n) {
        val nl = Array.tabulate(n)(i => 2 * lc(i) + 2 * bc(i))
        val nb = Array.tabulate(n)(i => -lc(i) + 3 * bc(i))
        nl(t) += 2 * den
        nb(t) += den
        Array.copy(nl, 0, lc, 0, n)
        Array.copy(nb, 0, bc, 0, n)
        den *= 4
      }
      (0 until n).map { i =>
        require(lc(i).isValidLong && bc(i).isValidLong,
          s"holt coefficient overflow at n=$n i=$i")
        (n, i, lc(i).toLong, bc(i).toLong)
      }
    }

  /** Per-key Holt linear-trend state (level, trend) and one-step
    * forecast at the latest event — the trend-aware sibling of
    * [[ewmaLast]] (which cannot see a ramp: its forecast lags any
    * linearly growing series by a constant). All arithmetic until the
    * final division is exact long integer: values fix-point to 1e-4,
    * the coefficient join brings the 4^(n-1)-scaled dyadic weights,
    * and the two weighted sums bound well inside int64
    * (|c| <= 2*4^15, x < 5e6 scaled, 16 terms -> < 2^58).
    *
    * Scale: one rank window partitioned by key with a WindowGroupLimit
    * tail (<= 16 rows per key cross the shuffle), a broadcast join
    * against the 136-row coefficient table, one aggregation.
    */
  def holt(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    import spark.implicits._
    val cdf = holtCoefficients().toDF("n_tail", "idx", "cl", "cb")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val tail = events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 10000).cast("long").as("x"))
      .withColumn("rnd", row_number().over(w))
      .filter(col("rnd") <= HoltW)
      .withColumn("n_tail",
        count(lit(1)).over(Window.partitionBy("user_id")).cast("int"))
      .withColumn("idx", col("n_tail") - col("rnd"))
    tail.join(broadcast(cdf), Seq("n_tail", "idx"))
      .groupBy("user_id")
      .agg(
        first("n_tail").as("n_tail"),
        sum(col("cl") * col("x")).as("num_l"),
        sum(col("cb") * col("x")).as("num_b"))
      .select(col("user_id"), col("n_tail"),
        holtDiv(col("num_l")).as("level"),
        holtDiv(col("num_b")).as("trend"),
        holtDiv(col("num_l") + col("num_b")).as("forecast"))
  }

  /** num / 4^(n_tail-1) / 1e4 — the single IEEE division pair both
    * engines perform on identically-agreed exact operands.
    */
  private def holtDiv(num: Column): Column =
    num.cast("double") /
      expr("CAST(shiftleft(CAST(1 AS BIGINT), 2*(n_tail-1)) AS DOUBLE)") /
      lit(10000.0)

  /** Top user journeys: the most frequent length-3 consecutive
    * event-type paths across users (the product-analytics "common
    * paths" report), with the count of distinct users following each.
    * Two lag windows on the shared user_id shuffle; path state is
    * |types|³ at most.
    */
  def paths(events: DataFrame, topK: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("s3"))
      .withColumn("s2", lag("s3", 1).over(w))
      .withColumn("s1", lag("s3", 2).over(w))
      .filter(col("s1").isNotNull)
      .groupBy("s1", "s2", "s3")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(desc("n"), col("s1"), col("s2"), col("s3"))
      .limit(topK)
  }

  /** Oracle twin of [[paths]]. */
  def pathsSql(topK: Int = 20): String =
    s"""WITH p AS (SELECT user_id, event_type AS s3,
       |    lag(event_type, 1) OVER win AS s2,
       |    lag(event_type, 2) OVER win AS s1
       |  FROM events WINDOW win AS (PARTITION BY user_id
       |    ORDER BY ts, event_id))
       |SELECT s1, s2, s3, count(*) AS n,
       |  count(DISTINCT user_id) AS n_users
       |FROM p WHERE s1 IS NOT NULL GROUP BY 1, 2, 3
       |ORDER BY n DESC, s1, s2, s3 LIMIT $topK""".stripMargin

  /** Classical seasonal decomposition (STL-lite) of the per-type DAILY
    * value series: trend = centered 7-day moving average, seasonal
    * index per weekday = mean of the detrended values. The float-free
    * trick: instead of subtracting the fractional trend, detrend as
    * 7·v − sum7 (a pure long — the subtraction scaled by the window
    * width), and divide the per-weekday sums back out once at the end
    * (one agreed IEEE division chain). Only complete 7-day windows
    * contribute, so edges can't bias the indices.
    *
    * Scale: the raw pass is one (type, day) aggregation; everything
    * after runs on the tiny daily relation (|types|·|days| rows).
    */
  def decompose(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 10000).cast("long").as("x"))
      .groupBy("event_type", "day")
      .agg(sum("x").as("v"))
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    daily
      .withColumn("sum7", sum("v").over(w7))
      .withColumn("cnt7", count(lit(1)).over(w7))
      .filter(col("cnt7") === 7)
      .select(col("event_type"), weekday(col("day")).as("dow"),
        (col("v") * 7 - col("sum7")).as("detr"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"), sum("detr").as("sd"))
      .select(col("event_type"), col("dow"), col("n_days"),
        (col("sd").cast("double") / col("n_days") / 7.0 / 10000.0)
          .as("seasonal"))
      .orderBy("event_type", "dow")
  }

  /** Oracle twin of [[decompose]]. Spark weekday() is 0=Monday =
    * DuckDB isodow - 1.
    */
  def decomposeSql: String =
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS v
       |  FROM events GROUP BY 1, 2),
       |t AS (SELECT event_type, day, v,
       |    CAST(sum(v) OVER w7 AS BIGINT) AS sum7,
       |    count(*) OVER w7 AS cnt7
       |  FROM d WINDOW w7 AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |s AS (SELECT event_type, isodow(day) - 1 AS dow,
       |    count(*) AS n_days,
       |    CAST(sum(v * 7 - sum7) AS BIGINT) AS sd
       |  FROM t WHERE cnt7 = 7 GROUP BY 1, 2)
       |SELECT event_type, dow, n_days,
       |  CAST(sd AS DOUBLE) / n_days / 7.0 / 10000.0 AS seasonal
       |FROM s ORDER BY event_type, dow""".stripMargin

  /** Seasonal-residual anomaly detection — the composition of
    * [[decompose]] (what is the weekly shape) and [[anomalyMad]]'s
    * robust rule (which points break it): daily totals are DETRENDED
    * by the same centered 7-day window (r = v·7 − sum7, exact longs),
    * and outliers are flagged by the 3·MAD rule WITHIN each
    * (event_type, day-of-week) group — comparing Mondays to Mondays
    * handles the seasonal component structurally, with no
    * seasonal-estimate division entering the residual (everything
    * stays an integer-valued double, so the percentile interpolation
    * is exact in both engines per the playbook). Returns one row per
    * (event_type, dow): days observed, days flagged, median and MAD
    * of the residual in value units.
    *
    * Scale: one daily aggregation, one bounded 7-row window per type,
    * two percentile aggregations over |types|·|dows| groups — state is
    * per-group, never per-event.
    */
  def residualAnomaly(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 10000).cast("long").as("x"))
      .groupBy("event_type", "day")
      .agg(sum("x").as("v"))
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val detr = daily
      .withColumn("sum7", sum("v").over(w7))
      .withColumn("cnt7", count(lit(1)).over(w7))
      .filter(col("cnt7") === 7)
      .select(col("event_type"), weekday(col("day")).as("dow"),
        (col("v") * 7 - col("sum7")).cast("double").as("r"))
    val med = detr.groupBy("event_type", "dow")
      .agg(expr("percentile(r, 0.5)").as("med"))
    val mad = detr.join(med, Seq("event_type", "dow"))
      .groupBy("event_type", "dow")
      .agg(expr("percentile(abs(r - med), 0.5)").as("mad"),
        first("med").as("med"))
    detr.join(mad, Seq("event_type", "dow"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"),
        sum(when(abs(col("r") - col("med")) > lit(3) * col("mad"), 1L)
          .otherwise(0L)).as("n_flagged"),
        first("med").as("med_r"), first("mad").as("mad_r"))
      .select(col("event_type"), col("dow"), col("n_days"),
        col("n_flagged"),
        // r is in 7 x 1e-4 value units: one agreed division back
        (col("med_r") / 70000.0).as("median_resid"),
        (col("mad_r") / 70000.0).as("mad_resid"))
      .orderBy("event_type", "dow")
  }

  /** Oracle twin of [[residualAnomaly]] (decompose's CTEs + the
    * quantile_cont MAD rule; Spark weekday() = DuckDB isodow − 1).
    */
  def residualAnomalySql: String =
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS v
       |  FROM events GROUP BY 1, 2),
       |t AS (SELECT event_type, day, v,
       |    CAST(sum(v) OVER w7 AS BIGINT) AS sum7,
       |    count(*) OVER w7 AS cnt7
       |  FROM d WINDOW w7 AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |r AS (SELECT event_type, isodow(day) - 1 AS dow,
       |    CAST(v * 7 - sum7 AS DOUBLE) AS r
       |  FROM t WHERE cnt7 = 7),
       |med AS (SELECT event_type, dow, quantile_cont(r, 0.5) AS med
       |        FROM r GROUP BY 1, 2),
       |mad AS (SELECT r.event_type, r.dow,
       |          quantile_cont(abs(r - med), 0.5) AS mad,
       |          any_value(med) AS med
       |        FROM r JOIN med USING (event_type, dow) GROUP BY 1, 2)
       |SELECT r.event_type, r.dow, count(*) AS n_days,
       |  CAST(sum(CASE WHEN abs(r - med) > 3 * mad THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_flagged,
       |  any_value(med) / 70000.0 AS median_resid,
       |  any_value(mad) / 70000.0 AS mad_resid
       |FROM r JOIN mad USING (event_type, dow)
       |GROUP BY r.event_type, r.dow
       |ORDER BY event_type, dow""".stripMargin

  /** First-order Markov transition matrix of event types per the
    * user-ordered event stream: counts and row-normalized
    * probabilities for every (from, to) pair of CONSECUTIVE events of
    * the same user. The behavioral-model summary (what follows what)
    * next to [[funnel]]'s fixed-sequence view. Counts are exact longs;
    * the probability is one IEEE division of agreed operands.
    *
    * Scale: one lag window partitioned by user (the same shuffle every
    * per-user operator here shares), then a groupBy on the (from, to)
    * pair — state is |types|², not data-sized.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag("to_type", 1).over(w))
      .filter(col("from_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum("n").as("tot"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("tot")).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Oracle twin of [[transitions]]. */
  def transitionsSql: String =
    s"""WITH p AS (SELECT user_id, event_type AS to_type,
       |    lag(event_type) OVER (PARTITION BY user_id
       |                          ORDER BY ts, event_id) AS from_type
       |  FROM events),
       |c AS (SELECT from_type, to_type, count(*) AS n FROM p
       |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c
       |      GROUP BY from_type)
       |SELECT c.from_type, c.to_type, c.n,
       |  CAST(c.n AS DOUBLE) / tot AS p
       |FROM c JOIN t USING (from_type)
       |ORDER BY from_type, to_type""".stripMargin

  /** Season count and tail width for [[holtWinters]]. Seasons are
    * positions in the event SEQUENCE modulo [[HwM]] (the ewma/holt
    * convention: the per-key event order is the time axis), and the
    * coefficient magnitudes grow ~4^n like Holt's, so the same 16-event
    * tail stays far inside int64 (generator-checked).
    */
  val HwM = 4
  val HwW = 16

  /** Holt-Winters ADDITIVE-SEASONAL coefficients: with
    * alpha = beta = gamma = 1/2 the three coupled recurrences
    *
    *   l_t = (x_t - s_{t-m})/2 + (l+b)/2
    *   b_t = (l_t - l_{t-1})/2 + b/2
    *   s_t = (x_t - l_t)/2 + s_{t-m}/2
    *
    * stay dyadic with common denominator 4^(n-1) — the [[holt]] move
    * with state dimension 2+m instead of 2. Init l_0 = x_0, b_0 = 0,
    * seasons 0 (so every state is a pure linear form over the tail and
    * the whole fold collapses to three integer weighted sums). Emits
    * (n, idx, cl, cb, cs) where cs is the weight vector of the season
    * slot the ONE-STEP FORECAST uses (slot n mod m).
    */
  def holtWintersCoefficients(maxW: Int = HwW,
      m: Int = HwM): Seq[(Int, Int, Long, Long, Long)] =
    (1 to maxW).flatMap { n =>
      val l = Array.fill(n)(BigInt(0))
      val b = Array.fill(n)(BigInt(0))
      val s = Array.fill(m, n)(BigInt(0))
      l(0) = BigInt(1)
      var den = BigInt(1)
      for (t <- 1 until n) {
        val slot = t % m
        // nl2 over den 2D: l + b - s_slot, + D at x_t
        val nl2 = Array.tabulate(n)(i => l(i) + b(i) - s(slot)(i))
        nl2(t) += den
        // den moves to 4D for everything below
        val nb = Array.tabulate(n)(i => nl2(i) - 2 * l(i) + 2 * b(i))
        val ns = Array.tabulate(n)(i => 2 * s(slot)(i) - nl2(i))
        ns(t) += 2 * den
        for (j <- 0 until m if j != slot)
          for (i <- 0 until n) s(j)(i) *= 4
        for (i <- 0 until n) {
          l(i) = 2 * nl2(i)
          b(i) = nb(i)
          s(slot)(i) = ns(i)
        }
        den *= 4
      }
      val fSlot = n % m
      (0 until n).map { i =>
        require(l(i).isValidLong && b(i).isValidLong &&
          s(fSlot)(i).isValidLong,
          s"holt-winters coefficient overflow at n=$n i=$i")
        (n, i, l(i).toLong, b(i).toLong, s(fSlot)(i).toLong)
      }
    }

  /** Per-key Holt-Winters additive-seasonal state at the latest event:
    * level, trend, the forecast-relevant seasonal component, and the
    * one-step forecast l + b + s_{next slot}. Identical dataflow to
    * [[holt]] — rank-window tail (<= [[HwW]] rows per key cross the
    * shuffle), broadcast join against the 136-row coefficient table,
    * one aggregation, and a single final IEEE division pair on agreed
    * exact operands.
    */
  def holtWinters(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    import spark.implicits._
    val cdf = holtWintersCoefficients().toDF("n_tail", "idx", "cl", "cb", "cs")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val tail = events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 10000).cast("long").as("x"))
      .withColumn("rnd", row_number().over(w))
      .filter(col("rnd") <= HwW)
      .withColumn("n_tail",
        count(lit(1)).over(Window.partitionBy("user_id")).cast("int"))
      .withColumn("idx", col("n_tail") - col("rnd"))
    tail.join(broadcast(cdf), Seq("n_tail", "idx"))
      .groupBy("user_id")
      .agg(
        first("n_tail").as("n_tail"),
        sum(col("cl") * col("x")).as("num_l"),
        sum(col("cb") * col("x")).as("num_b"),
        sum(col("cs") * col("x")).as("num_s"))
      .select(col("user_id"), col("n_tail"),
        holtDiv(col("num_l")).as("level"),
        holtDiv(col("num_b")).as("trend"),
        holtDiv(col("num_s")).as("season"),
        holtDiv(col("num_l") + col("num_b") + col("num_s")).as("forecast"))
  }

  /** Oracle twin of [[holtWinters]] (VALUES-inlined coefficients). */
  def holtWintersSql: String = {
    val values = holtWintersCoefficients()
      .map { case (n, i, cl, cb, cs) => s"($n, $i, $cl, $cb, $cs)" }
      .mkString(", ")
    s"""WITH r AS (SELECT user_id, value,
       |    row_number() OVER (PARTITION BY user_id
       |                       ORDER BY ts DESC, event_id DESC) AS rnd
       |  FROM events),
       |t AS (SELECT user_id, CAST(floor(value * 10000) AS BIGINT) AS x,
       |        rnd
       |      FROM r WHERE rnd <= $HwW),
       |nt AS (SELECT user_id, CAST(count(*) AS INT) AS n_tail FROM t
       |       GROUP BY user_id),
       |c(n_tail, idx, cl, cb, cs) AS (VALUES $values),
       |j AS (SELECT t.user_id, nt.n_tail, c.cl, c.cb, c.cs, t.x
       |      FROM t JOIN nt USING (user_id)
       |      JOIN c ON c.n_tail = nt.n_tail AND c.idx = nt.n_tail - t.rnd),
       |agg AS (SELECT user_id, max(n_tail) AS n_tail,
       |          CAST(sum(cl * x) AS BIGINT) AS num_l,
       |          CAST(sum(cb * x) AS BIGINT) AS num_b,
       |          CAST(sum(cs * x) AS BIGINT) AS num_s
       |        FROM j GROUP BY user_id)
       |SELECT user_id, n_tail,
       |  CAST(num_l AS DOUBLE) / CAST(CAST(1 AS BIGINT) << (2*(n_tail-1)) AS DOUBLE)
       |    / 10000.0 AS level,
       |  CAST(num_b AS DOUBLE) / CAST(CAST(1 AS BIGINT) << (2*(n_tail-1)) AS DOUBLE)
       |    / 10000.0 AS trend,
       |  CAST(num_s AS DOUBLE) / CAST(CAST(1 AS BIGINT) << (2*(n_tail-1)) AS DOUBLE)
       |    / 10000.0 AS season,
       |  CAST(num_l + num_b + num_s AS DOUBLE)
       |    / CAST(CAST(1 AS BIGINT) << (2*(n_tail-1)) AS DOUBLE) / 10000.0 AS forecast
       |FROM agg""".stripMargin
  }

  /** Oracle twin of [[holt]]: the coefficient table inlined as VALUES
    * rows (the exact integers the Scala generator produced).
    */
  def holtSql: String = {
    val values = holtCoefficients()
      .map { case (n, i, cl, cb) => s"($n, $i, $cl, $cb)" }
      .mkString(", ")
    s"""WITH r AS (SELECT user_id, value,
       |    row_number() OVER (PARTITION BY user_id
       |                       ORDER BY ts DESC, event_id DESC) AS rnd
       |  FROM events),
       |t AS (SELECT user_id, CAST(floor(value * 10000) AS BIGINT) AS x,
       |        rnd
       |      FROM r WHERE rnd <= $HoltW),
       |nt AS (SELECT user_id, CAST(count(*) AS INT) AS n_tail FROM t
       |       GROUP BY user_id),
       |c(cn, idx, cl, cb) AS (VALUES $values),
       |s AS (SELECT t.user_id, any_value(nt.n_tail) AS n_tail,
       |        CAST(sum(c.cl * t.x) AS BIGINT) AS num_l,
       |        CAST(sum(c.cb * t.x) AS BIGINT) AS num_b
       |      FROM t JOIN nt USING (user_id)
       |        JOIN c ON c.cn = nt.n_tail AND c.idx = nt.n_tail - t.rnd
       |      GROUP BY t.user_id)
       |SELECT user_id, n_tail,
       |  CAST(num_l AS DOUBLE)
       |    / CAST(CAST(1 AS BIGINT) << (2*(n_tail-1)) AS DOUBLE)
       |    / 10000.0 AS level,
       |  CAST(num_b AS DOUBLE)
       |    / CAST(CAST(1 AS BIGINT) << (2*(n_tail-1)) AS DOUBLE)
       |    / 10000.0 AS trend,
       |  CAST(num_l + num_b AS DOUBLE)
       |    / CAST(CAST(1 AS BIGINT) << (2*(n_tail-1)) AS DOUBLE)
       |    / 10000.0 AS forecast
       |FROM s""".stripMargin
  }

  /** Max concurrent intervals per event type — the classic sweep-line
    * overlap count (peak concurrent sessions / connections / jobs).
    * Each event opens an interval [ts, ts + floor(value) seconds); the
    * sweep unpivots intervals to +-1 deltas and takes the max running
    * sum, ordered by (t, delta, event_id) so an interval closing at t
    * never overlaps one opening at t (end-exclusive) and ties break
    * identically in both engines.
    *
    * Scale: the running sum is a TWO-LEVEL prefix sum (the
    * [[PipelineOps.tokenBudget]] shape): deltas bucket by epoch minute
    * (monotone in t, so bucket order respects sweep order and equal
    * timestamps share a bucket), the per-row window runs per
    * (event_type, bucket), and each bucket's offset is a second window
    * over per-bucket TOTALS — no single task ever sorts a whole event
    * type's history. offset + intra-bucket cum equals the one-window
    * running sum bit-for-bit (the oracle pins the equivalence by
    * computing the single window).
    */
  def concurrency(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = events.select(
      col("event_type"), col("event_id"), col("ts").as("st"),
      expr("timestampadd(SECOND, CAST(floor(value) AS INT), ts)").as("en"))
    val deltas = iv
      .select(col("event_type"), col("st").as("t"), lit(1L).as("d"),
        col("event_id"))
      .union(iv.select(col("event_type"), col("en").as("t"),
        lit(-1L).as("d"), col("event_id")))
      .withColumn("bucket", expr("unix_seconds(t) div 60"))
    val wIn = Window.partitionBy("event_type", "bucket")
      .orderBy("t", "d", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = deltas.withColumn("cum", sum("d").over(wIn))
    val wOff = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = deltas
      .groupBy("event_type", "bucket")
      .agg(sum("d").as("tot"))
      .withColumn("off", coalesce(sum("tot").over(wOff), lit(0L)))
      .select("event_type", "bucket", "off")
    cum.join(offsets, Seq("event_type", "bucket"))
      .groupBy("event_type")
      .agg(
        max(col("off") + col("cum")).as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .orderBy("event_type")
  }

  /** Oracle twin of [[concurrency]]: the single-window running sum. */
  def concurrencySql: String =
    s"""WITH iv AS (SELECT event_type, event_id, ts AS st,
       |    ts + to_seconds(CAST(floor(value) AS INT)) AS en FROM events),
       |d AS (SELECT event_type, st AS t, 1 AS d, event_id FROM iv
       |      UNION ALL
       |      SELECT event_type, en, -1, event_id FROM iv),
       |c AS (SELECT event_type,
       |        sum(d) OVER (PARTITION BY event_type
       |                     ORDER BY t, d, event_id) AS conc
       |      FROM d)
       |SELECT event_type, CAST(max(conc) AS BIGINT) AS max_concurrent,
       |  CAST(count(*) / 2 AS BIGINT) AS n_intervals
       |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Robust per-user anomaly detection by median absolute deviation:
    * an event is an outlier when |v - median(v)| > 3 * MAD. Values are
    * fixed-pointed to 0.01 units first so both engines interpolate
    * percentiles over integer-valued doubles (midpoints are exact
    * binary fractions — bit-identical across engines; the q_percentile
    * precedent). MAD is the standard robust scale estimator — unlike
    * stddev-based z-scores (q_zscore_outliers), one wild value cannot
    * inflate the threshold and mask other outliers.
    *
    * Scale: two percentile aggregations and one join, all partitioned
    * by user — percentile state is per-group sorted values, bounded by
    * the per-user history (for unbounded histories the approx twin is
    * `approx_percentile`, same shape).
    */
  def anomalyMad(events: DataFrame): DataFrame = {
    val fp = events.select(col("user_id"), col("event_id"),
      (floor(col("value") * 100)).cast("double").as("v"))
    val med = fp.groupBy("user_id")
      .agg(expr("percentile(v, 0.5)").as("med"))
    val mad = fp.join(med, "user_id")
      .groupBy("user_id")
      .agg(expr("percentile(abs(v - med), 0.5)").as("mad"),
        first("med").as("med"))
    fp.join(mad, "user_id")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(abs(col("v") - col("med")) > lit(3) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        first("med").as("med_fp"),
        first("mad").as("mad_fp"))
      .select(col("user_id"), col("n_events"), col("n_outliers"),
        (col("med_fp") / 100.0).as("median"),
        (col("mad_fp") / 100.0).as("mad"))
  }

  /** Oracle twin of [[anomalyMad]]. */
  def anomalyMadSql: String =
    s"""WITH fp AS (SELECT user_id, event_id,
       |    CAST(floor(value * 100) AS DOUBLE) AS v FROM events),
       |med AS (SELECT user_id, quantile_cont(v, 0.5) AS med FROM fp
       |        GROUP BY user_id),
       |mad AS (SELECT fp.user_id,
       |          quantile_cont(abs(v - med), 0.5) AS mad, any_value(med) AS med
       |        FROM fp JOIN med USING (user_id) GROUP BY fp.user_id)
       |SELECT fp.user_id, count(*) AS n_events,
       |  CAST(sum(CASE WHEN abs(v - med) > 3 * mad THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_outliers,
       |  any_value(med) / 100.0 AS median,
       |  any_value(mad) / 100.0 AS mad
       |FROM fp JOIN mad USING (user_id)
       |GROUP BY fp.user_id""".stripMargin

  /** Per-user lag-1 autocorrelation of the event value series — the
    * standard "is this metric trending or mean-reverting" signal.
    * Values fix-point to 1e-4 units; every sum in the Pearson formula
    * (n, Σx, Σy, Σxy, Σx², Σy²) is then an exact long (bounded well
    * inside int64 by |v| <= 491 and per-user histories), so the final
    * r = (nΣxy - ΣxΣy) / (sqrt(nΣx²-(Σx)²) * sqrt(nΣy²-(Σy)²))
    * divides/roots identically-agreed operands — IEEE-exact parity.
    *
    * Scale: one lag window partitioned by user + one aggregation; no
    * global ordering anywhere.
    */
  def autocorr(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 10000).cast("long").as("y"))
      .withColumn("x", lag("y", 1).over(w))
      .filter(col("x").isNotNull)
    pairs.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("user_id"), col("n").as("n_pairs"),
        expr("""CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
                |ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
                |  (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                |   sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END""".stripMargin)
          .as("autocorr"))
  }

  /** Oracle twin of [[autocorr]]. DuckDB's BIGINT sums widen to
    * HUGEINT; casting back to BIGINT before the arithmetic keeps every
    * operand the exact integer Spark computed.
    */
  def autocorrSql: String =
    s"""WITH p AS (SELECT user_id,
       |    CAST(floor(value * 10000) AS BIGINT) AS y,
       |    lag(CAST(floor(value * 10000) AS BIGINT)) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id) AS x
       |  FROM events),
       |s AS (SELECT user_id, count(*) AS n,
       |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |        CAST(sum(x*y) AS BIGINT) AS sxy,
       |        CAST(sum(x*x) AS BIGINT) AS sxx,
       |        CAST(sum(y*y) AS BIGINT) AS syy
       |      FROM p WHERE x IS NOT NULL GROUP BY user_id)
       |SELECT user_id, n AS n_pairs,
       |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
       |  ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
       |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
       |     sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END AS autocorr
       |FROM s""".stripMargin

  /** Offline CUSUM changepoint per user: the index k (1-based, in
    * (ts, event_id) order) where the centered cumulative sum
    * |sum_{j<=k}(y_j - mean)| peaks — the classic single-changepoint
    * location estimate for a level shift. All arithmetic is exact
    * integer on the 1e-4 fixed-point values: the centered cusum is
    * scaled by n (d_k = n*c_k - k*S, both longs), argmax tie-breaks to
    * the SMALLEST k via max(struct(d, -k)), and the only IEEE op is
    * the final normalization division of two agreed operands.
    *
    * Scale shape: one shuffle on user_id shared by the ranking window,
    * the running sum, and the totals join; per-user output is one row.
    * Overflow bound: n*c_k <= n^2 * max|y| — at the 1e-4 fixed point
    * and |value|<=1e3 this caps per-key series at ~3e6 events; longer
    * keys need a coarser per-key fixed point (same shape, different
    * scale constant).
    */
  def changepoint(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val rows = events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 10000).cast("long").as("y"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("c", sum("y").over(w))
    val tot = rows.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("y").as("s"))
    rows.join(tot, "user_id")
      .filter(col("i") < col("n")) // d_n = 0 by construction
      .select(col("user_id"), col("n"),
        abs(col("n") * col("c") - col("i") * col("s")).as("dabs"),
        col("i"))
      .groupBy("user_id")
      .agg(first("n").as("n_events"),
        max(struct(col("dabs"), (-col("i")).as("neg_i"))).as("m"))
      .select(col("user_id"), col("n_events"),
        (-col("m.neg_i")).as("cp_idx"), col("m.dabs").as("cusum_abs"),
        (col("m.dabs").cast("double") /
          (col("n_events") * lit(10000.0))).as("cusum_norm"))
      .orderBy("user_id")
  }

  /** Oracle twin of [[changepoint]]. DuckDB widens BIGINT sums to
    * HUGEINT; the casts keep every operand the long Spark computed.
    */
  def changepointSql: String =
    s"""WITH p AS (SELECT user_id, ts, event_id,
       |    CAST(floor(value * 10000) AS BIGINT) AS y FROM events),
       |r AS (SELECT user_id, y,
       |    CAST(row_number() OVER win AS BIGINT) AS i,
       |    CAST(sum(y) OVER win AS BIGINT) AS c
       |  FROM p WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |t AS (SELECT user_id, count(*) AS n, CAST(sum(y) AS BIGINT) AS s
       |  FROM p GROUP BY user_id),
       |d AS (SELECT r.user_id, i, abs(n*c - i*s) AS dabs
       |  FROM r JOIN t USING (user_id) WHERE i < n),
       |k AS (SELECT user_id, i, dabs, row_number() OVER
       |    (PARTITION BY user_id ORDER BY dabs DESC, i) AS rk FROM d)
       |SELECT k.user_id, t.n AS n_events, k.i AS cp_idx,
       |  CAST(k.dabs AS BIGINT) AS cusum_abs,
       |  CAST(k.dabs AS DOUBLE) / (t.n * 10000.0) AS cusum_norm
       |FROM k JOIN t ON k.user_id = t.user_id
       |WHERE rk = 1 ORDER BY k.user_id""".stripMargin

  /** Oracle twin of [[ewmaLast]] over the `events` table. */
  def ewmaLastSql: String =
    s"""WITH r AS (SELECT user_id, value,
       |    row_number() OVER (PARTITION BY user_id
       |                       ORDER BY ts DESC, event_id DESC) AS rnd
       |  FROM events),
       |t AS (SELECT user_id,
       |        CAST(floor(value * 10000) AS BIGINT) AS x_fp,
       |        CAST(pow(2, ${WindowLags + 1} - rnd) AS BIGINT) AS wt
       |      FROM r WHERE rnd <= ${WindowLags + 1})
       |SELECT user_id, count(*) AS n_tail,
       |  CAST(sum(x_fp * wt) AS DOUBLE) / sum(wt) / 10000.0 AS ewma
       |FROM t GROUP BY user_id""".stripMargin

  /** One-step-ahead BACKTEST of the EWMA forecaster against the naive
    * last-value baseline — the forecasting-quality gate next to
    * [[ewmaLast]], completing the eval-harness set (ANN recall, LSH
    * banding, now forecasting). For every user with ≥ 2 events, the
    * final event is held out; the EWMA over the preceding ≤ 21 events
    * (same dyadic weights as [[ewmaLast]], shifted one lag) and the
    * naive previous value each predict it.
    *
    * Determinism: the per-user EWMA error keeps the common denominator
    * — err = |Σx·w − actual·Σw| div Σw — so every per-user error is an
    * exact long at the 1e-4 fixed point, the cross-user MAE sums are
    * exact longs (order-free), and the two final divisions are the
    * only IEEE ops. Returns ONE row: (n_users, mae_ewma, mae_naive,
    * n_ewma_wins).
    *
    * Scale: identical shape to [[ewmaLast]] — the rank-limit is a
    * WindowGroupLimit (≤ 22 rows per user cross the shuffle), then two
    * constant-width aggregations.
    */
  def forecastEval(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val perUser = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("rnd", row_number().over(w))
      .filter(col("rnd") <= WindowLags + 2)
      .select(col("user_id"), col("rnd"),
        floor(col("value") * 10000).cast("long").as("x_fp"),
        expr(s"CAST(pow(2, ${WindowLags + 2} - rnd) AS BIGINT)").as("wt"))
      .groupBy("user_id")
      .agg(
        max(when(col("rnd") === 1, col("x_fp"))).as("actual"),
        max(when(col("rnd") === 2, col("x_fp"))).as("naive"),
        sum(when(col("rnd") >= 2, col("x_fp") * col("wt"))).as("num"),
        sum(when(col("rnd") >= 2, col("wt"))).as("den"))
      .filter(col("naive").isNotNull)
      .select(
        expr("abs(num - actual * den) div den").as("err_ewma"),
        expr("abs(naive - actual)").as("err_naive"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      (sum("err_ewma").cast("double") / count(lit(1)) / 10000.0)
        .as("mae_ewma"),
      (sum("err_naive").cast("double") / count(lit(1)) / 10000.0)
        .as("mae_naive"),
      sum(when(col("err_ewma") < col("err_naive"), 1L).otherwise(0L))
        .as("n_ewma_wins"))
  }

  /** Oracle twin of [[forecastEval]] (sums cast back from HUGEINT per
    * the playbook).
    */
  def forecastEvalSql: String =
    s"""WITH r AS (SELECT user_id, value,
       |    row_number() OVER (PARTITION BY user_id
       |                       ORDER BY ts DESC, event_id DESC) AS rnd
       |  FROM events),
       |t AS (SELECT user_id, rnd,
       |        CAST(floor(value * 10000) AS BIGINT) AS x_fp,
       |        CAST(pow(2, ${WindowLags + 2} - rnd) AS BIGINT) AS wt
       |      FROM r WHERE rnd <= ${WindowLags + 2}),
       |u AS (SELECT user_id,
       |        max(CASE WHEN rnd = 1 THEN x_fp END) AS actual,
       |        max(CASE WHEN rnd = 2 THEN x_fp END) AS naive,
       |        CAST(sum(CASE WHEN rnd >= 2 THEN x_fp * wt END)
       |          AS BIGINT) AS num,
       |        CAST(sum(CASE WHEN rnd >= 2 THEN wt END)
       |          AS BIGINT) AS den
       |      FROM t GROUP BY user_id),
       |e AS (SELECT abs(num - actual * den) // den AS err_ewma,
       |        abs(naive - actual) AS err_naive
       |      FROM u WHERE naive IS NOT NULL)
       |SELECT count(*) AS n_users,
       |  CAST(CAST(sum(err_ewma) AS BIGINT) AS DOUBLE)
       |    / count(*) / 10000.0 AS mae_ewma,
       |  CAST(CAST(sum(err_naive) AS BIGINT) AS DOUBLE)
       |    / count(*) / 10000.0 AS mae_naive,
       |  CAST(sum(CASE WHEN err_ewma < err_naive THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_ewma_wins
       |FROM e""".stripMargin

  /** Max lead-lag offset for [[xcorr]]. */
  val XcorrMaxLag = 3

  /** Lead-lag cross-correlation between event-type DAILY series: for
    * every ordered type pair (a < b) and lag 0..[[XcorrMaxLag]],
    * Pearson correlation of a's day-d mean against b's day-(d+lag)
    * mean — "does activity in a lead activity in b?", the
    * between-series companion of [[autocorr]]'s within-series view.
    *
    * Determinism: the daily mean is an exact integer (truncating
    * division of the 1e-4 fixed-point day sum by the day count), so
    * all five Pearson sufficient statistics are exact longs and the
    * final r is the one agreed IEEE expression — [[autocorr]]'s exact
    * recipe on a different join shape. Overflow headroom: means stay
    * <= 1e6 in fixed-point units, so sxy over a decade of days is
    * < 2^53.
    *
    * Scale: ONE pass over events builds the daily relation
    * (|types|·|days| rows); the lag self-join and the Pearson
    * aggregation run on that tiny relation — the heavy input is
    * touched exactly once regardless of how many lags are requested.
    */
  def xcorr(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 10000).cast("long").as("y"))
      .groupBy("event_type", "day")
      .agg(expr("sum(y) div count(1)").as("m"))
    val a = daily.select(col("event_type").as("type_a"), col("day"),
      col("m").as("x"))
    val b = daily.select(col("event_type").as("type_b"),
      col("day").as("day_b"), col("m").as("y"))
    a.withColumn("lag", explode(sequence(lit(0), lit(XcorrMaxLag))))
      .withColumn("day_join", date_add(col("day"), col("lag")))
      .join(b, col("day_join") === col("day_b") &&
        col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b", "lag")
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("type_a"), col("type_b"), col("lag"), col("n_days"),
        expr("""CASE WHEN n_days*sxx - sx*sx = 0
                |  OR n_days*syy - sy*sy = 0 THEN NULL
                |ELSE CAST(n_days*sxy - sx*sy AS DOUBLE) /
                |  (sqrt(CAST(n_days*sxx - sx*sx AS DOUBLE)) *
                |   sqrt(CAST(n_days*syy - sy*sy AS DOUBLE))) END"""
          .stripMargin).as("xcorr"))
      .orderBy("type_a", "type_b", "lag")
  }

  /** Oracle twin of [[xcorr]] (sums cast back from HUGEINT per the
    * playbook; `//` matches Spark's `div` on the non-negative
    * operands here).
    */
  def xcorrSql: String =
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
       |      // count(*) AS m
       |  FROM events GROUP BY 1, 2),
       |l AS (SELECT unnest([${(0 to XcorrMaxLag).mkString(", ")}]) AS lag),
       |j AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
       |        l.lag, a.m AS x, b.m AS y
       |      FROM d a CROSS JOIN l
       |      JOIN d b ON b.day = a.day + l.lag
       |        AND a.event_type < b.event_type),
       |s AS (SELECT type_a, type_b, lag, count(*) AS n_days,
       |        CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(y) AS BIGINT) AS sy,
       |        CAST(sum(x*y) AS BIGINT) AS sxy,
       |        CAST(sum(x*x) AS BIGINT) AS sxx,
       |        CAST(sum(y*y) AS BIGINT) AS syy
       |      FROM j GROUP BY 1, 2, 3)
       |SELECT type_a, type_b, lag, n_days,
       |  CASE WHEN n_days*sxx - sx*sx = 0
       |    OR n_days*syy - sy*sy = 0 THEN NULL
       |  ELSE CAST(n_days*sxy - sx*sy AS DOUBLE) /
       |    (sqrt(CAST(n_days*sxx - sx*sx AS DOUBLE)) *
       |     sqrt(CAST(n_days*syy - sy*sy AS DOUBLE))) END AS xcorr
       |FROM s ORDER BY type_a, type_b, lag""".stripMargin
}
