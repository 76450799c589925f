package graft.operators

import org.apache.spark.sql.DataFrame
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
}
