package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props). The reference is
  * batch-only (SURVEY.md §2.6), so this is extension surface: the same
  * tumbling-window aggregation the batch `q_events_window` query runs,
  * expressed incrementally, plus a stateful sessionization operator via
  * `flatMapGroupsWithState`.
  *
  * Scale design: watermarks bound state; the window agg is a streaming
  * two-phase hash aggregate partitioned by (window, event_type); session
  * state is per-user and evicted on processing-time timeout.
  */
object EventsStream {

  /** Incremental tumbling-window aggregation with a watermark. Source is
    * any streaming DataFrame with (ts: timestamp, event_type, value).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("sum_value"))

  final case class Event(event_id: Long, user_id: Long, tsMicros: Long,
      value: Double)
  final case class SessionState(nEvents: Long, total: Double, lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long, total: Double)

  /** Stateful sessionization: fold each user's events into running
    * session state; emit the session when a gap of `gapMicros` appears
    * between consecutive event timestamps (event-time sessionization on
    * a per-batch sorted fold — the mapGroupsWithState pattern).
    */
  def sessionize(events: Dataset[Event], gapMicros: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.tsMicros)
          var st = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            if (st.nEvents > 0 && e.tsMicros - st.lastTs > gapMicros) {
              out += SessionOut(user, st.nEvents, st.total)
              st = SessionState(0L, 0.0, Long.MinValue)
            }
            st = SessionState(st.nEvents + 1, st.total + e.value, e.tsMicros)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double)

  /** Event-time sessionization with WATERMARK-DRIVEN session closure:
    * unlike [[sessionize]] (which only closes a session when the same
    * user's NEXT event arrives with a gap), an idle user's session is
    * emitted when the stream's watermark passes lastEvent + gap — the
    * `GroupStateTimeout.EventTimeTimeout` pattern. This is the shape a
    * production clickstream needs: sessions end because time passed,
    * not because the user came back. State is per-user and removed on
    * timeout, so it stays bounded by the number of users active inside
    * one gap window regardless of stream lifetime.
    */
  def sessionizeEventTime(events: Dataset[TimedEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.toDF().withWatermark("ts", watermarkDelay).as[TimedEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[TimedEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap with no new events: the
            // session is definitively over (no on-time event can extend
            // it), emit and evict.
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.nEvents, st.total))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(
              SessionState(0L, 0.0, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              val t = e.ts.getTime // state timestamps in ms on this path
              if (st.nEvents > 0 && t - st.lastTs > gapMs) {
                out += SessionOut(user, st.nEvents, st.total)
                st = SessionState(0L, 0.0, Long.MinValue)
              }
              st = SessionState(st.nEvents + 1, st.total + e.value, t)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastTs + gapMs)
            out.iterator
          }
      }
  }

  /** Stream-stream interval join: attribute each click to the same
    * user's purchases within `windowSec` seconds AFTER the click (the
    * streaming twin of the batch `q_range_join` shape). Both sides are
    * watermarked and the join condition carries the event-time range, so
    * Spark bounds each side's buffered state to watermark + window —
    * the state-cleanup contract that keeps an infinite stream's join
    * state finite. Inputs need (user_id, ts: timestamp, event_id |
    * value).
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      watermarkDelay: String = "30 seconds",
      windowSec: Long = 60): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", watermarkDelay)
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("click_id"), col("user_id"), col("purchase_ts"), col("value"))
  }

  /** Streaming exact-dedup over a document stream: suppress
    * re-occurrences of a content fingerprint across micro-batches
    * (`dropDuplicatesWithinWatermark`). The watermark bounds the
    * dedup state — fingerprints older than `horizon` are evicted, so
    * state stays proportional to the horizon's traffic, not the
    * stream's lifetime; that is the property that keeps continuous
    * ingest dedup viable at corpus scale. Input needs (ts: timestamp,
    * text) plus any payload columns.
    */
  def streamingDedup(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs.withColumn("fp", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming ingestion into a graft table: every micro-batch becomes
    * one data file + one snapshot commit (the Iceberg streaming-ingest
    * pattern). Demo/utility shape over `foreachBatch`; the production
    * path is `writeStream.format("graft-table")` —
    * [[GraftTableSink]] adds exactly-once replay dedup against the
    * manifest. Returns the number of commits made.
    */
  def streamIntoTable(spark: SparkSession, source: DataFrame, root: String,
      ns: String, table: String, statsCols: Seq[String] = Nil): Long = {
    import graft.plans.{Partitioning, TableIO}
    TableIO.createNamespace(root, ns)
    TableIO.createTableIfNotExists(root, ns, table, source.schema)
    var commits = 0L
    val q = source.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // a table with a partition spec routes every micro-batch
          // through the partitioned writer: one file per partition
          // value per batch, partition values in the manifest — the
          // streamed files prune exactly like batch-written ones
          if (Partitioning.readSpec(root, ns, table).isDefined) {
            Partitioning.appendPartitioned(spark, root, ns, table, batch)
          } else {
            val seq = TableIO.nextSeq(root, ns, table)
            // per-batch manifest bounds on the requested columns, so a
            // reader can bounds-prune the streamed files like any others
            // (streaming appends are naturally time/key-clustered)
            val entry = TableIO.writeExactFile(spark, root, ns, table,
              f"data/stream-$batchId%05d.parquet", batch, "data", seq,
              bounds = TableIO.longBounds(batch, statsCols))
            TableIO.commit(root, ns, table, Seq(entry))
          }
          commits += 1
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    commits
  }

  /** Run the windowed aggregation over the events parquet as a bounded
    * stream (one file per micro-batch) into an in-memory sink; returns
    * the final table. Used by tests and as the demo entry point — the
    * production path swaps the source for Kafka/files and the sink for a
    * parquet/Iceberg writer with `writeStream`.
    */
  def runWindowedOverParquet(spark: SparkSession, sfDir: String,
      queryName: String = "events_windowed"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val src = graft.queries.Util.normalizeEventsTs(spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$sfDir/events.*")) // glob: the file source needs a dir/glob
    val q = windowedAgg(src).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
