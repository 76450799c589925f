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

  /** The tumbling-window aggregation replayed through the REAL
    * streaming engine against the finite events table: a parquet file
    * SOURCE (`readStream`), the watermarked [[windowedAgg]], one
    * `Trigger.AvailableNow` drain into a memory sink, and the final
    * complete-mode table returned as the result. A finite input makes
    * the streaming aggregate equal the batch aggregate BY CONTRACT —
    * which is exactly what registering this under the DuckDB oracle
    * gate checks: incremental state fold == one-shot groupBy, to the
    * hash. At scale this is the lambda-architecture collapse — the
    * same code path serves the backfill (AvailableNow over history)
    * and the live tail (continuous micro-batches), so the two can
    * never disagree.
    */
  def replayWindowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val out = windowedAgg(eventsStream(spark, sfDir))
      .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))
    drainToTable(out, "stream_win_", "complete")
      .orderBy("bucket", "event_type")
  }

  /** The events table as a bounded parquet STREAM (single-file glob —
    * the file source insists a non-glob path be a directory; a glob
    * skips the directory check), ts normalized exactly like the batch
    * reader so stream and batch see identical rows.
    */
  // ONE cached replay clone per base session: a session's first
  // streaming query permanently registers a StreamingQueryListenerBus
  // on the shared LiveListenerBus (nothing here ever detaches it), so
  // a clone per drain would leak one registration per bench/smoke
  // iteration — the exact cross-iteration accumulation class
  // scratchCheckpoint's cleanup guards against. The map is bounded by
  // the number of base sessions the JVM ever creates (Bench/Verify/
  // specs: a handful, all JVM-lifetime).
  private val replaySessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  /** The bounded-replay session: a FRESH session sharing the caller's
    * SparkContext, with a small state partition count. State-store
    * partitioning is a CAPACITY knob (keys x state bytes), not a
    * parallelism default — every micro-batch snapshots/commits one
    * state store PER shuffle partition, so at local[32] the inherited
    * 32 partitions make a ~100k-row replay pay 32 store commits per
    * batch (measured: stream_join 2.4s at 8 partitions vs 7-8s at 32,
    * same results — order-free aggregates). Production streams size
    * this to key cardinality; the fresh session leaves the caller's
    * session untouched (the repo's q_runtime_bloom/q_aqe_skew
    * conf-scoping pattern). NOTE: `newSession()` initializes from the
    * shared SparkConf and does NOT inherit runtime conf the caller set
    * via `spark.conf.set` — every conf the replay path depends on is
    * re-set explicitly below (ADVICE r14); a replay query that starts
    * needing another caller-side runtime conf must add it here.
    */
  private[graft] def replaySession(spark: SparkSession): SparkSession = {
    // a cached clone shares the base session's SparkContext, so a
    // stopped clone means the BASE is stopped too — recreating via
    // newSession() would just mint another dead clone (r15 review of
    // the ADVICE-r14 guard). Fail fast with the real cause instead of
    // handing back a session that breaks on first use, and evict the
    // dead entry so it no longer pins the stopped session pair.
    if (spark.sparkContext.isStopped) {
      replaySessions.remove(spark)
      throw new IllegalStateException(
        "replaySession: the base session's SparkContext is stopped — " +
          "streaming replays need a live session")
    }
    replaySessions.computeIfAbsent(spark, s => {
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      ss
    })
  }

  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = replaySession(spark)
    val schema = ss.read.parquet(s"$sfDir/events.parquet").schema
    graft.queries.Util.normalizeEventsTs(
      ss.readStream.schema(schema).option("basePath", sfDir)
        .parquet(s"$sfDir/[e]vents.parquet"))
  }

  /** Scratch checkpoint dir for FINITE replays: tmpfs when available.
    * Every micro-batch fsyncs offset/commit logs plus HDFS-state-store
    * snapshot files into the checkpoint; on a disk-backed temp dir that
    * fsync + page-cache variance swung `stream_*` bench wall-clock 3x
    * between same-code runs (r12 verdict item 3). A one-shot drain's
    * checkpoint has zero durability value, so it belongs on tmpfs;
    * production streams (e.g. [[Replication.replicate]]) keep their
    * caller-provided durable locations.
    */
  def scratchCheckpoint(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, prefix)
  }

  /** Where [[scratchCheckpoint]] lands on THIS host — recorded into the
    * bench artifact so a cross-host timing dispute (r13: `stream_join`
    * 3.1x its anchor on the driver host, 1.1x on the build host, tmpfs
    * hypothesis unfalsifiable from the artifact) is settled by the
    * artifact itself.
    */
  def scratchBase: String = {
    val p = scratchCheckpoint("graft-probe-")
    try p.getParent.toString finally java.nio.file.Files.delete(p)
  }

  /** Micro-batch telemetry of one finished drain: batch count, input
    * rows, and per-batch triggerExecution millis. The drain cost of a
    * finite replay is scheduling + state-store commit overhead per
    * micro-batch; this makes that cost visible per bench query instead
    * of theorized about (r13 verdict item 4).
    */
  final case class DrainDiag(nBatches: Int, inputRows: Long,
      batchMs: Seq[Long], truncated: Boolean = false) {
    def totalMs: Long = batchMs.sum
  }

  private val drainDiagRef =
    new java.util.concurrent.atomic.AtomicReference[Map[String, Vector[DrainDiag]]](
      Map.empty)

  /** Convenience view over [[drainDiagHistory]]: the most recent drain
    * per checkpoint prefix (`stream_win_`, `stream_join_`, ...). Kept
    * for smokes/specs; [[graft.Bench]] reads the full history.
    */
  def drainDiags: Map[String, DrainDiag] =
    drainDiagRef.get().map { case (k, v) => k -> v.last }

  /** EVERY drain this JVM ran, per prefix, oldest first (bounded at
    * [[MaxDiagHistory]]) — with repeat>1 bench iterations the
    * last-drain view above can misattribute a one-off slow drain (the
    * exact cross-host dispute the telemetry exists to settle, ADVICE
    * r14); the artifact reads min/max across the history instead.
    */
  def drainDiagHistory: Map[String, Seq[DrainDiag]] = drainDiagRef.get()

  private val MaxDiagHistory = 64

  private def recordDiag(prefix: String,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try {
      val ps = q.recentProgress.toSeq
      // recentProgress is a ring buffer capped by
      // spark.sql.streaming.numRecentProgressUpdates (default 100); a
      // drain with more micro-batches silently loses its head there.
      // Every drain starts from a FRESH scratch checkpoint, so
      // lastProgress.batchId + 1 is the true batch count — record that,
      // and flag rows/batchMs as truncated when the buffer dropped any.
      val total = Option(q.lastProgress).map(_.batchId + 1)
        .getOrElse(ps.size.toLong)
      val diag = DrainDiag(total.toInt, ps.map(_.numInputRows).sum,
        ps.map(p => Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)),
        truncated = ps.size < total)
      drainDiagRef.updateAndGet { m =>
        val k = prefix.stripSuffix("_")
        m + (k -> (m.getOrElse(k, Vector.empty) :+ diag).takeRight(MaxDiagHistory))
      }
    } catch { case _: Exception => () } // telemetry must never fail a drain

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally s.close()
    }

  /** Drain a streaming DataFrame into a fresh memory sink and return
    * the sink table. Default trigger + `processAllAvailable` (not
    * AvailableNow) so the engine runs the trailing NO-DATA micro-batch
    * after the last data batch — that batch is what advances the
    * watermark past the final rows and fires event-time timeouts;
    * without it, stateful operators would hold their last windows
    * open forever.
    */
  private def drainToTable(out: DataFrame,
      prefix: String, mode: String): DataFrame = {
    // the stream may have been built on a config clone
    // ([[eventsStream]]); the memory sink registers its table and runs
    // its micro-batches under the stream's OWN session, so conf + the
    // readback must target that one, not the caller's
    val ss = out.sparkSession
    val name = prefix + java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = scratchCheckpoint(prefix)
    // recentProgress defaults to a 100-entry ring; a finite replay's
    // drain is bounded, so a larger buffer keeps the telemetry's
    // rows/batch_ms complete instead of covering only the newest 100
    // batches (the `truncated` flag in recordDiag stays as the
    // belt-and-braces marker for drains that exceed even this).
    // Save/restore: some drained streams (the stream_cdc/replicate
    // paths) are built on the CALLER's session, not a replay clone —
    // an unrestored set would permanently mutate the shared session's
    // conf, against the repo's conf-scoping pattern (ADVICE r14).
    val progressKey = "spark.sql.streaming.numRecentProgressUpdates"
    val priorProgress = ss.conf.getOption(progressKey)
    ss.conf.set(progressKey, "4096")
    // stop in finally: an interrupted drain must not leak a live
    // streaming query into the shared session. stop() and the
    // checkpoint delete nest so a stop() exception cannot skip the
    // delete (ADVICE r13: scratch checkpoints prefer tmpfs, where a
    // leak accumulates in RAM across bench/smoke iterations)
    try {
      val q = out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .outputMode(mode).start()
      try { q.processAllAvailable(); recordDiag(prefix, q) }
      finally { try q.stop() finally deleteRecursively(ckpt) }
    } finally priorProgress match {
      case Some(v) => ss.conf.set(progressKey, v)
      case None => ss.conf.unset(progressKey)
    }
    ss.table(name)
  }

  /** [[streamingDedup]] replayed against the finite events table:
    * fingerprint = (user_id, event_type), watermark horizon wider than
    * the table's time span (nothing evicts mid-replay), append-mode
    * drain, then a batch rollup of the survivors. Which PHYSICAL row
    * wins a fingerprint is batch-order-dependent, so the gated result
    * aggregates to what is order-free by construction: the surviving
    * fingerprint SET — per event_type, the count of distinct users.
    * The oracle is the batch `SELECT DISTINCT` twin: streaming
    * first-occurrence state dedup == batch distinct, to the hash.
    */
  def replayDedupCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = streamingDedupKeyed(eventsStream(spark, sfDir))
    drainToTable(deduped, "stream_dedup_", "append")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
  }

  /** [[streamingDedup]]'s shape with a composite business key instead
    * of a content hash: suppress repeats of (user_id, event_type)
    * across micro-batches. Same bounded-state contract — the watermark
    * evicts fingerprints older than `horizon`.
    */
  def streamingDedupKeyed(events: DataFrame,
      horizon: String = "3650 days"): DataFrame =
    events
      .withColumn("fp", md5(concat_ws(":", col("user_id"), col("event_type"))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** The stream-stream interval join ([[clickPurchaseJoin]]) replayed
    * against the finite events table: clicks and purchases are two
    * filtered reads of the same bounded stream, joined on user within
    * `windowSec` seconds after the click. Inner interval joins emit
    * exactly the rows the batch range join produces; the watermark
    * bounds buffered state on an infinite stream and is harmless on a
    * finite one.
    */
  def replayIntervalJoin(spark: SparkSession, sfDir: String,
      windowSec: Long = 3600): DataFrame = {
    val ev = eventsStream(spark, sfDir)
    val joined = clickPurchaseJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      watermarkDelay = "3650 days", windowSec = windowSec)
    drainToTable(joined, "stream_join_", "append")
      .select(col("click_id"), col("user_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        floor(col("value") * lit(1e4)).cast("long").as("value_fp"))
      .orderBy("click_id", "purchase_us", "value_fp")
  }

  final case class FpTimed(user_id: Long, ts: java.sql.Timestamp,
      value_fp: Long)
  final case class FpSessionState(nEvents: Long, totalFp: Long, lastTs: Long)
  final case class FpSession(user_id: Long, n_events: Long, value_fp: Long)

  /** [[sessionizeEventTime]] with ORDER-FREE arithmetic, for the oracle
    * gate: per-session value mass is an exact long sum of
    * floor(value·1e4) fixed-point terms, so equal-timestamp events
    * within a user's fold can arrive in any order without changing the
    * emitted session (double addition would not commute). Session
    * BOUNDARIES only depend on the sorted millisecond timestamps, which
    * ties cannot perturb either. Emission contract is the event-time
    * timeout one: a session closes when the same user's next event
    * gaps past `gapMs`, or when the stream watermark (max event time
    * seen, minus zero delay) passes lastTs + gap.
    */
  def sessionizeEventTimeFp(events: Dataset[FpTimed],
      gapMs: Long): Dataset[FpSession] = {
    import events.sparkSession.implicits._
    events.toDF().withWatermark("ts", "0 seconds").as[FpTimed]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FpSessionState, FpSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[FpTimed], state: GroupState[FpSessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(FpSession(user, st.nEvents, st.totalFp))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(
              FpSessionState(0L, 0L, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer[FpSession]()
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.nEvents > 0 && t - st.lastTs > gapMs) {
                out += FpSession(user, st.nEvents, st.totalFp)
                st = FpSessionState(0L, 0L, Long.MinValue)
              }
              st = FpSessionState(st.nEvents + 1, st.totalFp + e.value_fp, t)
            }
            state.update(st)
            // defensive clamp, same rationale as [[sessionizeEventTime]]
            state.setTimeoutTimestamp(math.max(st.lastTs + gapMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** [[sessionizeEventTimeFp]] replayed against the finite events
    * table, rolled up per user (session count, event mass, fixed-point
    * value mass). The no-data micro-batch after the last file advances
    * the watermark to the global max event time and fires the timeouts,
    * so every session whose (lastTs + gap) lies strictly before that
    * watermark emits; each user's final session stays in state iff it
    * reaches the stream's end — exactly the condition the oracle's
    * gaps-and-islands twin reproduces.
    */
  def replaySessionStats(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val src = eventsStream(spark, sfDir)
      .select(col("user_id"), col("ts"),
        floor(col("value") * lit(1e4)).cast("long").as("value_fp"))
      .as[FpTimed]
    val sessions = sessionizeEventTimeFp(src, gapMs = gapMinutes * 60000L)
    drainToTable(sessions.toDF(), "stream_sessions_", "append")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"),
        sum("value_fp").as("value_fp"))
      .orderBy("user_id")
  }

  /** Tail a governed table's snapshot log through the PRODUCTION
    * streaming source (`readStream.format("graft-table")`, cdc mode)
    * and drain the finite backlog to a table: each committed snapshot
    * arrives as its own micro-batch (`maxVersionsPerBatch=1` exercises
    * the admission-control path a 10k-commit backlog needs), carrying
    * the full change rows. On a finite log the union of the tailed
    * batches must equal the BATCH changelog read over the same version
    * range — which is what the oracle gate checks.
    */
  def tailChanges(spark: SparkSession, root: String, ns: String,
      table: String, maxVersionsPerBatch: Int = 1): DataFrame = {
    val src = spark.readStream.format("graft-table")
      .option("root", root).option("namespace", ns).option("table", table)
      .option("mode", "cdc")
      .option("maxVersionsPerBatch", maxVersionsPerBatch.toString)
      .load()
    drainToTable(src, "stream_cdc_", "append")
  }

  /** The full streaming-ingest loop under the correctness gate: the
    * events table replayed as a bounded stream through the PRODUCTION
    * sink (`writeStream.format("graft-table")` — exactly-once snapshot
    * commits, [[GraftTableSink]]), then read back through the MOR
    * scan and aggregated. The oracle is the same aggregate over the
    * original table: ingest → commit → scan must be lossless and
    * duplicate-free, which is precisely the exactly-once claim.
    */
  def ingestAndAggregate(spark: SparkSession, sfDir: String, root: String,
      ns: String, table: String): Unit = {
    val ckpt = scratchCheckpoint("graft-ingest-ckpt-")
    val q = eventsStream(spark, sfDir).writeStream
      .format("graft-table")
      .option("root", root).option("namespace", ns).option("table", table)
      .option("statsColumns", "event_id")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    // one-shot drain: the checkpoint has no durability value, so it is
    // deleted even when stop() throws (ADVICE r13 — a tmpfs leak is a
    // RAM leak)
    try q.processAllAvailable()
    finally { try q.stop() finally deleteRecursively(ckpt) }
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
            // defensive clamp: the engine REJECTS a timeout at/below
            // the pre-batch watermark. Late-row filtering upstream
            // normally guarantees lastTs >= watermark, but clamping
            // makes the invariant local instead of an assumption about
            // the operator's input pipeline
            state.setTimeoutTimestamp(math.max(st.lastTs + gapMs,
              state.getCurrentWatermarkMs() + 1))
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
    val ckpt = scratchCheckpoint("graft-into-table-ckpt-")
    val q = source.writeStream
      .option("checkpointLocation", ckpt.toString)
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
    try q.processAllAvailable()
    finally { try q.stop() finally deleteRecursively(ckpt) }
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
    val ckpt = scratchCheckpoint("graft-win-ckpt-")
    val q = windowedAgg(src).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt.toString)
      .start()
    try q.processAllAvailable()
    finally { try q.stop() finally deleteRecursively(ckpt) }
    spark.table(queryName)
  }
}
