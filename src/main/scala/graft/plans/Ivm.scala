package graft.plans

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance: a committed aggregate table kept in
  * sync with a base table by folding its CDC changelog, one snapshot at
  * a time — the materialized-view shape every warehouse keeps over a
  * 100 TB fact table, where re-aggregating the base per refresh is the
  * thing you can never afford.
  *
  * Per batch the work is O(changed rows + changed keys): the changelog
  * of ONE commit is aggregated into signed deltas (insert = +1,
  * delete = -1 — count and sum are self-maintainable aggregates), the
  * delta is outer-merged with the current state relation, and the new
  * state commits as the next snapshot of a governed table — so the view
  * itself time-travels.
  *
  * Crash safety: the state commit and the checkpoint advance are two
  * non-atomic steps, and folding a signed delta twice is NOT
  * idempotent. The state table's version is therefore the authoritative
  * offset — exactly one `commitReplacing` per applied batch keeps
  * `currentVersion(state) == batches applied` as an invariant. On
  * entry, a checkpoint behind the state version means the previous run
  * died between commit and advance: the batch is already folded, so we
  * re-issue only the checkpoint write and skip the fold. Inside the
  * loop each commit carries `expectedVersion`, so a concurrent or
  * replayed fold of the same batch fails the CAS instead of
  * double-applying.
  */
object Ivm {

  private def writeOffset(checkpoint: Path, offset: Long): Unit = {
    val tmp = Files.createTempFile(checkpoint.getParent, ".ckpt", ".tmp")
    Files.writeString(tmp, offset.toString)
    Files.move(tmp, checkpoint, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private val stateSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sum_v", LongType, nullable = false)))
  }

  /** Fold ONE batch of change rows into the state table as one CAS
    * commit at `expectedVersion`. Shared by the polling [[catchUp]]
    * loop and the streaming [[streamMaintain]] driver, so the two
    * maintenance cadences cannot drift semantically.
    */
  private def foldDelta(spark: SparkSession, root: String, ns: String,
      stateTable: String, changes: DataFrame,
      keyOf: org.apache.spark.sql.Column, valueCol: String,
      expectedVersion: Long): Unit = {
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = changes
      .select(keyOf.cast("long").as("k"), sign.as("d"),
        (sign * col(valueCol)).as("dv"))
      .groupBy("k").agg(sum("d").as("dn"), sum("dv").as("dsum"))
    // v0 state (no commit yet) bootstraps as the empty relation
    val cur =
      if (TableIO.currentVersion(root, ns, stateTable) == 0L)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
      else Mor.read(spark, root, ns, stateTable)
    val next = cur.join(delta, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("dsum"), lit(0L)))
          .as("sum_v"))
      .filter(col("n") > 0)
    // full state rewrite per batch: the state is O(#keys), not O(base)
    val seq = TableIO.nextSeq(root, ns, stateTable)
    val entry = TableIO.writeExactFile(spark, root, ns, stateTable,
      s"data/state-v$seq.parquet", next, "data", seq)
    // CAS on the batch count: a replay of this batch (or a concurrent
    // maintainer) sees version != expected and fails instead of refolding
    TableIO.commitReplacing(root, ns, stateTable, Seq(entry),
      expectedVersion = Some(expectedVersion), operation = Some("overwrite"))
  }

  /** Catch the state table up to the base table's current version,
    * strictly one snapshot per batch (the micro-batch CDC cadence).
    * `keyOf` maps a base row to its group key; maintained aggregates
    * are `n = count(*)` and `sum_v = sum(valueCol)`.
    */
  def catchUp(spark: SparkSession, root: String, ns: String,
      baseTable: String, stateTable: String, checkpoint: Path,
      keyOf: org.apache.spark.sql.Column, valueCol: String): Unit = {
    TableIO.createTableIfNotExists(root, ns, stateTable, stateSchema)
    var from = ChangeFeed.offsetOf(checkpoint)
    // Reconcile forward: state version counts batches actually applied.
    // A checkpoint behind it = crash after commit, before advance — the
    // fold already happened; only the checkpoint write is re-issued.
    val applied = TableIO.currentVersion(root, ns, stateTable)
    if (applied > from) {
      writeOffset(checkpoint, applied)
      from = applied
    }
    val to = TableIO.currentVersion(root, ns, baseTable)
    while (from < to) {
      val changes = Mor.readChanges(spark, root, ns, baseTable, from, from + 1)
      foldDelta(spark, root, ns, stateTable, changes, keyOf, valueCol,
        expectedVersion = from)
      writeOffset(checkpoint, from + 1)
      from += 1
    }
  }

  /** The same maintenance driven by the STREAMING engine: tail the base
    * table's CDC stream (`readStream.format("graft-table")`, one base
    * snapshot per micro-batch) and fold each batch through the shared
    * [[foldDelta]]. Spark's offset log gives at-least-once foreachBatch
    * delivery; exactly-once CONTENT follows the sink discipline — the
    * state table's version counts folded batches, a re-delivered batch
    * id behind it returns without folding, and the CAS expected-version
    * turns any remaining race into a loud failure instead of a silent
    * double-application. Drains the available backlog, then returns
    * (the continuous deployment just keeps the query running).
    *
    * The checkpoint DEFAULTS to a stable directory next to the state
    * table, so successive calls resume from the offset log's frontier
    * instead of replaying the whole snapshot history — replaying is
    * not just wasted planning: once `expireSnapshots` has retired the
    * early base versions, a from-zero restart would fail planning
    * batch 0 over expired snapshots and wedge maintenance forever.
    * Pass an explicit fresh checkpoint only to exercise the replay
    * guard (the batch ids then restart at 0 and every one is skipped).
    */
  def streamMaintain(spark: SparkSession, root: String, ns: String,
      baseTable: String, stateTable: String,
      keyOf: org.apache.spark.sql.Column, valueCol: String,
      checkpoint: Option[String] = None): Unit = {
    TableIO.createTableIfNotExists(root, ns, stateTable, stateSchema)
    val ckpt = checkpoint.getOrElse {
      val p = java.nio.file.Paths.get(root, s"_sivm_ckpt_$stateTable")
      Files.createDirectories(p)
      p.toString
    }
    val q = spark.readStream.format("graft-table")
      .option("root", root).option("namespace", ns)
      .option("table", baseTable).option("mode", "cdc")
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val applied = TableIO.currentVersion(root, ns, stateTable)
        if (batchId >= applied) {
          require(batchId == applied, s"stream IVM gap: batch $batchId " +
            s"arrived with only $applied folded — lost checkpoint?")
          foldDelta(spark, root, ns, stateTable, b, keyOf, valueCol,
            expectedVersion = applied)
        } // batchId < applied: re-delivered batch, already folded
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Join-view IVM: keep V = A join_k B materialized from BOTH base
    * tables' changelogs, one base commit per batch. Each ΔA batch (the
    * signed change rows of one A commit) joins B at the snapshot
    * ALREADY FOLDED — a time-travel read, so the delta is computed
    * against a frozen co-offset rather than "whatever B is now"
    * (race-free under concurrent B writers) — and symmetrically for
    * ΔB. After folding to offsets (va, vb) the state is exactly
    * A@va ⋈ B@vb in multiset semantics: view rows carry multiplicity
    * `n`, so duplicate join rows and partial retractions fold
    * correctly (the classic signed-delta join maintenance:
    * ΔV = ΔA⋈B + A⋈ΔB, cross terms impossible because every base
    * commit touches one table).
    *
    * Offsets are TRANSACTIONAL: (va, vb) ride inside each state commit
    * as a committed props entry, so data and offsets publish in one
    * CAS rename — no side checkpoint to drift, and crash recovery is
    * "read the current snapshot's props". The CAS expected-version
    * (va + vb = batches applied) turns a replayed or concurrent fold
    * into a loud failure instead of a double-application.
    *
    * Per batch the work is O(Δ rows ⋈ matching other-side keys +
    * changed view keys) plus an O(|V|) state rewrite — the view is
    * key-sized, never base-sized. At 100 TB the state table would be
    * bucket-partitioned on k and only touched buckets rewritten (the
    * BM25/bloom index refresh pattern, `Partitioning
    * .replacePartitions`); the semantics here are the same.
    */
  def catchUpJoin(spark: SparkSession, root: String, ns: String,
      aTable: String, bTable: String, stateTable: String,
      key: String, aVal: String, bVal: String): Unit = {
    import org.apache.spark.sql.types._
    val stateSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("av", LongType, nullable = false),
      StructField("bv", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    TableIO.createTableIfNotExists(root, ns, stateTable, stateSchema)
    var (va, vb) = TableIO.readProps(root, ns, stateTable, "ivm_join")
      .map(m => (m("va"), m("vb"))).getOrElse((0L, 0L))
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    def sideAt(table: String, v: Long, valCol: String, as: String) =
      if (v == 0L)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("k", LongType, nullable = false),
            StructField(as, LongType, nullable = false))))
      else Mor.readAt(spark, root, ns, table, v)
        .select(col(key).cast("long").as("k"), col(valCol).cast("long").as(as))
    val (ta, tb) = (TableIO.currentVersion(root, ns, aTable),
      TableIO.currentVersion(root, ns, bTable))
    while (va < ta || vb < tb) {
      val foldA = va < ta
      val (table, v) = if (foldA) (aTable, va) else (bTable, vb)
      val changes = Mor.readChanges(spark, root, ns, table, v, v + 1)
      val deltaV =
        if (foldA)
          changes.select(col(key).cast("long").as("k"),
              col(aVal).cast("long").as("av"), sign.as("s"))
            .join(sideAt(bTable, vb, bVal, "bv"), Seq("k"))
        else
          changes.select(col(key).cast("long").as("k"),
              col(bVal).cast("long").as("bv"), sign.as("s"))
            .join(sideAt(aTable, va, aVal, "av"), Seq("k"))
      val delta = deltaV.groupBy("k", "av", "bv").agg(sum("s").as("dn"))
      val cur =
        if (TableIO.currentVersion(root, ns, stateTable) == 0L)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
        else Mor.read(spark, root, ns, stateTable)
      val next = cur.join(delta, Seq("k", "av", "bv"), "full_outer")
        .select(col("k"), col("av"), col("bv"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
        .filter(col("n") > 0)
      val (va1, vb1) = if (foldA) (va + 1, vb) else (va, vb + 1)
      val seq = TableIO.nextSeq(root, ns, stateTable)
      val entries = Seq(
        TableIO.writeExactFile(spark, root, ns, stateTable,
          s"data/state-v$seq.parquet", next, "data", seq),
        TableIO.propsEntry("ivm_join", Map("va" -> va1, "vb" -> vb1)))
      TableIO.commitReplacing(root, ns, stateTable, entries,
        expectedVersion = Some(va + vb), operation = Some("overwrite"))
      va = va1; vb = vb1
    }
  }
}
