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

  /** Catch the state table up to the base table's current version,
    * strictly one snapshot per batch (the micro-batch CDC cadence).
    * `keyOf` maps a base row to its group key; maintained aggregates
    * are `n = count(*)` and `sum_v = sum(valueCol)`.
    */
  def catchUp(spark: SparkSession, root: String, ns: String,
      baseTable: String, stateTable: String, checkpoint: Path,
      keyOf: org.apache.spark.sql.Column, valueCol: String): Unit = {
    import org.apache.spark.sql.types._
    val stateSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sum_v", LongType, nullable = false)))
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
      // maintainer) sees version != from and fails instead of refolding
      TableIO.commitReplacing(root, ns, stateTable, Seq(entry),
        expectedVersion = Some(from), operation = Some("overwrite"))
      writeOffset(checkpoint, from + 1)
      from += 1
    }
  }
}
