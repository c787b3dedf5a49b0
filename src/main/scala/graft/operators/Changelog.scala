package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Changelog (CDC) collapse and snapshot⊕delta merge — the ingestion
 * primitive that turns an append-only mutation log into current state:
 * per key, the row with the highest (ord, tie) wins, and a winning
 * tombstone op deletes the key. The reference's ingest loop mutates an
 * embedded store row-by-row (`/root/reference/src/GraphPopulator.groovy`
 * upserts nodes one Gremlin call at a time); this is the same
 * latest-wins semantics re-expressed as ONE distributed aggregation.
 *
 * Skew shape: latest-per-key is deliberately NOT a row_number window
 * (a window sorts every row of a hot key on one reducer — the exact
 * reducer-flood trap [[Dedup.corpusLineDedup]] documents). It is a
 * `max(struct(ord..., payload...))` aggregation: struct comparison is
 * lexicographic, so the max struct IS the latest row, and the agg
 * map-side combines — a key with a billion updates ships one candidate
 * row per input partition, never a billion rows to one task. One
 * shuffle on the key, O(keys) output.
 *
 * The algebra that matters at 100 TB: `latestState` is an associative,
 * commutative fold over log segments — `latestState(a ∪ b) ==
 * latestState(latestState(a) ∪ b)` (a collapsed snapshot is itself a
 * valid log whose rows carry their winning ord). So a pipeline
 * compacts yesterday's log into an O(keys) snapshot once, and each new
 * delta merges against the snapshot (`mergeSnapshot`) without ever
 * re-reading the historical log — the incremental-ingestion contract,
 * same operating-point split as [[Dedup.minhashDedupFromBuild]].
 * Tombstones must be RETAINED in the snapshot (filtered only at read
 * time, `dropTombstones=true`) or a delete could resurrect: an old
 * update arriving in a later delta would win against an absent key.
 * ChangelogSpec pins both the algebra (random splits of a random log)
 * and the resurrection case.
 */
object Changelog {

  /** Collapse a mutation log to latest state per key.
    *
    * @param log     the changelog; one row per mutation
    * @param keyCols identity of the mutated entity
    * @param ordCols total order of mutations (e.g. ts, then a unique
    *                sequence id as tie-break — MUST be total per key,
    *                or "latest" is undefined)
    * @param opCol   mutation kind column
    * @param tombstoneOp op value meaning "delete this key"
    * @param dropTombstones true → winning deletes are removed (read
    *                view); false → kept (snapshot/compaction view, the
    *                form that merges safely with later deltas)
    * Output: keyCols..., ordCols..., opCol, payload columns — the
    * winning row per key, plus `n_log_rows` (log rows folded into the
    * key, summed across merges). */
  def latestState(log: DataFrame, keyCols: Seq[String], ordCols: Seq[String],
      opCol: String, tombstoneOp: String,
      dropTombstones: Boolean = true): DataFrame = {
    val payload = log.columns.filterNot(c =>
      keyCols.contains(c) || c == "n_log_rows")
    val withCount =
      if (log.columns.contains("n_log_rows")) log
      else log.withColumn("n_log_rows", lit(1L))
    val ordered = ordCols ++ payload.filterNot(ordCols.contains)
    val collapsed = withCount
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(struct(ordered.map(col): _*)).as("w"),
        sum(col("n_log_rows")).as("n_log_rows"))
    val out = collapsed.select(
      keyCols.map(col) ++ payload.map(c => col(s"w.$c").as(c)) :+
        col("n_log_rows"): _*)
    if (dropTombstones) out.filter(col(opCol) =!= lit(tombstoneOp)) else out
  }

  /** Vacuum: drop tombstones whose winning ord lies below a delivery
    * watermark. Safe ONLY under the contract that no future delta can
    * carry a mutation older than the watermark — vacuuming a tombstone
    * still inside the late-arrival horizon reopens the resurrection
    * trap the scaladoc above describes (ChangelogSpec pins both the
    * safe and the premature case). Live rows are never touched; the
    * snapshot shrinks by its dead weight, which at 100 TB is the
    * difference between a state table that grows forever and one
    * bounded by live keys + horizon. */
  def vacuum(snapshot: DataFrame, opCol: String, tombstoneOp: String,
      olderThanWatermark: org.apache.spark.sql.Column): DataFrame =
    snapshot.filter(col(opCol) =!= lit(tombstoneOp) || !olderThanWatermark)

  /** Merge a compacted snapshot (output of `latestState` with
    * `dropTombstones=false`) with a newer delta log: one union + one
    * latest-wins collapse. The snapshot's rows compete on their winning
    * ord, so a late-arriving old mutation in `delta` correctly loses to
    * the snapshot (and a snapshot tombstone correctly beats it). */
  def mergeSnapshot(snapshot: DataFrame, delta: DataFrame,
      keyCols: Seq[String], ordCols: Seq[String], opCol: String,
      tombstoneOp: String, dropTombstones: Boolean = true): DataFrame = {
    val deltaCounted =
      if (delta.columns.contains("n_log_rows")) delta
      else delta.withColumn("n_log_rows", lit(1L))
    latestState(
      snapshot.unionByName(deltaCounted.select(snapshot.columns.map(col): _*)),
      keyCols, ordCols, opCol, tombstoneOp, dropTombstones)
  }
}
