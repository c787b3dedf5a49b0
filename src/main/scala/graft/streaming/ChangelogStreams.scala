package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{CacheScope, Changelog}

/**
 * Streaming face of the CDC changelog merge ([[graft.operators.Changelog]],
 * q114): maintain current latest-wins state over an unbounded mutation
 * stream by folding each micro-batch into the compacted snapshot —
 * exactly the snapshot⊕delta algebra the batch operator proves
 * (`latestState(a ∪ b) == mergeSnapshot(latestState(a), b)`), applied
 * once per trigger. ChangelogStreamSpec pins stream == batch on
 * arbitrary trigger splits, INCLUDING out-of-order deliveries (a late
 * mutation in a later trigger loses to the snapshot's newer winner —
 * no watermark needed, the ord comparison is the arbiter).
 *
 * State discipline (the [[CurationStreams]] folding rules):
 *  - the snapshot is an O(keys) eagerly-checkpointed frame with a
 *    BOUNDED partition count, swapped only AFTER the merge
 *    materializes — foreachBatch is at-least-once, and a retried
 *    trigger must re-enter against intact pre-fold state;
 *  - folds are guarded by batch id, so a re-delivered batch re-emits
 *    but never double-folds (double-folding is harmless for latest-wins
 *    VALUES — the merge is idempotent — but would double `n_log_rows`);
 *  - tombstones live in the carried snapshot and are dropped only in
 *    the per-trigger read view (the resurrection trap —
 *    Changelog scaladoc).
 */
object ChangelogStreams {

  /** Fold the mutation stream into latest-wins state; `sink` receives
    * the current read view (tombstones dropped) each trigger. */
  def changelogStateStream(log: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], opCol: String, tombstoneOp: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    var snapshot: Option[DataFrame] = None
    var lastFolded = -1L
    log.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastFolded) {
          val merged0 = snapshot match {
            case Some(s) => Changelog.mergeSnapshot(s, batch, keyCols,
              ordCols, opCol, tombstoneOp, dropTombstones = false)
            case None => Changelog.latestState(batch, keyCols, ordCols,
              opCol, tombstoneOp, dropTombstones = false)
          }
          val merged = boundedCheckpoint(merged0)
          snapshot.foreach(unpin)
          snapshot = Some(merged)
          lastFolded = batchId
        }
        sink(snapshot.get.filter(col(opCol) =!= lit(tombstoneOp)), batchId)
      }
      .start()
  }

  /** Streaming incremental VIEW maintenance: carry (aggregate artifact,
    * snapshot) and fold each micro-batch with
    * [[graft.operators.IncrementalAgg.maintain]] — per-trigger work is
    * O(batch + affected keys); `sink` receives the current aggregate.
    * Same state rules as [[changelogStateStream]] (both frames
    * checkpoint BEFORE either swaps — a retry must never see an agg
    * from one fold and a snapshot from another). */
  def incrementalViewStream(log: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], opCol: String, tombstoneOp: String,
      groupCol: String, valueMicroCol: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    var state: Option[(DataFrame, DataFrame)] = None
    var lastFolded = -1L
    log.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastFolded) {
          val (agg0, snap0) = state match {
            case Some((agg, snap)) =>
              graft.operators.IncrementalAgg.maintain(agg, snap, batch,
                keyCols, ordCols, opCol, tombstoneOp, groupCol,
                valueMicroCol)
            case None =>
              val snap = Changelog.latestState(batch, keyCols, ordCols,
                opCol, tombstoneOp, dropTombstones = false)
              val agg = graft.operators.IncrementalAgg.contrib(
                snap.filter(col(opCol) =!= lit(tombstoneOp)), groupCol,
                valueMicroCol)
              (agg, snap)
          }
          val aggC = boundedCheckpoint(agg0)
          val snapC =
            try boundedCheckpoint(snap0)
            catch { case e: Throwable => unpin(aggC); throw e }
          state.foreach { case (a, s) => unpin(a); unpin(s) }
          state = Some((aggC, snapC))
          lastFolded = batchId
        }
        sink(state.get._1, batchId)
      }
      .start()
  }

  /** Streaming SCD2 maintenance: carry the version-history table and
    * fold each micro-batch with [[Changelog.scd2Merge]] — only the OPEN
    * versions of keys the batch touches re-price, so the per-trigger
    * cost is O(batch + touched opens) and closed history rides along
    * untouched. Requires the append-only CDC contract ACROSS triggers
    * (every ord in a later batch exceeds the key's prior ords — the
    * scd2Merge precondition; a CDC source ordered by commit time
    * satisfies it). Scd2StreamSpec pins per-trigger history == batch
    * scd2History of everything delivered. */
  def scd2Stream(log: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], opCol: String, tombstoneOp: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    var history: Option[DataFrame] = None
    var lastFolded = -1L
    log.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastFolded) {
          val next0 = history match {
            case Some(h) => Changelog.scd2Merge(h, batch, keyCols,
              ordCols, opCol, tombstoneOp)
            case None => Changelog.scd2History(batch, keyCols, ordCols,
              opCol, tombstoneOp)
          }
          val next = boundedCheckpoint(next0)
          history.foreach(unpin)
          history = Some(next)
          lastFolded = batchId
        }
        sink(history.get, batchId)
      }
      .start()
  }

  private def unpin(df: DataFrame): Unit = CacheScope.unpinCheckpoint(df)

  private def boundedCheckpoint(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    df.coalesce(p).localCheckpoint(true)
  }
}
