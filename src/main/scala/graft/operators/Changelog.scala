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

  /** SCD Type 2: turn the mutation log into a VERSION HISTORY table —
    * one row per non-tombstone mutation, carrying its validity interval
    * [its ord, next mutation's ord) and a current flag. A winning
    * tombstone emits no version but CLOSES the previous one (its ord
    * becomes that version's `valid_to`), so a deleted key ends with a
    * closed interval and no current row.
    *
    * Unlike [[latestState]], history genuinely needs per-key ORDER (each
    * version's end is its successor's start), so this IS a window — but
    * the output is the same size as the input and a key's cost is its
    * own mutation count, not the corpus's: the skew exposure of a window
    * here is bounded by the hottest key's log length, which a CDC
    * pipeline already bounds by compaction cadence. At 100 TB the
    * incremental form ([[scd2Merge]]) is the operating point: only the
    * OPEN version of a touched key can ever change, so a delta reprices
    * O(delta + touched open versions) rows and the closed history is
    * immutable — append-only storage, never rewritten.
    *
    * Output: all log columns (ordCols = the version's `valid_from`),
    * plus `valid_to_<ord1>` (first ord col of the NEXT mutation, null
    * for open versions), `version` (1-based dense per key over emitted
    * versions — tombstones do not consume a number, which is what makes
    * [[scd2Merge]]'s offset arithmetic exact), and `is_current`
    * (1 when open, else 0). Ties on ord1 between adjacent mutations
    * yield zero-length versions — kept (they record that the state held,
    * however briefly); ordCols must still totally order each key's log. */
  def scd2History(log: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], opCol: String, tombstoneOp: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
    val toCol = s"valid_to_${ordCols.head}"
    log
      .withColumn(toCol, lead(col(ordCols.head), 1).over(w))
      .filter(col(opCol) =!= lit(tombstoneOp))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current",
        when(col(toCol).isNull, lit(1)).otherwise(lit(0)))
  }

  /** Incremental SCD2: fold a newer delta log into an existing history
    * (every ord in `delta` must exceed every ord already in `history`
    * for its key — the append-only CDC contract). Closed versions are
    * immutable and pass through untouched; each touched key's OPEN
    * version is re-opened as a pseudo-log row, re-versioned together
    * with the delta, and its `version` numbers are offset by the key's
    * closed-version count — so `scd2Merge(scd2History(a), b) ==
    * scd2History(a ∪ b)` exactly (ChangelogSpec pins the algebra on
    * random splits). Cost: O(|delta| + open versions of touched keys);
    * the history table is read once and never shuffled beyond the
    * touched-key semi/anti joins. */
  def scd2Merge(history: DataFrame, delta: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], opCol: String, tombstoneOp: String): DataFrame = {
    val toCol = s"valid_to_${ordCols.head}"
    val logCols = history.columns
      .filterNot(c => c == toCol || c == "version" || c == "is_current")
    val touchedKeys = delta.select(keyCols.map(col): _*).distinct()
    val touched = history.join(touchedKeys, keyCols, "left_semi")
    val untouched = history.join(touchedKeys, keyCols, "left_anti")
    // Closed versions of touched keys are immutable history.
    val touchedClosed = touched.filter(col(toCol).isNotNull)
    val reopened = touched.filter(col(toCol).isNull)
      .select(logCols.map(col): _*)
    // version offset = closed-version count per key (the reopened row was
    // version offset+1 and becomes local version 1 in the rebuild).
    val offsets = touchedClosed
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("int").as("_v_off"))
    val rebuilt = scd2History(
      reopened.unionByName(delta.select(logCols.map(col): _*)),
      keyCols, ordCols, opCol, tombstoneOp)
      .join(broadcastIfSmall(offsets), keyCols, "left")
      .withColumn("version",
        col("version") + coalesce(col("_v_off"), lit(0)))
      .drop("_v_off")
    untouched.unionByName(touchedClosed)
      .unionByName(rebuilt.select(history.columns.map(col): _*))
  }

  /** Offsets are touched-key-sized (usually delta-sized, tiny next to
    * history); hint broadcast and let AQE fall back if the delta is
    * genuinely huge. */
  private def broadcastIfSmall(df: DataFrame): DataFrame = broadcast(df)

  /** Temporal point-in-time lookup: enrich each fact row with the
    * version of its key that was valid AT the fact's ord — the reason
    * SCD2 history exists, without materializing it: facts and mutations
    * union-tag into ONE per-key window (mutations sort before a
    * same-ord fact via the tag), and `last(version-struct, ignoreNulls)`
    * hands every fact its governing version. ONE shuffle on the key —
    * no range join, no per-fact probe; the window's skew bound is a
    * key's mutations + facts, the same bound any temporal join carries.
    * A governing TOMBSTONE (or no prior mutation at all) yields NULL
    * dim columns — deleted state must not enrich (the [[latestState]]
    * resurrection discipline, applied to reads).
    *
    * Output: facts' columns (keys, ords, extras) + `dim_<p>` for each
    * log payload column except `opCol`. Fact extra columns must not
    * collide with log payload names. */
  def temporalLookup(log: DataFrame, facts: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], opCol: String, tombstoneOp: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payload = log.columns.filterNot(c =>
      keyCols.contains(c) || ordCols.contains(c))
    val factExtra = facts.columns.filterNot(c =>
      keyCols.contains(c) || ordCols.contains(c))
    require(factExtra.intersect(payload).isEmpty,
      s"fact columns collide with log payload: " +
        factExtra.intersect(payload).mkString(","))
    val vStruct = struct(payload.map(col): _*)
    val vtag = log.select(
      (keyCols ++ ordCols).map(col) ++ Seq(lit(0).as("_tag"),
        vStruct.as("_v")) ++
        factExtra.map(c => lit(null).cast(facts.schema(c).dataType).as(c)): _*)
    val ftag = facts.select(
      (keyCols ++ ordCols).map(col) ++ Seq(lit(1).as("_tag"),
        lit(null).cast(vtag.schema("_v").dataType).as("_v")) ++
        factExtra.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((ordCols :+ "_tag").map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    vtag.unionByName(ftag)
      .withColumn("_cur", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select((keyCols ++ ordCols ++ factExtra).map(col) ++
        payload.filterNot(_ == opCol).map(p =>
          when(col(s"_cur.$opCol") =!= lit(tombstoneOp),
            col(s"_cur.$p")).as(s"dim_$p")): _*)
  }
}
