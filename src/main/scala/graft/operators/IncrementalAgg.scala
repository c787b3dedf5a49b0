package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental aggregate (materialized-view) maintenance over the CDC
 * family — the capstone of [[Changelog]]'s algebra: keep a grouped
 * aggregate (count + sum) of the CURRENT latest-wins state consistent
 * under deltas WITHOUT rescanning the corpus. The classic delta rule:
 *
 *   agg' = agg − contrib(old live rows of affected keys)
 *              + contrib(new live rows of affected keys)
 *
 * where "affected" = keys present in the delta — so the update work is
 * O(|delta| + |affected keys|), never O(|snapshot|); the group sums
 * subtract exactly because values are micro-quantized integers (the
 * q86 recipe — a float sum maintained by ± deltas would accumulate
 * association noise that a fresh full aggregation doesn't have, and
 * the two would drift apart; integer sums make `maintain` ≡ rebuild,
 * which is exactly what the q127 oracle hash-proves cross-engine).
 *
 * Tombstones: a key deleted by the delta leaves both its old
 * contribution (subtracted) and any future one (none) — groups whose
 * count reaches 0 drop from the artifact. Updates are
 * delete-plus-insert in one pass (old contribution out, new winner
 * in), including GROUP MIGRATION (an update that moves a key to a
 * different group subtracts from the old group and adds to the new —
 * IncrementalAggSpec pins it).
 */
object IncrementalAgg {

  /** Grouped (n_rows, micro-sum) contributions of a state frame's live
    * rows. `valueMicroCol` must be an exact integer column. */
  def contrib(live: DataFrame, groupCol: String,
      valueMicroCol: String): DataFrame =
    live.groupBy(col(groupCol))
      .agg(count(lit(1)).as("c"), sum(col(valueMicroCol)).as("s"))

  /** Fold a delta into (aggregate artifact, snapshot), returning the
    * updated pair. `snapshot` must be a `Changelog.latestState(...,
    * dropTombstones = false)` frame; `agg` must be `contrib` of its
    * live rows. */
  def maintain(agg: DataFrame, snapshot: DataFrame, delta: DataFrame,
      keyCols: Seq[String], ordCols: Seq[String], opCol: String,
      tombstoneOp: String, groupCol: String, valueMicroCol: String)
      : (DataFrame, DataFrame) = {
    val affected = delta.select(keyCols.map(col): _*).distinct()
    val snapAffected = snapshot.join(affected, keyCols, "left_semi")
    val oldLive = snapAffected.filter(col(opCol) =!= lit(tombstoneOp))
    val newAffected = Changelog.mergeSnapshot(snapAffected, delta,
      keyCols, ordCols, opCol, tombstoneOp, dropTombstones = false)
    val newLive = newAffected.filter(col(opCol) =!= lit(tombstoneOp))
    val change = contrib(oldLive, groupCol, valueMicroCol)
      .select(col(groupCol), (-col("c")).as("c"), (-col("s")).as("s"))
      .unionByName(contrib(newLive, groupCol, valueMicroCol))
    val updatedAgg = agg.unionByName(change)
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("c"), sum(col("s")).as("s"))
      .filter(col("c") > 0)
    // Snapshot rewrite: untouched keys pass through narrowly (anti-join
    // against the key-sized affected frame — broadcastable), affected
    // keys take their merged rows. At 100 TB this is the standard
    // partitioned merge-on-read write, not a shuffle of the corpus.
    val updatedSnapshot = snapshot.join(affected, keyCols, "left_anti")
      .unionByName(newAffected)
    (updatedAgg, updatedSnapshot)
  }
}
