package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rolling distinct-actives — for every sliding window position, how many
 * DISTINCT keys were active at least once inside it (the "rolling 24 h
 * unique users per hour" metric next to q25's per-bucket raw counts).
 *
 * Naively this is a count-distinct per window position with each event
 * probed W times — W shuffled copies of the corpus, and still a distinct
 * per position. This operator gets the exact answer with NO per-position
 * distinct via interval algebra: a key active in bucket h covers window
 * starts [h−W+1, h]; per key, covered ranges whose active buckets are ≤ W
 * apart union into CONTIGUOUS islands (classic gaps-and-islands), and
 * islands of one key are ≥ 1 start apart — so exploding each island
 * [h₀−W+1, h₁] emits every (key, start) EXACTLY once and a plain count
 * per start IS the distinct count.
 *
 * The island summaries (key, h0, h1) are an ASSOCIATIVE artifact: a
 * summary's endpoints are its first/last ACTIVE buckets and its interior
 * gaps are ≤ W by construction, so merging two island sets only needs
 * endpoint gaps — [[mergeIslands]] re-islandizes the union with a
 * running-max-end sweep, and IntervalsSpec property-tests merge ==
 * rebuild-from-raw. That makes the state streamable
 * ([[graft.streaming.ArtifactStreams.activeIntervalsStream]]): O(keys ·
 * islands) carried state, bounded by horizon/W per key, never the raw
 * events.
 *
 * Shape: one shuffle for the (key, bucket) distinct, per-key windows
 * (two over one partitioning — Catalyst reuses the exchange), a narrow
 * explode, one final map-side-combined count. Explode fan-out is
 * bounded by (active key-buckets + islands·W) rows of two longs — at
 * W=24 that is ≤ 25× the distinct key-bucket table in the worst case
 * (every active bucket isolated), independent of raw event volume. The
 * per-key window's skew bound is the key's DISTINCT bucket count (≤ the
 * time horizon in buckets), not its event count — a billion-event hot
 * user still contributes ≤ horizon rows past the first distinct.
 */
object Intervals {

  /** Gaps-and-islands sweep over (k, h0, h1) summaries: a new island
    * starts when the next summary's first active bucket is > W past the
    * running max end. Works for raw buckets too (b ≡ [b, b]). */
  private def islandize(summaries: DataFrame, window: Int): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("h0"), col("h1"))
    val prevMaxEnd = max(col("h1"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    summaries
      .withColumn("newisl",
        when(prevMaxEnd.isNull || col("h0") - prevMaxEnd > window, 1)
          .otherwise(0))
      .withColumn("isl", sum(col("newisl"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("k"), col("isl"))
      .agg(min(col("h0")).as("h0"), max(col("h1")).as("h1"))
      .select(col("k"), col("h0"), col("h1"))
  }

  /** Per-key coverage islands (k, h0, h1) of the activity set — the
    * mergeable artifact behind [[rollingDistinctActives]]. */
  def activeIslands(df: DataFrame, keyCol: String, bucketCol: String,
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    islandize(
      df.select(col(keyCol).as("k"), col(bucketCol).cast("long").as("h"))
        .distinct()
        .select(col("k"), col("h").as("h0"), col("h").as("h1")),
      window)
  }

  /** Associative merge of two island artifacts (same key/window). */
  def mergeIslands(a: DataFrame, b: DataFrame, window: Int): DataFrame =
    islandize(a.unionByName(b), window)

  /** Read an island artifact into (window_start, n_active). */
  def startsFromIslands(islands: DataFrame, window: Int): DataFrame =
    islands
      .select(explode(sequence(col("h0") - (window - 1), col("h1")))
        .as("window_start"))
      .groupBy(col("window_start"))
      .agg(count(lit(1)).as("n_active"))

  /** @param df      frame with `keyCol` and an integral bucket column
    *                `bucketCol` (e.g. floor(ts/1h)); duplicates fine
    * @param window  window length in buckets (W ≥ 1); a window START s
    *                covers buckets [s, s+W−1]
    * @return (window_start, n_active) for every start with ≥1 active
    *         key, ordered by nothing (sort downstream) */
  def rollingDistinctActives(df: DataFrame, keyCol: String,
      bucketCol: String, window: Int): DataFrame =
    startsFromIslands(activeIslands(df, keyCol, bucketCol, window), window)
}
