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

  /** @param df      frame with `keyCol` and an integral bucket column
    *                `bucketCol` (e.g. floor(ts/1h)); duplicates fine
    * @param window  window length in buckets (W ≥ 1); a window START s
    *                covers buckets [s, s+W−1]
    * @return (window_start, n_active) for every start with ≥1 active
    *         key, ordered by nothing (sort downstream) */
  def rollingDistinctActives(df: DataFrame, keyCol: String,
      bucketCol: String, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val uh = df.select(col(keyCol).as("k"),
      col(bucketCol).cast("long").as("h")).distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("h"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    uh
      // New island when the previous active bucket is > W back (ranges
      // [prev−W+1, prev] and [h−W+1, h] stay contiguous up to gap W).
      .withColumn("newisl",
        when(lag(col("h"), 1).over(w).isNull ||
          col("h") - lag(col("h"), 1).over(w) > window, 1).otherwise(0))
      .withColumn("isl", sum(col("newisl")).over(wCum))
      .groupBy(col("k"), col("isl"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0") - (window - 1), col("h1")))
        .as("window_start"))
      .groupBy(col("window_start"))
      .agg(count(lit(1)).as("n_active"))
  }
}
