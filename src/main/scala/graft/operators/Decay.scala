package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exponentially-decayed counts/sums — the "trending now" primitive: a
 * row observed `p` half-lives ago contributes 2^-p of its weight, so
 * recent activity dominates without any windowed re-scan. (The
 * reference's event surface exposes only raw per-period counts; decay is
 * the standard recency refinement, and the ranking signal behind
 * trending-topics / hot-keys dashboards over exactly this event shape.)
 *
 * Exactness across engines: age is bucketed to WHOLE half-life periods
 * (`p = clamp((refTs − ts) div periodNs, 0, 62)`), and 2^-p is applied
 * to integer micro-units with round-half-up — `(x + 2^p/2) div 2^p` —
 * so every term is a pure BIGINT expression both engines compute
 * bit-identically (no float pow/exp anywhere; the q94/q110 integer
 * discipline). Decay is applied to PER-(key, period) partial sums, not
 * per row — that makes the result a function of the (key, period)
 * aggregate table alone, which is what makes [[decayArtifact]] exact.
 *
 * Scale shape: one map-side-combined groupBy on (key, period) — the
 * corpus's only shuffle — then an O(keys·63) rollup to keys. The
 * (key, period) artifact is mergeable (integer cell sums, like the CMS/
 * histogram artifacts), APPEND-ONLY under new data, and vacuumable:
 * periods older than 62 half-lives decay to a guaranteed 0 and can be
 * dropped, so state is bounded by keys × 63 regardless of history
 * length. Re-reading the artifact at a later `refTs` just shifts every
 * p — the decayed totals "age" without touching the corpus.
 *
 * Precondition: per-(key, period) micro-sums of `valueCol` must be
 * non-negative (Spark `div` truncates toward zero, DuckDB `//` floors —
 * they agree only on non-negative numerators; shift the value upstream
 * if it can go negative).
 */
object Decay {

  /** Per-(key, period) integer partials — the mergeable/storable
    * artifact: keyCols..., p, cnt, sv (Σ round(value·10⁶)). */
  def decayArtifact(df: DataFrame, keyCols: Seq[String], tsNsCol: String,
      valueCol: String, refTsNs: Long, periodNs: Long): DataFrame = {
    require(periodNs > 0, "periodNs must be positive")
    df.select(keyCols.map(col) :+
        expr(s"greatest(CAST(0 AS BIGINT), least(CAST(62 AS BIGINT), " +
          s"($refTsNs - $tsNsCol) div $periodNs)) AS p") :+
        expr(s"CAST(round($valueCol * 1000000) AS BIGINT) AS v"): _*)
      .groupBy((keyCols :+ "p").map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"))
  }

  /** Collapse an artifact (or a union of artifact shards — merge first
    * with a (key, p) groupBy sum) to decayed totals per key:
    * `decayed_count_u` = Σ cnt·round-half-up(10⁶/2^p), `decayed_value_u`
    * = Σ round-half-up(sv/2^p), plus raw `n_rows`. Integer micro-units
    * out (divide by 10⁶ for display). */
  def decayRead(artifact: DataFrame, keyCols: Seq[String]): DataFrame =
    artifact
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(expr("cnt * ((1000000 + (shiftleft(CAST(1 AS BIGINT), " +
          "CAST(p AS INT)) div 2)) div shiftleft(CAST(1 AS BIGINT), " +
          "CAST(p AS INT)))")).as("decayed_count_u"),
        sum(expr("(sv + (shiftleft(CAST(1 AS BIGINT), CAST(p AS INT)) " +
          "div 2)) div shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))"))
          .as("decayed_value_u"),
        sum(col("cnt")).as("n_rows"))

  /** Advance an artifact's reference instant by `periods` half-lives
    * without touching the corpus: ages every cell by shifting p (clamped
    * at the 62 horizon). Exact vs a rebuild at the later refTs for every
    * row inside the [refTs − 62·period, refTs] horizon — rows already
    * clamped (future-dated or beyond-horizon at build time) stay
    * clamped, which only matters if cell sums reach 2^61 micro-units
    * (where the horizon term stops rounding to exactly 0). DecaySpec
    * pins age == rebuild on in-horizon data. */
  def ageArtifact(artifact: DataFrame, periods: Long): DataFrame = {
    require(periods >= 0, "artifacts only age forward")
    artifact.withColumn("p",
      least(col("p") + lit(periods), lit(62L)).cast("long"))
  }

  /** Direct form: build + read in one plan. */
  def decayedTotals(df: DataFrame, keyCols: Seq[String], tsNsCol: String,
      valueCol: String, refTsNs: Long, periodNs: Long): DataFrame =
    decayRead(decayArtifact(df, keyCols, tsNsCol, valueCol, refTsNs,
      periodNs), keyCols)
}
