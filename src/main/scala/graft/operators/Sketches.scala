package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mergeable distinct-count sketch artifacts (Apache DataSketches HLL,
 * shipped inside Spark as `hll_sketch_agg`/`hll_union_agg`) — the
 * counting sibling of the Bloom membership artifact
 * ([[graft.operators.Dedup]]'s ingestion-dedup path): Bloom answers "have
 * I seen this key", HLL answers "how many distinct keys", and both are
 * constant-size and associatively mergeable, which is the property that
 * matters at 100 TB.
 *
 * The scale story this encodes: distinct-counting a live corpus with
 * `COUNT(DISTINCT)` re-shuffles ALL raw keys every time someone asks;
 * building a per-shard sketch ONCE at ingestion (one map-side-combined
 * groupBy per shard, kilobytes per group) and merging sketches at query
 * time answers every later cardinality question — per group, per
 * arbitrary shard subset, or global — from the artifact alone, without
 * touching raw data again. Merge is exact over the register lattice
 * (union of HLLs == HLL of union for a fixed lgK) — but NOT over the
 * estimate: merging invalidates DataSketches' preferred HIP estimator,
 * so a merged sketch reads through the composite estimator and can
 * differ from the single-shot build by a small epsilon within the error
 * envelope. SketchesSpec pins both against the true cardinality.
 *
 * Estimates are approximate (relative error ~1.04/√2^lgK ≈ 1.6% at the
 * default lgK=12) but the sketch is EXACT in sparse mode — below ~2^lgK/4
 * distinct values it stores coupons losslessly — so small-group counts
 * round to the true value; the spec pins that too. DuckDB has no
 * compatible sketch surface, so this operator is spec-bound rather than
 * oracle-checked (the exact-count face of the same question is q12/q53).
 */
object Sketches {

  /** Build one HLL sketch per group over `valueCol`: the per-shard
    * ingestion artifact. Output: groupCols..., `hll` (binary). */
  def hllBuild(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Merge sketch artifacts (e.g. shards of the same logical corpus) down
    * to one sketch per group — associative, constant-size, raw data never
    * read. Input needs the `hll` binary column. */
  def hllMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("hll"), lit(false)).as("hll"))

  /** Read estimates off an artifact: groupCols..., `n_distinct` (long,
    * rounded estimate). */
  def hllEstimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.select(
      groupCols.map(col) :+
        round(hll_sketch_estimate(col("hll"))).cast("long").as("n_distinct"): _*)
}
