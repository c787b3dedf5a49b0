package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Integer 1-D k-means (Lloyd's algorithm, fixed iterations) — the
 * length-bucketing / curriculum-binning primitive of a training-data
 * pipeline: cluster documents by a scalar size signal into k natural
 * bins instead of hand-picked thresholds (the data-driven refinement of
 * q22's CASE buckets and q82's token-budget bins).
 *
 * All arithmetic is 64-bit integer: centroids are floor-divided means,
 * assignment distance is |v − c| on longs, ties break to the lower
 * centroid index. That makes every iteration bit-identical on any engine
 * that floor-divides bigints, so the whole fixed-iteration recursion
 * sits under an exact DuckDB hash oracle (q104 — the recursion unrolled
 * as one assign/update CTE pair per iteration, the q94 PageRank
 * discipline).
 *
 * Scale shape — the canonical broadcast-centroid loop: centroids live on
 * the driver as O(k) state (k is single-digit; this is the legitimate
 * O(bins) driver collect, same class as Curation's histogram prefixes).
 * Each iteration is ONE map-side-combined groupBy over the data — the
 * assignment is a codegen'd array-literal argmin (`transform` +
 * `array_min` over (|v−c|, i) structs), no join, no shuffle of the data
 * by cluster key beyond the k-row partial-agg merge. Init is the exact
 * min/max span split (deterministic, engine-portable) rather than
 * sampled k-means++ (RNG-free is what the oracle needs; at 100 TB the
 * span init costs one extra agg pass and converges the same fixed
 * iteration count).
 */
object KMeans {

  /** Argmin-over-centroids column: index of the centroid minimizing
    * (|v − c|, index) lexicographically — codegen'd, no join. */
  private def assignExpr(valueCol: String, cs: Seq[Long]) = {
    val arr = cs.mkString("array(", "L, ", "L)")
    expr(s"""array_min(transform($arr,
      (c, i) -> struct(abs($valueCol - c) AS d, i AS i))).i""")
  }

  /**
   * Fit + final assignment stats.
   *
   * @param values frame with a non-negative long column `valueCol`
   *               (non-negativity keeps truncating and flooring division
   *               identical, the cross-engine contract)
   * @param k cluster count (small; centroids are O(k) driver state)
   * @param iters fixed Lloyd iterations after span init
   * @return (cluster, centroid, n, total) — final centroids with the
   *         size and value-sum of their final assignment, one row per
   *         non-empty cluster, ordered by cluster index
   */
  def fit1D(values: DataFrame, valueCol: String, k: Int, iters: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(iters >= 0, "iters must be >= 0")
    val mm = values
      .agg(min(col(valueCol)).cast("long"), max(col(valueCol)).cast("long"))
      .head()
    require(!mm.isNullAt(0), "fit1D requires a non-empty input")
    val (vmin, vmax) = (mm.getLong(0), mm.getLong(1))
    // Span init: c_i = vmin + ((vmax - vmin) * i) div (k - 1).
    var cs: Seq[Long] = (0 until k).map(i => vmin + (vmax - vmin) * i / (k - 1))
    for (_ <- 1 to iters) {
      val stats = values
        .groupBy(assignExpr(valueCol, cs).as("cluster"))
        .agg(sum(col(valueCol).cast("long")).as("sv"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      // Empty cluster keeps its previous centroid (deterministic, mirrors
      // the oracle's LEFT JOIN ... CASE).
      cs = cs.zipWithIndex.map { case (c, i) =>
        stats.get(i).map { case (sv, n) => sv / n }.getOrElse(c)
      }
    }
    val centroidRows = cs.zipWithIndex
      .map { case (c, i) => s"struct(${i} AS cluster, ${c}L AS centroid)" }
      .mkString("array(", ", ", ")")
    values
      .groupBy(assignExpr(valueCol, cs).as("cluster"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("long")).as("total"))
      .join(values.sparkSession.range(1).select(
        explode(expr(centroidRows)).as("c")).select(col("c.*")), Seq("cluster"))
      .select(col("cluster"), col("centroid"), col("n"), col("total"))
      .orderBy(col("cluster"))
  }
}
