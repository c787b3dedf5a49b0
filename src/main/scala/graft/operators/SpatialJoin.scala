package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Grid-bucketed spatial join (points-in-boxes) — the scalable form of
 * the reference's geocoding containment question (OSM results carry
 * bounding boxes, /root/reference/src/OSMFetcher.groovy:24-30; "which
 * gazetteer boxes contain this coordinate" is the lookup its geocoder
 * answers one synchronous HTTP call at a time).
 *
 * Why a grid: the naive formulation is a cross join with a containment
 * theta filter — O(|points|·|boxes|), dead at scale. Hashing both sides
 * onto a fixed grid turns it into an EQUI-join: each point lands in
 * exactly ONE cell (floor division), each box enumerates the cells its
 * extent overlaps (bounded by (⌈w/cell⌉+1)² — cap `cellSize` ≥ the
 * typical box width to keep this a small constant), candidates meet on
 * the cell key, and an exact containment filter verifies. Because a
 * point has one cell and a box lists each overlapped cell once, every
 * true (point, box) pair meets EXACTLY once — no dedup pass. The
 * pattern is the same bucket-join discipline as the LSH family: never
 * all-pairs, verify after an equi-join on a derived key.
 *
 * Coordinates are INTEGERS (e.g. centi-degrees): the grid arithmetic is
 * integer division on longs, so the whole operator sits under a DuckDB
 * hash oracle (q112, mirrored there as the naive theta join — same
 * pairs, different join order). Box bounds are inclusive.
 *
 * Negative coordinates: Spark's `div` truncates toward zero (cells
 * around the origin are effectively wider), which is still CORRECT here
 * because truncating division is monotonic — x_min ≤ x ≤ x_max implies
 * cell(x) ∈ [cell(x_min), cell(x_max)], so a contained point always
 * meets its box's cell enumeration. Only the Spark side computes cells
 * (the oracle is the theta join), so no cross-engine floor-vs-truncate
 * divergence exists; SpatialJoinSpec covers negative coords explicitly.
 */
object SpatialJoin {

  /**
   * @param points (id, x, y) — long integer coordinates
   * @param boxes (box_id, x_min, x_max, y_min, y_max) — inclusive long
   *              integer bounds; callers guarantee min ≤ max
   * @param cellSize grid pitch in the same integer units
   * @return (id, box_id) — one row per contained (point, box) pair
   */
  def pointsInBoxes(points: DataFrame, boxes: DataFrame,
      cellSize: Long): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val p = points
      .withColumn("cx", expr(s"x div $cellSize"))
      .withColumn("cy", expr(s"y div $cellSize"))
    val b = boxes
      .withColumn("cx", explode(sequence(
        expr(s"x_min div $cellSize"), expr(s"x_max div $cellSize"))))
      .withColumn("cy", explode(sequence(
        expr(s"y_min div $cellSize"), expr(s"y_max div $cellSize"))))
    p.join(b, Seq("cx", "cy"))
      .filter(col("x") >= col("x_min") && col("x") <= col("x_max") &&
        col("y") >= col("y_min") && col("y") <= col("y_max"))
      .select(col("id"), col("box_id"))
  }
}
