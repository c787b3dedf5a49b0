package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Grouped simple linear regression (OLS y = a + b·x) from exact integer
 * moments — the trend-line refinement of q88's stat profile, computed
 * with the same discipline: ONE map-side-combined aggregation collects
 * the five integer moments (n, Σx, Σy, Σxx, Σxy) whose sums are
 * order-independent, then slope and intercept are derived per group
 * from those exact integers:
 *
 *   b = (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²)      a = Σy/n − b·Σx/n
 *
 * The numerator/denominator BIGINTs are emitted alongside the rounded
 * quotients, so the hash compare covers the exact algebra, not just a
 * rounded float. Degenerate groups (constant x → zero denominator)
 * yield NULL slope/intercept via the q88/q106 guard — an INTEGER
 * predicate, never a NaN comparison (engines disagree on NaN order).
 *
 * Scale shape: one shuffle (the groupBy), O(groups) output. Overflow
 * headroom is the caller's contract: inputs must be integer-valued and
 * sized so n·Σ|xy| and n·Σxx stay under 2⁶³ (Spark 4 ANSI mode and
 * DuckDB both fault loudly, not silently, past it) — at larger scale,
 * pre-scale y down a decade per decade of n, or shard the moment sums
 * and merge (they are associative integer cells, like [[Pca]] moments).
 */
object Regression {

  /** @param xCol,yCol integer-valued columns (cast upstream; round
    *        floats to fixed-point first). Output: groupCols..., n,
    *        slope_num, slope_den, slope (6dp), intercept (6dp). */
  def olsGrouped(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val moments = df
      .select(groupCols.map(col) :+ col(xCol).cast("long").as("x") :+
        col(yCol).cast("long").as("y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    moments.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        num.as("slope_num"),
        den.as("slope_den"),
        when(den > 0, round(num / den, 6)).as("slope"),
        when(den > 0, round(
          col("sy") / col("n") - (num / den) * (col("sx") / col("n")),
          6)).as("intercept")): _*)
  }
}
