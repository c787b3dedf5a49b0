package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Automatic one-pass table profiler — the schema-driven generalization
 * of q88's hand-picked stat profile: given ANY frame, emit one row per
 * column with the ingestion-monitoring basics (null count, exact
 * distinct count, numeric range, string length). This is the "describe
 * the snapshot before promoting it" companion to [[DataChecks]] (which
 * gates; this one observes — together they're the pipeline's data-ops
 * surface).
 *
 * Shape: ALL columns profile in ONE aggregation. The exact
 * count-distincts compile to a single Expand-based pass (row
 * multiplication × columns before the partial agg — the documented
 * cost of exactness); at 100 TB pass `approxDistinct = true` to swap
 * them for `approx_count_distinct` (HLL, no expand, ±2%) — the oracle
 * (q122) checks the exact form. Numeric/timestamp ranges surface as
 * micro-rounded doubles, string lengths as an average — a UNIFORM
 * output schema (column, dtype, n_rows, n_nulls, n_distinct, min_num,
 * max_num, avg_len) so profiles of different tables union/diff cleanly
 * (the drift use: yesterday's profile vs today's).
 */
object Profiler {

  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    def numExpr(f: StructField, agg: String): String = f.dataType match {
      case _: NumericType =>
        s"round(CAST($agg(`${f.name}`) AS DOUBLE), 6)"
      case TimestampType =>
        s"CAST(unix_micros($agg(`${f.name}`)) AS DOUBLE)"
      case TimestampNTZType =>
        // NTZ→LTZ cast resolves in the session zone; Verify/Bench pin
        // UTC, making this the same wall-instant epoch both engines see.
        s"CAST(unix_micros(CAST($agg(`${f.name}`) AS TIMESTAMP)) AS DOUBLE)"
      case _ => "CAST(NULL AS DOUBLE)"
    }
    def lenExpr(f: StructField): String = f.dataType match {
      case StringType => s"round(avg(length(`${f.name}`)), 6)"
      case _ => "CAST(NULL AS DOUBLE)"
    }
    def distinctExpr(c: String): String =
      if (approxDistinct) s"approx_count_distinct(`$c`)"
      else s"count(DISTINCT `$c`)"
    val aggs = count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap {
      case (f, i) => Seq(
        expr(s"count(1) - count(`${f.name}`)").as(s"nulls$i"),
        expr(distinctExpr(f.name)).as(s"nd$i"),
        expr(numExpr(f, "min")).as(s"mn$i"),
        expr(numExpr(f, "max")).as(s"mx$i"),
        expr(lenExpr(f)).as(s"al$i"))
    }.toSeq
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex.map { case (f, i) =>
      s"'${f.name}', '${f.dataType.simpleString}', nulls$i, nd$i, mn$i, mx$i, al$i"
    }.mkString(", ")
    one.select(
      expr(s"""stack(${cols.length}, $stackArgs)
          AS (column, dtype, n_nulls, n_distinct, min_num, max_num, avg_len)"""),
      col("n_rows"))
      .select(col("column"), col("dtype"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"), col("avg_len"))
  }

  /**
   * Snapshot-to-snapshot PROFILE DRIFT — the schema-evolution and
   * fill-rate monitor the scaladoc above promises: profile both frames
   * (one aggregation pass each), full-outer join per column, and emit
   * status (added / dropped / type_changed / kept), both dtypes, both
   * fill rates (1 − nulls/rows, round-6), the fill delta, and both
   * distinct counts. O(columns) output; the only corpus work is the two
   * profile passes (swap in approxDistinct at 100 TB, same as
   * [[profile]]).
   */
  def profileDrift(a: DataFrame, b: DataFrame,
      approxDistinct: Boolean = false): DataFrame = {
    def side(df: DataFrame, sfx: String): DataFrame =
      profile(df, approxDistinct).select(col("column"),
        col("dtype").as(s"dtype_$sfx"),
        when(col("n_rows") > 0,
          round(lit(1.0) - col("n_nulls").cast("double") / col("n_rows"), 6))
          .as(s"fill_$sfx"),
        col("n_distinct").as(s"dist_$sfx"))
    side(a, "a").join(side(b, "b"), Seq("column"), "full_outer")
      .withColumn("status",
        when(col("dtype_a").isNull, "added")
          .when(col("dtype_b").isNull, "dropped")
          .when(col("dtype_a") =!= col("dtype_b"), "type_changed")
          .otherwise("kept"))
      .withColumn("fill_delta",
        when(col("fill_a").isNotNull && col("fill_b").isNotNull,
          round(col("fill_b") - col("fill_a"), 6)))
      .select(col("column"), col("status"), col("dtype_a"), col("dtype_b"),
        col("fill_a"), col("fill_b"), col("fill_delta"),
        col("dist_a"), col("dist_b"))
  }
}
