package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve clustering — the write-time data-layout operator
 * for multi-column range pruning: interleaving the bits of two key
 * columns gives a 1-D sort order in which any 2^(2k)-aligned tile of the
 * curve covers an exact 2^k × 2^k rectangle of the key space, so
 * parquet files written in z-order carry TIGHT min/max footer stats on
 * BOTH columns at once — a scan filtered on either key prunes files,
 * not just the one the table happens to be sorted by (the reason Delta/
 * Iceberg OPTIMIZE ZORDER exists; here it is a plain column expression +
 * repartitionByRange, no table format needed).
 *
 * The interleave is pure integer bit arithmetic (one codegen'd
 * expression, no shuffle), so it is engine-portable and sits under a
 * DuckDB hash oracle (q107) via the same generated expression text.
 */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative long
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Codegen'd shift/mask sum — no UDF. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same interleave as SQL text (DuckDB syntax) for oracle mirrors. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Cluster a frame for writing: range-partition by z-value and sort
    * within partitions — every output file then covers one contiguous
    * z-range = one bounded rectangle of (x, y) space. `numPartitions`
    * ≈ target file count; at 100 TB this is the once-per-ingest layout
    * shuffle that every later pruned scan amortizes. */
  def clusterByZ(df: DataFrame, x: String, y: String, bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val withZ = df.withColumn("z", zValue(col(x), col(y), bits))
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("z"))
      else withZ.repartitionByRange(col("z"))
    parted.sortWithinPartitions(col("z"))
  }
}
