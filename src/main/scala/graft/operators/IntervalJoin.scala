package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval-overlap join of two LARGE interval sets — the member of the
 * join family (S4) where neither side is broadcastable and the
 * predicate is a range overlap, so a naive plan degenerates to
 * BroadcastNestedLoopJoin (or a full cartesian + filter). The classic
 * scale-out shape instead: each interval explodes into the fixed-width
 * grid buckets it covers, the two sides EQUI-join on the bucket (one
 * ordinary shuffle join Catalyst plans like any other), the exact
 * closed-interval predicate filters, and pairs that share several
 * buckets are kept exactly once by an ARITHMETIC rule — a pair
 * survives only in the bucket of max(start_l, start_r), the first
 * bucket of their true intersection — so no distinct shuffle is
 * needed.
 *
 * Cost shape: fan-out per row = interval length / bucket + 1 (guarded
 * by `maxSpan` — an interval covering more buckets raises with a
 * message naming the fix: a coarser grid). Join mass per bucket =
 * |left intervals touching it| × |right intervals touching it| — the
 * documented skew exposure is a hot bucket (many concurrent intervals
 * on both sides); the mitigations are the usual ladder: narrow the
 * sides first, choose the bucket near the typical interval length,
 * salt the hot buckets. At 100 TB both exploded sides shuffle once on
 * the bucket key and AQE handles moderate skew.
 *
 * Overlap semantics: CLOSED intervals [s, e] (s ≤ e required — rows
 * violating it raise at execution); (L, R) matches iff
 * `l_start ≤ r_end AND r_start ≤ l_end` (touching endpoints DO
 * overlap). Output = all left columns + all right columns of each
 * overlapping pair, exactly once; the column sets must be disjoint.
 */
object IntervalJoin {

  def overlapJoin(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucket: Long, maxSpan: Int = 1024): DataFrame = {
    require(bucket > 0, s"bucket width must be positive: $bucket")
    require(maxSpan >= 1, s"maxSpan must be >= 1: $maxSpan")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right column sets must be disjoint, both have: ${clash.mkString(", ")}")
    require(!(left.columns ++ right.columns).contains("__bucket"),
      "column name __bucket is reserved by overlapJoin")

    // Floor division valid for negative coordinates too (pmod is the
    // non-negative remainder, so (c - pmod) / bucket rounds toward -inf).
    def fd(c: Column): Column =
      ((c - pmod(c, lit(bucket))) / lit(bucket)).cast("long")
    def buckets(s: Column, e: Column, side: String): Column = {
      val bad = s.isNull || e.isNull || s > e
      val span = fd(e) - fd(s) + lit(1L)
      when(bad, raise_error(concat(
          lit(s"overlapJoin: $side interval must satisfy start <= end "
            + "(non-null), got start="), s.cast("string"),
          lit(" end="), e.cast("string"))))
        .when(span > maxSpan, raise_error(concat(
          lit(s"overlapJoin: $side interval covers "), span.cast("string"),
          lit(s" grid buckets (maxSpan $maxSpan) — use a coarser bucket "
            + "width or split long intervals upstream"))))
        .otherwise(sequence(fd(s), fd(e)))
    }

    val lb = left.withColumn("__bucket",
      explode(buckets(col(leftStart), col(leftEnd), "left")))
    val rb = right.withColumn("__bucket",
      explode(buckets(col(rightStart), col(rightEnd), "right")))
    lb.join(rb, Seq("__bucket"))
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd))
      // first-shared-bucket rule: each overlapping pair is emitted by
      // every shared bucket; keep only the bucket where the true
      // intersection starts — exact, arithmetic, no distinct.
      .filter(col("__bucket") ===
        fd(greatest(col(leftStart), col(rightStart))))
      .drop("__bucket")
  }
}
