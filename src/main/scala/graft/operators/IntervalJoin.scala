package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

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
 * overlapping pair, exactly once; the non-key column sets must be
 * disjoint.
 *
 * `keys`: optional equi-join columns present under the SAME name on
 * both sides — the banded-join composition (q226's temporal relay: key
 * on the shared node so only same-node edge pairs within a time band
 * ever meet; a session join keyed on user_id; …). The grid bucket is
 * simply appended to the equi-key, so the join stays ONE ordinary
 * shuffle and the per-key candidate mass is band-local instead of
 * all-history.
 *
 * `saltHot`: the hot-bucket mitigation as a parameter (VERDICT r11 #5)
 * instead of prose. A genuinely hot (keys, bucket) cell — many
 * concurrent intervals on BOTH sides — puts |L|·|R| pair mass on one
 * reducer under a shuffle join (measured m² in SCALE.md's
 * interval_overlap_hot row). With saltHot = S > 1 the LEFT side
 * replicates each exploded row S ways and the RIGHT side hashes each
 * row to ONE deterministic salt, so the hot cell's pair mass spreads
 * over S reducers at the cost of S× the left exploded rows — the
 * standard replicate/route skew-join trade, worth it exactly when a
 * few cells dominate. Output pairs are unchanged (every (l, r) meets
 * exactly once: at r's salt).
 *
 * `autoSalt` (VERDICT r12 #6): picks S from the data so the mitigation
 * engages without the caller knowing the skew. A cheap PRE-PASS — one
 * count-aggregate per side over the exploded grid keys plus a 1-row
 * rollup — estimates each cell's pair mass |L_cell|·|R_cell|; if the
 * hottest cell exceeds `autoSaltFactor`× the average per-partition
 * mass (total mass / spark.sql.shuffle.partitions), S is chosen as
 * ceil(hottest / average-per-partition), capped at 32, else S stays 1.
 * The probe is an ACTION (the decision is a literal in the plan), so
 * the call becomes eager — the price of a data-dependent physical
 * choice, the same trade AQE makes at runtime, taken here because the
 * replicate/route rewrite changes the LOGICAL plan. Uniform inputs pay
 * two map-side-combined aggregates and keep the unsalted plan.
 */
object IntervalJoin {

  def overlapJoin(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucket: Long, maxSpan: Int = 1024,
      keys: Seq[String] = Nil, saltHot: Int = 1,
      autoSalt: Boolean = false,
      autoSaltFactor: Double = 4.0): DataFrame = {
    require(bucket > 0, s"bucket width must be positive: $bucket")
    require(maxSpan >= 1, s"maxSpan must be >= 1: $maxSpan")
    require(saltHot >= 1, s"saltHot must be >= 1: $saltHot")
    require(!autoSalt || saltHot == 1,
      "autoSalt picks S itself — do not also pass saltHot > 1")
    require(autoSaltFactor > 0, s"autoSaltFactor > 0: $autoSaltFactor")
    keys.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"equi-key column $k must exist on both sides")
    }
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(clash.isEmpty,
      s"left/right non-key column sets must be disjoint, both have: ${clash.mkString(", ")}")
    (Seq("__bucket", "__salt")).foreach { r =>
      require(!(left.columns ++ right.columns).contains(r),
        s"column name $r is reserved by overlapJoin")
    }

    // Floor division valid for negative coordinates too (pmod is the
    // non-negative remainder, so (c - pmod) rounds toward -inf) and for
    // the FULL long range: the numerator is an exact multiple of bucket
    // and the division is integral (DIV), so coordinates beyond 2^53 —
    // epoch-nanos are ~1.7e18 — never round through a double (ADVICE r11).
    def fd(c: Column): Column = {
      val cl = c.cast("long")
      ColumnBridge.column(new IntegralDivide(
        ColumnBridge.expression(cl - pmod(cl, lit(bucket))),
        ColumnBridge.expression(lit(bucket))))
    }
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

    val lb0 = left.withColumn("__bucket",
      explode(buckets(col(leftStart), col(leftEnd), "left")))
    val rb0 = right.withColumn("__bucket",
      explode(buckets(col(rightStart), col(rightEnd), "right")))
    // Auto-salt probe: per-cell pair mass = |L_cell|·|R_cell| over the
    // exploded grid keys; engage when the hottest cell crosses
    // autoSaltFactor× the average per-partition mass. Sizing rule:
    // spread the hottest cell to roughly one average partition —
    // S = ceil(hottest / (total / P)) — capped at 32 (the
    // replicate-side cost grows linearly in S).
    val cellKeys = (keys :+ "__bucket").map(col)
    val effSalt = if (!autoSalt) saltHot else {
      val lc = lb0.groupBy(cellKeys: _*).agg(count(lit(1)).as("cl"))
      val rc = rb0.groupBy(cellKeys: _*).agg(count(lit(1)).as("cr"))
      // Mass in DOUBLE, not long (ADVICE r13): |L|·|R| of an extremely
      // hot cell can exceed 2^63, and under ANSI a long multiply would
      // RAISE — aborting exactly the skewed query the probe exists to
      // save. The probe only needs a ratio; double precision is plenty.
      val probe = lc.join(rc, keys :+ "__bucket")
        .select((col("cl").cast("double") * col("cr").cast("double"))
          .as("mass"))
        .agg(coalesce(max(col("mass")), lit(0.0d)).as("mx"),
          coalesce(sum(col("mass")), lit(0.0d)).as("tot"))
        .collect()(0)
      val (mx, tot) = (probe.getDouble(0), probe.getDouble(1))
      val p = left.sparkSession.sessionState.conf.numShufflePartitions
      val avgPerPartition = tot / math.max(1, p)
      if (tot == 0.0d || mx <= autoSaltFactor * avgPerPartition) 1
      else math.min(32, math.ceil(mx / avgPerPartition).toInt)
    }
    // Salted variant: left replicates saltHot ways; right routes each row
    // to ONE salt by a deterministic hash of its full row content (rows
    // identical in every column share a salt — colocating exact
    // duplicates is a bounded, stated loss).
    val (lb, rb, joinKeys) =
      if (effSalt == 1) (lb0, rb0, keys :+ "__bucket")
      else (
        lb0.withColumn("__salt",
          explode(sequence(lit(0), lit(effSalt - 1)))),
        rb0.withColumn("__salt",
          pmod(xxhash64(right.columns.map(col): _*), lit(effSalt))
            .cast("int")),
        keys ++ Seq("__bucket", "__salt"))
    lb.join(rb, joinKeys)
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd))
      // first-shared-bucket rule: each overlapping pair is emitted by
      // every shared bucket; keep only the bucket where the true
      // intersection starts — exact, arithmetic, no distinct.
      .filter(col("__bucket") ===
        fd(greatest(col(leftStart), col(rightStart))))
      .drop("__bucket", "__salt")
  }
}
