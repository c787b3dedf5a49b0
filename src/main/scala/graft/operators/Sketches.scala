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

  // --------------------------------------------------------------------
  // Count-min sketch — the FREQUENCY member of the artifact family:
  // Bloom answers "seen?", HLL answers "how many distinct?", CMS answers
  // "about how often?" in O(depth·width) space with a one-sided
  // guarantee (estimate ≥ true count; error ≤ N·e/width with prob
  // 1−e^−depth). Unlike the DataSketches binaries, the sketch here is a
  // SPARSE FRAME of (r, bucket, cnt) cells under a portable md5-derived
  // hash — which (a) makes merge a plain map-side-combined groupBy sum
  // (associative shard algebra, like hllMerge), and (b) lets the ENTIRE
  // build+probe pipeline sit under a DuckDB hash oracle (q118) — the
  // property the opaque-binary sketches can't offer. Zero cells are
  // omitted; estimate coalesces them to 0.
  //
  // Scale: the build is ONE groupBy over depth×|input| rows of
  // fixed-size keys (map-side partial agg collapses each partition to
  // ≤ depth·width cells before the shuffle); the sketch itself is
  // ≤ depth·width rows — broadcastable at any corpus size; probing N
  // keys is a broadcast join against it.
  // --------------------------------------------------------------------

  /** Portable row hash: bucket of `v` under hash row `r`. */
  private def cmsBucket(v: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column,
      width: Int) =
    pmod(conv(substring(md5(concat(r.cast("string"), lit("|"), v)), 1, 8),
      16, 10).cast("long"), lit(width.toLong))

  /** Build a CMS over `valueCol` occurrences: sparse (r, bucket, cnt). */
  def cmsBuild(df: DataFrame, valueCol: String, depth: Int = 4,
      width: Int = 256): DataFrame =
    df.select(col(valueCol).cast("string").as("v"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .groupBy(col("r"), cmsBucket(col("v"), col("r"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge shard sketches built with the SAME depth/width: exact — the
    * merged sketch is identical to a single-shot build over the union
    * (integer cell sums, unlike HLL's estimator drift). */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate each distinct value of `probeCol` in `probes`:
    * min over rows of the matching cell (absent cell = 0). Returns
    * (probeCol, est). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, probeCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    probes.select(col(probeCol)).distinct()
      .select(col(probeCol), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket",
        cmsBucket(col(probeCol).cast("string"), col("r"), width))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(probeCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Equi-join cardinality pre-flight: |A ⋈ₖ B| = Σ_k f_A(k)·f_B(k),
    * estimated from the two CMS artifacts alone as min over hash rows of
    * the cell-wise inner product (the classic CM inner-product bound:
    * one-sided, est ≥ true, error ≤ N_A·N_B/width per row w.h.p.).
    * This is the planner question — "dare I run this self-join?" —
    * answered from O(depth·width) state without touching either input
    * (q124 asks it about the lineitem part-key self-join). Both
    * sketches must share depth/width/hash. Returns one row (`est`). */
  def cmsJoinSize(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.select(col("r"), col("bucket"), col("cnt").as("ca"))
    val bb = b.select(col("r"), col("bucket"), col("cnt").as("cb"))
    aa.join(bb, Seq("r", "bucket"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est"))
  }

  // --------------------------------------------------------------------
  // Log-bucketed histogram — the QUANTILE member of the artifact family,
  // and the mergeable scale path behind q88's exact `percentile` (whose
  // scaladoc names approx quantiles as the 100 TB form). HdrHistogram-
  // style base-2 buckets with 3 sub-bucket bits: values 0..15 are exact;
  // above that a bucket spans [s·2^shift, (s+1)·2^shift) with s ∈ [8,16),
  // so any quantile estimate (bucket midpoint) is within 1/16 relative
  // error — DETERMINISTICALLY, from pure integer bit arithmetic
  // (length(bin(v)), shifts), which is what lets DuckDB rebuild the
  // histogram bucket-for-bucket and the estimates hash-compare (q119).
  // The artifact is O(8·log₂(max)) rows per group — ~500 rows covers the
  // full int64 range; merge is a groupBy sum (exact, associative).
  // Non-negative inputs only (shift by the min for signed data).
  // --------------------------------------------------------------------

  /** Bucket index of non-negative long SQL term `v` (pure integer bit
    * arithmetic — textually mirrorable into DuckDB with `>>`/`//`). */
  private def histIdxSql(v: String): String =
    s"""CASE WHEN $v <= 15 THEN $v
        ELSE 16 + (length(bin($v)) - 5) * 8 +
          (shiftright($v, CAST(length(bin($v)) - 4 AS INT)) - 8) END"""

  /** Bucket midpoint (floor), inverse of [[histIdxSql]]: mid of
    * [s·2^shift, (s+1)·2^shift − 1] via shifts only (no 2^53 hazard). */
  private def histMidSql(idx: String): String =
    s"""CASE WHEN $idx <= 15 THEN $idx
        ELSE shiftright(
          shiftleft(8 + ($idx - 16) % 8, CAST(1 + ($idx - 16) div 8 AS INT)) +
          shiftleft(9 + ($idx - 16) % 8, CAST(1 + ($idx - 16) div 8 AS INT))
          - 1, 1) END"""

  /** Build the histogram artifact over a non-negative long-valued
    * column: sparse (idx, cnt) rows. One map-side-combined groupBy. */
  def histBuild(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("v"))
      .select(expr(histIdxSql("v")).as("idx"))
      .groupBy(col("idx")).agg(count(lit(1)).as("cnt"))

  /** Merge shard histograms: exact (integer cell sums). */
  def histMerge(hists: DataFrame): DataFrame =
    hists.groupBy(col("idx")).agg(sum(col("cnt")).as("cnt"))

  /** Weighted histogram: bucket mass = Σ `weightCol` instead of row
    * count — the "by token mass" / "by byte volume" artifact, answering
    * budget questions ("half the corpus's TOKENS sit in docs shorter
    * than X") that a row-count histogram cannot. Every downstream walk
    * ([[histQuantiles]], [[histPercentileRank]], [[histKsGrouped]],
    * [[histMerge]]) reads it unchanged — `cnt` is just mass. Weights
    * must be non-negative integers (a negative mass makes the
    * cumulative walk non-monotone). */
  def histBuildWeighted(df: DataFrame, valueCol: String,
      weightCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .select(expr(histIdxSql("v")).as("idx"), col("w"))
      .groupBy(col("idx")).agg(sum(col("w")).as("cnt"))

  /** Per-group histogram artifact: groupCols..., idx, cnt — one
    * map-side-combined groupBy; merges per (group, idx) like
    * [[histMerge]]. */
  def histBuildGrouped(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame =
    df.select(groupCols.map(col) :+ col(valueCol).cast("long").as("v"): _*)
      .select(groupCols.map(col) :+ expr(histIdxSql("v")).as("idx"): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Per-group quantile estimates off a grouped artifact: the q119 walk
    * with the cumulative window PARTITIONED by group (each partition is
    * an O(buckets) slice of the artifact — data-size-independent).
    * Returns groupCols..., pct, est. */
  def histQuantilesGrouped(hist: DataFrame, groupCols: Seq[String],
      pcts: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = hist.groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("n"))
    hist.withColumn("cum", sum(col("cnt")).over(w))
      .join(broadcast(tot), groupCols)
      .crossJoin(broadcast(pcts.toDF("pct")))
      .filter(expr("cum >= (CAST(pct AS BIGINT) * n + 99) div 100"))
      .groupBy((groupCols :+ "pct").map(col): _*)
      .agg(min(col("idx")).as("idx"))
      .select(groupCols.map(col) ++ Seq(col("pct"),
        expr(histMidSql("idx")).as("est")): _*)
  }

  /** Inverse lookup — CDF / percentile-rank estimation off the
    * artifact: for each probe value, the fraction of the corpus at or
    * below it, read as cum(bucket(v)) / n (exact integers; the bucket
    * granularity bounds the error the same ≤1/16 way). The
    * score-normalization primitive: turning a raw signal into "what
    * percentile is this document" costs an O(buckets) broadcast join,
    * not a corpus sort — and the artifact answers for values it has
    * never seen (below-all → 0, above-all → 1). Returns (v, pct_rank
    * rounded 6). */
  def histPercentileRank(hist: DataFrame, probes: DataFrame,
      valueCol: String): DataFrame = {
    val cumB = hist.withColumn("cum", sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("idx"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    probes.select(col(valueCol).cast("long").as("v")).distinct()
      .select(col("v"), expr(histIdxSql("v")).as("pidx"))
      .crossJoin(broadcast(hist.agg(sum(col("cnt")).as("n"))))
      .join(broadcast(cumB), col("pidx") >= col("idx"), "left")
      .groupBy(col("v"), col("n"))
      .agg(max(coalesce(col("cum"), lit(0L))).as("below"))
      .select(col("v"), round(col("below") / col("n"), 6).as("pct_rank"))
  }

  /** Signed histogram diff between two snapshots of a distribution:
    * per bucket, cnt_b − cnt_a (full outer over idx, absent = 0) — the
    * DIRECTION detail behind the KS/PSI scalars: which part of the
    * distribution gained or lost mass between yesterday's artifact and
    * today's. Completes the artifact algebra (build / merge / weighted /
    * age / diff); O(buckets), exact integers, no corpus access. */
  def histDiff(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("idx"), col("cnt").as("cnt_a"))
      .join(b.select(col("idx"), col("cnt").as("cnt_b")), Seq("idx"),
        "full_outer")
      .select(col("idx"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"),
        (coalesce(col("cnt_b"), lit(0L)) -
          coalesce(col("cnt_a"), lit(0L))).as("delta"))

  /** Two-sample Kolmogorov–Smirnov distance per group, read OFF a
    * grouped histogram artifact ([[histBuildGrouped]]): each group's CDF
    * vs the POOLED corpus CDF (the blend, like q116's JS drift — a
    * group is compared against the whole including itself, so a tiny
    * outlier group can't drag its own baseline). The sup over two step
    * functions is attained at a step point, and every group's steps are
    * a subset of the pooled histogram's `idx` set — so evaluating
    * |F_g − F_all| on the pooled grid is EXACT for the bucketed
    * distributions, O(groups · buckets) work off the artifact with no
    * corpus pass. All comparisons are integer cross-multiplications
    * (|cum_g·n_all − cum_all·n_g|); the single rounded division happens
    * once per group at the end. Overflow headroom: n_g·n_all must stay
    * under 2⁶³ — exact to ~3·10⁹ rows; past that, drop to the double
    * ratio (the bound is the q135 cross-multiplication discipline's).
    * Returns groupCols..., n_g, ks (rounded 6). */
  def histKsGrouped(grouped: DataFrame, groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val all = grouped.groupBy(col("idx")).agg(sum(col("cnt")).as("cnt_all"))
    val allCum = all.withColumn("cum_all", sum(col("cnt_all")).over(
      Window.orderBy(col("idx"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val nAll = all.agg(sum(col("cnt_all")).as("n_all"))
    val sizes = grouped.groupBy(gc: _*).agg(sum(col("cnt")).as("n_g"))
    val wG = Window.partitionBy(gc: _*).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sizes
      .crossJoin(broadcast(allCum))
      .join(grouped, groupCols :+ "idx", "left")
      .withColumn("cum_g", sum(coalesce(col("cnt"), lit(0L))).over(wG))
      .crossJoin(broadcast(nAll))
      .groupBy(gc :+ col("n_g") :+ col("n_all"): _*)
      .agg(max(abs(col("cum_g") * col("n_all") -
        col("cum_all") * col("n_g"))).as("ks_num"))
      .select(gc :+ col("n_g") :+
        round(col("ks_num") / (col("n_g") * col("n_all")), 6).as("ks"): _*)
  }

  /** Population Stability Index per group off a grouped histogram
    * artifact — the model-monitoring companion of [[histKsGrouped]]:
    * PSI = Σ_buckets (p_g − p_all)·ln(p_g/p_all) over the pooled grid,
    * with the standard ε-floor (1e-6) on both proportions so empty
    * cells contribute a finite penalty instead of ∞. KS reads the worst
    * single point of CDF divergence; PSI integrates mass displacement
    * across all buckets (the industry alarm thresholds 0.1/0.25 assume
    * this form). Each bucket term is computed in double from exact
    * integer counts and nano-quantized before the per-group sum (the
    * q86/q116 recipe), so accumulation order cannot perturb the result
    * in either engine. O(groups·buckets) off the artifact. Returns
    * groupCols..., n_g, psi (rounded 6). */
  def histPsiGrouped(grouped: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gc = groupCols.map(col)
    val all = grouped.groupBy(col("idx")).agg(sum(col("cnt")).as("cnt_all"))
    val nAll = all.agg(sum(col("cnt_all")).as("n_all"))
    val sizes = grouped.groupBy(gc: _*).agg(sum(col("cnt")).as("n_g"))
    sizes
      .crossJoin(broadcast(all))
      .join(grouped, groupCols :+ "idx", "left")
      .crossJoin(broadcast(nAll))
      .withColumn("pg",
        greatest(coalesce(col("cnt"), lit(0L)) / col("n_g"), lit(1e-6)))
      .withColumn("pa", greatest(col("cnt_all") / col("n_all"), lit(1e-6)))
      .withColumn("term_nano",
        round((col("pg") - col("pa")) * log(col("pg") / col("pa"))
          * 1e9).cast("long"))
      .groupBy(gc :+ col("n_g"): _*)
      .agg(sum(col("term_nano")).as("psi_nano"))
      .select(gc :+ col("n_g") :+
        round(col("psi_nano") / 1e9, 6).as("psi"): _*)
  }

  // --------------------------------------------------------------------
  // Portable table-form Bloom filter.
  //
  // [[graft.operators.Dedup.buildBloomArtifact]] is the FAST face of the
  // Bloom trade: Spark's native BloomFilterAggregate (xxhash64) collected
  // to a driver byte array and probed as a codegen'd plan literal — but
  // xxhash64 has no DuckDB twin, so that face is spec-bound. This is the
  // ORACLE-CHECKABLE face: the filter is a DATAFRAME of (word, bits) int
  // rows — it lives in a table, merges with a bit_or groupBy (associative,
  // so per-shard builds union into a corpus filter without touching raw
  // data again), and every bit position derives from md5, which both
  // engines compute identically. Positions use 32-bit words stored in
  // BIGINT so no shift ever touches the sign bit in either engine.
  //
  //   pos_i(key) = hex2int(md5(i ‖ ':' ‖ key)[0,15)) mod mBits,  i < k
  //   word       = pos div 32,   mask = 1 << (pos mod 32)
  //
  // Scale shape: BUILD is one map-side-combined groupBy on `word` over
  // k·|keys| exploded positions — output ≤ mBits/32 rows no matter the
  // corpus. PROBE is k broadcast joins of the ≤ mBits/32-row artifact
  // against the probe side — the probe corpus NEVER shuffles; the only
  // wide edge is whatever aggregation the caller runs after. That is the
  // point at 100 TB: a benchmark/blocklist membership test over the whole
  // corpus costs one narrow pass, vs the exact semi-join's full shuffle.

  /** 15 hex chars of md5 → non-negative 60-bit BIGINT, mod mBits. */
  private def bloomPosSql(key: String, i: Int, mBits: Int): String =
    s"""CAST(conv(substr(md5(concat('$i:', CAST($key AS STRING))), 1, 15),
       |16, 10) AS BIGINT) % $mBits""".stripMargin.replace("\n", " ")

  /** The same position arithmetic in DuckDB SQL, for oracle authors. */
  def bloomPosDuckSql(key: String, i: Int, mBits: Int): String =
    s"CAST(concat('0x', substr(md5(concat('$i:', CAST($key AS VARCHAR))), 1, 15)) AS BIGINT) % $mBits"

  /** Build the (word, bits) Bloom artifact over `keyCol`. mBits must be a
    * multiple of 32. Output ≤ mBits/32 rows (absent words = all-zero). */
  def bloomTableBuild(keys: DataFrame, keyCol: String,
      mBits: Int = 16384, k: Int = 4): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0, s"mBits must be a multiple of 32: $mBits")
    val pos = keys.select(explode(array(
      (0 until k).map(i => expr(bloomPosSql(keyCol, i, mBits))): _*)).as("pos"))
    pos
      .select(expr("pos div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Union of two (or more pre-unioned) artifacts built with the same
    * (mBits, k): one bit_or groupBy over ≤ mBits/32 rows per input. */
  def bloomTableMerge(artifacts: DataFrame): DataFrame =
    artifacts.groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))

  /** Append a boolean `bloom_hit` to `probes`: true ⇔ all k bits set
    * (might contain); false ⇒ definitely absent. k broadcast joins of the
    * tiny artifact; the probe side stays narrow — no shuffle.
    *
    * RESERVED COLUMN NAMES: the probe frame must not already contain
    * `bloom_hit` or any working column `graft_pos<i>`/`graft_w<i>`/
    * `graft_b<i>`/`graft_hit<i>` for i < k — a collision would silently
    * corrupt the joins, so the method fails fast instead (ADVICE r7). */
  def bloomTableProbe(bloom: DataFrame, probes: DataFrame, keyCol: String,
      mBits: Int = 16384, k: Int = 4): DataFrame = {
    val reserved = (0 until k).flatMap(i =>
      Seq(s"graft_pos$i", s"graft_w$i", s"graft_b$i", s"graft_hit$i")).toSet + "bloom_hit"
    val clash = probes.columns.toSet.intersect(reserved)
    require(clash.isEmpty, "bloomTableProbe: probe frame already contains " +
      s"reserved column(s) ${clash.toSeq.sorted.mkString(", ")}")
    val joined = (0 until k).foldLeft(probes) { (acc, i) =>
      val b = bloom.select(col("word").as(s"graft_w$i"),
        col("bits").as(s"graft_b$i"))
      acc
        .withColumn(s"graft_pos$i", expr(bloomPosSql(keyCol, i, mBits)))
        .join(broadcast(b),
          expr(s"graft_pos$i div 32") === col(s"graft_w$i"), "left")
        .withColumn(s"graft_hit$i",
          coalesce(expr(s"(graft_b$i & shiftleft(CAST(1 AS BIGINT), " +
            s"CAST(graft_pos$i % 32 AS INT))) != 0"), lit(false)))
    }
    val allHit = (0 until k).map(i => col(s"graft_hit$i")).reduce(_ && _)
    joined
      .withColumn("bloom_hit", allHit)
      .drop((0 until k).flatMap(i =>
        Seq(s"graft_pos$i", s"graft_w$i", s"graft_b$i", s"graft_hit$i")): _*)
  }

  // --------------------------------------------------------------------
  // Linear-counting distinct sketch (Whang et al. 1990) — the
  // ORACLE-CHECKABLE sibling of [[hllBuild]]: a plain m-bit bitmap (one
  // md5 position per value, the Bloom machinery with k=1) whose
  // zero-bit count V estimates n̂ = −m·ln(V/m). Bit-exact across engines,
  // associatively mergeable via bit_or, and accurate while the bitmap
  // stays unsaturated (choose mBits ≳ n; rel. error ~√m/n·e^{n/2m}).
  // HLL wins asymptotically — this exists because every bit of it can
  // sit under a DuckDB hash compare, giving the approximate-distinct
  // FAMILY an exactly-verified member next to the spec-bound HLL.

  /** Build one (group..., word, bits) bitmap row-set per group over
    * `valueCol`. ≤ mBits/32 rows per group; map-side combined. */
  def lcBuild(df: DataFrame, groupCols: Seq[String], valueCol: String,
      mBits: Int = 65536): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0, s"mBits must be a multiple of 32: $mBits")
    val g = groupCols.map(col)
    df.select(g :+ expr(bloomPosSql(valueCol, 0, mBits)).as("pos"): _*)
      .select(g ++ Seq(expr("pos div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
          .as("mask")): _*)
      .groupBy(g :+ col("word"): _*)
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Union of same-shaped bitmaps (per-shard builds → corpus sketch). */
  def lcMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col) :+ col("word"): _*)
      .agg(expr("bit_or(bits)").as("bits"))

  /** Read n̂ off the bitmap: per group, V = mBits − Σ bit_count(bits)
    * (absent words are all-zero), n̂ = round(−m·ln(V/m)); null when the
    * bitmap saturated (V = 0 — grow mBits). O(artifact) work. */
  def lcEstimate(sketches: DataFrame, groupCols: Seq[String],
      mBits: Int = 65536): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg((lit(mBits) - sum(expr("bit_count(bits)"))).as("v_zero"))
      .withColumn("lc_est",
        when(col("v_zero") > 0,
          round(-lit(mBits.toDouble) *
            log(col("v_zero") / lit(mBits.toDouble))).cast("long")))

  /** Estimate percentiles (integer pct values, e.g. 25/50/75/90/99) off
    * the artifact: rank ceil(pct·n/100) located in the cumulative bucket
    * walk, decoded to the bucket midpoint. O(buckets) work. Returns
    * (pct, est). */
  def histQuantiles(hist: DataFrame, pcts: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val c = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("cnt")).as("n"))))
    pcts.toDF("pct").crossJoin(broadcast(c))
      .filter(expr("cum >= (CAST(pct AS BIGINT) * n + 99) div 100"))
      .groupBy(col("pct")).agg(min(col("idx")).as("idx"))
      .select(col("pct"), expr(histMidSql("idx")).as("est"))
  }

  // --------------------------------------------------------------------
  // KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002,
  // Beyer et al. 2007) — the third ORACLE-EXACT member of the
  // approximate-distinct family, and the only one with a SET ALGEBRA:
  // the artifact is the k smallest 60-bit md5 hashes of the distinct
  // values, so it is (a) bit-identical on any engine (the k minima are
  // a deterministic function of the value set — no registers, no
  // probabilistic state), (b) mergeable by union-then-rerank, and
  // (c) composable: the k minima of A ∪ B with membership flags give
  // unbiased Jaccard/intersection estimates BETWEEN groups — the
  // "how much vocabulary do these two corpora share" question neither
  // the HLL nor the bitmap can answer from their artifacts.
  //
  // Scale shape: the build's one wide edge is the (group, h) DISTINCT —
  // an 8-byte-hash shuffle that partial-aggregates map-side (same cost
  // class as an exact count-distinct) — paid ONCE; every later merge,
  // estimate, or pairwise-Jaccard question reads k-row artifacts. That
  // trade (one exact-cost build, then free reuse and algebra) is the
  // point: an HLL answers repeats cheaply too but cannot be
  // hash-verified or intersected.

  /** 60-bit portable value hash shared by the KMV family. */
  private def kmvHashSql(valueCol: String): String =
    s"CAST(conv(substr(md5(CAST($valueCol AS STRING)), 1, 15), 16, 10) AS BIGINT)"

  /** The same hash in DuckDB SQL, for oracle authors. */
  def kmvHashDuckSql(valueCol: String): String =
    s"CAST(concat('0x', substr(md5(CAST($valueCol AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** Build the per-group KMV artifact over `valueCol`: (group..., h) —
    * the ≤ k smallest distinct hashes per group. */
  def kmvBuild(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k >= 2: $k")
    val g = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("h"))
    df.select(g :+ expr(kmvHashSql(valueCol)).as("h"): _*)
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(g :+ col("h"): _*)
  }

  /** Merge same-k artifacts (shard builds → corpus sketch): distinct
    * union of minima, re-ranked to k. O(shards·k) rows per group. */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
      k: Int = 64): DataFrame = {
    val g = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("h"))
    sketches.select(g :+ col("h"): _*).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(g :+ col("h"): _*)
  }

  /** Read n̂ off the artifact: exact (= row count) while the group holds
    * fewer than k distinct values; (k−1)·2⁶⁰/h_k once saturated. The
    * division runs in doubles — identical constant, identical fold, on
    * any engine. Returns (group..., kmv_n, kmv_est). */
  def kmvEstimate(sketches: DataFrame, groupCols: Seq[String],
      k: Int = 64): DataFrame = {
    val g = groupCols.map(col)
    sketches.groupBy(g: _*)
      .agg(count(lit(1)).as("kmv_n"), max(col("h")).as("hk"))
      .withColumn("kmv_est",
        when(col("kmv_n") < k, col("kmv_n"))
          .otherwise(expr(
            s"CAST(round(${k - 1} * 1152921504606846976.0 / hk) AS BIGINT)")))
      .drop("hk")
  }

  /** Pairwise Jaccard estimates BETWEEN groups, straight off one KMV
    * artifact: for each group pair (ga < gb), pool both minima sets,
    * keep the k smallest of the union with membership flags, and count
    * how many sit in both — ρ = both/k estimates J(A,B) (Beyer 2007).
    * O(pairs·k) work, artifacts only — the corpus never re-enters.
    * The group list is sketch-HOLDERS (languages, domains, snapshots) —
    * bounded by contract, so its self pair enumeration broadcasts one
    * side (a bounded-build nested loop, never an unbroadcast cartesian;
    * BatteryPlanSpec sweeps the whole battery for exactly that).
    * Returns (ga, gb, k_used, n_both, jaccard_est). */
  def kmvJaccardPairs(sketches: DataFrame, groupCol: String,
      k: Int = 64): DataFrame = {
    val rows = sketches.select(col(groupCol).as("g"), col("h"))
    val groups = rows.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .join(broadcast(groups.select(col("g").as("gb"))),
        col("ga") < col("gb"))
    val pooled = pairs.join(rows, col("g") === col("ga"))
      .select(col("ga"), col("gb"), col("h"),
        lit(1L).as("ina"), lit(0L).as("inb"))
      .unionByName(pairs.join(rows, col("g") === col("gb"))
        .select(col("ga"), col("gb"), col("h"),
          lit(0L).as("ina"), lit(1L).as("inb")))
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    pooled.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("k_used"),
        sum(col("ina") * col("inb")).as("n_both"))
      .withColumn("jaccard_est",
        round(col("n_both").cast("double") / col("k_used"), 6))
  }
}
