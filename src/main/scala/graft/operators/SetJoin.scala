package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Prefix-filtered set-similarity self-join (the SSJoin/PPJoin candidate
 * rule of Chaudhuri 2006 / Xiao 2008): all document pairs with Jaccard
 * ≥ t over their distinct shingle sets — the PRINCIPLED bound on the
 * inverted-index join, complementing [[graft.queries.TextQueries]] q35's
 * df-cap (which bounds work by *discarding* hot shingles; the prefix
 * rule bounds it while staying EXACT).
 *
 * The rule: order every document's shingles by one global total order
 * (ascending document frequency, rarest first — ties by shingle text);
 * a pair with Jaccard ≥ t MUST share a shingle inside both documents'
 * first ⌊(1−t)·|d|⌋+1 shingles, so only that prefix is indexed — the
 * index shrinks by ~t·|corpus| and, because prefixes hold each doc's
 * RAREST shingles, bucket sizes collapse (the hot boilerplate shingle
 * that floods a full inverted index never enters anyone's prefix unless
 * the doc has nothing rarer). Candidates then pass the length filter
 * (t·|a| ≤ |b| ≤ |a|/t) and an EXACT verify.
 *
 * Cross-engine exactness: thresholds are a rational num/den and every
 * filter is integer cross-multiplication (prefix length, length filter,
 * final (den+num)·inter ≥ num·(|a|+|b|)) — no float Jaccard anywhere.
 * The q126 oracle is the NAIVE all-shared-shingle-pairs join with the
 * same integer predicate, so the hash compare IS the completeness proof
 * (a pair dropped by the prefix rule would fail it).
 *
 * Scale shape: one (id, shingle) shuffle for df + rank windows (per-doc
 * window is narrow; the df table is vocab-sized); the candidate join
 * runs prefix×prefix (smallest index possible for exactness); verify
 * joins candidates to the two docs' collected shingle ARRAYS and counts
 * the overlap per row (size(array_intersect)) — candidate-sized rows,
 * O(|A|+|B|) work per pair, instead of the candidate×|d| row expand the
 * join-back formulation pays.
 */
object SetJoin {

  /** All pairs (a < b) with Jaccard(shingles(a), shingles(b)) ≥ num/den.
    * Output: a, b, inter, sz_a, sz_b. */
  def prefixJaccardJoin(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, num: Int = 1, den: Int = 2): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"bad threshold $num/$den")
    val tk = CacheScope.pin(shingles(docs, idCol, textCol, n))
    val sz = tk.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val dfreq = tk.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // Per-doc rank in the global (df asc, shingle asc) order; prefix =
    // first sz − ceil(t·sz) + 1 shingles.
    val byRarity = Window.partitionBy(col("id"))
      .orderBy(col("df"), col("s"))
    // No forced broadcasts: df is vocab-sized and sz is corpus-sized —
    // tiny here, unboundedly large at 100 TB; AQE picks the strategy.
    val ranked = tk.join(dfreq, Seq("s"))
      .withColumn("pos", row_number().over(byRarity))
      .join(sz, Seq("id"))
    // NOT pinned (round-15 measured): the candidate self-join's x/y
    // branches are structurally IDENTICAL, so ReusedExchange already
    // computes the df-join + rank-window chain once — a pin here ADDED
    // shuffle bytes (13.1 → 17.3 MB) by splitting the two sides' reads
    // of the checkpoint into distinct exchanges. Pins pay only when the
    // branches' projections differ (q43's candidatesFromBanded case).
    val prefix = ranked.filter(
      col("pos") <= col("sz") -
        expr(s"(CAST($num AS BIGINT) * sz + ${den - 1}) div $den") + 1)
      .select(col("id"), col("s"), col("sz"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id") &&
          // Length filter: t·|a| ≤ |b| and t·|b| ≤ |a|.
          lit(num) * col("x.sz") <= lit(den) * col("y.sz") &&
          lit(num) * col("y.sz") <= lit(den) * col("x.sz"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.sz").as("sz_a"), col("y.sz").as("sz_b"))
      .distinct()
    // Exact verify via per-doc shingle ARRAYS (round 16): the old shape
    // exploded every candidate pair by doc a's full shingle set and
    // re-joined tk on (b, s) — O(candidates·|d|) probe ROWS through two
    // joins and an aggregate (~16M rows at sf0.1 for 310k candidates, the
    // operator's dominant stage, 3.3 s measured). size(array_intersect)
    // over the two docs' collected shingle arrays computes the identical
    // integer overlap (both arrays are distinct by construction; size is
    // order-independent) with candidate-sized rows end to end — two
    // doc-table joins instead of a candidate×|d| expand. Per-row cost is
    // O(|A|+|B|) time and memory; a pathological 10⁶-shingle doc would
    // make 40 MB array rows — bound |d| upstream if docs can be that
    // large (the declared corpora are ≤ 10³ shingles/doc).
    val sets = tk.groupBy(col("id")).agg(collect_list(col("s")).as("arr"))
    val inter = cand
      .join(sets.select(col("id").as("a"), col("arr").as("arr_a")), Seq("a"))
      .join(sets.select(col("id").as("b"), col("arr").as("arr_b")), Seq("b"))
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"),
        size(array_intersect(col("arr_a"), col("arr_b")))
          .cast("long").as("inter"))
    inter.filter(
        lit(den + num) * col("inter") >= lit(num) * (col("sz_a") + col("sz_b")))
      .select(col("a"), col("b"), col("inter"), col("sz_a"), col("sz_b"))
  }

  /** Incremental face of [[prefixJaccardJoin]]: probe a BATCH against a
    * CORPUS for cross pairs with Jaccard ≥ num/den — the exact
    * counterpart of [[Dedup.incrementalMinhash]] (LSH probes are
    * approximate; this one misses nothing, which the q132 naive-join
    * oracle proves). Both sides rank by the CORPUS's df order (shingles
    * the corpus has never seen get df 0 — rarest-first), so the prefix
    * lemma's single global order covers the cross pair. The corpus
    * prefix table is the storable artifact: at a fixed threshold it's a
    * pure function of the corpus, reusable per batch like the band
    * table. Output: a (batch id), b (corpus id), inter, sz_a, sz_b. */
  def prefixJaccardProbe(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, n: Int = 3, num: Int = 1,
      den: Int = 2): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"bad threshold $num/$den")
    val bt = CacheScope.pin(shingles(batch, idCol, textCol, n))
    val ct = CacheScope.pin(shingles(corpus, idCol, textCol, n))
    val dfreq = ct.groupBy(col("s")).agg(count(lit(1)).as("df"))
    def prefixOf(tk: DataFrame): DataFrame = {
      val sz = tk.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      tk.join(dfreq, Seq("s"), "left")
        .na.fill(0L, Seq("df"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
        .join(sz, Seq("id"))
        .filter(col("pos") <= col("sz") -
          expr(s"(CAST($num AS BIGINT) * sz + ${den - 1}) div $den") + 1)
        .select(col("id"), col("s"), col("sz"))
    }
    val bp = prefixOf(bt)
    val cp = prefixOf(ct)
    val cand = bp.as("x").join(cp.as("y"),
        col("x.s") === col("y.s") &&
          lit(num) * col("x.sz") <= lit(den) * col("y.sz") &&
          lit(num) * col("y.sz") <= lit(den) * col("x.sz"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.sz").as("sz_a"), col("y.sz").as("sz_b"))
      .distinct()
    // Array-intersect verify — same rewrite and bounds as
    // [[prefixJaccardJoin]]'s (round 16).
    val bSets = bt.groupBy(col("id")).agg(collect_list(col("s")).as("arr"))
    val cSets = ct.groupBy(col("id")).agg(collect_list(col("s")).as("arr"))
    cand
      .join(bSets.select(col("id").as("a"), col("arr").as("arr_a")), Seq("a"))
      .join(cSets.select(col("id").as("b"), col("arr").as("arr_b")), Seq("b"))
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"),
        size(array_intersect(col("arr_a"), col("arr_b")))
          .cast("long").as("inter"))
      .filter(lit(den + num) * col("inter") >=
        lit(num) * (col("sz_a") + col("sz_b")))
      .select(col("a"), col("b"), col("inter"), col("sz_a"), col("sz_b"))
  }

  /** Distinct word n-gram shingles per doc: (id, s). */
  private[graft] def shingles(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        filter(split(col(textCol), "\\s+"), t => t =!= lit("")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${n - 1}),
            i -> concat_ws(' ', slice(toks, i, $n)))""")).as("s"))
      .distinct()
}
