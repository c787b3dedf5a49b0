package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * One-to-one bipartite reconciliation matching — the assignment step
 * after entity-resolution scoring (golden-record's natural next stage:
 * two source systems each contribute candidate records, pairs are
 * scored, and each left record must claim at most ONE right record and
 * vice versa). The classical sequential answer is greedy matching over
 * pairs sorted by score — inherently serial. The distributed form here
 * is the LOCALLY-DOMINANT-EDGE iteration (Preis 1999 / Manne–Bisseling
 * 2007): per round, every pair that is simultaneously its left node's
 * best AND its right node's best (ties broken by the smaller partner
 * id) is accepted — all such pairs at once, they can't conflict — and
 * both endpoints leave the pool.
 *
 * EXACT equivalence, not an approximation: under the total edge order
 * P = (score desc, a asc, b asc), an edge accepted by sequential greedy
 * is locally dominant when greedy reaches it, and every locally
 * dominant edge is accepted by greedy — so iterating rounds to
 * exhaustion reproduces the sequential greedy matching EDGE-FOR-EDGE
 * (MatchingSpec proves it against a sequential reference on random
 * score tables, ties included). Greedy itself is the standard
 * 1/2-approximation to the optimum-weight matching; the Hungarian
 * optimum is O(n³) serial and has no bounded-round distributed form —
 * greedy's guarantee is the one a 100 TB reconciliation can honor.
 *
 * Scale shape per round: two map-side-combined max(struct) aggregates
 * (never a window over the pair table), one equi-join of the two
 * node-sized best tables, two anti-joins to shrink the pool, and a
 * localCheckpoint to truncate iteration lineage — 3-4 edge-or-node
 * sized shuffles, no driver-side state beyond the loop counter. Round
 * count is fixed (the oracle-able form); each round matches every
 * currently-dominant pair, so r rounds suffice for any component whose
 * greedy chain length is ≤ r — power-law pair tables typically exhaust
 * in a handful of rounds.
 */
object Matching {

  /**
   * Run `rounds` locally-dominant iterations over scored pairs.
   *
   * @param pairs    candidate pairs with columns `aCol`, `bCol`,
   *                 `scoreCol` (LongType score — integer scores keep the
   *                 match set bit-identical across engines); duplicate
   *                 (a,b) rows must be pre-deduped by the caller. Rows
   *                 whose score is null (or casts to null) are DROPPED
   *                 up front: a null score has no place in the total
   *                 edge order P, and under the min(struct(-s, …))
   *                 rewrite it would otherwise sort FIRST and beat every
   *                 real candidate (ADVICE r9). Long.MinValue scores are
   *                 rejected too — negation can't represent them
   *                 (non-ANSI mode would silently wrap the sign)
   * @return (a, b, score, round) — the matched pairs, tagged with the
   *         1-based round that accepted them
   */
  def greedyRounds(pairs: DataFrame, aCol: String, bCol: String,
      scoreCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds >= 1: $rounds")
    val spark = pairs.sparkSession
    var pool = pairs.select(col(aCol).as("a"), col(bCol).as("b"),
      col(scoreCol).cast("long").as("s"))
      .filter(col("s").isNotNull && col("s") =!= Long.MinValue)
      .localCheckpoint(true)
    var acc: Option[DataFrame] = None
    var r = 1
    while (r <= rounds) {
      // Left/right best under P = (score desc, partner asc): min(struct)
      // partial-aggregates map-side — a hot node ships one candidate per
      // partition, never its full pair list. Only the LONG score is
      // negated (min -s = max s, then min partner) — the partner column
      // is compared as-is, so string/any-orderable ids tie-break
      // correctly, matching greedyRoundsCapacitated's window ordering.
      val bestA = pool.groupBy(col("a"))
        .agg(min(struct((-col("s")).as("ns"), col("b"))).as("m"))
        .select(col("a"), (-col("m.ns")).as("s"), col("m.b").as("b"))
      val bestB = pool.groupBy(col("b"))
        .agg(min(struct((-col("s")).as("ns"), col("a"))).as("m"))
        .select(col("b"), (-col("m.ns")).as("s"), col("m.a").as("a"))
      val matched = bestA.join(bestB, Seq("a", "b", "s"))
        .withColumn("round", lit(r))
        .localCheckpoint(true)
      acc = Some(acc.fold(matched)(_ unionByName matched))
      val next = pool
        .join(matched.select(col("a")), Seq("a"), "left_anti")
        .join(matched.select(col("b")), Seq("b"), "left_anti")
        .select(col("a"), col("b"), col("s"))
        .localCheckpoint(true)
      CacheScope.unpinCheckpoint(pool)
      pool = next
      r += 1
    }
    CacheScope.unpinCheckpoint(pool)
    acc.get.select(col("a"), col("b"), col("s").as("score"), col("round"))
  }

  /**
   * CAPACITATED greedy matching (b-matching): each left node may hold up
   * to capA(a) partners and each right node up to capB(b) — the real
   * reconciliation shape (one master record absorbs many source rows,
   * one supplier serves many customers). The b-suitor generalization of
   * [[greedyRounds]] (Khan et al. 2016, Manne–Halappanavar): per round,
   * rank each node's REMAINING candidate list under P = (score desc,
   * partner asc) and accept every pair that sits within BOTH endpoints'
   * remaining capacity; decrement capacities by what was accepted, drop
   * saturated nodes' edges, repeat. Run to exhaustion this reproduces
   * the sequential capacity-greedy edge-for-edge (MatchingSpec proves it
   * on random capacitated tables with ties — the rank recomputation per
   * round is what makes the late "b was still free" greedy accepts come
   * back, so simultaneous acceptance stays exact).
   *
   * Per-round shape: two row_number windows PARTITIONED BY NODE over the
   * remaining pool (narrow — fan-in is a node's candidate-list length,
   * bounded by whatever blocking produced the pairs; cap hub lists
   * upstream if blocking can't), then ONE pool-state update (anti-join
   * shrink + two used-count joins) — capacities ride the pool rows, so
   * a round truncates exactly two frames (matched, pool), not four.
   *
   * @param capA (node, cap) for the left side — first column is the
   *             node key, `cap` the capacity; missing nodes default 1
   * @param capB same for the right side
   * @return (a, b, score, round)
   */
  def greedyRoundsCapacitated(pairs: DataFrame, aCol: String, bCol: String,
      scoreCol: String, capA: DataFrame, capB: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds >= 1: $rounds")
    def capFrame(c: DataFrame, node: String): DataFrame =
      c.select(col(c.columns.head).as(node),
        col("cap").cast("long").as(s"cap_$node"))
    // Null-score rows dropped for the same reason as [[greedyRounds]]
    // (here the rank windows would sort them LAST, not first — but a
    // pair with no score is not a candidate under either formulation,
    // and the two operators must agree on the pool).
    // Capacity state RIDES THE POOL ROWS (round 15): every row of node a
    // carries a's remaining cap_a (same for b), so a round is two window
    // ranks + one anti-join + two used-count joins folded into ONE
    // checkpointed state update — the old remA/remB side frames cost two
    // extra eager checkpoints and two extra joins per round for the same
    // numbers (all rows of a node update identically, so the replicated
    // capacity is exactly the side frame's value at every round;
    // MatchingSpec's sequential-equivalence rows pin the output).
    // Missing cap entries default 1, resolved ONCE here — the per-round
    // decrements then reach every row, no coalesce-at-join refill.
    var pool = pairs.select(col(aCol).as("a"), col(bCol).as("b"),
      col(scoreCol).cast("long").as("s"))
      .filter(col("s").isNotNull && col("s") =!= Long.MinValue)
      .join(capFrame(capA, "a"), Seq("a"), "left")
      .join(capFrame(capB, "b"), Seq("b"), "left")
      .na.fill(1L, Seq("cap_a", "cap_b"))
      .localCheckpoint(true)
    var acc: Option[DataFrame] = None
    var r = 1
    while (r <= rounds) {
      val wa = Window.partitionBy(col("a")).orderBy(col("s").desc, col("b"))
      val wb = Window.partitionBy(col("b")).orderBy(col("s").desc, col("a"))
      val ranked = pool
        .filter(col("cap_a") > 0 && col("cap_b") > 0)
        .withColumn("rna", row_number().over(wa))
        .withColumn("rnb", row_number().over(wb))
      val matched = ranked
        .filter(col("rna") <= col("cap_a") && col("rnb") <= col("cap_b"))
        .select(col("a"), col("b"), col("s"))
        .withColumn("round", lit(r))
        .localCheckpoint(true)
      acc = Some(acc.fold(matched)(_ unionByName matched))
      val usedA = matched.groupBy(col("a")).agg(count(lit(1)).as("used_a"))
      val usedB = matched.groupBy(col("b")).agg(count(lit(1)).as("used_b"))
      val nextPool = pool
        .join(matched.select(col("a"), col("b")), Seq("a", "b"), "left_anti")
        .join(usedA, Seq("a"), "left")
        .join(usedB, Seq("b"), "left")
        .select(col("a"), col("b"), col("s"),
          (col("cap_a") - coalesce(col("used_a"), lit(0L))).as("cap_a"),
          (col("cap_b") - coalesce(col("used_b"), lit(0L))).as("cap_b"))
        .localCheckpoint(true)
      CacheScope.unpinCheckpoint(pool)
      pool = nextPool
      r += 1
    }
    CacheScope.unpinCheckpoint(pool)
    acc.get.select(col("a"), col("b"), col("s").as("score"), col("round"))
  }
}
