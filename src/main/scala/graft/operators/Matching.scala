package graft.operators

import org.apache.spark.sql.DataFrame
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
   *                 (a,b) rows must be pre-deduped by the caller
   * @return (a, b, score, round) — the matched pairs, tagged with the
   *         1-based round that accepted them
   */
  def greedyRounds(pairs: DataFrame, aCol: String, bCol: String,
      scoreCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds >= 1: $rounds")
    val spark = pairs.sparkSession
    var pool = pairs.select(col(aCol).as("a"), col(bCol).as("b"),
      col(scoreCol).cast("long").as("s")).localCheckpoint(true)
    var acc: Option[DataFrame] = None
    var r = 1
    while (r <= rounds) {
      // Left/right best under P = (score desc, partner asc): max(struct)
      // partial-aggregates map-side — a hot node ships one candidate per
      // partition, never its full pair list.
      val bestA = pool.groupBy(col("a"))
        .agg(max(struct(col("s"), (-col("b")).as("nb"))).as("m"))
        .select(col("a"), col("m.s").as("s"), (-col("m.nb")).as("b"))
      val bestB = pool.groupBy(col("b"))
        .agg(max(struct(col("s"), (-col("a")).as("na"))).as("m"))
        .select(col("b"), col("m.s").as("s"), (-col("m.na")).as("a"))
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
}
