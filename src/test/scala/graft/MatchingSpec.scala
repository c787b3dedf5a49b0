package graft

import scala.util.Random

import graft.operators.Matching

/**
 * Matching.greedyRounds vs the SEQUENTIAL greedy matching it claims to
 * reproduce: under the total order P = (score desc, a asc, b asc), the
 * locally-dominant-edge iteration run to exhaustion must equal greedy
 * EDGE-FOR-EDGE — including on tied scores, which the small score range
 * here forces constantly. Exhaustion needs at most min(|A|,|B|) rounds
 * (every round accepts at least the P-maximal remaining pair).
 */
class MatchingSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential greedy under P: sort, accept when both endpoints free. */
  private def refGreedy(pairs: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long)] = {
    val ma = scala.collection.mutable.Set.empty[Long]
    val mb = scala.collection.mutable.Set.empty[Long]
    pairs.sortBy { case (a, b, s) => (-s, a, b) }
      .flatMap { case (a, b, s) =>
        if (!ma(a) && !mb(b)) { ma += a; mb += b; Some((a, b, s)) }
        else None
      }.toSet
  }

  private def run(pairs: Seq[(Long, Long, Long)], rounds: Int)
      : Set[(Long, Long, Long)] =
    Matching.greedyRounds(pairs.toDF("a", "b", "s"), "a", "b", "s", rounds)
      .select("a", "b", "score")
      .as[(Long, Long, Long)].collect().toSet

  private def gen(seed: Int): Seq[(Long, Long, Long)] = {
    val r = new Random(seed)
    // 8 left × 8 right, ~60% density, scores 0..4 → heavy ties: the
    // P tie-breaks do real work on every seed.
    (for {
      a <- 0L until 8L; b <- 100L until 108L
      if r.nextInt(10) < 6
    } yield (a, b, r.nextInt(5).toLong)).toSeq
  }

  for (seed <- Seq(31, 32, 33, 34))
  test(s"rounds-to-exhaustion == sequential greedy (ties included), seed $seed") {
    val pairs = gen(seed)
    assert(run(pairs, rounds = 8) == refGreedy(pairs), s"seed $seed")
  }

  test("round tags reflect dominance depth on a chain") {
    // a1-b1(10) a2-b1(9) a2-b2(8) a3-b2(7): round 1 can only accept
    // (a1,b1) — (a2,b2) becomes dominant only after b1 leaves the pool.
    val chain = Seq((1L, 11L, 10L), (2L, 11L, 9L), (2L, 12L, 8L),
      (3L, 12L, 7L))
    val byRound = Matching.greedyRounds(chain.toDF("a", "b", "s"),
        "a", "b", "s", rounds = 3)
      .select("a", "b", "round")
      .as[(Long, Long, Int)].collect().toSet
    assert(byRound == Set((1L, 11L, 1), (2L, 12L, 2)))
    // and a single round really is the strict prefix
    assert(run(chain, rounds = 1) == Set((1L, 11L, 10L)))
  }

  test("one-to-one: no endpoint matched twice, even with duplicate scores") {
    val pairs = for { a <- 0L until 6L; b <- 50L until 56L }
      yield (a, b, 3L) // all tied: pure tie-break matching
    val got = run(pairs.toSeq, rounds = 6)
    assert(got.map(_._1).size == got.size && got.map(_._2).size == got.size)
    assert(got == refGreedy(pairs.toSeq))
    // all-tied greedy under P is the diagonal
    assert(got == (0L until 6L).map(i => (i, 50L + i, 3L)).toSet)
  }
}
