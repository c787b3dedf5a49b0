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

  test("null scores are dropped from the pool, never winning as 'best' (ADVICE r9)") {
    // Under the min(struct(-s, b)) rewrite a null score would sort FIRST
    // and beat every real candidate; the pool filter must drop it in
    // BOTH matchers instead.
    val pairs = Seq((1L, Some(10L), 11L), (1L, None, 12L), (2L, None, 12L))
      .map { case (a, s, b) => (a, b, s) }
      .toDF("a", "b", "s")
    val got = Matching.greedyRounds(pairs, "a", "b", "s", rounds = 2)
      .select("a", "b", "score").as[(Long, Long, Long)].collect().toSet
    // node 1's only real candidate wins; node 2 (null-only) matches nothing
    assert(got == Set((1L, 11L, 10L)))
    val gotCap = Matching.greedyRoundsCapacitated(pairs, "a", "b", "s",
        Seq((1L, 1L)).toDF("a", "cap"), Seq((11L, 1L)).toDF("b", "cap"),
        rounds = 2)
      .select("a", "b", "score").as[(Long, Long, Long)].collect().toSet
    assert(gotCap == Set((1L, 11L, 10L)))
  }

  /** Sequential capacity-greedy under P: sort, accept while both
    * endpoints hold remaining capacity. */
  private def refGreedyCap(pairs: Seq[(Long, Long, Long)],
      capA: Map[Long, Long], capB: Map[Long, Long])
      : Set[(Long, Long, Long)] = {
    val ra = scala.collection.mutable.Map[Long, Long]()
      .withDefault(capA.getOrElse(_, 1L))
    val rb = scala.collection.mutable.Map[Long, Long]()
      .withDefault(capB.getOrElse(_, 1L))
    pairs.sortBy { case (a, b, s) => (-s, a, b) }
      .flatMap { case (a, b, s) =>
        if (ra(a) > 0 && rb(b) > 0) {
          ra(a) = ra(a) - 1; rb(b) = rb(b) - 1; Some((a, b, s))
        } else None
      }.toSet
  }

  private def runCap(pairs: Seq[(Long, Long, Long)],
      capA: Map[Long, Long], capB: Map[Long, Long], rounds: Int)
      : Set[(Long, Long, Long)] =
    Matching.greedyRoundsCapacitated(pairs.toDF("a", "b", "s"), "a", "b",
        "s", capA.toSeq.toDF("a", "cap"), capB.toSeq.toDF("b", "cap"),
        rounds)
      .select("a", "b", "score").as[(Long, Long, Long)].collect().toSet

  for (seed <- Seq(51, 52))
  test(s"capacitated rounds-to-exhaustion == sequential capacity greedy, seed $seed") {
    val r = new Random(seed)
    val pairs = (for {
      a <- 0L until 6L; b <- 100L until 106L if r.nextInt(10) < 6
    } yield (a, b, r.nextInt(4).toLong)).toSeq
    val capA = (0L until 6L).map(a => a -> (1L + r.nextInt(2))).toMap
    val capB = (100L until 106L).map(b => b -> (1L + r.nextInt(3))).toMap
    assert(runCap(pairs, capA, capB, rounds = 12) ==
      refGreedyCap(pairs, capA, capB), s"seed $seed")
  }

  test("capacitated: the late 'partner was still free' greedy accept comes back") {
    // h=(4,105,30) takes a4; g=(4,101,20) then dies on a4's capacity,
    // NOT on b101's — so greedy still accepts e1=(1,101,10) later. The
    // per-round rank recomputation must reproduce that: e1 is rnb=2 in
    // round 1 (behind g) and only clears after g leaves with a4.
    val pairs = Seq((4L, 105L, 30L), (4L, 101L, 20L), (1L, 101L, 10L))
    val caps = Map(4L -> 1L, 1L -> 1L)
    val capB = Map(105L -> 1L, 101L -> 1L)
    val byRound = Matching.greedyRoundsCapacitated(
        pairs.toDF("a", "b", "s"), "a", "b", "s",
        caps.toSeq.toDF("a", "cap"), capB.toSeq.toDF("b", "cap"),
        rounds = 3)
      .select("a", "b", "round").as[(Long, Long, Int)].collect().toSet
    assert(byRound == Set((4L, 105L, 1), (1L, 101L, 2)))
  }

  test("string ids: tie-breaks order lexicographically, no silent null degrade") {
    // Pre-fix, the (-col) tie-break cast string ids to null and the
    // "smaller partner" guarantee silently vanished. All scores tied →
    // the match IS the tie-break.
    val pairs = Seq(("ax", "bz", 3L), ("ax", "by", 3L),
      ("aw", "by", 3L), ("aw", "bx", 3L))
    val got = Matching.greedyRounds(pairs.toDF("a", "b", "s"),
        "a", "b", "s", rounds = 4)
      .select("a", "b", "score").as[(String, String, Long)].collect().toSet
    // Sequential greedy under (score desc, a asc, b asc):
    // (aw,bx) first, then (ax,by).
    assert(got == Set(("aw", "bx", 3L), ("ax", "by", 3L)))
  }

  for (seed <- Seq(61, 62, 63))
  test(s"capacitated fixed rounds are a prefix of the exhaustion matching, seed $seed") {
    // The scaladoc's claim: stopping at r rounds yields exactly the
    // pairs the exhaustion run accepts in its first r rounds.
    val r = new Random(seed)
    val pairs = (for {
      a <- 0L until 6L; b <- 100L until 106L if r.nextInt(10) < 6
    } yield (a, b, r.nextInt(4).toLong)).toSeq
    val capA = (0L until 6L).map(a => a -> (1L + r.nextInt(2))).toMap
    val capB = (100L until 106L).map(b => b -> (1L + r.nextInt(3))).toMap
    def capDf = (capA.toSeq.toDF("a", "cap"), capB.toSeq.toDF("b", "cap"))
    val exhaustion = Matching.greedyRoundsCapacitated(
        pairs.toDF("a", "b", "s"), "a", "b", "s",
        capDf._1, capDf._2, rounds = 12)
      .select("a", "b", "score", "round")
      .as[(Long, Long, Long, Int)].collect().toSet
    for (rr <- 1 to 3) {
      val fixed = Matching.greedyRoundsCapacitated(
          pairs.toDF("a", "b", "s"), "a", "b", "s",
          capDf._1, capDf._2, rounds = rr)
        .select("a", "b", "score", "round")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(fixed == exhaustion.filter(_._4 <= rr),
        s"seed $seed rounds $rr: fixed-round output must be the exhaustion prefix")
    }
  }

  test("capacitated with all capacities 1 == the one-to-one matcher") {
    val r = new Random(53)
    val pairs = (for {
      a <- 0L until 7L; b <- 50L until 57L if r.nextInt(10) < 5
    } yield (a, b, r.nextInt(5).toLong)).toSeq
    val ones = (0L until 7L).map(_ -> 1L).toMap
    val onesB = (50L until 57L).map(_ -> 1L).toMap
    assert(runCap(pairs, ones, onesB, rounds = 7) ==
      run(pairs, rounds = 7))
  }
}
