package graft

import scala.util.Random

import graft.operators.LabelPropagation

/**
 * Deterministic LPA (q123): known community structure, exact agreement
 * with a sequential synchronous reference on random graphs, and the
 * isolated-node / zero-iteration edges.
 */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential synchronous LPA with the same min-label tie-break. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val nbrs = sym.groupBy(_._2).map { case (d, g) => d -> g.map(_._1) }
    var labels = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = labels.map { case (n, l) =>
        nbrs.get(n) match {
          case Some(ns) if ns.nonEmpty =>
            val counts = ns.map(labels).groupBy(identity)
              .map { case (lab, g) => lab -> g.size }
            n -> counts.toSeq.minBy { case (lab, c) => (-c, lab) }._1
          case _ => n -> l
        }
      }
    }
    labels
  }

  private def runFull(edges: Seq[(Long, Long)], iters: Int): (Map[Long, Long], Boolean) = {
    val rows = LabelPropagation.run(edges.toDF("src", "dst"), iters).collect()
    (rows.map(r => r.getLong(0) -> r.getLong(1)).toMap,
      rows.headOption.forall(_.getBoolean(2)) && rows.nonEmpty)
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    runFull(edges, iters)._1

  test("two cliques bridged by one edge resolve to two communities") {
    val cliqueA = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val cliqueB = for (a <- 10L to 14L; b <- 10L to 14L if a < b) yield (a, b)
    val edges = cliqueA ++ cliqueB :+ (4L -> 10L)
    val got = run(edges, 4)
    // Each clique converges to its min label (0 and 10); the single
    // bridge can't outvote 4 same-community neighbors.
    assert((0L to 4L).map(got).toSet === Set(0L))
    assert((10L to 14L).map(got).toSet === Set(10L))
  }

  test("matches the sequential synchronous reference on random graphs") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val edges = (1 to 120).map(_ =>
        (r.nextInt(30).toLong, r.nextInt(30).toLong))
        .filter { case (a, b) => a != b }.distinct
      assert(run(edges, 3) === reference(edges, 3), s"seed=$seed")
    }
  }

  test("zero iterations returns identity labels, flagged unconverged") {
    val (got, conv) = runFull(Seq((1L, 2L), (2L, 3L)), 0)
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(!conv) // nothing was verified — a budget of 0 can't attest
  }

  test("converged flag == (labels stop changing within the budget)") {
    // The flag must agree with the sequential reference's fixed-point
    // test labels(iters) == labels(iters-1) — the oracle's mirror.
    for (seed <- 1 to 3; iters <- Seq(1, 3, 6)) {
      val r = new Random(100 + seed)
      val edges = (1 to 80).map(_ =>
        (r.nextInt(20).toLong, r.nextInt(20).toLong))
        .filter { case (a, b) => a != b }.distinct
      val (got, conv) = runFull(edges, iters)
      val want = reference(edges, iters)
      assert(got === want, s"seed=$seed iters=$iters")
      assert(conv === (want === reference(edges, iters - 1)),
        s"flag seed=$seed iters=$iters")
    }
  }

  test("early exit: a generous budget returns the fixed point, converged") {
    // Two bridged cliques stabilize in ~2 rounds; a 25-round budget
    // must early-exit to the SAME output the full unroll would give.
    val cliqueA = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val cliqueB = for (a <- 10L to 14L; b <- 10L to 14L if a < b) yield (a, b)
    val edges = cliqueA ++ cliqueB :+ (4L -> 10L)
    val (got, conv) = runFull(edges, 25)
    assert(conv)
    assert(got === reference(edges, 25))
  }

  // ---- weighted face (q230): votes weighted by summed edge weight.

  private def referenceW(edges: Seq[(Long, Long, Long)],
      iters: Int): Map[Long, Long] = {
    // symmetrize + sum weight per directed pair, then weighted votes
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b) -> w, (b, a) -> w) }
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val nbrs = sym.keys.toSeq.groupBy(_._2)
      .map { case (d, g) => d -> g.map(_._1) }
    var labels = sym.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct
      .map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = labels.map { case (n, l) =>
        nbrs.get(n) match {
          case Some(ns) if ns.nonEmpty =>
            val votes = ns.groupBy(labels).map { case (lab, g) =>
              lab -> g.map(u => sym((u, n))).sum }
            n -> votes.toSeq.minBy { case (lab, c) => (-c, lab) }._1
          case _ => n -> l
        }
      }
    }
    labels
  }

  private def runW(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("src", "dst", "w"), iters, Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted matches the sequential weighted reference") {
    for (seed <- 1 to 3) {
      val r = new Random(200 + seed)
      val edges = (1 to 90).map(_ => (r.nextInt(18).toLong,
        r.nextInt(18).toLong, (r.nextInt(6) + 1).toLong))
        .filter { case (a, b, _) => a != b }
      assert(runW(edges, 3) === referenceW(edges, 3), s"seed=$seed")
    }
  }

  test("weighted with w == 1 on canonical unique edges equals unweighted") {
    // canonical (a < b, one orientation) — under the weighted sum-merge
    // convention an edge listed in BOTH orientations is a repeat and
    // doubles its weight, so only the canonical form is the identity.
    val r = new Random(77)
    val edges = (1 to 60)
      .map(_ => (r.nextInt(15).toLong, r.nextInt(15).toLong))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    assert(runW(edges.map(e => (e._1, e._2, 1L)), 3) === run(edges, 3))
  }

  test("a heavy lane outvotes more numerous light lanes") {
    // node 9 has light edges to clique {0..2} (labels converge to 0)
    // and ONE heavy edge to node 5: unweighted joins the clique (3
    // votes vs 1), weighted follows the heavy lane (3 vs 10).
    val light = Seq((9L, 0L, 1L), (9L, 1L, 1L), (9L, 2L, 1L))
    val clique = Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L))
    val heavy = Seq((9L, 5L, 10L), (5L, 6L, 10L), (6L, 5L, 10L))
    val got = runW(light ++ clique ++ heavy, 1)
    assert(got(9L) === 5L) // weighted: the 10-weight lane wins
    val unw = run((light ++ clique ++ heavy).map(e => (e._1, e._2)), 1)
    assert(unw(9L) === 0L) // unweighted: three light votes win
  }

  test("truncated budget on a drifting path graph flags unconverged") {
    // On a path, synchronous min-label voting keeps shifting labels for
    // several rounds — one round cannot be a fixed point.
    val path = (0L until 9L).map(i => (i, i + 1))
    val (got, conv) = runFull(path, 1)
    assert(!conv)
    assert(got === reference(path, 1))
  }
}
