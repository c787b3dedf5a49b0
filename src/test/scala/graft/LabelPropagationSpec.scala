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

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

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

  test("zero iterations returns identity labels") {
    val got = run(Seq((1L, 2L), (2L, 3L)), 0)
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
