package graft

import scala.util.Random

import graft.operators.KCore

/**
 * k-core peel (q156) vs a sequential peel-to-fixpoint reference on
 * random graphs (rounds budget generous enough to converge), plus the
 * classic pinned shapes: a clique survives its own k, a path peels
 * away entirely, and the cascade (removing a leaf drops its neighbor
 * below k next round).
 */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : (Map[Long, Long], Boolean) = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val rows = KCore.peel(sym.toDF("src", "dst"), k, rounds).collect()
    (rows.map(r => r.getLong(0) -> r.getLong(1)).toMap,
      rows.headOption.forall(_.getBoolean(2)))
  }

  private def reference(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var nodes = sym.map(_._1).toSet
    var changed = true
    while (changed) {
      val deg = sym.filter(e => nodes(e._1) && nodes(e._2))
        .groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
      val next = deg.filter(_._2 >= k).keySet
      changed = next != nodes
      nodes = next
    }
    sym.filter(e => nodes(e._1) && nodes(e._2))
      .groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
  }

  test("matches the sequential fixpoint reference on random graphs") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val edges = Seq.fill(150)(
        (r.nextInt(40).toLong, r.nextInt(40).toLong))
        .filter(e => e._1 != e._2).distinct
      val k = 2 + r.nextInt(3)
      val (got, converged) = run(edges, k, rounds = 40)
      assert(converged, s"seed=$seed must converge within budget")
      assert(got === reference(edges, k), s"seed=$seed k=$k")
    }
  }

  test("a K4 clique is its own 3-core; a path has no 2-core") {
    val clique = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val (core, conv) = run(clique, 3, 5)
    assert(conv && core === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val (none, conv2) = run(path, 2, 5)
    assert(conv2 && none.isEmpty)
  }

  test("cascade: peeling a leaf drags its neighbor out next round") {
    // Triangle 1-2-3 plus pendant 4-1: at k=2 node 4 peels round 1,
    // the triangle stays (each still has 2 in-core neighbors).
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    val (core, _) = run(g, 2, 5)
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // Chain of pendants 5-4-1 at k=2: 5 peels, then 4, triangle holds —
    // needs MORE than one round (the cascade), and an under-budgeted
    // peel reports converged=false.
    val g2 = g ++ Seq((4L, 5L))
    val (core2, conv2) = run(g2, 2, 5)
    assert(conv2 && core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val (_, convShort) = run(g2, 2, 1)
    assert(!convShort, "1-round budget cannot certify the cascade")
  }
}
