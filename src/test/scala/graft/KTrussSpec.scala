package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.KTruss

/**
 * k-truss peeling (q217) vs a sequential round-for-round reference on
 * random graphs: exact (edge, support) sets and the converged flag,
 * plus structural cases — a clique core surviving while pendant spokes
 * peel, the k=2 identity, and a triangle strip that unravels over
 * multiple rounds (cascade + budget-exhausted flag).
 */
class KTrussSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential replay of the operator's fixed-round contract. */
  private def referenceTruss(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): (Set[(Long, Long, Long)], Boolean) = {
    var cur = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 < e._2).distinct
    var scored = cur.map(e => (e._1, e._2, 0L))
    var converged = false
    var round = 0
    while (round < rounds && !converged) {
      val es = cur.toSet
      val nodes = es.flatMap(e => Seq(e._1, e._2))
      def sup(e: (Long, Long)): Long = nodes.count { w =>
        w != e._1 && w != e._2 &&
          es.contains((math.min(e._1, w), math.max(e._1, w))) &&
          es.contains((math.min(e._2, w), math.max(e._2, w)))
      }.toLong
      scored = cur.map(e => (e._1, e._2, sup(e)))
      val next = scored.filter(_._3 >= k - 2).map(t => (t._1, t._2))
      converged = next.size == cur.size
      cur = next
      round += 1
    }
    val keep = cur.toSet
    (scored.filter(t => keep.contains((t._1, t._2))).toSet, converged)
  }

  private def run(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): (Set[(Long, Long, Long)], Boolean) = {
    val rows = KTruss.peel(edges.toDF("src", "dst"), k, rounds).collect()
    (rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      rows.headOption.forall(_.getBoolean(3)))
  }

  test("matches the sequential reference on random graphs") {
    for (seed <- 1 to 3; k <- Seq(3, 4)) {
      val rng = new Random(seed * 10 + k)
      val edges = (1 to 70).map(_ =>
        (rng.nextInt(14).toLong, rng.nextInt(14).toLong))
      val (refEdges, refConv) = referenceTruss(edges, k, 4)
      val (gotEdges, gotConv) = run(edges, k, 4)
      assert(gotEdges === refEdges, s"seed=$seed k=$k")
      if (refEdges.nonEmpty) assert(gotConv === refConv, s"seed=$seed k=$k")
    }
  }

  test("clique core survives while pendant spokes peel") {
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val spokes = Seq((0L, 10L), (10L, 11L), (4L, 12L))
    val (got, conv) = run(clique ++ spokes, 5, 5)
    assert(got === clique.map(e => (e._1, e._2, 3L)).toSet)
    assert(conv)
  }

  test("k=2 keeps every canonical edge and converges in one round") {
    val rng = new Random(9)
    val edges = (1 to 40).map(_ =>
      (rng.nextInt(10).toLong, rng.nextInt(10).toLong))
    val canonical = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .filter(e => e._1 < e._2).distinct
    val (got, conv) = run(edges, 2, 1)
    assert(got.map(t => (t._1, t._2)) === canonical.toSet)
    assert(conv)
  }

  test("triangle strip unravels over multiple rounds; flag tracks budget") {
    // strip 0-1-2-3-4: only the two shared edges have support 2; peeling
    // them breaks their triangles, so the strip empties over 3 rounds.
    // A disjoint K4 (every edge in exactly 2 triangles) survives the
    // 4-truss forever and keeps the converged flag observable.
    val strip = Seq((0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L))
    val k4 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val k4Scored = k4.map(e => (e._1, e._2, 2L)).toSet
    val (after2, conv2) = run(strip ++ k4, 4, 2)
    assert(after2 === k4Scored) // strip's survivors of round 1 peel in 2
    assert(!conv2) // round 2 still removed edges: budget exhausted
    val (after3, conv3) = run(strip ++ k4, 4, 3)
    assert(after3 === k4Scored && conv3)
    assert(referenceTruss(strip, 4, 3) === ((Set.empty, true)))
  }
}
