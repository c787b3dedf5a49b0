package graft

import scala.util.Random

import graft.operators.GraphOps

/**
 * GraphOps.degreeCapped vs a sequential reference on random graphs:
 * the kept-node set (undirected degree ≤ cap on the deduped canonical
 * graph), the induced-edge rule (both endpoints kept), canonical
 * output, and the hub fixture the guard exists for.
 */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], cap: Int): Set[(Long, Long)] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(x => x._1 < x._2).distinct
    val deg = canon.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    canon.filter(e => deg(e._1) <= cap && deg(e._2) <= cap).toSet
  }

  private def run(edges: Seq[(Long, Long)], cap: Int): Set[(Long, Long)] =
    GraphOps.degreeCapped(edges.toDF("src", "dst"), cap)
      .as[(Long, Long)].collect().toSet

  test("random graphs x caps == sequential reference") {
    val rnd = new Random(7)
    for (trial <- 1 to 5; cap <- Seq(0, 1, 2, 4, 8)) {
      val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      assert(run(edges, cap) === reference(edges, cap),
        s"trial $trial cap $cap")
    }
  }

  test("canonicalization: reversed duplicates and self-loops don't count") {
    // (1,2) in both orientations + twice = ONE undirected edge; the
    // self-loop at 3 contributes no degree.
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L))
    // degree(2) = 2 in the deduped graph (NOT 4), so cap 1 drops both
    // of node 2's edges — and cap 2 keeps everything real.
    assert(run(edges, 1) === Set.empty[(Long, Long)])
    assert(run(edges, 2) === Set((1L, 2L), (2L, 3L)))
  }

  test("hub fixture: the guard removes the quadratic wedge mass") {
    // star of 50 spokes through hub 0, plus a 3-cycle among 100..102
    val star = (1L to 50L).map(i => (0L, i))
    val cycle = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val got = run(star ++ cycle, 3)
    assert(got === cycle.toSet)
  }

  test("works on string-named nodes (q214's entity names)") {
    val edges = Seq(("ana", "bob"), ("bob", "ana"), ("bob", "cyd"))
    val got = GraphOps.degreeCapped(edges.toDF("src", "dst"), 2)
      .as[(String, String)].collect().toSet
    assert(got === Set(("ana", "bob"), ("bob", "cyd")))
    val capped1 = GraphOps.degreeCapped(edges.toDF("src", "dst"), 1)
      .as[(String, String)].collect().toSet
    assert(capped1 === Set.empty[(String, String)]) // bob (deg 2) severs both
  }

  test("guard is idempotent: capping twice == capping once") {
    val rnd = new Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val once = run(edges, 3)
    val twice = GraphOps.degreeCapped(
      GraphOps.degreeCapped(edges.toDF("src", "dst"), 3), 3, "s", "d")
      .as[(Long, Long)].collect().toSet
    assert(twice === once)
  }
}
