package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Bfs

/**
 * Multi-source BFS (q138) vs a sequential reference on random directed
 * graphs: minimal hop counts, depth cap, unreached-node absence, and
 * isolated seeds (valid sources at hop 0 even with no edges).
 */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def referenceBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      maxHops: Int): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    var h = 1
    while (h <= maxHops && frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h)
      frontier = next
      h += 1
    }
    dist
  }

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Int] =
    Bfs.hopDistances(edges.toDF("src", "dst"), seeds.toDF("node_id"),
        maxHops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("matches the sequential reference on random directed graphs") {
    for (seed <- 1 to 4) {
      val r = new Random(seed)
      val n = 60
      val edges = Seq.fill(250)((r.nextInt(n).toLong, r.nextInt(n).toLong))
      val seeds = Seq.fill(3)(r.nextInt(n).toLong).distinct
      val maxHops = 1 + r.nextInt(5)
      assert(run(edges, seeds, maxHops)
        === referenceBfs(edges, seeds.toSet, maxHops),
        s"seed=$seed maxHops=$maxHops")
    }
  }

  test("depth cap: hop-(k+1) nodes are absent at maxHops=k") {
    // Path graph 1→2→3→4.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(edges, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(run(edges, Seq(1L), 10) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("direction respected; unreached and isolated nodes handled") {
    val edges = Seq((1L, 2L), (3L, 2L)) // 2 cannot reach anything
    assert(run(edges, Seq(2L), 4) === Map(2L -> 0))
    // A seed absent from the edge list is still a hop-0 row.
    assert(run(edges, Seq(99L), 4) === Map(99L -> 0))
  }

  test("duplicate seeds and multi-edges collapse; min distance wins") {
    val edges = Seq((1L, 3L), (1L, 3L), (2L, 3L), (3L, 4L), (1L, 4L))
    // 4 is reachable at hop 1 via 1→4 even though 3→4 would give hop 2.
    assert(run(edges, Seq(1L, 1L, 2L), 3) ===
      Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  private def runW(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] =
    Bfs.relaxDistances(edges.toDF("src", "dst", "w"),
        seeds.toDF("node_id"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Sequential ≤R-edge shortest distances. */
  private def referenceRelax(edges: Seq[(Long, Long, Long)],
      seeds: Set[Long], rounds: Int): Map[Long, Long] = {
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val cand = edges.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w))
      }.groupBy(_._1).map { case (v, g) => v -> g.map(_._2).min }
      dist = (dist.keySet ++ cand.keySet).map { v =>
        v -> math.min(dist.getOrElse(v, Long.MaxValue),
          cand.getOrElse(v, Long.MaxValue))
      }.toMap
    }
    dist
  }

  test("relaxDistances matches sequential Bellman-Ford on random graphs") {
    for (seed <- 1 to 3) {
      val r = new Random(10 + seed)
      val n = 40
      val edges = Seq.fill(160)((r.nextInt(n).toLong, r.nextInt(n).toLong,
        (1 + r.nextInt(9)).toLong))
      val seeds = Seq.fill(2)(r.nextInt(n).toLong).distinct
      val rounds = 1 + r.nextInt(4)
      assert(runW(edges, seeds, rounds)
        === referenceRelax(edges, seeds.toSet, rounds),
        s"seed=$seed rounds=$rounds")
    }
  }

  test("a cheap 2-hop path beats an expensive direct edge") {
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L))
    // One round can only see the direct edge; two rounds find the
    // 2-edge path — the case hop-count BFS cannot express.
    assert(runW(edges, Seq(1L), 1) === Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    assert(runW(edges, Seq(1L), 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
