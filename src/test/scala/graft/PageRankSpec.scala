package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L

  test("iterations=0 returns the uniform initial rank for every endpoint") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = PageRank.run(edges, iterations = 0).collect()
    assert(r.length == 3)
    assert(r.forall(_.getLong(1) == S))
  }

  test("symmetric star: center outranks leaves, leaves tie exactly") {
    // 1 center (id 0), 4 leaves — symmetrized.
    val pairs = (1L to 4L).map(l => (0L, l))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val m = PageRank.run(edges, iterations = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val leaves = (1L to 4L).map(m)
    assert(leaves.distinct.size == 1, s"leaves must tie exactly: $leaves")
    assert(m(0L) > leaves.head * 2,
      s"center ${m(0L)} should clearly outrank a leaf ${leaves.head}")
  }

  test("total mass is conserved up to floor rounding (no dangling)") {
    // Random-ish fixed graph, symmetrized: mass ≈ N·S, short only by the
    // accumulated floor truncations (each node loses < 2 units/iteration
    // from the two divs, plus < outdeg units at the contrib split).
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = (base ++ base.map(p => (p._2, p._1))).toDF("src", "dst")
    val total = PageRank.run(edges, iterations = 5)
      .agg(sum("rank")).as[Long].head()
    val n = 4L
    assert(total <= n * S)
    assert(total > n * S - 5 * n * 100,
      s"mass $total leaked more than floor rounding allows (${n * S})")
  }

  test("dangling mass is redistributed: directed chain keeps total mass") {
    // 1→2→3, node 3 dangling. Without redistribution the sink's mass
    // would vanish each round and totals would collapse toward base/N.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rows = PageRank.run(edges, iterations = 20)
    val total = rows.agg(sum("rank")).as[Long].head()
    assert(total > 3 * S * 95 / 100,
      s"dangling redistribution should hold total near 3·S, got $total")
    // Downstream accumulates: rank(3) > rank(2) > rank(1).
    val m = rows.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(3L) > m(2L) && m(2L) > m(1L), s"chain order violated: $m")
  }

  test("duplicate (src,dst) rows count as parallel edges, deterministically") {
    val once = PageRank.run(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), iterations = 3).collect()
    val dup = PageRank.run(
      Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 1L)).toDF("src", "dst"),
      iterations = 3).collect()
    // Doubling every multiplicity scales contrib numerator and outdeg
    // equally — identical ranks (documents the multigraph semantics).
    assert(once.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      dup.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  test("personalized: mass stays in the seed component; seeds dominate") {
    // Two disjoint symmetric triangles {0,1,2} and {10,11,12}; seeds in
    // the first: every node of the second component must hold rank 0,
    // and the seed itself must outrank its non-seed neighbors.
    def tri(base: Long) = Seq((base, base + 1), (base + 1, base + 2),
      (base, base + 2))
    val und = tri(0L) ++ tri(10L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node_id")
    val m = PageRank.personalized(edges, seeds, iterations = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L).forall(m(_) == 0L),
      s"other component leaked mass: $m")
    assert(m(0L) > m(1L) && m(1L) == m(2L),
      s"seed must dominate, symmetric neighbors must tie: $m")
    assert(Seq(0L, 1L, 2L).map(m).sum > 0)
  }

  test("personalized with seeds = all nodes equals global PageRank") {
    val pairs = (1L to 4L).map(l => (0L, l))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val all = (0L to 4L).toDF("node_id")
    val g = PageRank.run(edges, iterations = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p = PageRank.personalized(edges, all, iterations = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p == g, "seeding every node must reduce to global PageRank")
  }

  test("personalized ignores out-of-graph seeds (teleport divisor unchanged)") {
    val pairs = (1L to 4L).map(l => (0L, l))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val in = PageRank.personalized(edges, Seq(0L).toDF("node_id"),
      iterations = 6).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mixed = PageRank.personalized(edges,
      Seq(0L, 99999L, -7L).toDF("node_id"), iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mixed == in,
      "seeds absent from the node set must not dilute the restart mass")
    val e = intercept[IllegalArgumentException] {
      PageRank.personalized(edges, Seq(77777L).toDF("node_id"),
        iterations = 2).collect()
    }
    assert(e.getMessage.contains("intersect the graph"))
  }
}
