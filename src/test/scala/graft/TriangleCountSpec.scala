package graft

import scala.util.Random

import graft.operators.TriangleCount

class TriangleCountSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: canonical a<b<c triple enumeration. */
  private def refCounts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TriangleCount.perNode(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every node in exactly three") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val got = run(k4)
    assert(got == (0L to 3L).map(_ -> 3L).toMap)
  }

  test("star graph is triangle-free: empty output") {
    val star = (1L to 6L).map(l => (0L, l))
    assert(run(star).isEmpty)
  }

  test("duplicate, reversed, and self-loop edges collapse before counting") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = tri ++ tri.map(_.swap) ++ tri ++ Seq((2L, 2L))
    assert(run(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("degree-ordered enumeration matches the naive reference on random graphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 12 + trial * 3
      val edges = Seq.fill(n * 4)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val expected = refCounts(edges)
      val got = run(edges)
      assert(got == expected, s"trial $trial: $got != $expected")
    }
  }

  test("power-law degree skew: hub-heavy random graphs match the reference") {
    // Endpoints drawn as floor(n^u) with u uniform — a Zipf-like marginal
    // where node 0 lands in a large fraction of the edges: the "last
    // reducer" shape the degree-ordered orientation exists for (VERDICT
    // r7 #4). Uniform trials above barely exercise orientation because
    // degrees concentrate; here the hubs' wedges MUST be charged to their
    // low-degree corners or the counts diverge from the reference.
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      def node(): Long =
        math.max(0L, math.min(n - 1L,
          math.pow(n.toDouble, rnd.nextDouble()).toLong - 1L))
      val edges = Seq.fill(n * 6)((node(), node()))
      val hubDeg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).values.map(_.size).max
      assert(hubDeg > n / 2, s"generator lost its skew (hub degree $hubDeg)")
      assert(run(edges) == refCounts(edges), s"trial $trial")
    }
  }

  test("closing probe degrades to the partitioned equi-join past broadcastEdgeLimit") {
    val rnd = new Random(9)
    val n = 25
    val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val got = TriangleCount.perNode(edges.toDF("src", "dst"),
        broadcastEdgeLimit = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refCounts(edges))
  }
}
