package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Butterflies

/**
 * Butterfly counting (q223) vs a sequential reference on random
 * bipartite graphs: exact (shared, butterflies) per left pair, the
 * global-total identity Σ C(shared, 2) == brute-force 2×2 biclique
 * enumeration, absence of share-nothing pairs, and multi-edge
 * dedup invariance.
 */
class ButterfliesSpec extends SparkSpec {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Long)] = {
    val e = edges.distinct
    val byRight = e.groupBy(_._2).values
    val sharedCounts = scala.collection.mutable.Map
      .empty[(Long, Long), Long].withDefaultValue(0L)
    for (grp <- byRight; Seq(x, y) <- grp.map(_._1).distinct.sorted.combinations(2))
      sharedCounts((x, y)) += 1
    sharedCounts.map { case (k, w) => k -> ((w, w * (w - 1) / 2)) }.toMap
  }

  /** Brute 2×2 biclique count: unordered left pairs × unordered right
    * pairs with all four edges present. */
  private def bruteTotal(edges: Seq[(Long, Long)]): Long = {
    val es = edges.distinct.toSet
    val lefts = es.map(_._1).toSeq.sorted
    val rights = es.map(_._2).toSeq.sorted
    (for {
      Seq(a, b) <- lefts.combinations(2)
      Seq(x, y) <- rights.combinations(2)
      if es((a, x)) && es((a, y)) && es((b, x)) && es((b, y))
    } yield 1L).sum
  }

  test("matches the sequential reference; total == brute biclique count") {
    for (seed <- 1 to 3) {
      val rng = new Random(seed)
      val edges = (1 to 80).map(_ =>
        (rng.nextInt(8).toLong, 100L + rng.nextInt(6)))
      val got = Butterflies.pairCounts(edges.toDF("src", "dst"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(got === reference(edges), s"seed=$seed")
      assert(got.values.map(_._2).sum === bruteTotal(edges), s"seed=$seed")
      // every reported pair shares at least one right node
      assert(got.values.forall(_._1 >= 1))
    }
  }

  test("multi-edges don't inflate counts; disjoint stars yield none") {
    val dup = Seq((1L, 10L), (1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L))
    val got = Butterflies.pairCounts(dup.toDF("src", "dst")).collect()
    assert(got.length === 1)
    assert((got.head.getLong(2), got.head.getLong(3)) === ((2L, 1L)))
    // two left nodes with no common right neighbor: no row at all
    val stars = Seq((1L, 10L), (1L, 11L), (2L, 12L), (2L, 13L))
    assert(Butterflies.pairCounts(stars.toDF("src", "dst")).count() === 0L)
  }
}
