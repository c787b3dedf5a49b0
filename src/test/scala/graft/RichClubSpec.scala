package graft

import scala.util.Random

import graft.operators.RichClub

/**
 * Rich-club coefficients (q224) vs a sequential reference on random
 * graphs: exact (n_k, e_k, phi_num, phi_den) per threshold, the k=0
 * identity (every non-isolated node, every edge), above-max-degree
 * emptiness (0/0 rows present), and a hub-clique construction whose
 * top club is exactly the clique (φ = 1 as phi_num == phi_den).
 */
class RichClubSpec extends SparkSpec {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)],
      ks: Seq[Int]): Map[Int, (Long, Long, Long, Long)] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(x => x._1 < x._2).distinct
    val deg = e.flatMap(x => Seq(x._1, x._2)).groupBy(identity)
      .map { case (n, g) => n -> g.size.toLong }
    ks.map { k =>
      val club = deg.filter(_._2 > k).keySet
      val nk = club.size.toLong
      val ek = e.count(x => club(x._1) && club(x._2)).toLong
      k -> ((nk, ek, 2 * ek, nk * (nk - 1)))
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)],
      ks: Seq[Int]): Map[Int, (Long, Long, Long, Long)] =
    RichClub.coefficients(edges.toDF("src", "dst"), ks)
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("matches the sequential reference; k=0 covers everything") {
    for (seed <- 1 to 3) {
      val rng = new Random(seed)
      val edges = (1 to 60).map(_ =>
        (rng.nextInt(12).toLong, rng.nextInt(12).toLong))
      val ks = Seq(0, 1, 2, 4, 8, 64)
      val got = run(edges, ks)
      assert(got === reference(edges, ks), s"seed=$seed")
      val canonical = edges.map(x => (math.min(x._1, x._2), math.max(x._1, x._2)))
        .filter(x => x._1 < x._2).distinct
      val nodes = canonical.flatMap(x => Seq(x._1, x._2)).distinct
      assert(got(0)._1 === nodes.size.toLong) // every non-isolated node
      assert(got(0)._2 === canonical.size.toLong) // every edge
      assert(got(64) === ((0L, 0L, 0L, 0L))) // above max degree: 0/0 row
    }
  }

  test("a hub clique is its own top club with phi = 1") {
    // K4 on 0-3 (deg >= 3 each) plus pendant spokes raising hub degree
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val spokes = Seq((0L, 10L), (1L, 11L), (2L, 12L), (3L, 13L))
    val got = run(k4 ++ spokes, Seq(3))
    // club at k=3: exactly the four hubs (deg 4); edges among them: the K4
    assert(got(3)._1 === 4L && got(3)._2 === 6L)
    assert(got(3)._3 === got(3)._4) // phi_num == phi_den: phi = 1
  }
}
