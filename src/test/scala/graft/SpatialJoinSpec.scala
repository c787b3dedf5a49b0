package graft

import scala.util.Random

import graft.operators.SpatialJoin

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(pts: Seq[(Long, Long, Long)],
      bxs: Seq[(Long, Long, Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (id, x, y) <- pts
      (bid, x0, x1, y0, y1) <- bxs
      if x >= x0 && x <= x1 && y >= y0 && y <= y1
    } yield (id, bid)).toSet

  private def run(pts: Seq[(Long, Long, Long)],
      bxs: Seq[(Long, Long, Long, Long, Long)], cell: Long): Seq[(Long, Long)] =
    SpatialJoin.pointsInBoxes(
      pts.toDF("id", "x", "y"),
      bxs.toDF("box_id", "x_min", "x_max", "y_min", "y_max"), cell)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("boundary inclusivity: corners and edges match") {
    val bxs = Seq((1L, 0L, 10L, 0L, 10L))
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 10L), (3L, 0L, 10L),
      (4L, 11L, 5L), (5L, 5L, -1L))
    assert(run(pts, bxs, 4).toSet == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("each true pair appears exactly once, even when a box spans many cells") {
    val bxs = Seq((1L, -100L, 100L, -100L, 100L)) // spans many 7-cells
    val pts = Seq((1L, 0L, 0L), (2L, -100L, 100L), (3L, 101L, 0L))
    val got = run(pts, bxs, 7)
    assert(got.sorted == Seq((1L, 1L), (2L, 1L))) // no duplicates
  }

  test("matches the naive cross-filter on random data with negative coords") {
    val rnd = new Random(17)
    for (trial <- 1 to 4) {
      val pts = Seq.tabulate(300)(i =>
        (i.toLong, rnd.nextLong(2000) - 1000, rnd.nextLong(2000) - 1000))
      val bxs = Seq.tabulate(60) { i =>
        val x0 = rnd.nextLong(1800) - 900; val y0 = rnd.nextLong(1800) - 900
        (i.toLong, x0, x0 + rnd.nextLong(300), y0, y0 + rnd.nextLong(300))
      }
      val cell = Seq(50L, 130L, 500L)(trial % 3)
      assert(run(pts, bxs, cell).toSet == naive(pts, bxs),
        s"trial $trial cell $cell")
      assert(run(pts, bxs, cell).size == naive(pts, bxs).size,
        s"trial $trial duplicate pairs")
    }
  }
}
