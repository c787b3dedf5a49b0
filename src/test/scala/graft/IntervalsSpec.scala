package graft

import scala.util.Random

import graft.operators.Intervals

/**
 * Rolling distinct-actives (q142) vs the definitional brute force on
 * random activity sets, plus the island-boundary edges: gap exactly W
 * merges, gap W+1 splits, and a single activity covers exactly W starts.
 */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], w: Int): Map[Long, Long] =
    Intervals.rollingDistinctActives(rows.toDF("k", "h"), "k", "h", w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def brute(rows: Seq[(Long, Long)], w: Int): Map[Long, Long] = {
    val uh = rows.distinct
    val starts = uh.flatMap { case (_, h) => (h - w + 1) to h }.distinct
    starts.map { s =>
      s -> uh.filter { case (_, h) => h >= s && h < s + w }
        .map(_._1).distinct.size.toLong
    }.filter(_._2 > 0).toMap
  }

  test("matches brute force on random activity sets") {
    for (seed <- 1 to 4) {
      val r = new Random(seed)
      val w = 1 + r.nextInt(6)
      val rows = Seq.fill(400)(
        (r.nextInt(8).toLong, r.nextInt(60).toLong))
      assert(run(rows, w) === brute(rows, w), s"seed=$seed w=$w")
    }
  }

  test("single activity covers exactly W starts; duplicates collapse") {
    val rows = Seq((1L, 10L), (1L, 10L), (1L, 10L))
    val got = run(rows, 4)
    assert(got === (7L to 10L).map(_ -> 1L).toMap)
  }

  test("gap of exactly W merges into one island; W+1 splits") {
    val w = 3
    // h=10 and h=13: ranges [8,10] and [11,13] are adjacent → contiguous.
    assert(run(Seq((1L, 10L), (1L, 13L)), w)
      === (8L to 13L).map(_ -> 1L).toMap)
    // h=10 and h=14: start 11 covers [11,13] — no activity → absent.
    val split = run(Seq((1L, 10L), (1L, 14L)), w)
    assert(split === ((8L to 10L) ++ (12L to 14L)).map(_ -> 1L).toMap)
  }

  test("island merge is associative: merge of shard islands == rebuild from raw") {
    import graft.operators.Intervals
    for (seed <- 1 to 5) {
      val r = new Random(100 + seed)
      val w = 1 + r.nextInt(6)
      val rows = Seq.fill(300)((r.nextInt(6).toLong, r.nextInt(80).toLong))
      val (a, b) = rows.splitAt(r.nextInt(299) + 1)
      def isl(rs: Seq[(Long, Long)]) =
        Intervals.activeIslands(rs.toDF("k", "h"), "k", "h", w)
      val merged = Intervals.mergeIslands(isl(a), isl(b), w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val whole = isl(rows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(merged === whole, s"seed=$seed w=$w")
      // The read off the merged artifact equals the direct operator.
      val viaArtifact = Intervals.startsFromIslands(
          Intervals.mergeIslands(isl(a), isl(b), w), w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaArtifact === run(rows, w), s"read seed=$seed")
    }
  }
}
