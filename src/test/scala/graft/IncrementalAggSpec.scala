package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Changelog, IncrementalAgg}

/**
 * Incremental view maintenance (q127): maintain ≡ rebuild over random
 * logs and random MULTI-delta chains, plus the targeted mutations the
 * fixture can't guarantee — group migration, tombstone removal,
 * resurrection-by-newer-put, and count-to-zero group drop.
 */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val K = Seq("k"); private val O = Seq("ts", "seq")

  private def df(rows: Seq[(Long, Long, Long, String, Long)]): DataFrame =
    rows.toDF("k", "ts", "seq", "op", "v")

  /** op is BOTH the mutation kind and the group: "del" = tombstone,
    * anything else = live group (mirrors q127's event_type). */
  private def rebuild(rows: Seq[(Long, Long, Long, String, Long)])
      : Map[String, (Long, Long)] =
    rows.groupBy(_._1).values
      .map(g => g.maxBy(r => (r._2, r._3)))
      .filter(_._4 != "del")
      .groupBy(_._4)
      .map { case (grp, rs) => grp -> (rs.size.toLong, rs.map(_._5).sum) }

  private def collectAgg(agg: DataFrame): Map[String, (Long, Long)] =
    agg.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  private def state(rows: Seq[(Long, Long, Long, String, Long)]) = {
    val snap = Changelog.latestState(df(rows), K, O, "op", "del",
      dropTombstones = false)
    val agg = IncrementalAgg.contrib(snap.filter(col("op") =!= "del"),
      "op", "v")
    (agg, snap)
  }

  test("maintain == rebuild across random multi-delta chains") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val rows = (0 until 240).map { i =>
        val op = r.nextInt(10) match {
          case 0 => "del"
          case n => s"g${n % 3}"
        }
        (r.nextInt(12).toLong, r.nextInt(40).toLong, i.toLong, op,
          r.nextInt(1000).toLong)
      }
      val (a0, s0) = state(rows.take(80))
      val (a1, s1) = IncrementalAgg.maintain(a0, s0,
        df(rows.slice(80, 160)), K, O, "op", "del", "op", "v")
      val (a2, _) = IncrementalAgg.maintain(a1, s1,
        df(rows.slice(160, 240)), K, O, "op", "del", "op", "v")
      assert(collectAgg(a2) === rebuild(rows), s"seed=$seed")
    }
  }

  test("group migration, deletion, and count-to-zero drop") {
    val before = Seq(
      (1L, 10L, 1L, "gA", 100L),
      (2L, 10L, 2L, "gA", 50L),
      (3L, 10L, 3L, "gB", 7L))
    val delta = Seq(
      (1L, 20L, 4L, "gB", 5L),   // migrates k=1 from gA to gB
      (3L, 20L, 5L, "del", 0L))  // kills the only gB key... which just gained k=1
    val (a0, s0) = state(before)
    val (a1, _) = IncrementalAgg.maintain(a0, s0, df(delta),
      K, O, "op", "del", "op", "v")
    assert(collectAgg(a1) === Map("gA" -> (1L, 50L), "gB" -> (1L, 5L)))
    // Delete the last gA key too: the group must VANISH, not linger at 0.
    val (a2, _) = IncrementalAgg.maintain(a1, _snapAfter(s0, delta),
      df(Seq((2L, 30L, 6L, "del", 0L))), K, O, "op", "del", "op", "v")
    assert(collectAgg(a2) === Map("gB" -> (1L, 5L)))
  }

  private def _snapAfter(s0: DataFrame,
      delta: Seq[(Long, Long, Long, String, Long)]): DataFrame =
    IncrementalAgg.maintain(
      IncrementalAgg.contrib(s0.filter(col("op") =!= "del"), "op", "v"),
      s0, df(delta), K, O, "op", "del", "op", "v")._2
}
