package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Changelog

/**
 * CDC changelog collapse / snapshot⊕delta merge (q114). The load-bearing
 * property is the segment algebra — latestState(a ∪ b) ==
 * mergeSnapshot(latestState(a), b) for ANY split of the log, which is
 * what lets a pipeline compact history once and fold deltas forever —
 * checked here against random logs with random split points, plus the
 * two classic CDC traps: tombstone resurrection by a late-arriving old
 * update, and a delete that must survive compaction to keep winning.
 */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private val K = Seq("k")
  private val O = Seq("ts", "seq")

  /** Random log: keys 0..9, ops weighted toward upserts, unique seq. */
  private def gen(seed: Int, n: Int): Seq[(Long, Long, Long, String, String)] = {
    val r = new Random(seed)
    (0 until n).map { i =>
      val op = r.nextInt(10) match {
        case 0 | 1 => "del"
        case _     => "put"
      }
      // Colliding ts values on purpose: seq is the tie-break.
      (r.nextInt(10).toLong, r.nextInt(20).toLong, i.toLong, op,
        s"v$seed-$i")
    }
  }

  private def df(rows: Seq[(Long, Long, Long, String, String)]): DataFrame =
    rows.toDF("k", "ts", "seq", "op", "payload")

  /** Sequential reference: per key, the row with max (ts, seq) wins. */
  private def reference(rows: Seq[(Long, Long, Long, String, String)])
      : Map[Long, (Long, Long, String, String, Long)] =
    rows.groupBy(_._1).map { case (k, g) =>
      val w = g.maxBy(r => (r._2, r._3))
      k -> (w._2, w._3, w._4, w._5, g.size.toLong)
    }

  private def collect(state: DataFrame): Map[Long, (Long, Long, String, String, Long)] =
    state.select("k", "ts", "seq", "op", "payload", "n_log_rows")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5)))
      .toMap

  test("latestState matches the sequential latest-wins reference") {
    val rows = gen(1, 200)
    val ref = reference(rows).filter(_._2._3 != "del")
    val got = collect(Changelog.latestState(df(rows), K, O, "op", "del"))
    assert(got === ref)
  }

  test("snapshot ⊕ delta == full-log collapse for random splits") {
    for (seed <- 2 to 5) {
      val rows = gen(seed, 300)
      val r = new Random(seed * 31)
      val cut = 1 + r.nextInt(298)
      // Split POSITIONALLY, not by ts: the delta deliberately contains
      // mutations older than snapshot rows (late arrivals).
      val (a, b) = rows.splitAt(cut)
      val snap = Changelog.latestState(df(a), K, O, "op", "del",
        dropTombstones = false)
      val merged = collect(Changelog.mergeSnapshot(snap, df(b), K, O,
        "op", "del"))
      val full = collect(Changelog.latestState(df(rows), K, O, "op", "del"))
      assert(merged === full, s"seed=$seed cut=$cut")
    }
  }

  test("a compacted tombstone keeps beating a late-arriving older update") {
    val snapLog = Seq((1L, 100L, 10L, "del", "gone"))
    val delta = Seq((1L, 50L, 5L, "put", "stale"))
    val snap = Changelog.latestState(df(snapLog), K, O, "op", "del",
      dropTombstones = false)
    val merged = Changelog.mergeSnapshot(snap, df(delta), K, O, "op", "del")
    assert(merged.count() === 0L)
    // The retained tombstone still records both log rows.
    val kept = Changelog.mergeSnapshot(snap, df(delta), K, O, "op", "del",
      dropTombstones = false)
    assert(collect(kept)(1L) === ((100L, 10L, "del", "gone", 2L)))
  }

  test("dropping tombstones at compaction time WOULD resurrect (the trap)") {
    // Not a behavior we ship — the spec documents why latestState's
    // snapshot form must keep deletes: compact with dropTombstones=true,
    // merge an older update, and the dead key comes back.
    val snapLog = Seq((1L, 100L, 10L, "del", "gone"))
    val delta = Seq((1L, 50L, 5L, "put", "stale"))
    val wrongSnap = Changelog.latestState(df(snapLog), K, O, "op", "del",
      dropTombstones = true)
    val resurrected = Changelog.mergeSnapshot(wrongSnap, df(delta), K, O,
      "op", "del")
    assert(resurrected.count() === 1L)
  }

  test("vacuum drops only sub-watermark tombstones; premature vacuum resurrects") {
    val log = Seq(
      (1L, 10L, 1L, "del", "old-dead"),   // below watermark → droppable
      (2L, 90L, 2L, "del", "fresh-dead"), // inside horizon → must stay
      (3L, 5L, 3L, "put", "old-live"))    // live rows never vacuumed
    val snap = Changelog.latestState(df(log), K, O, "op", "del",
      dropTombstones = false)
    val vac = Changelog.vacuum(snap, "op", "del",
      org.apache.spark.sql.functions.col("ts") < 50L)
    assert(collect(vac).keySet === Set(2L, 3L))
    // Safe case: a post-watermark delta can't reference key 1 (contract),
    // so merging against the vacuumed snapshot equals the full collapse.
    val delta = Seq((3L, 60L, 4L, "put", "newer"))
    assert(collect(Changelog.mergeSnapshot(vac, df(delta), K, O, "op", "del"))
      === collect(Changelog.latestState(df(log ++ delta), K, O, "op", "del")))
    // Premature case: an old update for key 1 arriving AFTER the vacuum
    // resurrects — the trap the watermark contract exists to prevent.
    val late = Seq((1L, 8L, 5L, "put", "stale"))
    assert(Changelog.mergeSnapshot(vac, df(late), K, O, "op", "del")
      .filter(org.apache.spark.sql.functions.col("k") === 1L).count() === 1L)
  }

  // ---- SCD Type 2 (q137) ------------------------------------------------

  /** Sequential SCD2 reference: per key ordered by (ts, seq), each
    * non-tombstone emits (version, ts, seq, op, payload, valid_to_ts
    * = next mutation's ts or None) with versions dense over emitted rows. */
  private def scd2Reference(rows: Seq[(Long, Long, Long, String, String)])
      : Set[(Long, Int, Long, Long, String, String, Option[Long], Int)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      val sorted = g.sortBy(r => (r._2, r._3))
      val emitted = sorted.zipWithIndex.filter(_._1._4 != "del")
      emitted.zipWithIndex.map { case ((r, pos), v) =>
        val to = if (pos + 1 < sorted.size) Some(sorted(pos + 1)._2) else None
        (k, v + 1, r._2, r._3, r._4, r._5, to,
          if (to.isEmpty) 1 else 0)
      }
    }.toSet

  private def collectScd2(h: DataFrame)
      : Set[(Long, Int, Long, Long, String, String, Option[Long], Int)] =
    h.select("k", "version", "ts", "seq", "op", "payload", "valid_to_ts",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getInt(7)))
      .toSet

  test("scd2History matches the sequential version-history reference") {
    val rows = gen(11, 250)
    assert(collectScd2(Changelog.scd2History(df(rows), K, O, "op", "del"))
      === scd2Reference(rows))
  }

  test("scd2Merge(history, delta) == single-shot history for random ord splits") {
    for (seed <- 12 to 15) {
      val rows = gen(seed, 300)
      val r = new Random(seed * 17)
      // Split by ORD (ts, seq) threshold — the append-only CDC contract
      // scd2Merge requires (unlike latestState, history is order-bound).
      val cutTs = r.nextInt(20).toLong
      val cutSeq = r.nextInt(300).toLong
      val (a, b) = rows.partition(x =>
        x._2 < cutTs || (x._2 == cutTs && x._3 < cutSeq))
      val hist = Changelog.scd2History(df(a), K, O, "op", "del")
      val merged = collectScd2(
        Changelog.scd2Merge(hist, df(b), K, O, "op", "del"))
      val full = collectScd2(Changelog.scd2History(df(rows), K, O, "op", "del"))
      assert(merged === full, s"seed=$seed cut=($cutTs,$cutSeq)")
    }
  }

  test("scd2: tombstone closes the open version and consumes no number") {
    val rows = Seq(
      (1L, 10L, 1L, "put", "v1"),
      (1L, 20L, 2L, "del", "x"),
      (1L, 30L, 3L, "put", "v2"))
    val h = collectScd2(Changelog.scd2History(df(rows), K, O, "op", "del"))
    assert(h === Set(
      (1L, 1, 10L, 1L, "put", "v1", Some(20L), 0),
      (1L, 2, 30L, 3L, "put", "v2", None, 1)))
    // A delta carrying ONLY a tombstone closes the open version and
    // emits no new one; an untouched key passes through bit-identically.
    val base = Seq((1L, 10L, 1L, "put", "v1"), (2L, 10L, 2L, "put", "w1"))
    val hist = Changelog.scd2History(df(base), K, O, "op", "del")
    val afterDel = collectScd2(Changelog.scd2Merge(hist,
      df(Seq((1L, 40L, 4L, "del", "x"))), K, O, "op", "del"))
    assert(afterDel === Set(
      (1L, 1, 10L, 1L, "put", "v1", Some(40L), 0),
      (2L, 1, 10L, 2L, "put", "w1", None, 1)))
  }

  test("n_log_rows accumulates across repeated merges") {
    val rows = gen(7, 120)
    val (a, rest) = rows.splitAt(40)
    val (b, c) = rest.splitAt(40)
    val s0 = Changelog.latestState(df(a), K, O, "op", "del",
      dropTombstones = false)
    val s1 = Changelog.mergeSnapshot(s0, df(b), K, O, "op", "del",
      dropTombstones = false)
    val s2 = collect(Changelog.mergeSnapshot(s1, df(c), K, O, "op", "del",
      dropTombstones = false))
    val ref = reference(rows)
    assert(s2 === ref)
  }
}
