package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Decay

/**
 * Exponentially-decayed totals (q139): sequential-reference equality of
 * the integer round-half-up ladder, artifact shard-merge exactness,
 * corpus-free re-aging, and the clamp boundaries (future rows at full
 * weight, beyond-horizon rows at exactly zero).
 */
class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val Period = 1000L
  private val Ref = 100000L

  private def df(rows: Seq[(String, Long, Double)]): DataFrame =
    rows.toDF("k", "ts_ns", "value")

  /** Sequential reference of the operator's bucket-level semantics. */
  private def reference(rows: Seq[(String, Long, Double)], refTs: Long)
      : Map[String, (Long, Long, Long)] =
    rows.groupBy(_._1).map { case (k, g) =>
      val byP = g.groupBy { r =>
        math.max(0L, math.min(62L, (refTs - r._2) / Period))
      }
      def half(p: Long) = (1L << p) / 2
      val cnt = byP.map { case (p, rs) =>
        rs.size * ((1000000L + half(p)) / (1L << p))
      }.sum
      val v = byP.map { case (p, rs) =>
        val sv = rs.map(r => math.round(r._3 * 1000000)).sum
        (sv + half(p)) / (1L << p)
      }.sum
      k -> (cnt, v, g.size.toLong)
    }

  private def collect(d: DataFrame): Map[String, (Long, Long, Long)] =
    d.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  private def gen(seed: Int, n: Int): Seq[(String, Long, Double)] = {
    val r = new Random(seed)
    Seq.fill(n)((s"k${r.nextInt(4)}",
      Ref - r.nextLong(40 * Period), r.nextDouble() * 100))
  }

  test("decayedTotals matches the sequential integer-ladder reference") {
    for (seed <- 1 to 3) {
      val rows = gen(seed, 400)
      val got = collect(Decay.decayedTotals(df(rows), Seq("k"), "ts_ns",
        "value", Ref, Period))
      assert(got === reference(rows, Ref), s"seed=$seed")
    }
  }

  test("artifact shard-merge == whole-corpus build") {
    val rows = gen(9, 500)
    val (a, b) = rows.splitAt(213)
    val merged = Decay.decayArtifact(df(a), Seq("k"), "ts_ns", "value",
        Ref, Period)
      .unionByName(Decay.decayArtifact(df(b), Seq("k"), "ts_ns", "value",
        Ref, Period))
      .groupBy(col("k"), col("p"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sv")).as("sv"))
    assert(collect(Decay.decayRead(merged, Seq("k")))
      === collect(Decay.decayedTotals(df(rows), Seq("k"), "ts_ns",
        "value", Ref, Period)))
  }

  test("ageArtifact(k) == rebuild at refTs + k periods (in-horizon data)") {
    val rows = gen(11, 300) // ages 0..40 periods; +10 stays inside 62
    val art = Decay.decayArtifact(df(rows), Seq("k"), "ts_ns", "value",
      Ref, Period)
    val aged = collect(Decay.decayRead(Decay.ageArtifact(art, 10), Seq("k")))
    val rebuilt = collect(Decay.decayedTotals(df(rows), Seq("k"), "ts_ns",
      "value", Ref + 10 * Period, Period))
    assert(aged === rebuilt)
  }

  test("clamps: future rows weigh full; beyond-horizon rows weigh zero") {
    val rows = Seq(
      ("k", Ref + 5 * Period, 2.0),   // future → p clamped to 0
      ("k", Ref - 70 * Period, 3.0))  // beyond 62 → exactly 0
    val got = collect(Decay.decayedTotals(df(rows), Seq("k"), "ts_ns",
      "value", Ref, Period))
    assert(got("k") === ((1000000L, 2000000L, 2L)))
  }
}
