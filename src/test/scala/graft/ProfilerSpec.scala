package graft

import graft.operators.Profiler

/**
 * Auto profiler (q122): per-dtype branch behavior on hand-built frames
 * (nulls, ranges, lengths), the approx-distinct 100 TB switch, and the
 * uniform-schema union property that makes profiles diffable.
 */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profiles nulls, ranges and lengths per dtype") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 2.5, "ab"), (2L, null, "abcd"), (null, 7.5, null))
      .toDF("k", "v", "s")
    val rows = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("k", "v", "s"))
    val k = rows("k")
    assert((k.getString(1), k.getLong(2), k.getLong(3), k.getLong(4)) ===
      (("bigint", 3L, 1L, 2L)))
    assert((k.getDouble(5), k.getDouble(6)) === ((1.0, 2.0)))
    assert(k.isNullAt(7))
    val v = rows("v")
    assert((v.getString(1), v.getLong(3)) === (("double", 1L)))
    assert((v.getDouble(5), v.getDouble(6)) === ((2.5, 7.5)))
    val s = rows("s")
    assert((s.getString(1), s.getLong(3), s.getLong(4)) ===
      (("string", 1L, 2L)))
    assert(s.isNullAt(5) && s.isNullAt(6))
    assert(s.getDouble(7) === 3.0) // avg(2, 4)
  }

  test("approxDistinct mode stays within HLL error on a wide column") {
    val df = (1 to 20000).map(i => s"val$i").toDF("c")
    val nd = Profiler.profile(df, approxDistinct = true)
      .collect().head.getLong(4)
    // approx_count_distinct's default rsd is 5%; allow ~3 sigma.
    assert(math.abs(nd - 20000L) < 3000, s"approx distinct $nd")
  }

  test("profiles of different tables union on the uniform schema") {
    val a = Profiler.profile(Seq((1L, "x")).toDF("id", "name"))
    val b = Profiler.profile(Seq((2.0, 3L)).toDF("score", "cnt"))
    val u = a.unionByName(b).collect()
    assert(u.length === 4)
  }
}
