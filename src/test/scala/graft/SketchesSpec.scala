package graft

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("sparse-mode sketches count small groups exactly") {
    val df = (1 to 300).map(i => ("g" + (i % 3), "v" + i)).toDF("g", "v")
    val est = Sketches.hllEstimate(
      Sketches.hllBuild(df, Seq("g"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("g0" -> 100L, "g1" -> 100L, "g2" -> 100L))
  }

  test("shard-then-merge tracks the single-shot build on the same rows") {
    // The union is exact on the register lattice, but DataSketches'
    // preferred HIP estimator is invalidated by merging, so the merged
    // sketch reads through the composite estimator: estimates may differ
    // by a small epsilon (single-shot 698 vs merged 701 on this input),
    // both within the sketch's error envelope of the true 700.
    val all = (1 to 1000).map(i => ("k", "v" + (i % 700))).toDF("g", "v")
    val single = Sketches.hllEstimate(
      Sketches.hllBuild(all, Seq("g"), "v"), Seq("g"))
      .collect().head.getLong(1)
    // Three overlapping shards of the same rows.
    val shards = Seq(
      all.filter($"v".substr(2, 10).cast("int") % 3 =!= 0),
      all.filter($"v".substr(2, 10).cast("int") % 3 =!= 1),
      all.filter($"v".substr(2, 10).cast("int") % 3 =!= 2))
    val sketchUnion = shards.map(s => Sketches.hllBuild(s, Seq("g"), "v"))
      .reduce(_ union _)
    val merged = Sketches.hllEstimate(
      Sketches.hllMerge(sketchUnion, Seq("g")), Seq("g"))
      .collect().head.getLong(1)
    for ((est, label) <- Seq((single, "single-shot"), (merged, "merged")))
      assert(math.abs(est - 700L) <= 700L * 2 / 100,
        s"$label estimate $est outside 2% of true 700")
  }

  test("disjoint shard union estimates the combined cardinality within error") {
    val a = (1 to 5000).map(i => ("k", s"a$i")).toDF("g", "v")
    val b = (1 to 5000).map(i => ("k", s"b$i")).toDF("g", "v")
    val merged = Sketches.hllEstimate(
      Sketches.hllMerge(
        Sketches.hllBuild(a, Seq("g"), "v")
          .union(Sketches.hllBuild(b, Seq("g"), "v")), Seq("g")), Seq("g"))
      .collect().head.getLong(1)
    assert(math.abs(merged - 10000L) < 500,
      s"estimate $merged should be within ~5% of 10000")
  }
}
