package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class BloomArtifactSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    val corpus = (0L until 2000L).map(i => s"doc-$i").toDF("k")
    val bloom = Dedup.buildBloomArtifact(corpus, col("k"), 2000L, fpp = 0.01)
    val misses = corpus.filter(!Dedup.bloomMightContain(bloom, col("k"))).count()
    assert(misses == 0, s"$misses inserted keys probed absent")
  }

  test("false-positive rate on fresh keys stays near the configured fpp") {
    val corpus = (0L until 2000L).map(i => s"doc-$i").toDF("k")
    val bloom = Dedup.buildBloomArtifact(corpus, col("k"), 2000L, fpp = 0.01)
    val fresh = (0L until 20000L).map(i => s"new-$i").toDF("k")
    val fps = fresh.filter(Dedup.bloomMightContain(bloom, col("k"))).count()
    // 20k probes at fpp 1% → ~200 expected; 3x headroom kills flake risk
    // while still proving the filter is not degenerate (all-true would be
    // 20000).
    assert(fps < 600, s"false-positive count $fps implies fpp ${fps / 20000.0}")
  }

  test("bloomNewRows: passes no true duplicate; over-drop bounded by fpp") {
    val seen = (0L until 1000L).map(i => s"doc-$i").toDF("k")
    val bloom = Dedup.buildBloomArtifact(seen, col("k"), 1000L, fpp = 0.01)
    val batch = ((500L until 1000L).map(i => s"doc-$i") ++ // 500 dups
      (0L until 500L).map(i => s"fresh-$i")).toDF("k")     // 500 new
    val kept = Dedup.bloomNewRows(batch, bloom, col("k"))
      .as[String].collect().toSet
    assert(kept.forall(_.startsWith("fresh-")), "a true duplicate passed")
    assert(kept.size >= 480, s"over-dropped ${500 - kept.size} of 500 fresh")
  }

  test("merged artifact covers both increments (same layout required)") {
    val a = (0L until 500L).map(i => s"a-$i").toDF("k")
    val b = (0L until 500L).map(i => s"b-$i").toDF("k")
    val ba = Dedup.buildBloomArtifact(a, col("k"), 2000L, fpp = 0.01)
    val bb = Dedup.buildBloomArtifact(b, col("k"), 2000L, fpp = 0.01)
    val merged = Dedup.mergeBloomArtifacts(ba, bb)
    val all = a.union(b)
    assert(all.filter(!Dedup.bloomMightContain(merged, col("k"))).count() == 0)
    // and the pre-merge artifact did NOT contain the other increment
    // (sanity that merge actually added bits, not that ba was saturated)
    val bOnlyHits = b.filter(Dedup.bloomMightContain(ba, col("k"))).count()
    assert(bOnlyHits < 100, s"ba already matched $bOnlyHits of b?")
  }

  test("artifact size is O(bits), independent of corpus size") {
    val small = (0L until 100L).map(i => s"s-$i").toDF("k")
    val big = (0L until 10000L).map(i => s"b-$i").toDF("k")
    val bs = Dedup.buildBloomArtifact(small, col("k"), 50000L, fpp = 0.01)
    val bb = Dedup.buildBloomArtifact(big, col("k"), 50000L, fpp = 0.01)
    assert(bs.length == bb.length,
      s"size must depend on expectedItems only: ${bs.length} vs ${bb.length}")
  }
}
