package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sketches}
import graft.streaming.ArtifactStreams

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

  // -------------------------------------------------------------------
  // Table-form Bloom (Sketches.bloomTableBuild/Merge/Probe, the q170
  // decontamination artifact): the same merge-parity / envelope battery
  // the CMS/HLL/log-histogram artifacts carry (VERDICT r7 #5), so the
  // artifact algebra is uniform across all four sketch types.

  private def bitsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("table bloom: shard merge == single-shot build, word for word") {
    val all = (0L until 3000L).map(i => s"k-$i").toDF("k")
    val shards = Seq(0L until 1000L, 1000L until 2100L, 2100L until 3000L)
      .map(r => r.map(i => s"k-$i").toDF("k"))
    val single = Sketches.bloomTableBuild(all, "k")
    val merged = Sketches.bloomTableMerge(
      shards.map(s => Sketches.bloomTableBuild(s, "k"))
        .reduce(_ unionByName _))
    assert(bitsOf(merged) == bitsOf(single),
      "merged shards diverge from the single-shot artifact")
  }

  test("table bloom: no false negatives through bloomTableProbe") {
    val keys = (0L until 2000L).map(i => s"k-$i").toDF("k")
    val bloom = Sketches.bloomTableBuild(keys, "k")
    val misses = Sketches.bloomTableProbe(bloom, keys, "k")
      .filter(!col("bloom_hit")).count()
    assert(misses == 0, s"$misses inserted keys probed absent")
  }

  test("table bloom: false-positive envelope on fresh keys") {
    // n=1000, m=16384, k=4 → (1 − e^(−kn/m))^k ≈ 0.0022; 20k fresh
    // probes ≈ 44 expected hits. 200 is ~4.5× headroom against hash
    // variance while still proving the filter is neither degenerate
    // (all-true = 20000) nor saturated.
    val keys = (0L until 1000L).map(i => s"k-$i").toDF("k")
    val bloom = Sketches.bloomTableBuild(keys, "k")
    val fresh = (0L until 20000L).map(i => s"fresh-$i").toDF("k")
    val fps = Sketches.bloomTableProbe(bloom, fresh, "k")
      .filter(col("bloom_hit")).count()
    assert(fps < 200, s"fp count $fps implies fpp ${fps / 20000.0}")
  }

  test("table bloom: probe fails fast on reserved column collisions") {
    val keys = Seq("a", "b").toDF("k")
    val bloom = Sketches.bloomTableBuild(keys, "k")
    val clashing = Seq(("a", true)).toDF("k", "bloom_hit")
    val e = intercept[IllegalArgumentException] {
      Sketches.bloomTableProbe(bloom, clashing, "k")
    }
    assert(e.getMessage.contains("bloom_hit"))
  }

  test("table bloom: streaming fold == batch build of everything delivered") {
    // The q170 artifact under ArtifactStreams.foldStream: per-trigger
    // state = merge(state, build(batch)) must equal the single-shot
    // build over all keys delivered so far — the same stream == batch
    // discipline as the CMS/HLL/decay artifact streams.
    val rows = (0L until 900L).map(i => s"s-$i")
    val splits = Seq(rows.slice(0, 300), rows.slice(300, 650),
      rows.slice(650, 900))
    val tmp = java.nio.file.Files.createTempDirectory("bloom_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("k").coalesce(1).write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, Long])]
    val q = ArtifactStreams.foldStream(stream)(
      b => Sketches.bloomTableBuild(b, "k"),
      (s, b) => Sketches.bloomTableMerge(
        s.unionByName(Sketches.bloomTableBuild(b, "k")))) {
      (art, id) => perTrigger += (id -> bitsOf(art))
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val want = bitsOf(Sketches.bloomTableBuild(delivered.toDF("k"), "k"))
      assert(got == want, s"trigger $id diverges from batch build")
    }
  }
}
