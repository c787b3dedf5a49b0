package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, SortedNeighborhood, SortedSegments}

class SortedSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def cond(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    levenshtein(a, b) <= 1

  test("segments equal CC-over-adjacent-edges on generated near-dup runs") {
    // Runs of near-duplicate keys ("nameXXa/b/c") interleaved with isolates.
    val keys = (0 until 300).flatMap { i =>
      val base = f"name$i%04d"
      if (i % 3 == 0) Seq(base + "a", base + "b", base + "c") else Seq(base + "x")
    }
    val kdf = scala.util.Random.shuffle(keys).toDF("key")

    val seg = SortedSegments.assign(kdf, cond, numPartitions = 7)
      .as[(String, String)].collect().toMap

    // Oracle: explicit adjacent pairs + iterative connected components.
    val pairs = SortedNeighborhood.adjacentPairs(kdf, numPartitions = 7)
    val edges = pairs.filter(cond(col("prev"), col("curr")))
      .select(col("prev").as("src"), col("curr").as("dst"))
    val cc = ConnectedComponents.run(edges).as[(String, String)].collect().toMap

    keys.foreach { k =>
      val want = cc.getOrElse(k, k) // isolates are their own component
      assert(seg(k) == want, s"key $k: segment ${seg(k)} vs cc $want")
    }
  }

  test("cross-partition chain stitches through whole partitions") {
    // "a", "aa", "aaa", … : every sort-adjacent pair is levenshtein 1, so
    // the whole set is ONE component that must stitch across all 8
    // partitions (some partitions are interior links of the chain).
    val chain = (1 to 40).map("a" * _)
    val out = SortedSegments.assign(chain.toDF("key"), cond, numPartitions = 8)
      .as[(String, String)].collect().toMap
    assert(out.values.toSet == Set("a"), s"got ${out.values.toSet}")
  }
}
