package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Butterflies
import graft.streaming.ArtifactStreams

/**
 * butterflyStream == batch pairCounts over everything delivered, at
 * every trigger, under the right-node-complete batch contract (each
 * right node's full edge list arrives in ONE batch): per-pair shared
 * counts fold by associative sum because every wedge (a, b, r) lives
 * entirely in r's batch. Also pins the batch refactor:
 * pairCounts == fromShared ∘ sharedCounts, including across a
 * right-node shard merge.
 */
class ButterflyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))

  private def batch(edges: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] =
    Butterflies.pairCounts(edges.toDF("src", "dst"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  /** Random bipartite fixture: left 0..9, right 100..105. */
  private def fixture(seed: Int): Seq[(Long, Long)] = {
    val rng = new Random(seed)
    (1 to 80).map(_ =>
      (rng.nextInt(10).toLong, 100L + rng.nextInt(6))).distinct
  }

  test("per-trigger counts read as the batch answer over all edges delivered") {
    val edges = fixture(31)
    // Right-node-complete splits: partition BY RIGHT NODE, never
    // splitting or repeating one — the stream contract.
    val splits = Seq(
      edges.filter(_._2 <= 101),
      edges.filter(e => e._2 == 102 || e._2 == 103),
      edges.filter(_._2 >= 104))
    val tmp = java.nio.file.Files.createTempDirectory("bfly_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Long)])]
    val q = ArtifactStreams.butterflyStream(stream) { (counts, id) =>
      perTrigger += (id -> counts.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val want = batch(splits.take(id.toInt + 1).flatten)
      assert(got == want, s"trigger $id diverges from batch pairCounts")
    }
  }

  test("batch identity: pairCounts == fromShared(sharedCounts), also across right shards") {
    val edges = fixture(47)
    val direct = batch(edges)
    val oneShot = Butterflies.fromShared(
        Butterflies.sharedCounts(edges.toDF("src", "dst")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(oneShot === direct)
    val (l, r) = edges.partition(_._2 <= 102) // right-node-complete shards
    val merged = Butterflies.sharedCounts(l.toDF("src", "dst"))
      .unionByName(Butterflies.sharedCounts(r.toDF("src", "dst")))
      .groupBy(col("a"), col("b")).agg(sum(col("shared")).as("shared"))
    val viaShards = Butterflies.fromShared(merged)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(viaShards === direct)
  }
}
