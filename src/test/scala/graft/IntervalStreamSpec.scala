package graft

import scala.util.Random

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.IntervalJoin
import graft.streaming.ArtifactStreams

/**
 * overlapPairsStream: cumulative per-trigger emission == the one-shot
 * overlapJoin self-join over everything delivered, each unordered pair
 * exactly once (fired in the trigger its LATER member arrives). Also
 * pins the per-trigger emission sets directly: trigger i emits exactly
 * the pairs whose later member is in batch i.
 */
class IntervalStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", LongType),
    StructField("e", LongType)))

  /** Canonical unordered pair set of a one-shot self overlap join. */
  private def batchPairs(rows: Seq[(Long, Long, Long)]): Set[(Long, Long)] = {
    val l = rows.toDF("l_id", "l_start", "l_end")
    val r = rows.toDF("r_id", "r_start", "r_end")
    IntervalJoin.overlapJoin(l, r, "l_start", "l_end", "r_start", "r_end",
        bucket = 10L, maxSpan = 64)
      .filter($"l_id" < $"r_id")
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
  }

  private def canon(p: (Long, Long)): (Long, Long) =
    (math.min(p._1, p._2), math.max(p._1, p._2))

  test("cumulative stream pairs == one-shot self join; later-member firing") {
    val rng = new Random(17)
    val rows = (1L to 60L).map { i =>
      val s = rng.nextInt(200).toLong
      (i, s, s + rng.nextInt(40))
    }
    val splits = Seq(rows.take(20), rows.slice(20, 45), rows.drop(45))
    val tmp = java.nio.file.Files.createTempDirectory("ivl_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("id", "s", "e").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long)])]
    val q = ArtifactStreams.overlapPairsStream(stream, "id", "s", "e",
        bucket = 10L, maxSpan = 64) { (pairs, id) =>
      perTrigger += (id -> pairs.select("l_id", "r_id")
        .as[(Long, Long)].collect().map(canon).toSet)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    // exactly-once across triggers: the emission sets are disjoint…
    val all = perTrigger.map(_._2).toList
    assert(all.combinations(2).forall {
      case a :: b :: Nil => (a & b).isEmpty
      case _ => true
    })
    // …their union is the one-shot answer…
    assert(all.reduce(_ ++ _) === batchPairs(rows))
    // …and each trigger emits exactly the pairs whose LATER member
    // arrived in it (delivered-so-far minus previously-possible).
    splits.indices.foreach { i =>
      val upTo = batchPairs(splits.take(i + 1).flatten)
      val before = batchPairs(splits.take(i).flatten)
      assert(perTrigger(i)._2 === upTo -- before, s"trigger $i")
    }
  }

  test("single-batch stream == one-shot (the degenerate split)") {
    val rows = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 21L, 30L),
      (4L, 5L, 25L))
    val tmp = java.nio.file.Files.createTempDirectory("ivl_one").toString
    rows.toDF("id", "s", "e").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
    var got = Set.empty[(Long, Long)]
    val q = ArtifactStreams.overlapPairsStream(stream, "id", "s", "e",
        bucket = 10L, maxSpan = 64) { (pairs, _) =>
      got ++= pairs.select("l_id", "r_id")
        .as[(Long, Long)].collect().map(canon).toSet
    }
    q.processAllAvailable()
    q.stop()
    assert(got === batchPairs(rows))
    assert(got === Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
  }
}
