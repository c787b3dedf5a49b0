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

  test("retention: state expires, pairs stay complete, late arrival refuses") {
    // Three time-ordered waves 1000 apart with retention 100: waves can
    // only overlap within themselves, so after each fold the carried
    // table holds just the live horizon — state O(horizon), not
    // O(stream) — while cumulative pairs still equal the one-shot join.
    val waves = Seq(
      (1L to 15L).map(i => (i, 10L * i, 10L * i + 25L)),
      (21L to 35L).map(i => (i, 1000L + 10L * i, 1000L + 10L * i + 25L)),
      (41L to 55L).map(i => (i, 2000L + 10L * i, 2000L + 10L * i + 25L)))
    val tmp = java.nio.file.Files.createTempDirectory("ivl_ret").toString
    waves.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("id", "s", "e").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    var got = Set.empty[(Long, Long)]
    val stateSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = ArtifactStreams.overlapPairsStream(stream, "id", "s", "e",
        bucket = 10L, maxSpan = 64, retention = Some(100L))(
      (pairs, _) => got ++= pairs.select("l_id", "r_id")
        .as[(Long, Long)].collect().map(canon).toSet,
      (state, _) => stateSizes += state.count())
    q.processAllAvailable()
    q.stop()
    assert(got === batchPairs(waves.flatten))
    // each wave's fold expired the previous wave entirely AND the
    // current wave's own head below the watermark (maxStart 150 − 100 =
    // 50 expires i=1,2 whose ends are 35/45 — they were paired within
    // their batch BEFORE the fold, so nothing is lost), so carried
    // state never exceeds one wave's live horizon.
    assert(stateSizes.toSeq === Seq(13L, 13L, 13L),
      s"state must hold only the live horizon, got $stateSizes")

    // A batch starting below the watermark (maxStart − retention) is
    // late beyond the contract — the stream must refuse loudly.
    val tmp2 = java.nio.file.Files.createTempDirectory("ivl_late").toString
    Seq((1L, 5000L, 5010L)).toDF("id", "s", "e").coalesce(1)
      .write.mode("append").parquet(s"$tmp2/in")
    Thread.sleep(1100)
    Seq((2L, 100L, 110L)).toDF("id", "s", "e").coalesce(1)
      .write.mode("append").parquet(s"$tmp2/in")
    val late = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp2/in")
    val q2 = ArtifactStreams.overlapPairsStream(late, "id", "s", "e",
        bucket = 10L, maxSpan = 64, retention = Some(50L))((_, _) => ())
    val e = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("below the retention watermark")),
      s"unexpected failure: $e")
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

  test("retention: a NULL interval coordinate refuses loudly instead of expiring silently") {
    // same ADVICE-r14 class as the graph faces: a null start/end would
    // pass the lateness probe (min/max skip nulls) and then vanish in
    // the expiry filter.
    val tmp = java.nio.file.Files.createTempDirectory("ivl_null").toString
    Seq((1L, Some(100L), Some(110L)), (2L, Some(120L), None))
      .toDF("id", "s", "e").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
    val q = ArtifactStreams.overlapPairsStream(stream, "id", "s", "e",
        bucket = 10L, maxSpan = 64, retention = Some(50L))((_, _) => ())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] { q.processAllAvailable() }
    q.stop()
    assert(chain(e).exists(_.contains("NULL s/e")),
      s"unexpected failure: ${chain(e)}")
  }
}
