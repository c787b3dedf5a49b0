package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators.Intervals
import graft.streaming.ArtifactStreams

/**
 * Streaming rolling-distinct-actives: the carried island artifact at
 * every trigger equals the batch islands of everything delivered, and
 * its starts read equals the batch rolling count — triggers split the
 * activity arbitrarily (not by time), exercising interleaved merges.
 */
class ActiveIntervalsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4
  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("h", LongType)))

  test("per-trigger islands == batch islands of all delivered") {
    val r = new Random(67)
    val rows = Seq.fill(240)((r.nextInt(5).toLong, r.nextInt(60).toLong))
    // Arbitrary (non-chronological) split: later triggers carry buckets
    // that land INSIDE and BETWEEN earlier islands.
    val splits = Seq(rows.slice(0, 80), rows.slice(80, 160),
      rows.slice(160, 240))
    val tmp = java.nio.file.Files.createTempDirectory("ivl_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("k", "h").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long)], Map[Long, Long])]
    val q = ArtifactStreams.activeIntervalsStream(stream, "k", "h", W) {
      (art, id) =>
        perTrigger += ((id,
          art.collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2))).toSet,
          Intervals.startsFromIslands(art, W).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap))
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size === 3)
    perTrigger.foreach { case (id, islands, starts) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val df = delivered.toDF("k", "h")
      val wantIslands = Intervals.activeIslands(df, "k", "h", W)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val wantStarts = Intervals.rollingDistinctActives(df, "k", "h", W)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(islands === wantIslands, s"trigger $id islands diverge")
      assert(starts === wantStarts, s"trigger $id starts diverge")
    }
  }
}
