package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators.Decay
import graft.streaming.ArtifactStreams

/**
 * Streaming decay-artifact maintenance == batch decayedTotals over
 * everything delivered, at every trigger; the carried artifact then
 * re-ages with ageArtifact exactly like a batch rebuild at the later
 * reference instant.
 */
class DecayStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Period = 1000L
  private val Ref = 100000L
  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("ts_ns", LongType),
    StructField("value", DoubleType)))

  private def totals(art: DataFrame): Map[String, (Long, Long, Long)] =
    Decay.decayRead(art, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap

  test("per-trigger artifact == batch totals of all rows delivered") {
    val r = new Random(31)
    val rows = Seq.fill(240)((s"k${r.nextInt(3)}",
      Ref - r.nextLong(50 * Period), r.nextDouble() * 50))
    val splits = Seq(rows.slice(0, 80), rows.slice(80, 170),
      rows.slice(170, 240))
    val tmp = java.nio.file.Files.createTempDirectory("decay_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("k", "ts_ns", "value").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, (Long, Long, Long)], DataFrame)]
    val q = ArtifactStreams.decayStream(stream, Seq("k"), "ts_ns",
        "value", Ref, Period) { (art, id) =>
      perTrigger += ((id, totals(art), art))
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size === 3)
    perTrigger.foreach { case (id, got, _) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val want = totals(Decay.decayArtifact(
        delivered.toDF("k", "ts_ns", "value"), Seq("k"), "ts_ns",
        "value", Ref, Period))
      assert(got === want, s"trigger $id diverges from batch")
    }
    // The carried artifact re-ages without replaying the stream.
    val aged = totals(Decay.ageArtifact(perTrigger.last._3, 5))
    val rebuilt = totals(Decay.decayArtifact(
      rows.toDF("k", "ts_ns", "value"), Seq("k"), "ts_ns", "value",
      Ref + 5 * Period, Period))
    assert(aged === rebuilt)
  }
}
