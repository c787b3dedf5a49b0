package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStreams

/**
 * Streaming CUSUM == batch CUSUM on a time-ordered trigger split, and
 * the direct recurrence == the prefix identity q111 uses.
 */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val Target = 1000L
  private val H = 50000L

  // (event_type, event_id, ts_ns, cents), event-time sorted.
  private lazy val all: Seq[(String, Long, Long, Long)] =
    Tables.events(spark, dir)
      .select($"event_type", $"event_id", $"ts_ns",
        org.apache.spark.sql.functions.expr(
          "CAST(round(value * 100) AS BIGINT)"))
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy { case (_, id, ts, _) => (ts, id) }

  /** Sequential reference: the plain recurrence per type, in ts order. */
  private def ref: Map[String, (Long, Long, Long)] =
    all.groupBy(_._1).map { case (t, rows) =>
      var s = 0L; var alarms = 0L; var peak = 0L; var peakEvent = -1L
      for ((_, id, _, cents) <- rows) {
        s = math.max(0L, s + (cents - Target))
        if (s > H) alarms += 1
        if (s > peak) { peak = s; peakEvent = id }
      }
      t -> (alarms, peak, peakEvent)
    }

  /** Prefix-identity computation (q111's formulation, fixed target). */
  private def refPrefix: Map[String, (Long, Long, Long)] =
    all.groupBy(_._1).map { case (t, rows) =>
      var p = 0L; var minP = 0L
      var alarms = 0L; var peak = 0L; var peakEvent = -1L
      for ((_, id, _, cents) <- rows) {
        p += cents - Target
        minP = math.min(minP, p)
        val s = p - math.min(minP, 0L)
        if (s > H) alarms += 1
        if (s > peak) { peak = s; peakEvent = id }
      }
      t -> (alarms, peak, peakEvent)
    }

  test("direct recurrence equals the prefix identity on real data") {
    assert(ref == refPrefix)
  }

  test("stream over a time-ordered split equals the batch fold exactly") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Long)]
    val stream = input.toDF()
      .toDF("event_type", "event_id", "ts_ns", "cents")
      .withColumn("value",
        org.apache.spark.sql.functions.expr("CAST(cents AS DOUBLE) / 100"))
    @volatile var last = Map.empty[String, (Long, Long, Long)]
    val q = EventStreams.cusumStream(spark, stream, Target, H)
      .writeStream.outputMode("update")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[EventStreams.CusumRow], _: Long) =>
          for (r <- b.collect())
            last += r.event_type -> (r.n_alarms, r.peak_cusum, r.peak_event_id)
      }
      .start()
    try {
      val (first, second) = all.splitAt(all.size / 2)
      input.addData(first); q.processAllAvailable()
      input.addData(second); q.processAllAvailable()
    } finally q.stop()
    assert(last == ref)
  }
}
