package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming funnel == the oracle-checked batch q100 on the same data. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stream over time-ordered triggers equals batch q100 stage counts") {
    val all = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts_ns", $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy { case (_, _, ts, id) => (ts, id) }

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    @volatile var last = Map.empty[Long, (Int, Long, Long)]
    val q = EventStreams.funnelStream(spark,
        input.toDF().toDF("user_id", "event_type", "ts_ns", "event_id"))
      .writeStream.outputMode("update")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[EventStreams.FunnelRow], _: Long) =>
          for (r <- b.collect()) last += r.user_id -> (r.stage, r.t1, r.t4)
      }
      .start()
    try {
      for (chunk <- all.grouped(all.size / 3 + 1)) {
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    // Batch truth: the q100 query itself (oracle-checked at sf0.01).
    val batch = SparkEntry.queries("q100_funnel_stages")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val streamed = last.values.groupBy(_._1).map { case (stage, vs) =>
      stage -> (vs.size.toLong,
        if (stage == 4) vs.map(v => v._3 - v._2).sum else -1L)
    }
    assert(streamed.keySet == batch.keySet)
    for ((stage, (n, conv)) <- streamed) {
      assert(batch(stage)._1 == n, s"stage $stage count")
      if (stage == 4) assert(batch(stage)._2 == conv, s"stage 4 conv total")
    }
  }
}
