package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Observability

/**
 * observe()-based metrics: batch metrics ride the production job (and
 * agree with a separately-computed DataChecks report), and the same
 * frame reports per-trigger in a stream via progress.observedMetrics.
 */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("batch: metrics ride the write and match an independent aggregation") {
    val df = (1 to 500).map(i => (i.toLong, if (i % 7 == 0) -1.0 else i * 1.0))
      .toDF("id", "price")
    val observed = Observability.withMetrics(df, "ingest_gate", Seq(
      "n_rows" -> count(lit(1)),
      "n_bad_price" -> sum(when(col("price") <= 0, 1L).otherwise(0L)),
      "price_total" -> round(sum(when(col("price") > 0, col("price"))
        .otherwise(0.0)), 2)))
    val (_, metrics) = Observability.collectMetrics(spark,
      Seq("ingest_gate")) {
      observed.write.format("noop").mode("overwrite").save()
    }
    val m = metrics("ingest_gate")
    assert(m("n_rows") === 500L)
    assert(m("n_bad_price") === 71L) // multiples of 7 up to 497
    val expectTotal = (1 to 500).filter(_ % 7 != 0).map(_.toDouble).sum
    assert(m("price_total") === math.rint(expectTotal * 100) / 100)
  }

  test("streaming: the same frame reports per-trigger observed metrics") {
    val tmp = java.nio.file.Files.createTempDirectory("observe_stream").toString
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    Seq((1L, 1.0), (2L, -2.0), (3L, 3.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    Thread.sleep(1100)
    Seq((4L, 4.0), (5L, -5.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val observed = Observability.withMetrics(stream, "stream_gate", Seq(
      "n_rows" -> count(lit(1)),
      "n_neg" -> sum(when(col("v") < 0, 1L).otherwise(0L))))
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = observed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.format("noop").mode("overwrite").save()
      }
      .start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      Option(p.observedMetrics.get("stream_gate")).foreach { row =>
        perBatch += ((row.getAs[Long]("n_rows"), row.getAs[Long]("n_neg")))
      }
    }
    q.stop()
    assert(perBatch.toSeq === Seq((3L, 1L), (2L, 1L)))
  }
}
