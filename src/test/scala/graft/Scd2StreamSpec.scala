package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators.Changelog
import graft.streaming.ChangelogStreams

/**
 * Streaming SCD2 maintenance == batch scd2History of everything
 * delivered, at every trigger, under the append-only-by-ord CDC
 * contract (triggers split the log by ord).
 */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("ts", LongType),
    StructField("seq", LongType), StructField("op", StringType),
    StructField("payload", StringType)))

  private def collectHist(h: DataFrame) =
    h.select("k", "version", "ts", "seq", "op", "payload", "valid_to_ts",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getInt(7)))
      .toSet

  test("per-trigger history == batch scd2History of all delivered") {
    val r = new Random(53)
    // Ord-ascending log (the CDC contract): ts strictly increasing.
    val rows = (0 until 300).map { i =>
      (r.nextInt(12).toLong, i.toLong, i.toLong,
        if (r.nextInt(8) == 0) "del" else "put", s"v$i")
    }
    val splits = Seq(rows.slice(0, 100), rows.slice(100, 210),
      rows.slice(210, 300))
    val tmp = java.nio.file.Files.createTempDirectory("scd2_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("k", "ts", "seq", "op", "payload").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Int, Long, Long, String, String, Option[Long], Int)])]
    val q = ChangelogStreams.scd2Stream(stream, Seq("k"), Seq("ts", "seq"),
        "op", "del") { (hist, id) => perTrigger += (id -> collectHist(hist)) }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size === 3)
    perTrigger.foreach { case (id, got) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val want = collectHist(Changelog.scd2History(
        delivered.toDF("k", "ts", "seq", "op", "payload"),
        Seq("k"), Seq("ts", "seq"), "op", "del"))
      assert(got === want, s"trigger $id diverges from batch")
    }
  }
}
