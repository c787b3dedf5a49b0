package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators.Changelog
import graft.streaming.ChangelogStreams

/**
 * Streaming changelog fold == batch latest-wins collapse under arbitrary
 * trigger splits (the q114 algebra applied per micro-batch), including
 * out-of-order delivery and the cross-trigger tombstone case. File-source
 * discipline as in LineDedupStreamSpec: one parquet file per trigger.
 */
class ChangelogStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("ts", LongType),
    StructField("seq", LongType), StructField("op", StringType),
    StructField("payload", StringType)))

  private def gen(seed: Int, n: Int): Seq[(Long, Long, Long, String, String)] = {
    val r = new Random(seed)
    (0 until n).map { i =>
      val op = if (r.nextInt(10) < 2) "del" else "put"
      (r.nextInt(8).toLong, r.nextInt(30).toLong, i.toLong, op, s"p$i")
    }
  }

  private def toDf(rows: Seq[(Long, Long, Long, String, String)]): DataFrame =
    rows.toDF("k", "ts", "seq", "op", "payload")

  private def triggerStream(dir: String,
      splits: Seq[Seq[(Long, Long, Long, String, String)]]) = {
    splits.zipWithIndex.foreach { case (rows, i) =>
      if (i > 0) Thread.sleep(1100)
      toDf(rows).coalesce(1).write.mode("append").parquet(s"$dir/in")
    }
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$dir/in")
  }

  private def state(df: DataFrame): Map[Long, (Long, Long, String, String, Long)] =
    df.select("k", "ts", "seq", "op", "payload", "n_log_rows").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5))).toMap

  test("per-trigger state == batch collapse of everything delivered so far") {
    val rows = gen(21, 90)
    // POSITIONAL split: later triggers carry mutations with older ts.
    val splits = Seq(rows.slice(0, 30), rows.slice(30, 55), rows.slice(55, 90))
    val tmp = java.nio.file.Files.createTempDirectory("changelog_stream").toString
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, (Long, Long, String, String, Long)])]
    val q = ChangelogStreams.changelogStateStream(
      triggerStream(tmp, splits), Seq("k"), Seq("ts", "seq"), "op", "del") {
      (view, batchId) => perTrigger += (batchId -> state(view))
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size === splits.size)
    perTrigger.foreach { case (bid, got) =>
      val delivered = splits.take(bid.toInt + 1).flatten
      val want = state(Changelog.latestState(toDf(delivered),
        Seq("k"), Seq("ts", "seq"), "op", "del"))
      assert(got === want, s"trigger $bid diverges from batch")
    }
    // The fixture actually exercised cross-trigger override: some key's
    // winner changed between the first and last trigger.
    assert(perTrigger.head._2.exists { case (k, v) =>
      perTrigger.last._2.get(k).exists(_ != v)
    } || perTrigger.head._2.keySet != perTrigger.last._2.keySet)
  }

  test("incremental view stream == rebuild per trigger") {
    // op doubles as the group (the q127 shape); value column as micros.
    val rows = gen(33, 90).map { case (k, ts, seq, op, _) =>
      (k, ts, seq, if (op == "del") "del" else s"g${k % 3}", (k * 100 + seq))
    }
    val splits = Seq(rows.slice(0, 30), rows.slice(30, 60), rows.slice(60, 90))
    val tmp = java.nio.file.Files.createTempDirectory("view_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("k", "ts", "seq", "op", "v").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(StructType(Seq(
        StructField("k", LongType), StructField("ts", LongType),
        StructField("seq", LongType), StructField("op", StringType),
        StructField("v", LongType))))
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, (Long, Long)])]
    val q = ChangelogStreams.incrementalViewStream(stream, Seq("k"),
      Seq("ts", "seq"), "op", "del", "op", "v") { (agg, id) =>
      perTrigger += (id -> agg.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size === 3)
    perTrigger.foreach { case (id, got) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val want = delivered.groupBy(_._1).values
        .map(g => g.maxBy(r => (r._2, r._3)))
        .filter(_._4 != "del")
        .groupBy(_._4)
        .map { case (grp, rs) =>
          grp -> (rs.size.toLong, rs.map(_._5).sum)
        }
      assert(got === want, s"trigger $id diverges from rebuild")
    }
  }

  test("a tombstone keeps a late-arriving older update dead across triggers") {
    val t1 = Seq((5L, 100L, 10L, "del", "gone"))
    val t2 = Seq((5L, 50L, 5L, "put", "stale"), (6L, 60L, 6L, "put", "live"))
    val tmp = java.nio.file.Files.createTempDirectory("changelog_tomb").toString
    val views = scala.collection.mutable.ArrayBuffer
      .empty[Map[Long, (Long, Long, String, String, Long)]]
    val q = ChangelogStreams.changelogStateStream(
      triggerStream(tmp, Seq(t1, t2)), Seq("k"), Seq("ts", "seq"), "op", "del") {
      (view, _) => views += state(view)
    }
    q.processAllAvailable()
    q.stop()
    assert(views.head.isEmpty)
    assert(views.last.keySet === Set(6L))
    assert(views.last(6L) === ((60L, 6L, "put", "live", 1L)))
  }
}
