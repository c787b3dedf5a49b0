package graft

import java.security.MessageDigest

import graft.operators.Curation

/**
 * A-ES weighted sampling (q120): exact cross-check against a sequential
 * reference sharing the md5 draw, plus the statistical property the
 * oracle can't see — inclusion frequency tracks weight across
 * independent salts.
 */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex8(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private def refSample(rows: Seq[(Long, Long)], k: Int, salt: String): Seq[Long] =
    rows.filter(_._2 > 0).map { case (id, w) =>
      val h = md5hex8(s"$salt|$id")
      val key = math.round(math.log((h + 1) / 4294967296.0) / w * 1e9)
      (id, key)
    }.sortBy { case (id, key) => (-key, id) }.take(k).map(_._1)

  test("matches the sequential A-ES reference (incl. zero-weight drop)") {
    val rows: Seq[(Long, Long)] =
      (0L until 200L).map(i => i -> (i % 17 + 1)) :+ (500L -> 0L)
    val df = rows.toDF("doc_id", "w")
    for (salt <- Seq("a", "b", "c")) {
      val got = Curation.weightedSample(df, "doc_id", "w", k = 10, salt)
        .collect().map(_.getLong(0)).toSeq
      assert(got === refSample(rows, 10, salt), s"salt=$salt")
      assert(!got.contains(500L))
    }
  }

  test("streaming reservoir == batch sample over everything delivered") {
    import org.apache.spark.sql.types._
    val rows: Seq[(Long, Long)] = (0L until 90L).map(i => i -> (i % 13 + 1))
    val splits = Seq(rows.slice(0, 30), rows.slice(30, 60), rows.slice(60, 90))
    val tmp = java.nio.file.Files.createTempDirectory("reservoir").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("doc_id", "w").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("w", LongType))))
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = graft.streaming.ArtifactStreams.weightedReservoirStream(
      stream, "doc_id", "w", k = 8, salt = "rs") { (res, id) =>
      perTrigger += (id -> res.collect().map(_.getLong(0)).toSeq.sorted)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size === 3)
    perTrigger.foreach { case (id, got) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val want = Curation.weightedSample(delivered.toDF("doc_id", "w"),
        "doc_id", "w", k = 8, salt = "rs")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(got === want, s"trigger $id diverges from batch sample")
    }
  }

  test("inclusion frequency tracks weight: heavy item wins ~w/(W) of draws") {
    // One item at weight 200 among 99 at weight 1: P(win at k=1) = 200/299.
    val rows = (0L until 99L).map(_ -> 1L) :+ (999L -> 200L)
    // Sequential reference is exact == distributed (test above), so the
    // frequency sweep can run driver-side for speed.
    val wins = (1 to 150).count(s => refSample(rows, 1, s"salt$s").head == 999L)
    // E ≈ 100, sd ≈ 5.9 — a generous ±4 sd band.
    assert(wins > 76 && wins < 124, s"heavy item won $wins/150")
  }
}
