package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.SpanDedup
import graft.streaming.CurationStreams

/**
 * spanProbeStream == batch probeSpans of each trigger's docs against the
 * digests of everything delivered BEFORE it (plus the bootstrap) — the
 * q186 probe run continuously, across non-chronological trigger splits.
 */
class SpanProbeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4
  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("per-trigger spans == batch probe against prior deliveries + bootstrap") {
    val passA = (0 until W + 2).map(i => s"pa$i").mkString(" ")
    val passB = (0 until W + 1).map(i => s"pb$i").mkString(" ")
    val boot = Seq(900L -> s"boot0 boot1 $passA tail0").toDF("doc_id", "text")
    val splits: Seq[Seq[(Long, String)]] = Seq(
      // trigger 0: repeats the BOOTSTRAP passage (flagged) + introduces B
      Seq(1L -> s"x0 x1 $passA x2 x3", 2L -> s"y0 $passB y1"),
      // trigger 1: repeats B from trigger 0 (flagged) + fresh text
      Seq(3L -> s"z0 z1 z2 $passB", 4L -> "f0 f1 f2 f3 f4 f5"),
      // trigger 2: repeats its OWN batch-mate's text — NOT flagged
      // (within-batch is duplicateSpans' job) — plus trigger-1 fresh text
      Seq(5L -> "w0 w1 w2 w3 w4 w5", 6L -> "w0 w1 w2 w3 w4 w5",
        7L -> "f0 f1 f2 f3 f4 f5"))
    val tmp = java.nio.file.Files.createTempDirectory("span_probe").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Int, Int, Long)]]
    val bootArt = SpanDedup.corpusWindowDigests(boot, "doc_id", "text", W)
    val q = CurationStreams.spanProbeStream(stream, "doc_id", "text",
      window = W, seenDigests = Some(bootArt)) { out =>
      perTrigger += out.as[(Long, Int, Int, Long)].collect().toSet
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.zipWithIndex.foreach { case (got, i) =>
      val prior = boot.unionByName(
        splits.take(i).flatten.toDF("doc_id", "text"))
      val want = SpanDedup.probeSpans(splits(i).toDF("doc_id", "text"),
        "doc_id", "text",
        SpanDedup.corpusWindowDigests(prior, "doc_id", "text", W), W)
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(got == want, s"trigger $i diverges from batch probe")
    }
    // Shape pins: trigger 0 flags the bootstrap repeat, trigger 1 flags
    // B, trigger 2 flags ONLY doc 7 (within-batch twins stay silent).
    assert(perTrigger(0).exists(_._1 == 1L))
    assert(perTrigger(1).exists(_._1 == 3L))
    assert(perTrigger(2).map(_._1) == Set(7L))
  }
}
