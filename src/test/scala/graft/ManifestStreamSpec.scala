package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.Manifest
import graft.streaming.ArtifactStreams

/**
 * manifestAuditStream == batch audit over everything delivered, at
 * every trigger: the (count, XOR, raw hash sum) artifact merges
 * commutatively-associatively, so trigger split points are invisible
 * and a release appended batch-by-batch can publish a manifest at any
 * trigger without rescanning. Shard-merge == single-shot is pinned in
 * batch mode too (the Bloom-parity discipline).
 */
class ManifestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def auditOf(rows: Seq[(Long, String)]): (Long, Long, java.math.BigDecimal) = {
    val r = Manifest.auditFrame(rows.toDF("id", "v")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getDecimal(2).stripTrailingZeros)
  }

  test("shard-merge audit == single-shot audit (batch parity)") {
    val rows = (0L until 300L).map(i => (i, s"v$i"))
    val (a, b, c) = (rows.slice(0, 120), rows.slice(120, 121), rows.slice(121, 300))
    val merged = Manifest.mergeAudits(
      Manifest.mergeAudits(Manifest.auditFrame(a.toDF("id", "v")),
        Manifest.auditFrame(b.toDF("id", "v"))),
      Manifest.auditFrame(c.toDF("id", "v"))).collect()(0)
    val single = auditOf(rows)
    assert((merged.getLong(0), merged.getLong(1),
      merged.getDecimal(2).stripTrailingZeros) == single)
    // and merge order is invisible
    val swapped = Manifest.mergeAudits(
      Manifest.auditFrame(c.toDF("id", "v")),
      Manifest.mergeAudits(Manifest.auditFrame(b.toDF("id", "v")),
        Manifest.auditFrame(a.toDF("id", "v")))).collect()(0)
    assert((swapped.getLong(0), swapped.getLong(1),
      swapped.getDecimal(2).stripTrailingZeros) == single)
  }

  test("per-trigger audit artifact == batch audit of all rows delivered") {
    val rows = (0L until 500L).map(i => (i, s"v$i"))
    val splits = Seq(rows.slice(0, 180), rows.slice(180, 390),
      rows.slice(390, 500))
    val tmp = java.nio.file.Files.createTempDirectory("manifest_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("id", "v").coalesce(1).write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, (Long, Long, java.math.BigDecimal))]
    val q = ArtifactStreams.manifestAuditStream(stream) { (art, id) =>
      val r = art.collect()(0)
      perTrigger += (id -> ((r.getLong(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)))
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val want = auditOf(splits.take(id.toInt + 1).flatten)
      assert(got == want, s"trigger $id diverges from batch audit")
    }
  }
}
