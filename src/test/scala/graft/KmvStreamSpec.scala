package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Sketches
import graft.streaming.ArtifactStreams

/**
 * kmvStream == batch kmvBuild over everything delivered, at every
 * trigger — the union-rerank fold is associative AND idempotent
 * (re-delivered values change nothing), so the carried artifact is
 * exactly the single-shot build's minima set.
 */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("v", StringType)))

  test("per-trigger artifact == batch build of all rows delivered") {
    val rows = (0 until 600).map(i => (s"g${i % 2}", s"v$i"))
    val splits = Seq(rows.slice(0, 200), rows.slice(200, 450),
      rows.slice(450, 600) ++ rows.slice(0, 50)) // trigger 3 re-delivers
    val tmp = java.nio.file.Files.createTempDirectory("kmv_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("g", "v").coalesce(1).write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(String, Long)])]
    val q = ArtifactStreams.kmvStream(stream, Seq("g"), "v", k = 16) {
      (art, id) => perTrigger += (id ->
        art.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val want = Sketches.kmvBuild(delivered.toDF("g", "v"), Seq("g"),
        "v", k = 16).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"trigger $id diverges from batch build")
    }
  }
}
