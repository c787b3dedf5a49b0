package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.SearchIndex
import graft.streaming.ArtifactStreams

/**
 * searchIndexStream == batch SearchIndex.build over everything
 * delivered, at every trigger — the per-(tok, doc_shard) merge
 * (df/tf_total sum, postings sorted concat) is associative because a
 * doc arrives in exactly one batch, so cells' posting sets are
 * batch-disjoint. Also pins that a search SERVED from the streamed
 * artifact equals one served from the batch-built artifact.
 */
class SearchIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val docs: Seq[(Long, String)] = (1L to 30L).map(i =>
    (i, s"the doc$i data the value${i % 7} common term${i % 3} the end"))

  private type Row5 = (String, Int, Long, Long, Seq[(Long, Long)])
  private def rows(df: DataFrame): Set[Row5] =
    df.select("tok", "doc_shard", "df", "tf_total", "postings")
      .as[(String, Int, Long, Long, Seq[(Long, Long)])].collect().toSet

  test("per-trigger artifact == batch build over delivered docs; searches match") {
    val splits = Seq(docs.take(10), docs.slice(10, 22), docs.drop(22))
    val tmp = java.nio.file.Files.createTempDirectory("six_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[Row5])]
    var lastArtifact: Option[DataFrame] = None
    val q = ArtifactStreams.searchIndexStream(stream, "doc_id", "text",
        nDocShards = 4) { (art, id) =>
      perTrigger += (id -> rows(art))
      lastArtifact = Some(art)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val want = rows(SearchIndex.build(
        splits.take(id.toInt + 1).flatten.toDF("doc_id", "text"),
        "doc_id", "text", nDocShards = 4))
      assert(got === want, s"trigger $id diverges from the batch build")
    }
    // A conjunctive search served from the STREAMED artifact equals one
    // served from the batch-built artifact.
    val streamedDir =
      java.nio.file.Files.createTempDirectory("six_art").toString + "/ix"
    val batchDir =
      java.nio.file.Files.createTempDirectory("six_bat").toString + "/ix"
    SearchIndex.write(lastArtifact.get, streamedDir)
    SearchIndex.write(SearchIndex.build(docs.toDF("doc_id", "text"),
      "doc_id", "text", nDocShards = 4), batchDir)
    val terms = Seq("the", "common")
    val viaStream = SearchIndex.searchConjunctive(spark, streamedDir, terms)
      .as[(Long, Long)].collect().toMap
    val viaBatch = SearchIndex.searchConjunctive(spark, batchDir, terms)
      .as[(Long, Long)].collect().toMap
    assert(viaStream === viaBatch && viaBatch.nonEmpty)
  }
}
