package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.operators.Similarity
import graft.streaming.ArtifactStreams

/**
 * pqArtifactStream == one-shot pqIvfArtifact over everything delivered,
 * at every trigger, under FROZEN centroids + codebooks — and the final
 * streamed artifact serves identically through ivfPqTopKServe. The PQ
 * twin of Sq8StreamSpec: the fold is a pure union (a vector arrives in
 * exactly one batch), so trigger split points are invisible.
 */
class PqStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val cents = Similarity.portableCentroids(4, dim)
  private val books = Similarity.portableCodebooks(4, 16, 4)

  private def vec(i: Long): Seq[Double] =
    (0 until dim).map(d => math.sin(i * 1.7 + d * 0.6) * 0.4)

  private val all: Seq[(Long, Seq[Double])] =
    (1L to 30L).map(i => (i, vec(i)))

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  private def rows(df: DataFrame): Set[(Long, Int, Seq[Long])] =
    df.select("n_id", "cell", "packed")
      .as[(Long, Int, Seq[Long])].collect().toSet

  test("per-trigger artifact == one-shot build; final serves identically") {
    val splits = Seq(all.take(10), all.slice(10, 21), all.drop(21))
    val tmp = java.nio.file.Files.createTempDirectory("pq_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Int, Seq[Long])])]
    var lastArt: Option[DataFrame] = None
    val q = ArtifactStreams.pqArtifactStream(stream, "vec_id", "embedding",
        cents, books) { (art, id) =>
      perTrigger += (id -> rows(art))
      lastArt = Some(art)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val want = rows(Similarity.pqIvfArtifact(
        splits.take(id.toInt + 1).flatten.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, books))
      assert(got === want, s"trigger $id diverges from the one-shot build")
    }
    // the final streamed artifact serves exactly like the one-shot build
    val queries = all.take(4).toDF("vec_id", "embedding")
    def serve(art: DataFrame): Set[(Long, Long, Int, Double)] =
      Similarity.ivfPqTopKServe(art, queries, "vec_id", "embedding",
          k = 3, centroids = cents, codebooks = books, nProbe = 2)
        .as[(Long, Long, Int, Double)].collect().toSet
    val oneShot = Similarity.pqIvfArtifact(
      all.toDF("vec_id", "embedding"), "vec_id", "embedding", cents, books)
    assert(serve(lastArt.get) === serve(oneShot))
    assert(serve(oneShot).nonEmpty)
    lastArt.foreach(graft.operators.CacheScope.unpinCheckpoint)
  }
}
