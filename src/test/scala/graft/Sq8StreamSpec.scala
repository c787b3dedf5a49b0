package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.operators.Similarity
import graft.streaming.ArtifactStreams

/**
 * sq8ArtifactStream == batch coding over everything delivered, at every
 * trigger, under FROZEN centroids + quantization stats — and the final
 * streamed artifact serves identically to a single-shot
 * sq8IvfArtifact build. Also pins the FAISS-style saturation of
 * out-of-domain arrivals (a streamed value below the frozen per-dim min
 * codes to 0, above the max to 255) — the clamp that keeps an append
 * from ever producing an unpackable code word.
 */
class Sq8StreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val cents: Array[Array[Double]] =
    Array(Array.fill(dim)(-3.0), Array.fill(dim)(3.0))

  private def vec(i: Long): Seq[Double] =
    (0 until dim).map(d => ((i * 7 + d * 3) % 13).toDouble - 6.0)

  private val all: Seq[(Long, Seq[Double])] =
    (1L to 24L).map(i => (i, vec(i)))

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  private type ArtRow = (Long, Int, Seq[Long])
  private def rows(df: DataFrame): Set[ArtRow] =
    df.select("n_id", "cell", "packed")
      .as[(Long, Int, Seq[Long])].collect().toSet

  test("per-trigger artifact == frozen-stats batch coding; final serves like one-shot") {
    val (batchArt, batchCents, stats) = Similarity.sq8IvfArtifact(
      all.toDF("vec_id", "embedding"), "vec_id", "embedding", dim,
      fixedCentroids = Some(cents))
    val frozenStats = stats.localCheckpoint(true)
    val splits = Seq(all.take(8), all.slice(8, 17), all.drop(17))
    val tmp = java.nio.file.Files.createTempDirectory("sq8_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[ArtRow])]
    var lastArt: Option[DataFrame] = None
    val q = ArtifactStreams.sq8ArtifactStream(stream, "vec_id", "embedding",
        dim, cents, frozenStats) { (art, id) =>
      perTrigger += (id -> rows(art))
      lastArt = Some(art)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val want = rows(Similarity.sq8CodeBatch(
        splits.take(id.toInt + 1).flatten.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim, cents, frozenStats))
      assert(got === want, s"trigger $id diverges from batch coding")
    }
    // Frozen stats came from the full corpus, so the final streamed
    // artifact IS the one-shot build…
    assert(rows(lastArt.get) === rows(batchArt))
    // …and serves identically.
    val queries = all.take(5).toDF("vec_id", "embedding")
    def serve(art: DataFrame): Seq[(Long, Int, Long, Long)] =
      Similarity.ivfTopKQuantizedServe(art, batchCents, frozenStats,
          queries, "vec_id", "embedding", dim, k = 3, nProbe = 2)
        .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    assert(serve(lastArt.get) === serve(batchArt) && serve(batchArt).nonEmpty)
  }

  test("out-of-domain arrivals saturate like FAISS scalar quantization") {
    val stats = Similarity.sq8IvfArtifact(
      all.toDF("vec_id", "embedding"), "vec_id", "embedding", dim,
      fixedCentroids = Some(cents))._3.localCheckpoint(true)
    // dim 0: far below every corpus value → code 0; dim 1: far above →
    // code 255; the rest in range.
    val outlier = Seq((99L, Seq(-100.0, 100.0) ++ vec(5L).drop(2)))
      .toDF("vec_id", "embedding")
    val codes = Similarity.sq8CodeBatch(outlier, "vec_id", "embedding",
        dim, cents, stats)
      .select(col("n_id"), Similarity.unpackCodes(col("packed"), dim)
        .as("codes"))
      .as[(Long, Seq[Long])].collect().head._2
    assert(codes(0) == 0L && codes(1) == 255L)
    assert(codes.forall(c => c >= 0L && c <= 255L))
  }
}
