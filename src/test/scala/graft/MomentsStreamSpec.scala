package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators.Pca
import graft.streaming.ArtifactStreams

/**
 * Streaming PCA-moment maintenance == batch momentsMicro over
 * everything delivered (the associative fold of ArtifactStreams applied
 * to the q115 artifact), across trigger splits; the fitted components
 * off the streamed artifact equal the batch fit exactly.
 */
class MomentsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6
  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def gen(seed: Int, n: Int): Seq[(Long, Seq[Float])] = {
    val r = new Random(seed)
    (0 until n).map(i =>
      i.toLong -> Seq.fill(dim)((r.nextGaussian() * 0.3).toFloat))
  }

  private def cells(df: DataFrame): Map[(Long, Long), (Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("per-trigger artifact == batch moments of all rows delivered") {
    val rows = gen(5, 120)
    val splits = Seq(rows.slice(0, 40), rows.slice(40, 75), rows.slice(75, 120))
    val tmp = java.nio.file.Files.createTempDirectory("moments_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(Long, Long), (Long, Long, Long, Long)])]
    val q = ArtifactStreams.momentsStream(stream, "embedding", dim) {
      (art, id) => perTrigger += (id -> cells(art))
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size === 3)
    perTrigger.foreach { case (id, got) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val want = cells(Pca.momentsMicro(
        delivered.toDF("vec_id", "embedding"), "embedding", dim))
      assert(got === want, s"trigger $id diverges from batch")
    }
    // The final streamed artifact fits to the identical spectrum.
    val batchMoments = Pca.momentsMicro(
      rows.toDF("vec_id", "embedding"), "embedding", dim)
    val (eigB, _) = Pca.fit(batchMoments, dim)
    val streamedDf = perTrigger.last._2.toSeq.map { case ((i, j), (n, si, sj, sij)) =>
      (i, j, n, si, sj, sij)
    }.toDF("i", "j", "n_vecs", "s_i", "s_j", "s_ij")
    val (eigS, _) = Pca.fit(streamedDf, dim)
    assert(eigB.zip(eigS).forall { case (a, b) => a == b })
  }
}
