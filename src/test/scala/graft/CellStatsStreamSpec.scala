package graft

import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.ArtifactStreams

/**
 * cellStatsStream == batch cellStats over everything delivered, at
 * every trigger: the per-cell count artifact folds by associative cell
 * sum, so trigger split points are invisible and the skew report that
 * tunes nProbe/beamWidth stays current as the corpus grows — no rescan.
 */
class CellStatsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val nCells = 4
  private val cents = Similarity.portableCentroids(nCells, dim)

  private def vec(i: Long): Seq[Float] =
    (0 until dim).map(j => ((i * 7 + j * 3) % 13).toFloat / 13f - 0.5f)

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def reportOf(rows: Seq[(Long, Seq[Float])]): Seq[(Int, Long, Long)] =
    Similarity.cellStats(rows.toDF("vec_id", "embedding"), "vec_id",
      "embedding", cents)
      .orderBy(col("cell"))
      .as[(Int, Long, Long)].collect().toSeq

  test("per-trigger count artifact reads as the batch report of all rows delivered") {
    val rows = (0L until 90L).map(i => (i, vec(i)))
    val splits = Seq(rows.slice(0, 40), rows.slice(40, 41), rows.slice(41, 90))
    val tmp = java.nio.file.Files.createTempDirectory("cellstats_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Int, Long, Long)])]
    val q = ArtifactStreams.cellStatsStream(stream, "embedding", cents) {
      (art, id) =>
        val report = Similarity.cellStatsFromCounts(spark, art, nCells)
          .orderBy(col("cell")).as[(Int, Long, Long)].collect().toSeq
        perTrigger += (id -> report)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val want = reportOf(splits.take(id.toInt + 1).flatten)
      assert(got == want, s"trigger $id diverges from batch cellStats")
    }
    // every cell is present in every report, empties included
    assert(perTrigger.forall(_._2.map(_._1) == (0 until nCells)))
  }
}
