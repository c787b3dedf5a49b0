package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 diagnostic (the evidence behind [[graft.operators.Similarity.autoNavDegree]] /
  * [[graft.operators.Similarity.autoEntryCells]]): is the 512-cell
  * beam-agreement decay a BUDGET problem (recoverable by a deeper or
  * wider walk) or intrinsic to the fixture? The ladder showed the
  * dominant levers are the nav graph's CONSTRUCTION DEGREE (deg 8 vs 4:
  * 0.842 vs 0.569 at identical walk budget) and the ENTRY set (2 → 8:
  * +0.23), with depth a distant third — which is why those two became
  * auto-sized alongside beamWidth/depth. Not part of any gate; prints
  * agree for a (degree, longLinks, beamWidth, depth, entryCells)
  * ladder against the dense probe at 512 cells. */
object BeamProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.pin.checkpoint", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nLists = 512
    val vecs = spark.range(4000L)
      .select(col("id").as("vec_id"),
        expr("""transform(sequence(1, 64), i ->
          CAST((CAST(pmod(conv(substring(md5(concat('ctr|',
            CAST(pmod(id, 64) AS STRING), '|', CAST(i AS STRING))),
            1, 6), 16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5)
            + 0.1 * (CAST(pmod(conv(substring(md5(concat(
            CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
            16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5) AS FLOAT))""")
          .as("embedding"))
      .localCheckpoint(true)
    val queries = vecs.filter(col("vec_id") < 200)
    val cents = graft.operators.Similarity.trainCentroids(
      vecs, "embedding", nLists = nLists)
    val books = graft.operators.Similarity.pqTrainCodebooks(
      vecs, "embedding")
    val art = graft.operators.Similarity.pqIvfArtifact(
        vecs, "vec_id", "embedding", cents, books)
      .localCheckpoint(true)
    val centDf = spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "centroid").localCheckpoint(true)
    val dense = {
        graft.operators.Similarity.ivfPqTopKServe(art, queries,
            "vec_id", "embedding", k = 5, centroids = cents,
            codebooks = books, nProbe = 4)
          .select(col("q_id"), col("n_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for ((deg, ll) <- Seq((4, 3), (8, 3));
         (bw, dp, ec) <- Seq((36, 5, 2), (36, 7, 2), (64, 7, 2),
           (36, 5, 8), (64, 9, 8))) {
      val (beamed, caches) = graft.operators.CacheScope.tracking {
          val nav = graft.operators.CacheScope.pin(
            graft.operators.Similarity.buildNavGraph(
              centDf, degree = deg, longLinks = ll))
          graft.operators.Similarity.ivfPqBeamServe(art, queries,
              "vec_id", "embedding", k = 5, centroids = centDf,
              nav = nav, codebooks = books, beamWidth = bw,
              depth = dp, entryCells = ec, nProbe = 4)
            .select(col("q_id"), col("n_id"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      caches.release()
      val agree = (dense & beamed).size.toDouble / math.max(1, dense.size)
      println(s"PROBE deg=$deg ll=$ll bw=$bw dp=$dp ec=$ec " +
        s"agree=${"%.3f".format(agree)}")
    }
    spark.stop()
  }
}
