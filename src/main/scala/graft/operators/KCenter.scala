package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Greedy k-center coreset selection over an embedding column — the
 * diversity-sampling face of data curation: where [[Similarity]]'s
 * SemDeDup removes near-identical vectors, k-center picks the k vectors
 * that best COVER the corpus (classic farthest-point traversal, the
 * 2-approximation to the k-center objective and the seeding step of
 * coreset/active-learning pipelines).
 *
 * Exactness: embeddings are micro-quantized (`round(v·10⁶)` as long) and
 * distances are exact integer squared-L2 (for d=64, unit-scale vectors,
 * d² ≤ 64·(2.4·10⁶)² ≈ 3.7·10¹⁴ — inside both int64 and the 2⁵³ exact-
 * double range), so the greedy trajectory is bit-identical on any engine
 * and the whole selection sits under a DuckDB oracle that unrolls the k
 * rounds CTE-for-CTE (q117, the q94/q104/q110 discipline). Seed = min
 * id; ties on distance break to the smaller id.
 *
 * Scale shape: the chosen centers are O(k·d) driver state (the
 * legitimate driver collect, same class as KMeans' centroids); each
 * round is ONE map-side-combined `max(struct(dist, −id, vec))`
 * aggregation over the corpus with all current centers inlined as
 * codegen'd array literals — no join, no shuffle of the data, k scans
 * total (or k/blockSize with the standard batched-farthest variant —
 * noted, not needed at this k). The quantized frame is pinned once via
 * [[CacheScope]] so the k passes don't re-read parquet.
 */
object KCenter {

  /** Exact integer squared-L2 between the row's `qv` and a center. */
  private def d2(center: Array[Long]): Column =
    aggregate(
      zip_with(col("qv"), array(center.map(lit).toIndexedSeq: _*),
        (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Farthest-point traversal: k rows (sel_round, vec_id, d2) where d2
    * is the point's min squared distance to all previously chosen
    * centers at selection time (0 for the seed). */
  def select(vecs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    val q = CacheScope.pin(vecs.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol),
        x => round(x.cast("double") * lit(1e6)).cast("long")).as("qv")))
    // Seed: min id (with its vector, via lexicographic struct min).
    val seedRow = q.select(min(struct(col("id"), col("qv"))).as("s"))
      .select(col("s.id"), col("s.qv")).head()
    var centers = Vector(
      (seedRow.getLong(0), seedRow.getSeq[Long](1).toArray))
    val picks = Vector.newBuilder[(Int, Long, Long)]
    picks += ((0, centers.head._1, 0L))
    for (r <- 1 until k) {
      val dmin = centers.map(c => d2(c._2)).reduce(least(_, _))
      // One agg per round: farthest point, ties to smaller id, vector
      // rides along in the struct (never compared — id is unique).
      val w = q.select(max(struct(dmin.as("d"), (-col("id")).as("nid"),
        col("qv").as("qv"))).as("s"))
        .select(col("s.d"), col("s.nid"), col("s.qv")).head()
      val id = -w.getLong(1)
      centers :+= ((id, w.getSeq[Long](2).toArray))
      picks += ((r, id, w.getLong(0)))
    }
    picks.result().toDF("sel_round", "vec_id", "d2")
      .select(col("sel_round").cast("int").as("sel_round"),
        col("vec_id"), col("d2"))
  }
}
