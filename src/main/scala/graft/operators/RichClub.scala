package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Rich-club coefficients (Zhou & Mondragón 2004) — do the hubs
 * interconnect? For each degree threshold k, φ(k) = 2·E_k / (N_k·(N_k−1))
 * where N_k = nodes of degree > k and E_k = edges with BOTH endpoints
 * in that club. Reported as the EXACT integer pair
 * (phi_num = 2·E_k, phi_den = N_k·(N_k−1)) — no floats, hash-exact
 * cross-engine (q224); a 0/0 row (empty or singleton club) is the
 * caller's "undefined" to interpret. The complement of q221's
 * modularity: modularity asks whether a partition cuts along sparse
 * boundaries, the rich club asks whether the degree elite forms its
 * own dense core (assortativity's q145 cousin, localized to the top).
 *
 * ONE pass, no iteration: a map-side-combined degree count, two
 * node-sized degree joins tagging each canonical edge with
 * min(deg_s, deg_d), then one bounded explode over the k-ladder
 * (fan-out = |ks| per row) and two map-side-combined counts. At
 * 100 TB the degree frame is node-sized (broadcast or co-partitioned)
 * and the ladder fan-out is a small constant.
 *
 * @param edges undirected edge list in either orientation (internally
 *              canonicalized to s < d, deduped, self-loops dropped)
 * @param ks degree thresholds; one output row per k, present even
 *              when the club is empty
 * @return (k, n_k, e_k, phi_num, phi_den) sorted by the caller
 */
object RichClub {

  def coefficients(edges: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "ks must be non-empty")
    require(ks.distinct.size == ks.size, "ks must be distinct")
    val e = edges
      .select(least(col("src"), col("dst")).cast("long").as("s"),
        greatest(col("src"), col("dst")).cast("long").as("d"))
      .filter(col("s") < col("d"))
      .distinct()
      .localCheckpoint(true)
      .transform(CacheScope.pinCheckpointed)
    // Pinned: three consumers (both tagging joins + the n_k ladder)
    // would otherwise each re-run the degree aggregate (VERDICT r10).
    val deg = CacheScope.pin(e.select(col("s").as("node"))
      .union(e.select(col("d").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg")))
    val tagged = e
      .join(deg.select(col("node").as("s"), col("deg").as("ds")), Seq("s"))
      .join(deg.select(col("node").as("d"), col("deg").as("dd")), Seq("d"))
      .select(least(col("ds"), col("dd")).as("mindeg"))
    val kCol = explode(array(ks.map(lit(_)): _*)).as("k")
    val kFrame = e.sparkSession.range(1).select(kCol)
    val nk = deg.select(kCol, col("deg"))
      .filter(col("deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
    val ek = tagged.select(kCol, col("mindeg"))
      .filter(col("mindeg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("e_k"))
    kFrame
      .join(nk, Seq("k"), "left")
      .join(ek, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_k"), lit(0L)).as("n_k"),
        coalesce(col("e_k"), lit(0L)).as("e_k"))
      .withColumn("phi_num", lit(2L) * col("e_k"))
      .withColumn("phi_den", col("n_k") * (col("n_k") - lit(1L)))
  }
}
