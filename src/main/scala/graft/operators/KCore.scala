package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * k-core peeling — iteratively remove nodes of degree < k until (a
 * fixed number of rounds of) quiescence: the densest-substructure
 * screen after q94 centrality / q103 cohesion / q123 membership /
 * q138 reachability. The k-core is where the co-occurrence graph's
 * "real" community mass lives; peeling is the standard cheap
 * approximation of density that needs no triangle enumeration.
 *
 * Fixed `rounds` keeps the recursion oracle-able (the q94/q110/q123
 * unrolling discipline): the semantics are "rounds-round k-peel",
 * which EQUALS the true k-core whenever the peel converges within the
 * budget — the returned frame carries `converged` (no node was removed
 * in the final round) so callers can assert that instead of trusting
 * it. Each round is ONE map-side-combined degree count over the
 * surviving edge set + two semi-joins that AQE broadcasts while the
 * survivor set is node-sized; lineage truncates per round
 * (localCheckpoint, the [[PageRank]] discipline).
 *
 * @param edges directed edge list (symmetrize upstream for undirected
 *              degree semantics; multi-edges count toward degree)
 * @return (node_id, deg, converged) — surviving nodes with their
 *         final-round degree over the surviving subgraph
 */
object KCore {

  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var survivors = e.select(col("src").as("node_id")).distinct()
      .localCheckpoint()
    // Carry the survivor count across rounds: each round's count() is the
    // next round's previous count, so one count job per round suffices
    // (the old per-round survivors.count() re-counted the same cached
    // frame the previous round had already counted).
    var nSurv = survivors.count()
    var converged = false
    var round = 0
    while (round < rounds && !converged) {
      val se = e
        .join(survivors.select(col("node_id").as("_s1")),
          col("src") === col("_s1"), "left_semi")
        .join(survivors.select(col("node_id").as("_s2")),
          col("dst") === col("_s2"), "left_semi")
      val deg = se.groupBy(col("src").as("node_id"))
        .agg(count(lit(1)).as("deg"))
      val next = deg.filter(col("deg") >= k)
        .select(col("node_id"), col("deg")).localCheckpoint()
      val nNext = next.count()
      val removed = nSurv - nNext
      CacheScope.unpinCheckpoint(survivors)
      survivors = next
      nSurv = nNext
      converged = removed == 0L
      round += 1
    }
    e.unpersist()
    // Bare checkpointed frame registered, Project applied outside —
    // unpinCheckpoint only matches a LogicalRDD leaf (ADVICE r10).
    CacheScope.pinCheckpointed(survivors)
      .withColumn("converged", lit(converged))
  }
}
