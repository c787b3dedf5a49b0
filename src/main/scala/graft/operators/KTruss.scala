package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-truss peeling — iteratively remove edges that sit in fewer than
 * k−2 triangles until (a fixed number of rounds of) quiescence. The
 * truss is the edge-level refinement of [[KCore]]: a node survives the
 * k-core by ANY k neighbors, but an edge survives the k-truss only via
 * closed triangles, so the truss keeps the tightly-knit community mass
 * and sheds the hub spokes that inflate cores (Cohen 2008, "Trusses:
 * cohesive subgraphs for social network analysis"). On the engine's
 * co-occurrence/trade graphs it is the natural "real clique-ish
 * structure" screen after q103 cohesion / q156 core membership.
 *
 * Fixed `rounds` keeps the recursion oracle-able (the q94/q110/q123/
 * q156 unrolling discipline): "rounds-round truss peel" EQUALS the true
 * k-truss whenever the peel converges within the budget, and the
 * returned `converged` flag says whether it did — callers assert that
 * instead of trusting it.
 *
 * Per round, ONE oriented triangle enumeration over the surviving
 * canonical edge set — wedges from the lexicographically-least corner
 * ((a,b)⋈(a,c) on a with b<c, each triangle built exactly once), closed
 * by a LEFT SEMI probe of (b,c) — then each triangle charges its three
 * edges via a 3-way union + map-side-combined count, and a left join
 * scores every edge (0 when it closes nothing). The wedge frame is the
 * q103 bound (Σ_a C(deg a, 2) on the ORIENTED degree, which the a<b<c
 * orientation keeps near-linear on power-law graphs; residual hubs →
 * [[GraphOps.degreeCapped]] upstream, the shared guard); at 100 TB the
 * canonical edge set is bucketed on `s` once and every round's wedge
 * build and semi-probe reuse the layout. Lineage truncates per round
 * (localCheckpoint, the [[PageRank]] discipline).
 *
 * @param edges edge list in either direction (internally canonicalized
 *              to s < d and deduped — multi-edges and orientation don't
 *              bias support; self-loops dropped, they close no triangle)
 * @param k truss order (k ≥ 2; every edge needs ≥ k−2 triangles)
 * @param rounds fixed peel budget; early-exits on quiescence
 * @return (s, d, support, converged) — surviving canonical edges with
 *         the support measured over the edge set ENTERING the final
 *         executed round (== support over the survivors when converged)
 */
object KTruss {

  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(rounds >= 1, "rounds must be >= 1")
    var cur = edges
      .select(least(col("src"), col("dst")).cast("long").as("s"),
        greatest(col("src"), col("dst")).cast("long").as("d"))
      .filter(col("s") < col("d"))
      .distinct()
      .withColumn("support", lit(0L))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (round < rounds && !converged) {
      val e = cur.select(col("s"), col("d"))
      val l = e.select(col("s").as("a"), col("d").as("b"))
      val r = e.select(col("s").as("a"), col("d").as("c"))
      val tri = l.join(r, Seq("a")).filter(col("b") < col("c"))
        .join(e.select(col("s").as("b"), col("d").as("c")),
          Seq("b", "c"), "left_semi")
      val sup = tri.select(col("a").as("s"), col("b").as("d"))
        .union(tri.select(col("a").as("s"), col("c").as("d")))
        .union(tri.select(col("b").as("s"), col("c").as("d")))
        .groupBy(col("s"), col("d"))
        .agg(count(lit(1)).as("support"))
      val scored = e.join(sup, Seq("s", "d"), "left")
        .select(col("s"), col("d"),
          coalesce(col("support"), lit(0L)).as("support"))
      val next = scored.filter(col("support") >= k - 2)
        .localCheckpoint(true)
      val removed = cur.count() - next.count()
      CacheScope.unpinCheckpoint(cur)
      cur = next
      converged = removed == 0L
      round += 1
    }
    // Register the bare checkpointed frame — unpinCheckpoint matches a
    // LogicalRDD leaf, so the Project the withColumn adds must sit
    // OUTSIDE the registration or the release is a no-op (ADVICE r10).
    CacheScope.pinCheckpointed(cur).withColumn("converged", lit(converged))
  }
}
