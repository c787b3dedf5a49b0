package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Multi-source BFS hop distances — "how far is every node from this
 * seed set" over the graphs this engine materializes (the reference's
 * social-network surface stops at direct links,
 * /root/reference/src/SocialNetworkDCO.groovy:53-84; hop distance is the
 * standard reachability refinement, and the building block for
 * neighborhood sampling / k-hop subgraph extraction in a training-data
 * pipeline). All-integer state, so the whole fixed-depth recursion sits
 * under an exact DuckDB hash oracle (q138) with one unrolled CTE pair
 * per hop — the q94 PageRank discipline.
 *
 * Frontier algorithm, per hop: expand the CURRENT frontier along edges
 * (one equi-join), drop already-visited nodes (anti-join against the
 * accumulated distance table), tag survivors with hop h. Each iteration
 * is ONE shuffle — the `distinct` on the expanded frontier; the
 * visited/frontier tables are node-sized (two longs per row) and
 * broadcast below `broadcastNodeLimit`, so the edge table is never
 * re-shuffled (bucket it by `src` once at 100 TB and every hop reuses
 * the layout). Lineage is truncated per hop with an eager
 * localCheckpoint ([[PageRank]]/[[ConnectedComponents]] discipline).
 * Early exit when a frontier empties costs one O(1) `isEmpty` action
 * per hop and cannot change the result — an empty frontier stays empty.
 *
 * Unreached nodes are ABSENT from the output (not ∞-rows): at graph
 * scale the reachable set is usually the small side, and absence
 * composes with a left join wherever a sentinel is wanted.
 */
object Bfs {

  /**
   * @param edges directed edge list with long columns `src`, `dst`
   *              (symmetrize upstream for an undirected graph)
   * @param seeds one long column `node_id`; distance 0. Seeds not
   *              present in the graph are still emitted at hop 0 —
   *              they are valid (isolated) sources.
   * @param maxHops fixed depth cap (the oracle-able form; also the
   *              k-hop-neighborhood operating point)
   * @return (node_id, hops) — minimal hop count ≤ maxHops, one row per
   *         reached node
   */
  def hopDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      broadcastNodeLimit: Long = 10000000L): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = e.select(col("src")).union(e.select(col("dst")))
      .distinct().count()
    val bcast = nNodes <= broadcastNodeLimit
    def nodeSized(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df

    var dist = seeds.select(col("node_id").cast("long"))
      .distinct().withColumn("hops", lit(0)).localCheckpoint()
    var frontier = dist
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val next = e.join(nodeSized(frontier), e("src") === col("node_id"))
        .select(e("dst").as("node_id")).distinct()
        .join(nodeSized(dist.select(col("node_id").as("vnode"))),
          col("node_id") === col("vnode"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint()
      if (next.isEmpty) {
        CacheScope.unpinCheckpoint(next)
        done = true
      } else {
        val acc = dist.union(next).localCheckpoint()
        CacheScope.unpinCheckpoint(dist)
        CacheScope.unpinCheckpoint(frontier)
        // `next` doubles as the new frontier; keep it pinned until the
        // following round's expansion has consumed it.
        dist = acc
        frontier = next
      }
      h += 1
    }
    if (frontier ne dist) CacheScope.unpinCheckpoint(frontier)
    e.unpersist()
    CacheScope.pinCheckpointed(dist)
  }

  /** Weighted shortest distances by fixed-round relaxation (unrolled
    * Bellman–Ford): after R rounds, `dist(v)` is the exact shortest
    * distance over paths of ≤ R edges — the oracle-able form of the
    * recursion ([[hopDistances]] is the w≡1 special case, but keeps its
    * frontier optimization; relaxation must re-visit settled nodes
    * because a longer-hop path can be shorter by weight). Per round:
    * ONE candidate aggregation (min over incoming relaxations, map-side
    * combined) + a node-sized full-outer reconcile, edge table never
    * re-shuffled below `broadcastNodeLimit`. Weights must be
    * non-negative integers (negative edges would need the full R=V−1
    * rounds AND a negative-cycle check; integer sums keep every
    * distance bit-identical cross-engine).
    *
    * @param edges (src, dst, w) directed; symmetrize upstream
    * @return (node_id, dist) for nodes reachable within `rounds` edges */
  def relaxDistances(edges: DataFrame, seeds: DataFrame, rounds: Int,
      broadcastNodeLimit: Long = 10000000L): DataFrame = {
    require(rounds >= 0, "rounds must be >= 0")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = e.select(col("src")).union(e.select(col("dst")))
      .distinct().count()
    val bcast = nNodes <= broadcastNodeLimit
    def nodeSized(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df

    var dist = seeds.select(col("node_id").cast("long"))
      .distinct().withColumn("dist", lit(0L)).localCheckpoint()
    var r = 0
    while (r < rounds) {
      // Reconcile as ONE union + map-side-combined min (round 15): the
      // old shape was a separate relaxation aggregate followed by a
      // node-sized FULL-OUTER join — full outer cannot broadcast, so
      // every round paid three exchanges (relaxation groupBy + both join
      // sides) plus two sorts. min over {current dist} ∪ {relaxations}
      // per node is the identical value (least(coalesce…) over the two
      // aggregates == min of the union group), for one exchange.
      val relax = e.join(nodeSized(dist), e("src") === col("node_id"))
        .select(e("dst").as("node_id"), (col("dist") + col("w")).as("dist"))
      val next = dist.select(col("node_id"), col("dist"))
        .unionByName(relax)
        .groupBy(col("node_id")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      CacheScope.unpinCheckpoint(dist)
      dist = next
      r += 1
    }
    e.unpersist()
    CacheScope.pinCheckpointed(dist)
  }
}
