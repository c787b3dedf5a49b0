package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Fixed-point integer PageRank — node centrality for the entity/actor
 * graphs this engine materializes (the co-occurrence network of
 * /root/reference/src/SocialNetworkDCO.groovy:53-84 ranks "who is central"
 * only by raw degree, `num_docs`; PageRank is the standard global
 * refinement of exactly that table).
 *
 * All arithmetic is 64-bit integer fixed-point (ranks are multiples of
 * 1/`scale`), so every engine that floor-divides bigints computes the
 * bit-identical result — no float summation-order sensitivity — which is
 * what lets the whole 5-iteration recursion sit under an exact DuckDB
 * hash oracle (q94). The recursion, per iteration:
 *
 *   contrib(u)  = rank(u) div outdeg(u)
 *   dshare      = (Σ rank over dangling nodes) div N
 *   rank'(v)    = (base · scale) div 100
 *               + (damp · (Σ_{u→v} contrib(u) + dshare)) div 100
 *
 * with damp/base = 85/15 (the classic 0.85 damping as an exact rational).
 * Dangling mass is redistributed uniformly, so total mass stays ~N·scale
 * (up to floor-rounding) and ranks are comparable across graphs.
 *
 * Scale shape: each iteration is ONE shuffle — the contribs groupBy on
 * `dst`; the rank⋈degree join co-partitions on the node key and AQE keeps
 * it local once the edge table is bucketed by `src` (at 100 TB, write the
 * edge list bucketed by src once and every iteration reuses that layout).
 * Lineage is truncated per iteration with an eager localCheckpoint — the
 * classic iterative-Spark discipline (same as [[ConnectedComponents]]);
 * without it the plan doubles per round and round 5 replays rounds 1-4.
 * The dangling term is a 1-row aggregate crossJoin-broadcast back — no
 * driver-side collect. Overflow headroom: Σ rank ≈ N·scale must stay
 * under 2⁶³/damp ≈ 10¹⁷ — at the default scale=10⁹ that is 10⁸ nodes;
 * for a larger graph drop `scale` a decade per decade of N.
 */
object PageRank {

  /**
   * @param edges directed edge list with long columns `src`, `dst`
   *              (symmetrize upstream for an undirected graph); multi-edges
   *              are NOT collapsed (a repeated (src,dst) row contributes
   *              twice, and counts twice in outdeg — dedup upstream if the
   *              input is a multigraph).
   * @param iterations fixed iteration count (the oracle-able form;
   *              convergence-threshold stopping would need a float norm)
   * @param scale fixed-point denominator; initial rank(v) = scale ("1.0")
   * @return (node_id, rank) — rank is the fixed-point integer, final
   *         iteration's value, one row per distinct endpoint
   */
  def run(edges: DataFrame, iterations: Int = 5,
      scale: Long = 1000000000L, damp: Long = 85L,
      broadcastNodeLimit: Long = 10000000L): DataFrame =
    iterate(edges, None, iterations, scale, damp, broadcastNodeLimit)

  /**
   * PERSONALIZED PageRank: random-walk-with-restart relevance TO a seed
   * set instead of global centrality — "which nodes matter from HERE",
   * the recommendation/expansion query over the same entity graphs
   * (seeded at one customer it ranks the suppliers/customers reachable
   * through shared purchases). Identical integer fixed-point recursion,
   * with the teleport and the dangling mass restarting at the SEEDS:
   *
   *   rank₀(v)  = scale·1{v ∈ S}
   *   rank'(v)  = 1{v ∈ S}·(base·scale) div 100
   *             + (damp·(Σ_{u→v} contrib(u) + 1{v ∈ S}·(dmass div |S|))) div 100
   *
   * Non-seed nodes with no inflow stay at rank 0, so the output is
   * naturally sparse around the seeds. Same per-iteration shuffle shape
   * as [[run]] (the seed flag joins in as one more node-sized broadcast);
   * oracle-able for the same reason (q183 unrolls it).
   *
   * @param seeds one long column of seed node ids (deduped internally;
   *              ids absent from the edge-derived node set are ignored —
   *              they could never receive rank or restart mass, so
   *              counting them into the teleport divisor would silently
   *              leak their share of the dangling mass; the surviving
   *              set must be non-empty)
   */
  def personalized(edges: DataFrame, seeds: DataFrame, iterations: Int = 5,
      scale: Long = 1000000000L, damp: Long = 85L,
      broadcastNodeLimit: Long = 10000000L): DataFrame =
    iterate(edges, Some(seeds), iterations, scale, damp, broadcastNodeLimit)

  private def iterate(edges: DataFrame, seedsOpt: Option[DataFrame],
      iterations: Int, scale: Long, damp: Long,
      broadcastNodeLimit: Long): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(damp >= 0 && damp <= 100, "damp is a percentage")
    val base = 100L - damp

    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // `dnode` alias: deg/nodes derive from `e`, so an un-aliased `src`
    // would carry e's exprId into the per-iteration joins below and make
    // `e("src") === …` self-join-ambiguous.
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("dnode"), col("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Teleport targets: every node (global PageRank, indicator t = 1) or
    // the seed set (personalized, t = 1{v ∈ S}). The target count rides
    // as a broadcast 1-row frame — the dangling share needs it inside the
    // plan, and a driver-side count() here would add an extra job per call.
    val seedFlag = seedsOpt.map { s =>
      // Semi-join to the node set FIRST: an out-of-graph seed has no row
      // anywhere in the recursion, so it must not count into n_t either.
      s.select(col(s.columns.head).cast("long").as("node_id"))
        .distinct()
        .join(nodes, Seq("node_id"), "left_semi")
        .withColumn("is_seed", lit(1))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val tnodes = (seedFlag match {
      case Some(sf) => nodes.join(broadcast(sf), Seq("node_id"), "left")
        .withColumn("t", coalesce(col("is_seed"), lit(0)))
      case None => nodes.withColumn("t", lit(1))
    }).select(col("node_id"), col("t"))
    // Teleport-target count as a DRIVER literal (round 15): n_t is
    // constant across iterations, but as a 1-row crossJoin frame every
    // iteration rebuilt its broadcast — one stage per iteration for a
    // number that never changes. The global case reuses the node count
    // the broadcast decision below needs anyway; personalized pays one
    // count over the already-persisted seed flag. Same integer, now a
    // plan literal in the rank expression.

    // Rank/degree/inflow frames are NODE-sized (two longs per row); below
    // `broadcastNodeLimit` nodes (~320 MB) every per-iteration join
    // broadcasts its node-sized side, leaving the contribs groupBy as the
    // iteration's ONLY shuffle — the edge table is never re-shuffled.
    // Past the limit, the joins degrade to partitioned shuffles (the only
    // choice when the rank table itself is cluster-scale). Measured on
    // q94's graph (21k nodes, 1.8M edges, 5 iterations, sf0.1):
    // shuffle 67 MB → 29 MB, wall 10.9 s → 9.4 s single-node (the
    // residue is per-iteration job overhead — checkpoint + broadcast
    // collects; on a real cluster the shuffle cut is the win).
    val nNodes = nodes.count()
    val nT: Long = seedFlag match {
      case Some(sf) => sf.count()
      case None => nNodes
    }
    require(seedsOpt.isEmpty || nT > 0,
      "personalized: seeds must be non-empty and intersect the graph")
    val bcast = nNodes <= broadcastNodeLimit
    def nodeSized(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df

    // STATIC per-node frame (node_id, t, outdeg-nullable), built once —
    // the teleport flag and the out-degree don't change across
    // iterations, so carrying them INSIDE the checkpointed rank state
    // removes the two ranks⋈deg joins (and their per-iteration broadcast
    // builds) the old loop paid every round: dangling mass filters the
    // rank frame itself, contribs project straight off it, and `next` is
    // ONE node-sized join (statics ⋈ inflow) instead of three. Rank
    // arithmetic is unchanged — same rows, same integer recursion.
    val statics = tnodes.join(nodeSized(deg),
        col("node_id") === col("dnode"), "left")
      .select(col("node_id"), col("t"), col("outdeg"))
      .localCheckpoint()
    var ranks = statics
      .select(col("node_id"), col("t"), col("outdeg"),
        (col("t").cast("long") * scale).as("rank"))
      .localCheckpoint()
    var iter = 0
    while (iter < iterations) {
      // Σ rank over nodes with no out-edges (outdeg null in the statics).
      val dangling = ranks.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
      val contribs = ranks.filter(col("outdeg").isNotNull)
        .select(col("node_id"), expr("rank div outdeg").as("contrib"))
      val inflow = e.join(nodeSized(contribs), e("src") === col("node_id"))
        .select(e("dst").as("node_id"), col("contrib"))
        .groupBy(col("node_id")).agg(sum(col("contrib")).as("inflow"))
      val next = statics
        .join(nodeSized(inflow), Seq("node_id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node_id"), col("t"), col("outdeg"),
          expr(s"t * (${base * scale} div 100) + " +
            s"($damp * (coalesce(inflow, CAST(0 AS BIGINT)) + t * (dmass div $nT))) div 100")
            .as("rank"))
        .localCheckpoint()
      CacheScope.unpinCheckpoint(ranks)
      ranks = next
      iter += 1
    }
    e.unpersist(); deg.unpersist(); nodes.unpersist()
    seedFlag.foreach(_.unpersist())
    CacheScope.unpinCheckpoint(statics)
    // Register the checkpoint leaf, THEN project down to the public
    // (node_id, rank) schema (Project outside the registration so release
    // still matches the LogicalRDD leaf — the LPA/KCore discipline).
    CacheScope.pinCheckpointed(ranks)
      .select(col("node_id"), col("rank"))
  }
}
