package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic random walks over an edge list — the DeepWalk /
 * node2vec corpus-generation step (Perozzi et al. 2014): every node
 * starts `walksPerNode` walkers, each walker takes `walkLength` uniform
 * steps along out-edges, and the emitted node sequences become
 * skip-gram training pairs. The reference's graph surface stops at
 * direct co-occurrence links (/root/reference/src/SocialNetworkDCO
 * .groovy:53-84); walk corpora are the standard next step when the
 * entity network feeds a representation-learning pipeline.
 *
 * DETERMINISM: the walker at node u (walk w, step t) moves to the
 * out-neighbor v minimizing md5(seed|w|t|u|v). A min-hash draw over the
 * neighborhood is an exact uniform choice in distribution (every
 * neighbor is the argmin with equal probability, by symmetry of the
 * hash), yet the whole corpus is a pure function of (graph, seed) — no
 * RNG state to ship to executors, bit-identical on re-run/retry, and
 * REPLAYABLE in plain SQL, so the full recursion sits under an exact
 * DuckDB hash oracle (q216) with one unrolled CTE pair per step.
 *
 * Per step this is ONE equi-join (frontier × edges on the current
 * node) and ONE map-side-combined min(struct) aggregate — the
 * [[Bfs]] discipline. Frontier size is exactly
 * |startNodes|·walksPerNode rows (minus dead-ended walkers) at EVERY
 * step — it never grows — and the edge table is never mutated: bucket
 * it by `src` once at 100 TB and every step reuses the layout. Walkers
 * at a node with no out-edge stop (inner join drops them), matching
 * the DeepWalk convention of truncated walks. Lineage is cut per step
 * with an eager localCheckpoint (single-JVM harness; a cluster
 * deployment keeps persist/checkpoint — see PipelineQueries' note).
 */
object Walks {

  /** Eager localCheckpoint registered with the active [[CacheScope]]:
    * every pinned frame backs the returned corpus plan (the union of
    * all step frontiers), so release must wait for the caller's
    * tracking scope — raw checkpoints here would strand RDD blocks no
    * catalog-level release can reach. */
  private implicit class Pinned(private val df: DataFrame) {
    def pinned: DataFrame =
      CacheScope.pinCheckpointed(df.localCheckpoint(true))
  }

  /**
   * @param edges directed edge list with string columns `src`, `dst`
   *              (symmetrize upstream for an undirected graph);
   *              duplicate edges are deduped so multi-edges don't bias
   *              the draw
   * @param walksPerNode walkers started per distinct source node
   * @param walkLength steps per walker (output has ≤ walkLength+1
   *              positions per walk, including the start)
   * @param seed any string; same (graph, seed) → identical corpus
   * @return (walk_id, step, node) — step 0 is the start node; a walk
   *         that dead-ends at step t has no rows past t
   */
  def deterministicWalks(edges: DataFrame, walksPerNode: Int,
      walkLength: Int, seed: String): DataFrame = {
    require(walksPerNode >= 1, "walksPerNode must be >= 1")
    require(walkLength >= 0, "walkLength must be >= 0")
    // Pin the resolved edge set ONCE: every step (and the start-node
    // scan) probes it, and when the caller hands us a derived graph
    // (q219: the whole coref -> co-occurrence -> threshold lineage)
    // re-evaluating that per step multiplies the dominant cost by
    // walkLength. Partitioned AND sorted by `src` before the pin
    // (round 16): the distinct's (src, dst) partitioning does NOT
    // satisfy the per-step join on `src`, so every step re-exchanged
    // and re-sorted the full edge table (q219: 8 edge-sized exchanges,
    // ~90 MB of the query's shuffle); hash(src) + src order survive the
    // checkpoint leaf, so each step shuffles only the walker frontier.
    // This IS the "bucket the edge table by src once" 100 TB layout.
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).distinct()
      .repartition(col("src")).sortWithinPartitions(col("src"))
      .pinned
    val reps = (0 until walksPerNode).map(lit(_))
    var frontier = e.select(col("src").as("start")).distinct()
      .select(explode(array(reps: _*)).as("rep"), col("start"))
      .select(concat_ws("#", col("start"), col("rep")).as("walk_id"),
        col("start").as("node"))
      .pinned
    var corpus = frontier.select(col("walk_id"), lit(0).as("step"),
      col("node"))
    for (t <- 1 to walkLength) {
      // min-hash draw: the struct min is computed map-side per
      // (walk_id), so the shuffle carries one row per live walker
      frontier = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("walk_id"), col("dst"),
          md5(concat_ws("|", lit(seed), col("walk_id"),
            lit(t), col("node"), col("dst")).cast("binary")).as("h"))
        .groupBy(col("walk_id"))
        .agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("walk_id"), col("m.dst").as("node"))
        .pinned
      corpus = corpus.union(
        frontier.select(col("walk_id"), lit(t).as("step"), col("node")))
    }
    corpus
  }

  /**
   * Second-order biased walks — the node2vec sampler (Grover &
   * Leskovec 2016): the draw at node u depends on the PREVIOUS node t,
   * weighting a return to t (`wReturn` ∝ 1/p), a move to a common
   * neighbor of t and u (`wCommon`, distance 1 from t), and an
   * outward move (`wOut` ∝ 1/q) differently, interpolating BFS-ish and
   * DFS-ish exploration. Weights are INTEGER TICKET COUNTS: candidate
   * v holds w lottery tickets, the draw is the argmin of
   * md5(seed|walk|step|u|v|i) over every (candidate, ticket i) — an
   * exact w-proportional choice in distribution, RNG-free and
   * replayable in SQL (q218 unrolls it: candidates × a ticket list,
   * WHERE i < w, rank-1 pick). A 0-weight class excludes its
   * candidates outright (wReturn = 0 gives non-backtracking walks);
   * weights are capped at 8 to keep the fan-out (and the oracle's
   * ticket list) bounded. The first step has no previous node and
   * draws uniformly (one ticket each).
   *
   * Same per-step shape as [[deterministicWalks]] plus one more
   * edge-sized equi-join: candidates left-join the edge set keyed on
   * (prev, dst) to classify "common neighbor of the previous node" —
   * co-partitionable with the same bucketing as the candidate join —
   * then explode ≤ max-weight tickets. Frontier stays
   * |startNodes|·walksPerNode rows carrying (node, prev).
   */
  def node2vecWalks(edges: DataFrame, walksPerNode: Int, walkLength: Int,
      seed: String, wReturn: Int, wCommon: Int, wOut: Int): DataFrame = {
    require(walksPerNode >= 1, "walksPerNode must be >= 1")
    require(walkLength >= 0, "walkLength must be >= 0")
    require(Seq(wReturn, wCommon, wOut).forall(w => w >= 0 && w <= 8),
      "ticket weights must be in [0, 8]")
    require(wCommon + wOut > 0,
      "wCommon and wOut cannot both be 0 — every non-return move would be excluded")
    // Pinned once for the same reason as in deterministicWalks — here
    // the edge set is probed TWICE per step (candidates + adjacency).
    // src-partitioned/sorted for the candidate join (round 16, as in
    // deterministicWalks); the adjacency probe keys on (prev, dst) and
    // still pays its own exchange — a second pinned copy laid out by
    // (prev, dst) would trade memory for it, not taken at this fan-in.
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).distinct()
      .repartition(col("src")).sortWithinPartitions(col("src"))
      .pinned
    val adj = e.select(col("src").as("prev"), col("dst").as("dst"),
      lit(true).as("adj"))
    val reps = (0 until walksPerNode).map(lit(_))
    var frontier = e.select(col("src").as("start")).distinct()
      .select(explode(array(reps: _*)).as("rep"), col("start"))
      .select(concat_ws("#", col("start"), col("rep")).as("walk_id"),
        col("start").as("node"), lit(null).cast("string").as("prev"))
      .pinned
    var corpus = frontier.select(col("walk_id"), lit(0).as("step"),
      col("node"))
    for (t <- 1 to walkLength) {
      val weight =
        if (t == 1) lit(1) // no previous node yet: uniform draw
        else when(e("dst") === frontier("prev"), lit(wReturn))
          .when(col("adj").isNotNull, lit(wCommon))
          .otherwise(lit(wOut))
      val cand = frontier
        .join(e, frontier("node") === e("src"))
        .join(adj, frontier("prev") <=> adj("prev") &&
          e("dst") === adj("dst"), "left")
        .select(col("walk_id"), frontier("node"), frontier("prev"),
          e("dst"), weight.as("w"))
      frontier = cand
        .filter(col("w") > 0)
        .select(col("walk_id"), col("node"), col("dst"),
          explode(sequence(lit(0), col("w") - 1)).as("i"))
        .select(col("walk_id"), col("dst"),
          md5(concat_ws("|", lit(seed), col("walk_id"), lit(t),
            col("node"), col("dst"), col("i")).cast("binary")).as("h"),
          col("node"))
        .groupBy(col("walk_id"))
        .agg(min(struct(col("h"), col("dst"), col("node"))).as("m"))
        .select(col("walk_id"), col("m.dst").as("node"),
          col("m.node").as("prev"))
        .pinned
      corpus = corpus.union(
        frontier.select(col("walk_id"), lit(t).as("step"), col("node")))
    }
    corpus
  }

  /**
   * Edge-weight-biased walks — the weighted-graph member of the
   * family (DeepWalk on a co-occurrence/trade graph wants transition
   * probability ∝ edge strength, not uniform): candidate v holds
   * min(weight, cap) lottery tickets and the draw is the same
   * md5(seed|walk|step|u|v|i) argmin as [[node2vecWalks]], so the
   * choice is exactly weight-proportional (after capping) yet
   * RNG-free and SQL-replayable (q220). Edges with weight < 1 are
   * treated as ABSENT (filtered out — a 0-weight edge is no edge);
   * the cap bounds the ticket fan-out (≤ cap per candidate) AND is
   * the standard heavy-edge clamp: one dominant edge must not make
   * the walk deterministic-in-practice.
   *
   * Same per-step shape and costs as [[deterministicWalks]]; the
   * ticket explode multiplies the candidate frame by ≤ cap before the
   * map-side-combined argmin.
   *
   * @param edges string/castable columns `src`, `dst` plus an integer
   *              weight column `w`. ONE row per (src, dst) — aggregate
   *              weights upstream; a duplicate key would hold two
   *              ticket blocks and over-weight its destination (only
   *              exact full-row duplicates are deduped here)
   */
  def weightedWalks(edges: DataFrame, walksPerNode: Int, walkLength: Int,
      seed: String, cap: Int = 8): DataFrame = {
    require(walksPerNode >= 1, "walksPerNode must be >= 1")
    require(walkLength >= 0, "walkLength must be >= 0")
    require(cap >= 1 && cap <= 8, "cap must be in [1, 8]")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      least(col("w").cast("int"), lit(cap)).as("w"))
      .filter(col("w") >= 1)
      .distinct()
      // src layout pinned once — see deterministicWalks (round 16).
      .repartition(col("src")).sortWithinPartitions(col("src"))
      .pinned
    val reps = (0 until walksPerNode).map(lit(_))
    var frontier = e.select(col("src").as("start")).distinct()
      .select(explode(array(reps: _*)).as("rep"), col("start"))
      .select(concat_ws("#", col("start"), col("rep")).as("walk_id"),
        col("start").as("node"))
      .pinned
    var corpus = frontier.select(col("walk_id"), lit(0).as("step"),
      col("node"))
    for (t <- 1 to walkLength) {
      frontier = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("walk_id"), col("dst"), col("node"),
          explode(sequence(lit(0), col("w") - 1)).as("i"))
        .select(col("walk_id"), col("dst"),
          md5(concat_ws("|", lit(seed), col("walk_id"), lit(t),
            col("node"), col("dst"), col("i")).cast("binary")).as("h"))
        .groupBy(col("walk_id"))
        .agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("walk_id"), col("m.dst").as("node"))
        .pinned
      corpus = corpus.union(
        frontier.select(col("walk_id"), lit(t).as("step"), col("node")))
    }
    corpus
  }

  /**
   * Skip-gram context pairs from a walk corpus (the training-pair
   * extraction of word2vec/DeepWalk): for every walk position, each of
   * the next `window` positions contributes one directed
   * (center, context) pair. The band is materialized as an EXACT
   * equi-join — each position explodes its ≤ window forward offsets
   * and joins on (walk_id, step) — so fan-out is ≤ window per row by
   * plan shape (no residual band filter over a per-walk quadratic
   * candidate set), followed by ONE map-side-combined count. Missing
   * steps (dead-ended walks) simply find no match.
   *
   * @param walks (walk_id, step, node) as produced by
   *              [[deterministicWalks]]
   * @return (center, context, pairs) — co-visit counts, the skip-gram
   *         corpus in aggregated form
   */
  def skipgramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val offsets = (1 to window).map(lit(_))
    val a = walks
      .select(col("walk_id"), col("step"), col("node").as("center"),
        explode(array(offsets: _*)).as("k"))
      .select(col("walk_id"), (col("step") + col("k")).as("step"),
        col("center"))
    val b = walks.select(col("walk_id"), col("step"),
      col("node").as("context"))
    a.join(b, Seq("walk_id", "step"))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("pairs"))
  }
}
