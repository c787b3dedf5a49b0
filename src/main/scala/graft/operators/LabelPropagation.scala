package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Synchronous label-propagation community detection (Raghavan 2007's
 * LPA, made deterministic): after PageRank (importance, q94) and
 * triangle counting (cohesion, q103), the third graph statistic a
 * curation pipeline wants — WHICH group a node belongs to (e.g.
 * collapsing a near-dup match graph into communities when the strict
 * transitive closure of [[Dedup]] q76 is too fine/coarse a cut).
 *
 * Classic LPA breaks ties randomly and updates asynchronously — both
 * non-reproducible. This variant is the deterministic form: synchronous
 * rounds, label₀ = node id, and each round every node adopts the
 * neighbor label with the highest count, ties to the SMALLest label —
 * an argmax expressible as one `max(struct(cnt, −label))` aggregation,
 * making every round bit-identical on any engine; the q123 oracle
 * unrolls the rounds CTE-for-CTE (the q94/q104/q117 discipline).
 *
 * Scale shape: each round is (join labels onto edges — co-partitioned
 * by node after round 1) + ONE (dst, label) groupBy + ONE dst argmax
 * agg, i.e. two map-side-combined shuffles per round over edge-sized
 * data; labels are O(nodes). Bulk-synchronous with a `iters` budget,
 * early-exiting once a round changes nothing (the synchronous update
 * is a deterministic function of the labels, so a fixed point persists
 * — truncated output == full-budget output); `localCheckpoint`
 * truncates the iteration lineage like [[PageRank]], round frames
 * rotating through [[CacheScope.unpinCheckpoint]]. Isolated nodes keep
 * their own label.
 */
object LabelPropagation {

  /** Run up to `iters` synchronous rounds over an undirected edge list
    * (`src`, `dst` — symmetrized internally). Returns
    * (node_id, label, converged): `converged` is true iff some executed
    * round observed ZERO label changes — i.e. the labels are a fixed
    * point rather than a budget truncation (the [[KTruss]] flag
    * discipline, VERDICT r10 #4; equivalently, labels(iters) ==
    * labels(iters − 1), which is how the q123/q222 oracles mirror it).
    * With iters = 0 the flag is false — nothing was verified. The
    * change probe is one cached-scan isEmpty over the round's fresh
    * checkpoint blocks; the final frame registers with the caller's
    * [[CacheScope]] scope, flag Project OUTSIDE the registration so
    * release still matches the LogicalRDD leaf (ADVICE r10). */
  def run(edges: DataFrame, iters: Int): DataFrame =
    run(edges, iters, None)

  /** Weighted variant (`weightCol = Some(c)`): each neighbor's vote
    * counts its integer edge weight — the standard form on interaction
    * graphs where a 100-purchase lane should outvote a 1-purchase lane.
    * Repeated (src, dst) rows SUM (the [[Modularity]] multigraph
    * convention; a self-loop's weight counts twice, once per
    * orientation — pass loop-free edges if that matters). Ties still
    * break to the SMALLEST label on equal weighted counts, so the
    * recursion stays bit-reproducible and SQL-unrollable (the q230
    * oracle); unweighted is the w ≡ 1 instance of the same code path
    * (min-merge == the old distinct). */
  def run(edges: DataFrame, iters: Int,
      weightCol: Option[String]): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val w0 = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val dir = edges.select(col("src"), col("dst"), w0.as("w"))
    // Pinned: every round's vote join probes the symmetrized aggregate —
    // unpinned, each round re-runs the whole edge-derivation lineage
    // (parquet scan + union + groupBy shuffle) because round checkpoints
    // are separate actions (no cross-job exchange reuse). Same discipline
    // as PageRank's persisted edge table; at 100 TB this is the
    // "materialize/bucket the edge table once" layout every round reuses.
    // Partitioned AND sorted by `src` before the pin (round 16): the
    // symmetrize groupBy leaves (src, dst) partitioning, which does NOT
    // satisfy the per-round vote join on `src` — every round re-exchanged
    // and re-sorted the full edge aggregate (q123: 3 edge-sized exchanges,
    // ~60 MB of its shuffle; q230 likewise). hash(src) + src order
    // survive the pinned leaf, so a round shuffles only the node-sized
    // label/vote frames — the "bucket the edge table by src once" layout.
    val sym = CacheScope.pin(dir
      .union(dir.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .groupBy(col("src"), col("dst"))
      .agg((if (weightCol.isDefined) sum(col("w")) else min(col("w")))
        .as("w"))
      .repartition(col("src")).sortWithinPartitions(col("src")))
    val nodes = sym.select(col("src").as("node_id")).distinct()
    var labels = nodes.select(col("node_id"), col("node_id").as("label"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (round < iters && !converged) {
      // Weighted neighbor label votes: relabel each edge's src by its
      // current label, sum weight per (dst, label), argmax with ties
      // to min label.
      val counts = sym
        .join(labels.select(col("node_id").as("src"), col("label")),
          Seq("src"))
        .groupBy(col("dst"), col("label"))
        .agg(sum(col("w")).as("cnt"))
      val winner = counts
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("w"))
        .select(col("dst").as("node_id"), (-col("w.neg")).as("new_label"))
      val next = labels.select(col("node_id"), col("label"))
        .join(winner, Seq("node_id"), "left")
        .select(col("node_id"),
          coalesce(col("new_label"), col("label")).as("label"),
          (col("new_label").isNotNull && col("new_label") =!= col("label"))
            .as("chg"))
        .localCheckpoint(true)
      converged = next.filter(col("chg")).isEmpty
      CacheScope.unpinCheckpoint(labels)
      labels = next
      round += 1
    }
    CacheScope.pinCheckpointed(labels)
    labels.select(col("node_id"), col("label"),
      lit(converged).as("converged"))
  }
}
