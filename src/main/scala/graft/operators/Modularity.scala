package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Partition-quality metrics for a node membership over an undirected
 * graph — modularity (Newman & Girvan 2004) and conductance, the
 * standard "did the clustering find real structure" checks after
 * q123's label propagation / q76's near-dup components / any
 * domain-given partition. Computed in EXACT INTEGERS so the whole
 * scorecard sits under a cross-engine hash oracle: with m total
 * edges, m_c internal edges and d_c summed degree per community,
 * modularity is Q = Σ_c (m_c/m − (d_c/2m)²), and its numerator over
 * the common denominator 4m² is the exact integer
 * 4·m·m_c − d_c² per community — no floating point anywhere.
 * Conductance per community is the exact pair (cut_c, vol_c) with
 * cut_c = d_c − 2·m_c and vol_c = d_c.
 *
 * Cost shape: ONE distinct canonicalization of the edge list, two
 * membership equi-joins (membership is node-sized — broadcast under
 * AQE, or co-partitioned with bucketed edges at 100 TB), and two
 * map-side-combined aggregates (internal edges per community, degree
 * per community). No iteration, no windows.
 *
 * @param edges undirected edge list in either orientation (internally
 *              canonicalized to s < d, deduped; self-loops dropped —
 *              they are neither internal edges nor degree in the
 *              Newman convention used here)
 * @param membership (node_id, community); must cover every endpoint —
 *              edges with an unmapped endpoint are REJECTED (a partial
 *              partition silently skews Q toward its covered part)
 * @return one row per NON-EMPTY community:
 *         (community, n_nodes, internal_edges, degree_sum, cut,
 *          q_num) with q_num = 4·m·internal_edges − degree_sum² over
 *         the implicit denominator 4m²; communities whose nodes touch
 *         no edge still appear (all-zero stats) via the membership
 *         side of the final outer join
 */
object Modularity {

  /**
   * Unweighted (`weightCol = None`): edges canonicalized and DEDUPED.
   * Weighted (`weightCol = Some(c)` — Newman 2004's weighted
   * generalization): integer weights SUM per canonical undirected pair
   * (both orientations and repeats merge — the multigraph-correct
   * rule), and every count in the scorecard becomes a weight sum: with
   * W total weight, w_c internal weight and S_c summed weighted
   * degree, q_num = 4·W·w_c − S_c² over the implicit 4W² — still exact
   * integers, still the same [[finalizeStats]] (W derives as
   * Σ degree_sum / 2 exactly like m does).
   */
  def communityStats(edges: DataFrame, membership: DataFrame,
      weightCol: Option[String] = None): DataFrame = {
    // Pinned: reused by the tagging joins and (through them) both
    // aggregates of partialStats.
    val e = canonEdges(edges, weightCol)
      .localCheckpoint(true)
      .transform(CacheScope.pinCheckpointed) // backs the returned plan
    // Checkpoint the community-sized partial: finalizeStats reads it
    // from THREE subtrees (node join, broadcast total, gate branch) —
    // off a live plan each would re-run the membership joins; off this
    // tiny checkpoint the re-reads are free. (The streaming face's
    // artifact arrives already checkpointed by foldStream.)
    finalizeStats(
      partialStats(e.select(col("s").as("src"), col("d").as("dst"),
        col("w")), membership, Some("w"))
        .localCheckpoint(true)
        .transform(CacheScope.pinCheckpointed),
      membership)
  }

  /** The single home of the canonical undirected merge (shared by
    * [[communityStats]] and [[greedyMoveRound]] so the multigraph rule
    * cannot diverge between the scorecard and the move round):
    * (s < d, w) with self-loops dropped; unweighted repeats dedup to
    * ONE edge, weighted repeats and orientations SUM. */
  private def canonEdges(edges: DataFrame,
      weightCol: Option[String]): DataFrame = edges
    .select(least(col("src"), col("dst")).cast("long").as("s"),
      greatest(col("src"), col("dst")).cast("long").as("d"),
      weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
        .as("w0"))
    .filter(col("s") < col("d"))
    .groupBy(col("s"), col("d"))
    .agg((if (weightCol.isDefined) sum(col("w0")) else min(col("w0")))
      .as("w"))

  /**
   * Associative per-batch contribution — the streaming face's fold unit
   * (see [[graft.streaming.ArtifactStreams.modularityStream]]): per
   * community, (internal_edges, degree_sum) over THIS batch's edges.
   * Rows are canonicalized and self-loops dropped, but deduplication is
   * the CALLER's contract: feed unique undirected edges (the batch path
   * dedupes/merges; a stream dedupes upstream or accepts multigraph
   * semantics, where a repeated edge weights its endpoints' degree and
   * internal counts — a defensible convention, stated, not silent).
   * With `weightCol` set, every count becomes an integer weight sum
   * (the Newman 2004 weighted generalization — see [[communityStats]]);
   * the unweighted fold is exactly the w ≡ 1 instance, so the two faces
   * share one code path and one [[finalizeStats]].
   * Unmapped endpoints are NOT refused here — they fold into a
   * NULL-community row (its degree_sum counts the unmapped endpoint
   * slots), which [[finalizeStats]] refuses at execution time. Carrying
   * the violation in the artifact keeps the fold a single aggregate
   * (the old eager `require(….isEmpty)` cost one extra node-join
   * action per call — per BATCH in the streaming face, ADVICE r10).
   */
  def partialStats(edges: DataFrame, membership: DataFrame,
      weightCol: Option[String] = None): DataFrame = {
    val e = edges
      .select(least(col("src"), col("dst")).cast("long").as("s"),
        greatest(col("src"), col("dst")).cast("long").as("d"),
        weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
          .as("w"))
      .filter(col("s") < col("d"))
    val mem = membership.select(col("node_id").cast("long").as("node_id"),
      col("community").cast("string").as("community"))
    val tagged = e
      .join(mem.select(col("node_id").as("s"), col("community").as("cs")),
        Seq("s"), "left")
      .join(mem.select(col("node_id").as("d"), col("community").as("cd")),
        Seq("d"), "left")
    // internal edge weight per community (both endpoints inside — the
    // null-unsafe === keeps unmapped endpoints out); degree per
    // community: each canonical edge contributes its weight to both
    // endpoints' communities (2w to its own when internal). Unweighted
    // is the w ≡ 1 instance — sums ARE the counts. Unmapped endpoints
    // group under community NULL — the carried coverage violation.
    val internal = tagged.filter(col("cs") === col("cd"))
      .groupBy(col("cs").as("community"))
      .agg(sum(col("w")).as("internal_edges"))
    val degree = tagged.select(col("cs").as("community"), col("w"))
      .union(tagged.select(col("cd").as("community"), col("w")))
      .groupBy(col("community"))
      .agg(sum(col("w")).as("degree_sum"))
    degree.join(internal, Seq("community"), "left")
      .select(col("community"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        col("degree_sum"))
  }

  /**
   * Turn a folded (community, internal_edges, degree_sum) artifact into
   * the full scorecard. The total edge count is DERIVED from the
   * artifact itself — Σ degree_sum = 2m exactly — so the fold carries
   * no global row and the 1-row total joins back as a broadcast, never
   * a driver-side count. The coverage gate is the LEADING UNION BRANCH
   * of the output, riding the same 1-row aggregate: a NULL-community
   * row in the artifact (unmapped edge endpoints, see [[partialStats]])
   * raises when the consuming action runs — a partial partition
   * silently skews Q toward its covered part, so refuse it. See the
   * in-body comment for why every other gate shape (projected column,
   * output Filter, broadcast crossJoin, trailing branch) is removed or
   * skipped by some optimizer/execution path.
   */
  def finalizeStats(partial: DataFrame, membership: DataFrame): DataFrame = {
    val mem = membership.select(col("node_id").cast("long").as("node_id"),
      col("community").cast("string").as("community"))
    // mTot is aggregated twice (the broadcast total AND the gate
    // branch) — deliberately NOT cached here: finalizeStats runs once
    // per TRIGGER in the streaming face, where an unscoped persist
    // would accumulate one CacheManager entry per trigger for the
    // stream's lifetime (the leak class CacheScope exists to prevent).
    // Both consumers re-aggregate `partial` instead, which every caller
    // makes cheap: the stream's artifact is already a checkpoint
    // (foldStream), and communityStats checkpoints its partial below.
    val mTot = partial
      .agg(coalesce(sum(col("degree_sum")), lit(0L)).as("deg2"),
        coalesce(sum(when(col("community").isNull, col("degree_sum"))),
          lit(0L)).as("unmapped"))
      // Integral halving (deg2 is even by construction — every edge
      // contributes its weight to exactly two endpoint slots): `expr`
      // DIV stays exact past 2^53, where double division would round
      // (the same class as IntervalJoin's grid fix, ADVICE r11).
      .select(expr("deg2 DIV 2").as("m_tot"), col("unmapped"))
    val nodes = mem.groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"))
    val internal0 = coalesce(col("internal_edges"), lit(0L))
    val degree0 = coalesce(col("degree_sum"), lit(0L))
    // The coverage gate is the LEADING union branch of the output,
    // riding the 1-row total aggregate: zero rows when coverage holds,
    // a raise when it doesn't. Every other shape is removed or skipped
    // by some path — a projected gate is column-prunable (ADVICE r11);
    // a Filter over output rows never evaluates when the output is
    // EMPTY (empty membership against non-empty edges: nodes is empty,
    // the join emits nothing); a broadcast crossJoin gate is folded
    // away whole by empty-relation propagation; and a TRAILING union
    // branch is skipped by limit short-circuiting (CollectLimit
    // consumes partitions in order and stops once satisfied — a
    // .show(5)/.take over a valid-looking prefix would never reach a
    // gate at the end). Leading, the gate's partition is consumed
    // first under any limit, emits nothing when valid, and the
    // aggregate beneath it produces its row even over empty input.
    val gateRow = mTot
      .filter(when(col("unmapped") > 0, raise_error(concat(
          lit("membership must cover every edge endpoint — "),
          col("unmapped").cast("string"),
          lit(" unmapped endpoint slot(s) in the folded artifact"))))
        .otherwise(lit(false)))
      .select(lit("").as("community"), lit(0L).as("n_nodes"),
        lit(0L).as("internal_edges"), lit(0L).as("degree_sum"),
        lit(0L).as("cut"), lit(0L).as("q_num"))
    gateRow.unionByName(nodes
      .join(partial, Seq("community"), "left")
      .crossJoin(broadcast(mTot))
      .select(col("community"), col("n_nodes"),
        internal0.as("internal_edges"), degree0.as("degree_sum"),
        (degree0 - lit(2L) * internal0).as("cut"),
        (lit(4L) * col("m_tot") * internal0 - degree0 * degree0)
          .as("q_num")))
  }

  /**
   * ONE synchronous round of greedy modularity ascent — the move phase
   * of Louvain community detection (Blondel et al. 2008) in its
   * distributed-synchronous form: every node evaluates, against the
   * CURRENT membership, the exact modularity gain of defecting to each
   * neighboring community, and reports its best strictly-positive move
   * (ties: gain desc, community asc; no gain → stay). All gains are
   * EXACT INTEGERS over the scorecard's 4W² denominator: moving i from
   * community a to b changes q_num by
   *   Δ = 4·W·(w(i,b) − w(i,a)) − 2·d_i·(S_b − S_a + d_i)
   * with w(i,c) = i's edge weight into c, d_i = i's weighted degree,
   * S_c = community degree sums — so the whole round sits under a
   * cross-engine hash oracle (q239), and each reported Δ is spec-pinned
   * against a full [[communityStats]] recompute of the single-node
   * move. The SYNCHRONOUS caveat is the standard one for distributed
   * Louvain: each Δ is exact HOLDING OTHERS FIXED; applying all moves
   * at once can overshoot when neighbors defect together (two nodes
   * moving into each other's abandoned community). That is the
   * documented trade of every parallel Louvain — callers alternate
   * move rounds with re-scores, or damp by applying only the top
   * fraction. This operator is the ROUND; policy stays at the call
   * site.
   *
   * Cost shape: one canonical edge merge, two membership joins, three
   * map-side-combined aggregates (node degree, node→community weight,
   * community degree), one community-sized broadcast back, one
   * row_number over the node's candidate communities (fan-in = the
   * node's distinct neighbor communities, degree-bounded). No
   * iteration; edge-sized shuffles only.
   *
   * @return one row per membership node:
   *         (node_id, comm_old, comm_new, dq_num) — comm_new = comm_old
   *         and dq_num = 0 for stayers (including edge-free nodes)
   */
  def greedyMoveRound(edges: DataFrame, membership: DataFrame,
      weightCol: Option[String] = None): DataFrame = {
    val canon = canonEdges(edges, weightCol)
      .localCheckpoint(true)
      .transform(CacheScope.pinCheckpointed)
    val mem = membership.select(col("node_id").cast("long").as("node_id"),
      col("community").cast("string").as("community"))
    val sym = canon.select(col("s").as("i"), col("d").as("j"), col("w"))
      .union(canon.select(col("d").as("i"), col("s").as("j"), col("w")))
    // Neighbor-community tag. No per-row null gate here: downstream
    // joins on cj are null-rejecting, so Catalyst INFERS isnotnull(cj)
    // and would evaluate it below a row-level raise — the unmapped rows
    // would silently vanish instead of refusing (the constraint-
    // inference twin of the ADVICE-r11 column-pruning gate bug). The
    // violation instead RIDES THE AGGREGATE as a NULL-community group
    // in wic and gates the output as its LEADING union branch — the
    // finalizeStats discipline, which no inference, pruning, emptiness
    // folding, or limit short-circuit can remove.
    val tagged = sym
      .join(mem.select(col("node_id").as("j"), col("community").as("cj")),
        Seq("j"), "left")
    val deg = sym.groupBy(col("i")).agg(sum(col("w")).as("d_i"))
    // Pinned: read three times (candidate targets, w(i,a), the gate).
    val wicAll = tagged.groupBy(col("i"), col("cj"))
      .agg(sum(col("w")).as("w_ic"))
      .localCheckpoint(true)
      .transform(CacheScope.pinCheckpointed)
    val unmapped = wicAll
      .agg(coalesce(sum(when(col("cj").isNull, col("w_ic"))), lit(0L))
        .as("unmapped"))
    val wic = wicAll.filter(col("cj").isNotNull)
    val sc = deg.join(mem.select(col("node_id").as("i"), col("community")),
        Seq("i"))
      .groupBy(col("community")).agg(sum(col("d_i")).as("s_c"))
    val wTot = canon.agg(sum(col("w")).as("w_tot"))
    // Candidates: i's neighbor communities other than its own. w(i,a)
    // left-joins (a node with no same-community neighbor has w_ia = 0).
    val self = mem.select(col("node_id").as("i"), col("community").as("a"))
    val cand = wic
      .join(self, Seq("i"))
      .filter(col("cj") =!= col("a"))
      .join(wic.select(col("i"), col("cj").as("a"), col("w_ic").as("w_ia")),
        Seq("i", "a"), "left")
      .join(deg, Seq("i"))
      .join(broadcast(sc.select(col("community").as("cj"),
        col("s_c").as("s_b"))), Seq("cj"))
      .join(broadcast(sc.select(col("community").as("a"),
        col("s_c").as("s_a"))), Seq("a"))
      .crossJoin(broadcast(wTot))
      .select(col("i"), col("a"), col("cj"),
        (lit(4L) * col("w_tot") * (col("w_ic") - coalesce(col("w_ia"), lit(0L)))
          - lit(2L) * col("d_i") * (col("s_b") - col("s_a") + col("d_i")))
          .as("dq"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("i")).orderBy(col("dq").desc, col("cj"))
    val moves = cand
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1 && col("dq") > 0)
      .select(col("i").as("node_id"), col("cj").as("to_c"), col("dq"))
    // The gate is the LEADING union branch of the output, riding the
    // 1-row aggregate: zero rows when coverage holds (the when folds
    // to false), a raise when it doesn't. See finalizeStats for the
    // full catalogue of gate shapes some optimizer/execution path
    // defeats (projected column, output Filter, broadcast crossJoin,
    // trailing branch under limit short-circuiting) — leading-branch-
    // on-an-aggregate survives them all.
    val gateRow = unmapped
      .filter(when(col("unmapped") > 0, raise_error(concat(
          lit("membership must cover every edge endpoint — unmapped "),
          lit("endpoint weight "), col("unmapped").cast("string"))))
        .otherwise(lit(false)))
      .select(lit(0L).as("node_id"), lit("").as("comm_old"),
        lit("").as("comm_new"), lit(0L).as("dq_num"))
    gateRow.unionByName(mem.join(moves, Seq("node_id"), "left")
      .select(col("node_id"), col("community").as("comm_old"),
        coalesce(col("to_c"), col("community")).as("comm_new"),
        coalesce(col("dq"), lit(0L)).as("dq_num")))
  }
}
