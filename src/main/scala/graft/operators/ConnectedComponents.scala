package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed connected components by iterative min-label propagation.
 *
 * Replaces the reference's sequential in-driver cluster-map mutation
 * (/root/reference/src/CorefBase.groovy:180-211 pairwise adjacent merges,
 * chains resolved by mutation order) with transitive-closure semantics —
 * the documented CC-superset deviation of SURVEY.md §7.4(1).
 *
 * Labels are the vertex keys themselves (strings): collision-free and
 * deterministic (component id = lexicographic min key of the component).
 * Convergence in O(component diameter) rounds; near-duplicate name chains
 * are short, so 2-4 shuffles in practice. Each round localCheckpoints to
 * truncate lineage — on a cluster this stays a handful of narrow-ish
 * shuffle stages regardless of input size.
 */
object ConnectedComponents {

  /**
   * @param edges DataFrame with string columns `src`, `dst` (undirected).
   * @param strict when true, throw unless a ZERO-change round verified the
   *               fixpoint (a component with diameter > maxIter would
   *               otherwise be reported as several components). Convergence
   *               is only *verified* by observing a round that changes
   *               nothing, so up to maxIter+1 propagation rounds run: a
   *               component of diameter exactly maxIter finishes its last
   *               merges in round maxIter and the extra round confirms the
   *               fixpoint instead of spuriously failing.
   * @return DataFrame (`id`, `comp`) covering every vertex present in edges.
   *         Isolated vertices (no edges) are absent — union them as
   *         singleton components at the call site if needed.
   */
  def run(edges: DataFrame, maxIter: Int = 25,
      strict: Boolean = false): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    // maxIter + 1: the final round is the verification round — if the
    // maxIter'th round made the last changes, one more round observing
    // zero changes proves the fixpoint (ADVICE r2: exiting with changed>0
    // after round maxIter conflates "converged ON the last round" with
    // "did not converge").
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter + 1) {
      // Each vertex proposes its current component to every neighbour;
      // a vertex keeps the min of its own and all proposals.
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("comp"))
      val next = labels.union(msgs)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.comp") =!= col("o.comp"))
        .count()
      // The superseded round's checkpoint blocks are dead once `next` is
      // materialized and compared — free them instead of leaking one
      // cached RDD per round per invocation.
      CacheScope.unpinCheckpoint(labels)
      labels = next
      iter += 1
    }
    sym.unpersist()
    if (strict && changed > 0)
      throw new IllegalStateException(
        s"connected components: fixpoint not verified after $iter rounds " +
          s"(maxIter = $maxIter merge rounds + 1 verification round; " +
          s"$changed labels still changing in the last round) — raise maxIter")
    // The RETURNED frame's checkpoint blocks are RDD-level caches no
    // DataFrame unpersist can release — register them with the caller's
    // tracking scope so sweep harnesses (Bench/Verify) free one vertex-set
    // RDD per invocation instead of accumulating them.
    CacheScope.pinCheckpointed(labels)
  }
}
