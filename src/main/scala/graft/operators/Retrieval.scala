package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Rank-fusion for hybrid retrieval — combine the rankings that different
 * retrieval systems (BM25 posting lists, embedding ANN, …) produce for
 * the same query into one list, without comparing their incomparable
 * scores. Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
 * 2009): each system contributes 1/(k + rank) for every item it ranked;
 * items ranked by several systems accumulate. The reference engine has
 * no retrieval surface at all (its Lucene sink — see
 * /root/reference/src/IndexWriter.groovy — stops at index build); this
 * is the query-time composition a training-data pipeline needs for
 * retrieval-based dedup candidates and eval harnesses.
 *
 * Engine-portable scoring: the contribution is computed in INTEGER
 * micro-units — `scale div (k + rank)` — so the fused score is an exact
 * int64 any engine reproduces bit-for-bit (the float 1/(k+r) would
 * hash-differ in the last ulp across engines). With the conventional
 * k = 60 and scale = 1e6 the quantization error (< 1 micro-unit per
 * system) cannot reorder items whose true RRF scores differ by > 1e-6·S.
 *
 * Scale shape: inputs are per-query top-K lists — already tiny relative
 * to the corpus (the expensive part, producing them, is the upstream
 * systems' problem: q54/q102's index, the IVF/beam ANN family). Fusion
 * itself is one union + one map-side-combined groupBy on the item
 * identity; with a query column in `idCols` it fuses millions of queries
 * in the same single shuffle, partitioned by (query, item).
 *
 * @param ranked  (systemName, frame) pairs; each frame carries `idCols`
 *                and `rankCol` (1-based int rank within that system's
 *                list for the identity's query), ONE row per identity —
 *                rank lists are unique by construction, and a duplicated
 *                identity would contribute twice. Names must be
 *                distinct — a system fusing twice would double-count.
 * @param idCols  the fused identity (e.g. `Seq("q_id", "doc_id")`;
 *                `Seq("doc_id")` for a single query)
 * @return one row per identity: idCols…, `n_systems` (how many systems
 *         ranked it), `best_rank` (min over systems), `rrf_micro` (the
 *         exact integer fused score; sort DESC, tie-break on identity)
 */
object Retrieval {

  def rrfFuse(ranked: Seq[(String, DataFrame)], idCols: Seq[String],
      rankCol: String = "rank", k: Int = 60,
      scale: Long = 1000000L): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked input")
    require(ranked.map(_._1).distinct.size == ranked.size,
      s"duplicate system names: ${ranked.map(_._1).mkString(", ")}")
    require(k >= 0, s"k >= 0: $k")
    val slim = ranked.map { case (_, df) =>
      df.select((idCols.map(col) :+ col(rankCol).cast("int").as("__rank")): _*)
    }
    // Contract gate (ADVICE r10): a null (or null-casting) rank would
    // still bump n_systems while sum() skipped it, silently corrupting
    // the fused score; a rank < 1 breaks the 1-based contract (and with
    // k = 0 a rank-0 row nulls the division). Raise at execution time —
    // codegen'd conditional on the already-materialized column, no extra
    // pass.
    val checked = slim.reduce(_ union _)
      .withColumn("__rank",
        when(col("__rank").isNull || col("__rank") < 1,
          raise_error(concat(
            lit("rrfFuse: rank must be a 1-based positive int, got "),
            coalesce(col("__rank").cast("string"), lit("NULL")))))
        .otherwise(col("__rank")))
    checked
      .groupBy(idCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_systems"),
        min(col("__rank")).as("best_rank"),
        sum(expr(s"$scale div (${k.toLong} + __rank)")).as("rrf_micro"))
  }
}
