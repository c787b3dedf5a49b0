package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming heavy hitters with BOUNDED state — the streaming face of the
 * batch sketch-then-verify operator (q98, TextAnalysis.heavyHitters).
 * Exact streaming token counts need one state row per distinct token
 * (unbounded on an open vocabulary); a Misra–Gries summary (Misra &
 * Gries 1982, the generalization of Boyer–Moore majority) keeps at most
 * `cap` counters per state key and still guarantees a SUPERSET of the
 * true heavy hitters: after any prefix with n tokens in a bucket, every
 * token with true count > n/(cap+1) is present in that bucket's summary,
 * and each kept estimate undercounts by at most n/(cap+1). Both bounds
 * are pinned by FrequencyStreamsSpec, not just cited.
 *
 * Scale shape: tokens are hashed into `nBuckets` state keys, so (a) each
 * token's counts live in exactly ONE summary — the per-bucket guarantee
 * lifts to the global stream — and (b) state parallelism is nBuckets
 * independent summaries of ≤ cap entries each: total state is
 * O(nBuckets · cap) REGARDLESS of stream length or vocabulary, the
 * constant-size-state discipline of bloomDedupStream. Candidates from
 * the summary can then be exact-verified with one filtered batch count —
 * the same second pass q98 runs.
 */
object FrequencyStreams {

  /** One Misra–Gries step: count if present, insert if room, else
    * decrement-all (dropping zeros). */
  private[graft] def mgAdd(mg: Map[String, Long], tok: String,
      cap: Int): Map[String, Long] =
    mg.get(tok) match {
      case Some(c) => mg.updated(tok, c + 1)
      case None if mg.size < cap => mg.updated(tok, 1L)
      case None =>
        mg.flatMap { case (t, c) =>
          if (c > 1) Some(t -> (c - 1)) else None
        }
    }

  /**
   * Streaming (or batch) Misra–Gries summaries over a token column.
   * Emits, per trigger, every bucket's current candidate set:
   * (bucket, tok, mg_count) — mg_count is the summary's lower-bound
   * estimate (true count ∈ [mg_count, mg_count + bucketN/(cap+1)]).
   */
  def mgHeavyHitters(tokens: DataFrame, tokCol: String, cap: Int,
      nBuckets: Int = 16): Dataset[(Int, String, Long)] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      .select(col(tokCol).cast("string").as("tok"),
        pmod(xxhash64(col(tokCol)), lit(nBuckets)).cast("int").as("bucket"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Map[String, Long], (Int, String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[(String, Int)],
            state: GroupState[Map[String, Long]]) =>
          var mg = state.getOption.getOrElse(Map.empty[String, Long])
          rows.foreach { case (tok, _) => mg = mgAdd(mg, tok, cap) }
          state.update(mg)
          mg.iterator.map { case (t, c) => (bucket, t, c) }
      }
  }
}
