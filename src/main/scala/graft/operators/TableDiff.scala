package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Keyed snapshot diff — "what changed between these two states of the
 * table": the anti-entropy / reconciliation primitive behind data-ops
 * checks (did the rebuild match the incremental path? what did this
 * backfill touch?) and the change-feed a downstream consumer derives
 * when the upstream ships full snapshots instead of deltas.
 *
 * Shape: each side collapses to (key, fingerprint) — md5 of the
 * JSON-encoded payload struct, which escapes field content so no two
 * distinct payloads share an encoding (a separator-concat fingerprint
 * would collide on values containing the separator; the spec pins that
 * case) — then ONE full-outer join on the key decides the status:
 * `added` (only in `b`), `removed` (only in `a`), `changed` (both, but
 * fingerprints differ), `unchanged`. Value payloads never cross the
 * shuffle — only 16-byte digests — so diffing two 100 TB snapshots
 * moves 2·keys·(key + 16 B), and the join co-partitions on the key
 * (bucket both snapshots by key at write time and the shuffle
 * disappears entirely). Fingerprint equality stands in for row equality
 * (md5 collisions are negligible and two-sided).
 *
 * Fingerprint equality coincides with row equality (equal values encode
 * equally; distinct values encode distinctly), so the statuses are
 * engine-independent semantics — the q143 oracle recomputes them
 * definitionally with IS DISTINCT FROM, no md5 mirroring needed.
 */
object TableDiff {

  /** (key..., fp) — md5 fingerprint of the non-key payload (JSON-encoded
    * struct in schema order; escaping makes the encoding injective for a
    * fixed schema — null fields are simply omitted, which is unambiguous
    * when every row shares the column set). */
  def fingerprints(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains)
    df.select(keyCols.map(col) :+
      md5(to_json(struct(payload.map(col): _*))).as("fp"): _*)
  }

  /** Per-key status of `b` relative to `a`. Both frames must share the
    * schema (same non-key columns in the same order). Output: keyCols...,
    * status ∈ {added, removed, changed, unchanged}. */
  def rowDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"snapshot schemas differ: ${a.columns.mkString(",")} vs " +
        b.columns.mkString(","))
    val fa = fingerprints(a, keyCols).withColumnRenamed("fp", "fp_a")
    val fb = fingerprints(b, keyCols).withColumnRenamed("fp", "fp_b")
    fa.join(fb, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }

  /** O(1)-row rollup of [[rowDiff]]. */
  def diffSummary(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    rowDiff(a, b, keyCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n_keys"))
}
