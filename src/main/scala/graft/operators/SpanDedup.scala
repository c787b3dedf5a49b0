package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cross-document duplicate-SPAN detection and removal — the
 * rolling-window approximation of suffix-array exact-substring dedup
 * (the "dedup long repeated substrings across documents" step of modern
 * pretraining pipelines; cf. Lee et al. 2022, "Deduplicating Training
 * Data Makes Language Models Better"). Granularity sits between
 * [[Curation.segmentDedup]] (line/fixed-segment boilerplate by document
 * frequency) and [[Dedup.minhashDedup]] (whole-document near-dup): a
 * repeated passage at ARBITRARY positions inside otherwise-distinct
 * documents is found and can be removed from every doc except a canonical
 * holder.
 *
 * Method: every `window`-token sliding window of every document is keyed
 * by md5 of its token text (exact match; 128-bit collisions are
 * negligible at any corpus size and md5 keeps the key engine-portable
 * and digest-sized). Windows whose key occurs in ≥ `minDf` distinct
 * documents are duplicate windows; per document, overlapping/adjacent
 * flagged windows coalesce into maximal spans. A true duplicated
 * substring of L ≥ window tokens yields exactly its L-token span
 * (every window inside it is shared); substrings shorter than `window`
 * are invisible — `window` IS the minimum duplication length, the same
 * knob as the suffix-array method's min-match length.
 *
 * Scale shape: tokenize = one shuffle on id (re-index window); the
 * window-key build is `window-1` codegen'd leads over the SAME (id, pos)
 * window — no extra exchange; the document-frequency count shuffles
 * digest keys (never window text); flagging is a semi-join on the digest;
 * span coalescing shuffles back on id. Everything is linear in token
 * count — no pairwise comparison at any stage, unlike the O(n log n)
 * suffix-array sort this approximates.
 */
object SpanDedup {

  /** (id, ti, tok): the shared re-indexed whitespace tokenizer —
    * [[Curation.reindexedTokens]] is the single home of the position
    * contract this operator's span offsets rely on. */
  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Curation.reindexedTokens(df, idCol, textCol)

  /** (id, ti, wkey): one row per window start, wkey = md5 of the
    * space-joined `window` tokens starting at ti. Shared with
    * [[SuffixDedup.tieredDuplicateSpans]] (the hashed first pass of the
    * two-tier composition). */
  private[operators] def windowKeys(toks: DataFrame, window: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("ti"))
    val withLeads = (1 until window).foldLeft(toks) { (acc, k) =>
      acc.withColumn(s"t$k", lead(col("tok"), k).over(w))
    }
    val parts = col("tok") +: (1 until window).map(k => col(s"t$k"))
    withLeads
      .filter(parts.last.isNotNull)
      .select(col("id"), col("ti"), md5(concat_ws(" ", parts: _*)).as("wkey"))
  }

  /**
   * Detect duplicated spans: returns (id, span_start, span_end,
   * n_windows) — token offsets [span_start, span_end) of each maximal
   * duplicated region, with the number of flagged windows it coalesces.
   * Positions index the re-indexed whitespace tokens (same convention as
   * [[Curation.segmentDedup]]).
   */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      window: Int = 20, minDf: Int = 2): DataFrame = {
    require(window >= 2 && minDf >= 2, "window >= 2, minDf >= 2")
    val wins = CacheScope.pin(
      windowKeys(tokens(df, idCol, textCol), window))
    val dup = wins.groupBy(col("wkey"))
      .agg(countDistinct(col("id")).as("wdf"))
      .filter(col("wdf") >= minDf)
      .select("wkey")
    val flagged = wins.join(dup, Seq("wkey"), "left_semi")
      .select(col("id"), col("ti"))
    coalesceSpans(flagged, window)
  }

  /**
   * Corpus window-digest ARTIFACT: the distinct md5 keys of every
   * `window`-token sliding window in the corpus — 16 bytes per distinct
   * window, a pure function of (corpus, window) that is stored once and
   * reused per batch (the band-table discipline of
   * [[Dedup.minhashBandTable]], applied to spans). Mergeable across
   * shards by plain distinct-union, so it carries a streaming face
   * through [[graft.streaming.ArtifactStreams.foldStream]] for free.
   */
  def corpusWindowDigests(corpus: DataFrame, idCol: String,
      textCol: String, window: Int = 20): DataFrame = {
    require(window >= 2, s"window >= 2: $window")
    windowKeys(tokens(corpus, idCol, textCol), window)
      .select("wkey").distinct()
  }

  /**
   * Incremental/decontamination face of [[duplicateSpans]]: maximal
   * spans of each BATCH document that duplicate CORPUS text — batch
   * windows semi-join the [[corpusWindowDigests]] artifact (digests
   * only, the corpus text never reloads), then coalesce per doc. The
   * per-batch cost is O(batch tokens) regardless of corpus size; this
   * is the "does the incoming crawl repeat what we already have" /
   * "does the training batch contain benchmark text" probe, exact at
   * the window granularity (md5 keys — same collision caveat as
   * [[duplicateSpans]]; [[SuffixDedup]] is the hash-free audit tier).
   * Returns (id, span_start, span_end, n_windows) over batch docs.
   */
  def probeSpans(batch: DataFrame, idCol: String, textCol: String,
      corpusDigests: DataFrame, window: Int = 20): DataFrame = {
    require(window >= 2, s"window >= 2: $window")
    val wins = windowKeys(tokens(batch, idCol, textCol), window)
    val flagged = wins
      .join(corpusDigests.select(col("wkey")), Seq("wkey"), "left_semi")
      .select(col("id"), col("ti"))
    coalesceSpans(flagged, window)
  }

  /** Gaps-and-islands over flagged window starts: a window starting past
    * the running max end of everything before it opens a new span.
    * Shared with [[SuffixDedup]] (same span convention). */
  private[operators] def coalesceSpans(flagged: DataFrame, window: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("ti"))
    flagged
      .withColumn("prev_end",
        max(col("ti") + window).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("ti") > col("prev_end"), 1)
          .otherwise(0))
      .withColumn("g",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("g"))
      .agg(min(col("ti")).as("span_start"),
        (max(col("ti")) + window).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("id", "span_start", "span_end", "n_windows")
  }

  /**
   * Remove duplicated spans, keeping ONE canonical occurrence: for each
   * duplicate window the canonical holder is the smallest doc id
   * containing it; every other doc drops the tokens that window covers.
   * Returns one row per input doc: (id, clean_text, n_tokens_kept,
   * n_tokens_dropped) — a doc with no duplicated spans passes through
   * intact, and the canonical doc keeps passages others lose (the
   * keep-first-occurrence policy of the suffix-array method).
   *
   * Cost: the token-coverage explode is O(flagged occurrences × window)
   * rows — linear in how much duplicated text exists, bounded by corpus
   * size, never pairwise.
   */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      window: Int = 20, minDf: Int = 2): DataFrame = {
    require(window >= 2 && minDf >= 2, "window >= 2, minDf >= 2")
    val toks = CacheScope.pin(tokens(df, idCol, textCol))
    val wins = CacheScope.pin(windowKeys(toks, window))
    val dup = wins.groupBy(col("wkey"))
      .agg(countDistinct(col("id")).as("wdf"), min(col("id")).as("canonical"))
      .filter(col("wdf") >= minDf)
      .select("wkey", "canonical")
    // Non-canonical occurrences of duplicate windows → covered token set.
    val covered = wins.join(dup, Seq("wkey"))
      .filter(col("id") =!= col("canonical"))
      .select(col("id"),
        explode(sequence(col("ti"), col("ti") + lit(window - 1))).as("ti"))
      .distinct()
    val kept = toks.join(covered, Seq("id", "ti"), "left_anti")
    val agg = kept.groupBy(col("id"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("ti"), col("tok")))),
          x => x.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_tokens_kept"))
    val totals = toks.groupBy(col("id")).agg(count(lit(1)).as("n_tokens"))
    df.select(col(idCol).as("id")).join(totals, Seq("id"), "left")
      .join(agg, Seq("id"), "left")
      .na.fill("", Seq("clean_text"))
      .na.fill(0L, Seq("n_tokens", "n_tokens_kept"))
      .select(col("id"), col("clean_text"), col("n_tokens_kept"),
        (col("n_tokens") - col("n_tokens_kept")).as("n_tokens_dropped"))
  }
}
