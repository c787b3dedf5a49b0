package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for corpus curation: language identification
 * (marker-token heuristic), quality scoring, token counting (whitespace +
 * BPE-ish regex), and document fingerprinting (min-k of rolling shingle
 * hashes, winnowing-style). All codegen'd Column expressions.
 */
object TextAnalysis {

  /** Marker stopwords per language; deterministic tie-break = lang asc. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est"))

  /**
   * n-gram/marker language ID: per language, count marker-token hits over
   * the whitespace tokens; predicted lang = argmax (score desc, lang asc),
   * NULL-scored docs fall back to "und" (undetermined).
   */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))
    val scores = Markers.map { case (lang, ms) =>
      sum(when(col("tok").isin(ms: _*), 1).otherwise(0)).as(s"score_$lang")
    }
    val scored = toks.groupBy(col("id")).agg(scores.head, scores.tail: _*)
    val best = Markers.map { case (lang, _) =>
      struct(col(s"score_$lang").as("score"), lit(lang).as("lang"))
    }.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    scored.select(col("id"),
      when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit("und")).as("pred_lang"),
      best.getField("score").as("marker_hits"))
  }

  /**
   * Composite quality signals per document: lengths, token stats, stopword
   * ratio, punctuation/digit density, repetition (distinct/total tokens).
   */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stop = Markers.flatMap(_._2).distinct
    val toks = df.select(col(idCol).as("id"), col(textCol).as("text"),
      explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    toks.groupBy(col("id")).agg(
      first(length(col("text"))).as("n_chars"),
      count(lit(1)).as("n_tokens"),
      countDistinct(col("tok")).as("n_distinct"),
      round(avg(length(col("tok"))), 6).as("avg_tok_len"),
      round(avg(when(lower(col("tok")).isin(stop: _*), 1.0d).otherwise(0.0d)), 6)
        .as("stopword_ratio"))
      .withColumn("repetition_ratio",
        round(lit(1.0) - col("n_distinct") / col("n_tokens"), 6))
      .join(df.select(col(idCol).as("id"),
        round(length(regexp_replace(col(textCol), "[A-Za-z0-9\\s]+", "")).cast("double") /
          greatest(length(col(textCol)), lit(1)), 6).as("punct_ratio"),
        round(length(regexp_replace(col(textCol), "[^0-9]+", "")).cast("double") /
          greatest(length(col(textCol)), lit(1)), 6).as("digit_ratio")), Seq("id"))
  }

  /**
   * Gopher-style quality rule set (Rae et al. 2021, appendix A — word-count
   * bounds, mean-word-length band, most-frequent-token repetition cap,
   * alphabetic-word floor, required-word minimum; the reference has no
   * equivalent, this is the LLM-curation extension surface). Emits the
   * per-document signals, one 0/1 flag per rule, and a composite `keep`.
   *
   * Every rule decides by exact integer cross-multiplication (e.g.
   * `sum_len*10 >= n_words*minMeanLenTenths` instead of comparing a
   * floating mean to 4.2), so the keep decision is bit-identical across
   * engines; the rounded ratio columns are display signals only.
   *
   * Scale shape: two-level (id, tok) → id aggregation — one doc_id
   * shuffle, no Expand, no joins; signals and flags are a narrow
   * projection on top. Survives any corpus size that can be tokenized.
   */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 30, maxWords: Int = 90,
      minMeanLenTenths: Int = 42, maxMeanLenTenths: Int = 50,
      maxTopTokPct: Int = 10, minAlphaPct: Int = 80,
      requiredWords: Seq[String] = Seq("table", "row", "data", "key"),
      minRequiredHits: Int = 2): DataFrame = {
    require(requiredWords.nonEmpty, "requiredWords must be non-empty")
    val toks = df.select(col(idCol).as("id"),
        explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    // (id, tok) level first: top-token count and required-word hits come
    // from the same pass that sums words — no countDistinct Expand.
    val perTok = toks.groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val sig = perTok.groupBy(col("id")).agg(
      sum(col("c")).as("n_words"),
      sum(col("c") * length(col("tok"))).as("sum_len"),
      max(col("c")).as("top_c"),
      sum(when(col("tok").rlike("[A-Za-z]"), col("c")).otherwise(lit(0L)))
        .as("alpha_c"),
      sum(when(col("tok").isin(requiredWords: _*), 1L).otherwise(lit(0L)))
        .as("req_hits"))
    sig.select(col("id"), col("n_words"),
      round(col("sum_len").cast("double") / col("n_words"), 6).as("mean_word_len"),
      round(col("top_c").cast("double") / col("n_words"), 6).as("top_tok_frac"),
      round(col("alpha_c").cast("double") / col("n_words"), 6).as("alpha_frac"),
      col("req_hits"),
      (col("n_words") >= minWords && col("n_words") <= maxWords)
        .cast("int").as("words_ok"),
      (col("sum_len") * 10 >= col("n_words") * minMeanLenTenths &&
        col("sum_len") * 10 <= col("n_words") * maxMeanLenTenths)
        .cast("int").as("mean_len_ok"),
      (col("top_c") * 100 <= col("n_words") * maxTopTokPct)
        .cast("int").as("rep_ok"),
      (col("alpha_c") * 100 >= col("n_words") * minAlphaPct)
        .cast("int").as("alpha_ok"),
      (col("req_hits") >= minRequiredHits).cast("int").as("req_ok"))
      .withColumn("keep", (col("words_ok") === 1 && col("mean_len_ok") === 1 &&
        col("rep_ok") === 1 && col("alpha_ok") === 1 && col("req_ok") === 1)
        .cast("int"))
  }

  /** Whitespace token count + BPE-ish subunit count (letter runs, digit
    * runs, single symbols — a cheap proxy for tokenizer load). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      size(split(trim(col(textCol)), "\\s+")).as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"))

  /**
   * Reference-LM cross-entropy quality score — the CCNet-style "perplexity
   * vs a trusted corpus" curation signal, with a deterministic add-one
   * unigram LM standing in for the wiki-trained KenLM (the signal's SHAPE
   * is identical: low cross-entropy = looks like the reference, high =
   * junk/outlier; the model is exactly reproducible on any engine — no
   * external LM binary).
   *
   * LM: p(tok) = (c(tok) + 1) / (N + V + 1) over the reference corpus's
   * whitespace tokens (V = reference vocab size; the +1 in the denominator
   * reserves mass for the single unseen-token class, which every
   * out-of-vocabulary token maps to: p_oov = 1 / (N + V + 1)).
   * Per scored doc: cross_entropy = -avg ln p(tok), plus the token count
   * and the out-of-vocabulary rate (a quality signal in its own right).
   *
   * Scale shape: the LM is a vocab-sized aggregate of the (small, trusted)
   * reference corpus, BROADCAST into the token join with its N/V folded in
   * as a broadcast 1-row aggregate — the scored corpus is never shuffled
   * for the lookup; the per-doc aggregation shuffles doc ids once.
   *
   * Degenerate inputs: a doc with no tokens scores (0, 0.0, 0.0) — no
   * signal either way. A reference with no tokens yields NULL
   * cross_entropy (and oov_rate 1.0) for every non-empty doc: there is no
   * model to score under, and silently reporting 0.0 — the best possible
   * score — would make a quality filter keep everything, so callers see
   * the misconfiguration instead of a no-op filter.
   */
  def lmCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String): DataFrame = {
    def toks(df: DataFrame, id: Column, text: Column) =
      df.select(id.as("id"), explode(split(text, "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
    val refToks = toks(reference, lit(0L), col(refTextCol))
    val lm = refToks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val stats = lm.agg(sum(col("c")).as("n_ref"),
      count(lit(1)).as("v_ref"))
    val scored = toks(docs, col(idCol), col(textCol))
      .join(broadcast(lm), Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("logp",
        log((coalesce(col("c"), lit(0L)) + lit(1).cast("double")) /
          (col("n_ref") + col("v_ref") + lit(1))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(when(col("c").isNull, 1.0d).otherwise(0.0d)), 6).as("oov_rate"),
        round(-avg(col("logp")), 6).as("cross_entropy"))
    // Zero-fill ONLY the docs absent from `scored` (no tokens): a blanket
    // na.fill would also rewrite the NULL scores of the empty-reference
    // case into perfect 0.0 quality.
    docs.select(col(idCol).as("id"))
      .join(scored.withColumnRenamed("n_tokens", "nt"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("nt"), lit(0L)).as("n_tokens"),
        when(col("nt").isNull, 0.0d).otherwise(col("oov_rate")).as("oov_rate"),
        when(col("nt").isNull, 0.0d).otherwise(col("cross_entropy"))
          .as("cross_entropy"))
  }

  /**
   * BIGRAM cross-entropy under an add-one reference model — the
   * context-aware upgrade of [[lmCrossEntropy]] (a unigram model scores
   * "rare words"; the bigram scores "unlikely TRANSITIONS", which is
   * what separates shuffled-word spam from prose with the same
   * vocabulary — the CCNet/KenLM idea one order up).
   *
   * Model, over the reference's adjacent whitespace-token pairs:
   *   p(w₂|w₁) = (c₂(w₁,w₂) + 1) / (c₁(w₁) + V + 1)
   * with V = reference vocab size (+1 reserves the unseen class; an
   * unseen context w₁ scores 1/(V+1)). Per scored doc, over ITS
   * adjacent pairs: bigram_ce = −avg ln p, with each pair's ln term
   * NANO-QUANTIZED to an exact integer before the per-doc sum —
   * aggregation order cannot move the hash (the q154/q190 discipline;
   * the unigram operator predates it and survives on rounding).
   *
   * Scale shape: the bigram table is a reference-sized aggregate
   * broadcast into the pair join (with c₁ and the 1-row V folded in);
   * the scored corpus shuffles once on doc id for the pair window and
   * once for the rollup. Docs with < 2 tokens score (0, 0.0).
   */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refIdCol: String,
      refTextCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Pairs are formed WITHIN each document (reference docs included —
    // a constant reference id would fabricate bigrams across document
    // boundaries in a nondeterministic order).
    def pairs(df: DataFrame, id: Column, text: Column): DataFrame = {
      val t = df.select(id.as("id"),
          posexplode(split(text, "\\s+")).as(Seq("i", "tok")))
        .filter(col("tok") =!= "")
      val w = Window.partitionBy(col("id")).orderBy(col("i"))
      t.withColumn("w2", lead(col("tok"), 1).over(w))
        .filter(col("w2").isNotNull)
        .select(col("id"), col("tok").as("w1"), col("w2"))
    }
    val refPairs = pairs(reference, col(refIdCol), col(refTextCol))
    val c2 = refPairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = refPairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vRow = reference
      .select(explode(split(col(refTextCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").agg(countDistinct(col("tok")).as("v_ref"))
    val scored = pairs(docs, col(idCol), col(textCol))
      .join(broadcast(c2), Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(vRow))
      .withColumn("term_n", expr(
        """CAST(round(ln((coalesce(c2, 0) + 1) /
           (CAST(coalesce(c1, 0) + v_ref + 1 AS DOUBLE))) * 1000000000)
           AS BIGINT)"""))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("term_n")).as("sum_n"))
      .select(col("id"), col("n_pairs"),
        round(-(col("sum_n").cast("double") / 1e9) / col("n_pairs"), 6)
          .as("bigram_ce"))
    docs.select(col(idCol).as("id"))
      .join(scored.withColumnRenamed("n_pairs", "np"), Seq("id"), "left")
      .select(col("id"), coalesce(col("np"), lit(0L)).as("n_pairs"),
        when(col("np").isNull, 0.0d).otherwise(col("bigram_ce"))
          .as("bigram_ce"))
  }

  /**
   * Corpus vocabulary with coverage statistics — the frequency-cutoff
   * step before tokenizer/vocab training: the `topK` most frequent
   * whitespace tokens (ties broken by token asc, deterministic on any
   * engine), each with its corpus count and the CUMULATIVE fraction of
   * all token occurrences the vocabulary covers up to that rank (the
   * curve that decides where to cut a vocab).
   *
   * Scale shape: one shuffle for the token count; the top-K selection is
   * a TakeOrdered (no global sort of the vocab), and the ranking/cumsum
   * window runs over AT MOST topK rows — a single partition bounded by
   * the knob, never by data size. The total-occurrence denominator is a
   * broadcast 1-row aggregate (no driver-side count).
   */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 1000): DataFrame = {
    require(topK > 0, "topK must be positive")
    val toks = df.select(
      explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val top = counts.orderBy(col("n").desc, col("tok")).limit(topK)
    val w = Window.orderBy(col("n").desc, col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("tok"))))
      .withColumn("cum_coverage",
        round(sum(col("n")).over(w) / col("total"), 6))
      .select(col("rank"), col("tok"), col("n"), col("cum_coverage"))
  }

  /**
   * Winnowing-style fingerprint: rolling w-gram shingle hashes, keep the
   * k smallest per document (order-stable). Two docs sharing content share
   * fingerprint elements → joinable for containment detection. Hashes are
   * md5 hex strings (not xxhash64): identical on every engine, so the
   * operator is oracle-checkable end to end; min-k over the hex strings is
   * the same uniform sampling as min-k over 64-bit ints.
   */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      w: Int = 4, k: Int = 8): DataFrame = {
    val sh = Dedup.shingleStrings(df, idCol, textCol, w)
      .select(col("id"), md5(col("shingle")).as("shingle"))
    val win = Window.partitionBy(col("id")).orderBy(col("shingle"))
    sh.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("shingle"))).as("fingerprint"))
  }

  /**
   * Compression-ratio quality signal: deflate each document's UTF-8 bytes
   * and report n_bytes, n_compressed, and ratio = compressed/raw (rounded
   * to 6). Highly templated/repetitive text compresses far below ~0.4;
   * natural prose sits around 0.5–0.7 — a cheap, language-agnostic
   * low-entropy detector used alongside the Gopher rules.
   *
   * Implementation note: `mapPartitions` with ONE `Deflater` per
   * partition, `reset()` between rows — deflater allocation is the
   * expensive part (native zlib state), the same per-partition-init
   * pattern as the NER/codec seams. Purely narrow: no shuffle, no join;
   * at 100 TB this is a map-only pass. No oracle (DuckDB has no
   * deterministic-deflate surface) — spec-bound (DedupSpec), like the
   * streaming operators.
   */
  def compressionRatio(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.BEST_SPEED)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = Option(text).getOrElse("").getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished())
            compressed += deflater.deflate(buf)
          val ratio =
            if (raw.isEmpty) 1.0
            else math.round(compressed.toDouble / raw.length * 1e6) / 1e6
          (id, raw.length.toLong, compressed, ratio)
        }
      }
      .toDF("id", "n_bytes", "n_compressed", "compression_ratio")
  }

  /** URLs and their lowercased hosts per document: (id, url, domain) —
    * one row per URL occurrence; docs with no URLs keep one row with NULL
    * url/domain (explode_outer, so downstream aggregation never loses a
    * doc). Host = authority up to the first '/', ':', '?' or '#' (ports
    * and paths excluded). */
  def urlDomains(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode_outer(expr(s"regexp_extract_all($textCol, 'https?://\\\\S+', 0)"))
          .as("url"))
      .withColumn("domain",
        lower(regexp_extract(col("url"), "^https?://([^/:?#\\s]+)", 1)))

  /**
   * RefinedWeb-style URL/domain blocklist filter (Penedo et al. 2023 §3.1
   * use a curated blocklist as the first curation stage): per doc, count
   * URLs, count blocklist hits (exact host match OR subdomain — host ends
   * with ".blocked"), list the distinct blocked hosts, and emit
   * keep = 1 iff no hit.
   *
   * The blocklist is compiled into a codegen'd OR-chain of plan literals
   * (like q87's probe weights) — zero joins, purely narrow, right for the
   * curated lists of O(10²–10⁴) entries the technique uses. A
   * millions-of-entries list would instead broadcast-join on the
   * registrable suffix of the host; the per-doc aggregation is unchanged.
   */
  def domainBlocklistFilter(df: DataFrame, idCol: String, textCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist")
    val d = col("domain")
    val hit = blocked.map(b => d === b.toLowerCase ||
      d.endsWith("." + b.toLowerCase)).reduce(_ || _)
    urlDomains(df, idCol, textCol)
      .groupBy(col("id"))
      .agg(
        count(col("url")).as("n_urls"),
        sum(when(hit, 1L).otherwise(0L)).as("n_blocked"),
        array_join(sort_array(collect_set(when(hit, d))), ",")
          .as("blocked_domains"))
      .withColumn("keep", (col("n_blocked") === 0L).cast("int"))
  }

  /**
   * Per-group statistical profile of a long-valued signal: count, mean,
   * stddev (both derived from exact integer sums — engine-portable,
   * summation-order-free), and one `p<NN>` column per requested quantile.
   *
   * `exact = true` uses `percentile` (exact interpolated): one aggregation
   * buffer holds the group's VALUES, so it is the oracle-checkable form
   * (q88) and fine while a group fits an executor. `exact = false` (the
   * default, and the 100 TB path) uses `approx_percentile`: a mergeable
   * constant-memory quantile sketch with rank error bounded by
   * n / accuracy — group size no longer bounds memory, partial aggregation
   * stays map-side, and the plan is otherwise IDENTICAL (one shuffle on the
   * group key). StatProfileSpec pins the error bound against the exact form
   * on a known distribution.
   */
  def statProfile(df: DataFrame, groupCol: String, valueCol: String,
      percentiles: Seq[Double] = Seq(0.5, 0.9),
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1))
    val pctArray = percentiles.mkString("array(", ", ", ")")
    val pctAgg =
      if (exact) s"percentile($valueCol, $pctArray)"
      else s"approx_percentile($valueCol, $pctArray, $accuracy)"
    val v = col(valueCol)
    val n = col("n")
    val grouped = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(v).as("sx"),
      sum(v * v).as("sxx"),
      expr(pctAgg).as("pcts"))
    val pctCols = percentiles.zipWithIndex.map { case (p, i) =>
      col("pcts").getItem(i).cast("double")
        .as("p" + math.round(p * 100).toString)
    }
    grouped.select(
      (col(groupCol) +: n +:
        round(col("sx").cast("double") / n, 6).as("mean") +:
        // greatest(0.0, …): constant-valued group must not NaN (see q88);
        // singleton group → NULL (sample sd undefined), not 0/0.
        when(n > 1, round(sqrt(greatest(lit(0.0),
            col("sxx").cast("double") - col("sx").cast("double") *
              col("sx").cast("double") / n) /
          (n - lit(1))), 6)).as("sd") +:
        pctCols): _*)
  }

  /**
   * Hashing-trick featurizer (Weinberger et al. 2009) — model-free text →
   * fixed-dim vector, the standard way to featurize a 100 TB corpus
   * without a driver-held vocabulary: bucket = md5-derived hash of the
   * token mod `dim`, value = Σ of per-occurrence signs (sign from an
   * independent hash bit, so colliding tokens cancel in expectation
   * rather than bias upward; `signed = false` gives plain TF counts).
   *
   * Both hashes are engine-portable md5 derivations (the q43/q45
   * discipline), so the whole featurizer sits under a DuckDB oracle
   * (q95). Long (sparse) form: ONE groupBy shuffle on (doc, bucket),
   * partial-agg map-side; no vocabulary table, no join, no driver state —
   * the properties that make it the scale path next to [[vocabulary]]'s
   * explicit top-K table.
   *
   * @param tokens exploded (idCol, tokCol) occurrence table — feed the
   *               memoized shared token table, never re-tokenize
   * @return sparse long form (idCol, bucket, v) — only nonzero buckets;
   *         signed cancellation CAN zero a bucket, which [[toDenseVector]]
   *         restores as an explicit 0
   */
  def hashingVectorizer(tokens: DataFrame, idCol: String, tokCol: String,
      dim: Int, signed: Boolean = true): DataFrame = {
    require(dim > 0, "dim must be positive")
    val bucket = pmod(
      conv(substring(md5(col(tokCol)), 1, 8), 16, 10).cast("long"),
      lit(dim.toLong)).cast("int")
    // Independent bit: hex digit 9 of the same digest (outside the bucket
    // substring), even → +1, odd → -1.
    val sign =
      if (!signed) lit(1L)
      else when(conv(substring(md5(col(tokCol)), 9, 1), 16, 10)
        .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L))
    tokens
      .select(col(idCol), bucket.as("bucket"), sign.as("s"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("s")).as("v"))
      .filter(col("v") =!= 0)
  }

  /**
   * Exact heavy hitters by sketch-then-verify — the two-pass scale
   * pattern for "which tokens exceed frequency 1/supportDen": pass 1 is
   * Spark's `stat.freqItems` (a merged Misra-Gries-style summary — ONE
   * pass, map-side partials, NO shuffle of the token stream) whose
   * result is a guaranteed SUPERSET of every item with frequency >
   * 1/(2·supportDen); pass 2 exactly counts only those ≤ 2·supportDen
   * candidates (broadcast semi-join, then a groupBy of the filtered —
   * tiny — stream) and applies the exact integer threshold
   * `cnt · supportDen ≥ N` (cross-multiplication, no float). Output is
   * EXACT — sketch error cannot surface, only shrink pass-2 work — so
   * the operator carries a plain DuckDB counting oracle (q98) despite
   * the approximate first pass.
   *
   * The candidate list (≤ 2·supportDen entries) is the only driver
   * transfer — independent of corpus size, like the PQ/bloom artifacts.
   */
  def heavyHitters(tokens: DataFrame, tokCol: String,
      supportDen: Long = 1000L): DataFrame = {
    require(supportDen >= 2, "supportDen must be >= 2")
    val spark = tokens.sparkSession
    import spark.implicits._
    // Half the target support: freqItems only guarantees items STRICTLY
    // above its support, so sketching at 1/(2·supportDen) covers the
    // `≥ N/supportDen` boundary exactly.
    val cands = tokens.stat.freqItems(Seq(tokCol), 1.0 / (2.0 * supportDen))
      .head().getSeq[String](0)
    val candDf = cands.toDF(tokCol)
    val nRow = tokens.agg(count(lit(1)).as("total"))
    tokens
      .join(broadcast(candDf), Seq(tokCol), "left_semi")
      .groupBy(col(tokCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nRow))
      .filter(col("cnt") * supportDen >= col("total"))
      .select(col(tokCol), col("cnt"))
  }

  /** Densify [[hashingVectorizer]]'s sparse long form into one
    * `Array[Long]` row per doc (map-from-entries + a range lookup — no
    * shuffle beyond the groupBy). Array cells can't cross the driver's
    * pandas compare, so q95 oracles the sparse form and
    * HashingVectorizerSpec pins sparse == dense expansion. */
  def toDenseVector(sparse: DataFrame, idCol: String, dim: Int): DataFrame =
    sparse
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v"))))
        .as("m"))
      .select(col(idCol),
        expr(s"transform(sequence(0, ${dim - 1}), b -> coalesce(m[b], CAST(0 AS BIGINT)))")
          .as("features"))

  /**
   * PMI collocation mining (Church & Hanks 1990) over a positioned token
   * table: adjacent-pair bigrams scored by pointwise mutual information
   * against unigram frequencies —
   * PMI(x,y) = ln(p(xy) / (p(x)·p(y))) with p(xy) = c_xy/N_bigrams and
   * p(x) = c_x/N_unigrams. The standard collocation detector ("New York"
   * scores high, "of the" scores low) and the phrase-vocabulary builder a
   * tokenizer-training pipeline runs first.
   *
   * Determinism: all counts are exact integers; each bigram's PMI is ONE
   * double expression over them, quantized to micro-units (the q86
   * recipe) — no float accumulation anywhere, so the score hash-compares
   * against DuckDB (q105).
   *
   * Scale shape: bigrams come off the already-positioned token table via
   * one per-doc lead() window (narrow after the token table's own
   * shuffle); the `minCount` filter lands BEFORE the unigram joins, so
   * join traffic is O(frequent bigrams), not O(all bigrams); the two
   * 1-row totals broadcast. Top-k is TakeOrderedAndProject.
   */
  def pmiCollocations(tokensPos: DataFrame, minCount: Long = 5L,
      topK: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = tokensPos
      .withColumn("t2", lead(col("tok"), 1).over(w))
      .filter(col("t2").isNotNull)
      .select(col("tok").as("t1"), col("t2"))
    val bc = bg.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
    val uc = tokensPos.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nu = tokensPos.agg(count(lit(1)).as("nu"))
    val nb = bg.agg(count(lit(1)).as("nb"))
    bc.join(uc.select(col("tok").as("t1"), col("c").as("c1")), Seq("t1"))
      .join(uc.select(col("tok").as("t2"), col("c").as("c2")), Seq("t2"))
      .crossJoin(broadcast(nu))
      .crossJoin(broadcast(nb))
      .withColumn("pmi_micro", expr(
        """CAST(round(ln((CAST(cb AS DOUBLE) * CAST(nu AS DOUBLE)
          |  * CAST(nu AS DOUBLE))
          |  / (CAST(nb AS DOUBLE) * CAST(c1 AS DOUBLE)
          |     * CAST(c2 AS DOUBLE))) * 1000000) AS BIGINT)""".stripMargin))
      .select(col("t1"), col("t2"), col("cb"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("t1"), col("t2"))
      .limit(topK)
  }

  /**
   * Per-group corpus drift: Jensen–Shannon divergence between each
   * group's unigram token distribution and the whole corpus's — the
   * distribution-level monitor a mixture pipeline runs per source/shard/
   * day to catch a feed going off-distribution (q88's stat profile
   * watches scalar signals; this watches the token histogram itself).
   * JS is symmetric and bounded by ln 2, so thresholds transfer across
   * corpora.
   *
   * Exactness recipe (the q86 micro-LLR discipline): every present
   * (group, token) term 0.5·(p·ln(p/m) + q·ln(q/m)) is computed from
   * exact integer counts and quantized to an integer nano-term before
   * the per-group sum, so accumulation order can't perturb the result.
   * The absent-token mass needs no pair enumeration: tokens missing
   * from a group contribute 0.5·ln2·q each, and Σ q over them is
   * (N − Σ_present c_t)/N — a closed form over integers already in the
   * per-group aggregate (this is what keeps the operator O(present
   * pairs), NOT O(groups × vocab)).
   *
   * Scale shape: the corpus shuffles ONCE (the (group, token) count);
   * the global token table is vocab-sized and the group-totals table is
   * group-sized — both broadcast back. Output is O(groups).
   */
  def jsDrift(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(groupCol).as("grp"),
      explode(filter(split(col(textCol), "\\s+"), t => t =!= lit("")))
        .as("tok"))
    val st = toks.groupBy(col("grp"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
    val t = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val g = st.groupBy(col("grp")).agg(sum(col("c_st")).as("n_g"))
    val tot = t.agg(sum(col("c_t")).as("n_all"))
    val p = col("c_st") / col("n_g")
    val q = col("c_t") / col("n_all")
    val m = (p + q) / lit(2)
    val terms = st.join(broadcast(t), Seq("tok"))
      .join(broadcast(g), Seq("grp"))
      .crossJoin(broadcast(tot))
      .select(col("grp"), col("n_g"), col("c_t"),
        round((lit(0.5) * (p * log(p / m) + q * log(q / m))) * lit(1e9))
          .cast("long").as("iterm"))
    terms.groupBy(col("grp"))
      .agg(min(col("n_g")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c_t")).as("g_present"),
        sum(col("iterm")).as("s_iterm"))
      .crossJoin(broadcast(tot))
      .select(col("grp").as("source"), col("n_tokens"), col("n_distinct"),
        round(col("s_iterm") / lit(1e9) +
          lit(0.5) * log(lit(2.0)) *
            (col("n_all") - col("g_present")) / col("n_all"), 6)
          .as("js_divergence"))
  }
}
