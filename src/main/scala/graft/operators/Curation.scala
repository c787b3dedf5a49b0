package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for training-data preparation, extending the
 * reference's document surface (SURVEY.md §2) with the standard LLM
 * pipeline steps: context-window chunking, shard-local sequence packing,
 * and the Gopher-style duplicate-n-gram repetition signal.
 */
object Curation {

  /**
   * Split each document into fixed-size character chunks with 1-based
   * offsets (context-window segmentation). Empty documents produce no
   * chunks. Pure per-row explode — narrow, no shuffle, trivially
   * parallel at any scale.
   */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int = 500): DataFrame = {
    require(size > 0, "chunk size must be positive")
    val nChunks = ceil(length(col(textCol)).cast("double") / size).cast("int")
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol).as("id"), col(textCol).as("text"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        (col("chunk_idx") * size + 1).as("chunk_start"),
        col("text").substr(col("chunk_idx") * size + 1, lit(size)).as("chunk"))
      .withColumn("n_chunk_chars", length(col("chunk")))
  }

  /**
   * Shard-local greedy sequence packing: deterministic shard = id mod
   * `nShards`; within a shard, docs are packed in id order into fixed
   * token-budget bins (pack = running-token-total-before div budget, so a
   * doc straddling a boundary belongs to the pack where it starts). The
   * cross-shard independence is the scale story: each shard's running sum
   * is one window partition, and nShards grows with the cluster — no
   * global sort, no single-partition window.
   *
   * `nShards = 0` (the default) derives the shard count from the input's
   * SIZE — `max(8, parallelism, size-estimate / maxPartitionBytes)` — so
   * each shard's single-partition running-sum window stays roughly one
   * scan partition of data at ANY scale (a literal default of 8 would
   * mean 12.5 TB per window partition on a 100 TB corpus). The trade: the
   * derived count depends on the cluster/file layout, so pass an explicit
   * `nShards` when pack ids must be reproducible across environments (the
   * oracle queries pin 8).
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int = 2048, nShards: Int = 0): DataFrame = {
    require(budget > 0 && nShards >= 0, "budget must be positive, nShards >= 0")
    val shards = deriveShards(df, nShards)
    val base = df.select(col(idCol).as("id"),
      pmod(col(idCol), lit(shards)).cast("int").as("shard"),
      size(split(trim(col(textCol)), "\\s+")).as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum_before",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("id"), col("shard"), col("n_tokens"),
        expr(s"cum_before div $budget").as("pack_id"),
        expr(s"cum_before % $budget").as("pack_offset"))
  }

  /** Auto shard count (nShards = 0): scale with the INPUT SIZE so pack
    * windows stay bounded at any corpus scale, floored at 8 and at the
    * session's parallelism. Derived from Catalyst's leaf-stats size
    * estimate (file lengths for scans) over maxPartitionBytes — NOT from
    * `df.rdd.getNumPartitions`, which under AQE plans the exchanges and
    * MATERIALIZES every upstream query stage (a silent full pre-run of
    * the pipeline for non-scan inputs). The stats estimate runs no job;
    * for exchange-heavy plans it may overestimate (join-multiplied
    * stats), which costs pack balance, never correctness — capped so a
    * degenerate estimate can't explode the shard count. */
  private[graft] def deriveShards(df: DataFrame, nShards: Int): Int = {
    if (nShards > 0) nShards
    else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val perShard = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
      val est = (bytes / math.max(perShard, 1L)).min(BigInt(1 << 20)).toInt
      math.max(8, math.max(est,
        df.sparkSession.sparkContext.defaultParallelism))
    }
  }

  /**
   * Budgeted corpus selection — the data-constrained-training step: given
   * a quality score per document, keep the BEST documents until a global
   * token budget is exhausted (a doc whose selection STARTS inside the
   * budget is kept whole). Deterministic total order: (score desc, id asc).
   *
   * Input: (id, score, n_tokens) with score in [0, 1] (any quality metric
   * — [[TextAnalysis.qualityScore]] ratios, [[referenceLmQuality]], a
   * model score — out-of-range scores clamp into the edge bins, which
   * degrades binning granularity, never correctness). Output: the selected
   * rows, same columns.
   *
   * Scale story: the naive plan is a GLOBAL sort + running token sum —
   * one totally-ordered window partition over the corpus. Instead:
   * (1) histogram score into `bins` buckets (one small shuffle, ≤ bins
   * rows collected); (2) a driver prefix-sum over the histogram picks the
   * boundary bucket — buckets above it are kept whole, below it dropped,
   * with NO ordering of the corpus at all; (3) only the boundary bucket's
   * docs (≈ 1/bins of the corpus) pay an ordered running sum — and that
   * bucket is RANGE-partitioned on the selection order (score desc, id)
   * first, so each window partition holds ~1/bins of the bucket and a
   * driver prefix-sum over the ≤ `bins` per-partition subtotals stitches
   * the global running sum (the SortedSegments boundary-stitch shape).
   * No input distribution — including every doc sharing one score, where
   * ordering falls back to id and the range exchange splits on id — pays
   * a single-partition global window.
   *
   * Rows with a NULL score or NULL n_tokens violate the documented
   * contract (they can be neither ordered nor budgeted) and are dropped
   * up front — never silently binned or crashed on.
   */
  def selectByTokenBudget(scored: DataFrame, tokenBudget: Long,
      bins: Int = 1024): DataFrame = {
    require(bins > 0, "bins must be positive")
    val base = scored.select(col("id"), col("score"), col("n_tokens"))
      .filter(col("score").isNotNull && col("n_tokens").isNotNull)
    if (tokenBudget <= 0L) return base.filter(lit(false))
    // Clamp on the DOUBLE before the int cast: under ANSI mode (the
    // Spark 4 default) an out-of-[0,1] score would otherwise overflow
    // the cast and kill the job instead of landing in an edge bin.
    val binned = CacheScope.pin(base.withColumn("bin",
      least(greatest(floor(col("score") * bins), lit(0.0)),
        lit((bins - 1).toDouble)).cast("int")))
    // O(bins) driver histogram — same boundary-stitch budget as
    // SortedSegments (collect is bounded by `bins`, never by data).
    val sums = binned.groupBy(col("bin"))
      .agg(sum(col("n_tokens")).as("toks"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    var cum = 0L
    var boundary = -1
    var before = 0L
    for ((b, t) <- sums if boundary < 0)
      if (cum + t > tokenBudget) { boundary = b; before = cum } else cum += t
    if (boundary < 0) return binned.drop("bin") // whole corpus fits
    val full = binned.filter(col("bin") > boundary).drop("bin")
    // Boundary bucket: range-partition on the selection order — the range
    // exchange's sampler balances partitions even under total score ties
    // (the order keys are then (constant, id), still distinct). Pinned so
    // the sampled partition boundaries are decided ONCE: the per-partition
    // subtotal collect and the final window read the same materialization,
    // keeping spark_partition_id consistent between the two actions.
    val bnd = CacheScope.pin(binned.filter(col("bin") === boundary)
      .drop("bin")
      .repartitionByRange(bins, col("score").desc, col("id"))
      .withColumn("pid", spark_partition_id()))
    // Partition 0 holds the range FIRST in (score desc, id) order, so
    // ascending pid walks the global selection order: exclusive-prefix
    // the ≤ `bins` subtotals on the driver.
    val partToks = bnd.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("ptoks"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = partToks.scanLeft((0, 0L)) { case ((_, acc), (p, t)) =>
      (p, acc + t)
    }.tail.zip(partToks).map { case ((p, cumIncl), (_, t)) =>
      (p, cumIncl - t)
    }
    val spark = scored.sparkSession
    val offDf = broadcast(spark.createDataFrame(offsets.toSeq)
      .toDF("pid", "poff"))
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundarySel = bnd.join(offDf, Seq("pid"))
      .withColumn("cb",
        sum(col("n_tokens")).over(w) - col("n_tokens") + col("poff"))
      .filter(col("cb") < tokenBudget - before)
      .select(col("id"), col("score"), col("n_tokens"))
    full.unionByName(boundarySel)
  }

  /**
   * (id, ti, tok): whitespace tokens with RE-INDEXED positions — empty
   * tokens are removed BEFORE numbering, so positions are insensitive to
   * leading/duplicate whitespace. This is the cross-operator position
   * contract shared by [[segmentDedup]]'s fixed-window mode and
   * [[SpanDedup]] (span offsets and segment indexes must agree with the
   * oracles' identical re-index); change it in one place only.
   */
  private[operators] def reindexedTokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val reIdx = Window.partitionBy(col("id")).orderBy(col("i"))
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("i", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("ti", row_number().over(reIdx) - 1)
      .select("id", "ti", "tok")
  }

  /**
   * Deterministic content-hash train/validation split: a doc's split is a
   * pure function of its TEXT (md5 first hex digit), so byte-identical
   * docs always land in the same split — the leakage-safe alternative to
   * random sampling — and the assignment is reproducible on any engine
   * and any cluster size (no RNG, no per-partition state). `trainHexMax`
   * sets the ratio in 16ths: 'c' → 13/16 ≈ 81% train.
   */
  def contentSplit(df: DataFrame, idCol: String, textCol: String,
      trainHexMax: String = "c"): DataFrame = {
    require(trainHexMax.length == 1 &&
      ("0123456789abcdef".contains(trainHexMax)), "trainHexMax: one hex digit")
    df.select(col(idCol).as("id"),
      when(substring(md5(col(textCol)), 1, 1) <= trainHexMax, "train")
        .otherwise("val").as("split"))
  }

  /**
   * Benchmark decontamination: flag training documents that share any word
   * n-gram with an evaluation/benchmark corpus (the standard n-gram-overlap
   * decontamination check run before pretraining). Returns one row per
   * training doc: (id, n_shared, contaminated).
   *
   * Scale shape: both sides reduce to DISTINCT (id, shingle) first, and the
   * benchmark side — tiny by construction (eval sets are thousands of docs
   * against a 100 TB corpus) — collapses to a distinct shingle set that is
   * BROADCAST, so the training corpus is never shuffled: scan → hash-probe
   * → per-doc count.
   */
  def decontaminate(train: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 4): DataFrame = {
    val trSh = Dedup.shingleStrings(train, idCol, textCol, n)
    val evSh = Dedup.shingleStrings(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct()
    val hits = trSh.join(broadcast(evSh), Seq("shingle"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("int"))
  }

  /**
   * Deterministic stratified sampling: keep a row iff a uniform hash of its
   * TEXT falls under its stratum's rate — the content-keyed analogue of
   * `df.sampleBy`, reproducible across engines, runs, and cluster sizes
   * (no RNG state), and leakage-consistent (byte-identical docs always make
   * the same keep/drop decision). Used for domain/language mixture
   * reweighting in pretraining pipelines. Pure per-row filter: no shuffle.
   *
   * The uniform is the first 8 hex digits of md5(text) compared against a
   * precomputed 8-hex-digit threshold (rate · 2³²); rate ≥ 1.0 uses "g",
   * which sorts after every hex digit, i.e. keep-all.
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      textCol: String, rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    def thr(r: Double): String = {
      require(r >= 0.0 && r <= 1.0, s"rate out of [0,1]: $r")
      if (r >= 1.0) "g" else f"${(r * 4294967296L).toLong}%08x"
    }
    val thresh = rates.foldLeft(lit(thr(defaultRate))) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(thr(r))).otherwise(acc)
    }
    df.filter(substring(md5(col(textCol)), 1, 8) < thresh)
      .select(col(idCol).as("id"), col(strataCol).as("stratum"))
  }

  /**
   * Temperature-based mixture resampling (the UniMax/mT5-style language
   * or source balancing step): sample stratum s at rate
   * `min(1, targetFrac · N · n_s^(α−1) / Σ_t n_t^α)` — α = 1 reproduces
   * uniform sampling at `targetFrac`; α < 1 flattens the mixture,
   * upsampling rare strata RELATIVE to common ones while holding the
   * overall expected doc budget at ~targetFrac·N (exactly, when no rate
   * clamps at 1). Selection is the same deterministic content-hash draw
   * as [[stratifiedSample]] (leakage-safe, RNG-free, engine-portable).
   *
   * Scale shape: the stratum-count frame is tiny (one row per stratum) —
   * the Σ n^α denominator is a broadcast 1-row aggregate over it and the
   * per-stratum rates broadcast back into the corpus-side join; the
   * corpus itself is never shuffled. Rates are rounded to 6 decimals
   * BEFORE the threshold compare so both engines threshold the same
   * number (pow/summation may differ in final ULPs across engines).
   * Returns (id, stratum, rate) for the selected docs.
   */
  def temperatureSample(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, alpha: Double,
      targetFrac: Double): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive: $alpha")
    require(targetFrac >= 0.0 && targetFrac <= 1.0,
      s"targetFrac out of [0,1]: $targetFrac")
    // Narrow to aliased columns FIRST: joining rates back by the raw
    // strataCol would be ambiguous if the input already carries a column
    // named "stratum" (or "rate").
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"),
      col(strataCol).as("stratum"))
    val rates = temperatureRates(base, alpha, targetFrac)
    // Null-safe join: a NULL stratum is a real group (it has a rate row
    // from the groupBy above) — a plain equi-join would silently drop
    // every NULL-stratum doc while still counting it in the denominator.
    base.join(broadcast(rates.withColumnRenamed("stratum", "__ts_stratum")),
        col("stratum") <=> col("__ts_stratum"))
      .filter(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
        < col("rate") * 4294967296.0)
      .select(col("id"), col("stratum"), col("rate"))
  }

  /**
   * Deterministic weighted sampling without replacement (Efraimidis–
   * Spirakis A-ES, "weighted random sampling with a reservoir"): each
   * row draws u ∈ (0, 1] from a salted content hash (the same RNG-free
   * draw discipline as [[stratifiedSample]] — rerunnable, leakage-safe,
   * engine-portable) and the k rows with the largest u^(1/w) are the
   * sample — inclusion probability proportional to weight, the exact
   * reservoir rule. The comparison key is ln(u)/w (a monotone transform
   * that dodges pow underflow for tiny u / huge w), micro-quantized to
   * an integer nano-key (q86 recipe) so the top-k ORDER is bit-identical
   * across engines and the whole draw sits under a DuckDB oracle (q120).
   *
   * Scale shape: one narrow scan computing (hash, key), then top-k =
   * TakeOrderedAndProject (per-partition heaps, O(k) to the driver) —
   * the corpus is never shuffled. Changing `salt` re-draws the whole
   * sample independently (WeightedSampleSpec uses that for the
   * frequency test).
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    aesKeys(df, idCol, weightCol, salt)
      .orderBy(col("skey").desc, col("id"))
      .limit(k)
  }

  /** The keyed-but-unlimited A-ES frame behind [[weightedSample]]:
    * (id, weight, skey). Exposed so the streaming reservoir
    * ([[graft.streaming.ArtifactStreams.weightedReservoirStream]]) can
    * fold per-batch keys into a carried top-k — the A-ES key makes
    * "top-k of union of top-k's == global top-k" hold, which is the
    * associativity a streaming reservoir needs. */
  private[graft] def aesKeys(df: DataFrame, idCol: String,
      weightCol: String, salt: String): DataFrame =
    df.select(col(idCol).as("id"),
        col(weightCol).cast("long").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("h",
        conv(substring(md5(concat(lit(salt), lit("|"),
          col("id").cast("string"))), 1, 8), 16, 10).cast("long"))
      .withColumn("skey",
        round(log((col("h") + 1) / lit(4294967296.0)) / col("weight")
          * lit(1e9)).cast("long"))
      .select(col("id"), col("weight"), col("skey"))

  /** Per-stratum [[weightedSample]]: k winners per stratum (balanced
    * coverage with weight bias inside each — the mixture-sampling
    * refinement where q72 fixes RATES and q120 fixes a GLOBAL size).
    * One window over the nano-key per stratum; the corpus shuffles once
    * on the stratum key. Returns (stratum, id, weight, skey, rk). */
  def weightedSampleGrouped(df: DataFrame, idCol: String,
      weightCol: String, strataCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    aesKeyed(df, idCol, weightCol, strataCol, salt)
      .filter(col("rk") <= k)
  }

  /** Per-stratum A-ES ranking shared by [[weightedSampleGrouped]] and
    * [[weightedSampleByQuota]]: (stratum, id, weight, skey, rk). */
  private def aesKeyed(df: DataFrame, idCol: String, weightCol: String,
      strataCol: String, salt: String): DataFrame =
    df.select(col(strataCol).as("stratum"),
        col(idCol).as("id"), col(weightCol).cast("long").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("skey",
        round(log((conv(substring(md5(concat(lit(salt), lit("|"),
            col("id").cast("string"))), 1, 8), 16, 10).cast("long") + 1)
          / lit(4294967296.0)) / col("weight") * lit(1e9)).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("stratum"))
          .orderBy(col("skey").desc, col("id"))))

  /**
   * [[weightedSampleGrouped]] with PER-STRATUM budgets: `quotas` is a
   * frame whose FIRST column is the stratum key and which carries a
   * `quota` column — [[mixingQuotas]]' output verbatim — and each
   * stratum keeps its own top-`quota` A-ES draw. The quota frame is
   * O(strata) and broadcasts; the corpus pays the same one ranking
   * window per stratum as the fixed-k form.
   */
  def weightedSampleByQuota(df: DataFrame, idCol: String,
      weightCol: String, strataCol: String, quotas: DataFrame,
      salt: String = ""): DataFrame = {
    val q = quotas.select(col(quotas.columns.head).as("stratum"),
      col("quota").cast("long").as("quota"))
    aesKeyed(df, idCol, weightCol, strataCol, salt)
      .join(broadcast(q), Seq("stratum"))
      .filter(col("rk") <= col("quota"))
      .drop("quota")
  }

  /** The per-stratum rate frame behind [[temperatureSample]] — (stratum,
    * rate), one row per stratum INCLUDING a NULL-stratum group. Exposed
    * so composing pipelines ([[curate]]) can broadcast the rates and
    * apply the threshold filter inline instead of semi-joining selected
    * ids back across a corpus shuffle. */
  private[graft] def temperatureRates(base: DataFrame, alpha: Double,
      targetFrac: Double): DataFrame = {
    val counts = base.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_s"))
    val denom = counts.agg(
      sum(pow(col("n_s"), alpha)).as("denom"),
      sum(col("n_s")).as("n_total"))
    counts.crossJoin(broadcast(denom))
      .select(col("stratum"),
        round(least(lit(1.0), lit(targetFrac) * col("n_total") *
          pow(col("n_s"), alpha - 1.0) / col("denom")), 6).as("rate"))
  }

  /**
   * DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every document by
   * how target-like its hashed-bigram distribution is. Consecutive
   * whitespace-bigram features hash into `buckets` buckets (first 8 md5
   * hex digits — engine-portable, see [[Dedup.portableSalt]]); bucket
   * log-likelihood ratio `ln(p_target(b) / p_raw(b))` under add-one
   * smoothing; a document's weight is the mean LLR over its bigram
   * occurrences. Returns the topK docs as (id, n_bigrams, weight, rank).
   *
   * Cross-engine determinism: smoothed probabilities divide exact
   * integer-valued doubles (counts < 2^53) with identical association in
   * the DuckDB mirror. The per-bucket LLR is quantized to an integer
   * micro-LLR (`round(ln(·)·1e6)` as long) so the per-doc accumulation is
   * EXACT integer arithmetic — averaging engine-rounded doubles instead
   * puts ~1/12 of docs on a half-grid rounding boundary where libm ULP
   * noise flips the 6th decimal (observed at sf0.01); quantizing first
   * leaves only the measure-zero chance of a bucket's `ln` landing within
   * 1e-10 of an integer-micro boundary.
   *
   * Scale shape: bigrams never leave their document partition until the
   * one bucket aggregation (output ≤ buckets rows); totals are a broadcast
   * 1-row aggregate; the LLR table (≤ buckets rows) broadcasts back onto
   * the bigram stream, so the corpus shuffles once (doc_id groupBy). The
   * topK selection is a TakeOrdered; the rank window runs over ≤ topK
   * rows — bounded by the knob, never by data. The tokenize→bigram
   * stage runs twice (once under the bucket aggregation, once under the
   * weight join) by design: materializing a corpus-sized bigram cache
   * costs more than the second narrow pass at scale, and the bucket
   * pass is projection-pruned to (is_target, bg).
   */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024, topK: Int = 100): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(topK > 0, s"topK must be positive: $topK")
    val base = docs.select(col(idCol).as("id"), isTarget.as("is_target"),
        filter(split(col(textCol), "\\s+"), t => t =!= lit("")).as("toks"))
      .filter(size(col("toks")) >= 2)
    // element_at is 1-based: sequence(1, n-1) pairs toks[i] with toks[i+1].
    val bigrams = base.select(col("id"), col("is_target"),
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1)))).as("bg"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("bg")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)))
    val bucketCounts = bigrams.groupBy(col("bucket")).agg(
      count(lit(1)).as("c_raw"),
      sum(when(col("is_target"), 1L).otherwise(lit(0L))).as("c_tgt"))
    val totals = bucketCounts.agg(
      sum(col("c_raw")).as("t_raw"), sum(col("c_tgt")).as("t_tgt"))
    val llr = bucketCounts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log(
          ((col("c_tgt") + 1).cast("double") /
            (col("t_tgt") + buckets).cast("double")) /
          ((col("c_raw") + 1).cast("double") /
            (col("t_raw") + buckets).cast("double"))) * 1e6)
          .cast("long").as("illr"))
    val weights = bigrams.join(broadcast(llr), Seq("bucket"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("illr")).as("s_illr"))
      .select(col("id"), col("n_bigrams"),
        round(col("s_illr").cast("double") / col("n_bigrams") / lit(1e6), 6)
          .as("weight"))
    weights.orderBy(col("weight").desc, col("id")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("weight").desc, col("id"))))
  }

  /**
   * Full corpus-curation pipeline — the standard pretraining-data
   * preparation flow, composed from this file's operators plus the dedup
   * family: exact dedup → MinHash near-dup removal → quality filter
   * (length + Gopher repetition) → benchmark decontamination → stratified
   * mixture sampling → content-hash train/val split → shard-local sequence
   * packing. Each stage is a pure DataFrame transform with the scale shape
   * documented on its operator; the two frames traversed twice (post-exact,
   * post-quality) are persisted (differing projections defeat exchange
   * reuse — measured on q43).
   *
   * Near-dup removal keeps the smaller id of each verified pair (greedy
   * keep-first, the standard corpus-dedup policy — transitively connected
   * groups may retain more than one member). With
   * `cfg.clusterDedup = true` the pair graph is transitively closed
   * instead ([[Dedup.neardupClustersFromPairs]] — a few bounded
   * label-propagation rounds; near-dup components are shallow) and exactly
   * ONE member per cluster survives (the min id) — e.g. docs 1~3 and 2~3
   * with 1≁2: pairwise keeps {1, 2}, cluster keeps {1}.
   */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, cfg: CurationConfig = CurationConfig()): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"),
      col(strataCol).as("stratum"))
    if (cfg.clusterDedup) {
      val t = base.schema("id").dataType
      require(t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType,
        s"clusterDedup needs an integral id column, got $t")
    }

    val exactKept = CacheScope.pin(Dedup.exact(base, "id", "text")
      .filter(col("is_dup") === 0)
      .select("id", "text", "stratum"))
    val nearPairs = Dedup
      .minhashDedup(exactKept, "id", "text", n = cfg.shingleN,
        k = cfg.minhashK, bands = cfg.minhashBands,
        threshold = cfg.minhashThreshold, maxBucket = cfg.minhashMaxBucket,
        hash = cfg.minhashHash, overflow = cfg.minhashOverflow)
    val nearDrop =
      if (cfg.clusterDedup)
        Dedup.neardupClustersFromPairs(nearPairs)
          .filter(col("id") =!= col("cluster_id")).select("id")
      else nearPairs.select(col("id_b").as("id")).distinct()
    // Persisted: both the repetition signal and the quality join traverse
    // it, and its lineage contains the whole MinHash near-dup subtree.
    val deduped = CacheScope.pin(
      exactKept.join(nearDrop, Seq("id"), "left_anti"))

    val quality = deduped
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .join(ngramRepetition(deduped, "id", "text"), Seq("id"))
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("dup_trigram_frac") <= cfg.maxDupTrigramFrac)
      .select("id", "text", "stratum", "n_tokens")
      .transform(CacheScope.pin(_))

    val clean0 = cfg.benchmark match {
      case Some(b) =>
        val flagged = decontaminate(quality, b.select(col(idCol).as("id"),
          col(textCol).as("text")), "id", "text", cfg.decontaminateN)
        quality.join(flagged.filter(col("contaminated") === 0).select("id"),
          Seq("id"), "left_semi")
      case None => quality
    }
    // The temperature stage runs a small strata aggregation OVER the
    // clean frame and then filters it — pin it so the second traversal
    // doesn't re-execute the decontamination branch (quality is pinned,
    // the decontaminate semi-join above is not). The budget-only case
    // pins once inside its own stage (sampled0 IS clean there; pinning
    // here too would hold two materialized corpus copies in checkpoint
    // mode).
    val clean =
      if (cfg.temperature.isDefined) CacheScope.pin(clean0) else clean0
    // The tail stages are inlined as column expressions rather than joins
    // against `contentSplit`/`stratifiedSample`/`packSequences` applied to
    // the same frame: a self-join would re-execute the whole un-persisted
    // lineage above (dedup + quality + decontamination) once per branch —
    // measured 48 s vs ~10 s for q73 at sf0.1. Formulas are identical to
    // the standalone operators (which remain the composable/oracle-checked
    // forms).
    require(cfg.temperature.isEmpty || cfg.sampleRates.isEmpty,
      "temperature and sampleRates are alternative mixture stages")
    val sampled0 = cfg.temperature match {
      case Some((alphaT, fT)) =>
        // Rates from the post-filter strata counts (tiny agg), broadcast
        // back and applied as an INLINE threshold filter — same
        // no-corpus-shuffle discipline as the sampleRates branch below
        // (a semi-join of selected ids would shuffle the corpus by id).
        val rates = temperatureRates(clean, alphaT, fT)
        clean.join(broadcast(rates.withColumnRenamed("stratum", "__ts_s")),
            col("stratum") <=> col("__ts_s"))
          .filter(conv(substring(md5(col("text")), 1, 8), 16, 10)
            .cast("long") < col("rate") * 4294967296.0)
          .drop("__ts_s", "rate")
      case None =>
        if (cfg.sampleRates.isEmpty) clean
        else {
          def thr(r: Double): String =
            if (r >= 1.0) "g" else f"${(r * 4294967296L).toLong}%08x"
          val thresh = cfg.sampleRates.foldLeft(lit(thr(1.0))) {
            case (acc, (k, r)) =>
              when(col("stratum") === k, lit(thr(r))).otherwise(acc)
          }
          clean.filter(substring(md5(col("text")), 1, 8) < thresh)
        }
    }
    // Optional data-constrained budget: keep the least-repetitive docs
    // (distinct-token ratio, as q82) until the whitespace-token budget is
    // exhausted — [[selectByTokenBudget]]'s two-phase plan, never a
    // corpus-wide sort.
    val sampled = cfg.tokenBudget match {
      case Some(budget) =>
        val s = CacheScope.pin(sampled0)
        val toks = s.select(col("id"),
          explode(split(col("text"), "\\s+")).as("tok"))
          .filter(col("tok") =!= "")
        val scored = toks.groupBy(col("id"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("id"))
          .agg(sum(col("c")).as("bn"), count(lit(1)).as("nd"))
          .select(col("id"),
            round(col("nd").cast("double") / col("bn"), 6).as("score"),
            col("bn").as("n_tokens"))
        s.join(selectByTokenBudget(scored, budget).select("id"),
          Seq("id"), "left_semi")
      case None => sampled0
    }
    val withSplit = sampled.withColumn("split",
      when(substring(md5(col("text")), 1, 1) <= cfg.trainHexMax, "train")
        .otherwise("val"))
    // Shard count derived from the INPUT's partitioning (not the filtered
    // tail — same corpus, same shards regardless of filter rates).
    val shards = deriveShards(base, cfg.nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withSplit
      .withColumn("shard", pmod(col("id"), lit(shards)).cast("int"))
      .withColumn("cum_before",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("id"), col("text"), col("stratum"), col("n_tokens"),
        col("split"), col("shard"),
        expr(s"cum_before div ${cfg.packBudget}").as("pack_id"),
        expr(s"cum_before % ${cfg.packBudget}").as("pack_offset"))
  }

  /** Tuning knobs for [[curate]]; defaults follow the operator docs.
    * `benchmark` (same id/text column names as the corpus) enables the
    * decontamination stage; `sampleRates` enables mixture sampling. */
  case class CurationConfig(
      // 8 bands × 4 rows: ≥ 99% candidate recall at the 0.8 near-dup
      // threshold while keeping weak pairs (j ≈ 0.1) out of the verify
      // join — 16×2 banding admits ~15% of ALL pairs as candidates and
      // turns verification quadratic (measured: q73 48 s → ~8 s at sf0.1).
      shingleN: Int = 3, minhashK: Int = 32, minhashBands: Int = 8,
      minhashThreshold: Double = 0.8,
      minTokens: Int = 10, maxDupTrigramFrac: Double = 0.5,
      // true = keep exactly one doc per TRANSITIVE near-dup cluster
      // (min id) instead of the pairwise keep-smaller-id default, which
      // can retain several members of one chain (see curate's scaladoc).
      clusterDedup: Boolean = false,
      benchmark: Option[DataFrame] = None, decontaminateN: Int = 4,
      sampleRates: Map[String, Double] = Map.empty,
      trainHexMax: String = "c",
      packBudget: Int = 2048,
      // 0 = derive from input partitions (see packSequences: a fixed
      // literal is scale-hostile — 12.5 TB/window-partition at 100 TB).
      // Pass an explicit count for cross-environment-reproducible packs.
      nShards: Int = 0,
      minhashHash: Dedup.HashFamily = Dedup.XxHash64Family,
      // Over-cap LSH bucket policy + cap for the near-dup stage ([[Dedup
      // .Overflow]]): Salt keeps boilerplate-heavy mega-buckets pairable
      // at bounded cost instead of dropping them.
      minhashOverflow: Dedup.Overflow = Dedup.Overflow.Drop,
      minhashMaxBucket: Int = Dedup.DefaultMaxBucket,
      // (alpha, targetFrac) — temperature mixture resampling
      // ([[temperatureSample]]), the computed-rate alternative to the
      // explicit per-stratum `sampleRates`.
      temperature: Option[(Double, Double)] = None,
      // Whitespace-token budget applied after the mixture stage: keep the
      // least-repetitive docs first ([[selectByTokenBudget]]). NOTE:
      // setting this makes curate() EAGER — the budget stage's histogram
      // prefix runs jobs (the whole upstream pipeline) at CALL time, not
      // first action; leave None to keep construction a pure plan
      // transform.
      tokenBudget: Option[Long] = None)

  /**
   * Corpus-level repeated-segment removal — the line-level dedup step of
   * CCNet/RefinedWeb-style pipelines: a segment (line) that occurs in more
   * than `maxDf` distinct documents is boilerplate (navigation chrome,
   * cookie banners, license headers) and is dropped from every document;
   * the survivors are reassembled in order. The segmentation unit is a
   * `delimiter` line when the corpus has line structure, else fixed
   * windows of `segWords` whitespace tokens (token positions are
   * re-indexed after empty-token filtering so segmentation is insensitive
   * to leading/duplicate whitespace).
   *
   * Returns one row per input document: (id, clean_text, n_seg_kept,
   * n_seg_dropped); a doc that is entirely boilerplate stays with
   * clean_text = ''.
   *
   * Scale shape: one shuffle on id for the re-index window (the
   * (id, seg_i) segment aggregation reuses its HashPartitioning), one
   * shuffle on segment text for the corpus document-frequency count, and
   * the reassembly groups on id again. The segment frame is persisted —
   * the df aggregation and the flag join both traverse it (differing
   * projections defeat exchange reuse). The over-represented set
   * (df > maxDf) is small by construction at any real threshold and the
   * flag join adapts accordingly AT RUNTIME: AQE observes the df-filter's
   * actual shuffle size and converts the join to broadcast when it is
   * small (plan-asserted in CurationSpec), falling back to the
   * always-completes shuffle join for a pathological mostly-boilerplate
   * corpus — no eager size probe, so constructing the operator stays a
   * pure plan transform (no job until an action). `broadcastBoiler =
   * true` forces the broadcast hint for corpora the caller KNOWS are
   * mostly unique (skips the runtime decision; overflow fails the job
   * rather than degrading).
   */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int = 2, segWords: Int = 8,
      delimiter: Option[String] = None,
      broadcastBoiler: Boolean = false): DataFrame = {
    require(maxDf >= 1 && segWords >= 1, "maxDf and segWords must be >= 1")
    val reIdx = Window.partitionBy(col("id")).orderBy(col("i"))
    val segs0 = delimiter match {
      case Some(d) =>
        df.select(col(idCol).as("id"),
            posexplode(split(col(textCol), java.util.regex.Pattern.quote(d)))
              .as(Seq("i", "seg")))
          .filter(trim(col("seg")) =!= "")
          .withColumn("seg_i", row_number().over(reIdx) - 1)
          .select("id", "seg_i", "seg")
      case None =>
        reindexedTokens(df, idCol, textCol)
          .groupBy(col("id"), expr(s"ti div $segWords").as("seg_i"))
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("ti"), col("tok")))),
            x => x.getField("tok")), " ").as("seg"))
    }
    val segs = CacheScope.pin(segs0)
    val boiler0 = segs.groupBy(col("seg"))
      .agg(countDistinct(col("id")).as("seg_df"))
      .filter(col("seg_df") > maxDf)
      .select(col("seg"), lit(1).as("is_bl"))
    val boiler = if (broadcastBoiler) broadcast(boiler0) else boiler0
    val sep = delimiter.getOrElse(" ")
    val agg = segs.join(boiler, Seq("seg"), "left")
      .withColumn("kept", col("is_bl").isNull)
      .groupBy(col("id"))
      .agg(
        array_join(transform(sort_array(collect_list(
            when(col("kept"), struct(col("seg_i"), col("seg"))))),
          x => x.getField("seg")), sep).as("clean_text"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_seg_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_seg_dropped"))
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .na.fill("", Seq("clean_text"))
      .na.fill(0L, Seq("n_seg_kept", "n_seg_dropped"))
  }

  /**
   * Gopher-style repetition signal: per document, the fraction of n-gram
   * occurrences whose n-gram appears more than once within the doc (n = 2
   * and 3 over whitespace tokens). High values flag boilerplate/looping
   * text. One shuffle on id total: the per-doc lead window and both
   * downstream aggregations all reuse HashPartitioning(id) (grouping by
   * (id, …) is clustered-satisfied by the window's partitioning).
   */
  def ngramRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("i", "tok")))
      .filter(col("tok") =!= "")
    val w = Window.partitionBy(col("id")).orderBy(col("i"))
    val seq = toks
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
    // Both n-gram sizes in ONE pass: unpivot to (id, n, ngram) rows so a
    // single aggregation chain serves bigrams and trigrams (no second
    // traversal of the window lineage).
    val ngrams = seq.select(col("id"), explode(array(
        when(col("t1").isNotNull,
          struct(lit(2).as("n"), concat_ws(" ", col("tok"), col("t1")).as("ng"))),
        when(col("t2").isNotNull,
          struct(lit(3).as("n"),
            concat_ws(" ", col("tok"), col("t1"), col("t2")).as("ng")))))
        .as("g"))
      .filter(col("g").isNotNull)
      .select(col("id"), col("g.n").as("n"), col("g.ng").as("ng"))
    // Every (id, n) group has >= 1 occurrence, so the denominator is
    // never zero.
    val per = ngrams.groupBy(col("id"), col("n"), col("ng"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"), col("n"))
      .agg(round(sum(when(col("c") > 1, col("c")).otherwise(0)).cast("double") /
        sum(col("c")), 6).as("frac"))
    val wide = per.groupBy(col("id")).agg(
      max(when(col("n") === 2, col("frac"))).as("dup_bigram_frac"),
      max(when(col("n") === 3, col("frac"))).as("dup_trigram_frac"))
    // Docs too short for an n-gram (or empty) define the signal as 0.
    df.select(col(idCol).as("id"))
      .join(wide, Seq("id"), "left")
      .na.fill(0.0, Seq("dup_bigram_frac", "dup_trigram_frac"))
  }

  /**
   * Corpus MIXING quotas: allocate a document budget across groups
   * (languages, domains, sources) toward a UNIFORM target, capped by
   * availability, with the shortfall redistributed — the "balance
   * languages but respect what exists" step a multilingual training mix
   * runs before sampling (the per-group quota then feeds
   * [[weightedSampleGrouped]] / [[selectByTokenBudget]]).
   *
   * Exact integer algorithm, two fixed passes:
   *  1. uniform target: base = budget div n, the budget mod n leftover
   *     units go one each to the first groups in group order (uniform
   *     targets have identical fractional remainders — the tie-break IS
   *     the largest-remainder rule here); cap at availability;
   *  2. redistribute min(leftover, total headroom) proportionally to
   *     remaining headroom by largest remainder (remainders compared
   *     exactly; ties to group order).
   *
   * Cross-multiplications (leftover × headroom) run in DECIMAL(38,0) —
   * a BIGINT product wraps once budget × max-headroom passes 2⁶³, which
   * a 100 TB corpus reaches (the q173 lesson). All windows run over the
   * GROUPS aggregate — O(distinct groups) rows, thousands at most, never
   * the corpus — so the "no un-partitioned windows" rule is satisfied by
   * input size, not by partitioning.
   *
   * Output: (group, avail, quota) with Σ quota = min(budget, Σ avail).
   */
  def mixingQuotas(counts: DataFrame, groupCol: String, availCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget >= 0: $budget")
    val c = counts.select(col(groupCol).as("g"),
      col(availCol).cast("long").as("avail"))
    val tot = c.agg(count(lit(1)).as("n"))
    val wg = Window.orderBy(col("g"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val p1 = c.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"$budget div n"))
      .withColumn("extra",
        when(row_number().over(wg) <= lit(budget) % col("n"), 1L)
          .otherwise(0L))
      .withColumn("alloc1", least(col("base") + col("extra"), col("avail")))
      .withColumn("h", col("avail") - col("alloc1"))
      .withColumn("left1", lit(budget) - sum(col("alloc1")).over(all))
      .withColumn("hsum", sum(col("h")).over(all))
      .withColumn("l2", least(col("left1"), col("hsum")))
    val p2 = p1
      .withColumn("share", when(col("hsum") > 0,
          expr("CAST((CAST(l2 AS DECIMAL(38,0)) * h) div hsum AS BIGINT)"))
        .otherwise(0L))
      .withColumn("fr", when(col("hsum") > 0,
          expr("CAST(l2 AS DECIMAL(38,0)) * h % hsum"))
        .otherwise(expr("CAST(0 AS DECIMAL(38,0))")))
      .withColumn("need", col("l2") - sum(col("share")).over(all))
      .withColumn("extra2",
        when(row_number().over(Window.orderBy(col("fr").desc, col("g")))
          <= col("need"), 1L).otherwise(0L))
    p2.select(col("g").as(groupCol), col("avail"),
      (col("alloc1") + col("share") + col("extra2")).as("quota"))
  }
}
