package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{Dedup, SpanDedup}

/**
 * Streaming ingestion curation: documents arrive as a stream and each
 * micro-batch is near-dup-probed against the STORED corpus signature table
 * ([[Dedup.minhashBandTable]]'s artifact) — the streaming face of
 * [[Dedup.incrementalMinhash]], i.e. continuous corpus ingestion with
 * dedup-on-arrival instead of daily batches.
 *
 * `foreachBatch` is the right tool here (not a continuous stream-static
 * join): the exact-verify stage needs a per-candidate-pair aggregation
 * over shared shingles, which a pure streaming plan would force into
 * stateful aggregation with unbounded pair state, while per micro-batch it
 * is the same bounded batch job the incremental operator already runs —
 * once per trigger, corpus artifact probed and never shuffled, batch side
 * broadcast. This is the standard Spark pattern for "reuse a verified
 * batch operator incrementally".
 */
object CurationStreams {

  /** documents.parquet file schema (matches /root/testdata layout). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Stream of documents from a directory of parquet files. */
  def readDocumentStream(spark: SparkSession, dir: String,
      glob: String = "documents.parquet"): DataFrame =
    spark.readStream
      .schema(DocumentSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)

  /**
   * Probe each arriving micro-batch against the existing corpus; every
   * batch's (batch_id, corpus_id, est_jaccard, jaccard) matches feed
   * `sink` (memory table, parquet append, message bus — any batch writer).
   * Pass the precomputed `corpusBands` artifact in production so no
   * trigger ever re-signs the corpus. Internal per-trigger caches are
   * unpersisted after `sink` returns (the stream is long-running; leaked
   * cache entries would otherwise accumulate forever).
   *
   * Scope, as for the batch operator: matches are batch-vs-CORPUS only.
   * Docs that arrived in EARLIER micro-batches are not probe targets
   * until they are folded into the corpus artifact — rebuild (or append
   * to) `corpusBands` on the cadence your dedup SLA needs, exactly like
   * the daily-batch flow; within-batch duplicates are handled by running
   * [[Dedup.exact]]/[[Dedup.minhashDedup]] on the batch inside `sink`.
   */
  def incrementalDedupStream(docs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      hash: Dedup.HashFamily = Dedup.XxHash64Family,
      corpusBands: Option[DataFrame] = None)(
      sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (matches, cleanup) = Dedup.incrementalMinhashWithCleanup(
          batch, corpus, idCol, textCol, n = n, k = k, bands = bands,
          threshold = threshold, maxBucket = maxBucket, hash = hash,
          corpusBands = corpusBands)
        try sink(matches) finally cleanup()
      }
      .start()

  /**
   * [[incrementalDedupStream]] plus the fold the plain stream defers to a
   * rebuild cadence: after each trigger's probe, the batch is APPENDED into
   * the corpus signature artifact ([[Dedup.appendToBandTable]] — only the
   * touched (band, bh) buckets are re-capped), so the NEXT trigger's docs
   * are probed against everything that has ever arrived, not just the
   * initial corpus snapshot. This closes the "docs from earlier
   * micro-batches are not probe targets" window at the cost of carrying
   * the artifact through the stream.
   *
   * State discipline per trigger: the folded artifact and the batch's text
   * (needed by later triggers' exact-verify stage) are pinned with eager
   * `localCheckpoint` — lineage truncates to a leaf, so plans never grow
   * with trigger count — and the previous artifact's blocks are freed. The
   * accumulated batch-text union grows by one leaf per trigger; a
   * production deployment folds batches into the corpus TABLE (and the
   * persisted artifact files) on its usual write path instead of holding
   * them in memory — this wrapper is the in-session shape of that loop.
   * Append-vs-rebuild parity is exact away from the cap boundary; pass
   * the uncapped bucket-count sidecar (`corpusBandCounts`, from
   * [[Dedup.minhashBandTableWithCounts]]) for bit-exact parity — the
   * stream then carries the UPDATED sidecar across triggers (a stale
   * sidecar would erode the cap on chained appends).
   *
   * Failure semantics: foreachBatch is at-least-once — a trigger can be
   * RE-RUN after a transient failure, so the fold is guarded by the batch
   * id (a re-delivered batch is re-probed and re-sunk, but folded only
   * once; double-folding would duplicate band rows and inflate the
   * sidecar, silently dropping buckets below the real cap). The guard is
   * made atomic by MATERIALIZING every failable fold job (folded
   * artifact, updated sidecar, batch texts — each an eager checkpoint)
   * BEFORE mutating any carried state: a failure anywhere leaves the
   * pre-fold state fully intact, so the retry re-enters cleanly instead
   * of re-folding a half-applied batch. The artifact state itself is
   * session-local: on restart-from-checkpoint it rebuilds from the
   * ORIGINAL corpus while committed batches are not replayed — use
   * [[incrementalDedupStreamDurable]] for the restart-safe shape.
   */
  def incrementalDedupStreamFolding(docs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      hash: Dedup.HashFamily = Dedup.XxHash64Family,
      corpusBands: Option[DataFrame] = None,
      corpusBandCounts: Option[DataFrame] = None)(
      sink: DataFrame => Unit): StreamingQuery = {
    var artifact = corpusBands
      .getOrElse(Dedup.minhashBandTable(corpus, idCol, textCol, n, k, bands,
        maxBucket, hash))
      .localCheckpoint(true)
    var counts: Option[DataFrame] =
      corpusBandCounts.map(_.localCheckpoint(true))
    val corpusBase = corpus.select(col(idCol), col(textCol))
    var laterDocs: Option[DataFrame] = None
    var lastFolded = -1L
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val corpusNow = laterDocs
          .map(corpusBase.unionByName(_)).getOrElse(corpusBase)
        val (matches, cleanup) = Dedup.incrementalMinhashWithCleanup(
          batch, corpusNow, idCol, textCol, n = n, k = k, bands = bands,
          threshold = threshold, maxBucket = maxBucket, hash = hash,
          corpusBands = Some(artifact))
        try {
          sink(matches)
          // Fold the batch into the artifact (and the carried sidecar)
          // for the next trigger — at most ONCE per batch id (foreachBatch
          // is at-least-once; see scaladoc). The fold runs BEFORE the
          // probe's cleanup so its identical batch-shingle plan hits the
          // still-persisted probe frames (CacheManager matches by plan)
          // instead of re-running the dominant signature build.
          if (batchId > lastFolded) {
            val ((folded0, newCounts0), caches) =
              graft.operators.CacheScope.tracking {
                counts match {
                  case Some(c) =>
                    val (a, nc) = Dedup.appendToBandTableWithCounts(artifact,
                      c, batch, idCol, textCol, n, k, bands, maxBucket, hash)
                    (a, Some(nc))
                  case None =>
                    (Dedup.appendToBandTable(artifact, batch, idCol, textCol,
                      n, k, bands, maxBucket, hash), None)
                }
              }
            // Materialize EVERY failable job before touching carried
            // state; the swap below is pure driver-side bookkeeping. A
            // checkpoint failing midway unpins the partial results and
            // rethrows with the pre-fold state intact, so the at-least-
            // once retry can't fold the batch twice (ADVICE r3: the old
            // order updated `artifact` before the batch-text checkpoint,
            // leaving a window where a retry re-entered with
            // batchId > lastFolded and duplicated band rows).
            val staged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
            val (folded, newCounts, batchDocs) =
              try {
                val f = boundedCheckpoint(folded0); staged += f
                val nc = newCounts0.map { c =>
                  val p = boundedCheckpoint(c); staged += p; p
                }
                val bd = batch.select(col(idCol), col(textCol))
                  .localCheckpoint(true); staged += bd
                (f, nc, bd)
              } catch {
                case e: Throwable => staged.foreach(unpin); throw e
              } finally caches.release()
            unpin(artifact)
            counts.foreach(unpin)
            artifact = folded
            counts = newCounts
            laterDocs = Some(laterDocs.map(_.unionByName(batchDocs))
              .getOrElse(batchDocs))
            lastFolded = batchId
          }
        } finally cleanup()
      }
      .start()
  }

  /**
   * Restart-safe continuous ingestion dedup: [[incrementalDedupStreamFolding]]
   * with the artifact state made DURABLE, closing the session-local caveat.
   *
   * State layout under `stateDir` — an append-only log of UNCAPPED band
   * rows plus the arrived texts, one directory per unit:
   * {{{
   *   bands/corpus/       corpus [[Dedup.bandRowsUncapped]], written once
   *   bands/batch=<id>/   each folded batch's uncapped band rows
   *   docs/batch=<id>/    each batch's (id, text) for later exact-verify
   *   checkpoint/         the stream's offset/commit checkpoint
   * }}}
   * The capped artifact and the exact bucket-count sidecar are pure
   * functions of the band log ([[Dedup.artifactFromBandLog]]), so the
   * per-trigger durable write is O(batch) — no corpus-sized state is ever
   * rewritten — and a restart bootstraps by one log read. Equivalently:
   * the log IS the sidecar-exact append chain, so append == rebuild
   * parity holds across restarts. At scale, lay the log out bucketed by
   * (band, bh) on the deployment's table format so the probe's semi-joins
   * prune to touched buckets.
   *
   * Plan growth: the per-trigger probe plan is O(1) in trigger count.
   * Arrived-doc text is NOT carried as an in-memory union chain (one scan
   * leaf per folded batch, linearly growing analysis cost); each trigger
   * issues ONE partitioned read of `$stateDir/docs/` pruned to
   * `batch <= lastFolded` — same files, constant leaf count, and the
   * half-written directory a retried trigger may leave behind is pruned
   * out by the partition filter before any file is touched. Because the
   * docs scan re-lists per trigger, coalescing small files IN PLACE
   * inside a `docs/batch=<id>` directory is safe between triggers of a
   * live incarnation; reshaping the directory layout itself (or touching
   * `bands/`, whose state lives in checkpointed blocks) still requires a
   * restart from the checkpoint. The carried band artifact is likewise
   * O(1) in trigger count on BOTH axes — plan depth (checkpoint truncates
   * to a LogicalRDD leaf) and PARTITION count ([[boundedCheckpoint]]:
   * the append's narrow union would otherwise double partitions per
   * fold).
   *
   * Idempotence under at-least-once redelivery (no fold guard to corrupt):
   *  - Each batch's band rows are DETERMINISTIC in its text, and each
   *    write is `overwrite` into the batch's own directory — a retried
   *    trigger rewrites identical state instead of appending a duplicate.
   *  - A batch counts as folded only when BOTH its directories carry
   *    `_SUCCESS` (the two writes aren't atomic together); bootstrap and
   *    the fold-skip test use that same rule, so a half-written batch is
   *    re-folded and a fully-written one never double-folds.
   *  - The probe EXCLUDES the current batch's own ids from the artifact
   *    (broadcast anti-join): a batch replayed after a crash that landed
   *    its fold but not its offset commit re-probes against an artifact
   *    that already contains it, and would otherwise emit spurious
   *    self-matches. (Consequence: a RE-INGESTED id never matches its own
   *    stored copy — ids are assumed unique across the stream's life.)
   *  - In-memory swap happens only after every failable job, as in the
   *    in-session variant.
   *
   * `corpus` must be the same initial corpus on every (re)start; docs
   * arrived through the stream are recovered from `stateDir`, not from
   * the caller.
   */
  def incrementalDedupStreamDurable(docs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, stateDir: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      hash: Dedup.HashFamily = Dedup.XxHash64Family)(
      sink: DataFrame => Unit): StreamingQuery = {
    val spark = docs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def committed(dir: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))
    def bandsDir(id: Long) = s"$stateDir/bands/batch=$id"
    def docsDir(id: Long) = s"$stateDir/docs/batch=$id"
    val corpusBandsDir = s"$stateDir/bands/corpus"
    if (!committed(corpusBandsDir))
      Dedup.bandRowsUncapped(corpus, idCol, textCol, n, k, bands, hash)
        .write.mode("overwrite").parquet(corpusBandsDir)
    def committedBatchIds(): Seq[Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$stateDir/bands")).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("batch=") =>
          s.stripPrefix("batch=").toLong }
        .filter(id => committed(bandsDir(id)) && committed(docsDir(id)))
        .sorted

    val corpusBase = corpus.select(col(idCol), col(textCol))
    // Arrived-doc text, as of fold watermark `upTo`: ONE partitioned scan
    // of the docs log, partition-PRUNED to committed batches. Constant
    // plan size however many triggers have folded (see scaladoc), and the
    // verify stage's left_semi prunes which files are actually read. The
    // schema is passed EXPLICITLY so analysis never opens a parquet footer
    // — inference samples files before partition pruning, and the one
    // unpruned-but-uncommitted dir a crashed trigger leaves behind may
    // hold a torn file.
    val docsSchema = org.apache.spark.sql.types.StructType(
      corpus.select(col(idCol), col(textCol)).schema.fields :+
        org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType))
    def foldedDocs(upTo: Long): Option[DataFrame] =
      if (upTo < 0) None
      else Some(spark.read
        .schema(docsSchema)
        .option("basePath", s"$stateDir/docs")
        .parquet(s"$stateDir/docs")
        .where(col("batch") <= upTo)
        .select(col(idCol), col(textCol)))
    // Bootstrap carried state from the durable log (first start: corpus
    // bands only). Band state pinned with eager localCheckpoint — same
    // lineage-truncation rationale as the in-session variant; doc text
    // stays on disk and is re-scanned per trigger via foldedDocs.
    val bootIds = committedBatchIds()
    val (artifact0, counts0) = Dedup.artifactFromBandLog(
      spark.read.parquet(
        (corpusBandsDir +: bootIds.map(bandsDir)): _*), maxBucket)
    var artifact = artifact0.localCheckpoint(true)
    var counts = counts0.localCheckpoint(true)
    // A batch whose directories are fully committed was folded by a prior
    // incarnation: skip its fold on replay (only the last in-flight batch
    // can replay, so max committed id is the correct watermark).
    var lastFolded = bootIds.lastOption.getOrElse(-1L)

    docs.writeStream
      .option("checkpointLocation", s"$stateDir/checkpoint")
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // One materialization of the micro-batch feeds the id exclusion,
        // the probe, the two durable writes, and the fold.
        val batch = batch0.localCheckpoint(true)
        try {
          val batchIds = batch.select(col(idCol).as("id"))
          val probeArtifact = artifact.join(broadcast(batchIds),
            Seq("id"), "left_anti")
          val corpusNow = foldedDocs(lastFolded)
            .map(corpusBase.unionByName(_)).getOrElse(corpusBase)
          val (matches, cleanup) = Dedup.incrementalMinhashWithCleanup(
            batch, corpusNow, idCol, textCol, n = n, k = k, bands = bands,
            threshold = threshold, maxBucket = maxBucket, hash = hash,
            corpusBands = Some(probeArtifact))
          try {
            sink(matches)
            if (batchId > lastFolded) {
              val newBands = Dedup.bandRowsUncapped(batch, idCol, textCol,
                n, k, bands, hash).localCheckpoint(true)
              val staged =
                scala.collection.mutable.ArrayBuffer.empty[DataFrame]
              try {
                // Durable first (overwrite = idempotent), then the
                // in-memory fold, then the pure driver-side swap.
                newBands.write.mode("overwrite").parquet(bandsDir(batchId))
                batch.select(col(idCol), col(textCol))
                  .write.mode("overwrite").parquet(docsDir(batchId))
                val (folded0, newCounts0) = Dedup.appendBandRows(
                  artifact, newBands, maxBucket, Some(counts))
                val folded = boundedCheckpoint(folded0); staged += folded
                val ncounts = boundedCheckpoint(newCounts0.get)
                staged += ncounts
                // Later-trigger text needs no in-memory carry: advancing
                // the watermark is enough — the next trigger's foldedDocs
                // scan picks up the durable dir just written.
                unpin(artifact); unpin(counts)
                artifact = folded
                counts = ncounts
                lastFolded = batchId
              } catch {
                case e: Throwable => staged.foreach(unpin); throw e
              } finally unpin(newBands)
            }
          } finally cleanup()
        } finally unpin(batch)
      }
      .start()
  }

  /**
   * Streaming incremental corpus-level line dedup: the micro-batch form of
   * [[Dedup.corpusLineDedup]]. Each arriving batch's non-blank lines are
   * checked against the carried line-digest artifact (the set of md5 line
   * keys ever seen); a line occurrence survives iff its key is UNSEEN and
   * it is the batch-wide min (doc_id, idx) for that key — so across the
   * stream's life the FIRST occurrence in arrival order wins, which equals
   * the batch operator's min-(doc_id, idx) rule whenever docs arrive in
   * doc-id order (LineDedupStreamSpec pins stream == batch on exactly that
   * split). Per batch, `sink` receives the batch's reassembled docs in the
   * batch operator's (id, n_lines, n_kept, text) shape.
   *
   * State = ONE digest column, O(distinct lines ever seen) — 16 bytes per
   * distinct line, the minimal sufficient statistic for the first-wins
   * rule. Carried with the same discipline as the folding dedup stream:
   * eager bounded checkpoint per fold (plan depth AND partition count O(1)
   * in trigger count), previous blocks freed, fold guarded by batch id and
   * applied only after `sink` returns (a failed trigger retries against
   * the pre-fold artifact). At 100 TB the artifact is a stored table
   * bucketed by digest; the per-trigger work is one batch-lines shuffle
   * plus a semi-join against it — the batch side never exceeds the
   * micro-batch.
   *
   * `seenKeys`: optional bootstrap artifact (single `k` column — e.g. the
   * digests of an existing deduped corpus: `docLines(corpus).select("k")
   * .distinct`). Docs whose every line is blank emit no row, as in batch.
   */
  def lineDedupStream(docs: DataFrame, idCol: String, textCol: String,
      seenKeys: Option[DataFrame] = None)(
      sink: DataFrame => Unit): StreamingQuery = {
    val spark = docs.sparkSession
    var artifact = seenKeys
      .map(_.select(col("k")).distinct())
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("k", StringType)))))
      .localCheckpoint(true)
    var lastFolded = -1L
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // One materialization of the batch's line table feeds the winner
        // aggregation, the reassembly, and the fold.
        val lines = Dedup.docLines(batch, idCol, textCol).localCheckpoint(true)
        try {
          val winners = lines.join(artifact, Seq("k"), "left_anti")
            .groupBy(col("k"))
            .agg(min(struct(col("id").as("wid"), col("idx").as("widx"))).as("w"))
            .localCheckpoint(true)
          try {
            val out = Dedup.reassembleLines(
              lines.join(winners, Seq("k"), "left")
                .withColumn("keep", col("w").isNotNull &&
                  col("id") === col("w.wid") && col("idx") === col("w.widx")))
            sink(out)
            // Fold the batch's new keys — at most once per batch id
            // (foreachBatch is at-least-once; sink-then-fold means a failed
            // trigger retries with the pre-fold artifact intact).
            if (batchId > lastFolded) {
              val folded = boundedCheckpoint(
                artifact.unionByName(winners.select(col("k"))))
              unpin(artifact)
              artifact = folded
              lastFolded = batchId
            }
          } finally unpin(winners)
        } finally unpin(lines)
      }
      .start()
  }

  /**
   * Streaming exact-document dedup with CONSTANT-SIZE carried state: the
   * cross-trigger "seen" set is a [[Dedup.buildBloomArtifact]] bloom
   * filter (O(bits), independent of corpus size) instead of
   * [[lineDedupStream]]'s exact O(distinct-keys) digest table — the
   * operating point for unbounded ingestion where even 16 B/key state
   * eventually outgrows the executor tier. The trade is the bloom one,
   * and it is one-sided: a true duplicate NEVER passes; a fresh doc is
   * over-dropped with probability ≤ ~fpp (size `expectedItems` for the
   * stream's lifetime total).
   *
   * Per trigger: md5-digest the batch, keep the first occurrence per
   * digest within the batch (min id — deterministic), anti-probe the
   * carried bloom map-side (no join, no shuffle against state), sink the
   * survivors, then fold their digests in. The fold builds a bloom of
   * JUST the batch keys (one agg over the micro-batch) and merges — a
   * bitwise OR, so replays are IDEMPOTENT; the batch-id guard only saves
   * the rebuild cost. Sink-then-fold: a failed trigger retries against
   * the pre-fold artifact (at-least-once, same as the exact streams).
   * Durability = write the few-MB artifact bytes per committed batch; a
   * restart resumes from the last committed artifact via `seen`.
   */
  def bloomDedupStream(docs: DataFrame, idCol: String, textCol: String,
      expectedItems: Long, fpp: Double = 0.01,
      seen: Option[Array[Byte]] = None)(
      sink: DataFrame => Unit): StreamingQuery = {
    var artifact = seen
    var lastFolded = -1L
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keyed = batch
          .withColumn("graft_key", md5(col(textCol)))
          .localCheckpoint(true)
        try {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("graft_key")).orderBy(col(idCol))
          val firsts = keyed
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn")
          val survivors0 = artifact match {
            case Some(b) => firsts.filter(
              !graft.operators.Dedup.bloomMightContain(b, col("graft_key")))
            case None => firsts
          }
          val survivors = survivors0.localCheckpoint(true)
          try {
            sink(survivors.drop("graft_key"))
            if (batchId > lastFolded) {
              val batchBloom = graft.operators.Dedup.buildBloomArtifact(
                survivors, col("graft_key"), expectedItems, fpp)
              artifact = Some(artifact
                .map(graft.operators.Dedup.mergeBloomArtifacts(_, batchBloom))
                .getOrElse(batchBloom))
              lastFolded = batchId
            }
          } finally unpin(survivors)
        } finally unpin(keyed)
      }
      .start()
  }

  /**
   * Streaming span-level decontamination: each micro-batch is probed
   * for spans duplicating PREVIOUSLY-INGESTED text (the carried
   * [[SpanDedup.corpusWindowDigests]] artifact — 16 B per distinct
   * window), `sink` receives the batch's (id, span_start, span_end,
   * n_windows), and only then do the batch's own digests fold in
   * (sink-then-fold: a failed trigger retries against the pre-fold
   * artifact; re-delivered batches re-emit, never re-fold). Within-batch
   * duplication is deliberately NOT flagged — that is [[SpanDedup
   * .duplicateSpans]]'s job; this stream answers "does the incoming
   * batch repeat the corpus so far", the q186 probe run continuously.
   *
   * `seenDigests`: optional bootstrap (a stored corpus artifact's
   * single `wkey` column). Per-trigger cost is O(batch tokens) + one
   * semi-join against the artifact, independent of corpus size.
   *
   * CONTRACT: `sink` must materialize its frame synchronously (write /
   * collect before returning). The frame lazily references the CURRENT
   * carried digest artifact, which is released right after the batch's
   * own digests fold in — once `sink` returns — so a sink that defers
   * execution past the foreachBatch body would act on a released
   * localCheckpoint. (The same synchronous-sink contract as the other
   * foreachBatch streams in this file, e.g. lineDedupStream's survivor
   * frame, whose pins release in the trigger's `finally`.)
   */
  def spanProbeStream(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 20, seenDigests: Option[DataFrame] = None)(
      sink: DataFrame => Unit): StreamingQuery = {
    val spark = docs.sparkSession
    var artifact = seenDigests
      .map(_.select(col("wkey")).distinct())
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("wkey", StringType)))))
      .localCheckpoint(true)
    var lastFolded = -1L
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(SpanDedup.probeSpans(batch, idCol, textCol, artifact, window))
        if (batchId > lastFolded) {
          val folded = boundedCheckpoint(
            artifact.unionByName(SpanDedup.corpusWindowDigests(
              batch, idCol, textCol, window)).distinct())
          unpin(artifact)
          artifact = folded
          lastFolded = batchId
        }
      }
      .start()
  }

  private def unpin(df: DataFrame): Unit =
    graft.operators.CacheScope.unpinCheckpoint(df)

  /**
   * Checkpoint a folded artifact with a BOUNDED partition count.
   * [[Dedup.appendBandRows]]' output unions two branches of the previous
   * artifact (untouched via broadcast anti-join, touched via broadcast
   * semi-join — both NARROW, partition-preserving) plus the batch rows,
   * so its RDD inherits ~2×+c the parent's partitions. Checkpointing
   * that chain as-is doubles the carried artifact's partition count per
   * trigger — by the late teens each fold materializes hundreds of
   * thousands of near-empty partitions whose per-task closure overhead
   * dwarfs the data (measured: fold wall time doubling per trigger, a
   * 400k-task stage by trigger 17). coalesce is narrow (no shuffle — it
   * only concatenates parent partitions) and restores
   * O(shuffle.partitions) partitions, so the per-trigger checkpoint
   * stays O(artifact rows) with a flat task count for the stream's life.
   */
  private def boundedCheckpoint(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    df.coalesce(p).localCheckpoint(true)
  }
}
