package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup

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
}
