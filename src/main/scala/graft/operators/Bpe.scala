package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed BPE merge training (Sennrich et al. 2016) — learn the
 * byte-pair-encoding merge table from a corpus: the tokenizer-training
 * step every LLM data pipeline runs before anything else tokenizes.
 *
 * Shape — this is why BPE trains fast at 100 TB: the corpus is touched
 * by exactly ONE shuffle (the word-frequency count). Everything after
 * operates on the DISTINCT-WORD vocabulary weighted by frequency —
 * symbol sequences over ≤ `maxVocab` words — which is bounded by
 * language, not corpus size. Each merge iteration is a vocab-sized
 * window pass + a pair-count agg whose TOP-1 row comes to the driver
 * (the O(1)-per-iteration broadcast-centroid pattern of [[KMeans]]),
 * with per-iteration localCheckpoint lineage truncation (the
 * [[PageRank]] discipline).
 *
 * Determinism (what lets q110 sit under a DuckDB hash oracle):
 * frequencies and pair counts are exact integers; the winning pair
 * tie-breaks lexicographically (count DESC, left, right); and the merge
 * step is LEFTMOST-GREEDY exactly — overlapping matches (only possible
 * in same-symbol runs like "aaa" for merge (a,a)) resolve by
 * gaps-and-islands parity: within each maximal run of consecutive match
 * positions, matches at even offsets from the run head merge, odd ones
 * don't. Both engines express that with the same two windows.
 *
 * Simplifications vs production BPE (documented, not hidden): symbols
 * are unicode chars (not bytes), no end-of-word marker, word =
 * space-split token — the engine machinery (the part being built here)
 * is identical; swapping byte-level init or marker symbols changes only
 * the seed projection.
 */
object Bpe {

  /** One leftmost-greedy merge of pair (a, b) over (word, pos, sym). */
  private def mergeOnce(syms: DataFrame, a: String, b: String): DataFrame = {
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    val marked = syms
      .withColumn("nxt", lead(col("sym"), 1).over(w))
      .withColumn("m", (col("sym") === a && col("nxt") === b).cast("int"))
    // Islands of consecutive match positions: a match starts a run when
    // the previous POSITION is not a match (runs are contiguous pos).
    val runs = marked
      .withColumn("prev_m", lag(col("m"), 1, 0).over(w))
      .withColumn("prev_pos", lag(col("pos"), 1).over(w))
      .withColumn("run_head",
        (col("m") === 1 &&
          (col("prev_m") === 0 || col("prev_pos") =!= col("pos") - 1))
          .cast("int"))
      .withColumn("run_id",
        when(col("m") === 1,
          sum(col("run_head")).over(w.rowsBetween(Window.unboundedPreceding, 0))))
    val kept = runs
      .withColumn("run_off",
        when(col("m") === 1,
          col("pos") - min(when(col("run_head") === 1, col("pos")))
            .over(Window.partitionBy(col("word"), col("run_id")))))
      .withColumn("keep_m",
        coalesce(col("m") === 1 && col("run_off") % 2 === 0, lit(false)))
    // Emit: merged symbol at kept positions; drop the absorbed successor;
    // pass everything else through. Re-index by original pos.
    kept
      .withColumn("absorbed",
        lag(col("keep_m"), 1, false).over(w))
      .filter(!col("absorbed"))
      .select(col("word"), col("freq"), col("pos").as("old_pos"),
        when(col("keep_m"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("word")).orderBy(col("old_pos"))) - 1)
      .select(col("word"), col("freq"), col("pos"), col("sym"))
  }

  /**
   * Learn `merges` BPE merges from (id, text).
   *
   * @return the merge table: (step, left, right, merged, pair_count) —
   *         one row per learned merge in order, pair_count the exact
   *         frequency-weighted count that won the step
   */
  def train(docs: DataFrame, textCol: String, merges: Int,
      maxVocab: Int = 5000): DataFrame = {
    val spark = docs.sparkSession
    // ONE corpus shuffle: word frequencies; then cap to the maxVocab most
    // frequent words (deterministic ties by word) — bounded state from
    // here on.
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(maxVocab)
    var syms = words
      .select(col("word"), col("freq"),
        posexplode(split(col("word"), "")).as(Seq("pos", "sym")))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    for (step <- 1 to merges) {
      val top = syms
        .withColumn("nxt", lead(col("sym"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym"), col("nxt"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, cnt) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        learned += ((step, a, b, a + b, cnt))
        val next = mergeOnce(syms, a, b).localCheckpoint(true)
        CacheScope.unpinCheckpoint(syms)
        syms = next
      }
    }
    CacheScope.unpinCheckpoint(syms)
    import spark.implicits._
    learned.toSeq.toDF("step", "left", "right", "merged", "pair_count")
  }

  /**
   * Apply a learned merge table: tokenize (id, text) into BPE symbols.
   * This is the PER-ROW side of BPE — the merge table (O(merges) rows)
   * broadcasts to executors and each word encodes locally with the
   * standard greedy algorithm (repeatedly merge the lowest-ranked
   * applicable pair), so encoding is a narrow map over the corpus: no
   * shuffle, no per-merge passes — the shape that tokenizes 100 TB.
   * Iterating the distributed [[train]] merge machinery per document
   * would instead cost `merges` passes over corpus-sized data.
   *
   * Consistency contract (pinned by BpeSpec): encoding the training
   * corpus' words with the learned table reproduces EXACTLY the symbol
   * sequences the trainer ended with — apply is the inverse-direction
   * replay of training's merge order, driver-free.
   *
   * @param mergeTable output of [[train]] (step, left, right, ...)
   * @return (idCol, syms: Array[String], n_syms)
   */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      mergeTable: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = mergeTable
      .select(col("step").cast("int"), col("left"), col("right"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = bc.value
        it.map { case (id, text) =>
          val syms = text.split(" ").filter(_.nonEmpty).toSeq
            .flatMap(w => encodeWord(w, rk))
          (id, syms)
        }
      }
      .toDF("id", "syms")
      .select(col("id").as(idCol), col("syms"),
        size(col("syms")).as("n_syms"))
  }

  /**
   * Vocabulary compression statistics: how many symbols the learned
   * merges leave per word, frequency-weighted — the eval every
   * tokenizer-training run reports (chars/token before vs after).
   * Trains, then encodes the SAME capped vocabulary with the learned
   * table; because encode replays training exactly (BpeSpec), the
   * output equals reading the trainer's final symbol table — which is
   * how the q113 oracle mirrors it (the unrolled training chain's last
   * CTE, aggregated).
   */
  def vocabStats(docs: DataFrame, textCol: String, merges: Int,
      maxVocab: Int = 5000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = train(docs, textCol, merges, maxVocab)
    val ranks = table.select(col("step").cast("int"), col("left"), col("right"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(maxVocab)
    words.as[(String, Long)]
      .mapPartitions { it =>
        val rk = bc.value
        it.map { case (w, f) =>
          (f, w.length.toLong, encodeWord(w, rk).length.toLong)
        }
      }
      .toDF("freq", "wl", "ns")
      .agg(count(lit(1)).as("n_words"),
        sum(col("freq")).as("total_freq"),
        sum(expr("freq * wl")).as("chars_weighted"),
        sum(expr("freq * ns")).as("syms_weighted"))
  }

  /** Greedy single-word encode: repeatedly apply the LOWEST-ranked
    * applicable merge, leftmost-first within a rank — the exact replay
    * of training's merge order on one word. */
  private[operators] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var s = word.split("").toVector
    var done = false
    while (!done && s.length > 1) {
      // Lowest-ranked pair present in the word (training applied merges
      // in step order, so replay must too).
      var best = -1
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r != Int.MaxValue && (best == -1 || r < ranks(
          (s(best), s(best + 1))))) best = i
        i += 1
      }
      if (best == -1) done = true
      else {
        val (a, b) = (s(best), s(best + 1))
        // Merge ALL non-overlapping occurrences of (a,b), leftmost-greedy
        // — one training iteration's effect on this word.
        val buf = Vector.newBuilder[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
            buf += (a + b); j += 2
          } else { buf += s(j); j += 1 }
        }
        s = buf.result()
      }
    }
    s
  }
}
