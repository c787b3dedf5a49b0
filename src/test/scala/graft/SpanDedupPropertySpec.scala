package graft

import scala.util.Random

import graft.operators.SpanDedup

/**
 * Property-style tests for duplicate-span detection/removal: seeded random
 * corpora with passages planted at RANDOM positions, and invariants checked
 * against an exact in-test reimplementation of the window/df/coalesce
 * semantics — SpanDedupSpec pins hand-built fixtures; this pins the space.
 */
class SpanDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val W = 6 // window tokens

  /** Random docs over a wide vocab (no accidental repeats) with 5 shared
    * passages of >= W tokens planted INTACT into 2-3 docs each, separated
    * by >= W random context tokens (plants never nest or abut, so every
    * planted occurrence keeps its full window set — a passage inserted
    * inside another would split it and make per-window canonicals
    * diverge). Returns (docs, planted passages). */
  private def gen(seed: Int): (Seq[(Long, String)], Seq[String]) = {
    val r = new Random(seed)
    val vocab = (0 until 500).map(i => s"v${i}q")
    def words(n: Int) = Seq.fill(n)(vocab(r.nextInt(vocab.size)))
    val passages = (0 until 5).map(p =>
      (0 until (W + r.nextInt(4))).map(j => s"p${p}x$j"))
    val targets = passages.map(_ =>
      r.shuffle((0L until 25L).toVector).take(2 + r.nextInt(2)).toSet)
    val docs = (0L until 25L).map { id =>
      val mine = passages.indices.filter(p => targets(p).contains(id))
      val parts = Seq(words(8 + r.nextInt(12))) ++
        mine.flatMap(p => Seq(passages(p).toSeq, words(W + r.nextInt(8))))
      id -> parts.flatten.mkString(" ")
    }
    (docs, passages.map(_.mkString(" ")))
  }

  /** Exact reference: per doc, the union of W-windows whose text occurs in
    * >= 2 distinct docs, coalesced into maximal [start, end) intervals. */
  private def refSpans(docs: Seq[(Long, String)]): Map[Long, Set[(Int, Int)]] = {
    val wins = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).sliding(W).filter(_.length == W)
        .map(_.mkString(" ")).toVector
    }.toMap
    val df = wins.values.flatMap(_.distinct).groupBy(identity)
      .collect { case (w, os) if os.size >= 2 => w }.toSet
    wins.map { case (id, ws) =>
      val starts = ws.zipWithIndex.collect { case (w, i) if df(w) => i }
      val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      starts.foreach { i =>
        spans.lastOption match {
          case Some((s, e)) if i <= e => spans(spans.length - 1) = (s, i + W)
          case _ => spans += ((i, i + W))
        }
      }
      id -> spans.toSet
    }.filter(_._2.nonEmpty)
  }

  for (seed <- Seq(11, 12, 13))
  test(s"duplicateSpans == exact reference on generated corpus, seed $seed") {
    val (docs, _) = gen(seed)
    val got = SpanDedup.duplicateSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", window = W, minDf = 2)
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3)).toSet
      }
    assert(got == refSpans(docs), s"seed $seed span mismatch")
  }

  for (seed <- Seq(11, 12, 13))
  test(s"removeDuplicateSpans invariants, seed $seed") {
    val (docs, passages) = gen(seed)
    val byId = docs.toMap
    val out = SpanDedup.removeDuplicateSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", window = W, minDf = 2)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == docs.length, "one row per input doc")
    out.foreach { case (id, clean, kept, dropped) =>
      val orig = byId(id).split("\\s+").filter(_.nonEmpty)
      assert(kept + dropped == orig.length, s"doc $id token conservation")
      // Kept text is a subsequence of the original tokens, in order.
      val cleanToks = clean.split("\\s+").filter(_.nonEmpty)
      assert(cleanToks.length == kept)
      var j = 0
      cleanToks.foreach { t =>
        while (j < orig.length && orig(j) != t) j += 1
        assert(j < orig.length, s"doc $id: '$t' out of order vs original")
        j += 1
      }
    }
    // Every planted passage survives in EXACTLY ONE doc (the canonical
    // occurrence keeps it; the plants are >= W tokens so a full planted
    // window is always detectable).
    passages.foreach { pass =>
      val holders = out.filter(_._2.contains(pass)).map(_._1)
      assert(holders.length == 1,
        s"passage kept by ${holders.length} docs: ${holders.mkString(",")}")
    }
  }

  /** probeSpans: batch windows flagged iff their text occurs in the
    * CORPUS — batch-internal repeats are invisible by design (that is
    * duplicateSpans' job), corpus passages are localized exactly. */
  for (seed <- Seq(17, 18))
  test(s"probeSpans == corpus-membership reference; batch-only repeats ignored, seed $seed") {
    val (docs, _) = gen(seed)
    val (batch0, corpus) = docs.partition(_._1 % 3 == 0)
    // One batch doc with a batch-only passage repeated TWICE (must not
    // be flagged) spliced after a known corpus passage (must be).
    val corpusPassage = corpus.head._2.split(" ").take(W + 2)
    val batchOnly = (0 until W + 1).map(j => s"bo${seed}x$j")
    val planted = 9999L -> (Seq.fill(3)(s"pre$seed") ++ corpusPassage ++
      Seq.fill(W)(s"mid$seed") ++ batchOnly ++
      Seq.fill(W)(s"gap$seed") ++ batchOnly).mkString(" ")
    val batch = batch0 :+ (planted._1 -> planted._2)

    val corpusWins = corpus.flatMap { case (_, t) =>
      t.split("\\s+").filter(_.nonEmpty).sliding(W).filter(_.length == W)
        .map(_.mkString(" "))
    }.toSet
    val want = batch.map { case (id, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty).sliding(W)
        .filter(_.length == W).map(_.mkString(" ")).toVector
      val starts = ws.zipWithIndex.collect { case (w, i) if corpusWins(w) => i }
      val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      starts.foreach { i =>
        spans.lastOption match {
          case Some((s, e)) if i <= e => spans(spans.length - 1) = (s, i + W)
          case _ => spans += ((i, i + W))
        }
      }
      id -> spans.toSet
    }.filter(_._2.nonEmpty).toMap

    val art = SpanDedup.corpusWindowDigests(corpus.toDF("doc_id", "text"),
      "doc_id", "text", window = W)
    val got = SpanDedup.probeSpans(batch.toDF("doc_id", "text"),
      "doc_id", "text", art, window = W)
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => (r._2, r._3)).toSet }
    assert(got == want, s"seed $seed probe mismatch")
    // The corpus passage IS found in the planted doc; the batch-only
    // repeats are NOT (their windows never occur in the corpus).
    assert(got.contains(9999L))
    val toks = planted._2.split(" ").toVector
    val boAt = toks.indexOfSlice(batchOnly)
    assert(!got(9999L).exists { case (s, e) => s <= boAt && boAt < e },
      "batch-only repeat wrongly flagged")
  }

  test("corpusWindowDigests: shard union == whole-corpus artifact") {
    val (docs, _) = gen(19)
    val (a, b) = docs.partition(_._1 % 2 == 0)
    def dig(rows: Seq[(Long, String)]) =
      SpanDedup.corpusWindowDigests(rows.toDF("doc_id", "text"),
        "doc_id", "text", window = W)
    val whole = dig(docs).as[String].collect().toSet
    val merged = dig(a).unionByName(dig(b)).distinct()
      .as[String].collect().toSet
    assert(merged == whole)
  }
}
