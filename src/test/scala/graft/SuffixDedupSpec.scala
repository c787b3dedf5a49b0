package graft

import scala.collection.mutable.ListBuffer
import scala.util.Random

import graft.operators.{SpanDedup, SuffixDedup}

/**
 * SuffixDedup (exact suffix-array-grade substring dedup) vs a sequential
 * brute-force reference, plus the VERDICT-prescribed strict-superset
 * property against SpanDedup at equal min-length: SpanDedup's distinct-doc
 * counting misses within-document repeats; SuffixDedup's occurrence
 * counting finds them, and finds the identical cross-doc spans otherwise.
 * Generated corpora plant passages cross-doc AND within-doc; a forced
 * high partition count exercises the O(P) boundary stitch (equal-suffix
 * runs split across range partitions).
 */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  private val W = 5

  /** Random corpus: 4 passages planted into random docs (cross-doc dups),
    * plus doc 100 repeating its OWN unique passage twice (the case
    * SpanDedup cannot see). Returns (docs, selfPassageTokens). */
  private def gen(seed: Int): (Seq[(Long, String)], Seq[String]) = {
    val r = new Random(seed)
    val vocab = (0 until 300).map(i => s"w${i}z")
    def words(n: Int) = Seq.fill(n)(vocab(r.nextInt(vocab.size)))
    val passages = (0 until 4).map(p =>
      (0 until (W + r.nextInt(5))).map(j => s"p${p}x$j"))
    val docs = (0L until 18L).map { id =>
      val picks = passages.indices.filter(_ => r.nextInt(3) == 0)
      val parts = Seq(words(6 + r.nextInt(10))) ++
        picks.flatMap(p => Seq(passages(p), words(W + r.nextInt(6))))
      id -> parts.flatten.mkString(" ")
    }
    val self = (0 until W + 2).map(j => s"self${seed}x$j")
    val selfDoc = 100L ->
      (words(4) ++ self ++ words(W + 3) ++ self ++ words(3)).mkString(" ")
    (docs :+ selfDoc, self)
  }

  /** Sequential reference of the suffix-array semantics: a W-window is
    * duplicated iff its token text occurs >= 2 times in the corpus
    * (OCCURRENCES, same doc included); flagged starts coalesce into
    * maximal [start, end) with their start count. */
  private def refSpans(docs: Seq[(Long, String)])
      : Map[Long, Set[(Int, Int, Long)]] = {
    val wins: Map[Long, Vector[String]] = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).sliding(W)
        .filter(_.length == W).map(_.mkString(" ")).toVector
    }.toMap
    val counts = wins.values.flatten.toSeq.groupBy(identity)
      .map { case (k, v) => k -> v.size }
    wins.map { case (id, ws) =>
      val starts = ws.zipWithIndex.collect {
        case (w, i) if counts(w) >= 2 => i
      }
      val spans = ListBuffer.empty[(Int, Int, Long)]
      starts.foreach { i =>
        spans.lastOption match {
          case Some((s, e, n)) if i <= e =>
            spans(spans.length - 1) = (s, i + W, n + 1)
          case _ => spans += ((i, i + W, 1L))
        }
      }
      id -> spans.toSet
    }.filter(_._2.nonEmpty)
  }

  private def runOp(docs: Seq[(Long, String)], parts: Int = 0)
      : Map[Long, Set[(Int, Int, Long)]] =
    SuffixDedup.duplicateSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", minLen = W, numPartitions = parts)
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3, r._4)).toSet
      }

  private def coverage(spans: Map[Long, Set[(Int, Int, Long)]])
      : Set[(Long, Int)] =
    spans.toSeq.flatMap { case (id, ss) =>
      ss.flatMap { case (s, e, _) => (s until e).map(id -> _) }
    }.toSet

  for (seed <- Seq(21, 22, 23))
  test(s"duplicateSpans == brute-force occurrence reference, seed $seed") {
    val (docs, _) = gen(seed)
    assert(runOp(docs) == refSpans(docs), s"seed $seed span mismatch")
  }

  for (seed <- Seq(21, 22))
  test(s"strict coverage superset of SpanDedup at equal min-length, seed $seed") {
    val (docs, self) = gen(seed)
    val exact = coverage(runOp(docs))
    val rolling = coverage(
      SpanDedup.duplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", window = W, minDf = 2)
        .as[(Long, Int, Int, Long)].collect()
        .groupBy(_._1).map { case (id, rs) =>
          id -> rs.map(r => (r._2, r._3, r._4)).toSet
        })
    assert(rolling.subsetOf(exact),
      s"seed $seed: SpanDedup found positions SuffixDedup missed: " +
        (rolling -- exact).take(5))
    // Strictness, pinned: doc 100's self-repeated passage is invisible to
    // distinct-doc counting but fully covered by occurrence counting.
    val toks = docs.toMap.apply(100L).split("\\s+").filter(_.nonEmpty).toVector
    val at = toks.indexOfSlice(self)
    assert(at >= 0)
    val selfPos = (at until at + self.length).map(100L -> _).toSet
    assert(selfPos.subsetOf(exact), "self-repeat not covered by SuffixDedup")
    assert(selfPos.intersect(rolling).isEmpty,
      "SpanDedup unexpectedly covered the within-doc repeat")
  }

  for (seed <- Seq(21, 22, 23))
  test(s"tieredDuplicateSpans == duplicateSpans (two-tier composition is exact), seed $seed") {
    val (docs, _) = gen(seed)
    val tiered = SuffixDedup.tieredDuplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = W)
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3, r._4)).toSet
      }
    assert(tiered == refSpans(docs), s"seed $seed tiered mismatch")
  }

  test("tiered composition under a forced high partition count (stitch on the restricted sort)") {
    val text = (0 until 2 * W).map(j => s"same$j").mkString(" ")
    val docs = (0L until 6L).map(_ -> text)
    val tiered = SuffixDedup.tieredDuplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = W, numPartitions = 16)
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3, r._4)).toSet
      }
    assert(tiered == refSpans(docs))
  }

  test("boundary stitch: identical docs under a forced high partition count") {
    // 6 byte-identical docs of 2W tokens: every window occurs 6 times, the
    // equal-suffix runs MUST straddle range partitions at 16 partitions
    // over 36 suffix rows, and every doc is fully covered [0, 2W).
    val text = (0 until 2 * W).map(j => s"same$j").mkString(" ")
    val docs = (0L until 6L).map(_ -> text)
    val got = runOp(docs, parts = 16)
    assert(got == refSpans(docs))
    assert(got.values.toSet == Set(Set((0, 2 * W, W + 1))))
  }

  test("doc shorter than minLen yields no windows and no spans") {
    val docs = Seq(1L -> "a b c", 2L -> "a b c",
      3L -> (0 until 2 * W).map(j => s"u$j").mkString(" "))
    assert(runOp(docs) == Map.empty)
  }

  /** Sequential keep-first-occurrence removal reference: per duplicated
    * window key, the (id, ti)-minimal occurrence survives; every other
    * occurrence's [ti, ti+W) positions drop. */
  private def refRemoval(docs: Seq[(Long, String)])
      : Map[Long, (String, Long, Long)] = {
    val toks: Map[Long, Vector[String]] = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toVector
    }.toMap
    val occ = docs.flatMap { case (id, t) =>
      toks(id).sliding(W).filter(_.length == W).zipWithIndex
        .map { case (w, i) => (w.mkString(" "), id, i) }
    }
    val byKey = occ.groupBy(_._1).filter(_._2.size >= 2)
    val covered = byKey.values.flatMap { os =>
      val canon = os.minBy(o => (o._2, o._3))
      os.filterNot(_ == canon)
        .flatMap(o => (o._3 until o._3 + W).map(o._2 -> _))
    }.toSet
    docs.map { case (id, _) =>
      val ts = toks(id)
      val keptToks = ts.zipWithIndex.collect {
        case (t, i) if !covered((id, i)) => t
      }
      id -> (keptToks.mkString(" "), keptToks.size.toLong,
        (ts.size - keptToks.size).toLong)
    }.toMap
  }

  for (seed <- Seq(21, 22))
  test(s"removeDuplicateSpans == sequential keep-first reference, seed $seed") {
    val (docs, self) = gen(seed)
    val got = SuffixDedup.removeDuplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = W)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == refRemoval(docs), s"seed $seed removal mismatch")
    // Within-doc pin: doc 100 keeps its FIRST self-passage occurrence and
    // loses the second (the case q78's distinct-doc removal cannot act on).
    val clean = got(100L)._1.split(" ").toVector
    assert(clean.indexOfSlice(self) >= 0, "first occurrence must survive")
    assert(clean.indexOfSlice(self, clean.indexOfSlice(self) + 1) < 0,
      "second occurrence must be removed")
  }
}
