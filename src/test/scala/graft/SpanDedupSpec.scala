package graft

import graft.operators.SpanDedup

/**
 * Duplicate-span detection/removal: planted repeated passages at
 * DIFFERENT positions inside otherwise-distinct documents — the case
 * segment dedup (alignment-bound) and whole-doc near-dup (document-bound)
 * both miss.
 */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // X = a 7-token passage planted in docs 1 and 2 at different offsets.
  private val X = "x1 x2 x3 x4 x5 x6 x7"
  private val docs = Seq(
    (1L, s"a1 a2 a3 $X b1 b2"),                 // X at tokens [3, 10)
    (2L, s"c1 c2 c3 c4 c5 $X d1"),              // X at tokens [5, 12)
    (3L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"),     // unrelated
    (4L, "tiny doc"))                            // shorter than the window
    .toDF("doc_id", "text")

  test("duplicateSpans: exact span boundaries at each occurrence's offset") {
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text",
      window = 5, minDf = 2)
      .as[(Long, Int, Int, Long)].collect().toSet
    // Windows fully inside X match across docs (3 of them: starts 0..2 of
    // X); windows crossing X's boundary carry different context and do
    // not. The coalesced span is exactly X's extent in each doc.
    assert(spans == Set((1L, 3, 10, 3L), (2L, 5, 12, 3L)), spans.toString)
  }

  test("removeDuplicateSpans: canonical doc keeps the passage, others drop it") {
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text",
      window = 5, minDf = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((s"a1 a2 a3 $X b1 b2", 12L, 0L)),
      "canonical (min id) doc is untouched")
    assert(out(2L) == (("c1 c2 c3 c4 c5 d1", 6L, 7L)),
      "non-canonical occurrence loses exactly X's 7 tokens")
    assert(out(3L)._3 == 0L && out(4L)._3 == 0L, "unrelated docs intact")
    assert(out(4L)._1 == "tiny doc", "short doc passes through verbatim")
  }

  test("two separated shared passages yield two spans; close ones coalesce") {
    val y = "y1 y2 y3 y4 y5"
    val z = "z1 z2 z3 z4 z5"
    val two = Seq(
      (10L, s"$y p1 p2 p3 p4 p5 p6 $z"),
      (11L, s"q1 $y q2 q3 q4 q5 q6 q7 $z"))
      .toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(two, "doc_id", "text",
      window = 5, minDf = 2)
      .as[(Long, Int, Int, Long)].collect()
    assert(spans.count(_._1 == 10L) == 2 && spans.count(_._1 == 11L) == 2,
      s"each doc has two maximal spans: ${spans.mkString(",")}")
    // Doc 10: y at [0,5), z at [11,16); doc 11: y at [1,6), z at [12,17).
    assert(spans.toSet == Set((10L, 0, 5, 1L), (10L, 11, 16, 1L),
      (11L, 1, 6, 1L), (11L, 12, 17, 1L)))
  }

  test("whitespace runs do not shift span offsets (re-indexed positions)") {
    val spaced = Seq(
      (20L, s"a1  a2   a3 $X b1 b2"),           // extra spaces, same tokens
      (21L, s"c1 c2 c3 c4 c5 $X d1"))
      .toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(spaced, "doc_id", "text",
      window = 5, minDf = 2)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(spans == Set((20L, 3, 10, 3L), (21L, 5, 12, 3L)), spans.toString)
  }
}
