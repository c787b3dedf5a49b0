package graft

import graft.sinks.SearchIndex

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq("a", "a", "b")),
    (2L, Seq("a", "c")),
    (3L, Seq("b", "b", "b", "c")),
    (4L, Seq("c", "c")))

  private def tokens =
    corpus.flatMap { case (id, ts) => ts.map(id -> _) }.toDF("doc_id", "tok")

  /** The operator's exact formula in driver-side doubles (same JVM
    * Math.log / Math.round the codegen'd expression lowers to). */
  private def expectedMicro(tf: Long, df: Long, dl: Long,
      nDocs: Long, totalToks: Long): Long =
    math.round(math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) *
      (tf * 2.2) /
      (tf + 1.2 * (0.25 + 0.75 * dl * nDocs / totalToks.toDouble)) * 1000000)

  test("scores equal the hand-computed formula, micro-exact") {
    val got = SearchIndex.bm25(tokens, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = 4L; val tt = 11L
    val d1 = expectedMicro(2, 2, 3, n, tt) + expectedMicro(1, 2, 3, n, tt)
    val d2 = expectedMicro(1, 2, 2, n, tt)
    val d3 = expectedMicro(3, 2, 4, n, tt)
    assert(got == Map(1L -> (2L, d1), 2L -> (1L, d2), 3L -> (1L, d3)))
  }

  test("docs containing no query term are absent") {
    val ids = SearchIndex.bm25(tokens, Seq("a")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("topK truncates by (score desc, doc_id)") {
    val top1 = SearchIndex.bm25(tokens, Seq("a", "b"), topK = 1).collect()
    assert(top1.length == 1)
    // d1 matches both terms with the highest combined mass.
    assert(top1.head.getLong(0) == 1L)
  }
}
