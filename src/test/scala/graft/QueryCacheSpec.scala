package graft

import graft.queries.TextQueries

/**
 * Contracts of the round-7 shared-build memoization (TextQueries): the
 * token table is built once per (session, dir) and reused by reference;
 * resetCache detaches it so the next call rebuilds fresh. Complements
 * CacheScopeSpec (which owns the pin/release mechanics).
 */
class QueryCacheSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tokensPos memoizes per (session, dir) and resetCache detaches") {
    TextQueries.resetCache(spark)
    val a = TextQueries.tokensPos(spark, dir)
    val b = TextQueries.tokensPos(spark, dir)
    assert(a eq b, "second call must return the memoized frame")
    // The memo is a checkpointed leaf: constant-size plan, no re-scan.
    assert(a.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD])
    val n = a.count()
    assert(n > 0)
    TextQueries.resetCache(spark)
    val c = TextQueries.tokensPos(spark, dir)
    assert(!(c eq a), "resetCache must detach the old frame")
    assert(c.count() == n, "rebuilt frame carries identical data")
    TextQueries.resetCache(spark)
  }

  test("tokens is a projection of the shared positioned table") {
    TextQueries.resetCache(spark)
    val pos = TextQueries.tokensPos(spark, dir)
    val flat = TextQueries.tokens(spark, dir)
    assert(flat.columns.toSeq == Seq("doc_id", "tok"))
    assert(flat.count() == pos.count())
    TextQueries.resetCache(spark)
  }
}
