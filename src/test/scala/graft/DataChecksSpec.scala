package graft

import org.apache.spark.sql.functions._

import graft.operators.DataChecks
import graft.operators.DataChecks.Rule

/**
 * Expectation suite (q121): the semantics the oracle fixture can't trip
 * — NULL predicates counting as violations, duplicate keys, NULL child
 * FKs — on hand-built frames.
 */
class DataChecksSpec extends SparkSpec {
  import spark.implicits._

  test("NULL predicate counts as a violation") {
    val df = Seq[(Long, Option[Double])](
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, None))
      .toDF("id", "price")
    val out = DataChecks.validate(df, Seq(
      Rule("price_positive", col("price") > 0)))
      .collect().head
    assert(out.getString(0) === "price_positive")
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === 2L) // -1 AND the null both violate
  }

  test("uniqueKey counts duplicates; fkOrphans counts misses and null keys") {
    val dup = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val uq = DataChecks.uniqueKey(dup, Seq("k")).collect().head
    assert((uq.getLong(1), uq.getLong(2)) === ((6L, 3L)))

    val child = Seq[(Long, Option[Long])](
      (1L, Some(10L)), (2L, Some(99L)), (3L, None)).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val fk = DataChecks.fkOrphans(child, "fk", parent, "pk").collect().head
    assert((fk.getLong(1), fk.getLong(2)) === ((3L, 2L))) // 99 and NULL
  }

  test("functional dependency counts violating KEYS, nulls as values") {
    val df = Seq[(Long, Option[Long])](
      (1L, Some(10L)), (1L, Some(10L)), // consistent duplicate rows: fine
      (2L, Some(20L)), (2L, Some(21L)), // k=2 violates (two rhs)
      (3L, None), (3L, Some(30L)),      // k=3 violates (NULL vs 30)
      (4L, None), (4L, None))           // consistent NULLs: fine
      .toDF("k", "v")
    val out = DataChecks.functionalDependency(df, Seq("k"), Seq("v"))
      .collect().head
    assert((out.getLong(1), out.getLong(2)) === ((8L, 2L)))
  }

  test("a multi-rule suite runs as one aggregation pass") {
    val df = (1 to 100).map(i => (i.toLong, i % 10)).toDF("id", "m")
    val out = DataChecks.validate(df, Seq(
      Rule("m_small", col("m") < 8),
      Rule("id_positive", col("id") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("m_small" -> 20L, "id_positive" -> 0L))
  }
}
