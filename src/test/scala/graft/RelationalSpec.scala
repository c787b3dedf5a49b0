package graft

import org.apache.spark.sql.functions._

/** Cross-cutting checks on the relational surface. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every declared query executes and every oracle key exists") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
    // spot-run a sample end to end at smoke scale
    Seq("q01_agg_pricing", "q26_sessionize", "q52_grouping_sets_sql").foreach { n =>
      assert(SparkEntry.queries(n)(spark, dir).count() > 0, n)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct within 5% of exact") {
    val exact = Tables.orders(spark, dir)
      .groupBy("o_orderstatus").agg(countDistinct("o_custkey").as("e"))
      .as[(String, Long)].collect().toMap
    val approx = SparkEntry.queries("q53_approx_distinct")(spark, dir)
      .select("o_orderstatus", "approx_customers")
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("sql surface: custom functions callable from spark.sql") {
    SqlSurface.register(spark, dir)
    val out = spark.sql(
      "SELECT strip_accents('café') AS a, spanish_date_norm('1 de mayo de 2001') AS b")
      .as[(String, String)].head()
    assert(out == (("cafe", "2001/05/01")))
  }
}
