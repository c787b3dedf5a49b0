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
    // q53's oracle-checked shape: exact count + Spark-computed accuracy
    // boolean; re-derive the raw HLL estimate here and pin it too.
    val exact = Tables.orders(spark, dir)
      .groupBy("o_orderstatus").agg(countDistinct("o_custkey").as("e"))
      .as[(String, Long)].collect().toMap
    val approx = Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey"), 0.01).as("a"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
    val flags = SparkEntry.queries("q53_approx_distinct")(spark, dir)
      .select("o_orderstatus", "within_5pct").as[(String, Boolean)].collect()
    assert(flags.nonEmpty && flags.forall(_._2),
      s"q53 within_5pct must be all-true: ${flags.mkString(",")}")
  }

  test("sql surface: custom functions callable from spark.sql") {
    SqlSurface.register(spark, dir)
    val out = spark.sql(
      "SELECT strip_accents('café') AS a, spanish_date_norm('1 de mayo de 2001') AS b")
      .as[(String, String)].head()
    assert(out == (("cafe", "2001/05/01")))
  }
}
