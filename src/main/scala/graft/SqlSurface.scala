package graft

import org.apache.spark.sql.SparkSession

/**
 * SQL entry point (SURVEY.md §7.1 item 8): registers the testdata tables as
 * temp views and the custom scalar expressions in the session function
 * registry, so the whole engine surface is reachable via `spark.sql(...)`.
 */
object SqlSurface {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
        else Tables.table(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    functions.registerAll(spark)
  }
}
