package graft

import org.apache.spark.sql.SparkSession

/**
 * Standalone pipeline CLI (the reference's Ingester.main shape —
 * /root/reference/src/Ingester.groovy:60-97: input docs dir → output
 * artifacts dir):
 *
 *   sbt "runMain graft.RunIngester <inputDir> <outputDir> [glob]"
 *
 * Produces the relational parquet export (document/mention/entity/
 * document_entity/geolocation) plus social_network.graphml under
 * <outputDir>.
 */
object RunIngester {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunIngester <inputDir> <outputDir> [glob]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingester")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val glob = if (args.length > 2) args(2) else "*.txt"
    val r = Ingester.run(spark, Ingester.Config(args(0), args(1), glob))
    println(s"documents=${r.documents.count()} mentions=${r.mentions.count()} " +
      s"entities=${r.entities.count()} social_edges=${r.socialEdges.count()} " +
      s"geolocations=${r.geolocation.count()}")
    spark.stop()
  }
}
