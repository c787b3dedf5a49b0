package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Parquet table loaders for the driver-supplied testdata directories. */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /**
   * `events.ts` has shipped in two physical encodings across testdata
   * generations: TIMESTAMP(NANOS) — which Spark's TimestampType (micros)
   * cannot hold, so it is read as a raw long — and TIMESTAMP(MICROS), which
   * reads as a (possibly NTZ) timestamp. Branch on the read schema and
   * normalize both to one surface: an exact `ts_ns` long for oracle-checked
   * arithmetic plus a micros `ts` for timestamp-typed operators
   * (window/watermark). With the session pinned to UTC (every entry point),
   * `unix_micros(ts) * 1000` matches DuckDB's `epoch_ns(ts)` exactly.
   */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val normalized = raw.schema("ts").dataType match {
      case types.LongType => // TIMESTAMP(NANOS) read as raw nanos
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // TIMESTAMP(MICROS), TZ or NTZ
        raw.withColumn("ts", col("ts").cast(types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
    normalized.select("event_id", "ts_ns", "user_id", "event_type", "value",
      "props", "ts")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One verifiable query: Spark plan + (when SQL-expressible) DuckDB oracle. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
