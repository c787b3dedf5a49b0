package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Search-index artifact: the reference's Lucene build (step 9,
 * /root/reference/src/Ingester.groovy:289-294) re-expressed as a
 * relational posting-list index — term → df, per-doc postings — written
 * as parquet partitioned by a term-hash bucket. Term lookups compute
 * their buckets first, so a query touches only |terms| partitions of the
 * artifact (parquet partition pruning), not the whole index; at 100 TB
 * the bucket count scales with the corpus while lookup cost stays
 * O(postings of the queried terms).
 */
object SearchIndex {

  /**
   * Build posting lists from (id, text): one row per term with document
   * frequency, total term frequency, per-doc postings (sorted by doc id),
   * and the term-hash bucket used as the artifact's partition key. One
   * explode + two clustered aggregations — the same plan family as q54.
   */
  def build(docs: DataFrame, idCol: String, textCol: String,
      minTokenLen: Int = 2, nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "" && length(col("tok")) >= minTokenLen)
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("tok")).agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        sort_array(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(nBuckets)).cast("int"))
  }

  /** Write the index partitioned by bucket (one directory per bucket). */
  def write(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("bucket").parquet(path)

  /**
   * Load the posting rows for `terms` only: the terms' buckets are
   * computed with the same hash the build used, so the parquet scan
   * prunes to those partition directories before any row is read.
   */
  def lookup(spark: SparkSession, path: String, terms: Seq[String],
      nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    val buckets = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(nBuckets)).cast("int"))
      .as[Int].collect().toSeq.distinct
    spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(terms: _*))
  }

  /**
   * Conjunctive (AND) keyword search served from the artifact: docs
   * containing ALL terms, scored by total term frequency — q55's
   * semantics, but reading only the queried terms' postings.
   */
  def searchConjunctive(spark: SparkSession, path: String,
      terms: Seq[String], nBuckets: Int = 64): DataFrame =
    lookup(spark, path, terms, nBuckets)
      .select(col("tok"), explode(col("postings")).as("p"))
      .select(col("tok"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("tok")).as("n_terms"), sum(col("tf")).as("score"))
      .filter(col("n_terms") === terms.distinct.length)
      .select(col("doc_id"), col("score"))
}
