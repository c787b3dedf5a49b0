package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale primitives used across the engine (SURVEY.md §4, prompt mandate:
 * partitioning/bucketing/salting are first-class at 100 TB):
 *
 *  - bucketed tables: co-locate both sides of a recurring equi-join at
 *    write time so the join runs with NO Exchange (verified by plan
 *    inspection in ScaleOpsSpec). This is how the mention/entity/document
 *    tables would be laid out on a real cluster (bucket by entity_id /
 *    doc_id).
 *  - salted join: split hot keys across `saltFactor` sub-keys — the small
 *    side is replicated per salt, the large side scatters via a
 *    deterministic hash — for skew AQE can't fix (e.g. one entity in 30%
 *    of documents).
 */
object ScaleOps {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /**
   * Equi-join `large ⋈ small` on `key` with the hot side salted.
   * Result is identical to `large.join(small, key)` — verified by spec —
   * but the shuffle key becomes (key, salt), spreading a hot key over
   * `saltFactor` reducers.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** True if the executed plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /**
   * Small-file compaction: rewrite a parquet directory into
   * ⌈totalBytes / targetBytes⌉ files. The operational counterpart of
   * the layout ops above — long-running ingestion (each trigger writing
   * a few files) degrades a table into thousands of KB-sized files
   * whose per-file open/footer cost dominates scans; periodic
   * compaction restores the scan-friendly shape. Uses the actual
   * on-disk byte total (not row counts — compression ratio varies), one
   * round-robin repartition, one write. Returns the file count chosen.
   * At 100 TB this runs per partition-directory, not per table, and
   * z-ordered tables compact via [[ZOrder.clusterByZ]] instead so the
   * layout survives.
   */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.getContentSummary(path).getLength
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
