package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Sorted-neighborhood blocking at scale: produce all (prev, curr) pairs of
 * globally-sort-adjacent keys — the substrate of the reference's
 * `combineAdjacentClose` (/root/reference/src/CorefBase.groovy:176-212) and
 * the canonical ER blocking strategy (SURVEY.md §4, §7.5).
 *
 * A bare `Window.orderBy(key)` would funnel every key through ONE partition.
 * Instead: range-partition + sort within partitions (Spark's normal
 * distributed sort), emit adjacent pairs per partition, then stitch the
 * partition boundaries — each partition's (first, last) key is collected
 * (2×P tiny rows) and consecutive non-empty partitions contribute one
 * boundary pair. Scales to any key count with one range shuffle.
 */
object SortedNeighborhood {

  /**
   * @param keys single-string-column DataFrame of DISTINCT keys
   * @return DataFrame (`prev`, `curr`) — every adjacent pair in global
   *         sorted order.
   */
  def adjacentPairs(keys: DataFrame, numPartitions: Int = 0): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val keyCol = keys.columns.head
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    // Persisted BEFORE the two traversals: the within-pairs pass and the
    // bounds pass must observe the SAME partition boundaries — re-executing
    // the range-partition lineage twice can sample different ranges and
    // emit duplicate or missing boundary pairs (caught at sf0.1).
    val sorted = CacheScope.pin(keys.select(col(keyCol).cast("string").as("k"))
      .repartitionByRange(n, col("k"))
      .sortWithinPartitions("k"))
      .as[String]

    // Adjacent pairs inside each partition (narrow, no extra shuffle).
    val within = sorted.mapPartitions { it =>
      var prev: String = null
      it.flatMap { curr =>
        val out = if (prev != null) Iterator((prev, curr)) else Iterator.empty
        prev = curr
        out
      }
    }.toDF("prev", "curr")

    // Partition boundary keys: (partitionId, first, last) — at most one tiny
    // row per partition, safe to collect.
    val bounds = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val first = it.next()
        var last = first
        while (it.hasNext) last = it.next()
        Iterator((pid, first, last))
      } else Iterator.empty
    }.collect().sortBy(_._1)

    val boundaryPairs = bounds.sliding(2).collect {
      case Array((_, _, lastA), (_, firstB, _)) => Row(lastA, firstB)
    }.toSeq

    val schema = StructType(Seq(
      StructField("prev", StringType), StructField("curr", StringType)))
    val cross = spark.createDataFrame(
      spark.sparkContext.parallelize(boundaryPairs, 1), schema)
    within.unionByName(cross)
  }

  /**
   * Row-carrying variant: every pair of rows adjacent in the global
   * `sortCols` order, as (`prev` struct, `curr` struct). Same plan shape as
   * [[adjacentPairs]] — one range shuffle, per-partition adjacency, O(P)
   * boundary stitch — but keeps the full row on both sides so callers can
   * compare arbitrary payload columns (e.g. levenshtein on names) without
   * a re-join. This is the linear-cost replacement for quadratic blocked
   * self-joins (the reference's own design is sorted-adjacent comparison,
   * CorefBase.groovy:176-212).
   */
  def adjacentRowPairs(df: DataFrame, sortCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val rowSchema = df.schema
    // Persisted for the same two-traversal consistency reason as above.
    val sorted = CacheScope.pin(df
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*))

    val pairSchema = StructType(Seq(
      StructField("prev", rowSchema), StructField("curr", rowSchema)))
    val enc = org.apache.spark.sql.Encoders.row(pairSchema)

    val within = sorted.mapPartitions { it =>
      var prev: Row = null
      it.flatMap { curr =>
        val out = if (prev != null) Iterator(Row(prev, curr)) else Iterator.empty
        prev = curr
        out
      }
    }(enc)

    // Per-partition (first, last) rows — at most one tiny row pair per
    // partition; consecutive non-empty partitions give one boundary pair.
    val bounds = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val first = it.next()
        var last = first
        while (it.hasNext) last = it.next()
        Iterator((pid, first, last))
      } else Iterator.empty
    }.collect().sortBy(_._1)

    val boundaryPairs = bounds.sliding(2).collect {
      case Array((_, _, lastA), (_, firstB, _)) => Row(lastA, firstB)
    }.toSeq

    val cross = spark.createDataFrame(
      spark.sparkContext.parallelize(boundaryPairs, 1), pairSchema)
    within.unionByName(cross)
  }
}
