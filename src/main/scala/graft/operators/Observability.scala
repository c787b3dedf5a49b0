package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Zero-extra-pass pipeline observability via Spark's `observe` API —
 * the runtime companion of [[DataChecks]]: `validate` answers "is this
 * snapshot clean?" as its own aggregation job, while an observation
 * rides ON the production job itself (an `CollectMetrics` node in the
 * plan, accumulator-backed) and reports row counts / violation counts /
 * sums for every batch the pipeline actually wrote — the numbers a
 * 100 TB ingestion feeds its dashboards without paying a second scan.
 *
 * Batch: metrics surface through `QueryExecutionListener` (async on the
 * listener bus — [[collectMetrics]] registers a temporary listener,
 * runs the action, and awaits the named observation points).
 * Streaming: the same `withMetrics` frame reports through each
 * `StreamingQueryProgress.observedMetrics` — per-trigger, no listener
 * needed (ObservabilitySpec covers both paths).
 */
object Observability {

  /** Attach a named observation point computing `metrics` (name →
    * aggregate over the rows that actually flow). */
  def withMetrics(df: DataFrame, name: String,
      metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "at least one metric")
    val cols = metrics.map { case (n, c) => c.as(n) }
    df.observe(name, cols.head, cols.tail: _*)
  }

  /** Run `action` (some terminal job over frames carrying
    * [[withMetrics]] points) and return its result plus the observed
    * metric rows, keyed by observation name then metric name. Blocks
    * until every name in `expected` has reported or `timeoutMs`
    * elapses (listener delivery is asynchronous). */
  def collectMetrics[T](spark: SparkSession, expected: Seq[String],
      timeoutMs: Long = 30000L)(action: => T): (T, Map[String, Map[String, Any]]) = {
    val seen =
      new java.util.concurrent.ConcurrentHashMap[String, Map[String, Any]]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (n, row) =>
          seen.put(n, row.schema.fieldNames.zip(row.toSeq).toMap)
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val r = action
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (!expected.forall(seen.containsKey) &&
          System.nanoTime() < deadline) {
        Thread.sleep(50)
      }
      require(expected.forall(seen.containsKey),
        s"observation points never reported: " +
          expected.filterNot(seen.containsKey).mkString(", "))
      (r, seen.asScala.toMap)
    } finally spark.listenerManager.unregister(listener)
  }
}
