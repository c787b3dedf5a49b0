package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the `events` table (SURVEY.md §2.10 —
 * absent from the reference, declared engine surface). Every operator has a
 * batch-equivalent form; StreamingSpec asserts stream == batch on the same
 * files (the correctness contract for incremental execution).
 *
 * Scale notes: watermarks bound state; windowed aggregations shuffle by
 * (window, key) exactly like their batch groupBy twins; session windows and
 * flatMapGroupsWithState state stores partition by user_id, so 1000
 * executors hold disjoint user state.
 */
object EventStreams {

  /** File schema with `ts` of the given type (see graft.Tables.events —
    * NANOS testdata reads `ts` as a raw long; MICROS as a timestamp). */
  def fileSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stream of events from a testdata directory, normalized to the same
    * (ts_ns long, ts micros-timestamp) surface as the batch loader. A
    * readStream needs an explicit schema, so the `ts` physical encoding is
    * sniffed from a batch read of the same file (footer-only, no data job).
    * When the file does not exist yet (a stream started over a directory
    * that will be populated later), the sniff falls back to the legacy
    * nanos-as-long encoding, matching the pre-round-6 static schema.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      try spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => LongType }
    val raw = spark.readStream
      .schema(fileSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val normalized = tsType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
    normalized.select("event_id", "ts_ns", "user_id", "event_type", "value",
      "props", "ts")
  }

  /** Tumbling-window counts/sums per event_type with a watermark. */
  def tumblingCounts(events: DataFrame, width: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding-window rolling sums (width/slide). */
  def slidingSums(events: DataFrame, width: String = "20 minutes",
      slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("total_value"))

  /** Native session windows (gap-based), the streaming twin of q26. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "60 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Streaming exact dedup on event_id (state bounded by watermark). */
  def dedup(events: DataFrame, watermark: String = "60 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /**
   * Stream-stream interval join: each purchase matched to same-user clicks
   * in the preceding `windowMinutes`. Watermarks bound both join states —
   * on a cluster, state stores partition by user_id and expire as event
   * time advances.
   */
  def purchaseClickJoin(events: DataFrame, windowMinutes: Int = 30,
      watermark: String = "60 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"))
  }

  /**
   * Tumbling-window statistical profile of `value` per event_type: count,
   * mean, and approx p50/p90 — the streaming face of the stat-profile
   * operator (TextAnalysis.statProfile). `approx_percentile`'s sketch is
   * mergeable, so it aggregates incrementally under a watermark exactly
   * like count/avg; the exact `percentile` would not (its buffer holds
   * every value). Rank error ≤ n/accuracy per window; the spec asserts
   * stream output within that bound of the batch-exact percentile rather
   * than equality, since sketch merge ORDER differs between incremental
   * and batch execution.
   */
  def windowedValueProfile(events: DataFrame, width: String = "30 minutes",
      watermark: String = "60 minutes", accuracy: Int = 10000): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("value")), 6).as("avg_value"),
        expr(s"approx_percentile(value, array(0.5, 0.9), $accuracy)").as("pcts"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("avg_value"),
        col("pcts").getItem(0).as("p50"), col("pcts").getItem(1).as("p90"))

  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /**
   * Custom keyed state: running per-user totals via flatMapGroupsWithState
   * (the engine's escape hatch for state machines the built-ins can't
   * express — SURVEY.md §2.10).
   */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n_events
          var v = prev.total_value
          rows.foreach { r => n += 1; v += r._2 }
          val next = UserRunning(user, n, math.round(v * 100).toDouble / 100)
          state.update(next)
          Iterator(next)
      }
  }

  case class CusumState(s: Long, nAlarms: Long,
      peak: Long, peakEvent: Long)
  case class CusumRow(event_type: String, n_alarms: Long,
      peak_cusum: Long, peak_event_id: Long)

  /**
   * Streaming CUSUM mean-shift monitor — the streaming face of q111.
   * Batch CUSUM centers deviations on the corpus mean; a stream cannot
   * know the final mean, so the production form monitors against a FIXED
   * baseline target per event type (`targetCents` — the value a change
   * is a change FROM), which is also what makes state O(1) per type:
   * (running prefix, running min-prefix, alarm count, peak, peak event),
   * folded through the exact recurrence S = max(0, S + d).
   *
   * Per trigger each type's new rows sort by (ts_ns, event_id) INSIDE
   * the state function — bounded by trigger size — so the fold is
   * order-correct as long as triggers themselves arrive in event-time
   * order per type (the contract EventStreamsSpec pins: stream over a
   * time-split == batch over the concatenation, exactly).
   */
  def cusumStream(spark: SparkSession, events: DataFrame,
      targetCents: Long, thresholdCents: Long): Dataset[CusumRow] = {
    import spark.implicits._
    events
      .select(col("event_type"), col("event_id"), col("ts_ns"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, Long, Long, Long)],
            state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, -1L))
          val sorted = rows.toSeq.sortBy { case (_, id, ts, _) => (ts, id) }
          for ((_, id, _, cents) <- sorted) {
            // The recurrence directly (equals q111's prefix identity
            // S_i = P_i − min_{0≤j≤i} P_j — EventStreamsSpec pins both).
            val s = math.max(0L, st.s + (cents - targetCents))
            val alarms = st.nAlarms + (if (s > thresholdCents) 1L else 0L)
            val (peak, peakEvent) =
              if (s > st.peak) (s, id) else (st.peak, st.peakEvent)
            st = CusumState(s, alarms, peak, peakEvent)
          }
          state.update(st)
          Iterator(CusumRow(etype, st.nAlarms, st.peak, st.peakEvent))
      }
  }

  case class FunnelState(t1: Long, t2: Long, t3: Long, t4: Long)
  case class FunnelRow(user_id: Long, stage: Int, t1: Long, t4: Long)

  /**
   * Streaming conversion funnel — the streaming face of q100 (same
   * semantics: signup → view → click → purchase, each stage the FIRST
   * matching event strictly after the previous stage within `windowNs`).
   * Per-user state is four timestamps (−1 = unreached); each trigger's
   * rows sort by event time inside the state function, and because a
   * qualifying next-stage event always has a LATER timestamp than the
   * stage before it, time-ordered triggers make the greedy fold equal
   * the batch minima exactly — FunnelStreamSpec pins stream == the
   * oracle-checked q100 per-stage counts on a trigger split.
   */
  def funnelStream(spark: SparkSession, events: DataFrame,
      windowNs: Long = 86400000000000L): Dataset[FunnelRow] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, -1L))
          val sorted = rows.toSeq.sortBy { case (_, _, ts, id) => (ts, id) }
          for ((_, etype, ts, _) <- sorted) {
            st = etype match {
              case "signup" if st.t1 < 0 => st.copy(t1 = ts)
              case "view" if st.t2 < 0 && st.t1 >= 0 && ts > st.t1 &&
                ts <= st.t1 + windowNs => st.copy(t2 = ts)
              case "click" if st.t3 < 0 && st.t2 >= 0 && ts > st.t2 &&
                ts <= st.t2 + windowNs => st.copy(t3 = ts)
              case "purchase" if st.t4 < 0 && st.t3 >= 0 && ts > st.t3 &&
                ts <= st.t3 + windowNs => st.copy(t4 = ts)
              case _ => st
            }
          }
          state.update(st)
          val stage = if (st.t1 < 0) 0 else if (st.t2 < 0) 1
            else if (st.t3 < 0) 2 else if (st.t4 < 0) 3 else 4
          Iterator(FunnelRow(user, stage, st.t1, st.t4))
      }
  }
}
