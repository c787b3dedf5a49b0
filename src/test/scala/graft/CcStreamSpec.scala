package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.ConnectedComponents
import graft.streaming.ArtifactStreams

/**
 * connectedComponentsStream == batch runAlternating over everything
 * delivered, at every trigger. The fold carries only the label table
 * (star edges summarize delivered connectivity exactly), so the spec's
 * batches are built to force the interesting transitions: components
 * that MERGE across triggers (a later edge bridging two previously
 * separate components must relabel the loser's members) and a chain
 * that grows one link per trigger (the carried stars keep the
 * alternation shallow even though the cumulative chain is long).
 */
class CcStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("src", StringType), StructField("dst", StringType)))

  private def labelSet(df: DataFrame): Set[(String, String)] =
    df.select("id", "comp").as[(String, String)].collect().toSet

  test("per-trigger labels == batch alternation over delivered edges") {
    // Trigger 0: two separate chains + an isolated self-loop vertex.
    // Trigger 1: extend chain A; add a fresh ring.
    // Trigger 2: a single bridge edge MERGES chain A into chain B —
    // every member of the lexicographically-larger component must
    // relabel to the other's min.
    val splits: Seq[Seq[(String, String)]] = Seq(
      Seq(("a1", "a2"), ("a2", "a3"), ("b1", "b2"), ("z", "z")),
      Seq(("a3", "a4"), ("r1", "r2"), ("r2", "r3"), ("r3", "r1")),
      Seq(("a4", "b1")))
    val tmp = java.nio.file.Files.createTempDirectory("cc_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(String, String)])]
    val q = ArtifactStreams.connectedComponentsStream(stream) { (lab, id) =>
      perTrigger += (id -> labelSet(lab))
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val want = labelSet(ConnectedComponents.runAlternating(
        splits.take(id.toInt + 1).flatten.toDF("src", "dst"),
        strict = true))
      assert(got === want, s"trigger $id diverges from the batch build")
    }
    // The merge trigger really merged: before the bridge, a* and b*
    // are distinct components; after, every member labels to "a1".
    val before = perTrigger(1)._2
    assert(before.contains(("b2", "b1")) && before.contains(("a4", "a1")))
    val after = perTrigger(2)._2
    assert(Seq("a1", "a2", "a3", "a4", "b1", "b2")
      .forall(n => after.contains((n, "a1"))))
    // The self-loop singleton survives every trigger.
    assert(after.contains(("z", "z")))
  }

  private val tsSchema = StructType(Seq(
    StructField("src", StringType), StructField("dst", StringType),
    StructField("ts", org.apache.spark.sql.types.LongType)))

  test("retention: idle components expire; live labels unchanged; re-touch starts fresh") {
    // retention 10 on edge event time. Trigger 0 seeds chains A and B;
    // trigger 1 touches only B at ts 20 → watermark 10 closes A (its
    // latest arrival is 1); trigger 2 re-touches expired node a1 at
    // ts 25 — a FRESH component containing only post-expiry
    // connectivity, never a resurrection of old A.
    val splits: Seq[Seq[(String, String, Long)]] = Seq(
      Seq(("a1", "a2", 0L), ("a2", "a3", 1L), ("b1", "b2", 5L)),
      Seq(("b2", "b3", 20L)),
      Seq(("a1", "c9", 25L)))
    val tmp = java.nio.file.Files.createTempDirectory("cc_ret").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst", "ts").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(tsSchema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val labs = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(String, String)])]
    val states = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(String, String), Long])]
    var lastState: DataFrame = null
    val q = ArtifactStreams.connectedComponentsStream(stream,
        tsCol = Some("ts"), retention = Some(10L))(
      (lab, id) => labs += (id -> labelSet(lab)),
      (st, id) => {
        states += (id -> st.select("id", "comp", "last_ts")
          .as[(String, String, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap)
        lastState = st
      })
    q.processAllAvailable()
    q.stop()
    assert(labs.size == 3)
    // Trigger 0: nothing expires (watermark = 5 − 10 < all times).
    assert(labs(0)._2 === Set(("a1", "a1"), ("a2", "a1"), ("a3", "a1"),
      ("b1", "b1"), ("b2", "b1")))
    // Trigger 1: A expired (latest arrival 1 < watermark 10); B's labels
    // are exactly the batch build over B's own edges — expiry of a
    // DISJOINT component perturbs nothing.
    assert(labs(1)._2 === Set(("b1", "b1"), ("b2", "b1"), ("b3", "b1")))
    assert(states(1)._2.keySet.map(_._1) === Set("b1", "b2", "b3"))
    assert(states(1)._2(("b2", "b1")) === 20L)
    // Trigger 2: the re-touched a1 anchors a FRESH component {a1, c9} —
    // old members a2/a3 stay gone.
    assert(labs(2)._2 === Set(("b1", "b1"), ("b2", "b1"), ("b3", "b1"),
      ("a1", "a1"), ("c9", "a1")))
    assert(!labs(2)._2.exists(_._1 == "a2"))
    if (lastState != null)
      graft.operators.CacheScope.unpinCheckpoint(lastState)
  }

  test("retention: a batch below the watermark refuses loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("cc_late").toString
    Seq(("x1", "x2", 100L)).toDF("src", "dst", "ts").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    Thread.sleep(1100)
    Seq(("y1", "y2", 50L)).toDF("src", "dst", "ts").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    val late = spark.readStream.schema(tsSchema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val q = ArtifactStreams.connectedComponentsStream(late,
      tsCol = Some("ts"), retention = Some(10L))((_, _) => ())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(chain(e).exists(_.contains("below the retention watermark")),
      s"unexpected failure: ${chain(e)}")
  }

  test("retention: a NULL event time refuses loudly instead of expiring silently") {
    // ADVICE r14 class: min/max skip nulls, so a null-ts edge used to
    // pass the lateness probe and its component's last_ts could fold
    // toward NULL — silently expired by the filter (NULL >= wm is NULL).
    val tmp = java.nio.file.Files.createTempDirectory("cc_nullts").toString
    Seq(("x1", "x2", Some(100L)), ("y1", "y2", None))
      .toDF("src", "dst", "ts").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(tsSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
    val q = ArtifactStreams.connectedComponentsStream(stream,
      tsCol = Some("ts"), retention = Some(10L))((_, _) => ())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(chain(e).exists(_.contains("NULL ts")),
      s"unexpected failure: ${chain(e)}")
  }
}
