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
}
