package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Modularity
import graft.streaming.ArtifactStreams

/**
 * modularityStream == batch communityStats over everything delivered,
 * at every trigger: the per-community counters fold by associative
 * sum and m derives from the artifact (Σ degree = 2m), so trigger
 * split points are invisible and the partition scorecard stays
 * current as unique edges stream in. Also pins the batch refactor:
 * communityStats == finalizeStats ∘ partialStats on the deduped
 * canonical edge set.
 */
class ModularityStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))

  private def scorecard(edges: Seq[(Long, Long)],
      mem: Map[Long, String]): Set[(String, Long, Long, Long, Long, Long)] =
    Modularity.communityStats(edges.toDF("src", "dst"),
        mem.toSeq.toDF("node_id", "community"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet

  test("per-trigger scorecard reads as the batch stats of all edges delivered") {
    val rng = new Random(17)
    val n = 14L
    val edges = (1 to 120)
      .map(_ => (rng.nextInt(n.toInt).toLong, rng.nextInt(n.toInt).toLong))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 < e._2).distinct // the unique-edge stream contract
    val mem = (0L until n).map(v => v -> s"c${v % 4}").toMap
    val memDf = mem.toSeq.toDF("node_id", "community")
    val splits = Seq(edges.slice(0, 25), edges.slice(25, 26),
      edges.slice(26, edges.size))
    val tmp = java.nio.file.Files.createTempDirectory("mod_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(String, Long, Long, Long, Long, Long)])]
    val q = ArtifactStreams.modularityStream(stream, memDf) { (card, id) =>
      perTrigger += (id -> card.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet)
    }
    q.processAllAvailable()
    q.stop()
    assert(perTrigger.size == 3)
    perTrigger.foreach { case (id, got) =>
      val want = scorecard(splits.take(id.toInt + 1).flatten, mem)
      assert(got == want, s"trigger $id diverges from batch communityStats")
    }
  }

  test("greedyMembershipStream: carried graph == batch canon; membership == offline round-per-prefix loop") {
    // weighted stream with a cross-trigger REPEAT (weights must sum),
    // a SELF-LOOP (legal, rides the coarse-graph algebra), and nodes
    // arriving late (must enter as singletons).
    val splits: Seq[Seq[(Long, Long, Long)]] = Seq(
      Seq((0L, 1L, 4L), (1L, 2L, 1L), (5L, 5L, 3L)),
      Seq((2L, 0L, 2L), (0L, 1L, 1L), (3L, 4L, 5L)),
      Seq((4L, 5L, 2L), (6L, 3L, 1L)))
    val tmp = java.nio.file.Files.createTempDirectory("mem_stream").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst", "w").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val wSchema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("w", LongType)))
    val stream = spark.readStream.schema(wSchema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val mems = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, String])]
    val graphs = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(Long, Long), Long])]
    var lastMem: org.apache.spark.sql.DataFrame = null
    var lastGraph: org.apache.spark.sql.DataFrame = null
    val q = ArtifactStreams.greedyMembershipStream(stream, Some("w"))(
      (m, id) => {
        mems += (id -> m.as[(Long, String)].collect().toMap)
        lastMem = m
      },
      (g, id) => {
        graphs += (id -> g.as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap)
        lastGraph = g
      })
    q.processAllAvailable()
    q.stop()
    assert(mems.size == 3)
    // (1) carried edge artifact == the batch canonical merge over
    // everything delivered — split points invisible
    graphs.foreach { case (id, got) =>
      val want = splits.take(id.toInt + 1).flatten
        .map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }
        .groupBy(e => (e._1, e._2))
        .map { case (k, g) => k -> g.map(_._3).sum }
      assert(got === want, s"trigger $id graph diverges from batch canon")
    }
    // (2) membership at trigger i == the offline loop: one
    // greedyMoveRound per delivered prefix, singleton entry for new
    // nodes, moves applied — computed here with the BATCH operator.
    var mem = Map.empty[Long, String]
    splits.indices.foreach { i =>
      val delivered = splits.take(i + 1).flatten
      val nodes = delivered.flatMap(e => Seq(e._1, e._2)).distinct
      val entered = mem ++ nodes.filterNot(mem.contains)
        .map(v => v -> v.toString)
      mem = Modularity.greedyMoveRound(
          delivered.toDF("src", "dst", "w"),
          entered.toSeq.toDF("node_id", "community"), Some("w"),
          selfLoops = true)
        .select(col("node_id"), col("comm_new"))
        .as[(Long, String)].collect().toMap
      assert(mems(i)._2 === mem, s"trigger $i membership diverges")
    }
    // the self-loop-only node exists and stays its own singleton
    assert(mems(0)._2(5L) == "5")
    Seq(lastMem, lastGraph).filter(_ != null)
      .foreach(graft.operators.CacheScope.unpinCheckpoint)
  }

  test("greedyMembershipStream retention: state pinned to the horizon, stream == offline replay, fresh re-entry") {
    // (src, dst, w, ts); retention 18. After trigger 1 the watermark is
    // 30 − 18 = 12, so (0,1) @10 expires — nodes 0 and 1 leave the
    // carried graph AND the membership; (2,3) re-touched @25 stays with
    // its weight SUMMED. Trigger 2 re-touches node 0 @35: it re-enters
    // as a FRESH singleton (its expired community history is gone).
    val splits: Seq[Seq[(Long, Long, Long, Long)]] = Seq(
      Seq((0L, 1L, 4L, 10L), (2L, 3L, 1L, 14L)),
      Seq((2L, 3L, 2L, 25L), (4L, 5L, 5L, 30L)),
      Seq((0L, 6L, 1L, 35L)))
    val r = 18L
    val tmp = java.nio.file.Files.createTempDirectory("mem_ret").toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst", "w", "ts").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val tsSchema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("w", LongType),
      StructField("ts", LongType)))
    val stream = spark.readStream.schema(tsSchema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val mems = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, String])]
    val graphs = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(Long, Long), (Long, Long)])]
    var lastMem: org.apache.spark.sql.DataFrame = null
    var lastGraph: org.apache.spark.sql.DataFrame = null
    val q = ArtifactStreams.greedyMembershipStream(stream, Some("w"),
      tsCol = Some("ts"), retention = Some(r))(
      (m, id) => {
        mems += (id -> m.as[(Long, String)].collect().toMap)
        lastMem = m
      },
      (g, id) => {
        graphs += (id -> g.as[(Long, Long, Long, Long)].collect()
          .map(x => (x._1, x._2) -> ((x._3, x._4))).toMap)
        lastGraph = g
      })
    q.processAllAvailable()
    q.stop()
    assert(mems.size == 3)
    // OFFLINE replay with the same retention rule — what the stream
    // must equal at every trigger.
    var canon = Map.empty[(Long, Long), (Long, Long)]
    var mem = Map.empty[Long, String]
    var hw = Long.MinValue
    splits.indices.foreach { i =>
      val batch = splits(i).map { case (a, b, w, ts) =>
        (math.min(a, b), math.max(a, b), w, ts) }
      hw = math.max(hw, batch.map(_._4).max)
      val bc = batch.groupBy(e => (e._1, e._2))
        .map { case (k, g) => k -> ((g.map(_._3).sum, g.map(_._4).max)) }
      canon = (canon.keySet ++ bc.keySet).map { k =>
        val (w1, t1) = canon.getOrElse(k, (0L, Long.MinValue))
        val (w2, t2) = bc.getOrElse(k, (0L, Long.MinValue))
        k -> ((w1 + w2, math.max(t1, t2)))
      }.toMap
      canon = canon.filter(_._2._2 >= hw - r) // expiry
      val live = canon.toSeq.map { case ((s, d), (w, _)) => (s, d, w) }
      val nodes = live.flatMap(e => Seq(e._1, e._2)).distinct
      val carried = mem.filter(kv => nodes.contains(kv._1))
      val entered = carried ++ nodes.filterNot(carried.contains)
        .map(v => v -> v.toString)
      mem = Modularity.greedyMoveRound(live.toDF("src", "dst", "w"),
          entered.toSeq.toDF("node_id", "community"), Some("w"),
          selfLoops = true)
        .select(col("node_id"), col("comm_new"))
        .as[(Long, String)].collect().toMap
      assert(graphs(i)._2 === canon, s"trigger $i carried graph diverges")
      assert(mems(i)._2 === mem, s"trigger $i membership diverges")
    }
    // expiry really removed nodes 0/1 at trigger 1; 0 re-entered at 2
    assert(!mems(1)._2.contains(0L) && !mems(1)._2.contains(1L))
    assert(mems(2)._2.contains(0L) && !mems(2)._2.contains(1L))
    Seq(lastMem, lastGraph).filter(_ != null)
      .foreach(graft.operators.CacheScope.unpinCheckpoint)
  }

  test("greedyMembershipStream retention: a batch below the watermark refuses loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("mem_late").toString
    Seq((1L, 2L, 1L, 100L)).toDF("src", "dst", "w", "ts").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    Thread.sleep(1100)
    Seq((3L, 4L, 1L, 50L)).toDF("src", "dst", "w", "ts").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    val tsSchema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("w", LongType),
      StructField("ts", LongType)))
    val late = spark.readStream.schema(tsSchema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val q = ArtifactStreams.greedyMembershipStream(late, Some("w"),
      tsCol = Some("ts"), retention = Some(10L))((_, _) => ())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(chain(e).exists(_.contains("below the retention watermark")),
      s"unexpected failure: ${chain(e)}")
  }

  test("greedyMembershipStream retention: a NULL event time refuses loudly instead of expiring silently") {
    // ADVICE r14: min/max skip nulls, so a null-ts edge used to pass
    // the lateness probe, fold with last_ts = NULL, and vanish in the
    // expiry filter (NULL >= hw − r is NULL) — a silent drop on a face
    // whose contract is loud refusal.
    val tmp = java.nio.file.Files.createTempDirectory("mem_nullts").toString
    Seq((1L, 2L, 1L, Some(100L)), (3L, 4L, 1L, None))
      .toDF("src", "dst", "w", "ts").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    val tsSchema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("w", LongType),
      StructField("ts", LongType)))
    val stream = spark.readStream.schema(tsSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
    val q = ArtifactStreams.greedyMembershipStream(stream, Some("w"),
      tsCol = Some("ts"), retention = Some(10L))((_, _) => ())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(chain(e).exists(_.contains("NULL ts")),
      s"unexpected failure: ${chain(e)}")
  }

  test("coarseGraphStream: carried coarse table == one-shot coarsen over everything delivered; weight conserved") {
    // Fixed membership over 7 nodes → 3 communities. The stream carries
    // cross-trigger repeats (weights must SUM through the contraction),
    // intra-community edges (mass must land on the community's
    // SELF-LOOP), and a node arriving only in the last trigger.
    val mem = Map(0L -> "a", 1L -> "a", 2L -> "b", 3L -> "b",
      4L -> "c", 5L -> "c", 6L -> "a")
    val memDf = mem.toSeq.toDF("node_id", "community")
    val splits: Seq[Seq[(Long, Long, Long)]] = Seq(
      Seq((0L, 1L, 4L), (1L, 2L, 1L)),
      Seq((2L, 0L, 2L), (0L, 1L, 1L), (3L, 4L, 5L)),
      Seq((4L, 5L, 2L), (6L, 3L, 1L)))
    val tmp = java.nio.file.Files.createTempDirectory("coarse_stream")
      .toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst", "w").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val wSchema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("w", LongType)))
    val stream = spark.readStream.schema(wSchema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val states = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(String, String), Long])]
    var lastState: org.apache.spark.sql.DataFrame = null
    val q = ArtifactStreams.coarseGraphStream(stream, memDf, Some("w")) {
      (g, id) =>
        states += (id -> g.as[(String, String, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap)
        lastState = g
    }
    q.processAllAvailable()
    q.stop()
    assert(states.size == 3)
    states.foreach { case (id, got) =>
      val delivered = splits.take(id.toInt + 1).flatten
      val want = Modularity.coarsen(delivered.toDF("src", "dst", "w"),
          memDf, Some("w"))
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === want, s"trigger $id diverges from one-shot coarsen")
      // contraction conserves total weight exactly
      assert(got.values.sum == delivered.map(_._3).sum,
        s"trigger $id lost mass through the contraction")
    }
    // intra-community mass really is the self-loop: trigger 0's (0,1,4)
    // is community a's self-loop
    assert(states(0)._2(("a", "a")) == 4L)
    Option(lastState).foreach(graft.operators.CacheScope.unpinCheckpoint)

    // UNWEIGHTED unique-edge stream (the modularityStream contract):
    // within-batch repeats dedup exactly as the one-shot build does.
    val uSplits: Seq[Seq[(Long, Long)]] = Seq(
      Seq((0L, 1L), (1L, 0L), (1L, 2L)), // orientation repeat, in-batch
      Seq((3L, 4L), (4L, 5L)))
    val uTmp = java.nio.file.Files.createTempDirectory("coarse_uw").toString
    uSplits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst").coalesce(1)
        .write.mode("append").parquet(s"$uTmp/in")
    }
    val uSchema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType)))
    val uStream = spark.readStream.schema(uSchema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$uTmp/in")
    val uStates = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(String, String), Long])]
    var uLast: org.apache.spark.sql.DataFrame = null
    val uq = ArtifactStreams.coarseGraphStream(uStream, memDf) { (g, id) =>
      uStates += (id -> g.as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap)
      uLast = g
    }
    uq.processAllAvailable()
    uq.stop()
    uStates.foreach { case (id, got) =>
      val want = Modularity.coarsen(
          uSplits.take(id.toInt + 1).flatten.toDF("src", "dst"), memDf)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === want, s"unweighted trigger $id diverges")
    }
    Option(uLast).foreach(graft.operators.CacheScope.unpinCheckpoint)
  }

  test("coarseGraphStream: a batch touching an unmapped node refuses loudly") {
    val memDf = Seq((0L, "a"), (1L, "a")).toDF("node_id", "community")
    val tmp = java.nio.file.Files.createTempDirectory("coarse_unmapped")
      .toString
    Seq((0L, 9L, 1L)).toDF("src", "dst", "w").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    val wSchema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("w", LongType)))
    val stream = spark.readStream.schema(wSchema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val q = ArtifactStreams.coarseGraphStream(stream, memDf,
      Some("w"))((_, _) => ())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(chain(e).exists(_.contains("membership must cover")),
      s"unexpected failure: ${chain(e)}")
  }

  test("batch identity: communityStats == finalize(partial) and shard-merge associativity") {
    val rng = new Random(23)
    val edges = (1 to 60)
      .map(_ => (rng.nextInt(10).toLong, rng.nextInt(10).toLong))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 < e._2).distinct
    val mem = (0L until 10L).map(v => v -> s"g${v % 3}").toMap
    val memDf = mem.toSeq.toDF("node_id", "community")
    val (l, r) = edges.splitAt(edges.size / 2)
    val merged = Modularity.partialStats(l.toDF("src", "dst"), memDf)
      .unionByName(Modularity.partialStats(r.toDF("src", "dst"), memDf))
      .groupBy(col("community"))
      .agg(sum(col("internal_edges")).as("internal_edges"),
        sum(col("degree_sum")).as("degree_sum"))
    val viaShards = Modularity.finalizeStats(merged, memDf)
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5))).toSet
    assert(viaShards === scorecard(edges, mem))
  }

  test("coarseGraphStream dedupeDelivery: cross-trigger redelivery folds to nothing; off double-counts; seen set == delivered uniques") {
    // VERDICT r14 #4: at-least-once delivery is the streaming norm, and
    // the unweighted unique-edge contract made a cross-trigger
    // redelivery a SILENT double-count. Trigger 1 redelivers both of
    // trigger 0's edges (one orientation-flipped) plus one new edge.
    val mem = Map(0L -> "a", 1L -> "a", 2L -> "b", 3L -> "b")
    val memDf = mem.toSeq.toDF("node_id", "community")
    val splits: Seq[Seq[(Long, Long)]] = Seq(
      Seq((0L, 1L), (1L, 2L)),
      Seq((1L, 0L), (1L, 2L), (2L, 3L)))
    def run(dedup: Boolean): (Map[(String, String), Long], Long) = {
      val tmp = java.nio.file.Files.createTempDirectory("coarse_redeliver")
        .toString
      splits.zipWithIndex.foreach { case (part, i) =>
        if (i > 0) Thread.sleep(1100)
        part.toDF("src", "dst").coalesce(1)
          .write.mode("append").parquet(s"$tmp/in")
      }
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
        .parquet(s"$tmp/in")
      var last: Map[(String, String), Long] = Map.empty
      var lastG: org.apache.spark.sql.DataFrame = null
      var lastSeen: org.apache.spark.sql.DataFrame = null
      var seenCount = -1L
      val q = ArtifactStreams.coarseGraphStream(stream, memDf,
        dedupeDelivery = dedup)({ (g, _) =>
          last = g.as[(String, String, Long)].collect()
            .map(r => (r._1, r._2) -> r._3).toMap
          lastG = g
        }, { (seen, _) => seenCount = seen.count(); lastSeen = seen })
      q.processAllAvailable()
      q.stop()
      Option(lastG).foreach(graft.operators.CacheScope.unpinCheckpoint)
      Option(lastSeen).foreach(graft.operators.CacheScope.unpinCheckpoint)
      (last, seenCount)
    }
    // Flag ON: the carried coarse table == one-shot coarsen over the
    // UNIQUE canonical edges, whatever the redelivery pattern.
    val (deduped, seen) = run(dedup = true)
    val want = Modularity.coarsen(
        Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst"), memDf)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(deduped === want,
      "redelivered edges must fold to nothing under dedupeDelivery")
    // and the carried seen set is exactly the delivered unique-edge set
    assert(seen == 3L, s"seen set should hold the 3 unique edges: $seen")
    // Flag OFF: the documented contract violation — both redelivered
    // edges double-count through the contraction ((a,a) picks up a
    // second unit of mass from the re-folded (0,1)).
    val (doubled, noSeen) = run(dedup = false)
    assert(doubled(("a", "a")) == 2L && noSeen == -1L,
      s"without dedupeDelivery the redelivery must double-count: $doubled")
    // weighted + dedupeDelivery refuses up front: repeats are mass there
    val wTmp = java.nio.file.Files.createTempDirectory("coarse_wref")
      .toString
    Seq((0L, 1L, 1L)).toDF("src", "dst", "w").coalesce(1)
      .write.mode("append").parquet(s"$wTmp/in")
    intercept[IllegalArgumentException] {
      ArtifactStreams.coarseGraphStream(
        spark.readStream.schema(StructType(Seq(
          StructField("src", LongType), StructField("dst", LongType),
          StructField("w", LongType)))).parquet(s"$wTmp/in"),
        memDf, Some("w"), dedupeDelivery = true)((_, _) => ())
    }
  }

  test("greedyMembershipStream dedupeDelivery: carried graph under redelivery == canon over unique edges (weights stay 1)") {
    val splits: Seq[Seq[(Long, Long)]] = Seq(
      Seq((0L, 1L), (1L, 2L)),
      Seq((1L, 0L), (2L, 3L))) // (1,0) redelivers trigger 0's (0,1)
    val tmp = java.nio.file.Files.createTempDirectory("gm_redeliver")
      .toString
    splits.zipWithIndex.foreach { case (part, i) =>
      if (i > 0) Thread.sleep(1100)
      part.toDF("src", "dst").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(s"$tmp/in")
    var lastEdges: Map[(Long, Long), Long] = Map.empty
    var lastMem: org.apache.spark.sql.DataFrame = null
    var lastG: org.apache.spark.sql.DataFrame = null
    val q = ArtifactStreams.greedyMembershipStream(stream,
      dedupeDelivery = true)({ (m, _) => lastMem = m }, { (g, _) =>
        lastEdges = g.select("src", "dst", "w").as[(Long, Long, Long)]
          .collect().map(r => (r._1, r._2) -> r._3).toMap
        lastG = g
      })
    q.processAllAvailable()
    q.stop()
    Option(lastG).foreach(graft.operators.CacheScope.unpinCheckpoint)
    Option(lastMem).foreach(graft.operators.CacheScope.unpinCheckpoint)
    // the redelivered (0,1) folds to itself: every unique edge at w = 1
    assert(lastEdges === Map((0L, 1L) -> 1L, (1L, 2L) -> 1L,
      (2L, 3L) -> 1L),
      s"carried graph must be the unique canonical set at weight 1: $lastEdges")
  }
}
