package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/**
 * Streaming == batch equivalence on the same files (the incremental
 * correctness contract). Static parquet drives each query synchronously
 * via the memory sink + processAllAvailable.
 */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  private lazy val batchEvents = Tables.events(spark, dir)

  test("readEventStream over a not-yet-populated directory: legacy schema fallback") {
    // ADVICE r6: the ts-encoding sniff must not throw when events.parquet
    // does not exist at stream construction — it falls back to the legacy
    // nanos-as-long schema, and the stream starts (processing nothing).
    val empty = java.nio.file.Files.createTempDirectory("no_events").toString
    val stream = EventStreams.readEventStream(spark, empty)
    assert(stream.schema("ts_ns").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val q = stream.writeStream.format("noop").start()
    q.processAllAvailable()
    q.stop()
  }

  test("windowed value profile: stream percentiles within sketch bound of batch-exact") {
    val got = runToMemory(
      EventStreams.windowedValueProfile(EventStreams.readEventStream(spark, dir)),
      "value_profile", "complete")
      .as[(java.sql.Timestamp, String, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // Batch reference: the SAME approx_percentile aggregation run batch.
    // With n << accuracy the sketch holds every value, so both executions
    // are exact nearest-rank regardless of merge order — stream == batch
    // exactly. (Comparing against the exact `percentile` would conflate
    // nearest-rank vs interpolation semantics on tiny windows.)
    val want = batchEvents
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"),
        expr("approx_percentile(value, array(0.5, 0.9), 10000)").as("pcts"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("avg_value"), col("pcts").getItem(0), col("pcts").getItem(1))
      .as[(java.sql.Timestamp, String, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    want.foreach { case (k, (_, _, n, mean, p50, p90)) =>
      val (_, _, gn, gmean, gp50, gp90) = got(k)
      assert(gn == n && gmean == mean, s"$k count/mean must be exact")
      assert(gp50 == p50 && gp90 == p90,
        s"$k percentiles: stream ($gp50, $gp90) vs batch ($p50, $p90)")
    }
  }

  test("tumbling window counts: stream == batch") {
    val got = runToMemory(
      EventStreams.tumblingCounts(EventStreams.readEventStream(spark, dir)),
      "tumbling", "complete")
      .select("window_start", "event_type", "n", "total_value")
    val want = batchEvents
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("sliding window sums: stream == batch") {
    val got = runToMemory(
      EventStreams.slidingSums(EventStreams.readEventStream(spark, dir)),
      "sliding", "complete")
    val want = batchEvents
      .groupBy(window(col("ts"), "20 minutes", "5 minutes"), col("event_type"))
      .agg(round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("total_value"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("session windows: stream == batch session_window") {
    val got = runToMemory(
      EventStreams.sessionCounts(EventStreams.readEventStream(spark, dir)),
      "sessions", "complete")
    val want = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // and the session totals reconcile with raw event counts
    val totalGot = got.agg(sum("n_events")).as[Long].head()
    assert(totalGot == batchEvents.count())
  }

  test("streaming dedup keeps all distinct event_ids") {
    val got = runToMemory(
      EventStreams.dedup(EventStreams.readEventStream(spark, dir))
        .select("event_id"), "dedup", "append")
    assert(got.count() == batchEvents.select("event_id").distinct().count())
  }

  test("stream-stream interval join: purchases x preceding clicks == batch") {
    val got = runToMemory(
      EventStreams.purchaseClickJoin(EventStreams.readEventStream(spark, dir)),
      "ssjoin", "append")
    val p = batchEvents.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val c = batchEvents.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val want = p.join(c, col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select("user_id", "purchase_id", "click_id")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stream-static broadcast join enriches events with a dimension") {
    val dim = spark.range(0, 200).selectExpr("id AS user_id",
      "concat('tier_', CAST(id % 3 AS STRING)) AS tier")
    val joined = EventStreams.readEventStream(spark, dir)
      .join(broadcast(dim), Seq("user_id"), "left_outer")
      .groupBy("tier").count()
    val got = runToMemory(joined, "enriched", "complete")
      .as[(String, Long)].collect().toMap
    val want = batchEvents.join(broadcast(dim), Seq("user_id"), "left_outer")
      .groupBy("tier").count().as[(String, Long)].collect().toMap
    assert(got == want)
    assert(got.values.sum == batchEvents.count())
  }

  test("streaming incremental dedup: per-micro-batch probe == batch operator") {
    import graft.operators.Dedup
    import graft.streaming.CurationStreams

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast", "en", "s0", 60L),
      (2L, "completely different content about spark query engines and shuffles", "en", "s0", 60L),
      (3L, "a third corpus document with its own very distinct token stream", "en", "s0", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = Seq(
      (101L, "the quick brown fox jumps over the lazy dog and runs away quickly", "en", "s1", 60L),
      (102L, "a third corpus document with its own very distinct token stream", "en", "s1", 60L),
      (103L, "brand new material sharing nothing with anything ingested before", "en", "s1", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val tmp = java.nio.file.Files.createTempDirectory("stream_docs").toString
    arrivals.coalesce(1).write.parquet(s"$tmp/in")

    // Production shape: the corpus signature artifact is prebuilt; no
    // trigger re-signs the corpus.
    val bandTable = Dedup.minhashBandTable(corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = CurationStreams.incrementalDedupStream(
      CurationStreams.readDocumentStream(spark, s"$tmp/in", glob = "*.parquet"),
      corpus, "doc_id", "text", n = 3, k = 32, bands = 16, threshold = 0.3,
      corpusBands = Some(bandTable)) { matches =>
      got ++= matches.select("batch_id", "corpus_id", "jaccard")
        .as[(Long, Long, Double)].collect()
    }
    q.processAllAvailable()
    q.stop()

    val expected = Dedup.incrementalMinhash(arrivals, corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3)
      .select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(expected.nonEmpty, "fixture must produce matches")
    assert(got.sorted == expected.toSeq.sorted,
      s"stream got ${got.toSeq} expected ${expected.toSeq}")
  }

  test("folding dedup stream: trigger 2 probes against trigger 1's docs") {
    import graft.operators.Dedup
    import graft.streaming.CurationStreams

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast", "en", "s0", 60L),
      (2L, "completely different content about spark query engines and shuffles", "en", "s0", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // Trigger 1's doc shares nothing with the corpus; trigger 2's doc is a
    // near-dup of TRIGGER 1's — only the folded artifact can catch it.
    val batch1 = Seq(
      (101L, "a freshly ingested document with its own distinct token stream", "en", "s1", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch2 = Seq(
      (201L, "a freshly ingested document with its own distinct word stream", "en", "s1", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val tmp = java.nio.file.Files.createTempDirectory("fold_docs").toString
    batch1.coalesce(1).write.parquet(s"$tmp/in")
    // Distinct, later mtime so the file source orders batch2 second.
    Thread.sleep(1100)
    batch2.coalesce(1).write.mode("append").parquet(s"$tmp/in")

    val stream = spark.readStream
      .schema(CurationStreams.DocumentSchema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$tmp/in")

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = CurationStreams.incrementalDedupStreamFolding(
      stream, corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3) { matches =>
      got ++= matches.select("batch_id", "corpus_id", "jaccard")
        .as[(Long, Long, Double)].collect()
    }
    q.processAllAvailable()
    q.stop()

    // Expected: the non-folding stream sees nothing (101 and 201 both
    // novel vs the static corpus); folding yields exactly (201, 101).
    val expected = Dedup.incrementalMinhash(batch2,
      corpus.unionByName(batch1).select("doc_id", "text"),
      "doc_id", "text", n = 3, k = 32, bands = 16, threshold = 0.3)
      .select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(expected.exists(p => p._1 == 201L && p._2 == 101L),
      s"fixture must produce the cross-trigger pair: $expected")
    assert(got.sorted == expected.sorted,
      s"folding stream got ${got.toSeq}, want $expected")

    // Sidecar-carrying variant (bit-exact append parity): same matches.
    val (bands0, counts0) = Dedup.minhashBandTableWithCounts(corpus,
      "doc_id", "text", n = 3, k = 32, bands = 16)
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val stream2 = spark.readStream
      .schema(CurationStreams.DocumentSchema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$tmp/in")
    val q2 = CurationStreams.incrementalDedupStreamFolding(
      stream2, corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3,
      corpusBands = Some(bands0), corpusBandCounts = Some(counts0)) { m =>
      got2 ++= m.select("batch_id", "corpus_id", "jaccard")
        .as[(Long, Long, Double)].collect()
    }
    q2.processAllAvailable()
    q2.stop()
    assert(got2.sorted == expected.sorted,
      s"sidecar-carrying fold got ${got2.toSeq}, want $expected")
  }

  // Shared fixtures for the durable-stream tests: trigger 1's doc shares
  // nothing with the corpus; trigger 2's doc is a near-dup of TRIGGER 1's.
  private lazy val durCorpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast", "en", "s0", 60L),
    (2L, "completely different content about spark query engines and shuffles", "en", "s0", 60L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")
  private lazy val durBatch1 = Seq(
    (101L, "a freshly ingested document with its own distinct token stream", "en", "s1", 60L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")
  private lazy val durBatch2 = Seq(
    (201L, "a freshly ingested document with its own distinct word stream", "en", "s1", 60L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def durStream(in: String) = spark.readStream
    .schema(graft.streaming.CurationStreams.DocumentSchema)
    .option("maxFilesPerTrigger", 1)
    .option("latestFirst", "false")
    .parquet(in)

  private def runDurable(in: String, state: String,
      got: scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]): Unit = {
    val q = graft.streaming.CurationStreams.incrementalDedupStreamDurable(
      durStream(in), durCorpus, "doc_id", "text", state,
      n = 3, k = 32, bands = 16, threshold = 0.3) { m =>
      got ++= m.select("batch_id", "corpus_id", "jaccard")
        .as[(Long, Long, Double)].collect()
    }
    q.processAllAvailable()
    q.stop()
    // stop() signals; wait for full termination so the next incarnation
    // can take over the checkpoint dir (Spark guards concurrent use).
    q.awaitTermination(30000)
  }

  test("folding stream == per-trigger batch oracle over randomized trigger splits") {
    import graft.operators.Dedup
    import graft.streaming.CurationStreams
    // 3 near-dup families (long shared backbone, one variant token) + 2
    // singletons, randomly partitioned into triggers: the stream's output
    // must equal, trigger by trigger, the batch operator run against
    // corpus ∪ everything-that-arrived-earlier.
    val families = for { f <- 0 until 3; v <- 0 until 3 } yield
      ((100 + f * 10 + v).toLong,
        s"family $f shared backbone tokens alpha$f beta$f gamma$f delta$f epsilon$f zeta$f variant$v")
    val singles = Seq(
      (900L, "totally standalone text one with nothing shared at all here"),
      (901L, "another disjoint document speaking of entirely different things"))
    val allDocs = (families ++ singles).toList
    val corpus = Seq(
      (1L, "family 0 shared backbone tokens alpha0 beta0 gamma0 delta0 epsilon0 zeta0 corpusvariant"),
      (2L, "background corpus document with miscellaneous unrelated content"))
      .toDF("doc_id", "text")

    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val triggers = rnd.shuffle(allDocs).grouped(4).toList
      val tmp = java.nio.file.Files.createTempDirectory(s"foldprop$seed").toString
      triggers.zipWithIndex.foreach { case (t, i) =>
        if (i > 0) Thread.sleep(1100) // distinct mtimes → deterministic order
        t.toDF("doc_id", "text")
          .withColumn("lang", lit("en")).withColumn("source", lit("s"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .coalesce(1).write.mode("append").parquet(s"$tmp/in")
      }
      val stream = spark.readStream
        .schema(CurationStreams.DocumentSchema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(s"$tmp/in")
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val q = CurationStreams.incrementalDedupStreamFolding(
        stream, corpus, "doc_id", "text",
        n = 3, k = 32, bands = 16, threshold = 0.3) { m =>
        got ++= m.select("batch_id", "corpus_id", "jaccard")
          .as[(Long, Long, Double)].collect()
      }
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(30000)

      val expected = triggers.zipWithIndex.flatMap { case (t, i) =>
        val corpusNow = triggers.take(i).flatten
          .foldLeft(corpus.select("doc_id", "text")) { (acc, d) =>
            acc.unionByName(Seq(d).toDF("doc_id", "text"))
          }
        Dedup.incrementalMinhash(t.toDF("doc_id", "text"), corpusNow,
          "doc_id", "text", n = 3, k = 32, bands = 16, threshold = 0.3)
          .select("batch_id", "corpus_id", "jaccard")
          .as[(Long, Long, Double)].collect()
      }
      assert(expected.nonEmpty, s"seed $seed must produce matches")
      assert(got.sorted == expected.sorted,
        s"seed $seed: stream ${got.sorted} != batch ${expected.sorted}")
      spark.catalog.clearCache()
    }
  }

  test("durable folding stream == batch oracle across randomized restart points") {
    import graft.operators.Dedup
    import graft.streaming.CurationStreams
    // The folding property test's fixture, but the stream is KILLED at a
    // RANDOM trigger boundary and a second incarnation finishes from
    // stateDir: output across both incarnations must equal the
    // per-trigger batch oracle wherever the cut lands (VERDICT r5 #7 —
    // the prior durability specs only ever killed after trigger 1).
    val families = for { f <- 0 until 3; v <- 0 until 3 } yield
      ((100 + f * 10 + v).toLong,
        s"family $f shared backbone tokens alpha$f beta$f gamma$f delta$f epsilon$f zeta$f variant$v")
    val singles = Seq(
      (900L, "totally standalone text one with nothing shared at all here"),
      (901L, "another disjoint document speaking of entirely different things"))
    val allDocs = (families ++ singles).toList
    val corpus = Seq(
      (1L, "family 0 shared backbone tokens alpha0 beta0 gamma0 delta0 epsilon0 zeta0 corpusvariant"),
      (2L, "background corpus document with miscellaneous unrelated content"))
      .toDF("doc_id", "text")

    for (seed <- Seq(11, 37)) {
      val rnd = new scala.util.Random(seed)
      val triggers = rnd.shuffle(allDocs).grouped(4).toList
      val cut = 1 + rnd.nextInt(triggers.size - 1)
      val tmp = java.nio.file.Files.createTempDirectory(s"durprop$seed").toString
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      def writeTriggers(ts: Seq[List[(Long, String)]], firstSleep: Boolean): Unit =
        ts.zipWithIndex.foreach { case (t, i) =>
          if (i > 0 || firstSleep) Thread.sleep(1100) // distinct mtimes
          t.toDF("doc_id", "text")
            .withColumn("lang", lit("en")).withColumn("source", lit("s"))
            .withColumn("n_chars", length(col("text")).cast("long"))
            .coalesce(1).write.mode("append").parquet(s"$tmp/in")
        }
      def incarnation(): Unit = {
        val q = CurationStreams.incrementalDedupStreamDurable(
          durStream(s"$tmp/in"), corpus, "doc_id", "text", s"$tmp/state",
          n = 3, k = 32, bands = 16, threshold = 0.3) { m =>
          got ++= m.select("batch_id", "corpus_id", "jaccard")
            .as[(Long, Long, Double)].collect()
        }
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30000)
      }
      writeTriggers(triggers.take(cut), firstSleep = false)
      incarnation()
      writeTriggers(triggers.drop(cut), firstSleep = true)
      incarnation()

      val expected = triggers.zipWithIndex.flatMap { case (t, i) =>
        val corpusNow = triggers.take(i).flatten
          .foldLeft(corpus.select("doc_id", "text")) { (acc, d) =>
            acc.unionByName(Seq(d).toDF("doc_id", "text"))
          }
        Dedup.incrementalMinhash(t.toDF("doc_id", "text"), corpusNow,
          "doc_id", "text", n = 3, k = 32, bands = 16, threshold = 0.3)
          .select("batch_id", "corpus_id", "jaccard")
          .as[(Long, Long, Double)].collect()
      }
      assert(expected.nonEmpty, s"seed $seed must produce matches")
      assert(got.sorted == expected.sorted,
        s"seed $seed cut $cut: stream ${got.sorted} != batch ${expected.sorted}")
      spark.catalog.clearCache()
    }
  }

  test("durable folding stream: restart from stateDir keeps earlier triggers probeable") {
    import graft.operators.Dedup
    val tmp = java.nio.file.Files.createTempDirectory("durable_fold").toString
    val state = s"$tmp/state"
    durBatch1.coalesce(1).write.parquet(s"$tmp/in")

    // Incarnation 1 processes batch1 (novel vs corpus: no matches), then
    // the query is STOPPED — simulating shutdown.
    val got1 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    runDurable(s"$tmp/in", state, got1)
    assert(got1.isEmpty, s"batch1 is novel vs the corpus, got $got1")
    for (d <- Seq(s"$state/bands/corpus", s"$state/bands/batch=0", s"$state/docs/batch=0"))
      assert(new java.io.File(s"$d/_SUCCESS").exists, s"missing durable state: $d")

    // Incarnation 2: fresh query, same stateDir. The checkpoint skips
    // batch1's file; batch2 must still match TRIGGER 1's doc — possible
    // only if the folded artifact (and batch1's text) survived the restart.
    durBatch2.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    runDurable(s"$tmp/in", state, got2)
    val expected = Dedup.incrementalMinhash(durBatch2,
      durCorpus.unionByName(durBatch1).select("doc_id", "text"),
      "doc_id", "text", n = 3, k = 32, bands = 16, threshold = 0.3)
      .select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(expected.exists(p => p._1 == 201L && p._2 == 101L),
      s"fixture must produce the cross-restart pair: $expected")
    assert(got2.sorted == expected.sorted,
      s"restarted stream got ${got2.toSeq}, want $expected")

    // Append == rebuild parity ACROSS the restart: the durable band log
    // reconstructs exactly the artifact+sidecar a from-scratch build over
    // corpus ∪ batch1 ∪ batch2 produces.
    val all = durCorpus.unionByName(durBatch1).unionByName(durBatch2)
    val (ra, rc) = Dedup.minhashBandTableWithCounts(all, "doc_id", "text",
      n = 3, k = 32, bands = 16)
    val (la, lc) = Dedup.artifactFromBandLog(spark.read.parquet(
      s"$state/bands/corpus", s"$state/bands/batch=0", s"$state/bands/batch=1"))
    assert(la.exceptAll(ra).isEmpty && ra.exceptAll(la).isEmpty,
      "log-derived artifact != rebuild artifact")
    assert(lc.exceptAll(rc).isEmpty && rc.exceptAll(lc).isEmpty,
      "log-derived sidecar != rebuild sidecar")
    spark.catalog.clearCache()
  }

  test("durable folding stream: probe plan size is O(1) in trigger count") {
    // VERDICT r4 #1: the old unionByName carry added one scan leaf per
    // folded batch, so trigger N's probe plan held N leaves. The docs-log
    // partitioned read must keep the leaf count CONSTANT from the first
    // fold onward, across ~20 triggers.
    val tmp = java.nio.file.Files.createTempDirectory("durable_plan").toString
    val nTriggers = 20
    for (i <- 0 until nTriggers)
      Seq(((1000 + i).toLong,
        s"unique document number $i with tokens t${i}a t${i}b t${i}c t${i}d",
        "en", "s1", 60L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val leafCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = graft.streaming.CurationStreams.incrementalDedupStreamDurable(
      durStream(s"$tmp/in"), durCorpus, "doc_id", "text", s"$tmp/state",
      n = 3, k = 32, bands = 16, threshold = 0.3) { m =>
      leafCounts += m.queryExecution.analyzed.collectLeaves().size
      m.count() // consume so the trigger's probe actually runs
      ()
    }
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30000)
    assert(leafCounts.size == nTriggers, s"expected $nTriggers triggers, got $leafCounts")
    // Trigger 1 probes the corpus alone (no docs log yet); every later
    // trigger adds exactly the ONE partitioned docs scan, regardless of
    // how many batches have folded.
    val after = leafCounts.drop(1).distinct
    assert(after.size == 1,
      s"probe plan leaf count must be constant after the first fold: $leafCounts")
    assert(after.head > leafCounts.head,
      s"later triggers must include the docs-log scan: $leafCounts")
    spark.catalog.clearCache()
  }

  test("durable folding stream: replayed batch neither self-matches nor double-folds") {
    import graft.operators.Dedup
    val tmp = java.nio.file.Files.createTempDirectory("durable_replay").toString
    val state = s"$tmp/state"
    durBatch1.coalesce(1).write.parquet(s"$tmp/in")
    val got1 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    runDurable(s"$tmp/in", state, got1)
    assert(got1.isEmpty)

    // Simulate a crash AFTER the fold landed durably but BEFORE the offset
    // commit: removing the commit marker makes the restarted stream replay
    // batch 0 against an artifact that already contains it.
    val commit = new java.io.File(s"$state/checkpoint/commits/0")
    assert(commit.exists, "expected a commit marker for batch 0")
    assert(commit.delete())
    // The local-FS checkpoint manager writes a CRC sidecar; leaving it
    // behind makes the replayed batch's re-commit rename fail.
    new java.io.File(s"$state/checkpoint/commits/.0.crc").delete()
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    runDurable(s"$tmp/in", state, got2)
    assert(got2.isEmpty,
      s"replayed batch must not match its own stored copy: ${got2.toSeq}")

    // No double-fold: the log still reconstructs exactly the from-scratch
    // build over corpus ∪ batch1 (duplicated band rows would inflate the
    // sidecar counts).
    val (ra, rc) = Dedup.minhashBandTableWithCounts(
      durCorpus.unionByName(durBatch1), "doc_id", "text",
      n = 3, k = 32, bands = 16)
    val (la, lc) = Dedup.artifactFromBandLog(spark.read.parquet(
      s"$state/bands/corpus", s"$state/bands/batch=0"))
    assert(la.exceptAll(ra).isEmpty && ra.exceptAll(la).isEmpty,
      "replay corrupted the band log")
    assert(lc.exceptAll(rc).isEmpty && rc.exceptAll(lc).isEmpty,
      "replay inflated the sidecar counts")
    spark.catalog.clearCache()
  }

  test("flatMapGroupsWithState running totals match batch aggregation") {
    val got = runToMemory(
      EventStreams.runningUserTotals(spark,
        EventStreams.readEventStream(spark, dir)).toDF(),
      "running", "append")
    // one microbatch → one emission per user, already the final totals
    val gotMap = got.groupBy("user_id").agg(max("n_events").as("n"))
      .as[(Long, Long)].collect().toMap
    val wantMap = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(gotMap == wantMap)
  }
}
