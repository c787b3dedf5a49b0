package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Empirical scaling smoke (diagnostic main, not part of the driver
 * contract): run the heaviest curation operators on m× multiples of the
 * sf0.1 documents table and report wall times, so the "linear in corpus
 * size" claims in docs/SCALE.md carry measured single-node evidence, not
 * just plan reasoning.
 *
 * The m× corpus is m copies of the sf0.1 documents with distinct ids and
 * a per-copy token suffix: texts are DISTINCT (the exact-dedup
 * pre-collapse cannot shortcut the work) but each original forms a
 * high-jaccard near-dup cluster of size m — a deliberately adversarial
 * shape for the LSH path (every cluster survives banding into the
 * verify join, pairs per cluster grow as m²/2; the bucket caps keep that
 * bounded per bucket).
 *
 * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *        sbt "runMain graft.tools.ScaleSmoke" [multiples...]
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    // Harness pinning mode, exactly as Bench and Verify set it: pins
    // become eager localCheckpoints, truncating operator-internal
    // lineage. Without it the deep beam walks explode — each round's
    // plan references the previous beam twice, so under plain persist
    // the plan TREE doubles per round (2^depth); at the provisioned
    // depth-12 walk that is a 248 MB plan string and a driver OOM
    // (observed round 13). Total task work is unchanged and the jobs
    // run inside the timed body, so rows stay honestly charged.
    System.setProperty("graft.pin.checkpoint", "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val multiples =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 2, 5, 10)
    // Optional op-name regex (SPARK_GRAFT_SMOKE_OPS): rerun one section —
    // e.g. "overflow" for the salted-cap observability sweep — without
    // paying the whole battery per multiple.
    val opFilter = sys.env.get("SPARK_GRAFT_SMOKE_OPS").map(_.r)
    def wanted(op: String): Boolean =
      opFilter.forall(_.findFirstIn(op).isDefined)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val base = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang")

    def corpus(m: Int): DataFrame =
      (0 until m).map { i =>
        base.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" copymarker$i")).as("text"),
          col("lang"))
      }.reduce(_ unionByName _)

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    println("multiple,docs,op,seconds")
    for (m <- multiples) {
      // Materialize the input once so generation cost is outside the
      // measured operator (checkpoint = what a real on-disk corpus is).
      val df = corpus(m).localCheckpoint(true)
      val n = df.count()
      // Each op is timed cold: one build, one full materialization through
      // the noop sink, internal caches released afterwards.
      def runOnce(op: String)(body: => DataFrame): Unit = if (wanted(op)) {
        val (sec, caches) = graft.operators.CacheScope.tracking {
          time(body.write.format("noop").mode("overwrite").save())._1
        }
        caches.release()
        println(s"$m,$n,$op,${"%.2f".format(sec)}")
      }
      runOnce("exact_dedup") {
        graft.operators.Dedup.exact(df, "doc_id", "text")
      }
      runOnce("minhash_neardup") {
        graft.operators.Dedup.minhashDedup(df, "doc_id", "text",
          n = 3, k = 32, bands = 8, threshold = 0.5)
      }
      runOnce("duplicate_spans") {
        graft.operators.SpanDedup.duplicateSpans(df, "doc_id", "text",
          window = 10, minDf = 2)
      }
      runOnce("ngram_repetition") {
        graft.operators.Curation.ngramRepetition(df, "doc_id", "text")
      }
      runOnce("segment_dedup") {
        graft.operators.Curation.segmentDedup(df, "doc_id", "text",
          maxDf = 2, segWords = 8)
      }
      runOnce("curate_full") {
        graft.operators.Curation.curate(df, "doc_id", "text", "lang",
          graft.operators.Curation.CurationConfig(nShards = 32))
      }
      // Round-4 additions. Salted overflow at a deliberately small cap:
      // every size-m near-dup cluster's band buckets overflow at m > 5,
      // so the sub-bucketing path is actually exercised as m grows.
      runOnce("minhash_salted_cap5") {
        graft.operators.Dedup.minhashDedup(df, "doc_id", "text",
          n = 3, k = 32, bands = 8, threshold = 0.5, maxBucket = 5,
          overflow = graft.operators.Dedup.Overflow.Salt)
      }
      // Cap-policy observability at the same operating point (VERDICT r5
      // #6): the bucketOverflowStats deployments would alert on, plus the
      // measured Drop-vs-Salt recall tradeoff — pairs the cap silently
      // drops vs pairs the salted sub-buckets recover. One CSV line:
      // overflow,m,docs,n_buckets,n_buckets_over,n_rows_over,max_bucket,
      // pairs_drop,pairs_salt,recovered_frac.
      if (wanted("overflow")) {
        val ((stats, pairsDrop, pairsSalt), caches) =
          graft.operators.CacheScope.tracking {
            val banded = graft.operators.Dedup.bandRowsUncapped(
              df, "doc_id", "text", n = 3, k = 32, bands = 8)
            val st = graft.operators.Dedup.bucketOverflowStats(
              banded, Seq("band", "bh"), 5).collect().head
            val pd = graft.operators.Dedup.minhashDedup(df, "doc_id",
              "text", n = 3, k = 32, bands = 8, threshold = 0.5,
              maxBucket = 5,
              overflow = graft.operators.Dedup.Overflow.Drop).count()
            val ps = graft.operators.Dedup.minhashDedup(df, "doc_id",
              "text", n = 3, k = 32, bands = 8, threshold = 0.5,
              maxBucket = 5,
              overflow = graft.operators.Dedup.Overflow.Salt).count()
            (st, pd, ps)
          }
        caches.release()
        val rec =
          if (pairsSalt == 0L) 0.0
          else (pairsSalt - pairsDrop).toDouble / pairsSalt
        println(s"overflow,$m,$n,${stats.getLong(0)},${stats.getLong(1)}," +
          s"${stats.getLong(2)},${stats.getLong(3)},$pairsDrop,$pairsSalt," +
          s"${"%.3f".format(rec)}")
      }
      // Budgeted selection: fixed 100k-token budget — the histogram +
      // boundary-bin plan should hold near-flat as the corpus grows.
      runOnce("budget_selection") {
        val toks = df.select(col("doc_id").as("id"),
          explode(split(col("text"), "\\s+")).as("tok"))
          .filter(col("tok") =!= "")
        val scored = toks.groupBy(col("id"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("id"))
          .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("nd"))
          .select(col("id"),
            round(col("nd").cast("double") / col("n_tokens"), 6).as("score"),
            col("n_tokens"))
        graft.operators.Curation.selectByTokenBudget(scored, 100000L)
      }
      // Round-5 additions: the three narrow/one-shuffle curation scorers —
      // all should track the input size near-linearly with no join blowup.
      runOnce("gopher_rules") {
        graft.operators.TextAnalysis.gopherRules(df, "doc_id", "text")
      }
      // Round-7 addition (VERDICT r6 #5): corpus-level line dedup — the
      // m× corpus is adversarial here too (every original line recurs in
      // all m copies... except the copymarker suffix lands on the LAST
      // line only, so all other lines form corpus-wide duplicate groups of
      // size m). Linear = the min(struct) agg partial-combines; a
      // reducer-flooding formulation would go superlinear in m.
      runOnce("line_dedup") {
        graft.operators.Dedup.corpusLineDedup(df, "doc_id", "text")
      }
      // Round-7: deflate quality signal — map-only, should be linear in
      // corpus bytes with zero shuffle.
      runOnce("compression_ratio") {
        graft.operators.TextAnalysis.compressionRatio(df, "doc_id", "text")
      }
      // Round-7: the flagship coref pipeline (q40's shape) on the m×
      // corpus — synthetic PERSON mentions from token bigrams, within-doc
      // then across-doc passes. The across-doc stage is ONE range shuffle
      // + O(partitions) boundary stitch (SortedSegments), so the whole
      // pipeline should track mention count near-linearly.
      runOnce("coref_pipeline") {
        import org.apache.spark.sql.expressions.Window
        val toks = df.select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .filter(col("tok") =!= "")
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val mentions = toks
          .withColumn("next", lead(col("tok"), 1).over(w))
          .filter(col("next").isNotNull)
          .select(col("doc_id"),
            xxhash64(col("doc_id"), col("pos")).as("mention_id"),
            lit("PERSON").as("mention_type"),
            concat_ws(" ", col("tok"), col("next")).as("text"))
        val within = graft.operators.Coref.withinDoc(mentions,
          graft.operators.Coref.WithinDocParams.person)
        val across = graft.operators.Coref.acrossDoc(within.entities,
          graft.operators.Coref.AcrossDocParams.person)
        across.entities
      }
      runOnce("dsir_weights") {
        graft.operators.Curation.dsirWeights(df, "doc_id", "text",
          isTarget = col("lang") === "en")
      }
      // Round-7 (continued): BM25 over the m× corpus — the corpus-sized
      // work is one doclen agg; scoring joins touch only the query
      // terms' postings, so growth should track the doclen agg.
      runOnce("bm25") {
        graft.sinks.SearchIndex.bm25(
          df.select(col("doc_id"),
            explode(split(col("text"), " ")).as("tok"))
            .filter(col("tok") =!= ""),
          Seq("query", "window", "stream"))
      }
      // Round-12 (VERDICT r11 #1): posting-list artifact build under a
      // planted stop word. Every doc in the m× corpus contains
      // "plantedstopword", so its df == corpus size — the single-row
      // collect_list regime the doc-shard key eliminates. Timing rows
      // price the sharded build (32 shards) vs the unsharded one; the
      // index_row_bound readout proves the FLAT per-row memory claim:
      // max postings-per-row grows with df unsharded, stays ≈ df/32
      // sharded.
      if (wanted("index_build") || wanted("index_row_bound")) {
        val planted = df.select(col("doc_id"),
          concat(lit("plantedstopword "), col("text")).as("text"))
          .localCheckpoint(true)
        runOnce("index_build_unsharded") {
          graft.sinks.SearchIndex.build(planted, "doc_id", "text")
        }
        runOnce("index_build_sharded32") {
          graft.sinks.SearchIndex.build(planted, "doc_id", "text",
            nDocShards = 32)
        }
        if (wanted("index_row_bound")) {
          val ((flatMax, shardMax), caches) =
            graft.operators.CacheScope.tracking {
              def maxRow(shards: Int): Long =
                graft.sinks.SearchIndex.build(planted, "doc_id", "text",
                    nDocShards = shards)
                  .filter(col("tok") === "plantedstopword")
                  .agg(max(size(col("postings")))).collect()(0).getInt(0)
              (maxRow(1), maxRow(32))
            }
          caches.release()
          println(s"$m,$n,index_row_bound,df=$n,max_row_unsharded=$flatMax," +
            s"max_row_sharded32=$shardMax")
        }
        graft.operators.CacheScope.unpinCheckpoint(planted)
      }
      // Round-7 (continued): broadcast-centroid k-means — per iteration
      // one map-side-combined groupBy; should be linear in rows with a
      // constant per-iteration driver cost.
      runOnce("kmeans_bins") {
        graft.operators.KMeans.fit1D(
          df.select(length(col("text")).cast("long").as("v")), "v",
          k = 4, iters = 3)
      }
      // Round-7 (continued): degree-ordered triangle counting on a
      // synthetic hash-derived random graph growing with m (n = 5000·m
      // nodes, avg degree 60). Wedge count grows ~linearly with n at
      // fixed degree, so wall time should too; a Σdeg² formulation
      // without orientation would not.
      runOnce("triangle_count") {
        val nNodes = 5000L * m
        val e = spark.range(nNodes * 30)
          .select(pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("src"),
            pmod(xxhash64(col("id"), lit(2)), lit(nNodes)).as("dst"))
        graft.operators.TriangleCount.perNode(e)
      }
      if (wanted("probe_filter")) {
        val emb = (0 until m).map { i =>
          graft.Tables.embeddings(spark, sfDir).select(
            (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding"))
        }.reduce(_ unionByName _).localCheckpoint(true)
        runOnce("probe_filter") {
          graft.operators.Similarity.linearProbeScore(emb, "vec_id",
            "embedding", graft.queries.LlmQueries.ProbeWeights)
        }
        graft.operators.CacheScope.unpinCheckpoint(emb)
      }
      // Incremental probe at its production operating point: the corpus
      // artifact prebuilt OUTSIDE the timed region (both sides still grow
      // with m here; production holds the batch fixed).
      if (wanted("incremental_probe")) {
        val corpusSide = df.filter(pmod(col("doc_id"), lit(5)) =!= 4)
        val batchSide = df.filter(pmod(col("doc_id"), lit(5)) === 4)
        val art = graft.operators.Dedup.minhashBandTable(corpusSide,
          "doc_id", "text", n = 3, k = 32, bands = 8).localCheckpoint(true)
        runOnce("incremental_probe") {
          graft.operators.Dedup.incrementalMinhash(batchSide, corpusSide,
            "doc_id", "text", n = 3, k = 32, bands = 8, threshold = 0.5,
            corpusBands = Some(art))
        }
        graft.operators.CacheScope.unpinCheckpoint(art)
      }
      // Round-7 third pass: ingestion-state + statistics operators.
      // Changelog: the m× log keeps the KEY space fixed (20k keys), so
      // hot keys grow linearly with m — exactly the skew the
      // max(struct) agg must absorb without a reducer flood.
      runOnce("changelog_merge") {
        val log = df.select(pmod(col("doc_id"), lit(20000L)).as("k"),
          col("doc_id").as("ts"), col("doc_id").as("seq"),
          when(pmod(col("doc_id"), lit(10)) < 1, lit("del"))
            .otherwise(lit("put")).as("op"),
          col("lang").as("payload"))
        graft.operators.Changelog.latestState(log, Seq("k"),
          Seq("ts", "seq"), "op", "del")
      }
      runOnce("js_drift") {
        graft.operators.TextAnalysis.jsDrift(df, "lang", "text")
      }
      runOnce("hist_quantiles") {
        val v = df.select(length(col("text")).cast("long").as("v"))
        graft.operators.Sketches.histQuantiles(
          graft.operators.Sketches.histBuild(v, "v"), Seq(50, 99))
      }
      runOnce("cms_frequency") {
        val toks = df.select(explode(split(col("text"), "\\s+")).as("tok"))
        graft.operators.Sketches.cmsBuild(toks, "tok")
      }
      runOnce("weighted_sample") {
        graft.operators.Curation.weightedSample(
          df.withColumn("w", length(col("text")).cast("long")),
          "doc_id", "w", k = 100, salt = "smoke")
      }
      // Exact prefix-filtered Jaccard join on the adversarial m× corpus:
      // every original doc becomes an m-sized near-dup cluster (pairs
      // per cluster m²/2) — candidate growth is the quantity to watch.
      runOnce("prefix_join") {
        graft.operators.SetJoin.prefixJaccardJoin(df, "doc_id", "text",
          n = 3, num = 1, den = 2)
      }
      // PCA / k-center on hash-synthesized 64-dim embeddings (generated
      // OUTSIDE the timed region — a real corpus reads them from disk).
      if (wanted("pca_moments") || wanted("kcenter")) {
        val emb = df.select(col("doc_id").as("vec_id"),
          expr("""transform(sequence(1, 64), i ->
            CAST(CAST(pmod(conv(substring(md5(concat(
              CAST(doc_id AS STRING), '|', CAST(i AS STRING))), 1, 6),
              16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
            .as("embedding"))
          .localCheckpoint(true)
        runOnce("pca_moments") {
          graft.operators.Pca.momentsMicro(emb, "embedding", 64)
        }
        runOnce("kcenter_k6") {
          graft.operators.KCenter.select(emb, "vec_id", "embedding", k = 6)
        }
        graft.operators.CacheScope.unpinCheckpoint(emb)
      }
      // Round-7 eighth pass: history / diff / sequence / reachability /
      // interval operators (q137–q144).
      // SCD2 keeps the key space fixed like changelog_merge, so per-key
      // history length grows with m — the window's skew bound is the
      // hottest key's log, which this measures directly.
      runOnce("scd2_history") {
        val log = df.select(pmod(col("doc_id"), lit(20000L)).as("k"),
          col("doc_id").as("ts"), col("doc_id").as("seq"),
          when(pmod(col("doc_id"), lit(10)) < 1, lit("del"))
            .otherwise(lit("put")).as("op"),
          col("lang").as("payload"))
        graft.operators.Changelog.scd2History(log, Seq("k"),
          Seq("ts", "seq"), "op", "del")
      }
      // Snapshot diff ships only digests across the join; should track
      // key count linearly.
      runOnce("snapshot_diff") {
        val a = df.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(col("doc_id").as("k"), length(col("text")).as("len"),
            col("lang"))
        val b = df.filter(pmod(col("doc_id"), lit(5)) =!= 0)
          .select(col("doc_id").as("k"),
            (length(col("text")) + pmod(col("doc_id"), lit(3))).as("len"),
            col("lang"))
        graft.operators.TableDiff.rowDiff(a, b, Seq("k"))
      }
      // Distributed zipWithIndex: one range shuffle + O(P) driver
      // offsets; linear, no single-partition stage.
      runOnce("global_rownum") {
        graft.operators.ScaleOps.globalRowNumbers(
          df.select(col("doc_id"), length(col("text")).as("len")),
          Seq("doc_id"))
      }
      // Rolling distinct actives: fixed 2000 keys, hour horizon grows
      // with m — explode fan-out is bounded by key-buckets + islands·W.
      runOnce("rolling_actives") {
        val acts = df.select(pmod(col("doc_id"), lit(2000L)).as("u"),
          pmod(xxhash64(col("doc_id")), lit(720L * m)).as("h"))
        graft.operators.Intervals.rollingDistinctActives(acts, "u", "h",
          window = 24)
      }
      // Decay: one (key, period) groupBy — linear, map-side combined.
      runOnce("decayed_trends") {
        graft.operators.Decay.decayedTotals(
          df.select(col("lang"), (col("doc_id") * 1000L).as("ts_ns"),
            length(col("text")).cast("double").as("value")),
          Seq("lang"), "ts_ns", "value",
          refTsNs = 10000000000L, periodNs = 200000000L / math.max(m, 1))
      }
      // Survivorship: 3 source views per key, fixed 20k keys — the
      // per-field max(struct) aggs must absorb per-key row growth
      // map-side like changelog_merge.
      runOnce("golden_record") {
        val src = df.select(pmod(col("doc_id"), lit(20000L)).as("k"),
          pmod(col("doc_id"), lit(3)).cast("int").as("pri"),
          when(pmod(col("doc_id"), lit(4)) === 0, lit(null))
            .otherwise(col("lang")).as("f1"),
          when(pmod(col("doc_id"), lit(5)) === 0, lit(null))
            .otherwise(length(col("text")).cast("long")).as("f2"))
        graft.operators.Survivorship.goldenRecord(src, Seq("k"),
          Seq("pri"), Seq("f1", "f2"))
      }
      // Temporal lookup: union-tag window — skew bound is per-key
      // mutations+facts, measured under the fixed-key growth.
      runOnce("temporal_lookup") {
        val log = df.filter(pmod(col("doc_id"), lit(3)) =!= 0)
          .select(pmod(col("doc_id"), lit(20000L)).as("k"),
            col("doc_id").as("ts"), col("doc_id").as("seq"),
            when(pmod(col("doc_id"), lit(10)) < 1, lit("del"))
              .otherwise(lit("put")).as("op"),
            col("lang").as("payload"))
        val facts = df.filter(pmod(col("doc_id"), lit(3)) === 0)
          .select(pmod(col("doc_id"), lit(20000L)).as("k"),
            col("doc_id").as("ts"), col("doc_id").as("seq"))
        graft.operators.Changelog.temporalLookup(log, facts, Seq("k"),
          Seq("ts", "seq"), "op", "del")
      }
      // BFS on the same synthetic graph family as triangle_count (fixed
      // avg degree 20): frontier work tracks edges per hop ~linearly.
      runOnce("bfs_hops") {
        val nNodes = 5000L * m
        val e = spark.range(nNodes * 10)
          .select(pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("src"),
            pmod(xxhash64(col("id"), lit(2)), lit(nNodes)).as("dst"))
        graft.operators.Bfs.hopDistances(e,
          spark.range(5).select(col("id").as("node_id")), maxHops = 4)
      }
      // Round-8 (VERDICT r7 #3): the remaining graph-iteration family on
      // the same hash-derived random graph (n = 5000·m nodes, fixed avg
      // degree): per-round cost must grow ~linearly in edges — each
      // round is 1-2 map-side-combined edge-sized shuffles plus a
      // node-sized broadcast, so 10× nodes at fixed degree (10× edges)
      // should cost well under 10× wall on a single node (per-round
      // fixed costs amortize) and exactly ~10× shuffle on a cluster.
      def smokeGraph(avgDeg: Long): DataFrame = {
        val nNodes = 5000L * m
        spark.range(nNodes * avgDeg / 2)
          .select(pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("src"),
            pmod(xxhash64(col("id"), lit(2)), lit(nNodes)).as("dst"))
      }
      runOnce("pagerank") {
        graft.operators.PageRank.run(smokeGraph(20), iterations = 5)
      }
      runOnce("lpa_communities") {
        graft.operators.LabelPropagation.run(smokeGraph(20), iters = 3)
      }
      runOnce("kcore") {
        graft.operators.KCore.peel(smokeGraph(20), k = 12, rounds = 4)
      }
      runOnce("bellman_ford") {
        val e = smokeGraph(20)
          .withColumn("w", pmod(xxhash64(col("src"), col("dst")), lit(9)) + 1)
        graft.operators.Bfs.relaxDistances(e,
          spark.range(5).select(col("id").as("node_id")), rounds = 4)
      }
      // Round-10: motif pattern matching — the 3-term open-wedge pattern
      // (two equi-joins + one anti-join). At fixed average degree the
      // wedge frame is Σ in(b)·out(b) ≈ nodes·deg² — linear in m — and
      // every join is a plain shuffled/AQE-planned equi-join, so wall
      // should track edges near-linearly (no pattern-runtime overhead to
      // amortize; this IS just Catalyst joins).
      runOnce("motif_open_wedge") {
        graft.operators.Motifs.find(smokeGraph(20).distinct(),
          "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
          .groupBy(col("a")).agg(count(lit(1)).as("n_open"))
      }
      // Round-10: deterministic random walks — the frontier is exactly
      // |startNodes|·walksPerNode rows at EVERY step (it never grows),
      // each step one frontier×edges equi-join + a map-side-combined
      // min(struct) argmin, so wall should track nodes near-linearly at
      // fixed degree/length; the skip-gram self-join fan-out is bounded
      // by the window.
      runOnce("walk_corpus") {
        val e = smokeGraph(20).filter(col("src") =!= col("dst"))
        graft.operators.Walks.skipgramPairs(
          graft.operators.Walks.deterministicWalks(e, walksPerNode = 2,
            walkLength = 4, seed = "smoke"), window = 2)
      }
      // Round-10: k-truss peel — per round the oriented wedge frame is
      // the q103 bound (Σ C(oriented-deg, 2)), linear in nodes at fixed
      // degree, so the 3-round peel should track edges near-linearly.
      runOnce("ktruss") {
        graft.operators.KTruss.peel(smokeGraph(20), k = 4, rounds = 3)
      }
      // Round-11/12: temporal relay motifs (q226's shape). Two separate
      // growth axes, measured separately because their cost laws differ:
      //  - temporal_relay: CORPUS grows m× at fixed dimensions (nodes,
      //    month range). The interaction log aggregates to a
      //    (src, dst, month) frame bounded by nodes²·months regardless
      //    of m, so the motif term is CONSTANT and total wall should be
      //    the aggregation scan — near-flat after the linear pre-pass.
      //    This is the TPC-H/production case: more data per month, not
      //    more months.
      //  - temporal_relay_months: the month RANGE grows m× at fixed
      //    density. Round 12 band-keys the 2-hop join on
      //    (b, month DIV 2) via overlapJoin (VERDICT r11 #2), so the
      //    per-key intermediate is band-local and wall should now be
      //    ~linear in months; the *_unbanded row keeps the r11 shape
      //    (band filtered AFTER a b-only join, ~m² in per-node history)
      //    so the fix's effect is measured, not asserted.
      // Round-11: bucketed interval-overlap join (q228's operator). Two
      // axes, like temporal_relay: interval_overlap grows BOTH sides m×
      // over an m×-longer time range (per-bucket density FIXED), so the
      // per-bucket join mass is constant and total wall should track m
      // linearly; interval_overlap_hot plants both sides into ONE
      // bucket (the documented hot-bucket exposure) where the join mass
      // is |L|·|R| ∝ m² — the mitigation (narrow sides / salt the hot
      // key) lives upstream, this row just prices the failure mode the
      // scaladoc names.
      if (wanted("interval_overlap") || wanted("interval_overlap_hot")) {
        val bucket = 1000L
        runOnce("interval_overlap") {
          val span = 20000L * m // buckets in range: 20k·m
          val ls = spark.range(50000L * m).select(col("id").as("lid"),
            pmod(xxhash64(col("id"), lit(21)), lit(span * bucket)).as("ls"))
            .select(col("lid"), col("ls"),
              (col("ls") + pmod(xxhash64(col("lid"), lit(22)), lit(3000L)))
                .as("le"))
          val rs = spark.range(50000L * m).select(col("id").as("rid"),
            pmod(xxhash64(col("id"), lit(23)), lit(span * bucket)).as("rs"))
            .select(col("rid"), col("rs"),
              (col("rs") + pmod(xxhash64(col("rid"), lit(24)), lit(3000L)))
                .as("re"))
          graft.operators.IntervalJoin.overlapJoin(ls, rs,
              "ls", "le", "rs", "re", bucket, maxSpan = 16)
            .groupBy(col("lid")).agg(count(lit(1)).as("n"))
        }
        // At broadcastable sizes a hot bucket is HARMLESS (the planner
        // broadcasts the small side and the probe side keeps its
        // parallelism — measured: flat). The real exposure is a hot
        // bucket under a SHUFFLE join, where one reducer owns the key;
        // force that plan (broadcast off) to price it, and let AQE's
        // skew-join handling do whatever it does — the row reports the
        // net effect either way.
        if (m <= 5) {
          val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          // try/finally: a throw inside the forced-shuffle row must not
          // leave broadcasts disabled for every later smoke row (ADVICE
          // r11 — that would silently skew all downstream measurements).
          try {
          runOnce("interval_overlap_hot") {
            val ls = spark.range(2000L * m).select(col("id").as("lid"),
              pmod(xxhash64(col("id"), lit(25)), lit(500L)).as("ls"))
              .select(col("lid"), col("ls"), (col("ls") + lit(100L)).as("le"))
            val rs = spark.range(2000L * m).select(col("id").as("rid"),
              pmod(xxhash64(col("id"), lit(26)), lit(500L)).as("rs"))
              .select(col("rid"), col("rs"), (col("rs") + lit(100L)).as("re"))
            graft.operators.IntervalJoin.overlapJoin(ls, rs,
                "ls", "le", "rs", "re", bucket, maxSpan = 16)
              .groupBy(col("lid")).agg(count(lit(1)).as("n"))
          }
          // Round-12 (VERDICT r11 #5): the same forced-shuffle hot bucket
          // with saltHot = 8 — the replicate/route mitigation as a
          // parameter. The hot cell's |L|·|R| pair mass spreads over 8
          // reducers for 8× left fan-out; the row prices the net effect
          // next to the unsalted m² row above.
          runOnce("interval_overlap_hot_salted") {
            val ls = spark.range(2000L * m).select(col("id").as("lid"),
              pmod(xxhash64(col("id"), lit(25)), lit(500L)).as("ls"))
              .select(col("lid"), col("ls"), (col("ls") + lit(100L)).as("le"))
            val rs = spark.range(2000L * m).select(col("id").as("rid"),
              pmod(xxhash64(col("id"), lit(26)), lit(500L)).as("rs"))
              .select(col("rid"), col("rs"), (col("rs") + lit(100L)).as("re"))
            graft.operators.IntervalJoin.overlapJoin(ls, rs,
                "ls", "le", "rs", "re", bucket, maxSpan = 16, saltHot = 8)
              .groupBy(col("lid")).agg(count(lit(1)).as("n"))
          }
          // Round-13 (VERDICT r12 #6): the same hot bucket with
          // autoSalt — the probe must DETECT the skew and pick S by
          // itself; the row prices the probed variant next to the
          // manual salt above (cost = probe aggregates + the chosen
          // replicate factor; the single-reducer m² regime gone without
          // the caller naming S).
          runOnce("interval_overlap_hot_autosalted") {
            val ls = spark.range(2000L * m).select(col("id").as("lid"),
              pmod(xxhash64(col("id"), lit(25)), lit(500L)).as("ls"))
              .select(col("lid"), col("ls"), (col("ls") + lit(100L)).as("le"))
            val rs = spark.range(2000L * m).select(col("id").as("rid"),
              pmod(xxhash64(col("id"), lit(26)), lit(500L)).as("rs"))
              .select(col("rid"), col("rs"), (col("rs") + lit(100L)).as("re"))
            graft.operators.IntervalJoin.overlapJoin(ls, rs,
                "ls", "le", "rs", "re", bucket, maxSpan = 16,
                autoSalt = true)
              .groupBy(col("lid")).agg(count(lit(1)).as("n"))
          }
          } finally {
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
          }
        }
      }
      if (wanted("temporal_relay") || wanted("temporal_relay_months")) {
        val nodes = 30L
        // The UNBANDED shape (keyed on b alone, band filtered AFTER the
        // join — the r11 q226 plan, kept as the comparison row): pays
        // |per-node history|² in the b-keyed intermediate.
        val relayUnbanded: DataFrame => DataFrame = e =>
          graft.operators.Motifs.find(e, "(a)-[e1]->(b); (b)-[e2]->(c)")
            .filter(col("a") =!= col("c") &&
              col("e1.month") < col("e2.month") &&
              col("e2.month") <= col("e1.month") + lit(2L))
            .groupBy(col("b"))
            .agg(count(lit(1)).as("n_relays"),
              sum(least(col("e1.w"), col("e2.w"))).as("cap"))
        // The BANDED shape (the round-12 q226 plan): join keyed on
        // (b, month-band) through overlapJoin — band-local intermediate.
        val relayBanded: DataFrame => DataFrame = e => {
          val hop1 = e.select(col("src").as("a"), col("dst").as("b"),
            (col("month") + 1L).as("lo1"), (col("month") + 2L).as("hi1"),
            col("w").as("w1"))
          val hop2 = e.select(col("src").as("b"), col("dst").as("c"),
            col("month").as("lo2"), col("month").as("hi2"),
            col("w").as("w2"))
          graft.operators.IntervalJoin.overlapJoin(hop1, hop2,
              "lo1", "hi1", "lo2", "hi2", bucket = 2L, maxSpan = 2,
              keys = Seq("b"))
            .filter(col("a") =!= col("c"))
            .groupBy(col("b"))
            .agg(count(lit(1)).as("n_relays"),
              sum(least(col("w1"), col("w2"))).as("cap"))
        }
        def monthLog(months: Long): DataFrame =
          spark.range(50000L * m).select(
            pmod(xxhash64(col("id"), lit(11)), lit(nodes)).as("src"),
            pmod(xxhash64(col("id"), lit(12)), lit(nodes)).as("dst"),
            pmod(xxhash64(col("id"), lit(13)), lit(months)).as("month"))
            .filter(col("src") =!= col("dst"))
            .groupBy(col("src"), col("dst"), col("month"))
            .agg(count(lit(1)).as("w"))
        runOnce("temporal_relay") {
          relayBanded(monthLog(12L))
        }
        if (m <= 10) runOnce("temporal_relay_months") {
          relayBanded(monthLog(12L * m))
        }
        if (m <= 10) runOnce("temporal_relay_months_unbanded") {
          relayUnbanded(monthLog(12L * m))
        }
      }
      // Round-10: butterflies — wedge frame is Σ_r C(deg r, 2) on the
      // RIGHT side; at fixed right degree (100 here) that is linear in
      // m (≈ 2.5M·m wedge rows), isolating the linear regime from
      // q223's SF sweep where supplier degree itself grows with scale
      // (the documented hub exposure — thin/cap upstream).
      runOnce("butterflies") {
        val nLeft = 5000L * m
        val nRight = 500L * m
        val e = spark.range(nLeft * 10)
          .select(pmod(xxhash64(col("id"), lit(1)), lit(nLeft)).as("src"),
            (pmod(xxhash64(col("id"), lit(2)), lit(nRight))
              + lit(2000000000L)).as("dst"))
        graft.operators.Butterflies.pairCounts(e)
      }
      // Round-11 (VERDICT r10 #5): butterflies at ADVERSARIAL right
      // degree — the q126-style planted-worst-case discipline. One hub
      // right-node connected to 40% of the left side is added to the
      // same bipartite graph: its wedge contribution alone is
      // C(0.4·nLeft, 2) ≈ 2M·m² rows — the quadratic term the
      // operator's scaladoc names. The capped row applies the
      // right-degree guard (the bipartite face of GraphOps.degreeCapped:
      // groupBy dst + semi-join, cap 150 > the background degree ~100,
      // so ONLY the planted hub is dropped) and should land back on the
      // linear butterflies row above.
      if ((wanted("butterflies_hub") || wanted("butterflies_hub_uncapped")
          || wanted("butterflies_hub_capped")) && m <= 5) {
        val nLeft = 5000L * m
        val nRight = 500L * m
        val bg = spark.range(nLeft * 10)
          .select(pmod(xxhash64(col("id"), lit(1)), lit(nLeft)).as("src"),
            (pmod(xxhash64(col("id"), lit(2)), lit(nRight))
              + lit(2000000000L)).as("dst"))
        val hub = spark.range(nLeft)
          .filter(pmod(col("id"), lit(5)) < 2) // 40% of left nodes
          .select(col("id").as("src"), lit(2100000000L).as("dst"))
        val e = bg.unionByName(hub).localCheckpoint(true)
        runOnce("butterflies_hub_uncapped") {
          graft.operators.Butterflies.pairCounts(e)
        }
        runOnce("butterflies_hub_capped") {
          val rdeg = e.select(col("src"), col("dst")).distinct()
            .groupBy(col("dst")).agg(count(lit(1)).as("deg"))
            .filter(col("deg") <= 150).select(col("dst"))
          graft.operators.Butterflies.pairCounts(
            e.join(rdeg, Seq("dst"), "left_semi"))
        }
        graft.operators.CacheScope.unpinCheckpoint(e)
      }
      // Round-8: exact suffix-array-grade substring dedup — O(n·L)
      // characters through ONE range shuffle; should track token count
      // near-linearly (the m× corpus makes every original window an
      // m-occurrence duplicate run, the adversarial shape for the
      // adjacent-run scan).
      runOnce("suffix_dedup") {
        graft.operators.SuffixDedup.duplicateSpans(df, "doc_id", "text",
          minLen = 10)
      }
      // Round-8: greedy bipartite matching on a hash-synthesized pair
      // table (20k·m left × 2k·m right, ~8 candidates per left node,
      // integer scores): per-round cost is two map-side max(struct)
      // aggs + anti-joins — should track pair count near-linearly; a
      // window-over-pairs formulation would sort the whole pool per
      // round instead.
      runOnce("greedy_matching") {
        val nl = 20000L * m
        val pairs = spark.range(nl * 8)
          .select(pmod(xxhash64(col("id"), lit(1)), lit(nl)).as("a"),
            pmod(xxhash64(col("id"), lit(2)), lit(nl / 10)).as("b"),
            pmod(xxhash64(col("id"), lit(3)), lit(1000L)).as("sc"))
        graft.operators.Matching.greedyRounds(pairs, "a", "b", "sc",
          rounds = 3)
      }
      // Round-12: connected-components round counts on a PATH graph —
      // the adversarial diameter case. Min-label needs diameter rounds
      // (measured only at small paths; at 640+ it would be the whole
      // smoke's budget), the Kiveris alternation contracts geometrically;
      // the rounds column is the claim, the walls are corroboration.
      // CSV: m,n,cc_rounds,path_len=L,star_rounds,star_sec,
      //      minlabel_rounds,minlabel_sec (minlabel "-" when skipped).
      if (wanted("cc_rounds")) {
        val L = 64 * m
        // Pad width derives from L (ADVICE r12): Spark's lpad TRUNCATES
        // strings longer than the target, so a fixed width would make
        // ids collide silently once L reached 10^width and the measured
        // graph would no longer be a chain.
        val pw = math.max(8, String.valueOf(L).length)
        val pathEdges = spark.range(L - 1)
          .select(lpad(col("id").cast("string"), pw, "0").as("src"),
            lpad((col("id") + 1L).cast("string"), pw, "0").as("dst"))
          .localCheckpoint(true)
        val ((starRounds, starSec), caches1) =
          graft.operators.CacheScope.tracking {
            val (sec, (labels, rounds)) = time(
              graft.operators.ConnectedComponents
                .runAlternatingWithRounds(pathEdges, maxIter = 40,
                  strict = true))
            labels.write.format("noop").mode("overwrite").save()
            (rounds, sec)
          }
        caches1.release()
        val (mlRounds, mlSec) =
          if (L > 128) ("-", "-")
          else {
            val ((r, sec), caches2) = graft.operators.CacheScope.tracking {
              val (sec, (labels, rounds)) = time(
                graft.operators.ConnectedComponents
                  .runWithRounds(pathEdges, maxIter = L + 5, strict = true))
              labels.write.format("noop").mode("overwrite").save()
              (rounds, sec)
            }
            caches2.release()
            (r.toString, "%.2f".format(sec))
          }
        graft.operators.CacheScope.unpinCheckpoint(pathEdges)
        println(s"$m,$n,cc_rounds,path_len=$L,star_rounds=$starRounds," +
          s"star_sec=${"%.2f".format(starSec)},minlabel_rounds=$mlRounds," +
          s"minlabel_sec=$mlSec")
      }
      // Round-12: streaming CC maintenance under GROWTH — one chain
      // extended segment by segment across triggers, so every trigger's
      // batch bridges into the carried component and the alternation
      // must re-root it. The claim under test: carried STARS keep the
      // per-trigger alternation shallow (rounds ~ log(segment), not
      // log(accumulated)), so trigger wall grows only with state SIZE
      // (the label table), never with accumulated diameter. CSV:
      // m,n,cc_stream,chain_len,per-trigger seconds.
      if (wanted("cc_stream")) {
        val L = 1000 * m
        val segs = 5
        val per = L / segs
        val tmpd = java.nio.file.Files
          .createTempDirectory("graft-cc-stream").toString
        // Width from L — lpad truncates beyond the target width, which
        // would silently collide ids (ADVICE r12; see cc_rounds above).
        val pw = math.max(8, String.valueOf(L).length)
        def seg(i: Int): DataFrame =
          spark.range(i.toLong * per, (i + 1).toLong * per)
            .select(lpad(col("id").cast("string"), pw, "0").as("src"),
              lpad((col("id") + 1L).cast("string"), pw, "0").as("dst"))
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("dst",
            org.apache.spark.sql.types.StringType)))
        seg(0).coalesce(1).write.mode("append").parquet(s"$tmpd/in")
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$tmpd/in")
        var nodes = 0L
        var lastLab: DataFrame = null
        val q = graft.streaming.ArtifactStreams
          .connectedComponentsStream(stream) { (lab, _) =>
            nodes = lab.count()
            lastLab = lab
          }
        val walls = scala.collection.mutable.ListBuffer[String]()
        for (i <- 0 until segs) {
          if (i > 0) {
            Thread.sleep(1100)
            seg(i).coalesce(1).write.mode("append").parquet(s"$tmpd/in")
          }
          val (sec, _) = time(q.processAllAvailable())
          walls += "%.2f".format(sec)
        }
        q.stop()
        // The final carried label table is a pinned checkpoint no
        // tracking scope owns here — release it or each multiple leaks
        // one label table's blocks into every later section.
        if (lastLab != null)
          graft.operators.CacheScope.unpinCheckpoint(lastLab)
        println(s"$m,$n,cc_stream,chain=$L,nodes=$nodes," +
          s"trigger_secs=${walls.mkString("/")}")
      }
      // Round-8: incremental span probe — corpus digest artifact built
      // OUTSIDE the timed region (production stores it); the probe is
      // O(batch tokens) + one semi-join, so it should track the batch
      // size, not the corpus.
      if (wanted("span_probe")) {
        val corpusSide = df.filter(pmod(col("doc_id"), lit(5)) =!= 4)
        val batchSide = df.filter(pmod(col("doc_id"), lit(5)) === 4)
        val art = graft.operators.SpanDedup.corpusWindowDigests(
          corpusSide, "doc_id", "text", window = 10).localCheckpoint(true)
        runOnce("span_probe") {
          graft.operators.SpanDedup.probeSpans(batchSide, "doc_id", "text",
            art, window = 10)
        }
        graft.operators.CacheScope.unpinCheckpoint(art)
      }
      // Round-9 (VERDICT r8 #4): the q182 removal action — detection's
      // range shuffle plus the covered-token explode (linear in
      // duplicated text; the m× corpus maximizes it: every token of
      // every non-first copy drops) and the per-doc reassembly groupBy.
      runOnce("suffix_removal") {
        graft.operators.SuffixDedup.removeDuplicateSpans(df, "doc_id",
          "text", minLen = 10)
      }
      // Round-9: the two-tier composition (q207) on the SAME corpus and
      // minLen as suffix_dedup — the delta between the two rows is the
      // measured value of restricting the exact sort to flagged
      // neighborhoods. NOTE the m× corpus is tiered dedup's WORST case
      // (nearly every window is flagged, so tier 2 re-sorts almost the
      // full corpus ON TOP of tier 1's digest pass); the win appears on
      // lightly-duplicated corpora, which is exactly what the row
      // documents.
      runOnce("tiered_spans") {
        graft.operators.SuffixDedup.tieredDuplicateSpans(df, "doc_id",
          "text", minLen = 10)
      }
      // Round-9: capacitated b-matching on the greedy_matching pair
      // family (caps 1-3 per node): per-round rank windows are bounded
      // by per-node candidate-list length (~8 left / ~80 right here).
      runOnce("capacitated_matching") {
        val nl = 20000L * m
        val pairs = spark.range(nl * 8)
          .select(pmod(xxhash64(col("id"), lit(1)), lit(nl)).as("a"),
            pmod(xxhash64(col("id"), lit(2)), lit(nl / 10)).as("b"),
            pmod(xxhash64(col("id"), lit(3)), lit(1000L)).as("sc"))
        val capA = spark.range(nl).select(col("id").as("a"),
          (pmod(xxhash64(col("id"), lit(4)), lit(2)) + 1).as("cap"))
        val capB = spark.range(nl / 10).select(col("id").as("b"),
          (pmod(xxhash64(col("id"), lit(5)), lit(3)) + 1).as("cap"))
        graft.operators.Matching.greedyRoundsCapacitated(pairs, "a", "b",
          "sc", capA, capB, rounds = 3)
      }
      // Round-9: ANN-backed mutual-NN (q206) on hash-synthesized 64-dim
      // embeddings split into two disjoint sides. METHODOLOGY: nLists
      // scales with the corpus (16·m — the operator's documented
      // scaling law; production wants n/occupancy cells), holding cell
      // occupancy CONSTANT (~156/side here) so candidate volume grows
      // linearly in m. A fixed cell count would make candidates
      // n²/nLists — quadratic by construction, measured once at 89 s
      // for m=5 vs 7 s at constant occupancy — which is the
      // operator's documented anti-pattern, not its operating point.
      // The n·nLists argmin assignment is the remaining m² term; the
      // beam-walk assignment (mutual_nn_beam row below, and the
      // assign_dense/assign_beam isolation pair) is the code path that
      // removes it — flat per-vector cost as nLists grows.
      if (wanted("mutual_nn") && m <= 10) {
        val emb = df.select(col("doc_id").as("vec_id"),
          expr("""transform(sequence(1, 64), i ->
            CAST(CAST(pmod(conv(substring(md5(concat(
              CAST(doc_id AS STRING), '|', CAST(i AS STRING))), 1, 6),
              16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
            .as("embedding"))
          .localCheckpoint(true)
        runOnce("mutual_nn") {
          graft.operators.Similarity.ivfMutualTop1(
            emb.filter(pmod(col("vec_id"), lit(2)) === 0),
            emb.filter(pmod(col("vec_id"), lit(2)) === 1),
            "vec_id", "embedding", nLists = 16 * m, nProbe = 4,
            fixedCentroids = Some(
              graft.operators.Similarity.portableCentroids(16 * m, 64)))
        }
        // Round-10 (VERDICT r9 #1): the SAME operating point with
        // beam-navigated assignment (q210). The navigation is
        // PROVISIONED for the cell count (entry 8, degree 8, depth 4 —
        // see the ivfMutualTop1Beam scaladoc: an under-provisioned walk
        // mis-assigns toward the entry region and the candidate join
        // inherits hot-cell skew; first measured here at (2, 4, 3) on
        // 160 cells — 167 s vs dense 21 s at m=10, the failure-mode row
        // SCALE.md reports). At these cell counts the walk touches
        // ≈ 300 cells ≥ nLists, so it can't beat the dense argmin on
        // flops — the pair measures the walk's per-round machinery
        // overhead staying FLAT in nLists while the dense term grows.
        runOnce("mutual_nn_beam") {
          graft.operators.Similarity.ivfMutualTop1Beam(
            emb.filter(pmod(col("vec_id"), lit(2)) === 0),
            emb.filter(pmod(col("vec_id"), lit(2)) === 1),
            "vec_id", "embedding", nLists = 16 * m, nProbe = 4,
            beamWidth = 8, depth = 4, degree = 8, entryCells = 8,
            fixedCentroids = Some(
              graft.operators.Similarity.portableCentroids(16 * m, 64)))
        }
        graft.operators.CacheScope.unpinCheckpoint(emb)
      }
      // Round-10: ASSIGNMENT-cost isolation — the exact term VERDICT r9
      // #1 names. nLists = 64·m, so the dense argmin does 64·m d2
      // evaluations per vector while the beam walk touches a constant
      // ≈ 2 + 3·8·5 centroids regardless; both rows end in a
      // cell-count-sized rollup so the materialized output is
      // comparable. The dense row's per-vector work grows with m ON TOP
      // of the corpus growth (n·nLists ∝ m²); the beam row's is ∝ m.
      if ((wanted("assign") || wanted("beam_skew") || wanted("beam_nav")
          || wanted("sq8_bytes") || wanted("pq_bytes")) && m <= 10) {
        val emb = df.select(col("doc_id").as("vec_id"),
          expr("""transform(sequence(1, 64), i ->
            CAST(CAST(pmod(conv(substring(md5(concat(
              CAST(doc_id AS STRING), '|', CAST(i AS STRING))), 1, 6),
              16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
            .as("embedding"))
          .localCheckpoint(true)
        val cents = graft.operators.Similarity.portableCentroids(64 * m, 64)
        runOnce("assign_dense") {
          graft.operators.Similarity.cellStats(emb, "vec_id", "embedding",
            cents)
        }
        runOnce("assign_beam") {
          graft.operators.Similarity.beamAssign(emb, "vec_id", "embedding",
            cents)
            .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        }
        // Occupancy-skew diagnostic (not a timing row): top-cell permille
        // under dense vs beam assignment — the cellStats readout that
        // explains why the BEAM mutual candidate join blows up at small
        // nLists (mis-assignments concentrate; candidates per probe ∝
        // occupancy) while the walk itself stays cheap.
        if (wanted("beam_skew")) {
          val ((dmax, bmax), caches) = graft.operators.CacheScope.tracking {
            def maxShare(counts: DataFrame): Long =
              graft.operators.Similarity
                .cellStatsFromCounts(spark, counts, cents.length)
                .agg(max(col("share_permille"))).collect()(0).getLong(0)
            (maxShare(graft.operators.Similarity.cellCounts(
                emb, "embedding", cents)),
              maxShare(graft.operators.Similarity.beamAssign(
                  emb, "vec_id", "embedding", cents)
                .groupBy(col("cell")).agg(count(lit(1)).as("n"))))
          }
          caches.release()
          println(s"$m,$n,beam_skew,dense_top_permille=$dmax,beam_top_permille=$bmax")
        }
        // Round-11 (VERDICT r10 #1): NAVIGABILITY of the (now
        // distributed) centroid graph. An UNDER-PROVISIONED walk
        // (entry 2, degree 4, beam 4, depth 4 into 64·m cells — the
        // r9-measured failure mode) is run on the bare NN graph vs the
        // same graph + Kleinberg ladder links (longLinks = 4: extra
        // out-links at ranks 8/16/32/64 of the distance ranking).
        // Reported: wall time AND agreement-with-dense permille — the
        // long links buy reach (agreement) at ~2× out-degree, which is
        // the HNSW upper-layer trade. The timing rows share the walk
        // machinery, so their delta is the broadcast-graph size only.
        if (wanted("beam_nav")) {
          runOnce("beam_nav_plain") {
            graft.operators.Similarity.beamAssign(emb, "vec_id",
              "embedding", cents, beamWidth = 4, depth = 4, degree = 4,
              entryCells = 2, longLinks = 0)
              .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          }
          runOnce("beam_nav_ladder") {
            graft.operators.Similarity.beamAssign(emb, "vec_id",
              "embedding", cents, beamWidth = 4, depth = 4, degree = 4,
              entryCells = 2, longLinks = 4)
              .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          }
          val ((a0, a4, tot), caches) = graft.operators.CacheScope.tracking {
            val dense = graft.operators.Similarity.denseAssign(
              emb, "vec_id", "embedding", cents)
              .select(col("id").as("did"), col("cell").as("dense_cell"))
              .localCheckpoint(true)
            def agreePermille(longLinks: Int): Long = {
              val beam = graft.operators.Similarity.beamAssign(emb,
                "vec_id", "embedding", cents, beamWidth = 4, depth = 4,
                degree = 4, entryCells = 2, longLinks = longLinks)
              beam.join(dense, col("id") === col("did"))
                .agg(expr(
                  "sum(CASE WHEN cell = dense_cell THEN 1000 ELSE 0 END)" +
                    " div count(1)").as("p"))
                .collect()(0).getLong(0)
            }
            val r = (agreePermille(0), agreePermille(4), dense.count())
            graft.operators.CacheScope.unpinCheckpoint(dense)
            r
          }
          caches.release()
          println(s"$m,$n,beam_nav_agree,plain_permille=$a0," +
            s"ladder_permille=$a4,vectors=$tot")
        }
        // Round-12 (VERDICT r11 #4): SQ8 candidate-artifact bytes. The
        // quantized corpus is what IVF probes ship at serving time;
        // parquet bytes on disk are the honest proxy for that candidate
        // I/O. float64 vs int8 codes (q−128 as TINYINT, the FAISS SQ8
        // storage shape — the +128 unshift is two broadcast sums at
        // query time, see ivfTopKQuantized).
        if (wanted("sq8_bytes")) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft-sq8").toString
          // The operator's own stats/quantizer (one home — a drifted
          // copy here would price a different artifact than serving
          // ships).
          val stats = graft.operators.Similarity.sq8Stats(emb, "embedding")
          // Uncompressed + no dictionary: the md5-derived synthetic
          // floats have ~1000 distinct values per dim, so default
          // snappy+dictionary flattens every representation to its
          // entropy (~10 bits/value) and hides the WIDTH difference a
          // real (high-entropy) embedding corpus pays; plain encoding
          // measures the actual bytes a candidate row ships.
          def plainWrite(df2: DataFrame, p: String): Unit =
            df2.write.mode("overwrite")
              .option("compression", "uncompressed")
              .option("parquet.enable.dictionary", "false")
              .parquet(p)
          plainWrite(emb.select(col("vec_id"),
            transform(col("embedding"), v => v.cast("double"))
              .as("embedding")), s"$tmp/f64")
          val codes = emb.crossJoin(broadcast(stats))
            .select(col("vec_id"),
              graft.operators.Similarity.sq8QuantExpr(col("embedding"))
                .as("q"))
            .localCheckpoint(true)
          plainWrite(codes.select(col("vec_id"),
            transform(col("q"), x => (x - 128L).cast("byte")).as("code")),
            s"$tmp/i8")
          // Parquet has no 1-byte physical type (tinyint rides INT32 +
          // dictionary), so the honest 1-byte/dim artifact shape packs 8
          // codes per BIGINT (Similarity.packCodes — Sq8PackSpec pins
          // the unpack round-trip serving relies on).
          plainWrite(codes.select(col("vec_id"),
            graft.operators.Similarity.packCodes(col("q"), 64)
              .as("packed")),
            s"$tmp/i8packed")
          graft.operators.CacheScope.unpinCheckpoint(codes)
          def dirBytes(p: String): Long = {
            val d = new java.io.File(p)
            d.listFiles().filter(_.isFile).map(_.length()).sum
          }
          println(s"$m,$n,sq8_bytes,f64=${dirBytes(s"$tmp/f64")}," +
            s"i8=${dirBytes(s"$tmp/i8")}," +
            s"i8packed=${dirBytes(s"$tmp/i8packed")}")
        }
        // Round-13: PQ-packed IVFADC artifact bytes — the 4 B/vector
        // FAISS shape (m = 8 codes × 4 bits = ONE BIGINT) vs the
        // unpacked 8-long code array vs float64. Same plain-encoding
        // rationale as sq8_bytes above.
        if (wanted("pq_bytes")) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft-pq").toString
          def plainWrite(df2: DataFrame, p: String): Unit =
            df2.write.mode("overwrite")
              .option("compression", "uncompressed")
              .option("parquet.enable.dictionary", "false")
              .parquet(p)
          val books = graft.operators.Similarity
            .portableCodebooks(8, 16, 8)
          val cents16 = graft.operators.Similarity
            .portableCentroids(16, 64)
          plainWrite(emb.select(col("vec_id"),
            transform(col("embedding"), v => v.cast("double"))
              .as("embedding")), s"$tmp/f64")
          plainWrite(graft.operators.Similarity
            .pqEncode(emb, "vec_id", "embedding", books), s"$tmp/codes")
          plainWrite(graft.operators.Similarity
            .pqIvfArtifact(emb, "vec_id", "embedding", cents16, books),
            s"$tmp/packed")
          def dirBytes(p: String): Long = {
            val d = new java.io.File(p)
            d.listFiles().filter(_.isFile).map(_.length()).sum
          }
          println(s"$m,$n,pq_bytes,f64=${dirBytes(s"$tmp/f64")}," +
            s"codes=${dirBytes(s"$tmp/codes")}," +
            s"packed=${dirBytes(s"$tmp/packed")}")
        }
        graft.operators.CacheScope.unpinCheckpoint(emb)
      }
      // Round-12 (VERDICT r11 #3): COARSE-tier navigability at production
      // cell counts — the one claim that rested on a 32-cell spec fixture.
      // Cells = 2500·m (run with "1 2 4" → 2.5k/5k/10k), corpus-free: the
      // measurement is about the centroid GRAPH, so a fixed 2k-vector
      // query set suffices. Build = coarse IVF-over-centroids tier
      // (coarseCells ≈ √n, probe 8) + rank-stride ladder; agreement = the
      // share of vectors whose beamAssignWithGraph cell == the dense
      // argmin cell (computed table-form: crossJoin + min(struct) — the
      // literal-array dense path would blow the plan up at 10⁴ cells).
      if (wanted("beam_nav_coarse") && m <= 4) {
        val cellsN = 2500 * m
        val cents = graft.operators.Similarity.portableCentroids(cellsN, 64)
        val centDf = spark.createDataFrame(
            cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
          .toDF("cell", "centroid").localCheckpoint(true)
        val emb2k = base.limit(2000).select(col("doc_id").as("vec_id"),
          expr("""transform(sequence(1, 64), i ->
            CAST(CAST(pmod(conv(substring(md5(concat(
              CAST(doc_id AS STRING), '|', CAST(i AS STRING))), 1, 6),
              16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
            .as("embedding")).localCheckpoint(true)
        val coarseK = math.max(16, math.sqrt(cellsN.toDouble).toInt)
        runOnce("beam_nav_coarse_build") {
          graft.operators.Similarity.buildNavGraph(centDf, degree = 4,
            longLinks = 4, coarseCells = coarseK, coarseProbe = 8)
        }
        if (wanted("beam_nav_coarse_agree")) {
          val ((aPlain, aLadder, tot), caches) =
            graft.operators.CacheScope.tracking {
              val d2 = aggregate(zip_with(col("embedding"), col("centroid"),
                (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
                lit(0.0d), (acc, x) => acc + x)
              val dense = emb2k.crossJoin(centDf)
                .select(col("vec_id"), struct(d2.as("d2"), col("cell")).as("s"))
                .groupBy(col("vec_id"))
                .agg(min(col("s")).getField("cell").as("dense_cell"))
                .localCheckpoint(true)
              def agreePermille(longLinks: Int): Long = {
                val nav = graft.operators.Similarity.buildNavGraph(centDf,
                  degree = 4, longLinks = longLinks, coarseCells = coarseK,
                  coarseProbe = 8)
                graft.operators.Similarity.beamAssignWithGraph(emb2k,
                    "vec_id", "embedding", centDf, nav,
                    beamWidth = 8, depth = 8, entryCells = 4)
                  .join(dense, col("id") === col("vec_id"))
                  .agg(expr(
                    "sum(CASE WHEN cell = dense_cell THEN 1000 ELSE 0 END)" +
                      " div count(1)").as("p"))
                  .collect()(0).getLong(0)
              }
              val r = (agreePermille(0), agreePermille(4), dense.count())
              graft.operators.CacheScope.unpinCheckpoint(dense)
              r
            }
          caches.release()
          println(s"$m,$n,beam_nav_coarse_agree,cells=$cellsN," +
            s"plain_permille=$aPlain,ladder_permille=$aLadder,vectors=$tot")
        }
        // Round-13 (VERDICT r12 #4 follow-up): ONE PROVISIONED operating
        // point — the agree rows above deliberately measure a THIN walk
        // (entry 4 / beam 8 / depth 8 / degree 4, ≈260 cell touches);
        // the production claim says entry/beam/depth/degree grow
        // logarithmically in the cell count, so here they are scaled to
        // the 10^4-cell point (entry 16 / beam 32 / depth 12 / degree 8
        // / longLinks 8) and the row reports agreement AND the cost
        // multiple vs thin. CSV: m,n,beam_nav_coarse_prov,cells,
        // thin_permille,thin_sec,prov_permille,prov_sec.
        if (wanted("beam_nav_coarse_prov")) {
          val ((r, tSec, pSec), caches) =
            graft.operators.CacheScope.tracking {
              val d2 = aggregate(zip_with(col("embedding"), col("centroid"),
                (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
                lit(0.0d), (acc, x) => acc + x)
              val dense = emb2k.crossJoin(centDf)
                .select(col("vec_id"), struct(d2.as("d2"), col("cell")).as("s"))
                .groupBy(col("vec_id"))
                .agg(min(col("s")).getField("cell").as("dense_cell"))
                .localCheckpoint(true)
              def walk(deg: Int, ll: Int, beam: Int, depth: Int,
                  entry: Int): (Long, Double) = {
                val nav = graft.operators.Similarity.buildNavGraph(centDf,
                  degree = deg, longLinks = ll, coarseCells = coarseK,
                  coarseProbe = 8)
                val assigned = graft.operators.Similarity
                  .beamAssignWithGraph(emb2k, "vec_id", "embedding",
                    centDf, nav, beamWidth = beam, depth = depth,
                    entryCells = entry)
                  .localCheckpoint(true)
                val (sec, _) = time(assigned.count())
                val p = assigned
                  .join(dense, col("id") === col("vec_id"))
                  .agg(expr(
                    "sum(CASE WHEN cell = dense_cell THEN 1000 ELSE 0 END)" +
                      " div count(1)").as("p"))
                  .collect()(0).getLong(0)
                graft.operators.CacheScope.unpinCheckpoint(assigned)
                (p, sec)
              }
              val (thinP, thinS) = walk(4, 4, 8, 8, 4)
              val (provP, provS) = walk(8, 8, 32, 12, 16)
              graft.operators.CacheScope.unpinCheckpoint(dense)
              ((thinP, provP), thinS, provS)
            }
          caches.release()
          println(s"$m,$n,beam_nav_coarse_prov,cells=$cellsN," +
            s"thin_permille=${r._1},thin_sec=${"%.2f".format(tSec)}," +
            s"prov_permille=${r._2},prov_sec=${"%.2f".format(pSec)}")
        }
        graft.operators.CacheScope.unpinCheckpoint(centDf)
        graft.operators.CacheScope.unpinCheckpoint(emb2k)
      }
      // Round-13 (VERDICT r12 #1): the full Louvain LEVEL STEP — move,
      // score, COARSEN (phase 2), move on the coarse graph, score —
      // under an accept-if-improved policy (synchronous move rounds
      // alone can overshoot, q240's documented caveat; the policy is
      // what real runs do: alternate moves with re-scores). Q is the
      // exact-integer q_num total over the common 4W² denominator —
      // comparable ACROSS levels because coarsening conserves W and the
      // scorecard (ModularitySpec). The row evidences monotone Q, the
      // phase-2 shrink (coarse nodes = community count), and the walls.
      // Graph: planted partition, blocks of 40, 80% intra edges. CSV:
      // m,n,louvain_ladder,nodes,q0,q1,q2,coarse_nodes,sec.
      if (wanted("louvain_ladder")) {
        val nNodes = 4000L * m
        val h = (s: Int) => xxhash64(col("id"), lit(s))
        val edges = spark.range(nNodes * 5)
          .select(pmod(h(1), lit(nNodes)).as("src"),
            when(pmod(h(3), lit(10)) < 8,
              pmod(h(1), lit(nNodes)) - pmod(pmod(h(1), lit(nNodes)), lit(40L))
                + pmod(h(2), lit(40L)))
              .otherwise(pmod(h(2), lit(nNodes))).as("dst"),
            (pmod(h(4), lit(3L)) + 1L).as("w"))
          .filter(col("src") =!= col("dst"))
          .localCheckpoint(true)
        def qTot(e: DataFrame, mem: DataFrame, self: Boolean): Long =
          graft.operators.Modularity
            .communityStats(e, mem, Some("w"), selfLoops = self)
            .agg(coalesce(sum(col("q_num")), lit(0L)).as("q"))
            .collect()(0).getLong(0)
        val ((lSec, (q0, q1, q2, cNodes)), caches) =
          graft.operators.CacheScope.tracking { time {
            val mem0 = edges.select(col("src").as("node_id"))
              .union(edges.select(col("dst")))
              .distinct()
              .select(col("node_id"),
                col("node_id").cast("string").as("community"))
              .localCheckpoint(true)
            val q0 = qTot(edges, mem0, self = false)
            val mem1 = graft.operators.Modularity
              .greedyMoveRound(edges, mem0, Some("w"))
              .select(col("node_id"), col("comm_new").as("community"))
              .localCheckpoint(true)
            val q1raw = qTot(edges, mem1, self = false)
            val (memBest, q1) =
              if (q1raw >= q0) (mem1, q1raw) else (mem0, q0)
            val coarse = graft.operators.Modularity
              .coarsen(edges, memBest, Some("w"))
              .localCheckpoint(true)
            val cmem = coarse.select(col("src").as("c"))
              .union(coarse.select(col("dst"))).distinct()
              .select(col("c").cast("long").as("node_id"),
                col("c").as("community"))
              .localCheckpoint(true)
            val cmem1 = graft.operators.Modularity
              .greedyMoveRound(coarse, cmem, Some("w"), selfLoops = true)
              .select(col("node_id"), col("comm_new").as("community"))
              .localCheckpoint(true)
            val q2raw = qTot(coarse, cmem1, self = true)
            val q2 = math.max(q2raw, q1) // accept-if-improved
            // Conservation identity (ADVICE r13 — the old monotonicity
            // require was vacuous on the pre-clamped values): the coarse
            // graph under its singleton membership must score EXACTLY the
            // fine graph under the accepted membership. This is the
            // checkable invariant of coarsening; a regressing move round
            // shows in the logged raw values instead of a dead assert.
            val qCons = qTot(coarse, cmem, self = true)
            require(qCons == q1,
              s"coarsening broke Q conservation: coarse-singleton $qCons" +
                s" != fine-accepted $q1")
            val cN = cmem.count()
            Seq(mem0, mem1, coarse, cmem, cmem1)
              .foreach(graft.operators.CacheScope.unpinCheckpoint)
            (q0, (q1raw, q1), (q2raw, q2), cN)
          } }
        caches.release()
        val ((q1r, q1v), (q2r, q2v)) = (q1, q2)
        println(s"$m,$n,louvain_ladder,nodes=${nNodes},q0=$q0," +
          s"q1raw=$q1r,q1=$q1v,q2raw=$q2r,q2=$q2v," +
          s"coarse_nodes=$cNodes,sec=${"%.2f".format(lSec)}")
        graft.operators.CacheScope.unpinCheckpoint(edges)
      }
      // Round-14 (VERDICT r13 #3): the FULL multi-level Louvain driver —
      // nodes must SHRINK per level (that is phase 2's whole point) at
      // near-flat wall per level, with Q strictly monotone across the
      // accepted levels. CSV: m,n,louvain_levels,nodes,levels,
      // node_path (fine:level1:level2:…), q_path, sec.
      if (wanted("louvain_levels")) {
        val nNodes = 4000L * m
        val h = (s: Int) => xxhash64(col("id"), lit(s))
        val edges = spark.range(nNodes * 5)
          .select(pmod(h(1), lit(nNodes)).as("src"),
            when(pmod(h(3), lit(10)) < 8,
              pmod(h(1), lit(nNodes)) - pmod(pmod(h(1), lit(nNodes)), lit(40L))
                + pmod(h(2), lit(40L)))
              .otherwise(pmod(h(2), lit(nNodes))).as("dst"),
            (pmod(h(4), lit(3L)) + 1L).as("w"))
          .filter(col("src") =!= col("dst"))
          .localCheckpoint(true)
        val ((lvSec, (rows, fineN)), caches) =
          graft.operators.CacheScope.tracking { time {
            val (mem, sc) = graft.operators.Modularity.louvain(
              edges, Some("w"), maxLevels = 4, minGain = 0L)
            val r = sc.orderBy(col("level"))
              .collect().map(x => (x.getInt(0), x.getLong(1),
                x.getLong(2), x.getLong(3)))
            val nN = mem.count()
            graft.operators.CacheScope.unpinCheckpoint(mem)
            (r, nN)
          } }
        caches.release()
        require(rows.map(_._2).sliding(2).forall {
          case Array(a, b) => b > a
          case _ => true
        }, "louvain levels must be strictly Q-monotone")
        val nodePath = (Seq(fineN) ++ rows.map(_._3)).mkString(":")
        val qPath = rows.map(_._2).mkString(":")
        println(s"$m,$n,louvain_levels,nodes=$nNodes,levels=${rows.size}," +
          s"node_path=$nodePath,q_path=$qPath," +
          s"sec=${"%.2f".format(lvSec)}")
        graft.operators.CacheScope.unpinCheckpoint(edges)
      }
      // Round-14 (VERDICT r13 #1): recall at IDENTICAL bytes — raw vs
      // RESIDUAL IVFADC encoding, trained coarse centroids, each
      // encoding's codebooks trained on what it quantizes, same probe
      // budget. Two byte rungs: (bits=4, ksub=16) = the q97 operating
      // point, one BIGINT word/vector; (bits=8, ksub=64) = the next
      // rung, two words. CSV: m,n,pq_recall_residual,bits,ksub,words,
      // enc,recall,sec.
      if (wanted("pq_recall_residual") && m == 1) {
        val nVec = 4000L
        val vecs = spark.range(nVec)
          .select(col("id").as("vec_id"),
            expr("""transform(sequence(1, 64), i ->
              CAST(CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
              .as("embedding"))
          .localCheckpoint(true)
        val queries = vecs.filter(col("vec_id") < 200)
        val brute = graft.operators.Similarity.bruteForceTopK(
            vecs, queries, "vec_id", "embedding", 5)
          .select(col("q_id"), col("n_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val cents = graft.operators.Similarity.trainCentroids(
          vecs, "embedding", nLists = 64)
        for ((bits, ksub) <- Seq((4, 16), (8, 64));
             residual <- Seq(false, true)) {
          val ((rSec, recall), caches) =
            graft.operators.CacheScope.tracking { time {
              val trainSrc =
                if (residual) graft.operators.Similarity.pqResiduals(
                  vecs, "vec_id", "embedding", cents)
                else vecs.withColumnRenamed("embedding", "n_res")
                  .withColumnRenamed("vec_id", "n_id")
              val books = graft.operators.Similarity.pqTrainCodebooks(
                trainSrc, "n_res", m = 8, ksub = ksub, dim = 64)
              val art = graft.operators.Similarity.pqIvfArtifact(
                vecs, "vec_id", "embedding", cents, books, bits, residual)
              val served = graft.operators.Similarity.ivfPqTopKServe(
                  art, queries, "vec_id", "embedding", k = 5,
                  centroids = cents, codebooks = books, nProbe = 8,
                  bits = bits, residual = residual)
                .select(col("q_id"), col("n_id"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
              (brute & served).size.toDouble / brute.size
            } }
          caches.release()
          val words = (8 + (64 / bits) - 1) / (64 / bits)
          println(s"$m,$n,pq_recall_residual,bits=$bits,ksub=$ksub," +
            s"words=$words,enc=${if (residual) "residual" else "raw"}," +
            s"recall=${"%.3f".format(recall)},sec=${"%.2f".format(rSec)}")
        }
        graft.operators.CacheScope.unpinCheckpoint(vecs)
      }
      // Round-13 (VERDICT r12 #3): quantized serving with QUERIES ≈
      // CORPUS through the shuffle-join path (broadcastQueries = false)
      // — the regime where broadcasting the probed frame would collect
      // the corpus at the driver. nLists scales with the corpus (the
      // FAISS convention) so per-cell candidate volume stays flat and
      // the wall should track N, not N². CSV: m,n,sq8_serve_fanout,
      // vectors,cells,pairs,sec.
      if (wanted("sq8_serve_fanout") && m <= 4) {
        val nVec = 2000L * m
        val vecs = spark.range(nVec)
          .select(col("id").as("vec_id"),
            expr("""transform(sequence(1, 64), i ->
              CAST(CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
              .as("embedding"))
          .localCheckpoint(true)
        val cents = graft.operators.Similarity
          .portableCentroids(64 * m, 64)
        val ((fSec, nPairs), caches) = graft.operators.CacheScope.tracking {
          time(graft.operators.Similarity.semanticDedupQuantized(
              vecs, "vec_id", "embedding", dim = 64, k = 5,
              minDot = 0L, nLists = 64 * m,
              fixedCentroids = Some(cents))
            .count())
        }
        caches.release()
        println(s"$m,$n,sq8_serve_fanout,vectors=$nVec,cells=${64 * m}," +
          s"pairs=$nPairs,sec=${"%.2f".format(fSec)}")
        graft.operators.CacheScope.unpinCheckpoint(vecs)
      }
      // Round-14 (VERDICT r13 #4): semanticDedupQuantized under pure
      // DEFAULTS — nLists auto-sizes to max(16, N/targetCellSize) from
      // one corpus count, so pairs/vector must stay FLAT as the corpus
      // grows (the caller-used-defaults regime the auto-sizing exists
      // to protect; contrast the fixed-nLists quadratic q242 prices
      // deliberately). CSV: m,n,sq8_dedup_auto,vectors,pairs,
      // pairs_per_vec,sec.
      if (wanted("sq8_dedup_auto") && m <= 4) {
        val nVec = 2000L * m
        val vecs = spark.range(nVec)
          .select(col("id").as("vec_id"),
            expr("""transform(sequence(1, 64), i ->
              CAST(CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
              .as("embedding"))
          .localCheckpoint(true)
        val ((aSec, nPairs), caches) = graft.operators.CacheScope.tracking {
          time(graft.operators.Similarity.semanticDedupQuantized(
              vecs, "vec_id", "embedding", dim = 64, k = 5, minDot = 0L)
            .count())
        }
        caches.release()
        println(s"$m,$n,sq8_dedup_auto,vectors=$nVec,pairs=$nPairs," +
          s"pairs_per_vec=${"%.2f".format(nPairs.toDouble / nVec)}," +
          s"sec=${"%.2f".format(aSec)}")
        graft.operators.CacheScope.unpinCheckpoint(vecs)
      }
      // Round-14 widening: two-stage ADC serving — recall climbs with
      // the shortlist width while the exact stage's extra wall stays
      // modest (it touches |Q|·shortlist float rows, not the corpus).
      // Reference = exact squared-L2 top-5 (rerank with the full
      // corpus as shortlist — quantization error cancels completely).
      // CSV: m,n,pq_rerank,shortlist,recall,sec.
      if (wanted("pq_rerank") && m == 1) {
        val nVec = 4000L
        val vecs = spark.range(nVec)
          .select(col("id").as("vec_id"),
            expr("""transform(sequence(1, 64), i ->
              CAST(CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
              .as("embedding"))
          .localCheckpoint(true)
        val queries = vecs.filter(col("vec_id") < 200)
        val cents = graft.operators.Similarity.trainCentroids(
          vecs, "embedding", nLists = 64)
        val books = graft.operators.Similarity.pqTrainCodebooks(
          vecs, "embedding")
        val art = graft.operators.Similarity.pqIvfArtifact(
          vecs, "vec_id", "embedding", cents, books)
          .localCheckpoint(true)
        def servedPairs(shortlist: Int): (Double, Set[(Long, Long)]) = {
          val ((sec, pairs), caches) =
            graft.operators.CacheScope.tracking { time {
              (if (shortlist == 0)
                 graft.operators.Similarity.ivfPqTopKServe(art, queries,
                   "vec_id", "embedding", k = 5, centroids = cents,
                   codebooks = books, nProbe = 8)
               else
                 graft.operators.Similarity.ivfPqTopKRerank(art, vecs,
                   queries, "vec_id", "embedding", k = 5,
                   shortlist = shortlist, centroids = cents,
                   codebooks = books, nProbe = 8))
                .select(col("q_id"), col("n_id"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            } }
          caches.release()
          (sec, pairs)
        }
        val exact = servedPairs(nVec.toInt)._2
        for (shortlist <- Seq(0, 20, 50, 200)) {
          val (sec, pairs) = servedPairs(shortlist)
          val recall = (exact & pairs).size.toDouble / exact.size
          println(s"$m,$n,pq_rerank," +
            s"shortlist=${if (shortlist == 0) "adc_only" else shortlist}," +
            s"recall=${"%.3f".format(recall)},sec=${"%.2f".format(sec)}")
        }
        Seq(vecs, art)
          .foreach(graft.operators.CacheScope.unpinCheckpoint)
      }
      // Round-14 widening: residual IVFADC at IDENTICAL bytes, raw
      // coordinates vs HD-rotated (the structured-OPQ rung) — each
      // coordinate system gets its own trained centroids + residual
      // codebooks, same probe budget; the brute-force reference is
      // computed once on raw coordinates (the rotation is orthonormal,
      // so true neighbors are IDENTICAL — AnnSpec pins it). CSV:
      // m,n,pq_recall_rotated,coords,recall,sec.
      if (wanted("pq_recall_rotated") && m == 1) {
        val nVec = 4000L
        val raw = spark.range(nVec)
          .select(col("id").as("vec_id"),
            expr("""transform(sequence(1, 64), i ->
              CAST(CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
              .as("embedding"))
          .localCheckpoint(true)
        val brute = graft.operators.Similarity.bruteForceTopK(
            raw, raw.filter(col("vec_id") < 200), "vec_id", "embedding", 5)
          .select(col("q_id"), col("n_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        for (rotated <- Seq(false, true)) {
          val ((sec, recall), caches) =
            graft.operators.CacheScope.tracking { time {
              val corpus = if (rotated)
                graft.operators.Similarity.hdRotate(
                  raw, "vec_id", "embedding", 64).localCheckpoint(true)
              else raw
              val cents = graft.operators.Similarity.trainCentroids(
                corpus, "embedding", nLists = 64)
              val books = graft.operators.Similarity.pqTrainCodebooks(
                graft.operators.Similarity.pqResiduals(
                  corpus, "vec_id", "embedding", cents), "n_res")
              val art = graft.operators.Similarity.pqIvfArtifact(
                corpus, "vec_id", "embedding", cents, books,
                residual = true)
              val served = graft.operators.Similarity.ivfPqTopKServe(
                  art, corpus.filter(col("vec_id") < 200), "vec_id",
                  "embedding", k = 5, centroids = cents,
                  codebooks = books, nProbe = 8, residual = true)
                .select(col("q_id"), col("n_id"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
              if (rotated)
                graft.operators.CacheScope.unpinCheckpoint(corpus)
              (brute & served).size.toDouble / brute.size
            } }
          caches.release()
          println(s"$m,$n,pq_recall_rotated," +
            s"coords=${if (rotated) "hd_rotated" else "raw"}," +
            s"recall=${"%.3f".format(recall)},sec=${"%.2f".format(sec)}")
        }
        graft.operators.CacheScope.unpinCheckpoint(raw)
      }
      // Round-14: beam-navigated vs dense-probe packed-ADC serving as
      // the CELL COUNT grows (corpus and query set fixed) — the dense
      // probe computes d2 to every centroid per query (wall grows with
      // nLists), the beam walk touches O(entry + beam·degree·depth)
      // cells (wall flat). m scales nLists: 64·m cells. CSV:
      // m,n,pq_beam_serve,cells,path,agree,sec.
      if (wanted("pq_beam_serve") && m <= 8) {
        val nVec = 4000L
        val nLists = 64 * m
        // Two fixtures: hash-UNIFORM (64-dim distance concentration —
        // graph navigation's worst case, everything near-equidistant)
        // and CLUSTERED (64 hash-derived centers + 10% noise — the
        // real-embedding shape navigation exists for), each with
        // centroids trained on ITS corpus.
        for (fixture <- Seq("uniform", "clustered")) {
          val vecExpr = if (fixture == "uniform")
            """transform(sequence(1, 64), i ->
              CAST(CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))"""
          else
            """transform(sequence(1, 64), i ->
              CAST((CAST(pmod(conv(substring(md5(concat('ctr|',
                CAST(pmod(id, 64) AS STRING), '|', CAST(i AS STRING))),
                1, 6), 16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5)
                + 0.1 * (CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5) AS FLOAT))"""
          val vecs = spark.range(nVec)
            .select(col("id").as("vec_id"), expr(vecExpr).as("embedding"))
            .localCheckpoint(true)
          val queries = vecs.filter(col("vec_id") < 200)
          val cents = graft.operators.Similarity.trainCentroids(
            vecs, "embedding", nLists = nLists)
          val books = graft.operators.Similarity.pqTrainCodebooks(
            vecs, "embedding")
          val art = graft.operators.Similarity.pqIvfArtifact(
              vecs, "vec_id", "embedding", cents, books)
            .localCheckpoint(true)
          val centDf = spark.createDataFrame(
            cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
            .toDF("cell", "centroid").localCheckpoint(true)
          val ((dSec, dense), dCaches) =
            graft.operators.CacheScope.tracking { time {
              graft.operators.Similarity.ivfPqTopKServe(art, queries,
                  "vec_id", "embedding", k = 5, centroids = cents,
                  codebooks = books, nProbe = 4)
                .select(col("q_id"), col("n_id"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            } }
          dCaches.release()
          println(s"$m,$n,pq_beam_serve,cells=$nLists,fix=$fixture," +
            s"path=dense,agree=1.000,sec=${"%.2f".format(dSec)}")
          val ((bSec, beamed), bCaches) =
            graft.operators.CacheScope.tracking { time {
              val nav = graft.operators.CacheScope.pin(
                graft.operators.Similarity.buildNavGraph(
                  centDf, degree = 4, longLinks = 3))
              graft.operators.Similarity.ivfPqBeamServe(art, queries,
                  "vec_id", "embedding", k = 5, centroids = centDf,
                  nav = nav, codebooks = books, beamWidth = 8,
                  depth = 4, entryCells = 2, nProbe = 4)
                .select(col("q_id"), col("n_id"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            } }
          bCaches.release()
          val agree =
            (dense & beamed).size.toDouble / math.max(1, dense.size)
          println(s"$m,$n,pq_beam_serve,cells=$nLists,fix=$fixture," +
            s"path=beam,agree=${"%.3f".format(agree)}," +
            s"sec=${"%.2f".format(bSec)}")
          Seq(vecs, art, centDf)
            .foreach(graft.operators.CacheScope.unpinCheckpoint)
        }
      }
      // Round-14: pure HD-rotation wall — one zero-shuffle projection,
      // must be LINEAR in the corpus. CSV: m,n,hd_rotate,vectors,sec.
      if (wanted("hd_rotate") && m <= 4) {
        val nVec = 5000L * m
        val vecs = spark.range(nVec)
          .select(col("id").as("vec_id"),
            expr("""transform(sequence(1, 64), i ->
              CAST(CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
              .as("embedding"))
          .localCheckpoint(true)
        // hash() consumes every rotated component — element_at would let
        // SimplifyExtractValueOps collapse the rotation to one dot
        val (rSec, _) = time(graft.operators.Similarity.hdRotate(
            vecs, "vec_id", "embedding", 64)
          .agg(sum(hash(col("embedding")))).collect())
        println(s"$m,$n,hd_rotate,vectors=$nVec," +
          s"sec=${"%.2f".format(rSec)}")
        graft.operators.CacheScope.unpinCheckpoint(vecs)
      }
      // Round-15 (VERDICT r14 #2): dense plan-literal matvec vs the
      // FWHT butterfly at a PRODUCTION dim (512). Two regimes, both
      // priced: at 2k vectors the walls are ONE-TIME costs (the
      // butterfly compiles log₂(d) = 9 chained projections; the dense
      // path's 262k-literal method blows the codegen budget and falls
      // back to interpreted eval — cheap at 2k rows); at 50k vectors
      // the PER-ROW asymptotics dominate — O(d²) = 262k interpreted
      // multiply-adds per row dense vs O(d·log d) ≈ 9k codegen'd
      // add/subs butterfly — which is the regime a 100 TB corpus lives
      // in. CSV: m,n,hd_rotate_butterfly,dim,vectors,path,sec.
      if (wanted("hd_rotate_butterfly") && m == 1) {
        val dim = 512
        for (nVec <- Seq(2000L, 50000L)) {
          val vecs = spark.range(nVec)
            .select(col("id").as("vec_id"),
              expr(s"""transform(sequence(1, $dim), i ->
                CAST(CAST(pmod(conv(substring(md5(concat(
                  CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                  16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))""")
                .as("embedding"))
            .localCheckpoint(true)
          for (path <- Seq("butterfly", "dense")) {
            val (sec, _) = time(graft.operators.Similarity.hdRotate(
                vecs, "vec_id", "embedding", dim,
                butterfly = Some(path == "butterfly"))
              .agg(sum(hash(col("embedding")))).collect())
            println(s"$m,$n,hd_rotate_butterfly,dim=$dim,vectors=$nVec," +
              s"path=$path,sec=${"%.2f".format(sec)}")
          }
          graft.operators.CacheScope.unpinCheckpoint(vecs)
        }
      }
      // Round-15 (VERDICT r14 #3): the auto-sized walk budget vs the
      // fixed round-14 one as the cell count grows (64·m cells, corpus
      // and queries fixed) — the fixed budget's agreement with the
      // dense probe decays as cells outgrow it (SCALE.md pq_beam_serve
      // measured 0.875 → 0.615); the auto budget derives depth/width
      // from the artifact so agreement must stay flat. Clustered
      // fixture (the shape navigation exists for). CSV:
      // m,n,pq_beam_auto,cells,budget,bw,dp,agree,sec.
      if (wanted("pq_beam_auto") && m <= 8) {
        val nVec = 4000L
        val nLists = 64 * m
        val vecs = spark.range(nVec)
          .select(col("id").as("vec_id"),
            expr("""transform(sequence(1, 64), i ->
              CAST((CAST(pmod(conv(substring(md5(concat('ctr|',
                CAST(pmod(id, 64) AS STRING), '|', CAST(i AS STRING))),
                1, 6), 16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5)
                + 0.1 * (CAST(pmod(conv(substring(md5(concat(
                CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 6),
                16, 10), 1000) AS DOUBLE) / 1000.0 - 0.5) AS FLOAT))""")
              .as("embedding"))
          .localCheckpoint(true)
        val queries = vecs.filter(col("vec_id") < 200)
        val cents = graft.operators.Similarity.trainCentroids(
          vecs, "embedding", nLists = nLists)
        val books = graft.operators.Similarity.pqTrainCodebooks(
          vecs, "embedding")
        val art = graft.operators.Similarity.pqIvfArtifact(
            vecs, "vec_id", "embedding", cents, books)
          .localCheckpoint(true)
        val centDf = spark.createDataFrame(
          cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
          .toDF("cell", "centroid").localCheckpoint(true)
        val ((_, dense), dCaches) =
          graft.operators.CacheScope.tracking { time {
            graft.operators.Similarity.ivfPqTopKServe(art, queries,
                "vec_id", "embedding", k = 5, centroids = cents,
                codebooks = books, nProbe = 4)
              .select(col("q_id"), col("n_id"))
              .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          } }
        dCaches.release()
        // fixed row = the round-14 defaults frozen (nav degree 4, beam
        // 8/4, entry 2); auto row = every knob left at its default so
        // the artifact sizes its own walk (nav degree, entry set,
        // width, depth all auto — VERDICT r14 #3 + the BeamProbe
        // degree/entry extension)
        val navFixed = graft.operators.Similarity.buildNavGraph(
            centDf, degree = 4, longLinks = 3)
          .localCheckpoint(true)
        val navAuto = graft.operators.Similarity.buildNavGraph(
            centDf, longLinks = 3)
          .localCheckpoint(true)
        for (budget <- Seq("fixed", "auto")) {
          val nav = if (budget == "fixed") navFixed else navAuto
          val ((sec, beamed), caches) =
            graft.operators.CacheScope.tracking { time {
              val (bw, dp, ec) = if (budget == "fixed") (8, 4, 2)
                else (-1, -1, -1) // defaults: auto-sized from the tables
              graft.operators.Similarity.ivfPqBeamServe(art, queries,
                  "vec_id", "embedding", k = 5, centroids = centDf,
                  nav = nav, codebooks = books, beamWidth = bw,
                  depth = dp, entryCells = ec, nProbe = 4)
                .select(col("q_id"), col("n_id"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            } }
          caches.release()
          val agree =
            (dense & beamed).size.toDouble / math.max(1, dense.size)
          val st = nav.agg(count(lit(1)), countDistinct(col("src")))
            .collect()(0)
          val meanDeg = math.max(1L, st.getLong(0) / st.getLong(1))
          val shownBw = if (budget == "fixed") 8
            else graft.operators.Similarity.autoBeamWidth(4, nLists)
          val shownDp = if (budget == "fixed") 4
            else graft.operators.Similarity.autoBeamDepth(nLists, meanDeg)
          val shownEc = if (budget == "fixed") 2
            else graft.operators.Similarity.autoEntryCells(nLists)
          println(s"$m,$n,pq_beam_auto,cells=$nLists,budget=$budget," +
            s"deg=$meanDeg,bw=$shownBw,dp=$shownDp,ec=$shownEc," +
            s"agree=${"%.3f".format(agree)},sec=${"%.2f".format(sec)}")
        }
        Seq(vecs, art, centDf, navFixed, navAuto)
          .foreach(graft.operators.CacheScope.unpinCheckpoint)
      }
      // Round-10 (VERDICT r9 #3): tiered vs full exact span dedup on a
      // LIGHTLY-duplicated corpus — the regime the composition exists
      // for. Every copy's tokens are uniquified (no cross-copy window
      // repeats), then a fixed 30-token passage is planted in 2% of
      // docs: tier 1 flags only those neighborhoods, so tier 2's
      // O(n·L)-character range sort touches a small fraction of the
      // corpus. The tiered_spans row above runs the SAME pair on the
      // m× near-dup corpus — the composition's worst case (nearly every
      // window flagged) — so the four rows bracket both regimes.
      if (wanted("light_spans")) {
        val passage = (0 until 30).map(j => s"plantedtok$j").mkString(" ")
        val uniq = (0 until m).map { i =>
          base.select(
            (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1c$i").as("text"))
        }.reduce(_ unionByName _)
        val planted = uniq.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(50)) === 0,
            concat(col("text"), lit(" " + passage)))
            .otherwise(col("text")).as("text"))
          .localCheckpoint(true)
        runOnce("light_spans_full") {
          graft.operators.SuffixDedup.duplicateSpans(planted, "doc_id",
            "text", minLen = 10)
        }
        runOnce("light_spans_tiered") {
          graft.operators.SuffixDedup.tieredDuplicateSpans(planted, "doc_id",
            "text", minLen = 10)
        }
        // At minLen=10 with short synthetic tokens the suffix sort key
        // (~65 B) is only ~2× tier 1's 16-byte digest, so the tier's win
        // is mostly hidden at local scale; minLen=50 widens the key to
        // ~300 B/position — the regime where shipping digests and
        // sorting only flagged neighborhoods visibly beats sorting the
        // corpus (the 30-token passage is below 50, so a longer one is
        // planted for this pair).
        val passage50 = (0 until 70).map(j => s"longplant$j").mkString(" ")
        val planted50 = uniq.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(50)) === 0,
            concat(col("text"), lit(" " + passage50)))
            .otherwise(col("text")).as("text"))
          .localCheckpoint(true)
        runOnce("light50_spans_full") {
          graft.operators.SuffixDedup.duplicateSpans(planted50, "doc_id",
            "text", minLen = 50)
        }
        runOnce("light50_spans_tiered") {
          graft.operators.SuffixDedup.tieredDuplicateSpans(planted50,
            "doc_id", "text", minLen = 50)
        }
        graft.operators.CacheScope.unpinCheckpoint(planted)
        graft.operators.CacheScope.unpinCheckpoint(planted50)
      }
      graft.queries.PipelineQueries.resetCache(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
