package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away quickly"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog and runs away fast"),    // exact dup of 1
    (5L, "spark query engines shuffle data between executors during joins"))
    .toDF("doc_id", "text")

  test("exact dedup: canonical is min id per identical text") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id", "canonical_id", "is_dup")
      .as[(Long, Long, Int)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(out(4L) == ((1L, 1)))
    assert(out(1L) == ((1L, 0)))
    assert(out(3L) == ((3L, 0)))
  }

  test("minhash LSH surfaces the planted near-dup pair and the exact pair") {
    val pairs = Dedup.minhashDedup(docs, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup must be a candidate")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "near-dup should bucket together with 16 bands of 2")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((1L, 5L)))
  }

  test("portable md5 hash family: same planted pairs as the xxhash64 default") {
    // q43/q44 run the portable variants so DuckDB can replicate them; pin
    // here that the hash swap preserves the operator's findings.
    val mh = Dedup.minhashDedup(docs, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3,
      hash = Dedup.PortableMd5Family)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh.contains((1L, 4L)))
    assert(!mh.contains((1L, 3L)) && !mh.contains((1L, 5L)))
    val sigs = Dedup.simhash(docs, "doc_id", "text",
      nBits = 60, tokenHash = Dedup.portableTokenHash)
    val m = sigs.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(4L), "identical docs share the portable 60-bit signature")
    assert(m.values.forall(s => s >= 0 && s < (1L << 60)), "60-bit domain")
    val sh = Dedup.simhashPairs(sigs, maxHamming = 15, nBits = 60)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sh.contains((1L, 4L)))
  }

  test("shared minhash build: one build feeds multiple cap/overflow operating points") {
    // VERDICT r5 #3: q43 and q83 share the shingle→sign→band front half.
    // minhashDedupFromBuild over ONE build must reproduce the standalone
    // operator at EACH operating point (default-cap Drop, tiny-cap Salt).
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Double)] =
      df.select("id_a", "id_b", "est_jaccard", "jaccard")
        .as[(Long, Long, Double, Double)].collect().toSet
    val b = Dedup.minhashBuild(docs, "doc_id", "text", n = 3, k = 32,
      bands = 16)
    val viaBuild = pairs(Dedup.minhashDedupFromBuild(b, threshold = 0.3))
    val direct = pairs(Dedup.minhashDedup(docs, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3))
    assert(viaBuild == direct, "default operating point must match standalone")
    val viaBuildSalt = pairs(Dedup.minhashDedupFromBuild(b, threshold = 0.3,
      maxBucket = 2, overflow = Dedup.Overflow.Salt))
    val directSalt = pairs(Dedup.minhashDedup(docs, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3, maxBucket = 2,
      overflow = Dedup.Overflow.Salt))
    assert(viaBuildSalt == directSalt, "salted operating point must match standalone")
    spark.catalog.clearCache()
  }

  test("neardupClusters: transitive closure, numeric-min cluster id, sizes") {
    // Fixture pairs at this operating point: (1,2) near, (1,4) exact,
    // (2,4) inherited -> one transitive cluster {1,2,4}; docs 3 and 5
    // pair with nothing and are absent (sparse representation).
    val out = Dedup.neardupClusters(docs, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 4L), s"clustered docs: ${out.keySet}")
    assert(out.values.toSet == Set((1L, 3L)),
      "one cluster, id = min member (1), size 3")

    // A chain A~B, B~C where A and C do NOT pair directly must still be
    // one cluster (the transitive property pairwise keep-first lacks).
    // 20 tokens; B changes A's last 3, C changes B's first 3:
    // j(A,B) = j(B,C) = 15/21 ≈ 0.71 ≥ 0.6, j(A,C) = 12/24 = 0.5 < 0.6.
    val mid = (4 to 17).map(i => s"w$i").mkString(" ")
    val chain = Seq(
      (10L, s"w1 w2 w3 $mid w18 w19 w20"),
      (11L, s"w1 w2 w3 $mid x18 x19 x20"),
      (12L, s"y1 y2 y3 $mid x18 x19 x20"))
      .toDF("doc_id", "text")
    val directPairs = Dedup.minhashDedup(chain, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(directPairs == Set((10L, 11L), (11L, 12L)),
      s"fixture must be a true chain (no direct 10~12 pair): $directPairs")
    val cl = Dedup.neardupClusters(chain, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.6)
      .as[(Long, Long, Long)].collect()
    assert(cl.length == 3, s"all three chain docs cluster: ${cl.toSeq}")
    assert(cl.forall(r => r._2 == 10L && r._3 == 3L),
      s"chain closed transitively into one cluster: ${cl.toSeq}")
  }

  test("neardupClusters rejects non-integral id columns instead of nulling them") {
    val bad = Seq(("a", "some text here"), ("b", "other text here"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.neardupClusters(bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("incremental minhash: batch pairs against corpus only, artifact path identical") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "completely different content about spark query engines and shuffles"),
      (3L, "a third corpus document with its own very distinct token stream"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog and runs away quickly"), // near-dup of 1
      (102L, "a third corpus document with its own very distinct token stream"),   // exact dup of 3
      (103L, "brand new material sharing nothing with anything ingested before"))
      .toDF("doc_id", "text")

    val out = Dedup.incrementalMinhash(batch, corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3)
    val pairs = out.select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    assert(pairs.contains((101L, 1L)), s"near-dup probe missing: $pairs")
    assert(pairs((102L, 3L)) == 1.0, "exact dup of an ingested doc has jaccard 1")
    assert(!pairs.keys.exists(_._1 == 103L), "novel doc pairs with nothing")
    assert(pairs.keys.forall(p => p._1 > 100L && p._2 < 100L),
      "pairs are strictly batch x corpus (no corpus-internal, no batch-internal)")

    // Precomputed signature-table artifact gives the identical result —
    // the store-once / probe-daily path.
    val table = Dedup.minhashBandTable(corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16)
    val viaArtifact = Dedup.incrementalMinhash(batch, corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3, corpusBands = Some(table))
      .select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(viaArtifact == pairs)

    // The candidate probe broadcasts the batch side: the corpus signature
    // table is never shuffled for the join.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast candidate probe in plan:\n$plan")
  }

  test("appendToBandTable: append == rebuild, and probes agree") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "completely different content about spark query engines and shuffles"))
      .toDF("doc_id", "text")
    val increment = Seq(
      (101L, "a freshly ingested document with its own distinct token stream"),
      (102L, "the quick brown fox jumps over the lazy dog and runs away fast"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (201L, "a freshly ingested document with its own distinct word stream"), // near-dup of 101
      (202L, "totally unrelated probe content mentioning nothing seen before"))
      .toDF("doc_id", "text")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "band", "bh", "sig")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getSeq[Long](3))).toSet

    val artifact = Dedup.minhashBandTable(corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16)
    val appended = Dedup.appendToBandTable(artifact, increment, "doc_id", "text",
      n = 3, k = 32, bands = 16)
    val rebuilt = Dedup.minhashBandTable(corpus.unionByName(increment),
      "doc_id", "text", n = 3, k = 32, bands = 16)
    assert(canon(appended) == canon(rebuilt), "band tables must be set-equal")

    val grown = corpus.unionByName(increment)
    def probePairs(bands: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalMinhash(probe, grown, "doc_id", "text",
        n = 3, k = 32, bands = 16, threshold = 0.3, corpusBands = Some(bands))
        .select("batch_id", "corpus_id", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val viaAppend = probePairs(appended)
    assert(viaAppend == probePairs(rebuilt))
    assert(viaAppend.exists(p => p._1 == 201L && p._2 == 101L),
      s"probe must see the doc the append folded in: $viaAppend")
  }

  test("appendToBandTable at the cap boundary: sidecar restores exact rebuild parity") {
    // maxBucket = 2; three identical docs -> every (band, bh) bucket has 3
    // members and is dropped at BUILD time. A 1-doc batch with the same
    // text then re-touches those buckets.
    val trip = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val one = Seq(
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val artifact = Dedup.minhashBandTable(trip, "doc_id", "text",
      n = 3, k = 32, bands = 16, maxBucket = 2)
    assert(artifact.count() == 0, "build drops the over-cap buckets")
    val rebuilt = Dedup.minhashBandTable(trip.unionByName(one), "doc_id", "text",
      n = 3, k = 32, bands = 16, maxBucket = 2)
    assert(rebuilt.count() == 0, "rebuild drops them too (cap is monotone)")

    // Sidecar-less append keeps the batch rows (documented recall-only
    // divergence: batch rows alone sit under the cap).
    val noSidecar = Dedup.appendToBandTable(artifact, one, "doc_id", "text",
      n = 3, k = 32, bands = 16, maxBucket = 2)
    assert(noSidecar.count() == 16, "batch rows survive without the sidecar")

    // With the uncapped bucket-count sidecar, append == rebuild bit-exactly.
    val counts = Dedup.bandBucketCounts(trip, "doc_id", "text",
      n = 3, k = 32, bands = 16)
    val withSidecar = Dedup.appendToBandTable(artifact, one, "doc_id", "text",
      n = 3, k = 32, bands = 16, maxBucket = 2, bucketCounts = Some(counts))
    assert(withSidecar.count() == 0, "sidecar closes the divergence")
  }

  test("chained appends: the UPDATED sidecar keeps parity when the chain crosses the cap") {
    // maxBucket = 3. Build with 2 identical docs (bucket size 2, kept);
    // append one more identical doc (3 <= 3, kept); append a fourth
    // (4 > 3 -> rebuild drops the bucket). A STALE build-time sidecar
    // would compute 2 + 1 = 3 <= 3 at the second append and silently keep
    // the bucket; the carried sidecar computes 3 + 1 = 4 and drops it.
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def doc(ids: Long*) = ids.map(i => (i, text)).toDF("doc_id", "text")
    val (art0, cnt0) = Dedup.minhashBandTableWithCounts(doc(1L, 2L),
      "doc_id", "text", n = 3, k = 32, bands = 16, maxBucket = 3)
    assert(art0.count() == 32, "2 docs x 16 bands under the cap")
    val (art1, cnt1) = Dedup.appendToBandTableWithCounts(art0, cnt0,
      doc(3L), "doc_id", "text", n = 3, k = 32, bands = 16, maxBucket = 3)
    assert(art1.count() == 48, "3 docs x 16 bands still under the cap")
    val (art2, _) = Dedup.appendToBandTableWithCounts(art1, cnt1,
      doc(4L), "doc_id", "text", n = 3, k = 32, bands = 16, maxBucket = 3)
    assert(art2.count() == 0, "4th copy pushes every bucket over the cap")
    val rebuilt = Dedup.minhashBandTable(doc(1L, 2L, 3L, 4L), "doc_id",
      "text", n = 3, k = 32, bands = 16, maxBucket = 3)
    assert(rebuilt.count() == 0, "chained append == rebuild at the boundary")
    // The stale-sidecar misuse the API now steers away from: reusing cnt0
    // at step 2 would keep all 48 + 16 rows.
    val stale = Dedup.appendToBandTable(art1, doc(4L), "doc_id", "text",
      n = 3, k = 32, bands = 16, maxBucket = 3, bucketCounts = Some(cnt0))
    assert(stale.count() == 64, "stale sidecar demonstrably under-counts")
  }

  test("Overflow.Salt: planted mega-bucket recovers pairs/docs the Drop policy loses") {
    // 40 DISTINCT mutual near-dups (common 30-token prefix, unique tail):
    // every LSH band bucket holds most of them, so with cap = 5 the Drop
    // policy discards the hot buckets — on boilerplate-heavy corpora
    // exactly where the duplicates are.
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = (0L until 40L).map(i => (i, s"$base extra$i"))
      .toDF("doc_id", "text")
    val cap = 5
    def run(ov: Dedup.Overflow) = Dedup.minhashDedup(docs, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.7, maxBucket = cap,
      overflow = ov).select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val dropped = run(Dedup.Overflow.Drop)
    val salted = run(Dedup.Overflow.Salt)
    assert(salted.size > dropped.size,
      s"salting must recover pairs: drop=${dropped.size} salt=${salted.size}")
    // No false positives: the exact-verify stage still gates every pair.
    assert(salted.forall(_._3 >= 0.7), "salted pairs must be true near-dups")

    // Doc-level recovery (the transitive-closure consumer's view): under
    // Salt, (nearly) every mega-bucket member gains at least one verified
    // edge, so clustering recovers most DOCS even though pair recall per
    // bucket is ~cap/B.
    def docsInClusters(ov: Dedup.Overflow) =
      Dedup.neardupClusters(docs, "doc_id", "text", n = 3, k = 32,
        bands = 16, threshold = 0.7, maxBucket = cap, overflow = ov)
        .select("id").as[Long].collect().toSet.size
    val saltDocs = docsInClusters(Dedup.Overflow.Salt)
    assert(saltDocs >= 30,
      s"salting should cluster most of the 40 planted dups, got $saltDocs")
    assert(saltDocs > docsInClusters(Dedup.Overflow.Drop))

    // Bounded cost: sub-buckets stay near the cap (hash-split variance
    // bounded well below the 40-row unsalted bucket).
    val banded = Dedup.bandRowsUncapped(docs, "doc_id", "text",
      n = 3, k = 32, bands = 16)
    val maxSub = Dedup.capBucketsSalted(banded, Seq("band", "bh"), cap)
      .groupBy("band", "bh", "bsalt").count()
      .agg(max("count")).as[Long].head()
    assert(maxSub <= 3L * cap, s"sub-bucket blew past the bound: $maxSub")

    // Observability: the stats frame quantifies what Drop discards.
    val stats = Dedup.bucketOverflowStats(banded, Seq("band", "bh"), cap)
      .as[(Long, Long, Long, Long)].head()
    assert(stats._2 > 0 && stats._3 > 0, s"expected over-cap buckets: $stats")
    assert(stats._4 >= 30, s"mega-bucket should dominate: $stats")
    val unbounded = Dedup.bucketOverflowStats(banded, Seq("band", "bh"), 0)
      .as[(Long, Long, Long, Long)].head()
    assert(unbounded._2 == 0 && unbounded._3 == 0)
    // Empty input yields zeros, not NULLs (alert thresholds vs NULL
    // silently never fire).
    val empty = Dedup.bucketOverflowStats(banded.filter(lit(false)),
      Seq("band", "bh"), cap).as[(Long, Long, Long, Long)].head()
    assert(empty == ((0L, 0L, 0L, 0L)), s"empty-input stats: $empty")
    spark.catalog.clearCache()
  }

  test("artifactFromBandLog: log-derived state == rebuild == append chain across the cap") {
    // The durable-stream invariant: the capped artifact and exact sidecar
    // are pure functions of the UNCAPPED band-row log, bit-exact with both
    // a from-scratch build and the sidecar-exact append chain — pinned at
    // a cap boundary (maxBucket = 3, 4 identical docs arriving 2 + 1 + 1).
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def doc(ids: Long*) = ids.map(i => (i, text)).toDF("doc_id", "text")
    val uniq = Seq((100L, "completely unrelated content with its own tokens"))
      .toDF("doc_id", "text")
    def bandRows(df: org.apache.spark.sql.DataFrame) =
      Dedup.bandRowsUncapped(df, "doc_id", "text", n = 3, k = 32, bands = 16)

    val log = bandRows(doc(1L, 2L).unionByName(uniq))
      .unionByName(bandRows(doc(3L)))
      .unionByName(bandRows(doc(4L)))
    val (la, lc) = Dedup.artifactFromBandLog(log, maxBucket = 3)

    val all = doc(1L, 2L, 3L, 4L).unionByName(uniq)
    val (ra, rc) = Dedup.minhashBandTableWithCounts(all, "doc_id", "text",
      n = 3, k = 32, bands = 16, maxBucket = 3)
    assert(la.exceptAll(ra).isEmpty && ra.exceptAll(la).isEmpty,
      "log-derived artifact != rebuild")
    assert(lc.exceptAll(rc).isEmpty && rc.exceptAll(lc).isEmpty,
      "log-derived sidecar != rebuild sidecar")
    // The over-cap mega-bucket is dropped, the unique doc survives.
    assert(la.filter(col("id") <= 4L).count() == 0)
    assert(la.filter(col("id") === 100L).count() == 16)

    val (a0, c0) = Dedup.minhashBandTableWithCounts(
      doc(1L, 2L).unionByName(uniq), "doc_id", "text",
      n = 3, k = 32, bands = 16, maxBucket = 3)
    val (a1, c1) = Dedup.appendToBandTableWithCounts(a0, c0, doc(3L),
      "doc_id", "text", n = 3, k = 32, bands = 16, maxBucket = 3)
    val (a2, c2) = Dedup.appendToBandTableWithCounts(a1, c1, doc(4L),
      "doc_id", "text", n = 3, k = 32, bands = 16, maxBucket = 3)
    assert(a2.exceptAll(la).isEmpty && la.exceptAll(a2).isEmpty,
      "append chain != log-derived artifact")
    assert(c2.exceptAll(lc).isEmpty && lc.exceptAll(c2).isEmpty,
      "append-chain sidecar != log-derived sidecar")
    spark.catalog.clearCache()
  }

  test("minhash est_jaccard is 1.0 for identical docs") {
    val est = Dedup.minhashCandidates(
      Dedup.minhashSignatures(Dedup.shingles(docs, "doc_id", "text"), 32), 8, 4)
      .filter(col("id_a") === 1 && col("id_b") === 4)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("simhash: identical docs share signatures; near-dups within small hamming") {
    val sigs = Dedup.simhash(docs, "doc_id", "text")
    val m = sigs.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(4L))
    val ham12 = java.lang.Long.bitCount(m(1L) ^ m(2L))
    val ham13 = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(ham12 < ham13, s"near-dup hamming $ham12 should beat unrelated $ham13")
    val pairs = Dedup.simhashPairs(sigs, maxHamming = 15)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("simhashPairs recall at maxHamming=15 vs brute force (partial by design)") {
    // Banding is 4x16-bit chunks: complete recall only to Hamming 3; the
    // q44 operating point (15) accepts partial recall — measure it so the
    // tradeoff is pinned, and pin completeness in the guaranteed regime.
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(40)(rnd.nextLong())
    // Half the corpus: random signatures; other half: small perturbations
    // of base signatures (flip 1-12 random bits) so close pairs exist.
    val sigRows = base.zipWithIndex.flatMap { case (s, i) =>
      val flips = 1 + rnd.nextInt(12)
      val mutated = (0 until flips).foldLeft(s)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
      Seq((i.toLong * 2, s), (i.toLong * 2 + 1, mutated))
    }
    val sigs = sigRows.toDF("id", "simhash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val all = for {
      (ia, sa) <- sigRows; (ib, sb) <- sigRows if ia < ib
    } yield ((ia, ib), ham(sa, sb))
    val brute15 = all.collect { case (p, h) if h <= 15 => p }.toSet
    val brute3 = all.collect { case (p, h) if h <= 3 => p }.toSet
    val banded = Dedup.simhashPairs(sigs, maxHamming = 15)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(brute15), "no false positives past the verify filter")
    assert(brute3.subsetOf(banded), "pigeonhole: complete recall to Hamming 3")
    val recall = if (brute15.isEmpty) 1.0 else (banded & brute15).size.toDouble / brute15.size
    assert(recall >= 0.5, s"recall $recall at maxHamming=15 collapsed")
  }

  test("mega-cluster of identical docs: pre-collapse keeps banding linear, pairs complete") {
    // 200 byte-identical docs + one near-dup + one unrelated: the collapsed
    // pipeline bands ONE representative (no quadratic bucket join, no
    // quadratic shingle verification) yet must still emit every member pair.
    val n = 200
    val mega = (1L to n.toLong).map(i =>
      (i, "the quick brown fox jumps over the lazy dog and runs away fast"))
    val rest = Seq(
      (900L, "the quick brown fox jumps over the lazy dog and runs away quickly"),
      (901L, "completely different content about spark query engines and shuffles"))
    val df = (mega ++ rest).toDF("doc_id", "text")

    val mh = Dedup.minhashDedup(df, "doc_id", "text",
      n = 3, k = 32, bands = 16, threshold = 0.3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val mhPairs = mh.map(t => (t._1, t._2)).toSet
    val withinExpected = n.toLong * (n - 1) / 2
    assert(mh.count(t => t._3 == 1.0d) >= withinExpected,
      "every identical-pair must surface with jaccard 1.0")
    assert(mhPairs.contains((1L, n.toLong)), "first/last of the mega-cluster pair up")
    assert(mhPairs.contains((1L, 900L)), "cross near-dup pair inherited from the representative")
    assert(!mhPairs.exists(p => p._1 == 901L || p._2 == 901L), "unrelated doc stays out")

    val sigs = Dedup.simhash(df, "doc_id", "text")
    val sh = Dedup.simhashPairs(sigs, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(sh.count(_._3 == 0) >= withinExpected)
    assert(sh.map(t => (t._1, t._2)).toSet.contains((1L, n.toLong)))
  }

  test("fingerprints: identical docs get identical fingerprints") {
    val fp = TextAnalysis.fingerprints(docs, "doc_id", "text")
      .as[(Long, Seq[String])].collect().toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L).size <= 8)
  }

  test("compressionRatio: repetitive text compresses far below varied text") {
    val rnd = new scala.util.Random(5)
    val varied = (0 until 400).map(_ => rnd.nextInt(1000000).toString).mkString(" ")
    val repetitive = "the same boilerplate line repeated forever " * 60
    val df = Seq((1L, repetitive), (2L, varied), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val (_, rawRep, compRep, ratioRep) = out(1L)
    val (_, rawVar, _, ratioVar) = out(2L)
    assert(rawRep == repetitive.getBytes("UTF-8").length.toLong)
    assert(rawVar == varied.getBytes("UTF-8").length.toLong)
    assert(compRep < rawRep && ratioRep < 0.1, s"repetitive ratio $ratioRep")
    assert(ratioVar > 0.3, s"varied ratio $ratioVar")
    assert(ratioRep < ratioVar / 3)
    assert(out(3L) == ((3L, 0L, out(3L)._3, 1.0))) // empty doc pinned to 1.0
    // Determinism across runs (one Deflater per partition, reset per row).
    val again = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("domainBlocklistFilter: exact + subdomain hits, case/port-insensitive, no joins") {
    val fixture = Seq(
      (1L, "https://spam.example/a and http://ok.org and http://A.Spam.Example:9/x"),
      (2L, "no urls"),
      (3L, "https://fineads.net/ok only")).toDF("id", "text")
    val out = TextAnalysis.domainBlocklistFilter(fixture, "id", "text",
      Seq("Spam.Example", "ads.net"))
      .as[(Long, Long, Long, String, Int)].collect().map(r => r._1 -> r).toMap
    // Doc 1: 3 urls, exact + case-folded subdomain (port stripped) blocked.
    assert(out(1L) == ((1L, 3L, 2L, "a.spam.example,spam.example", 0)))
    // No-URL doc survives with zero counts; containment is NOT a match.
    assert(out(2L) == ((2L, 0L, 0L, "", 1)))
    assert(out(3L) == ((3L, 1L, 0L, "", 1)))
    // Plan-literal OR chain: no join anywhere in the plan.
    val plan = TextAnalysis.domainBlocklistFilter(fixture, "id", "text",
      Seq("x.y")).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan.take(300))
  }

  test("gopherRules: each rule trips independently, exact integer decisions") {
    def words(n: Int, len: Int, prefix: String = "w"): String =
      (0 until n).map(i => (prefix + i).padTo(len, 'x').take(len)).mkString(" ")
    val docs = Seq(
      // 1: passes every rule — 40 words, mean 4.95, top 1/40, 2 required.
      (1L, "table row " + words(38, 5)),
      // 2: too few words (10).
      (2L, "table row " + words(8, 5)),
      // 3: too many words (95).
      (3L, "table row " + words(93, 5)),
      // 4: mean word length 3.05 < 4.2.
      (4L, "table row " + words(38, 3)),
      // 5: one token is 25% of the doc (> 10% cap).
      (5L, "table row " + ("dup " * 10).trim + " " + words(28, 5, "q")),
      // 6: 10/40 digit-only words -> alpha 75% < 80% (distinct digit
      // words keep the repetition rule green).
      (6L, "table row " + words(28, 5) + " " +
        (0 until 10).map(i => s"123$i").mkString(" ")),
      // 7: only 1 required word.
      (7L, "table " + words(39, 5)),
      // 8: required-word hits count DISTINCT words — "table" twice is 1.
      (8L, "table table " + words(38, 5)))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select("id", "n_words", "words_ok", "mean_len_ok", "rep_ok",
        "alpha_ok", "req_ok", "keep", "req_hits")
      .collect().map(r => r.getLong(0) -> r).toMap

    def flags(id: Long): Seq[Int] =
      (2 to 7).map(i => out(id).getInt(i))
    assert(flags(1L) == Seq(1, 1, 1, 1, 1, 1), "doc 1 passes all")
    assert(flags(2L) == Seq(0, 1, 1, 1, 1, 0), "doc 2 fails words only")
    assert(flags(3L) == Seq(0, 1, 1, 1, 1, 0), "doc 3 fails words only")
    assert(flags(4L) == Seq(1, 0, 1, 1, 1, 0), "doc 4 fails mean length only")
    assert(flags(5L) == Seq(1, 1, 0, 1, 1, 0), "doc 5 fails repetition only")
    assert(flags(6L) == Seq(1, 1, 1, 0, 1, 0), "doc 6 fails alpha only")
    assert(flags(7L) == Seq(1, 1, 1, 1, 0, 0), "doc 7 fails required words only")
    assert(out(8L).getLong(8) == 1L, "duplicate required word counts once")
    // Exact-boundary checks ride on doc 1: 40 words in [30, 90] and the
    // integer cross-multiplied mean (198/40 = 4.95) inside [4.2, 5.0].
    assert(out(1L).getLong(1) == 40L)
  }

  test("linearProbeScore: hand-computed sigmoids, bias, monotone in dot") {
    val emb = Seq(
      (1L, Array(0.5f, 0f, 0f)),
      (2L, Array(-0.5f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f)),
      (4L, Array(2.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val w = Array(2.0, 0.0, 0.0)
    val out = Similarity.linearProbeScore(emb, "vec_id", "embedding", w)
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.731059, "sigmoid(1.0) rounded to 6")
    assert(out(2L) == 0.268941, "sigmoid(-1.0) rounded to 6")
    assert(out(3L) == 0.5)
    assert(out(4L) > out(1L) && out(1L) > out(3L) && out(3L) > out(2L))
    val biased = Similarity.linearProbeScore(emb, "vec_id", "embedding",
      w, bias = 1.0).as[(Long, Double)].collect().toMap
    assert(biased(3L) == 0.731059, "bias shifts the zero vector to sigmoid(1)")
  }

  test("langId picks marker-heavy language deterministically") {
    val df = Seq(
      (1L, "the cat and the dog is in the house"),
      (2L, "el gato y la casa de los perros es que si"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "doc_id", "text")
      .select("id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("vocabulary: hand-computed ranks, tie order, and coverage curve") {
    // 9 occurrences total: b=4, a=3, c=1, d=1 (the double space is noise).
    val df = Seq(
      (1L, "b b b a a c"),
      (2L, "a d  b")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(df, "doc_id", "text", topK = 3)
      .as[(Int, String, Long, Double)].collect()
    // b(4) then a(3) then c(1) — c beats d on the token-asc tie-break;
    // coverage = 4/9, 7/9, 8/9 rounded to 6 places.
    assert(out.toSeq == Seq(
      (1, "b", 4L, 0.444444),
      (2, "a", 3L, 0.777778),
      (3, "c", 1L, 0.888889)), out.mkString(","))
  }

  test("multimodal stub: decode/features/frames are deterministic and partition-safe") {
    implicit val s = spark
    val assets = Multimodal.assetsFromText(
      docs.repartition(3), "doc_id", "text", "video")
    val meta = Multimodal.decodeMeta(assets).collect().map(m => m.asset_id -> m).toMap
    assert(meta.size == 5)
    assert(meta(1L) == meta(4L).copy(asset_id = 1L), "same bytes → same meta")
    assert(meta(1L).n_frames >= 1)
    val feats = Multimodal.extractFeatures(assets, dim = 8).collect()
      .map(f => f.asset_id -> f.feature.toSeq).toMap
    assert(feats(1L) == feats(4L))
    assert(feats(1L).size == 8)
    val frames = Multimodal.sampleFrames(assets, every = 100).collect()
    assert(frames.nonEmpty)
    val resized = Multimodal.resizeAssets(assets, 128, 128).collect()
      .map(r => r.asset_id -> r).toMap
    assert(resized.size == 5)
    assert(resized(1L).width == 128 && resized(1L).height == 128)
    assert(resized(1L).content.toSeq == resized(4L).content.toSeq,
      "same bytes + same target dims → same resized payload")
    assert(resized(1L).content.length == 128 * 128 / 64)
  }
}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force topk: rank 1 is the max-cosine neighbor") {
    val queries = emb.filter(col("vec_id") < 3)
    val top = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
    val ranks = top.groupBy("q_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(ranks.values.forall(_ == 3))
    // sims non-increasing per query
    val rows = top.orderBy("q_id", "rank")
      .select("q_id", "rank", "sim").as[(Long, Int, Double)].collect()
    rows.groupBy(_._1).values.foreach { g =>
      val sims = g.sortBy(_._2).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN: reasonable recall@5 against brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // Random 64-d gaussians are LSH's worst case (top-5 cosine ≈ 0.4 →
    // per-bit agreement ≈ 0.63); short signatures + many tables is the
    // right operating point: E[hit] ≈ 1-(1-0.63^6)^12 ≈ 0.57.
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      nTables = 12, nBits = 6)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall > 0.3, s"recall $recall")
  }

  test("LSH ANN with portable hyperplanes: recall holds at the q45 operating point") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      nTables = 12, nBits = 6, planes = Similarity.portableHyperplanes)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall > 0.3, s"portable-plane recall $recall")
  }

  test("IVF ANN: probing all cells equals brute force; partial probe keeps recall") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // nProbe == nLists probes every Voronoi cell → candidate set is the
    // whole corpus → exactly the brute-force answer.
    val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nLists = 8, nProbe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(full == brute, "full probe must equal brute force")
    // Partial probe: recall < 1 by construction but must stay useful even
    // on random gaussians (cells are near-random there).
    val partial = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nLists = 8, nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute & partial).size.toDouble / brute.size
    assert(recall > 0.3, s"recall $recall")
  }

  test("IVF beam: wide-entry depth-0 == plain IVF; full-degree one hop == plain IVF; sparse navigation keeps recall") {
    val queries = emb.filter(col("vec_id") < 20)
    val plain = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nLists = 8, nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // Entry set = every cell, depth 0: the entry beam IS the nProbe
    // nearest cells, so beam == plain IVF exactly.
    val wide = Similarity.ivfBeamTopK(emb, queries, "vec_id", "embedding", 5,
      nLists = 8, beamWidth = 4, depth = 0, degree = 3, entryCells = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(wide == plain, "depth-0 wide-entry beam must equal plain IVF")
    // Fully-connected centroid graph, one expansion from a single entry
    // cell: round 1 sees every cell, so the kept beam is again the 4
    // nearest cells — navigation converges to the scan's answer.
    val hop = Similarity.ivfBeamTopK(emb, queries, "vec_id", "embedding", 5,
      nLists = 8, beamWidth = 4, depth = 1, degree = 7, entryCells = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(hop == plain, "full-degree one-hop beam must equal plain IVF")
    // Genuinely sparse navigation (degree 3, depth 2, two entry cells):
    // recall vs brute force must stay useful even on random gaussians.
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 5).select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val beam = Similarity.ivfBeamTopK(emb, queries, "vec_id", "embedding", 5,
      nLists = 8, beamWidth = 4, depth = 2, degree = 3, entryCells = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute & beam).size.toDouble / brute.size
    assert(recall > 0.2, s"beam recall $recall")
  }

  test("quantized IVF at full probe == sequential SQ8 reference (incl. degenerate dim)") {
    // VERDICT r11 #4: SQ8 in the serving path. Small double-typed fixture
    // with one CONSTANT dimension (mx == mn → code 0, the degenerate
    // branch); full probe makes the candidate set all non-self vectors,
    // so the whole output frame — quantized ranks, integer dots, AND the
    // per-query n_in_float_topk overlap — must equal a sequential
    // reference that recomputes quantization/dots/ranks from scratch.
    val dims = 6
    val vecs: Map[Long, Array[Double]] = (0L until 24L).map { i =>
      i -> Array.tabulate(dims) { d =>
        if (d == 3) 0.25 // constant dim
        else math.sin(i * 2.7 + d * 1.3) * 0.4
      }
    }.toMap
    val df = vecs.toSeq.sortBy(_._1).map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val k = 5
    val got = Similarity.ivfTopKQuantized(df, df.filter(col("vec_id") < 4),
        "vec_id", "embedding", k, nLists = 4, nProbe = 4,
        fixedCentroids = Some(Similarity.portableCentroids(4, dims)))
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val mn = Array.tabulate(dims)(d => vecs.values.map(_(d)).min)
    val mx = Array.tabulate(dims)(d => vecs.values.map(_(d)).max)
    def code(v: Array[Double]): Array[Long] = Array.tabulate(dims) { d =>
      if (mx(d) > mn(d))
        math.min(255L, math.floor((v(d) - mn(d)) * 255.0 / (mx(d) - mn(d))).toLong)
      else 0L
    }
    def fix(v: Array[Double]): Array[Long] =
      v.map(x => math.floor(x * 1000000.0).toLong)
    val want = (0L until 4L).flatMap { q =>
      val cand = vecs.keys.filter(_ != q).toSeq
      def dots(enc: Array[Double] => Array[Long]): Map[Long, Long] =
        cand.map(n => n ->
          enc(vecs(q)).zip(enc(vecs(n))).map { case (a, b) => a * b }.sum).toMap
      val qd = dots(code); val fd = dots(fix)
      val qRank = cand.sortBy(n => (-qd(n), n)).zipWithIndex
        .map { case (n, r) => n -> (r + 1) }.toMap
      val fTop = cand.sortBy(n => (-fd(n), n)).take(k).toSet
      val overlap = qRank.count { case (n, r) => r <= k && fTop(n) }.toLong
      qRank.collect { case (n, r) if r <= k => (q, r, n, qd(n), overlap) }
    }.toSet
    assert(got === want)
  }

  test("SQ8 artifact serving == inline quantized IVF, through a parquet round-trip") {
    // The quantize-once face: build (artifact, centroids, stats) once,
    // persist the artifact, serve query batches from the stored packed
    // codes — output must equal ivfTopKQuantized's ranking columns at
    // the same parameters (queries quantize with the CORPUS stats; the
    // in-expression unpack inverts the pack exactly).
    val dims = 8
    val vecs = (0L until 40L).map { i =>
      (i, Seq.tabulate(dims)(d => math.cos(i * 1.9 + d * 0.7) * 0.3))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 5)
    val cents = Similarity.portableCentroids(4, dims)
    val inline = Similarity.ivfTopKQuantized(df, queries,
        "vec_id", "embedding", k = 5, nLists = 4, nProbe = 2,
        fixedCentroids = Some(cents))
      .select("q_id", "rank", "n_id", "q_dot")
      .as[(Long, Int, Long, Long)].collect().toSet
    val (artifact, centroids, stats) = Similarity.sq8IvfArtifact(df,
      "vec_id", "embedding", dims, nLists = 4, fixedCentroids = Some(cents))
    val tmp = java.nio.file.Files.createTempDirectory("sq8art").toString
    artifact.write.mode("overwrite").parquet(s"$tmp/artifact")
    val served = Similarity.ivfTopKQuantizedServe(
        spark.read.parquet(s"$tmp/artifact"), centroids, stats, queries,
        "vec_id", "embedding", dims, k = 5, nProbe = 2)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(served === inline && inline.nonEmpty)
  }

  test("SQ8 serving: the shuffle-join query path == the broadcast path (VERDICT r12 #4)") {
    // broadcastQueries = false is the corpus-sized-query contract: the
    // probed frame joins the artifact by SHUFFLE on the cell key. With
    // auto-broadcast disabled the cell join must really run as a
    // shuffle join (no driver-side collect of the query set anywhere),
    // and the results must be identical to the broadcast face.
    val dims = 8
    val vecs = (0L until 40L).map { i =>
      (i, Seq.tabulate(dims)(d => math.sin(i * 1.3 + d * 0.9) * 0.4))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.portableCentroids(4, dims)
    val (artifact, centroids, stats) = Similarity.sq8IvfArtifact(df,
      "vec_id", "embedding", dims, nLists = 4, fixedCentroids = Some(cents))
    val viaBroadcast = Similarity.ivfTopKQuantizedServe(artifact, centroids,
        stats, df, "vec_id", "embedding", dims, k = 3, nProbe = 2)
      .as[(Long, Int, Long, Long)].collect().toSet
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = Similarity.ivfTopKQuantizedServe(artifact, centroids,
        stats, df, "vec_id", "embedding", dims, k = 3, nProbe = 2,
        broadcastQueries = false)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
        s"cell join did not run as a shuffle join:\n$plan")
      assert(shuffled.as[(Long, Int, Long, Long)].collect().toSet ===
        viaBroadcast)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("semanticDedupQuantized == brute-force quantized reference (single cell)") {
    // nLists = 1 puts every vector in one cell, so the IVF candidate
    // scope is total and the reference is computable exactly: SQ8-code
    // each vector with the corpus min/max, integer dots, per-query
    // top-k (dot desc, id), union of pairs clearing minDot,
    // canonicalized.
    val dims = 8
    val vecs = (0L until 25L).map { i =>
      i -> Array.tabulate(dims)(d => math.cos(i * 0.8 + d * 1.1) * 0.5)
    }.toMap
    val df = vecs.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val k = 4
    val minDot = 100000L
    val got = Similarity.semanticDedupQuantized(df, "vec_id", "embedding",
        dims, k = k, minDot = minDot, nLists = 1,
        fixedCentroids = Some(Similarity.portableCentroids(1, dims)))
      .as[(Long, Long, Long)].collect().toSet
    val mn = Array.tabulate(dims)(d => vecs.values.map(_(d)).min)
    val mx = Array.tabulate(dims)(d => vecs.values.map(_(d)).max)
    def code(v: Array[Double]): Array[Long] = Array.tabulate(dims) { d =>
      if (mx(d) > mn(d))
        math.max(0L, math.min(255L,
          math.floor((v(d) - mn(d)) * 255.0 / (mx(d) - mn(d))).toLong))
      else 0L
    }
    val codes = vecs.map { case (i, v) => i -> code(v) }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val want = codes.keys.flatMap { q =>
      codes.keys.filter(_ != q).toSeq
        .map(n => (n, dot(codes(q), codes(n))))
        .sortBy { case (n, s) => (-s, n) }.take(k)
        .filter(_._2 >= minDot)
        .map { case (n, s) => (math.min(q, n), math.max(q, n), s) }
    }.toSet
    assert(got === want && want.nonEmpty)
  }

  test("semanticDedupQuantized auto-sizes nLists: parity with the explicit count (VERDICT r13 #4)") {
    // The default must PICK nLists = max(16, ceil(N / targetCellSize))
    // from one corpus count, so a caller using defaults can never land
    // in the quadratic-at-fixed-nLists regime. Parity: the auto run
    // equals the run that passes the same count explicitly (identical
    // seed → identical k-means → identical pairs).
    val corpus = emb.limit(200) // auto at targetCellSize 10 → 20 lists
    val auto = Similarity.semanticDedupQuantized(corpus, "vec_id",
        "embedding", dim = 64, k = 3, minDot = 0L, targetCellSize = 10)
      .as[(Long, Long, Long)].collect().toSet
    val explicitRun = Similarity.semanticDedupQuantized(corpus, "vec_id",
        "embedding", dim = 64, k = 3, minDot = 0L, nLists = 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(auto === explicitRun && auto.nonEmpty)
    // the floor engages: a tiny corpus still gets 16 lists, not 1
    val tiny = Similarity.semanticDedupQuantized(emb.limit(30), "vec_id",
        "embedding", dim = 64, k = 2, minDot = 0L)
      .as[(Long, Long, Long)].collect().toSet
    val tinyExplicit = Similarity.semanticDedupQuantized(emb.limit(30),
        "vec_id", "embedding", dim = 64, k = 2, minDot = 0L, nLists = 16)
      .as[(Long, Long, Long)].collect().toSet
    assert(tiny === tinyExplicit)
  }

  test("PQ ANN: planted exact duplicate is always rank 1; codes are the compressed artifact") {
    // ADC distance of q to its identical twin = Σ_s min_c d2(q_s, c) —
    // the minimum any vector can score — so the twin MUST rank first
    // (ties by n_id can only add other code-identical vectors above k).
    val base = emb.limit(30)
    val dup = base.withColumn("vec_id", col("vec_id") + 100000)
    val books = Similarity.portableCodebooks(8, 16, 8)
    val queries = base.filter(col("vec_id") < 5)
    val top = Similarity.pqTopK(base.union(dup), queries,
      "vec_id", "embedding", k = 1, codebooks = books)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    assert(top.size == 5)
    top.foreach { case (q, n) =>
      assert(n == q + 100000, s"query $q: twin not rank-1 (got $n)")
    }
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val stats = codes.select(size(col("codes")).as("m"),
      array_min(col("codes")).as("lo"), array_max(col("codes")).as("hi"))
      .agg(min("m"), max("m"), min("lo"), max("hi"))
      .as[(Int, Int, Int, Int)].head()
    assert(stats._1 == 8 && stats._2 == 8, "every vector encodes to m codes")
    assert(stats._3 >= 0 && stats._4 < 16, "codes index the ksub codebook")
  }

  test("packed IVFADC serving == inline ivfPqTopK, through a parquet round-trip") {
    // The 4-bit packed artifact (one BIGINT for m = 8 codes) must serve
    // identically to the inline path at the same parameters — incl. the
    // degenerate nProbe = nLists full scan — and survive parquet.
    val cents = Similarity.portableCentroids(8, 64)
    val books = Similarity.portableCodebooks(8, 16, 8)
    val corpus = emb.limit(60)
    val queries = corpus.filter(col("vec_id") < 5)
    val artifact = Similarity.pqIvfArtifact(corpus, "vec_id", "embedding",
      cents, books)
    // 8 codes of 4 bits pack into ONE word
    assert(artifact.select(size(col("packed"))).as[Int].collect()
      .forall(_ == 1))
    val tmp = java.nio.file.Files.createTempDirectory("pqart").toString
    artifact.write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    for (nProbe <- Seq(3, 8)) {
      val inline = Similarity.ivfPqTopK(corpus, queries, "vec_id",
          "embedding", k = 5, centroids = cents, codebooks = books,
          nProbe = nProbe)
        .as[(Long, Long, Int, Double)].collect().toSet
      val served = Similarity.ivfPqTopKServe(stored, queries, "vec_id",
          "embedding", k = 5, centroids = cents, codebooks = books,
          nProbe = nProbe)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(served === inline && inline.nonEmpty, s"nProbe=$nProbe")
    }
    // the shuffle-join query path serves identically too
    val viaShuffle = Similarity.ivfPqTopKServe(stored, queries, "vec_id",
        "embedding", k = 5, centroids = cents, codebooks = books,
        nProbe = 3, broadcastQueries = false)
      .as[(Long, Long, Int, Double)].collect().toSet
    val viaBroadcast = Similarity.ivfPqTopKServe(stored, queries, "vec_id",
        "embedding", k = 5, centroids = cents, codebooks = books,
        nProbe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(viaShuffle === viaBroadcast)
  }

  test("residual IVFADC: tighter reconstruction and no recall loss at IDENTICAL bytes") {
    // The real Jégou 2011 encoding: codes quantize x − centroid(cell),
    // so the 4-bit range spends itself on the within-cell offset
    // instead of repeating the coarse position the cell id already
    // pins. Fidelity claim, measured: at the SAME artifact bytes (one
    // packed BIGINT per vector either way), the residual quantizer's
    // reconstruction MSE must beat raw, and served recall must not
    // lose. Honest comparison: TRAINED coarse centroids (residual only
    // pays when the centroid approximates the cell mean — against a
    // data-blind random centroid x − c can GROW variance) and each
    // encoding trains its codebooks on what it quantizes.
    val cents = Similarity.trainCentroids(emb, "embedding", nLists = 8)
    val corpus = emb
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val rawBooks = Similarity.pqTrainCodebooks(corpus, "embedding")
    val resBooks = Similarity.pqTrainCodebooks(
      Similarity.pqResiduals(corpus, "vec_id", "embedding", cents),
      "n_res")
    def artifactOf(residual: Boolean) = Similarity.pqIvfArtifact(
      corpus, "vec_id", "embedding", cents,
      if (residual) resBooks else rawBooks, residual = residual)
    // identical bytes: both artifacts pack m = 8 codes into ONE word
    for (r <- Seq(false, true))
      assert(artifactOf(r).select(size(col("packed"))).as[Int]
        .collect().forall(_ == 1))
    def recallOf(residual: Boolean): Double = {
      val served = Similarity.ivfPqTopKServe(artifactOf(residual), queries,
          "vec_id", "embedding", k = 5, centroids = cents,
          codebooks = if (residual) resBooks else rawBooks,
          nProbe = 8, residual = residual)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (brute & served).size.toDouble / brute.size
    }
    // Reconstruction MSE at identical bytes: raw decodes to
    // decode(codes); residual decodes to centroid(cell) + decode(codes).
    def mseOf(residual: Boolean, books: Array[Array[Array[Double]]])
        : Double = {
      val art = artifactOf(residual)
      val codes = art.select(col("n_id"), col("cell"),
        Similarity.pqUnpack(col("packed"), 8, 4).cast("array<int>")
          .as("codes"))
      val rows = codes.join(corpus.select(col("vec_id").as("n_id"),
          col("embedding")), Seq("n_id"))
        .as[(Long, Int, Seq[Int], Seq[Float])].collect()
      val errs = rows.map { case (_, cell, cs, x) =>
        val rec = Array.tabulate(64) { d =>
          val s = d / 8
          val base = books(s)(cs(s))(d % 8)
          if (residual) cents(cell)(d) + base else base
        }
        x.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      errs.sum / errs.length
    }
    val rawMse = mseOf(false, rawBooks)
    val resMse = mseOf(true, resBooks)
    assert(resMse < rawMse,
      s"residual MSE $resMse must beat raw $rawMse at identical bytes")
    val rawRecall = recallOf(false)
    val resRecall = recallOf(true)
    assert(resRecall >= rawRecall - 0.05,
      s"residual recall $resRecall lost to raw $rawRecall")
    // and the residual artifact serves identically through parquet
    val tmp = java.nio.file.Files.createTempDirectory("pqres").toString
    artifactOf(true).write.mode("overwrite").parquet(tmp)
    val direct = Similarity.ivfPqTopKServe(artifactOf(true), queries,
        "vec_id", "embedding", k = 5, centroids = cents,
        codebooks = resBooks, nProbe = 3, residual = true)
      .as[(Long, Long, Int, Double)].collect().toSet
    val stored = Similarity.ivfPqTopKServe(spark.read.parquet(tmp), queries,
        "vec_id", "embedding", k = 5, centroids = cents,
        codebooks = resBooks, nProbe = 3, residual = true)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(stored === direct && direct.nonEmpty)
  }

  test("trained codebooks round-trip the full serving path: train -> artifact -> parquet -> serve == inline") {
    // VERDICT r13 #5: the trained path existed but nothing exercised it
    // end to end. Trained books are engine-specific, so this is
    // spec-bound (no DuckDB mirror): served-from-parquet == inline
    // ivfPqTopK on the SAME trained books, and recall does not lose to
    // the data-blind portable books.
    val cents = Similarity.portableCentroids(8, 64)
    val trained = Similarity.pqTrainCodebooks(emb, "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    val artifact = Similarity.pqIvfArtifact(emb, "vec_id", "embedding",
      cents, trained)
    val tmp = java.nio.file.Files.createTempDirectory("pqtrained").toString
    artifact.write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    for (nProbe <- Seq(3, 8)) {
      val inline = Similarity.ivfPqTopK(emb, queries, "vec_id",
          "embedding", k = 5, centroids = cents, codebooks = trained,
          nProbe = nProbe)
        .as[(Long, Long, Int, Double)].collect().toSet
      val served = Similarity.ivfPqTopKServe(stored, queries, "vec_id",
          "embedding", k = 5, centroids = cents, codebooks = trained,
          nProbe = nProbe)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(served === inline && inline.nonEmpty, s"nProbe=$nProbe")
    }
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recallOf(books: Array[Array[Array[Double]]]): Double = {
      val art = Similarity.pqIvfArtifact(emb, "vec_id", "embedding",
        cents, books)
      val served = Similarity.ivfPqTopKServe(art, queries, "vec_id",
          "embedding", k = 5, centroids = cents, codebooks = books,
          nProbe = 8)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (brute & served).size.toDouble / brute.size
    }
    val tr = recallOf(trained)
    val pb = recallOf(Similarity.portableCodebooks(8, 16, 8))
    assert(tr > 0.2, s"trained-codebook served recall collapsed: $tr")
    assert(tr >= pb - 0.1, s"trained $tr should not lose to portable $pb")
  }

  test("hdRotate: exactly orthonormal — norms, dots, and brute-force top-k preserved") {
    // R = H·D/√dim is orthonormal by construction, so the rotation must
    // preserve every norm, every pairwise dot, and therefore the exact
    // brute-force neighbor ranking. Pinning this is what licenses using
    // rotated vectors interchangeably for PQ (the OPQ rung): the TRUE
    // geometry is untouched; only the coordinate split changes.
    val sub = emb.filter(col("vec_id") < 60)
    val rot = Similarity.hdRotate(sub, "vec_id", "embedding", 64)
    val vd = transform(col("embedding"), x => x.cast("double"))
    val rawN = sub.select(col("vec_id"),
      Similarity.dot(vd, vd).as("n2")).as[(Long, Double)].collect().toMap
    val rotN = rot.select(col("vec_id"),
      Similarity.dot(col("embedding"), col("embedding")).as("n2"))
      .as[(Long, Double)].collect().toMap
    assert(rawN.keySet == rotN.keySet && rawN.nonEmpty)
    rawN.foreach { case (id, n2) =>
      assert(math.abs(n2 - rotN(id)) <= 1e-9 * math.max(1.0, n2),
        s"norm changed for $id: $n2 vs ${rotN(id)}")
    }
    val queries = sub.filter(col("vec_id") < 5)
    val rawTop = Similarity.bruteForceTopK(sub, queries,
        "vec_id", "embedding", 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    val rotTop = Similarity.bruteForceTopK(rot,
        rot.filter(col("vec_id") < 5), "vec_id", "embedding", 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(rawTop == rotTop && rawTop.nonEmpty,
      "brute-force ranking must be invariant under the rotation")
    // and the inverse really decodes: R⁻¹(R(x)) == x to float precision
    val back = Similarity.hdRotateInverse(rot, "vec_id", "embedding", 64)
      .as[(Long, Seq[Double])].collect().toMap
    val orig = sub.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Seq[Double])].collect().toMap
    assert(back.keySet == orig.keySet)
    orig.foreach { case (id, v) =>
      v.zip(back(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9,
          s"round-trip drift at $id: $a vs $b")
      }
    }
  }

  test("ivfPqTopKRerank: beats-or-matches pure ADC recall; full shortlist == exact L2; shuffle == broadcast") {
    val cents = Similarity.portableCentroids(8, 64)
    val books = Similarity.portableCodebooks(8, 16, 8)
    val queries = emb.filter(col("vec_id") < 20)
    val n = emb.count().toInt
    val art = Similarity.pqIvfArtifact(emb, "vec_id", "embedding",
      cents, books)
    // Exact-L2 reference: probe EVERY cell and re-rank the ENTIRE
    // candidate set — quantization error cancels completely, leaving
    // the true squared-L2 top-k.
    val exact = Similarity.ivfPqTopKRerank(art, emb, queries, "vec_id",
        "embedding", k = 5, shortlist = n, centroids = cents,
        codebooks = books, nProbe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recallOf(pairs: Set[(Long, Long)]): Double =
      (exact & pairs).size.toDouble / exact.size
    val adc = Similarity.ivfPqTopKServe(art, queries, "vec_id",
        "embedding", k = 5, centroids = cents, codebooks = books,
        nProbe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.ivfPqTopKRerank(art, emb, queries, "vec_id",
        "embedding", k = 5, shortlist = 20, centroids = cents,
        codebooks = books, nProbe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // The refine step can only help — deterministically: any true
    // neighbor inside ADC's top-5 is inside the top-20 shortlist, and
    // exact re-scoring ranks every true-top-5 member of the shortlist
    // ahead of every non-member, so rerank@5 ⊇-counts ADC@5. Likewise
    // recall is monotone in the shortlist width (a wider shortlist can
    // only add true members for the exact stage to surface).
    assert(recallOf(rr) >= recallOf(adc),
      s"rerank recall ${recallOf(rr)} lost to pure ADC ${recallOf(adc)}")
    val rr50 = Similarity.ivfPqTopKRerank(art, emb, queries, "vec_id",
        "embedding", k = 5, shortlist = 50, centroids = cents,
        codebooks = books, nProbe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(recallOf(rr50) >= recallOf(rr),
      s"recall not monotone in shortlist: 50→${recallOf(rr50)} vs 20→${recallOf(rr)}")
    // Random gaussians + data-blind portable codebooks are the hard
    // case (cf. the trained-codebook specs' 0.2 floor): the mechanism
    // guarantees above are the real claim; the floor just catches
    // collapse.
    assert(recallOf(rr) > 0.2, s"rerank recall collapsed: ${recallOf(rr)}")
    // and the shuffle-join rerank path is the broadcast path, exactly
    val viaShuffle = Similarity.ivfPqTopKRerank(art, emb, queries,
        "vec_id", "embedding", k = 5, shortlist = 20, centroids = cents,
        codebooks = books, nProbe = 4, broadcastShortlist = false)
      .as[(Long, Long, Int, Double)].collect().toSet
    val viaBroadcast = Similarity.ivfPqTopKRerank(art, emb, queries,
        "vec_id", "embedding", k = 5, shortlist = 20, centroids = cents,
        codebooks = books, nProbe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(viaShuffle == viaBroadcast && viaBroadcast.nonEmpty)
  }

  test("ivfPqTopKRerank cell pruning: partitioned float layout == plain path, and the dynamic pruning is really in the plan") {
    // The 100 TB layout: float vectors written PARTITIONED BY their IVF
    // cell. Joining the shortlist on (cell, id) instead of id alone
    // lets dynamic partition pruning turn the broadcast shortlist into
    // a runtime partition filter — only probed cells' float files are
    // read at all.
    val cents = Similarity.portableCentroids(8, 64)
    val books = Similarity.portableCodebooks(8, 16, 8)
    val queries = emb.filter(col("vec_id") < 10)
    val art = Similarity.pqIvfArtifact(emb, "vec_id", "embedding",
      cents, books)
    val withCell = emb.join(
      Similarity.pqResiduals(emb, "vec_id", "embedding", cents)
        .select(col("n_id").as("vec_id"), col("cell")), Seq("vec_id"))
    val tmp = java.nio.file.Files.createTempDirectory("pqcell").toString
    withCell.write.partitionBy("cell").mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    val plain = Similarity.ivfPqTopKRerank(art, emb, queries, "vec_id",
        "embedding", k = 5, shortlist = 20, centroids = cents,
        codebooks = books, nProbe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    val prunedDf = Similarity.ivfPqTopKRerank(art, stored, queries,
      "vec_id", "embedding", k = 5, shortlist = 20, centroids = cents,
      codebooks = books, nProbe = 3, cellCol = Some("cell"))
    val pruned = prunedDf.as[(Long, Long, Int, Double)].collect().toSet
    assert(pruned == plain && plain.nonEmpty)
    val plan = prunedDf.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subtree on the float scan:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters"))
          .mkString("\n"))
  }

  test("ivfPqBeamServe: full-degree one-hop walk == dense-probe serving (raw AND residual); sparse walk serves sanely") {
    // With degree >= nLists-1 and depth >= 1 every cell enters the beam
    // ranking, so the walk's top-nProbe cells equal the dense path's
    // EXACTLY and the whole navigate -> ADC compose must coincide with
    // ivfPqTopKServe at the same parameters.
    val nLists = 8
    val cents = Similarity.portableCentroids(nLists, 64)
    val books = Similarity.portableCodebooks(8, 16, 8)
    val queries = emb.filter(col("vec_id") < 10)
    val centDf = spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "centroid")
    val navFull = graft.operators.CacheScope.pin(
      Similarity.buildNavGraph(centDf, degree = nLists - 1))
    for (residual <- Seq(false, true)) {
      val art = Similarity.pqIvfArtifact(emb, "vec_id", "embedding",
        cents, books, residual = residual)
      val dense = Similarity.ivfPqTopKServe(art, queries, "vec_id",
          "embedding", k = 5, centroids = cents, codebooks = books,
          nProbe = 3, residual = residual)
        .as[(Long, Long, Int, Double)].collect().toSet
      val beamed = Similarity.ivfPqBeamServe(art, queries, "vec_id",
          "embedding", k = 5, centroids = centDf, nav = navFull,
          codebooks = books, beamWidth = nLists, depth = 1,
          entryCells = 2, nProbe = 3, residual = residual)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(beamed == dense && dense.nonEmpty, s"residual=$residual")
    }
    // Sparse navigation (degree 3, depth 2, beam 4): a genuine subset
    // walk must still produce k-deep rankings for every query.
    val navSparse = graft.operators.CacheScope.pin(
      Similarity.buildNavGraph(centDf, degree = 3))
    val art = Similarity.pqIvfArtifact(emb, "vec_id", "embedding",
      cents, books, residual = true)
    val sparse = Similarity.ivfPqBeamServe(art, queries, "vec_id",
        "embedding", k = 5, centroids = centDf, nav = navSparse,
        codebooks = books, beamWidth = 4, depth = 2, entryCells = 2,
        nProbe = 3, residual = true)
      .groupBy("q_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(sparse.size == 10 && sparse.values.forall(_ == 5))
    Seq(navFull, navSparse).foreach(_.unpersist())
  }

  test("hdRotate butterfly == dense to 1e-9 (rank-identical); padToPow2 enters 48-dim; short vectors refuse loudly") {
    val sub = emb.filter(col("vec_id") < 60)
    val dense = Similarity.hdRotate(sub, "vec_id", "embedding", 64,
        butterfly = Some(false))
      .as[(Long, Seq[Double])].collect().toMap
    val fast = Similarity.hdRotate(sub, "vec_id", "embedding", 64,
        butterfly = Some(true))
      .as[(Long, Seq[Double])].collect().toMap
    assert(dense.keySet == fast.keySet && dense.nonEmpty)
    dense.foreach { case (id, v) =>
      v.zip(fast(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9,
          s"butterfly drift at $id: $a vs $b")
      }
    }
    // the butterfly inverse round-trips exactly like the dense one
    val rotB = Similarity.hdRotate(sub, "vec_id", "embedding", 64,
      butterfly = Some(true))
    val back = Similarity.hdRotateInverse(rotB, "vec_id", "embedding", 64,
        butterfly = Some(true))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = sub.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Seq[Double])].collect().toMap
    orig.foreach { case (id, v) =>
      v.zip(back(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9, s"round-trip drift at $id")
      }
    }
    // padToPow2: a 48-dim slice enters at 64 with norms intact through
    // the rotation (zero padding preserves dots/distances exactly)
    val sliced = sub.select(col("vec_id"),
      slice(col("embedding"), 1, 48).as("embedding"))
    val padded = Similarity.padToPow2(sliced, "vec_id", "embedding", 48)
    assert(padded.select(size(col("embedding"))).distinct()
      .as[Int].collect().toSeq == Seq(64))
    val vd = transform(col("embedding"), x => x.cast("double"))
    val n2raw = sliced.select(col("vec_id"),
      Similarity.dot(vd, vd).as("n2")).as[(Long, Double)].collect().toMap
    val n2rot = Similarity.hdRotate(padded, "vec_id", "embedding", 64)
      .select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("n2"))
      .as[(Long, Double)].collect().toMap
    n2raw.foreach { case (id, n2) =>
      assert(math.abs(n2 - n2rot(id)) <= 1e-9 * math.max(1.0, n2),
        s"padded norm changed for $id")
    }
    // ADVICE r14: a wrong-length vector refuses loudly instead of
    // silently nulling the rotated vector
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val bad = Seq((1L, Seq.fill(63)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.hdRotate(bad, "vec_id", "embedding", 64).collect()
    }
    assert(chain(e).exists(_.contains("hdRotate")), s"got: ${chain(e)}")
  }

  test("hdRotate at production dim (256 auto-selects the butterfly): orthonormal, round-trips") {
    // past denseRotationMaxDim the default path is the FWHT ladder —
    // O(d log d), zero matrix literals, no janino cliff. Deterministic
    // synthetic 256-dim fixture; norms must hold and the inverse must
    // decode, exactly as at the oracle dim.
    val wide = spark.createDataFrame((0L until 40L).map(i =>
      (i, (0 until 256).map(j =>
        (((i * 31 + j * 7) % 17).toDouble - 8.0) / 8.0))))
      .toDF("vec_id", "embedding")
    assert(256 > Similarity.denseRotationMaxDim)
    val rot = Similarity.hdRotate(wide, "vec_id", "embedding", 256)
    val rawN = wide.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("n2"))
      .as[(Long, Double)].collect().toMap
    val rotN = rot.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("n2"))
      .as[(Long, Double)].collect().toMap
    rawN.foreach { case (id, n2) =>
      assert(math.abs(n2 - rotN(id)) <= 1e-9 * math.max(1.0, n2),
        s"norm changed for $id at dim 256")
    }
    val back = Similarity.hdRotateInverse(rot, "vec_id", "embedding", 256)
      .as[(Long, Seq[Double])].collect().toMap
    val orig = wide.as[(Long, Seq[Double])].collect().toMap
    orig.foreach { case (id, v) =>
      v.zip(back(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9, s"256-dim round-trip drift at $id")
      }
    }
  }

  test("beam budget auto-sizing: defaults == the formula's explicit values; formulas grow with the artifact (VERDICT r14 #3)") {
    val nLists = 8
    val cents = Similarity.portableCentroids(nLists, 64)
    val books = Similarity.portableCodebooks(8, 16, 8)
    val queries = emb.filter(col("vec_id") < 10)
    val centDf = spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "centroid")
    val nav = graft.operators.CacheScope.pin(
      Similarity.buildNavGraph(centDf, degree = 3))
    val art = Similarity.pqIvfArtifact(emb, "vec_id", "embedding",
      cents, books, residual = true)
    val expBw = Similarity.autoBeamWidth(3, nLists)
    val expDp = Similarity.autoBeamDepth(nLists, 3)
    val auto = Similarity.ivfPqBeamServe(art, queries, "vec_id",
        "embedding", k = 5, centroids = centDf, nav = nav,
        codebooks = books, entryCells = 2, nProbe = 3, residual = true)
      .as[(Long, Long, Int, Double)].collect().toSet
    val explicit = Similarity.ivfPqBeamServe(art, queries, "vec_id",
        "embedding", k = 5, centroids = centDf, nav = nav,
        codebooks = books, beamWidth = expBw, depth = expDp,
        entryCells = 2, nProbe = 3, residual = true)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(auto == explicit && auto.nonEmpty,
      "default budget must equal the formula's explicit values")
    // same parity on the search face (no metadata job there: nLists and
    // degree are parameters)
    val autoB = Similarity.ivfBeamTopK(emb, queries, "vec_id",
        "embedding", 5, nLists = nLists, degree = 3, entryCells = 2,
        fixedCentroids = Some(cents))
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val explB = Similarity.ivfBeamTopK(emb, queries, "vec_id",
        "embedding", 5, nLists = nLists,
        beamWidth = Similarity.autoBeamWidth(1, nLists),
        depth = Similarity.autoBeamDepth(nLists, 3), degree = 3,
        entryCells = 2, fixedCentroids = Some(cents))
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(autoB == explB && autoB.nonEmpty)
    // the formulas really scale with the artifact instead of sitting
    // still: depth grows with cells at fixed degree, width with both
    assert(Similarity.autoBeamDepth(100000, 8) >
      Similarity.autoBeamDepth(100, 8))
    assert(Similarity.autoBeamWidth(4, 1000000) >
      Similarity.autoBeamWidth(4, 16))
    nav.unpersist()
  }

  test("composed serving recipe (q250): cell-pruned re-rank over the beam-served shortlist == plain path") {
    // the q250 chain at spec scale: rotate -> residual artifact ->
    // nav graph -> beam-served shortlist (emitCell) -> exact re-rank.
    // The (cell, id)-joined re-rank (the dynamic-partition-pruned
    // production layout) must equal the plain id-joined path exactly.
    val cents = Similarity.portableCentroids(16, 64)
    val books = Similarity.portableCodebooks(8, 16, 8)
    val rot = graft.operators.CacheScope.pin(
      Similarity.hdRotate(emb, "vec_id", "embedding", 64))
    val centDf = spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "centroid")
    val nav = graft.operators.CacheScope.pin(
      Similarity.buildNavGraph(centDf, degree = 3))
    val art = graft.operators.CacheScope.pin(
      Similarity.pqIvfArtifact(rot, "vec_id", "embedding",
        cents, books, residual = true))
    val queries = rot.filter(col("vec_id") < 10)
    val short = graft.operators.CacheScope.pin(
      Similarity.ivfPqBeamServe(art, queries, "vec_id", "embedding",
        k = 20, centroids = centDf, nav = nav, codebooks = books,
        beamWidth = 4, depth = 2, entryCells = 2, nProbe = 4,
        residual = true, emitCell = true))
    val corpusWithCell = rot.join(
      art.select(col("n_id").as("vec_id"), col("cell")), Seq("vec_id"))
    val pruned = Similarity.rerankShortlist(
        short.select(col("q_id"), col("n_id"), col("cell")),
        corpusWithCell, queries, "vec_id", "embedding", k = 5,
        cellCol = Some("cell"))
      .as[(Long, Long, Int, Double)].collect().toSet
    val plain = Similarity.rerankShortlist(
        short.select(col("q_id"), col("n_id")), rot, queries,
        "vec_id", "embedding", k = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(pruned == plain && pruned.size == 50,
      s"composed recipe seams must agree: ${pruned.size} vs ${plain.size}")
    Seq(rot, nav, art, short).foreach(_.unpersist())
  }

  test("OPQ learned rotation: MSE ladder trained <= HD <= identity at identical bytes on a correlated fixture") {
    // Ge et al. 2013: the learned rung above the structured HD rotation.
    // Fixture is deliberately CORRELATED — variance concentrated in the
    // first subspace with strong within-subspace coupling (hash-uniform
    // fixtures are the null case where every rotation ties, as SCALE.md
    // pq_recall_rotated measured for HD itself): x[0..3] share two
    // latent factors at scale 3, dims 4..15 are 0.05 noise.
    val dim = 16
    val rng = new scala.util.Random(7)
    val rows = (0 until 1200).map { i =>
      val z0 = rng.nextGaussian() * 3.0
      val z1 = rng.nextGaussian() * 3.0
      val noise = Array.fill(dim)(rng.nextGaussian() * 0.05)
      val x = Array.tabulate(dim) { d =>
        val core = d match {
          case 0 => z0
          case 1 => 0.8 * z0 + 0.2 * z1
          case 2 => z1
          case 3 => 0.6 * z1 - 0.4 * z0
          case _ => 0.0
        }
        core + noise(d)
      }
      (i.toLong, x.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val identity = Array.tabulate(dim, dim)((j, i) =>
      if (i == j) 1.0 else 0.0)
    val hd = Similarity.hdRotationMatrix(dim)
    val (trained, trainedBooks) = Similarity.opqTrainRotation(
      df, "vec_id", "embedding", dim, m = 4, ksub = 8, iters = 3)
    // the learned R is really orthonormal: R·Rᵀ == I to 1e-9
    for (j <- 0 until dim; i <- 0 until dim) {
      val dotRow = (0 until dim).map(k => trained(j)(k) * trained(i)(k)).sum
      assert(math.abs(dotRow - (if (i == j) 1.0 else 0.0)) <= 1e-9,
        s"R Rᵀ[$j][$i] = $dotRow")
    }
    // identical bytes everywhere: m = 4 codes of 3 bits' worth of ksub=8
    // ids — same artifact shape for all three rotations; only the
    // coordinates (and therefore the quantizer's fit) change.
    def mseOf(r: Array[Array[Double]],
        pre: Option[Array[Array[Array[Double]]]] = None): Double = {
      val rot = Similarity.applyRotation(df, "vec_id", "embedding", r)
      val books = pre.getOrElse(Similarity.pqTrainCodebooks(
        rot, "embedding", m = 4, ksub = 8, dim = dim))
      val vecs = rot.as[(Long, Seq[Double])].collect()
      val errs = vecs.map { case (_, v) =>
        (0 until 4).map { sub =>
          val sv = v.slice(sub * 4, sub * 4 + 4)
          books(sub).map(c =>
            sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }
      errs.sum / errs.length
    }
    val mseId = mseOf(identity)
    val mseHd = mseOf(hd)
    val mseTrained = mseOf(trained, Some(trainedBooks))
    assert(mseTrained <= mseHd + 1e-9 && mseTrained <= mseId + 1e-9,
      s"OPQ must beat both rungs: trained=$mseTrained hd=$mseHd id=$mseId")
    assert(mseHd <= mseId + 1e-9,
      s"HD must beat identity on the correlated fixture: hd=$mseHd id=$mseId")
    // and the rotation is distance-preserving, so serving over OPQ
    // coordinates ranks identically to serving raw (exact top-k
    // invariance, the hdRotate guarantee extended to a learned R)
    val queries = df.filter(col("vec_id") < 5)
    val rawTop = Similarity.bruteForceTopK(df, queries,
        "vec_id", "embedding", 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    val rotAll = Similarity.applyRotation(df, "vec_id", "embedding", trained)
    val rotTop = Similarity.bruteForceTopK(rotAll,
        rotAll.filter(col("vec_id") < 5), "vec_id", "embedding", 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(rotTop == rawTop && rawTop.nonEmpty,
      "brute-force ranking must be invariant under the learned rotation")
  }

  test("PQ ANN: k-means-trained codebooks beat portable ones on recall@5") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recallOf(books: Array[Array[Array[Double]]]): Double = {
      val approx = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
        codebooks = books)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (brute & approx).size.toDouble / brute.size
    }
    val trained = recallOf(Similarity.pqTrainCodebooks(emb, "embedding"))
    val portable = recallOf(Similarity.portableCodebooks(8, 16, 8))
    // Random gaussians are the hard case (quantization error dominates);
    // trained codebooks must stay useful and at least match the
    // data-blind hash-derived ones.
    assert(trained > 0.2, s"trained-codebook recall collapsed: $trained")
    assert(trained >= portable - 0.1,
      s"trained $trained should not lose to portable $portable")
  }

  test("IVF-ADC: full probe equals plain PQ; partial probe is a subset ranking") {
    val queries = emb.filter(col("vec_id") < 10)
    val cents = Similarity.portableCentroids(8, 64)
    val books = Similarity.portableCodebooks(8, 16, 8)
    // nProbe == nLists → candidates = whole corpus → exactly pqTopK.
    val full = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
      cents, books, nProbe = 8)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
      codebooks = books)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full == pq, "full-probe IVFADC must equal plain PQ ranking")
    // Partial probe returns only candidates from probed cells — each
    // query's list is a ranked subset of what full-probe considered.
    val part = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
      cents, books, nProbe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    assert(part.nonEmpty)
    val recall = (part.toSet & pq.map(t => (t._1, t._2))).size.toDouble / pq.size
    assert(recall > 0.2, s"partial-probe recall vs PQ collapsed: $recall")
  }

  test("random projection roughly preserves pairwise distances (JL)") {
    val planes = Similarity.portableHyperplanes(1, 16, 64)(0)
    val rows = emb.limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val proj = Similarity.randomProjection(emb.limit(20), "vec_id", "embedding", planes)
      .as[(Long, Seq[Double])].collect().map(t => t._1 -> t._2.toArray).toMap
    assert(proj.values.forall(_.length == 16))
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for {
      (ia, va) <- rows; (ib, vb) <- rows if ia < ib
    } yield d(proj(ia), proj(ib)) / d(va, vb)
    // JL at outDim 16 is coarse; the median ratio must sit near a fixed
    // constant (E[ratio] ≈ sqrt(E w²) = 1/sqrt(3) for uniform[-1,1)
    // rows), and no pair may collapse to zero or blow up.
    val sorted = ratios.sorted
    val med = sorted(sorted.length / 2)
    assert(med > 0.3 && med < 1.0, s"median distance ratio $med")
    assert(sorted.head > 0.05 && sorted.last < 2.0,
      s"distance distortion out of range: ${sorted.head} .. ${sorted.last}")
  }

  test("cosineNearDup finds planted duplicates") {
    val base = emb.limit(50)
    val dup = base.withColumn("vec_id", col("vec_id") + 100000)
    val out = Similarity.cosineNearDup(base.union(dup), "vec_id", "embedding",
      threshold = 0.999)
      .as[(Long, Long, Double)].collect()
    assert(out.length >= 40, s"found ${out.length} of 50 planted dups")
    assert(out.forall { case (a, b, c) => b == a + 100000 && c >= 0.999 })
  }

  test("semanticDedup cell-boundary recall vs exact all-pairs (the SemDeDup trade, measured)") {
    // Exact truth: brute-force all-pairs cosine >= threshold on the small
    // embedding fixture; semantic recall = found / true. Cross-cell pairs
    // are missed BY DESIGN — the measurement pins that the loss is partial
    // (cells carry real signal even on random gaussians), not total.
    val t = 0.25
    val vecs = emb.limit(50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
      if cos(vecs(a), vecs(b)) >= t
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "fixture must contain similar pairs at the threshold")
    val found = Similarity.semanticDedup(emb.limit(50), "vec_id", "embedding",
      threshold = t, centroids = Similarity.portableCentroids(4, 64))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.subsetOf(truth), "every reported pair must be truly similar")
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall > 0.2, s"cell recall collapsed: $recall over ${truth.size} pairs")
  }

  test("semanticDedup: planted dups land in the same cell and are found; cap drops over-full cells") {
    val base = emb.limit(50)
    val dup = base.withColumn("vec_id", col("vec_id") + 100000)
    val cents = Similarity.portableCentroids(8, 64)
    val out = Similarity.semanticDedup(base.union(dup), "vec_id", "embedding",
      threshold = 0.999, centroids = cents)
      .as[(Long, Long, Double)].collect()
    // An identical vector is ALWAYS in its twin's cell (argmin of equal
    // distances, deterministic tie-break): the pre-collapse catches every
    // planted pair regardless of cell geometry.
    assert(out.length == 50, s"found ${out.length} of 50 planted exact dups")
    assert(out.forall { case (a, b, c) => b == a + 100000 && c >= 0.999 })
    // A 1-cell layout puts all 50 distinct vectors in one cell; maxCell
    // below that drops it (capped, not quadratic) -> only the
    // identical-member pairs remain.
    val capped = Similarity.semanticDedup(base.union(dup), "vec_id", "embedding",
      threshold = -1.0, centroids = Similarity.portableCentroids(1, 64),
      maxCell = 10)
      .as[(Long, Long, Double)].collect()
    assert(capped.length == 50 && capped.forall(_._3 == 1.0),
      s"over-full cell must be dropped, members kept: ${capped.length}")
  }

  test("lmCrossEntropy: hand-computed unigram LM, OOV handling, empty/ref-free docs") {
    val ref = Seq((100L, "a a b")).toDF("rid", "rtext")
    val docs = Seq(
      (1L, "a b z"),   // CE = -(ln 1/2 + ln 1/3 + ln 1/6) / 3, oov 1/3
      (2L, "a a"),     // CE = -ln(1/2)
      (3L, ""))        // no tokens -> zero-filled
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossEntropy(docs, "doc_id", "text", ref, "rtext")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // LM over ref: c(a)=2, c(b)=1, N=3, V=2 -> p(a)=3/6, p(b)=2/6, p_oov=1/6.
    val ce1 = -(math.log(0.5) + math.log(2.0 / 6) + math.log(1.0 / 6)) / 3
    assert(out(1L)._1 == 3 && math.abs(out(1L)._3 - ce1) < 1e-5, out(1L).toString)
    assert(math.abs(out(1L)._2 - 1.0 / 3) < 1e-5)
    assert(out(2L)._1 == 2 && math.abs(out(2L)._3 + math.log(0.5)) < 1e-5)
    assert(out(2L)._2 == 0.0)
    assert(out(3L) == ((0L, 0.0, 0.0)), "empty doc zero-filled")

    // Empty reference = no model to score under: non-empty docs must get
    // NULL cross_entropy (oov 1.0), NOT a perfect 0.0 — a quality filter
    // keyed on high CE would otherwise silently keep everything.
    val emptyRef = Seq((200L, "   ")).toDF("rid", "rtext")
    val degenerate = TextAnalysis.lmCrossEntropy(docs, "doc_id", "text",
      emptyRef, "rtext").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(degenerate(1L).isNullAt(3), "empty reference must surface as NULL CE")
    assert(degenerate(1L).getDouble(2) == 1.0, "every token is OOV")
    assert(degenerate(3L).getLong(1) == 0L &&
      degenerate(3L).getDouble(3) == 0.0, "token-less doc still zero-filled")
  }

  test("corpusLineDedup: first occurrence wins, docs reassembled in order") {
    val docs = Seq(
      (1L, "alpha\nshared boilerplate\nbeta"),
      (2L, "shared boilerplate\ngamma\nshared boilerplate"), // corpus dup + within-doc dup
      (3L, "shared boilerplate"),                            // every line lost
      (4L, "  \n\n"),                                        // blank-only: no output row
      (5L, "delta\nalpha"))                                  // later dup of doc 1's line
      .toDF("doc_id", "text")
    val out = Dedup.corpusLineDedup(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 3L, "alpha\nshared boilerplate\nbeta")),
      "doc 1 holds every first occurrence")
    assert(out(2L) == ((3L, 1L, "gamma")),
      "both boilerplate copies lose to doc 1 (min doc, then min idx)")
    assert(out(3L) == ((1L, 0L, "")), "all-dup doc keeps empty text")
    assert(!out.contains(4L), "blank-only doc emits no row")
    assert(out(5L) == ((2L, 1L, "delta")), "alpha deduped against doc 1")
  }
}
