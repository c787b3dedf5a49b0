package graft

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("sparse-mode sketches count small groups exactly") {
    val df = (1 to 300).map(i => ("g" + (i % 3), "v" + i)).toDF("g", "v")
    val est = Sketches.hllEstimate(
      Sketches.hllBuild(df, Seq("g"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("g0" -> 100L, "g1" -> 100L, "g2" -> 100L))
  }

  test("shard-then-merge tracks the single-shot build on the same rows") {
    // The union is exact on the register lattice, but DataSketches'
    // preferred HIP estimator is invalidated by merging, so the merged
    // sketch reads through the composite estimator: estimates may differ
    // by a small epsilon (single-shot 698 vs merged 701 on this input),
    // both within the sketch's error envelope of the true 700.
    val all = (1 to 1000).map(i => ("k", "v" + (i % 700))).toDF("g", "v")
    val single = Sketches.hllEstimate(
      Sketches.hllBuild(all, Seq("g"), "v"), Seq("g"))
      .collect().head.getLong(1)
    // Three overlapping shards of the same rows.
    val shards = Seq(
      all.filter($"v".substr(2, 10).cast("int") % 3 =!= 0),
      all.filter($"v".substr(2, 10).cast("int") % 3 =!= 1),
      all.filter($"v".substr(2, 10).cast("int") % 3 =!= 2))
    val sketchUnion = shards.map(s => Sketches.hllBuild(s, Seq("g"), "v"))
      .reduce(_ union _)
    val merged = Sketches.hllEstimate(
      Sketches.hllMerge(sketchUnion, Seq("g")), Seq("g"))
      .collect().head.getLong(1)
    for ((est, label) <- Seq((single, "single-shot"), (merged, "merged")))
      assert(math.abs(est - 700L) <= 700L * 2 / 100,
        s"$label estimate $est outside 2% of true 700")
  }

  test("disjoint shard union estimates the combined cardinality within error") {
    val a = (1 to 5000).map(i => ("k", s"a$i")).toDF("g", "v")
    val b = (1 to 5000).map(i => ("k", s"b$i")).toDF("g", "v")
    val merged = Sketches.hllEstimate(
      Sketches.hllMerge(
        Sketches.hllBuild(a, Seq("g"), "v")
          .union(Sketches.hllBuild(b, Seq("g"), "v")), Seq("g")), Seq("g"))
      .collect().head.getLong(1)
    assert(math.abs(merged - 10000L) < 500,
      s"estimate $merged should be within ~5% of 10000")
  }

  // ---- Count-min sketch (q118 covers the oracle face; these cover the
  // guarantees and the shard algebra on random data).

  private def zipf(seed: Int, n: Int): Seq[String] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val k = math.min(99, math.floor(math.pow(r.nextDouble(), -0.7)).toInt)
      s"key$k"
    }
  }

  test("CMS never underestimates and bounds total overestimate error") {
    val rows = zipf(11, 20000)
    val df = rows.toDF("v")
    val sk = Sketches.cmsBuild(df, "v", depth = 4, width = 128)
    val est = Sketches.cmsEstimate(sk, df, "v", depth = 4, width = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k underestimated: ${est(k)} < $c")
      // Markov bound with slack: overestimate ≤ 2eN/width w.h.p.
      assert(est(k) - c <= 2 * math.E * rows.size / 128,
        s"$k overestimate ${est(k) - c} breaks the error envelope")
    }
  }

  test("CMS shard merge is EXACTLY the single-shot build") {
    val rows = zipf(12, 8000)
    val (a, b) = rows.splitAt(3000)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = cells(Sketches.cmsMerge(
      Sketches.cmsBuild(a.toDF("v"), "v").union(
        Sketches.cmsBuild(b.toDF("v"), "v"))))
    val single = cells(Sketches.cmsBuild(rows.toDF("v"), "v"))
    assert(merged === single)
  }

  test("CMS estimates a never-built key as collision mass only") {
    val df = (1 to 1000).map(i => s"built$i").toDF("v")
    val sk = Sketches.cmsBuild(df, "v", depth = 4, width = 512)
    val est = Sketches.cmsEstimate(sk,
      Seq("never-seen-key").toDF("v"), "v", depth = 4, width = 512)
      .collect().head.getLong(1)
    assert(est <= 2 * math.E * 1000 / 512)
  }

  // ---- Log-histogram quantile artifact (q119 covers the oracle face).

  test("hist quantile estimates stay within the 1/16 relative envelope") {
    val r = new scala.util.Random(31)
    // Log-uniform values spanning 5 decades, plus small exact values.
    val rows: Seq[Long] = (1 to 20000).map(_ =>
      math.floor(math.pow(10, 1 + r.nextDouble() * 5)).toLong) ++
      (0 to 15).map(_.toLong)
    val df = rows.toDF("v")
    val pcts = Seq(10, 25, 50, 75, 90, 99)
    val est = Sketches.histQuantiles(Sketches.histBuild(df, "v"), pcts)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sorted = rows.sorted
    pcts.foreach { p =>
      val exact = sorted((p * rows.size + 99) / 100 - 1)
      val rel = math.abs(est(p) - exact).toDouble / exact
      assert(rel <= 1.0 / 16 + 1e-9, s"p$p est=${est(p)} exact=$exact rel=$rel")
    }
  }

  test("CMS join-size estimate upper-bounds the true size, tightly when wide") {
    val r = new scala.util.Random(17)
    val a = (1 to 5000).map(_ => s"k${r.nextInt(400)}")
    val b = (1 to 3000).map(_ => s"k${r.nextInt(400)}")
    val trueSize = {
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      ca.map { case (k, c) => c * cb.getOrElse(k, 0L) }.sum
    }
    val est = Sketches.cmsJoinSize(
      Sketches.cmsBuild(a.toDF("v"), "v", depth = 4, width = 4096),
      Sketches.cmsBuild(b.toDF("v"), "v", depth = 4, width = 4096))
      .collect().head.getLong(0)
    assert(est >= trueSize, s"underestimated: $est < $trueSize")
    // CM inner-product error bound: ≤ e·Na·Nb/width per row w.h.p.
    assert(est - trueSize <= math.E * 5000L * 3000L / 4096,
      s"overestimate ${est - trueSize} breaks the envelope")
  }

  test("percentile-rank lookup: endpoints, monotonicity, bucket-mass error") {
    val r = new scala.util.Random(41)
    val rows = (1 to 10000).map(_ =>
      math.floor(math.pow(10, 1 + r.nextDouble() * 4)).toLong)
    val hist = Sketches.histBuild(rows.toDF("v"), "v")
    val probes = Seq(0L, 5L, 100L, 1000L, 10000L, 100000L, rows.max)
    val est = Sketches.histPercentileRank(hist, probes.toDF("p"), "p")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(est(0L) === 0.0)
    assert(est(rows.max) === 1.0)
    val ordered = probes.sorted.map(est)
    assert(ordered.zip(ordered.drop(1)).forall { case (a, b) => a <= b })
    // Error vs the exact CDF is bounded by one bucket's mass.
    val sorted = rows.sorted
    probes.filter(_ > 0).foreach { p =>
      val exact = sorted.count(_ <= p).toDouble / rows.size
      assert(math.abs(est(p) - exact) <= 0.08,
        s"p=$p est=${est(p)} exact=$exact")
    }
  }

  test("grouped hist quantiles match per-group exact within the envelope") {
    val r = new scala.util.Random(23)
    val rows = (1 to 6000).map { _ =>
      val g = s"g${r.nextInt(3)}"
      (g, math.floor(math.pow(10, 1 + r.nextDouble() * 4)).toLong)
    }
    val df = rows.toDF("g", "v")
    val est = Sketches.histQuantilesGrouped(
      Sketches.histBuildGrouped(df, "v", Seq("g")), Seq("g"), Seq(50, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      Seq(50, 90).foreach { p =>
        val exact = sorted((p * sorted.size + 99) / 100 - 1)
        val rel = math.abs(est((g, p)) - exact).toDouble / exact
        assert(rel <= 1.0 / 16 + 1e-9, s"$g p$p est=${est((g, p))} exact=$exact")
      }
    }
  }

  test("hist values 0..15 are exact; shard merge == single-shot") {
    val small = (0 to 15).flatMap(v => Seq.fill(v + 1)(v.toLong))
    val est = Sketches.histQuantiles(
      Sketches.histBuild(small.toDF("v"), "v"), Seq(50))
      .collect().head.getLong(1)
    val exact = small.sorted.apply((50 * small.size + 99) / 100 - 1)
    assert(est === exact)

    val rows = (1 to 5000).map(i => (i.toLong * 37) % 100000)
    val (a, b) = rows.splitAt(2222)
    def cells(h: org.apache.spark.sql.DataFrame) =
      h.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = cells(Sketches.histMerge(
      Sketches.histBuild(a.toDF("v"), "v")
        .union(Sketches.histBuild(b.toDF("v"), "v"))))
    assert(merged === cells(Sketches.histBuild(rows.toDF("v"), "v")))
  }

  test("grouped KS matches the sequential step-CDF sup; single group is 0") {
    val r = new scala.util.Random(41)
    val rows = (1 to 4000).map { _ =>
      val g = s"g${r.nextInt(3)}"
      // g2 deliberately shifted a decade up — real drift.
      val base = if (g == "g2") 1000 else 100
      (g, (base + r.nextInt(base * 9)).toLong)
    }
    val df = rows.toDF("g", "v")
    val got = Sketches.histKsGrouped(
        Sketches.histBuildGrouped(df, "v", Seq("g")), Seq("g"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

    // Sequential reference over the same bucketing.
    def bucket(v: Long): Long =
      if (v <= 15) v
      else {
        val nbits = 64 - java.lang.Long.numberOfLeadingZeros(v)
        16 + (nbits - 4) * 8 + ((v >> (nbits - 4)) - 8)
      }
    val byBucket = rows.map { case (g, v) => (g, bucket(v)) }
    val grid = byBucket.map(_._2).distinct.sorted
    val nAll = rows.size.toLong
    byBucket.groupBy(_._1).foreach { case (g, grp) =>
      val nG = grp.size.toLong
      val ks = grid.map { i =>
        val cumG = grp.count(_._2 <= i).toLong
        val cumAll = byBucket.count(_._2 <= i).toLong
        math.abs(cumG * nAll - cumAll * nG)
      }.max.toDouble / (nG * nAll)
      assert(got(g)._1 === nG, s"n_g of $g")
      assert(math.abs(got(g)._2 - ks) < 1e-6, s"ks of $g")
    }
    // With 3 equal groups the blend is ⅓ shifted mass, so the shifted
    // group sits ~2× as far from the pool as each undrifted one.
    assert(got("g2")._2 > got("g0")._2 * 1.5,
      "the shifted group must read as the drifted one")

    // One group == the pool → sup |F_g − F_all| is exactly 0.
    val solo = rows.map { case (_, v) => ("only", v) }.toDF("g", "v")
    val soloKs = Sketches.histKsGrouped(
        Sketches.histBuildGrouped(solo, "v", Seq("g")), Seq("g"))
      .collect().head.getDouble(2)
    assert(soloKs === 0.0)
  }

  test("grouped PSI matches the sequential nano-term reference; solo is 0") {
    val r = new scala.util.Random(43)
    val rows = (1 to 4000).map { _ =>
      val g = s"g${r.nextInt(3)}"
      val base = if (g == "g2") 1000 else 100
      (g, (base + r.nextInt(base * 9)).toLong)
    }
    val got = Sketches.histPsiGrouped(
        Sketches.histBuildGrouped(rows.toDF("g", "v"), "v", Seq("g")),
        Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

    def bucket(v: Long): Long =
      if (v <= 15) v
      else {
        val nbits = 64 - java.lang.Long.numberOfLeadingZeros(v)
        16 + (nbits - 4) * 8 + ((v >> (nbits - 4)) - 8)
      }
    val byBucket = rows.map { case (g, v) => (g, bucket(v)) }
    val grid = byBucket.map(_._2).distinct
    val nAll = rows.size.toDouble
    byBucket.groupBy(_._1).foreach { case (g, grp) =>
      val nG = grp.size.toDouble
      val psiNano = grid.map { i =>
        val pg = math.max(grp.count(_._2 == i) / nG, 1e-6)
        val pa = math.max(byBucket.count(_._2 == i) / nAll, 1e-6)
        math.round((pg - pa) * math.log(pg / pa) * 1e9)
      }.sum
      assert(math.abs(got(g) - psiNano / 1e9) < 1e-6, s"psi of $g")
      assert(got(g) >= 0.0, "PSI is non-negative")
    }
    // The shifted group integrates far more displaced mass.
    assert(got("g2") > got("g0") * 1.5)
    val solo = rows.map { case (_, v) => ("only", v) }.toDF("g", "v")
    assert(Sketches.histPsiGrouped(
        Sketches.histBuildGrouped(solo, "v", Seq("g")), Seq("g"))
      .collect().head.getDouble(2) === 0.0)
  }

  // ------------------------------------------------------------------
  // KMV battery (same discipline as CMS/LC/hist): shard merge ==
  // single-shot bit-for-bit, exact below k, estimate envelope above,
  // and the Jaccard algebra vs exact truth on planted overlaps.

  test("kmv: shard merge == single-shot artifact, hash for hash") {
    val all = (0 until 3000).map(i => ("g", s"v$i")).toDF("g", "v")
    val shards = Seq(0 until 1200, 1200 until 1900, 1900 until 3000)
      .map(r => r.map(i => ("g", s"v$i")).toDF("g", "v"))
    val single = Sketches.kmvBuild(all, Seq("g"), "v", k = 32)
      .collect().map(_.getLong(1)).toSet
    val merged = Sketches.kmvMerge(
      shards.map(s => Sketches.kmvBuild(s, Seq("g"), "v", k = 32))
        .reduce(_ unionByName _), Seq("g"), k = 32)
      .collect().map(_.getLong(1)).toSet
    assert(merged == single)
    assert(single.size == 32)
  }

  test("kmv: exact below k, estimate within envelope above") {
    val small = (0 until 40).map(i => ("s", s"a$i"))
    val big = (0 until 5000).map(i => ("b", s"b$i"))
    val est = Sketches.kmvEstimate(
      Sketches.kmvBuild((small ++ big).toDF("g", "v"), Seq("g"), "v",
        k = 64), Seq("g"), k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est("s") == (40L, 40L), "below k the sketch IS the exact count")
    val (kn, e) = est("b")
    assert(kn == 64L)
    // rel. error ~1/sqrt(k-2) ≈ 13%; 3x headroom kills hash-luck flake
    assert(math.abs(e - 5000.0) / 5000.0 < 0.4, s"estimate $e vs 5000")
  }

  test("kmv: pairwise Jaccard estimates track planted overlap ordering") {
    // A∩B = 50% of each, A∩C = 0, B∩C = 0.
    val a = (0 until 2000).map(i => ("A", s"ab$i"))
    val b = (0 until 1000).map(i => ("B", s"ab$i")) ++
      (0 until 1000).map(i => ("B", s"bb$i"))
    val c = (0 until 2000).map(i => ("C", s"cc$i"))
    val art = Sketches.kmvBuild((a ++ b ++ c).toDF("g", "v"),
      Seq("g"), "v", k = 64)
    val j = Sketches.kmvJaccardPairs(art, "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4))
      .toMap
    // true J(A,B) = 1000/3000 ≈ 0.333; J with C = 0 exactly (disjoint
    // value sets share no hashes).
    assert(j(("A", "B")) > 0.15 && j(("A", "B")) < 0.55, j.toString)
    assert(j(("A", "C")) == 0.0 && j(("B", "C")) == 0.0, j.toString)
  }
}
