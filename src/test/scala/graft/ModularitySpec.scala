package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Modularity

/**
 * Partition-quality stats (q221) vs a sequential reference on random
 * graphs with random partitions: exact integer (internal, degree, cut,
 * q_num) per community, the Σq_num/4m² == float-modularity identity,
 * the all-in-one-community and singleton extremes, zero-edge
 * communities, and the unmapped-endpoint refusal.
 */
class ModularitySpec extends SparkSpec {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)],
      mem: Map[Long, String]): Map[String, (Long, Long, Long, Long, Long)] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(x => x._1 < x._2).distinct
    val m = e.size.toLong
    val comms = mem.values.toSeq.distinct
    comms.map { c =>
      val nodes = mem.filter(_._2 == c).keySet
      val internal = e.count(x => nodes(x._1) && nodes(x._2)).toLong
      val degree = e.count(x => nodes(x._1)).toLong + e.count(x => nodes(x._2)).toLong
      val cut = degree - 2 * internal
      val qNum = 4 * m * internal - degree * degree
      c -> ((mem.count(_._2 == c).toLong, internal, degree, cut, qNum))
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)],
      mem: Map[Long, String]): Map[String, (Long, Long, Long, Long, Long)] =
    Modularity.communityStats(edges.toDF("src", "dst"),
        mem.toSeq.toDF("node_id", "community"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap

  test("matches the sequential reference; q_num sums to float modularity") {
    for (seed <- 1 to 3) {
      val rng = new Random(seed)
      val n = 12
      val edges = (1 to 50).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val mem = (0L until n).map(v => v -> s"c${rng.nextInt(3)}").toMap
      val got = run(edges, mem)
      val ref = reference(edges, mem)
      assert(got === ref, s"seed=$seed")
      // exact-integer identity: Q = sum(q_num) / (4 m^2)
      val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(x => x._1 < x._2).distinct
      val m = e.size.toDouble
      val float = mem.values.toSeq.distinct.map { c =>
        val nodes = mem.filter(_._2 == c).keySet
        val mc = e.count(x => nodes(x._1) && nodes(x._2))
        val dc = e.count(x => nodes(x._1)) + e.count(x => nodes(x._2))
        mc / m - math.pow(dc / (2 * m), 2)
      }.sum
      val intQ = got.values.map(_._5).sum / (4.0 * m * m)
      assert(math.abs(float - intQ) < 1e-12)
    }
  }

  test("extremes: one community has Q=0; per-node singletons score negatively") {
    val rng = new Random(7)
    val edges = (1 to 30).map(_ =>
      (rng.nextInt(8).toLong, rng.nextInt(8).toLong))
    val allOne = (0L until 8L).map(_ -> "all").toMap
    assert(run(edges, allOne).values.map(_._5).sum === 0L)
    val singletons = (0L until 8L).map(v => v -> s"s$v").toMap
    assert(run(edges, singletons).values.map(_._5).sum < 0L)
  }

  test("zero-edge communities appear with all-zero stats; unmapped endpoints refuse") {
    val edges = Seq((0L, 1L))
    val mem = Map(0L -> "a", 1L -> "a", 99L -> "island")
    val got = run(edges, mem)
    assert(got("island") === ((1L, 0L, 0L, 0L, 0L)))
    assert(got("a") === ((2L, 1L, 2L, 0L, 0L))) // m=1: 4*1*1 - 4 = 0
    // The coverage gate now rides the artifact's 1-row aggregate and
    // raises when the consuming action executes (no extra eager job),
    // so the refusal surfaces as a Spark execution error whose cause
    // chain carries the raise_error message.
    val e = intercept[Exception] {
      run(Seq((0L, 1L), (1L, 2L)), Map(0L -> "a", 1L -> "a"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("cover every edge endpoint")),
      s"unexpected failure: $e")
    // Degenerate worst case: EMPTY membership against non-empty edges.
    // A gate on output rows can never fire here (the node join emits
    // nothing) and a broadcast crossJoin gate is folded away whole by
    // empty-relation propagation — the union-branch gate still raises.
    val eEmpty = intercept[Exception] {
      run(Seq((0L, 1L)), Map.empty[Long, String])
    }
    assert(messages(eEmpty).exists(_.contains("cover every edge endpoint")),
      s"unexpected failure: $eEmpty")
    // Limit short-circuiting must not skip the gate either: take(1) on
    // a violating frame with valid-looking rows available. CollectLimit
    // consumes union partitions in order and stops once satisfied, so a
    // TRAILING gate branch would never run — the gate branch LEADS.
    val eLimit = intercept[Exception] {
      Modularity.communityStats(
        Seq((0L, 1L), (1L, 2L)).toDF("src", "dst"),
        Seq((0L, "a"), (1L, "a")).toDF("node_id", "community")).take(1)
    }
    assert(messages(eLimit).exists(_.contains("cover every edge endpoint")),
      s"unexpected failure: $eLimit")
  }

  test("the coverage gate is prune-proof: projecting away q_num still refuses") {
    // ADVICE r11: a gate folded into a projected column can be dropped by
    // Catalyst column pruning when the caller keeps only other columns.
    // The gate rides a Filter now, so the narrowest projection still
    // raises on an unmapped endpoint.
    val e = intercept[Exception] {
      Modularity.communityStats(
          Seq((0L, 1L), (1L, 2L)).toDF("src", "dst"),
          Map(0L -> "a", 1L -> "a").toSeq.toDF("node_id", "community"))
        .select(col("n_nodes")) // q_num (the only m_tot reference) pruned
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("cover every edge endpoint")),
      s"unexpected failure: $e")
  }

  // ---- weighted face (q227): Newman 2004's weighted generalization.

  private def referenceW(edges: Seq[(Long, Long, Long)],
      mem: Map[Long, String]): Map[String, (Long, Long, Long, Long, Long)] = {
    // canonical pair -> summed weight (orientations and repeats merge)
    val e = edges.groupBy { case (a, b, _) => (math.min(a, b), math.max(a, b)) }
      .collect { case (k @ (s, d), g) if s < d => k -> g.map(_._3).sum }
    val W = e.values.sum
    mem.values.toSeq.distinct.map { c =>
      val nodes = mem.filter(_._2 == c).keySet
      val internal = e.collect {
        case ((s, d), w) if nodes(s) && nodes(d) => w }.sum
      val degree = e.collect { case ((s, _), w) if nodes(s) => w }.sum +
        e.collect { case ((_, d), w) if nodes(d) => w }.sum
      c -> ((mem.count(_._2 == c).toLong, internal, degree,
        degree - 2 * internal, 4 * W * internal - degree * degree))
    }.toMap
  }

  private def runW(edges: Seq[(Long, Long, Long)],
      mem: Map[Long, String]): Map[String, (Long, Long, Long, Long, Long)] =
    Modularity.communityStats(edges.toDF("src", "dst", "w"),
        mem.toSeq.toDF("node_id", "community"), Some("w"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap

  test("weighted matches the sequential reference; orientations and repeats merge") {
    for (seed <- 1 to 3) {
      val rng = new Random(40 + seed)
      val n = 10
      val edges = (1 to 60).map(_ => (rng.nextInt(n).toLong,
        rng.nextInt(n).toLong, (rng.nextInt(5) + 1).toLong))
      val mem = (0L until n).map(v => v -> s"c${rng.nextInt(3)}").toMap
      assert(runW(edges, mem) === referenceW(edges, mem), s"seed=$seed")
    }
  }

  test("weighted with w == 1 on unique edges equals the unweighted scorecard") {
    val rng = new Random(51)
    val edges = (1 to 40)
      .map(_ => (rng.nextInt(9).toLong, rng.nextInt(9).toLong))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(x => x._1 < x._2).distinct
    val mem = (0L until 9L).map(v => v -> s"g${v % 2}").toMap
    assert(runW(edges.map(e => (e._1, e._2, 1L)), mem) === run(edges, mem))
  }

  test("a doubled lane doubles its contribution exactly") {
    // two communities joined by one lane; weighting that lane w=2 must
    // equal listing the edge twice in the weighted multigraph sense
    val base = Seq((0L, 1L, 4L), (2L, 3L, 4L), (1L, 2L, 1L))
    val mem = Map(0L -> "x", 1L -> "x", 2L -> "y", 3L -> "y")
    val doubled = runW(Seq((0L, 1L, 4L), (2L, 3L, 4L), (1L, 2L, 2L)), mem)
    val viaRepeat = runW(base :+ ((1L, 2L, 1L)), mem)
    assert(doubled === viaRepeat)
  }

  /** Total q_num of a membership (Σ over communityStats rows) — the
    * exact quantity greedyMoveRound's per-node gains must move by. */
  private def qTotal(edges: Seq[(Long, Long, Long)],
      mem: Map[Long, String]): Long =
    runW(edges, mem).values.map(_._5).sum

  test("greedyMoveRound: every reported gain == the recomputed Q delta; best-positive-or-stay") {
    for (seed <- 1 to 3) {
      val rng = new Random(70 + seed)
      val n = 9
      val edges = (1 to 30)
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong,
          (rng.nextInt(4) + 1).toLong))
        .filter(e => e._1 != e._2)
      val mem = (0L until n).map(v => v -> s"c${rng.nextInt(3)}").toMap
      val got = Modularity.greedyMoveRound(edges.toDF("src", "dst", "w"),
          mem.toSeq.toDF("node_id", "community"), Some("w"))
        .as[(Long, String, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val q0 = qTotal(edges, mem)
      // neighbor communities per node, from the symmetrized edge list
      val nbrComms: Map[Long, Set[String]] = edges
        .flatMap(e => Seq(e._1 -> mem(e._2), e._2 -> mem(e._1)))
        .groupBy(_._1).map { case (i, xs) => i -> xs.map(_._2).toSet }
      for (i <- 0L until n) {
        val a = mem(i)
        // brute force: recompute Q for every single-node neighbor move
        val alts = nbrComms.getOrElse(i, Set.empty).filter(_ != a).toSeq
          .map(b => (b, qTotal(edges, mem.updated(i, b)) - q0))
        val best = alts.filter(_._2 > 0)
          .sortBy { case (b, dq) => (-dq, b) }.headOption
        val (oldC, newC, dq) = got(i)
        assert(oldC == a)
        best match {
          case Some((b, d)) =>
            assert(newC == b && dq == d,
              s"seed=$seed node=$i: got ($newC, $dq), want ($b, $d)")
          case None =>
            assert(newC == a && dq == 0L,
              s"seed=$seed node=$i should stay, got ($newC, $dq)")
        }
      }
    }
  }

  test("greedyMoveRound: unmapped endpoint refused; edge-free node stays at 0") {
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L)).toDF("src", "dst", "w")
    val mem = Seq((0L, "x"), (1L, "x")).toDF("node_id", "community")
    val ex = intercept[Exception] {
      Modularity.greedyMoveRound(edges, mem, Some("w")).collect()
    }
    assert(ex.getMessage.contains("unmapped") ||
      Option(ex.getCause).exists(_.getMessage.contains("unmapped")))
    // The degenerate worst case: EMPTY membership against non-empty
    // edges must still refuse, not return an empty frame — the gate
    // rides the always-one-row aggregate, not the (empty) output.
    val exEmpty = intercept[Exception] {
      Modularity.greedyMoveRound(edges,
        Seq.empty[(Long, String)].toDF("node_id", "community"),
        Some("w")).collect()
    }
    assert(exEmpty.getMessage.contains("unmapped") ||
      Option(exEmpty.getCause).exists(_.getMessage.contains("unmapped")))
    val full = Seq((0L, "x"), (1L, "x"), (2L, "y"), (9L, "z"))
      .toDF("node_id", "community")
    val out = Modularity.greedyMoveRound(edges, full, Some("w"))
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(9L) == (("z", "z", 0L)))
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("the gate survives a pushed sentinel-excluding predicate (ADVICE r12)") {
    // A caller filter false on the sentinel row (n_nodes > 0, or the
    // natural movers-only dq_num > 0) pushes through the Union into the
    // gate branch; over LITERAL sentinel columns it constant-folds to
    // false and PruneFilters/PropagateEmptyRelation delete the branch,
    // raise and all. The sentinels now derive from the gate aggregate,
    // so the pushed predicate cannot fold and the raise still fires.
    val badEdges = Seq((0L, 1L, 1L), (1L, 2L, 1L)).toDF("src", "dst", "w")
    val badMem = Seq((0L, "a"), (1L, "a")).toDF("node_id", "community")
    val eStats = intercept[Exception] {
      Modularity.communityStats(badEdges, badMem, Some("w"))
        .filter(col("n_nodes") > 0).collect()
    }
    assert(messages(eStats).exists(_.contains("cover every edge endpoint")),
      s"unexpected failure: $eStats")
    val eMove = intercept[Exception] {
      Modularity.greedyMoveRound(badEdges, badMem, Some("w"))
        .filter(col("dq_num") > 0).collect()
    }
    assert(messages(eMove).exists(_.contains("unmapped")),
      s"unexpected failure: $eMove")
    // And the same predicates over VALID input behave as plain filters
    // (the gate branch emits zero rows, so nothing leaks through).
    val okMem = Seq((0L, "a"), (1L, "a"), (2L, "b"))
      .toDF("node_id", "community")
    val rows = Modularity.communityStats(badEdges, okMem, Some("w"))
      .filter(col("n_nodes") > 0).collect()
    assert(rows.length === 2)
    assert(Modularity.greedyMoveRound(badEdges, okMem, Some("w"))
      .filter(col("dq_num") > 0).collect()
      .forall(_.getLong(3) > 0))
  }

  // ---- Louvain phase 2: coarsening (round 13).

  /** Total q_num under the self-loop convention (coarse graphs). */
  private def qTotalSelf(edges: Seq[(Long, Long, Long)],
      mem: Map[Long, String]): Long =
    Modularity.communityStats(edges.toDF("src", "dst", "w"),
        mem.toSeq.toDF("node_id", "community"), Some("w"),
        selfLoops = true)
      .collect().map(_.getLong(5)).sum

  test("coarsen: weight conserved; coarse scorecard == fine scorecard (composed)") {
    for (seed <- 1 to 3) {
      val rng = new Random(90 + seed)
      val n = 12
      val edges = (1 to 60)
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong,
          (rng.nextInt(5) + 1).toLong))
        .filter(e => e._1 != e._2)
      // numeric community labels (long-castable — the ladder contract)
      val mem = (0L until n).map(v => v -> s"${rng.nextInt(4)}").toMap
      val coarse = Modularity.coarsen(edges.toDF("src", "dst", "w"),
          mem.toSeq.toDF("node_id", "community"), Some("w"))
        .as[(String, String, Long)].collect()
      // W conserved: every canonical fine edge lands in exactly one group
      val canonFine = edges
        .groupBy(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .toSeq.map { case ((a, b), g) => (a, b, g.map(_._3).sum) }
      assert(coarse.map(_._3).sum === canonFine.map(_._3).sum,
        s"seed=$seed W")
      // self-loop mass per community == its internal fine weight
      val selfw = coarse.filter(e => e._1 == e._2)
        .map(e => e._1 -> e._3).toMap
      val wantSelf = canonFine.filter(e => mem(e._1) == mem(e._2))
        .groupBy(e => mem(e._1))
        .map { case (c, xs) => c -> xs.map(_._3).sum }
      assert(selfw === wantSelf, s"seed=$seed self-loop mass")
      // scorecard conservation: coarse stats under ANY coarse grouping M
      // == fine stats under the composed membership M ∘ mem
      val grouping = mem.values.toSeq.distinct
        .map(c => c -> s"${c.toLong % 2}").toMap
      val coarseEdges = coarse.map(e => (e._1.toLong, e._2.toLong, e._3))
      val coarseMem = grouping.map { case (c, g) => c.toLong -> g }
      val composed = mem.map { case (v, c) => v -> grouping(c) }
      assert(qTotalSelf(coarseEdges.toSeq, coarseMem) ===
        qTotal(edges, composed), s"seed=$seed q conservation")
    }
  }

  test("coarsen: coarsening an already-coarse graph (selfLoops input) conserves W again") {
    val rng = new Random(101)
    val n = 10
    val edges = (1 to 40)
      .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong,
        (rng.nextInt(4) + 1).toLong))
      .filter(e => e._1 != e._2)
    val mem1 = (0L until n).map(v => v -> s"${v % 5}").toMap
    val c1 = Modularity.coarsen(edges.toDF("src", "dst", "w"),
        mem1.toSeq.toDF("node_id", "community"), Some("w"))
      .as[(String, String, Long)].collect()
    val mem2 = (0L until 5L).map(c => c -> s"${c % 2}").toMap
    val c2 = Modularity.coarsen(
        c1.map(e => (e._1.toLong, e._2.toLong, e._3)).toSeq
          .toDF("src", "dst", "w"),
        mem2.map { case (k, v) => (k, v) }.toSeq.toDF("node_id", "community"),
        Some("w"), selfLoops = true)
      .as[(String, String, Long)].collect()
    assert(c2.map(_._3).sum === c1.map(_._3).sum)
    // two-level composition == direct coarsening by the composed map
    val direct = Modularity.coarsen(edges.toDF("src", "dst", "w"),
        mem1.map { case (v, c) => v -> mem2(c.toLong) }.toSeq
          .toDF("node_id", "community"), Some("w"))
      .as[(String, String, Long)].collect()
    assert(c2.toSet === direct.toSet)
  }

  test("coarsen: unmapped endpoint refuses, incl. under a pushed predicate and empty membership") {
    val edges = Seq((0L, 1L, 2L), (1L, 2L, 1L)).toDF("src", "dst", "w")
    val mem = Seq((0L, "0"), (1L, "0")).toDF("node_id", "community")
    val e1 = intercept[Exception] {
      Modularity.coarsen(edges, mem, Some("w")).collect()
    }
    assert(messages(e1).exists(_.contains("cover every edge endpoint")))
    val e2 = intercept[Exception] {
      Modularity.coarsen(edges, mem, Some("w"))
        .filter(col("w") > 0).collect()
    }
    assert(messages(e2).exists(_.contains("cover every edge endpoint")))
    val e3 = intercept[Exception] {
      Modularity.coarsen(edges,
        Seq.empty[(Long, String)].toDF("node_id", "community"),
        Some("w")).take(1)
    }
    assert(messages(e3).exists(_.contains("cover every edge endpoint")))
  }

  test("greedyMoveRound with self-loops: gains exact; self mass cancels out of Δ") {
    for (seed <- 1 to 3) {
      val rng = new Random(110 + seed)
      val n = 8
      // graph WITH self-loops — the coarse-level shape
      val edges = (1 to 30).map(_ => (rng.nextInt(n).toLong,
        rng.nextInt(n).toLong, (rng.nextInt(4) + 1).toLong))
      val mem = (0L until n).map(v => v -> s"${rng.nextInt(3)}").toMap
      val got = Modularity.greedyMoveRound(edges.toDF("src", "dst", "w"),
          mem.toSeq.toDF("node_id", "community"), Some("w"),
          selfLoops = true)
        .as[(Long, String, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val q0 = qTotalSelf(edges, mem)
      val nbrComms: Map[Long, Set[String]] = edges
        .filter(e => e._1 != e._2)
        .flatMap(e => Seq(e._1 -> mem(e._2), e._2 -> mem(e._1)))
        .groupBy(_._1).map { case (i, xs) => i -> xs.map(_._2).toSet }
      for (i <- 0L until n) {
        val a = mem(i)
        val alts = nbrComms.getOrElse(i, Set.empty).filter(_ != a).toSeq
          .map(b => (b, qTotalSelf(edges, mem.updated(i, b)) - q0))
        val best = alts.filter(_._2 > 0)
          .sortBy { case (b, dq) => (-dq, b) }.headOption
        val (oldC, newC, dq) = got(i)
        assert(oldC == a)
        best match {
          case Some((b, d)) =>
            assert(newC == b && dq == d,
              s"seed=$seed node=$i: got ($newC, $dq), want ($b, $d)")
          case None =>
            assert(newC == a && dq == 0L,
              s"seed=$seed node=$i should stay, got ($newC, $dq)")
        }
      }
    }
  }

  test("the full ladder: move -> coarsen -> move, scored at both levels identically") {
    val rng = new Random(131)
    val n = 12
    val edges = (1 to 50)
      .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong,
        (rng.nextInt(3) + 1).toLong))
      .filter(e => e._1 != e._2)
    // singleton init — the standard Louvain convention (labels = ids)
    val mem0 = (0L until n).map(v => v -> v.toString).toMap
    val r1 = Modularity.greedyMoveRound(edges.toDF("src", "dst", "w"),
        mem0.toSeq.toDF("node_id", "community"), Some("w"))
      .as[(Long, String, String, Long)].collect()
    val mem1 = r1.map(r => r._1 -> r._3).toMap
    val coarse = Modularity.coarsen(edges.toDF("src", "dst", "w"),
        mem1.toSeq.toDF("node_id", "community"), Some("w"))
      .as[(String, String, Long)].collect()
    val cEdges = coarse.map(e => (e._1.toLong, e._2.toLong, e._3)).toSeq
    val cMem0 = mem1.values.toSeq.distinct.map(c => c.toLong -> c).toMap
    val r2 = Modularity.greedyMoveRound(cEdges.toDF("src", "dst", "w"),
        cMem0.toSeq.toDF("node_id", "community"), Some("w"),
        selfLoops = true)
      .as[(Long, String, String, Long)].collect()
    val cMem1 = r2.map(r => r._1 -> r._3).toMap
    // the coarse-level score of the moved coarse membership equals the
    // fine-level score of the COMPOSED membership — the invariant that
    // makes multi-level Louvain's q comparable across levels
    val composed = mem1.map { case (v, c) => v -> cMem1(c.toLong) }
    assert(qTotalSelf(cEdges, cMem1) === qTotal(edges, composed))
  }

  test("unmapped endpoints reached only by ZERO-weight edges still refuse (ADVICE r12)") {
    // A mass-based gate (sum of unmapped weight) sees 0 here and passes;
    // the violation is the null-community ROW, whatever its weight —
    // node 2 is unmapped but its only edge carries w = 0.
    val edges = Seq((0L, 1L, 3L), (1L, 2L, 0L)).toDF("src", "dst", "w")
    val mem = Seq((0L, "a"), (1L, "a")).toDF("node_id", "community")
    val eMove = intercept[Exception] {
      Modularity.greedyMoveRound(edges, mem, Some("w")).collect()
    }
    assert(messages(eMove).exists(_.contains("unmapped")),
      s"unexpected failure: $eMove")
    val eStats = intercept[Exception] {
      Modularity.communityStats(edges, mem, Some("w")).collect()
    }
    assert(messages(eStats).exists(_.contains("cover every edge endpoint")),
      s"unexpected failure: $eStats")
  }

  // ---- Full multi-level Louvain driver (round 14).

  test("louvain: Q monotone per accepted level; composed fine membership scores == final level Q") {
    for (seed <- 1 to 2) {
      val rng = new Random(140 + seed)
      val n = 40
      // planted 4-block structure so multiple levels actually fire
      val edges = (1 to 250).map { _ =>
        val a = rng.nextInt(n).toLong
        val b = if (rng.nextInt(10) < 8)
          (a / 10) * 10 + rng.nextInt(10) else rng.nextInt(n).toLong
        (a, b, (rng.nextInt(3) + 1).toLong)
      }.filter(e => e._1 != e._2)
      val (mem, sc) = Modularity.louvain(edges.toDF("src", "dst", "w"),
        Some("w"), maxLevels = 4, minGain = 0L)
      val levels = sc.orderBy(col("level"))
        .as[(Int, Long, Long, Long)].collect()
      assert(levels.nonEmpty, "planted structure must accept >= 1 level")
      // strictly monotone Q across accepted levels (minGain = 0)
      levels.map(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b > a, s"Q not increasing: $a -> $b")
        case _ =>
      }
      // graph shrinks per level; level 1 ran on the full node set
      assert(levels.head._4 ===
        edges.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong)
      levels.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._3,
          "next level's graph size == previous level's community count")
        case _ =>
      }
      // the composed FINE membership scores exactly the final level's Q
      val composed = mem.as[(Long, String)].collect().toMap
      assert(qTotalSelf(edges, composed) === levels.last._2)
      // membership covers every node, labels long-castable
      assert(composed.keySet ===
        edges.flatMap(e => Seq(e._1, e._2)).toSet)
      composed.values.foreach(_.toLong)
    }
  }

  test("louvain: no improving level -> singleton membership, empty scorecard") {
    val edges = Seq((0L, 1L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    // minGain = MaxValue: no finite gain clears it, so level 1's moves
    // are discarded and the singleton init comes back untouched.
    val (mem, sc) = Modularity.louvain(edges, Some("w"),
      maxLevels = 4, minGain = Long.MaxValue)
    assert(sc.count() === 0L)
    val m = mem.as[(Long, String)].collect().toMap
    assert(m === Map(0L -> "0", 1L -> "1", 2L -> "2", 3L -> "3"))
  }

  test("louvain: forced levels (q246 mode) run exactly maxLevels and keep the composition identity") {
    // Forced mode (minGain = Long.MinValue — what q246 runs so the
    // oracle can unroll a FIXED number of levels): every level is
    // accepted, including non-improving ones (synchronous super-node
    // pair swaps are legal there), so the invariants are (1) exactly
    // maxLevels scorecard rows and (2) the composed fine membership
    // scores the LAST level's Q — the composition identity that holds
    // whatever the per-level moves did.
    val clique = (base: Long) => (for {
      i <- 0 until 5; j <- (i + 1) until 5
    } yield (base + i, base + j, 2L))
    val edges = clique(0L) ++ clique(10L) :+ ((4L, 10L, 1L))
    val (memForced, scForced) = Modularity.louvain(
      edges.toDF("src", "dst", "w"), Some("w"),
      maxLevels = 3, minGain = Long.MinValue)
    val fLevels = scForced.orderBy(col("level"))
      .as[(Int, Long, Long, Long)].collect()
    assert(fLevels.length === 3)
    val fm = memForced.as[(Long, String)].collect().toMap
    assert(qTotalSelf(edges, fm) === fLevels.last._2)
    // The early-stop production run on the same graph: each clique one
    // community, the bridge did not merge them, Q strictly monotone.
    val (memStop, scStop) = Modularity.louvain(
      edges.toDF("src", "dst", "w"), Some("w"),
      maxLevels = 5, minGain = 0L)
    val a = memStop.as[(Long, String)].collect().toMap
    assert(a.filter(_._1 < 5).values.toSet.size === 1)
    assert(a.filter(_._1 >= 10).values.toSet.size === 1)
    assert(a(0L) !== a(10L))
    assert(scStop.count() >= 1L)
  }

  test("self-loop-only unmapped node refuses under selfLoops (ADVICE r13)") {
    // Node 5's only edge is its self-loop: sym excludes self pairs, so
    // no null-cj group forms in wicAll — the pre-fix gate never saw it
    // and its 2w degree silently dropped from s_c. The self-loop
    // endpoints now gate through their own membership left-join.
    val edges = Seq((0L, 1L, 2L), (5L, 5L, 3L)).toDF("src", "dst", "w")
    val mem = Seq((0L, "a"), (1L, "a")).toDF("node_id", "community")
    val eMove = intercept[Exception] {
      Modularity.greedyMoveRound(edges, mem, Some("w"), selfLoops = true)
        .collect()
    }
    assert(messages(eMove).exists(_.contains("unmapped")),
      s"unexpected failure: $eMove")
    // Mapped, the same graph passes and the self-loop node stays put.
    val okMem = Seq((0L, "a"), (1L, "a"), (5L, "z"))
      .toDF("node_id", "community")
    val out = Modularity.greedyMoveRound(edges, okMem, Some("w"),
        selfLoops = true)
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(5L) === (("z", "z", 0L)))
  }
}
