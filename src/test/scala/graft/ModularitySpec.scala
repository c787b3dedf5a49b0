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
}
