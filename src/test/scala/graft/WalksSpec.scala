package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Walks

/**
 * Deterministic random walks (q216) vs a sequential reference on random
 * directed graphs: exact corpus equality (the md5 min-hash draw replayed
 * step by step), walker count, edge validity of every transition,
 * dead-end truncation, seed sensitivity, and skip-gram pair extraction
 * against a brute-force window scan.
 */
class WalksSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Sequential replay of the operator's contract. */
  private def referenceWalks(edges: Seq[(String, String)],
      walksPerNode: Int, walkLength: Int,
      seed: String): Seq[(String, Int, String)] = {
    val adj = edges.distinct.groupBy(_._1)
      .map { case (s, g) => s -> g.map(_._2).distinct }
    val starts = edges.map(_._1).distinct
    starts.flatMap { start =>
      (0 until walksPerNode).flatMap { rep =>
        val wid = s"$start#$rep"
        var cur = start
        var out = List((wid, 0, cur))
        var t = 1
        var alive = true
        while (t <= walkLength && alive) {
          adj.get(cur) match {
            case Some(nbrs) =>
              cur = nbrs.minBy(v => (md5hex(s"$seed|$wid|$t|$cur|$v"), v))
              out ::= ((wid, t, cur))
            case None => alive = false
          }
          t += 1
        }
        out.reverse
      }
    }
  }

  private def randomGraph(rng: Random, n: Int, m: Int): Seq[(String, String)] =
    (1 to m).map(_ => (s"n${rng.nextInt(n)}", s"n${rng.nextInt(n)}"))
      .filter(e => e._1 != e._2)

  test("matches the sequential md5 replay exactly on random graphs") {
    for (gseed <- 1 to 3) {
      val rng = new Random(gseed)
      val edges = randomGraph(rng, 12, 40)
      val got = Walks
        .deterministicWalks(edges.toDF("src", "dst"), 2, 4, s"s$gseed")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toSet
      assert(got === referenceWalks(edges, 2, 4, s"s$gseed").toSet)
    }
  }

  test("every transition is an edge and walker count is exact") {
    val rng = new Random(7)
    val edges = randomGraph(rng, 20, 60)
    val walks = Walks
      .deterministicWalks(edges.toDF("src", "dst"), 3, 5, "t")
      .cache()
    val starts = edges.map(_._1).distinct.size
    assert(walks.filter(col("step") === 0).count() === starts * 3L)
    // consecutive (node@t, node@t+1) must be a real edge
    val a = walks.select(col("walk_id"), col("step"), col("node").as("u"))
    val b = walks.select(col("walk_id"),
      (col("step") - 1).as("step"), col("node").as("v"))
    val trans = a.join(b, Seq("walk_id", "step"))
      .select(col("u"), col("v")).distinct()
    val bad = trans.join(edges.toDF("u", "v"), Seq("u", "v"), "left_anti")
    assert(bad.count() === 0L)
    walks.unpersist()
  }

  test("dead ends truncate; different seeds give different corpora") {
    val edges = Seq(("a", "b"), ("a", "c")) // b, c have no out-edges
    val walks = Walks
      .deterministicWalks(edges.toDF("src", "dst"), 1, 5, "x")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    // only `a` starts a walk; it takes exactly one step then stops
    assert(walks.map(_._1).distinct.toSeq === Seq("a#0"))
    assert(walks.map(_._2).sorted.toSeq === Seq(0, 1))
    // a diamond where the draw can differ: check some seed pair differs
    val g2 = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
    val corpora = Seq("s1", "s2", "s3", "s4").map { sd =>
      Walks.deterministicWalks(g2.toDF("src", "dst"), 1, 6, sd)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toSet
    }
    assert(corpora.distinct.size > 1)
  }

  /** Sequential replay of the node2vec ticket-draw contract. */
  private def referenceNode2vec(edges: Seq[(String, String)],
      walksPerNode: Int, walkLength: Int, seed: String,
      wReturn: Int, wCommon: Int, wOut: Int): Seq[(String, Int, String)] = {
    val es = edges.distinct.toSet
    val adj = edges.distinct.groupBy(_._1)
      .map { case (s, g) => s -> g.map(_._2).distinct }
    val starts = edges.map(_._1).distinct
    starts.flatMap { start =>
      (0 until walksPerNode).flatMap { rep =>
        val wid = s"$start#$rep"
        var cur = start
        var prev: String = null
        var out = List((wid, 0, cur))
        var t = 1
        var alive = true
        while (t <= walkLength && alive) {
          adj.get(cur) match {
            case Some(nbrs) =>
              val ticketed = nbrs.flatMap { v =>
                val w =
                  if (t == 1) 1
                  else if (v == prev) wReturn
                  else if (es.contains((prev, v))) wCommon
                  else wOut
                (0 until w).map(i => (v, i))
              }
              if (ticketed.isEmpty) alive = false
              else {
                val pick = ticketed.minBy { case (v, i) =>
                  (md5hex(s"$seed|$wid|$t|$cur|$v|$i"), v)
                }._1
                prev = cur; cur = pick
                out ::= ((wid, t, cur))
              }
            case None => alive = false
          }
          t += 1
        }
        out.reverse
      }
    }
  }

  test("node2vec walks match the sequential ticket replay") {
    for ((wr, wc, wo) <- Seq((1, 2, 4), (0, 1, 3), (4, 1, 1), (2, 0, 1))) {
      val rng = new Random(31 * wr + 7 * wc + wo)
      val dir = randomGraph(rng, 10, 35)
      val edges = (dir ++ dir.map(_.swap)).distinct // symmetric, node2vec's home turf
      val got = Walks
        .node2vecWalks(edges.toDF("src", "dst"), 2, 4, "n2v",
          wReturn = wr, wCommon = wc, wOut = wo)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toSet
      val ref = referenceNode2vec(edges, 2, 4, "n2v", wr, wc, wo).toSet
      assert(got === ref, s"weights ($wr, $wc, $wo)")
    }
  }

  test("node2vec wReturn=0 never backtracks") {
    val rng = new Random(5)
    val dir = randomGraph(rng, 8, 30)
    val edges = (dir ++ dir.map(_.swap)).distinct
    val walks = Walks.node2vecWalks(edges.toDF("src", "dst"), 2, 6,
      "nb", wReturn = 0, wCommon = 1, wOut = 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val byWalk = walks.groupBy(_._1).values
    for (w <- byWalk) {
      val seq = w.sortBy(_._2).map(_._3)
      for (i <- 2 until seq.length)
        assert(seq(i) !== seq(i - 2),
          s"backtracked at step $i in ${seq.mkString("->")}")
    }
  }

  /** Sequential replay of the weighted ticket-draw contract. */
  private def referenceWeighted(edges: Seq[(String, String, Int)],
      walksPerNode: Int, walkLength: Int, seed: String,
      cap: Int): Seq[(String, Int, String)] = {
    val live = edges.map { case (s, d, w) => (s, d, math.min(w, cap)) }
      .filter(_._3 >= 1).distinct
    val adj = live.groupBy(_._1)
      .map { case (s, g) => s -> g.map(e => (e._2, e._3)) }
    val starts = live.map(_._1).distinct
    starts.flatMap { start =>
      (0 until walksPerNode).flatMap { rep =>
        val wid = s"$start#$rep"
        var cur = start
        var out = List((wid, 0, cur))
        var t = 1
        var alive = true
        while (t <= walkLength && alive) {
          adj.get(cur) match {
            case Some(nbrs) =>
              cur = nbrs.flatMap { case (v, w) =>
                (0 until w).map(i => (v, i))
              }.minBy { case (v, i) =>
                (md5hex(s"$seed|$wid|$t|$cur|$v|$i"), v)
              }._1
              out ::= ((wid, t, cur))
            case None => alive = false
          }
          t += 1
        }
        out.reverse
      }
    }
  }

  test("weighted walks match the sequential ticket replay; weight-1 == uniform-with-ticket") {
    for (gseed <- 1 to 3) {
      val rng = new Random(100 + gseed)
      val edges = randomGraph(rng, 10, 40).distinct
        .map { case (s, d) => (s, d, 1 + rng.nextInt(10)) } // some past cap
      val got = Walks
        .weightedWalks(edges.toDF("src", "dst", "w"), 2, 4, s"wt$gseed")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toSet
      assert(got === referenceWeighted(edges, 2, 4, s"wt$gseed", 8).toSet)
    }
    // all-weight-1 weighted walk == the ticketed-uniform reference
    val rng = new Random(200)
    val flat = randomGraph(rng, 8, 25).distinct.map { case (s, d) => (s, d, 1) }
    val got1 = Walks.weightedWalks(flat.toDF("src", "dst", "w"), 1, 3, "u1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got1 === referenceWeighted(flat, 1, 3, "u1", 8).toSet)
  }

  test("weighted walks never traverse weight<1 edges; heavy edges dominate") {
    // u has a w=0 edge to x (absent) and a w=8 edge to y vs w=1 to z:
    // y must win far more often across seeds than z
    val edges = Seq(("u", "x", 0), ("u", "y", 8), ("u", "z", 1),
      ("y", "u", 1), ("z", "u", 1))
    var yWins = 0
    for (sd <- 1 to 12) {
      val first = Walks
        .weightedWalks(edges.toDF("src", "dst", "w"), 1, 1, s"h$sd")
        .collect().collectFirst {
          case r if r.getString(0) == "u#0" && r.getInt(1) == 1 =>
            r.getString(2)
        }.get
      assert(first !== "x")
      if (first == "y") yWins += 1
    }
    assert(yWins >= 8, s"w=8 edge won only $yWins/12 draws vs w=1")
  }

  test("skipgramPairs matches a brute-force window scan") {
    val rng = new Random(11)
    val edges = randomGraph(rng, 10, 30)
    val ref = referenceWalks(edges, 2, 5, "sg")
    val expected = ref.groupBy(_._1).values.flatMap { walk =>
      val byStep = walk.sortBy(_._2)
      for {
        (_, s1, u) <- byStep
        (_, s2, v) <- byStep
        if s2 > s1 && s2 <= s1 + 2
      } yield (u, v)
    }.groupBy(identity).map { case (k, g) => (k._1, k._2, g.size.toLong) }
    val got = Walks.skipgramPairs(
      Walks.deterministicWalks(edges.toDF("src", "dst"), 2, 5, "sg"), 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected.toSet)
  }
}
