package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Motif finding over a plain (src, dst) edge frame — a GraphFrames-style
 * structural-pattern surface (the public `graphframes.GraphFrame.find`
 * grammar over node and edge variables) compiled STRAIGHT to Catalyst
 * joins: no graph runtime, no custom execution, every term is an
 * equi-join (or anti-join) the optimizer plans like any other.
 *
 * Pattern grammar (terms separated by `;`):
 *  - positive term `(a)-[]->(b)`: an edge from `a` to `b`. Named vars
 *    bind across terms (`(a)-[]->(b); (b)-[]->(c)` chains); a repeated
 *    pair adds a constraint (`(a)-[]->(b); (b)-[]->(a)` = reciprocal);
 *    `(a)-[]->(a)` matches self-loops. `()` is anonymous: matched,
 *    never returned, each occurrence distinct.
 *  - edge variable `(a)-[e]->(b)`: binds the matched edge's FULL row as
 *    a struct column `e` (all edge-frame columns, GraphFrames-style) —
 *    weights/labels/timestamps ride along without a re-join. Edge names
 *    must be unique across terms (each names one concrete edge
 *    occurrence) and disjoint from node variables.
 *  - negated term `!(a)-[]->(b)`: no such edge exists — compiled to a
 *    LEFT ANTI join. An anonymous end is unconstrained:
 *    `!(b)-[]->()` keeps rows whose `b` has NO out-edge at all. A
 *    negated term cannot bind an edge variable (no edge exists to
 *    bind).
 *
 * Semantics: one output row per assignment of the named node variables
 * (times anonymous-variable multiplicity — `distinct()` the result if
 * instances are wanted set-wise); columns are the named node and edge
 * variables in first-appearance order. Matches GraphFrames' join
 * semantics over a deduplicated edge list.
 *
 * Scale shape: k positive terms compile to k−1 equi-joins keyed on the
 * shared variables and each negation to one anti-join — all
 * broadcastable/AQE-planned like any join in this library. Disconnected
 * patterns (a term sharing no variable with what's already bound) are
 * REJECTED rather than planned as cross products — run separate finds
 * and combine deliberately if a cartesian is truly meant. Negations are
 * applied after all positive terms (pure filters — order-independent),
 * so every anti-join probes the full bound frame once; anti-join probes
 * carry only (src, dst), never edge payloads. Hub nodes inflate
 * multi-term matches as C(deg, k−1); for BARE structural edge frames
 * the shared guard is [[GraphOps.degreeCapped]] applied first (q214's
 * measured 6.5 GB → 111 MB). Note degreeCapped canonicalizes, dedups,
 * and returns only (s, d) — on payload-carrying or multigraph frames
 * (edge-variable motifs like q226's (src, dst, month, w)) apply the
 * same idea as a degree filter + LEFT SEMI against the kept-node set
 * instead, so payload columns and multiplicity survive.
 */
object Motifs {

  private val Term = """^(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)$""".r

  def find(edges: DataFrame, pattern: String,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val terms: Seq[(Boolean, String, String, String)] =
      pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map {
        case Term(neg, a, ev, b) =>
          require(neg.isEmpty || ev.isEmpty,
            s"edge variable [$ev] on a negated term — no edge exists to bind")
          Seq(a, ev, b).foreach(v => require(!v.startsWith("__"),
            s"variable '$v' — names starting with __ are reserved " +
              "(internal anonymous columns)"))
          (neg == "!", a, ev, b)
        case t => throw new IllegalArgumentException(
          s"bad motif term '$t' — expected (a)-[]->(b), (a)-[e]->(b) or !(a)-[]->(b)")
      }
    require(terms.nonEmpty, "empty motif pattern")
    val edgeVars = terms.map(_._3).filter(_.nonEmpty)
    require(edgeVars.distinct.size == edgeVars.size,
      s"duplicate edge variable: each names one concrete edge occurrence")
    val nodeVars = terms.flatMap(t => Seq(t._2, t._4)).filter(_.nonEmpty)
    val clash = edgeVars.toSet.intersect(nodeVars.toSet)
    require(clash.isEmpty,
      s"name(s) used as both node and edge variable: ${clash.mkString(", ")}")
    val (negs, poss) = terms.partition(_._1)
    require(poss.nonEmpty, "motif needs at least one positive term")

    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
    val edgeStruct = struct(edges.columns.map(col): _*)
    var fresh = 0
    def anon(): String = { fresh += 1; s"__anon$fresh" }
    var order = Vector.empty[String]
    def note(v: String): Unit =
      if (v.nonEmpty && !v.startsWith("__anon") && !order.contains(v))
        order :+= v

    var cur: Option[DataFrame] = None
    poss.foreach { case (_, a0, ev, b0) =>
      val a = if (a0.isEmpty) anon() else a0
      val b = if (b0.isEmpty) anon() else b0
      val evCol = if (ev.isEmpty) Nil else Seq(edgeStruct.as(ev))
      val tf =
        if (a == b) edges.filter(col(srcCol) === col(dstCol))
          .select(col(srcCol).as(a) +: evCol: _*)
        else edges.select(
          Seq(col(srcCol).as(a), col(dstCol).as(b)) ++ evCol: _*)
      cur = cur match {
        case None => Some(tf)
        case Some(c) =>
          val overlap = tf.columns.toSeq
            .filter(v => v != ev && c.columns.contains(v))
          require(overlap.nonEmpty,
            s"disconnected motif term ($a0)-[$ev]->($b0) — would be a cross " +
              "product; run separate find() calls and combine deliberately")
          Some(c.join(tf, overlap))
      }
      note(a); note(ev); note(b)
    }
    var out = cur.get
    negs.foreach { case (_, a0, _, b0) =>
      require(a0.nonEmpty || b0.nonEmpty,
        "negated term needs at least one named variable")
      Seq(a0, b0).filter(_.nonEmpty).foreach { v =>
        require(out.columns.contains(v),
          s"negated term references unbound variable '$v' — negations " +
            "constrain variables introduced by positive terms")
      }
      val conds = Seq(
        if (a0.nonEmpty) Some(out(a0) === e("__s")) else None,
        if (b0.nonEmpty) Some(out(b0) === e("__d")) else None).flatten
      out = out.join(e, conds.reduce(_ && _), "left_anti")
    }
    out.select(order.map(col): _*)
  }
}
