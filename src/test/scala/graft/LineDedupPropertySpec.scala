package graft

import scala.util.Random

import graft.operators.Dedup

/**
 * Property-style tests for C4-style corpus-level line dedup
 * (Dedup.corpusLineDedup, oracle q89): seeded random corpora with
 * boilerplate lines planted across docs, compared EXACTLY against a
 * sequential in-test reimplementation of the first-occurrence-wins rule —
 * the same discipline as SpanDedupPropertySpec. The generator forces the
 * adversarial shapes the sf0.01 oracle can't: blank-only docs, docs whose
 * every line loses, the same line repeated within one doc, and
 * whitespace-only lines.
 */
class LineDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Random corpus: a pool of boilerplate lines planted into many docs,
    * unique per-doc lines, blank/whitespace lines interleaved. Doc 100 is
    * blank-only; doc 101 contains ONLY boilerplate lines that also occur
    * in earlier docs (so it loses every line); doc 102 repeats one line
    * three times within itself. */
  private def gen(seed: Int): Seq[(Long, String)] = {
    val r = new Random(seed)
    // "\t" is deliberately in the BOILERPLATE pool, not the blank pool:
    // SQL trim (Spark and DuckDB alike) strips only spaces, so a tab-only
    // line is CONTENT that dedups corpus-wide like any other repeated line
    // — the reference below encodes the same space-only-blank rule.
    val boiler = (0 until 8).map(i => s"all rights reserved $i c$seed") :+ "\t"
    val blanks = Seq("", "   ", " ")
    val normal = (0L until 20L).map { id =>
      val nLines = 3 + r.nextInt(6)
      val lines = (0 until nLines).map { j =>
        r.nextInt(10) match {
          case 0 | 1 | 2 => boiler(r.nextInt(boiler.size)) // planted repeat
          case 3         => blanks(r.nextInt(blanks.size)) // blank
          case _         => s"unique d${id} l$j ${r.nextInt(1000)}"
        }
      }
      id -> lines.mkString("\n")
    }
    val blankOnly = 100L -> blanks(r.nextInt(blanks.size))
    // Every line of doc 101 is boilerplate; with 20 earlier docs planting
    // boilerplate at ~30% per line, each of the 8 strings occurs earlier
    // with overwhelming probability — but the REFERENCE decides, not an
    // assumption: the test only asserts Spark == reference.
    val allLose = 101L -> (0 until 5).map(i => boiler(i % boiler.size)).mkString("\n")
    val selfDup = 102L -> Seq("repeat me please", "middle x", "repeat me please",
      "", "repeat me please").mkString("\n")
    normal ++ Seq(blankOnly, allLose, selfDup)
  }

  /** Sequential reference: split on '\n' (trailing empties kept, like
    * Spark's split), drop blank lines (blank = nothing but spaces — SQL
    * trim semantics, NOT Java's all-whitespace trim), keep a line
    * occurrence iff it is the corpus-wide min (doc_id, idx) for that exact
    * line text, reassemble survivors in original order. Blank-only docs
    * emit no row. */
  private def ref(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val lines = docs.flatMap { case (id, t) =>
      t.split("\n", -1).zipWithIndex.collect {
        case (l, i) if l.exists(_ != ' ') => (id, i.toLong, l)
      }
    }
    val winner = lines.groupBy(_._3).map { case (l, occ) =>
      l -> occ.map(o => (o._1, o._2)).min
    }
    lines.groupBy(_._1).map { case (id, ls) =>
      val inOrder = ls.sortBy(_._2)
      val kept = inOrder.filter(o => winner(o._3) == ((o._1, o._2)))
      id -> (inOrder.size.toLong, kept.size.toLong, kept.map(_._3).mkString("\n"))
    }
  }

  for (seed <- Seq(21, 22, 23))
  test(s"corpusLineDedup == sequential reference on generated corpus, seed $seed") {
    val docs = gen(seed)
    val got = Dedup.corpusLineDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val want = ref(docs)
    assert(got.keySet == want.keySet,
      s"seed $seed doc set mismatch: extra=${got.keySet -- want.keySet} " +
        s"missing=${want.keySet -- got.keySet}")
    got.foreach { case (id, v) =>
      assert(v == want(id), s"seed $seed doc $id: got $v want ${want(id)}")
    }
    // The forced edge shapes really occurred: blank-only doc emitted no
    // row; some doc lost every non-blank line.
    assert(!got.contains(100L), "blank-only doc must emit no row")
    assert(got.exists { case (_, (_, nKept, text)) => nKept == 0L && text == "" },
      s"seed $seed: generator failed to produce a doc losing every line")
  }

  test("corpusLineDedup: every distinct line survives exactly once corpus-wide") {
    val docs = gen(31)
    val out = Dedup.corpusLineDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
    val survivors = out.flatMap(r => r._4.split("\n", -1).filter(_.exists(_ != ' ')))
    val distinctInput = docs.flatMap(_._2.split("\n", -1)).filter(_.exists(_ != ' ')).distinct
    assert(survivors.length == survivors.distinct.length,
      "a line text survived twice")
    assert(survivors.toSet == distinctInput.toSet,
      "survivor set != distinct non-blank input lines")
  }
}
