package graft

import scala.util.Random

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential BPE reference: same tie-breaks, same leftmost-greedy
    * merge, plain Scala. */
  private def ref(texts: Seq[String], merges: Int,
      maxVocab: Int = 5000): Seq[(Int, String, String, String, Long)] = {
    val freqs = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, f) => (-f, w) }.take(maxVocab)
    var seqs: Seq[(Vector[String], Long)] =
      freqs.map { case (w, f) => (w.split("").toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (step <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((s, f) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) += f
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        out += ((step, a, b, a + b, cnt))
        seqs = seqs.map { case (s, f) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
              buf += (a + b); i += 2 // leftmost-greedy: consume both
            } else { buf += s(i); i += 1 }
          }
          (buf.result(), f)
        }
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], merges: Int): Seq[(Int, String, String, String, Long)] =
    Bpe.train(texts.zipWithIndex.map(_.swap).toDF("id", "text"), "text", merges)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq.sortBy(_._1)

  test("classic fixture: repeated suffix merges first") {
    // "lower lower lowest": 'lo','we' dominate; exact sequence pinned by
    // the reference, including multi-char symbol growth across steps.
    val texts = Seq("lower lower lowest low", "lower lowest low low")
    assert(run(texts, 4) == ref(texts, 4))
  }

  test("overlap runs merge leftmost-greedily (aaaa -> aa aa)") {
    val texts = Seq("aaaa aaaa aaa")
    val got = run(texts, 2)
    assert(got == ref(texts, 2))
    // step 1 must be (a,a); the merge step then pairs leftmost-greedily.
    assert(got.head._2 == "a" && got.head._3 == "a")
    // step 2 merges the merged symbol with itself: "aa"+"aa".
    assert(got(1)._2 == "aa" && got(1)._3 == "aa")
  }

  test("matches the sequential reference on random corpora") {
    val rnd = new Random(13)
    for (trial <- 1 to 3) {
      val alphabet = "abcd"
      val texts = Seq.fill(30) {
        Seq.fill(rnd.nextInt(8) + 1)(
          Seq.fill(rnd.nextInt(6) + 1)(
            alphabet(rnd.nextInt(alphabet.length))).mkString).mkString(" ")
      }
      assert(run(texts, 5) == ref(texts, 5), s"trial $trial")
    }
  }

  /** Training's final symbol state, replayed sequentially (same merge
    * order and leftmost-greedy pass as `ref`). */
  private def refFinalSeqs(texts: Seq[String], merges: Int): Map[String, Vector[String]] = {
    val ms = ref(texts, merges)
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
    words.map { w =>
      var s = w.split("").toVector
      for ((_, a, b, _, _) <- ms) {
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
            buf += (a + b); i += 2
          } else { buf += s(i); i += 1 }
        }
        s = buf.result()
      }
      w -> s
    }.toMap
  }

  test("encode replays training exactly: training words reach the trainer's final symbols") {
    val rnd = new Random(29)
    for (trial <- 1 to 3) {
      val texts = Seq.fill(25) {
        Seq.fill(rnd.nextInt(6) + 1)(
          Seq.fill(rnd.nextInt(7) + 1)("abc"(rnd.nextInt(3))).mkString)
          .mkString(" ")
      }
      val docs = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      val table = Bpe.train(docs, "text", merges = 6)
      val expected = refFinalSeqs(texts, 6)
      val got = Bpe.encode(docs, "id", "text", table)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      for ((text, i) <- texts.zipWithIndex) {
        val want = text.split(" ").filter(_.nonEmpty)
          .flatMap(expected).toSeq
        assert(got(i.toLong) == want, s"trial $trial doc $i")
      }
    }
  }

  test("merge table round-trips through parquet (the tokenize CLI artifact)") {
    val docs = Seq((0L, "lower lower lowest low")).toDF("id", "text")
    val table = Bpe.train(docs, "text", merges = 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe_rt").toString
    table.write.mode("overwrite").parquet(dir)
    val direct = Bpe.encode(docs, "id", "text", table).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaDisk = Bpe.encode(docs, "id", "text", spark.read.parquet(dir))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaDisk == direct)
  }

  test("encode: unseen symbols pass through; n_syms counts the output") {
    val table = Bpe.train(Seq((0L, "ab ab ab")).toDF("id", "text"), "text", 1)
    val out = Bpe.encode(Seq((7L, "ab xy")).toDF("id", "text"),
      "id", "text", table).collect().head
    assert(out.getSeq[String](1) == Seq("ab", "x", "y"))
    assert(out.getInt(2) == 3)
  }
}
