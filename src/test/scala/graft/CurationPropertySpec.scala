package graft

import scala.util.Random

import graft.operators.Curation

/**
 * Property-style tests for the composed curation pipeline: synthetic
 * corpora with PLANTED structure (exact dups, near-dups at controlled
 * jaccard, benchmark contamination spans) generated from fixed seeds, and
 * invariants asserted on whatever survives — the q73 oracle pins one
 * fixture; this spec pins the space around it.
 */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Threshold = 0.6
  private val PackBudget = 512

  private case class Fixture(
      docs: Seq[(Long, String, String)],     // (id, lang, text)
      bench: Seq[(Long, String, String)],
      contaminatedIds: Set[Long])

  /** 40 random base docs + 8 planted near-dups (1 mutated word ⇒ word-3gram
    * jaccard ≥ (n-5)/(n+1) ≥ 0.625 at n ≥ 15) + 5 exact dups + 2 corpus
    * docs sharing an 8-word span with the benchmark. */
  private def gen(seed: Int): Fixture = {
    val r = new Random(seed)
    val vocab = (0 until 300).map(i => s"w${i}x")
    def randDoc(): String =
      (0 until (15 + r.nextInt(25))).map(_ => vocab(r.nextInt(vocab.size)))
        .mkString(" ")
    val base = (0L until 40L).map(i =>
      (i, if (r.nextBoolean()) "en" else "de", randDoc()))
    val nears = (0 until 8).map { j =>
      val (_, lang, text) = base(r.nextInt(base.size))
      val toks = text.split(" ")
      (100L + j, lang, toks.updated(r.nextInt(toks.length), s"mut$j").mkString(" "))
    }
    val exacts = (0 until 5).map { j =>
      val (_, lang, text) = base(r.nextInt(base.size))
      (200L + j, lang, text)
    }
    val benchNovel = (0 until 3).map(j => (300L + j, "en", randDoc()))
    val contamSrc = Seq(base(10), base(11))
    val benchContam = contamSrc.zipWithIndex.map { case ((_, _, text), j) =>
      (310L + j, "en", s"${randDoc()} ${text.split(" ").take(8).mkString(" ")}")
    }
    Fixture(base ++ nears ++ exacts, benchNovel ++ benchContam,
      contamSrc.map(_._1).toSet)
  }

  private def fourGrams(text: String): Set[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).sliding(4)
      .filter(_.length == 4).map(_.mkString(" ")).toSet

  private def threeGramJaccard(a: String, b: String): Double = {
    def sh(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).sliding(3)
      .filter(_.length == 3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    if (sa.isEmpty && sb.isEmpty) 0.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  for (seed <- Seq(1, 2, 3))
  test(s"curation invariants on generated corpus, seed $seed") {
    val f = gen(seed)
    val docs = f.docs.toDF("doc_id", "lang", "text")
    val bench = f.bench.toDF("doc_id", "lang", "text")
    // 16x2 banding: planted-pair candidate probability ≈ 0.9996 at j≈0.63
    // (8x4 misses ~27% of pairs at that operating point).
    val cfg = Curation.CurationConfig(minhashBands = 16,
      minhashThreshold = Threshold, minTokens = 5,
      benchmark = Some(bench), packBudget = PackBudget, nShards = 8)
    val out = Curation.curate(docs, "doc_id", "text", "lang", cfg).collect()
    val byId = f.docs.map(d => d._1 -> d._3).toMap
    val kept = out.map(_.getLong(0))
    val keptSet = kept.toSet

    // Output ids are input ids, unique, with the full curation schema.
    assert(kept.length == keptSet.size && keptSet.subsetOf(byId.keySet))
    assert(out.headOption.forall(_.schema.fieldNames.toSeq ==
      Seq("id", "text", "stratum", "n_tokens", "split", "shard",
        "pack_id", "pack_offset")))
    assert(keptSet.nonEmpty, "generator must leave survivors")

    // (1) Decontamination: no kept doc shares a 4-gram with the benchmark,
    // and the two planted-contaminated corpus docs are gone.
    val benchGrams = f.bench.flatMap(b => fourGrams(b._3)).toSet
    keptSet.foreach { id =>
      assert((fourGrams(byId(id)) & benchGrams).isEmpty,
        s"doc $id shares a 4-gram with the benchmark")
    }
    assert((f.contaminatedIds & keptSet).isEmpty,
      s"planted contamination survived: ${f.contaminatedIds & keptSet}")

    // (2) Exact dedup: no two kept docs are byte-identical.
    val texts = kept.map(byId)
    assert(texts.distinct.length == texts.length, "identical texts survived")

    // (3) Near-dedup: no kept PAIR has exact 3-gram jaccard ≥ threshold
    // (planted pairs sit ≥ 0.625; random pairs sit ≈ 0).
    for (a <- keptSet; b <- keptSet if a < b) {
      val j = threeGramJaccard(byId(a), byId(b))
      assert(j < Threshold, s"kept near-dup pair ($a, $b) at jaccard $j")
    }

    // (4) Split: pure function of the text (md5 first hex digit ≤ 'c').
    out.foreach { r =>
      val want = if (md5hex(byId(r.getLong(0))).substring(0, 1) <= "c") "train" else "val"
      assert(r.getAs[String]("split") == want, s"split mismatch for ${r.getLong(0)}")
    }

    // (5) Packing: shard = id mod 8; offsets inside the budget; replaying
    // the per-shard running sum in id order reproduces pack_id/pack_offset.
    out.foreach { r =>
      assert(r.getAs[Int]("shard") == (r.getLong(0) % 8).toInt)
      val off = r.getAs[Long]("pack_offset")
      assert(off >= 0 && off < PackBudget)
    }
    out.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getAs[Long]("pack_id") == cum / PackBudget)
        assert(r.getAs[Long]("pack_offset") == cum % PackBudget)
        cum += r.getAs[Int]("n_tokens")
      }
    }

    // (6) Deterministic end to end.
    val again = Curation.curate(docs, "doc_id", "text", "lang", cfg).collect()
    assert(again.map(_.toString).sorted.sameElements(out.map(_.toString).sorted))
  }

  test("clusterDedup property: at most one survivor per exact-jaccard component") {
    val f = gen(7)
    val docs = f.docs.toDF("doc_id", "lang", "text")
    val cfg = Curation.CurationConfig(minhashBands = 16,
      minhashThreshold = Threshold, minTokens = 5, nShards = 8,
      clusterDedup = true)
    val kept = Curation.curate(docs, "doc_id", "text", "lang", cfg)
      .select("id").as[Long].collect().toSet
    val byId = f.docs.map(d => d._1 -> d._3).toMap
    // Build the exact-jaccard graph over ALL docs and close it; each
    // component must keep at most one member.
    val ids = f.docs.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- ids; b <- ids if a < b)
      if (byId(a) == byId(b) || threeGramJaccard(byId(a), byId(b)) >= Threshold)
        parent(find(a)) = find(b)
    val survivorsPerComp = kept.groupBy(find)
    survivorsPerComp.foreach { case (comp, members) =>
      assert(members.size == 1,
        s"component $comp kept ${members.size} members: $members")
    }
  }
}
