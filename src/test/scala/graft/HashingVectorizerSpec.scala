package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class HashingVectorizerSpec extends SparkSpec {
  import spark.implicits._

  private val toks = Seq(
    (1L, "alpha"), (1L, "alpha"), (1L, "beta"),
    (2L, "beta"), (2L, "gamma"), (2L, "gamma"), (2L, "gamma"),
    (3L, "alpha")).toDF("doc_id", "tok")

  test("unsigned mode is plain TF: per-doc bucket sums equal token counts") {
    val sparse = TextAnalysis.hashingVectorizer(
      toks, "doc_id", "tok", dim = 32, signed = false)
    val sums = sparse.groupBy("doc_id").agg(sum("v").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(sums == Map(1L -> 3L, 2L -> 4L, 3L -> 1L))
    // Same token → same bucket in every doc.
    val alphaBuckets = TextAnalysis.hashingVectorizer(
      toks.filter(col("tok") === "alpha"), "doc_id", "tok", 32, signed = false)
      .select("bucket").distinct().count()
    assert(alphaBuckets == 1)
  }

  test("signed mode: |v| equals TF when no collision, sign is per-token") {
    val sparse = TextAnalysis.hashingVectorizer(
      toks, "doc_id", "tok", dim = 1024)
    // dim 1024 → the three distinct tokens land in distinct buckets here;
    // each doc's |v| multiset must equal its TF multiset.
    val got = sparse.select(col("doc_id"), abs(col("v")).as("a"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got == Map(1L -> Seq(1L, 2L), 2L -> Seq(1L, 3L), 3L -> Seq(1L)))
  }

  test("dense expansion round-trips the sparse form and zero-fills") {
    val dim = 16
    val sparse = TextAnalysis.hashingVectorizer(
      toks, "doc_id", "tok", dim, signed = false)
    val dense = TextAnalysis.toDenseVector(sparse, "doc_id", dim)
      .as[(Long, Seq[Long])].collect().toMap
    assert(dense.keySet == Set(1L, 2L, 3L))
    assert(dense.values.forall(_.length == dim))
    val sparseMap = sparse.as[(Long, Int, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    for ((doc, vec) <- dense; b <- 0 until dim)
      assert(vec(b) == sparseMap(doc).getOrElse(b, 0L),
        s"doc $doc bucket $b: dense ${vec(b)} vs sparse ${sparseMap(doc).get(b)}")
  }

  test("forced collision: signed values cancel, unsigned values add") {
    // dim=1 puts every token in bucket 0.
    val one = Seq((1L, "alpha"), (1L, "beta")).toDF("doc_id", "tok")
    val unsigned = TextAnalysis.hashingVectorizer(
      one, "doc_id", "tok", dim = 1, signed = false)
      .as[(Long, Int, Long)].collect()
    assert(unsigned.toSeq == Seq((1L, 0, 2L)))
    // Signed: value is s(alpha)+s(beta) ∈ {-2, 0, 2}; a zero row is
    // dropped from the sparse form (the documented semantics).
    val signed = TextAnalysis.hashingVectorizer(
      one, "doc_id", "tok", dim = 1)
      .as[(Long, Int, Long)].collect()
    assert(signed.isEmpty || math.abs(signed.head._3) == 2)
  }
}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("sketch-then-verify equals exact counting, boundary inclusive") {
    // 100 tokens total, supportDen 10 → threshold cnt ≥ 10.
    // "hot" 50, "warm" exactly 10 (ON the boundary — must be included),
    // "cool" 9 (just under), 31 singletons.
    val toks = (Seq.fill(50)("hot") ++ Seq.fill(10)("warm") ++
      Seq.fill(9)("cool") ++ (0 until 31).map(i => s"rare$i"))
      .map(Tuple1(_)).toDF("tok")
    val got = TextAnalysis.heavyHitters(toks, "tok", supportDen = 10L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 50L, "warm" -> 10L),
      s"expected exactly hot+warm (boundary inclusive), got $got")
  }

  test("uniform stream: nothing exceeds support, result is empty") {
    val toks = (0 until 1000).map(i => Tuple1(s"t${i % 100}")).toDF("tok")
    // each token has cnt 10, threshold at supportDen 50 → 1000/50 = 20.
    assert(TextAnalysis.heavyHitters(toks, "tok", 50L).count() == 0)
  }
}
