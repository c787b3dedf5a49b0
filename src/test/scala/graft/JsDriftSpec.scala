package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * JS-divergence drift monitor (q116): the information-theoretic
 * properties the oracle can't express — bounds, the zero case, and that
 * a planted off-distribution source actually ranks worst (the monitoring
 * use case).
 */
class JsDriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical groups score ~0; bounds hold; planted drift ranks worst") {
    // Three sources with the corpus-typical mix, one source speaking a
    // disjoint vocabulary.
    val typical = "alpha beta gamma delta alpha beta"
    val docs =
      (1 to 10).map(i => (s"same$i", "a", typical)) ++
        (1 to 10).map(i => (s"ditto$i", "b", typical)) ++
        (1 to 10).map(i => (s"odd$i", "weird", "zeta eta theta iota zeta"))
    val df = docs.toDF("doc_id", "source", "text")
    val out = TextAnalysis.jsDrift(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out.keySet === Set("a", "b", "weird"))
    out.values.foreach { js =>
      assert(js >= -1e-9 && js <= math.log(2) + 1e-9, s"out of [0, ln2]: $js")
    }
    // a and b ARE part of the corpus mix, so they diverge from the blend
    // equally and mildly; the disjoint-vocab source must dominate both.
    assert(math.abs(out("a") - out("b")) < 1e-9)
    assert(out("weird") > out("a") * 1.5)
  }

  test("a single-source corpus has zero drift") {
    val df = (1 to 5).map(i => (s"d$i", "only", "x y z x"))
      .toDF("doc_id", "source", "text")
    val js = TextAnalysis.jsDrift(df, "source", "text")
      .collect().head.getDouble(3)
    assert(math.abs(js) < 1e-9)
  }
}
