package graft

import graft.operators.Similarity

/**
 * Contrastive pair mining (q130): semantic checks on planted geometry —
 * the hardest positive is the same-label outlier, the hardest negative
 * is the encroaching other-label point, and label isolation yields no
 * positive row (inner-join contract).
 */
class HardPairsSpec extends SparkSpec {
  import spark.implicits._

  private def v(x: Double, y: Double): Seq[Float] =
    Seq(x.toFloat, y.toFloat)

  test("picks the planted outlier positive and encroaching negative") {
    val rows = Seq(
      (0L, v(1, 0), 0),      // query
      (1L, v(0.99, 0.1), 0), // easy positive (near)
      (2L, v(0.2, 0.9), 0),  // HARD positive (same label, far)
      (3L, v(-1, 0.1), 1),   // easy negative (far)
      (4L, v(0.9, 0.2), 1))  // HARD negative (diff label, near)
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardPairs(rows,
      rows.filter($"vec_id" === 0L), "vec_id", "embedding", "label")
      .collect().head
    assert(out.getLong(1) === 2L, "hardest positive should be the far same-label point")
    assert(out.getLong(3) === 4L, "hardest negative should be the near diff-label point")
    assert(out.getDouble(4) > out.getDouble(2),
      "planted geometry: the hard negative is closer than the hard positive")
  }

  test("a query whose label is unique yields no row (no positive exists)") {
    val rows = Seq(
      (0L, v(1, 0), 7),
      (1L, v(0, 1), 1),
      (2L, v(-1, 0), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardPairs(rows,
      rows.filter($"vec_id" === 0L), "vec_id", "embedding", "label")
    assert(out.count() === 0L)
  }
}
