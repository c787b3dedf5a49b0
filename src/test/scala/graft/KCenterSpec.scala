package graft

import scala.util.Random

import graft.operators.KCenter

/**
 * Greedy k-center (q117): cross-validated against a sequential
 * farthest-point reference on random corpora (the oracle covers one
 * fixture; the generator covers many), plus the structural facts the
 * greedy trajectory must satisfy.
 */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def gen(seed: Int, n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val r = new Random(seed)
    (0 until n).map(i =>
      i.toLong -> Seq.fill(dim)((r.nextGaussian() * 0.3).toFloat))
  }

  /** Sequential reference on the same micro-quantized integers. */
  private def reference(rows: Seq[(Long, Seq[Float])], k: Int): Seq[(Int, Long, Long)] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6)).toArray
    }.sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = Vector(q.head)
    var picks = Vector((0, q.head._1, 0L))
    for (r <- 1 until k) {
      val (id, v, d) = q.map { case (id, v) =>
        (id, v, centers.map(c => d2(v, c._2)).min)
      }.maxBy { case (id, _, d) => (d, -id) }
      centers :+= ((id, v))
      picks :+= ((r, id, d))
    }
    picks
  }

  test("matches the sequential farthest-point reference on random data") {
    for (seed <- 1 to 3) {
      val rows = gen(seed, 150, 8)
      val got = KCenter.select(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 7)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got === reference(rows, 7), s"seed=$seed")
    }
  }

  test("selection distances are non-increasing and centers distinct") {
    val rows = gen(9, 200, 8)
    val got = KCenter.select(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // Farthest-point picks shrink monotonically after the seed.
    val ds = got.drop(1).map(_._3)
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => a >= b })
    assert(got.map(_._2).distinct.length === got.length)
  }

  test("k=1 returns only the min-id seed") {
    val rows = gen(4, 20, 4)
    val got = KCenter.select(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 1).collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 0L)
  }
}
