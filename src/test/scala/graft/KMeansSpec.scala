package graft

import scala.util.Random

import graft.operators.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: the same integer Lloyd recursion. */
  private def ref(values: Seq[Long], k: Int, iters: Int): Seq[(Int, Long, Long, Long)] = {
    val (vmin, vmax) = (values.min, values.max)
    var cs: Seq[Long] = (0 until k).map(i => vmin + (vmax - vmin) * i / (k - 1))
    def assign(v: Long): Int =
      cs.zipWithIndex.minBy { case (c, i) => (math.abs(v - c), i) }._2
    for (_ <- 1 to iters) {
      val byC = values.groupBy(assign)
      cs = cs.zipWithIndex.map { case (c, i) =>
        byC.get(i).map(vs => vs.sum / vs.size).getOrElse(c)
      }
    }
    values.groupBy(assign).toSeq.map { case (i, vs) =>
      (i, cs(i), vs.size.toLong, vs.sum)
    }.sortBy(_._1)
  }

  private def run(values: Seq[Long], k: Int, iters: Int): Seq[(Int, Long, Long, Long)] =
    KMeans.fit1D(values.toDF("v"), "v", k, iters).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("two tight groups: k=2 recovers both integer means") {
    val vs = Seq[Long](10, 11, 12, 100, 101, 102)
    val got = run(vs, k = 2, iters = 3)
    assert(got == Seq((0, 11L, 3L, 33L), (1, 101L, 3L, 303L)))
  }

  test("constant input: ties collapse to cluster 0, empty clusters drop") {
    val got = run(Seq.fill(5)(7L), k = 3, iters = 2)
    assert(got == Seq((0, 7L, 5L, 35L)))
  }

  test("matches the sequential reference on random inputs") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val vs = Seq.fill(40 + trial * 10)(rnd.nextInt(10000).toLong)
      val expected = ref(vs, k = 4, iters = 3)
      val got = run(vs, k = 4, iters = 3)
      assert(got == expected, s"trial $trial")
    }
  }

  test("iters=0 reports the span-init assignment unchanged") {
    val vs = Seq[Long](0, 10, 20, 30)
    // init centroids for k=2: 0 and 30; assignment splits at |v-0| vs |v-30|.
    val got = run(vs, k = 2, iters = 0)
    assert(got == Seq((0, 0L, 2L, 10L), (1, 30L, 2L, 50L)))
  }
}
