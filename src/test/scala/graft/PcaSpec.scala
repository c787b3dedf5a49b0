package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Pca

/**
 * PCA (q115 moments + the spec-bound eigensolve/projection stages).
 * The oracle covers the distributed moment pass; this suite covers what
 * SQL can't: Jacobi correctness, the moments→covariance→components→
 * projection chain, and the artifact algebra (partition invariance /
 * associative shard merge) that justifies calling the moments a
 * reusable 100 TB artifact.
 */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  /** Correlated synthetic data: x2 ≈ 2·x0, x3 ≈ −x1, so the true
    * covariance has two dominant directions. */
  private def fixture(n: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val r = new Random(seed)
    (0 until n).map { i =>
      val a = r.nextGaussian()
      val b = r.nextGaussian()
      val noise = Array.fill(dim)(r.nextGaussian() * 0.01)
      i.toLong -> Seq[Float](
        (a + noise(0)).toFloat, (b + noise(1)).toFloat,
        (2 * a + noise(2)).toFloat, (-b + noise(3)).toFloat)
    }
  }

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("moments match a sequential exact-integer reference") {
    val rows = fixture(100, 1)
    val got = Pca.momentsMicro(df(rows), "embedding", dim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val qs = rows.map(_._2.map(v => math.round(v.toDouble * 1e6)))
    for (i <- 0 until dim; j <- i until dim) {
      val si = qs.map(_(i)).sum
      val sj = qs.map(_(j)).sum
      val sij = qs.map(q => q(i) * q(j)).sum
      assert(got((i + 1L, j + 1L)) === ((rows.size.toLong, si, sj, sij)),
        s"pair ($i,$j)")
    }
    assert(got.size === dim * (dim + 1) / 2)
  }

  test("moments are partition-invariant and merge associatively") {
    val rows = fixture(200, 2)
    def m(d: org.apache.spark.sql.DataFrame) =
      Pca.momentsMicro(d, "embedding", dim).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val whole = m(df(rows).repartition(7))
    assert(m(df(rows).repartition(1)) === whole)
    // Shard artifacts add associatively: moments(a) + moments(b) ==
    // moments(a ∪ b), entrywise.
    val (a, b) = rows.splitAt(83)
    val ma = m(df(a)); val mb = m(df(b))
    val merged = ma.map { case (k, (n, si, sj, sij)) =>
      val (n2, si2, sj2, sij2) = mb(k)
      k -> (n + n2, si + si2, sj + sj2, sij + sij2)
    }
    assert(merged === whole)
  }

  test("Jacobi eigensolve recovers a known spectrum, orthonormal") {
    // A = Q diag(5,2,1) Qᵀ for a hand-built orthonormal Q.
    val s = 1 / math.sqrt(2)
    val qm = Array(
      Array(s, s, 0.0),
      Array(-s, s, 0.0),
      Array(0.0, 0.0, 1.0))
    val lam = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => qm(i)(k) * lam(k) * qm(j)(k)).sum)
    val (eig, comps) = Pca.jacobiEigen(a)
    assert(eig.zip(lam).forall { case (e, l) => math.abs(e - l) < 1e-9 })
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => comps(i)(k) * comps(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    // Trace preserved.
    assert(math.abs(eig.sum - (a(0)(0) + a(1)(1) + a(2)(2))) < 1e-9)
  }

  test("fit finds the planted 2-dimensional structure") {
    val rows = fixture(500, 3)
    val moments = Pca.momentsMicro(df(rows), "embedding", dim)
    val (eig, _) = Pca.fit(moments, dim)
    assert(eig(0) >= eig(1) && eig(1) >= eig(2) && eig(2) >= eig(3))
    // Two planted directions carry ~all variance; noise floor ~1e-4.
    assert(eig(1) > 0.5)
    assert(eig(2) < 0.01)
    assert(eig(2) >= -1e-9 && eig(3) >= -1e-9) // PSD up to rounding
  }

  test("projection matches driver-side arithmetic and explains variance") {
    val rows = fixture(400, 4)
    val data = df(rows)
    val moments = Pca.momentsMicro(data, "embedding", dim)
    val (eig, comps) = Pca.fit(moments, dim)
    val mean = Pca.meanVector(moments, dim)
    val k = 2
    val proj = Pca.project(data, "embedding", mean, comps, k)
      .select(col("vec_id"), col("pc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // Matches the driver-side dot product row-for-row.
    rows.take(50).foreach { case (id, v) =>
      (0 until k).foreach { c =>
        val expect = (0 until dim)
          .map(i => (v(i).toDouble - mean(i)) * comps(c)(i)).sum
        assert(math.abs(proj(id)(c) - expect) < 1e-9, s"id=$id c=$c")
      }
    }
    // Sample variance along PC c equals eigenvalue c (same n−1 norm).
    (0 until k).foreach { c =>
      val xs = rows.map { case (id, _) => proj(id)(c) }
      val m = xs.sum / xs.size
      val sv = xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
      assert(math.abs(sv - eig(c)) / eig(c) < 1e-3, s"pc$c var=$sv eig=${eig(c)}")
    }
  }
}
