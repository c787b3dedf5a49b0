package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Distributed PCA over an embedding column — the linear-compression
 * sibling of the random-projection (q99) and product-quantization (q96)
 * operators: JL projection is data-oblivious, PQ is a lossy codebook;
 * PCA is the optimal linear map for a given corpus, and its moments are
 * the other artifact (after q88's scalar stat profile) a 100 TB pipeline
 * computes ONCE and reuses for drift checks, whitening, and dim-choice
 * (the eigenvalue knee).
 *
 * Two-stage shape, by design:
 *
 *  1. `momentsMicro` — the distributed pass. Components are quantized to
 *     exact micro-ints (`round(v·10⁶)` as long — the q86/q88 recipe), and
 *     each input partition folds its rows into ONE local accumulator
 *     (d sums + d(d+1)/2 co-sums) inside `mapPartitions` — the legitimate
 *     per-partition-imperative case: the alternative, exploding d²/2
 *     component pairs per row through a groupBy, multiplies the shuffle
 *     by 2080× for d=64. Here the shuffle is O(partitions·d²) fixed-size
 *     blocks regardless of row count, and integer sums make the result
 *     bit-identical under ANY partitioning/ordering — which is what lets
 *     the full gram matrix sit under a DuckDB hash oracle (q115).
 *     Overflow bound: per-partition and global sums stay in int64 while
 *     n·(10⁶·max|v|)² < 2⁶³ — ~10⁹ rows for unit-scale embeddings; past
 *     that, shard the corpus, store per-shard moment artifacts (they add
 *     associatively, same merge algebra as [[Sketches]]/[[Changelog]])
 *     and sum shards in decimal(38,0).
 *
 *  2. `fit` — the driver pass. The d×d covariance (O(d²) driver state,
 *     same class as Curation's O(bins) histogram) is eigendecomposed with
 *     cyclic Jacobi — deterministic, no RNG, no external linalg — giving
 *     orthonormal components in descending-eigenvalue order.
 *     `project` then broadcasts the k×d matrix as an array literal and
 *     runs the matmul as a codegen'd `transform`/`aggregate` expression —
 *     corpus scanned once, never shuffled.
 *
 * PcaSpec pins orthonormality, eigen order, trace preservation, that
 * per-axis projected variance equals the eigenvalues, and that moments
 * merge associatively across splits.
 */
object Pca {

  /** Exact micro-int second-moment pass: one row per component pair
    * (i ≤ j, 1-based): `i, j, n_vecs, s_i, s_j, s_ij` — all exact longs,
    * so mean/covariance are derivable rationals. */
  def momentsMicro(vecs: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val nPairs = dim * (dim + 1) / 2
    val q: Dataset[Seq[Long]] = vecs
      .select(transform(col(vecCol),
        x => round(x.cast("double") * lit(1e6)).cast("long")).as("q"))
      .as[Seq[Long]]
    // Each partition folds to ONE accumulator, then emits its O(d²)
    // partial as (i, j, n, s_i, s_j, s_ij) rows; the global merge is a
    // map-side-combined groupBy over O(partitions·d²) fixed-size input.
    val partials = q.mapPartitions { it =>
      val s = new Array[Long](dim)
      val ss = new Array[Long](nPairs)
      var n = 0L
      it.foreach { v =>
        require(v.length == dim, s"expected dim $dim, got ${v.length}")
        n += 1
        var i = 0
        var idx = 0
        while (i < dim) {
          val vi = v(i)
          s(i) += vi
          var j = i
          while (j < dim) { ss(idx) += vi * v(j); idx += 1; j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else {
        var idx = -1
        for (i <- (0 until dim).iterator; j <- (i until dim).iterator)
          yield { idx += 1; (i + 1L, j + 1L, n, s(i), s(j), ss(idx)) }
      }
    }
    partials.toDF("i", "j", "n", "s_i", "s_j", "s_ij")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n_vecs"), sum(col("s_i")).as("s_i"),
        sum(col("s_j")).as("s_j"), sum(col("s_ij")).as("s_ij"))
  }

  /** Merge two moment artifacts (same dim): entrywise integer sums —
    * the associative shard/stream algebra (PcaSpec proves merge ==
    * single-shot; [[graft.streaming.ArtifactStreams.momentsStream]]
    * folds per trigger with it). */
  def mergeMoments(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n_vecs")).as("n_vecs"), sum(col("s_i")).as("s_i"),
        sum(col("s_j")).as("s_j"), sum(col("s_ij")).as("s_ij"))

  /** Driver-side fit from a moments frame: covariance eigendecomposition
    * (cyclic Jacobi, deterministic). Returns eigenvalues (descending) and
    * row-major orthonormal components, both in original (unquantized)
    * units. */
  def fit(moments: DataFrame, dim: Int): (Array[Double], Array[Array[Double]]) = {
    val rows = moments.select("i", "j", "n_vecs", "s_i", "s_j", "s_ij")
      .collect()
    require(rows.length == dim * (dim + 1) / 2,
      s"expected ${dim * (dim + 1) / 2} moment rows, got ${rows.length}")
    val n = rows.head.getLong(2).toDouble
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val i = r.getLong(0).toInt - 1
      val j = r.getLong(1).toInt - 1
      val si = r.getLong(3).toDouble
      val sj = r.getLong(4).toDouble
      val sij = r.getLong(5).toDouble
      // micro² → unit²; sample covariance.
      val c = (sij - si * sj / n) / (n - 1) / 1e12
      cov(i)(j) = c
      cov(j)(i) = c
    }
    jacobiEigen(cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix; returns
    * (eigenvalues desc, eigenvectors as rows, matching order). */
  def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // Stable tangent of the rotation angle; theta==0 → t=1 (45°).
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eig = order.map(i => a(i)(i)).toArray
    val comps = order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray
    eig -> comps
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Project vectors onto the top-k components: broadcast the k×d matrix
    * as a literal and run the matmul as codegen'd array expressions —
    * one narrow scan, no shuffle, no UDF. Mean-centering uses the same
    * moments the components came from. */
  def project(vecs: DataFrame, vecCol: String, mean: Array[Double],
      components: Array[Array[Double]], k: Int): DataFrame = {
    val d = mean.length
    val compCols = (0 until k).map { c =>
      val comp = components(c)
      // dot(x − mean, comp) = dot(x, comp) − dot(mean, comp): the second
      // term is a driver-side constant, so the per-row work is one fused
      // zip_with/aggregate over the literal component array.
      aggregate(
        zip_with(col(vecCol), array(comp.map(lit): _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x) -
        lit((0 until d).map(i => mean(i) * comp(i)).sum)
    }
    vecs.withColumn("pc", array(compCols: _*))
  }

  /** Mean vector (unit scale) off a moments frame. */
  def meanVector(moments: DataFrame, dim: Int): Array[Double] = {
    val m = new Array[Double](dim)
    moments.filter(col("i") === col("j"))
      .select("i", "n_vecs", "s_i").collect().foreach { r =>
        m(r.getLong(0).toInt - 1) = r.getLong(2).toDouble / r.getLong(1) / 1e6
      }
    m
  }
}
