package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ZCA/PCA embedding whitening — the linear map W = V·Λ^(-1/2)·Vᵀ
  * that equalizes variance across embedding directions so cosine /
  * Euclidean geometry treats every direction equally (the standard
  * pre-step before SemDeDup-grade near-dup thresholds and ANN
  * recall tuning; see the reference's transform normalization layer
  * for the analogous per-feature rescaling idea, transform.py).
  *
  * Split by execution site the way k-means (Similarity.kMeans) is:
  * the COVARIANCE is a distributed one-pass d²-cell aggregate (the
  * registry's `sim_cov_matrix` shape — map-side combined, reduce
  * side constant-size); the EIGENDECOMPOSITION runs on the driver
  * over the d×d matrix (4 096 doubles at d=64 — model-sized, like
  * k·dim centroids); the PROJECTION is map-only column math with W
  * embedded as a literal. No stage moves corpus-sized data to the
  * driver.
  */
object Whitening {

  /** The exact ×10⁶ fixed-point Gram sums of an Array[Float] column —
    * (n, Σfxᵢ per dim, Σfxᵢfxⱼ upper triangle) as BigInt, the shared
    * kernel under [[meanAndCov]] and the F15 `sim_cov_matrix`
    * registry row. Bit-deterministic under any partitioning:
    * per-partition accumulation into LONG arrays (overflow-CHECKED
    * via `Math.*Exact`; safe to ~9·10⁶ rows per partition at
    * |fx| ≤ 10⁶, an order of magnitude above a 128 MB parquet
    * split), then an exact BigInt `treeReduce` combine — long
    * addition is order-independent, so the result is identical under
    * any partitioning, same as a DECIMAL(38) aggregate but without
    * materializing d(d+1)/2 rows PER RECORD through an exchange (the
    * explode formulation cost 2.6 s steady at sf0.1; this is the
    * MLlib RowMatrix Gramian shape, rung-(d) `mapPartitions` used
    * deliberately: the state is d²-bounded, the combine is
    * associative, and no built-in aggregate expresses a triangular
    * outer-product accumulator without row inflation). Driver
    * traffic is one (n, d, d(d+1)/2) tuple per partition merged
    * tree-wise.
    */
  def fixedPointGram(df: DataFrame, vecCol: String, dim: Int): (BigInt, Array[BigInt], Array[BigInt]) = {
    val tri = dim * (dim + 1) / 2
    val fxa = df.select(
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))")
        .as("fxa"))
    val parts = fxa.rdd.mapPartitions { it =>
      val sxy = new Array[Long](tri)
      val sx = new Array[Long](dim)
      var n = 0L
      it.foreach { row =>
        val f = row.getSeq[Long](0)
        require(f.length == dim, s"embedding dim ${f.length} != $dim")
        n += 1L
        var i = 0
        var c = 0
        while (i < dim) {
          val fi = f(i)
          sx(i) = Math.addExact(sx(i), fi)
          var j = i
          while (j < dim) {
            sxy(c) = Math.addExact(sxy(c), Math.multiplyExact(fi, f(j)))
            c += 1
            j += 1
          }
          i += 1
        }
      }
      Iterator.single((n, sx, sxy))
    }
    parts
      .map { case (n, sx, sxy) => (BigInt(n), sx.map(BigInt(_)), sxy.map(BigInt(_))) }
      .treeReduce { case ((n1, a1, b1), (n2, a2, b2)) =>
        (n1 + n2,
          Array.tabulate(dim)(i => a1(i) + a2(i)),
          Array.tabulate(tri)(c => b1(c) + b2(c)))
      }
  }

  /** Driver-side mean vector and population covariance matrix — the
    * [[fixedPointGram]] sums converted to doubles. Collect size is
    * d + d(d+1)/2 cells; exactness and partitioning-invariance are
    * the kernel's.
    */
  def meanAndCov(df: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Array[Double]]) = {
    val (n0, sxB, sxyB) = fixedPointGram(df, vecCol, dim)
    val n = n0.toDouble
    val mean = Array.tabulate(dim)(i => sxB(i).toDouble / 1e6 / n)
    val cov = Array.fill(dim, dim)(0.0)
    var c = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val sxy = sxyB(c).toDouble / 1e12
        val v = sxy / n - mean(i) * mean(j)
        cov(i)(j) = v; cov(j)(i) = v
        c += 1; j += 1
      }
      i += 1
    }
    (mean, cov)
  }

  /** Second-moment pass over the WHITENED vectors with the W·(x−μ)
    * projection fused into the same per-partition loop (no
    * intermediate whitened column materializes anywhere): returns
    * (n, Σw per dim, Σwᵢwⱼ upper triangle). Double accumulation —
    * the consumer (`sim_whiten_identity`) rounds at ×10³ against
    * measured residuals ~3e-7, so partition-order reassociation
    * noise (~1e-12) is absorbed by >10⁸× margin.
    */
  def whitenedMoments(
      df: DataFrame,
      vecCol: String,
      mean: Array[Double],
      w: Array[Array[Double]]
  ): (Long, Array[Double], Array[Double]) = {
    val dim = mean.length
    val tri = dim * (dim + 1) / 2
    val vecs = df.select(expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
    vecs.rdd.mapPartitions { it =>
      val sxy = new Array[Double](tri)
      val sx = new Array[Double](dim)
      val centered = new Array[Double](dim)
      val wh = new Array[Double](dim)
      var n = 0L
      it.foreach { row =>
        val v = row.getSeq[Double](0)
        n += 1L
        var i = 0
        while (i < dim) { centered(i) = v(i) - mean(i); i += 1 }
        var k = 0
        while (k < dim) {
          val wk = w(k)
          var s = 0.0
          var i2 = 0
          while (i2 < dim) { s += wk(i2) * centered(i2); i2 += 1 }
          wh(k) = s
          sx(k) += s
          k += 1
        }
        var c = 0
        var a = 0
        while (a < dim) {
          val wa = wh(a)
          var b = a
          while (b < dim) { sxy(c) += wa * wh(b); c += 1; b += 1 }
          a += 1
        }
      }
      Iterator.single((n, sx, sxy))
    }.treeReduce { case ((n1, a1, b1), (n2, a2, b2)) =>
      (n1 + n2,
        Array.tabulate(dim)(i => a1(i) + a2(i)),
        Array.tabulate(tri)(c => b1(c) + b2(c)))
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic fixed sweep order, so the same covariance always
    * yields the same (eigenvalues, eigenvectors). Returns
    * (values, vectors) with vectors[.][k] = k-th eigenvector
    * component (columns of V).
    */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > 1e-14) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-18) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val sn = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - sn * akq
          a(k)(q) = sn * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - sn * aqk
          a(q)(k) = sn * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - sn * vkq
          v(k)(q) = sn * vkp + c * vkq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** The ZCA whitening matrix W = V·Λ^(-1/2)·Vᵀ (symmetric, stays in
    * the original basis — whitened vectors remain comparable to the
    * raw space, unlike plain PCA rotation). `eps` regularizes
    * near-null directions.
    */
  def zcaMatrix(cov: Array[Array[Double]], eps: Double = 1e-9): Array[Array[Double]] = {
    val d = cov.length
    val (lam, v) = jacobiEigen(cov)
    val inv = lam.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    Array.tabulate(d, d) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < d) { s += v(i)(k) * inv(k) * v(j)(k); k += 1 }
      s
    }
  }

  /** Map-only whitening projection y = W·(x − μ): W and μ ship as
    * plan literals (model-sized, the k-means centroid-literal
    * pattern), each row transforms in place — zero shuffles, linear
    * scan at any corpus size.
    */
  def whiten(df: DataFrame, vecCol: String, mean: Array[Double], w: Array[Array[Double]],
             outCol: String = "whitened"): DataFrame = {
    val d = mean.length
    val wLit: Column = typedLit(w.map(_.toSeq).toSeq)
    val muLit: Column = typedLit(mean.toSeq)
    df.withColumn("__w", wLit)
      .withColumn("__mu", muLit)
      .withColumn(outCol,
        expr(s"transform(sequence(0, ${d - 1}), j -> " +
          s"aggregate(sequence(0, ${d - 1}), 0D, (acc, i) -> " +
          s"acc + __w[j][i] * (CAST($vecCol[i] AS DOUBLE) - __mu[i])))"))
      .drop("__w", "__mu")
  }
}
