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

  /** Driver-side mean vector and population covariance matrix of an
    * Array[Float] column, computed distributed via the exact
    * fixed-point moment aggregate (×10⁶ longs, DECIMAL(38) combine —
    * bit-deterministic under any partitioning) and converted to
    * doubles on the driver. Collect size is d + d(d+1)/2 cells.
    */
  def meanAndCov(df: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Array[Double]]) = {
    val fxa = df.select(
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))")
        .as("fxa"))
    val moments = fxa.select(
      explode(expr(
        """flatten(transform(sequence(0, size(fxa) - 1), i ->
          |  transform(sequence(i, size(fxa) - 1), j ->
          |    struct(i AS i, j AS j, fxa[i] * fxa[j] AS p, fxa[i] AS xi))))""".stripMargin))
        .as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"), col("e.xi"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p").cast("decimal(38,0)")).as("sxy"),
        sum(when(col("i") === col("j"), col("xi")).otherwise(lit(0L))
          .cast("decimal(38,0)")).as("sx"),
        count(lit(1)).as("n"))
      .collect()
    val n = moments.head.getLong(4).toDouble
    val s = Array.fill(dim)(0.0)
    moments.filter(r => r.getInt(0) == r.getInt(1)).foreach { r =>
      s(r.getInt(0)) = r.getDecimal(3).doubleValue() / 1e6
    }
    val mean = s.map(_ / n)
    val cov = Array.fill(dim, dim)(0.0)
    moments.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val sxy = r.getDecimal(2).doubleValue() / 1e12
      val c = sxy / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    (mean, cov)
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
