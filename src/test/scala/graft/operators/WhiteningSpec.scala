package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WhiteningSpec extends SparkSpec {

  private lazy val emb = tables.embeddings.select(col("vec_id"), col("embedding"))

  test("meanAndCov matches a driver-side moment replay") {
    val (mean, cov) = Whitening.meanAndCov(emb, "embedding", 64)
    val vs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = vs.length.toDouble
    val m2 = Array.tabulate(64)(i => vs.map(_(i)).sum / n)
    (0 until 64).foreach(i => assert(math.abs(mean(i) - m2(i)) < 1e-6))
    for (i <- 0 until 64; j <- i until 64) {
      val c = vs.map(v => (v(i) - m2(i)) * (v(j) - m2(j))).sum / n
      assert(math.abs(cov(i)(j) - c) < 1e-6, s"cov($i,$j)")
      assert(cov(i)(j) == cov(j)(i))
    }
  }

  test("jacobiEigen reconstructs the covariance") {
    val (_, cov) = Whitening.meanAndCov(emb, "embedding", 64)
    val (lam, v) = Whitening.jacobiEigen(cov)
    // V diag(lam) V^T == cov
    for (i <- 0 until 64; j <- 0 until 64) {
      var s = 0.0
      (0 until 64).foreach(k => s += v(i)(k) * lam(k) * v(j)(k))
      assert(math.abs(s - cov(i)(j)) < 1e-9, s"recon($i,$j)")
    }
    // orthonormal columns
    for (a <- 0 until 64; b <- a until 64) {
      var dot = 0.0
      (0 until 64).foreach(k => dot += v(k)(a) * v(k)(b))
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"ortho($a,$b)")
    }
    // covariance of real embeddings is PSD: no significantly negative eigenvalue
    assert(lam.forall(_ > -1e-9))
  }

  test("whiten drives the covariance to the identity") {
    val (mean, cov) = Whitening.meanAndCov(emb, "embedding", 64)
    val w = Whitening.zcaMatrix(cov, eps = 1e-12)
    val out = Whitening.whiten(emb, "embedding", mean, w)
    val ws = out.select(col("whitened")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = ws.length.toDouble
    val wm = Array.tabulate(64)(i => ws.map(_(i)).sum / n)
    (0 until 64).foreach(i => assert(math.abs(wm(i)) < 1e-6, s"mean($i)"))
    for (i <- 0 until 64; j <- i until 64) {
      val c = ws.map(v => (v(i) - wm(i)) * (v(j) - wm(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 1e-4, s"whitened cov($i,$j) = $c")
    }
  }

  test("whiten plan is map-only (no exchange)") {
    val (mean, cov) = Whitening.meanAndCov(emb, "embedding", 64)
    val w = Whitening.zcaMatrix(cov)
    val plan = Whitening.whiten(emb, "embedding", mean, w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
