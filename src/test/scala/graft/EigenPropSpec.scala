package graft

import breeze.linalg.{DenseMatrix => BDM}
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Eigen

/** Property tests: Eigen.pca invariants on random symmetric PSD
  * matrices — descending eigenvalues, orthonormal canonical-sign
  * components, spectral reconstruction, ratio normalization.
  * Deterministic seed sweep (no scalatestplus bridge in the offline
  * dependency cache). */
class EigenPropSpec extends AnyFunSuite {

  private def psd(seed: Long): BDM[Double] = {
    val rng = new scala.util.Random(seed)
    val n = 2 + rng.nextInt(11)
    val b = BDM.fill(n, n)(rng.nextGaussian())
    b.t * b // PSD by construction
  }

  private val seeds = 0L until 30L

  test("eigenvalues descend, components are orthonormal with canonical sign") {
    seeds.foreach { seed =>
      val cov = psd(seed)
      val n = cov.rows
      val res = Eigen.pca(cov, n)
      val ev = res.eigenvalues
      assert(ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-9 }, s"seed $seed")
      assert(ev.forall(_ >= 0.0), s"seed $seed")
      val pc = res.pc
      for (a <- 0 until n; b <- a until n) {
        val dot = (0 until n).map(i => pc(i, a) * pc(i, b)).sum
        assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8,
          s"seed $seed: pc($a)·pc($b) = $dot")
      }
      for (j <- 0 until n) {
        val colVals = (0 until n).map(pc(_, j))
        assert(colVals.maxBy(math.abs) >= 0, s"seed $seed: component $j sign")
      }
      // explained-variance ratios sum to 1 for k = n (trace exhausted)
      assert(math.abs(res.explainedVariance.values.sum - 1.0) < 1e-9, s"seed $seed")
    }
  }

  test("spectral reconstruction: V diag(lambda) V^T recovers the matrix") {
    seeds.foreach { seed =>
      val cov = psd(seed)
      val n = cov.rows
      val res = Eigen.pca(cov, n)
      val scale = math.max(1.0, cov.data.map(math.abs).max)
      for (i <- 0 until n; j <- 0 until n) {
        val recon = (0 until n)
          .map(k => res.pc(i, k) * res.eigenvalues(k) * res.pc(j, k)).sum
        assert(math.abs(recon - cov(i, j)) / scale < 1e-8,
          s"seed $seed: recon($i,$j) $recon vs ${cov(i, j)}")
      }
    }
  }

  test("top-k truncation returns a prefix of the full decomposition") {
    seeds.foreach { seed =>
      val cov = psd(seed)
      val n = cov.rows
      val k = 1 + (seed % n).toInt
      val full = Eigen.pca(cov, n)
      val trunc = Eigen.pca(cov, k)
      for (j <- 0 until k; i <- 0 until n)
        assert(math.abs(trunc.pc(i, j) - full.pc(i, j)) < 1e-12, s"seed $seed")
      for (j <- 0 until k)
        assert(math.abs(trunc.explainedVariance(j) - full.explainedVariance(j)) < 1e-12,
          s"seed $seed")
    }
  }
}
