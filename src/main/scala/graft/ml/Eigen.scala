package graft.ml

import breeze.linalg.{eigSym, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.ml.linalg.{DenseMatrix, DenseVector}

/** Driver-local eigendecomposition of the (small) covariance matrix and
  * the deterministic post-processing the reference applies on the GPU:
  * symmetric-eig instead of general SVD (reference: rapidsml_jni.cu:338),
  * descending eigenvalue order (colReverse/rowReverse, rapidsml_jni.cu:
  * 339-340), canonical sign-flip (rapidsml_jni.cu:37-64), explained-
  * variance ratio (RapidsRowMatrix.scala:101-102), top-k truncation
  * (RapidsRowMatrix.scala:104-109).
  *
  * This never distributes: n ≤ 65535 so the n×n problem fits the driver
  * (reference does the same, RapidsRowMatrix.scala:94-95).
  */
object Eigen {

  final case class PcaResult(pc: DenseMatrix, explainedVariance: DenseVector,
      eigenvalues: Array[Double])

  /** Canonical sign: for each eigenvector column, the element with the
    * largest absolute value must be positive — negate the column if not.
    * Replicates the reference's signFlip kernel (rapidsml_jni.cu:37-64)
    * so results are reproducible across runs and backends. */
  def signFlip(vectors: BDM[Double]): BDM[Double] = {
    var j = 0
    while (j < vectors.cols) {
      var maxAbs = 0.0; var maxVal = 0.0; var i = 0
      while (i < vectors.rows) {
        val x = vectors(i, j)
        if (math.abs(x) > maxAbs) { maxAbs = math.abs(x); maxVal = x }
        i += 1
      }
      if (maxVal < 0) {
        i = 0
        while (i < vectors.rows) { vectors(i, j) = -vectors(i, j); i += 1 }
      }
      j += 1
    }
    vectors
  }

  /** Full PCA post-processing: eigendecompose a symmetric PSD matrix,
    * order descending, sign-flip, truncate to k components.
    *
    * @return components as an n×k matrix (column i = i-th PC) plus the
    *         k explained-variance ratios λᵢ/Σλ (ratio over ALL n
    *         eigenvalues, as RapidsRowMatrix.scala:101-102,115-116).
    */
  def pca(cov: BDM[Double], k: Int): PcaResult = {
    val n = cov.rows
    require(k >= 1 && k <= n, s"k=$k outside [1, $n]")
    val eig = eigSym(cov)                       // ascending eigenvalues
    val order = (n - 1) to 0 by -1              // → descending
    val values = order.map(i => math.max(eig.eigenvalues(i), 0.0)).toArray
    val vectors = BDM.zeros[Double](n, n)
    var j = 0
    while (j < n) {
      val src = order(j)
      var i = 0
      while (i < n) { vectors(i, j) = eig.eigenvectors(i, src); i += 1 }
      j += 1
    }
    signFlip(vectors)
    val total = values.sum
    val ratios =
      if (total == 0.0) Array.fill(k)(0.0)
      else values.take(k).map(_ / total)
    // column-major n×k slice of the first k columns
    val pcData = new Array[Double](n * k)
    j = 0
    while (j < k) {
      var i = 0
      while (i < n) { pcData(j * n + i) = vectors(i, j); i += 1 }
      j += 1
    }
    PcaResult(new DenseMatrix(n, k, pcData), new DenseVector(ratios), values)
  }
}
