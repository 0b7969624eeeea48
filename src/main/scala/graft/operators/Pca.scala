package graft.operators

import graft.functions.Sketches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the standard
  * dimensionality-reduction step in front of ANN index builds (reduce
  * 1024-dim encoder outputs to 64/128 dims, THEN build the IVF/LSH
  * structures over the cheaper vectors).
  *
  * Scale design (100 TB of vectors):
  *  - the covariance is a ONE-PASS distributed aggregate
  *    ([[Sketches.gramMatrix]]): each map partition reduces to a packed
  *    dim(dim+1)/2 + dim + 1 double buffer, partial+final merge, so the
  *    shuffle is a few KB per task regardless of row count, and no
  *    mean-centered copy of the data is ever materialized.
  *  - the eigensolve runs on the DRIVER on the dim×dim matrix — model-sized
  *    work (dim ≤ a few thousand), the same contract as IVF centroids and
  *    BPE merge rules.
  *  - projection is a pure codegen'd map: per component, a zip_with/
  *    aggregate HOF dot against the eigenvector literal minus the
  *    precomputed mean·component scalar. Embarrassingly parallel; the
  *    sequential in-row fold keeps each row's arithmetic deterministic.
  */
object Pca {

  /** The fitted model: `mean` (dim) and `components` (k × dim,
    * eigenvalue-descending, unit-norm rows), plus the eigenvalues
    * (variance explained per component). */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double])

  /** Fit a k-component PCA on `vecs` (columns: vec_id, embedding). One
    * distributed pass (the gram aggregate) + a driver Jacobi eigensolve of
    * the dim×dim covariance. */
  def fit(vecs: DataFrame, k: Int, dim: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    val packed = vecs
      .select(Sketches.gramMatrix(col("embedding"), dim).as("g"))
      .collect()(0).getSeq[Double](0).toArray
    val tri = dim * (dim + 1) / 2
    val n = packed(tri + dim)
    require(n >= 2, s"PCA needs >= 2 vectors, got ${n.toLong}")
    val mean = Array.tabulate(dim)(i => packed(tri + i) / n)
    // cov(i,j) = (Σ xᵢxⱼ − n·µᵢµⱼ) / n  (population covariance)
    val cov = Array.ofDim[Double](dim, dim)
    var p = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (packed(p) - n * mean(i) * mean(j)) / n
        cov(i)(j) = c
        cov(j)(i) = c
        p += 1
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(-values(_)).take(k)
    PcaModel(mean,
      order.map(c => Array.tabulate(dim)(r => vectors(r)(c))).toArray,
      order.map(values).toArray)
  }

  /** Project `vecs` onto the model: (vec_id, pc: array<double>(k)), each
    * coordinate rounded to `dp` decimals. Pure map — the dot runs as a
    * codegen'd zip_with + aggregate HOF against the component literal, and
    * the mean shift folds into one precomputed scalar per component. */
  def project(vecs: DataFrame, model: PcaModel, dp: Int = 4): DataFrame = {
    val scale = math.pow(10, dp)
    val pcs = model.components.map { comp =>
      val vlit = array(comp.map(lit): _*)
      val meanDot = comp.iterator.zip(model.mean.iterator)
        .map { case (a, b) => a * b }.sum
      floor((aggregate(zip_with(col("embedding"), vlit, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x) - meanDot) * scale + 0.5) / scale
    }
    vecs.select(col("vec_id"), array(pcs: _*).as("pc"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector-COLUMN matrix). Classic textbook sweep
    * (Golub & Van Loan §8.5) — O(dim³) per sweep on the driver, converges
    * quadratically; fine through dim of a few thousand. */
  private[operators] def jacobiEigen(a0: Array[Array[Double]],
                                     maxSweeps: Int = 32,
                                     eps: Double = 1e-12)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > eps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > eps / (n * n)) {
            // 2×2 symmetric Schur rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
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
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
