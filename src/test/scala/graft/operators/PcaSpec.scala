package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  test("jacobi eigensolve recovers a known spectrum") {
    // diag(5,2,1) rotated by a known orthogonal matrix: eigenvalues must
    // come back exactly (up to fp), eigenvectors to sign
    val theta = 0.3
    val c = math.cos(theta); val s = math.sin(theta)
    val r = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val d = Array(5.0, 2.0, 1.0)
    // a = r · diag(d) · rᵀ
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => r(i)(k) * d(k) * r(j)(k)).sum)
    val (values, vectors) = Pca.jacobiEigen(a)
    val sorted = values.sorted.reverse
    Seq(5.0, 2.0, 1.0).zip(sorted).foreach { case (want, got) =>
      assert(math.abs(want - got) < 1e-10, s"eigenvalue $got vs $want")
    }
    // each recovered eigenvector satisfies A·v = λ·v
    for (cidx <- 0 until 3) {
      val v = Array.tabulate(3)(rw => vectors(rw)(cidx))
      val av = Array.tabulate(3)(i => (0 until 3).map(j => a(i)(j) * v(j)).sum)
      val lambda = values(cidx)
      (0 until 3).foreach(i =>
        assert(math.abs(av(i) - lambda * v(i)) < 1e-10,
          s"A·v ≠ λ·v at $i: ${av(i)} vs ${lambda * v(i)}"))
    }
  }

  test("fitted components are orthonormal with descending eigenvalues") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = Pca.fit(emb, k = 8, dim = 64)
    assert(model.components.length == 8)
    for (i <- 0 until 8; j <- i until 8) {
      val dot = model.components(i).zip(model.components(j))
        .map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"comp ${i}x${j} = $dot, want $want")
    }
    model.eigenvalues.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12, s"eigenvalues not descending: $a < $b")
    }
    assert(model.eigenvalues.head > 0, "top eigenvalue must be positive")
  }

  test("distributed fit matches a local covariance eigensolve") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = Pca.fit(emb, k = 4, dim = 64)
    val local = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = local.length.toDouble
    val mean = Array.tabulate(64)(i => local.map(_(i)).sum / n)
    (0 until 64).foreach(i =>
      assert(math.abs(model.mean(i) - mean(i)) < 1e-9,
        s"mean($i): ${model.mean(i)} vs ${mean(i)}"))
    val cov = Array.tabulate(64, 64)((i, j) =>
      local.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
    val (values, _) = Pca.jacobiEigen(cov)
    val top = values.sorted.reverse.take(4)
    model.eigenvalues.zip(top).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"eigenvalue $got vs local $want")
    }
  }

  test("projected variance per component approximates its eigenvalue") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = Pca.fit(emb, k = 3, dim = 64)
    val pcs = Pca.project(emb, model, dp = 6).collect()
      .map(_.getSeq[Double](1).toArray)
    val n = pcs.length.toDouble
    for (c <- 0 until 3) {
      val xs = pcs.map(_(c))
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / n
      // population variance of the projection IS the eigenvalue (exact in
      // real arithmetic; 4 relative-% slack for fp + 6dp rounding)
      assert(math.abs(v - model.eigenvalues(c)) <=
        0.04 * model.eigenvalues(c) + 1e-9,
        s"component $c variance $v vs eigenvalue ${model.eigenvalues(c)}")
    }
  }

  test("k-means assignment matches a local nearest-centroid recompute") {
    val emb = Tables.embeddings(spark, sf0001)
    val cents = Ivf.trainCentroids(emb, nCentroids = 4, iters = 2)
    val got = Ivf.assign(emb, cents).collect()
      .map(r => r.getLong(1) -> r.getInt(0)).toMap
    val local = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // trainCentroids returns UNIT centroids, so argmax dot ≡ argmax cosine;
    // double-cast accumulation mirrors the native dot_f expression
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0
      for (i <- a.indices) d += a(i).toDouble * b(i).toDouble
      d
    }
    local.foreach { case (vid, v) =>
      val want = cents.indices.maxBy(c => dot(v, cents(c)))
      assert(got(vid) == want, s"vec $vid assigned ${got(vid)}, want $want")
    }
  }
}
