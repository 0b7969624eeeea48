package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sketch aggregators (SURVEY §2B UDAF surface): HyperLogLog and MinHash
  * signatures as typed `Aggregator`s — both have associative, commutative
  * merge, so Spark runs them as partial+final aggregations (map-side combine,
  * small shuffle payloads: 1 KiB HLL registers / 4·k-byte signatures), which
  * is exactly the shape that scales to 100 TB.
  *
  * Hashing is xxhash64-compatible (we reuse Spark's own XxHash64 expression
  * for the row-level hashes where possible; buffer-internal hashing uses a
  * splitmix64-style finalizer, standard public-domain constants).
  */
object Sketches {

  /** 64-bit avalanche finalizer (splitmix64 / Murmur3 fmix64 constants). */
  @inline private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // ---------------------------------------------------------------- HLL ---

  /** Dense HyperLogLog with 2^p registers over pre-hashed Long input. */
  final class HllAggregator(p: Int = 12)
      extends Aggregator[Long, Array[Byte], Long] {
    private val m = 1 << p

    override def zero: Array[Byte] = new Array[Byte](m)

    override def reduce(buf: Array[Byte], value: Long): Array[Byte] = {
      val h = mix64(value)
      val idx = (h >>> (64 - p)).toInt
      // rank of the remaining 64-p bits (leading zeros + 1)
      val w = (h << p) | (1L << (p - 1)) // guard bit keeps rank <= 64-p+1
      val rank = (java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
      if (rank > buf(idx)) buf(idx) = rank
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Byte]): Long = {
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        sum += 1.0 / (1L << buf(i)).toDouble
        if (buf(i) == 0) zeros += 1
        i += 1
      }
      var est = alpha * m * m / sum
      if (est <= 2.5 * m && zeros > 0)
        est = m * math.log(m.toDouble / zeros) // linear counting
      math.round(est)
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: approximate count-distinct of a pre-hashed Long column. */
  def hll(col: Column, p: Int = 12): Column =
    org.apache.spark.sql.functions.udaf(new HllAggregator(p), Encoders.scalaLong)
      .apply(col)

  /** Sketch-emitting twin of [[HllAggregator]]: same registers, but
    * `finish` returns the BUFFER — the persistable pre-aggregate. A
    * sketch table (group, sketch) re-aggregates to any coarser grouping
    * via [[HllMergeAggregator]] WITHOUT touching raw data: register-wise
    * max is associative/commutative/idempotent, so the rolled-up buffer
    * is bit-identical to a direct pass — pinned in SketchesSpec. This is
    * the materialized-view pattern for distincts at 100 TB: daily
    * sketches are KBs; the week/month/all-time roll-up reads only them
    * (exact distincts can't do this — distinct is not additive). */
  final class HllSketchAggregator(p: Int = 12)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    private val inner = new HllAggregator(p)
    override def zero: Array[Byte] = inner.zero
    override def reduce(b: Array[Byte], v: Long): Array[Byte] = inner.reduce(b, v)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] = buf
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge stored sketches (binary column) to an estimate. */
  final class HllMergeAggregator(p: Int = 12)
      extends Aggregator[Array[Byte], Array[Byte], Long] {
    private val inner = new HllAggregator(p)
    override def zero: Array[Byte] = inner.zero
    override def reduce(b: Array[Byte], v: Array[Byte]): Array[Byte] =
      inner.merge(b, v)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
    override def finish(buf: Array[Byte]): Long = inner.finish(buf)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def hllSketch(col: Column, p: Int = 12): Column =
    org.apache.spark.sql.functions.udaf(new HllSketchAggregator(p), Encoders.scalaLong)
      .apply(col)

  def hllMergeEstimate(col: Column, p: Int = 12): Column =
    org.apache.spark.sql.functions.udaf(new HllMergeAggregator(p),
      Encoders.BINARY).apply(col)

  // ------------------------------------------------------------ MinHash ---

  /** MinHash signature of a set of pre-hashed Long shingles: k permutations
    * via k (a_i·x + b_i) universal hashes derived from a seed.
    */
  final class MinHashAggregator(k: Int = 64, seed: Long = 42L)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    // deterministic per-permutation odd multipliers + offsets
    private val as = Array.tabulate(k)(i => mix64(seed + 2L * i) | 1L)
    private val bs = Array.tabulate(k)(i => mix64(seed + 2L * i + 1L))

    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

    override def reduce(buf: Array[Long], value: Long): Array[Long] = {
      var i = 0
      while (i < k) {
        val h = as(i) * value + bs(i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: MinHash signature (array<bigint>) of pre-hashed shingles. */
  def minhash(col: Column, k: Int = 64, seed: Long = 42L): Column =
    org.apache.spark.sql.functions.udaf(new MinHashAggregator(k, seed),
      Encoders.scalaLong).apply(col)

  // --------------------------------------------------------- vector sum ---

  /** (element-wise sum, count) of float vectors. */
  case class VectorSum(sum: Seq[Double], n: Long)

  /** Element-wise sum + count of float vectors — the partial-aggregable core
    * of a distributed mean (the Lloyd step of IVF training). Associative +
    * commutative merge means Spark runs it partial+final: the shuffle
    * carries ONE (dim+1)-double buffer per group per map partition instead
    * of sample·dim exploded (cid, pos, x) rows. */
  final class VectorSumAggregator(dim: Int)
      extends Aggregator[Seq[Float], Array[Double], VectorSum] {
    // buffer: dim running sums, count in the last slot
    override def zero: Array[Double] = new Array[Double](dim + 1)

    override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
      var i = 0
      while (i < dim) { buf(i) += v(i); i += 1 }
      buf(dim) += 1
      buf
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i <= dim) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Double]): VectorSum =
      VectorSum(buf.take(dim).toSeq, buf(dim).toLong)

    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[VectorSum] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[VectorSum]()
  }

  /** Column form: struct<sum: array<double>, n: bigint> of a float-vector
    * column. */
  def vectorSum(col: Column, dim: Int): Column =
    org.apache.spark.sql.functions.udaf(new VectorSumAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
      .apply(col)

  // ----------------------------------------------------------- count-min ---

  /** The collected Count-Min sketch: `table` is depth rows of `width`
    * counters (row-major), `n` the total items. Point estimate = min over
    * rows — always ≥ the true count, over by at most ≈ e·n/width with
    * probability 1 − e^−depth (Cormode & Muthukrishnan, J.Alg'05). */
  final case class Cms(depth: Int, width: Int, table: Seq[Long], n: Long) {
    def estimate(item: String): Long =
      (0 until depth).map(d => table(d * width + Cms.idx(d, width, item))).min
  }

  object Cms {
    /** Row-d counter index: splitmix a PER-ROW-SEEDED string hash. The
      * string must be re-hashed with a row-specific seed (not one shared
      * 32-bit hash mixed per row): two items colliding in a single shared
      * hash would collide in EVERY row and min-over-rows could never
      * separate them, voiding the 1 − e^−depth guarantee. With independent
      * per-row hashes, a row collision is a fresh 2^-32 event per row.
      * All hashing stays on the Scala side (build AND estimate), so no
      * cross-engine hash pinning is needed. */
    private[graft] def idx(d: Int, width: Int, item: String): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(item, 42 + d * 0x3C6EF372)
      java.lang.Math.floorMod(mix64(h.toLong ^ (d * 0x9e3779b97f4a7c15L)),
        width.toLong).toInt
    }
  }

  /** Count-Min over a String column: buffer = depth·width longs per map
    * partition (32 KiB at 4×1024), associative+commutative merge ⇒
    * partial+final — frequency estimates for a 100 TB token stream with a
    * fixed-size shuffle payload and NO per-key shuffle at all (the groupBy
    * this sketch replaces shuffles the whole key space). */
  final class CountMinAggregator(depth: Int = 4, width: Int = 1024)
      extends Aggregator[String, Array[Long], Cms] {
    override def zero: Array[Long] = new Array[Long](depth * width + 1)

    override def reduce(buf: Array[Long], item: String): Array[Long] = {
      var d = 0
      while (d < depth) {
        buf(d * width + Cms.idx(d, width, item)) += 1
        d += 1
      }
      buf(depth * width) += 1 // total item count rides in the last slot
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Cms =
      Cms(depth, width, buf.take(depth * width).toSeq, buf(depth * width))

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Cms] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Cms]()
  }

  /** Column form: struct<depth, width, table, n> of a String column. */
  def countMin(col: Column, depth: Int = 4, width: Int = 1024): Column =
    org.apache.spark.sql.functions.udaf(new CountMinAggregator(depth, width),
      Encoders.STRING).apply(col)

  // -------------------------------------------------------- gram matrix ---

  /** Second-moment sums of float vectors for one-pass covariance: packed
    * upper-triangle Σ xᵢxⱼ, the element sums Σ xᵢ, and the count. The
    * buffer is dim(dim+1)/2 + dim + 1 doubles (2145 for dim=64) PER MAP
    * PARTITION — the covariance of a 100 TB embedding table shuffles a few
    * KB per task and never materializes a centered copy of the data. */
  final class GramAggregator(dim: Int)
      extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Double] = new Array[Double](tri + dim + 1)

    override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
      var k = 0
      var i = 0
      while (i < dim) {
        val xi = v(i).toDouble
        var j = i
        while (j < dim) { buf(k) += xi * v(j); j += 1; k += 1 }
        buf(tri + i) += xi
        i += 1
      }
      buf(tri + dim) += 1
      buf
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: packed [upper-tri Σxᵢxⱼ | Σxᵢ | n] of a float-vector
    * column (input to the driver-side covariance eigensolve in PCA). */
  def gramMatrix(col: Column, dim: Int): Column =
    org.apache.spark.sql.functions.udaf(new GramAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
      .apply(col)

  /** Jaccard estimate from two MinHash signatures. */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    if (a.isEmpty) 0.0
    else a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length
  }

  // -------------------------------------------------------- theta (KMV) ---

  /** KMV/theta sketch: the k minimum DISTINCT hash values of a set.
    * Where HLL only unions, KMV supports INTERSECTION estimates (audience
    * overlap) via the θ rule, and — unlike t-digest — the sketch is a pure
    * function of the value SET: order- and partitioning-independent,
    * bit-deterministic. Buffer = sorted distinct longs, hashes compared
    * UNSIGNED (java.lang.Long.compareUnsigned) so θ normalizes to
    * (kth hash)/2⁶⁴.
    */
  object Theta {
    /** unsigned 64-bit value → [0, 1). */
    @inline private def unsignedToUnit(h: Long): Double =
      (h >>> 11).toDouble / (1L << 53).toDouble

    /** θ ∈ (0,1]: the sketch's sampling threshold — the k-th minimum hash
      * normalized to unit, or 1 when the sketch saw the whole set. */
    def thetaOf(sk: Array[Long], k: Int): Double =
      if (sk.length < k) 1.0 else unsignedToUnit(sk.last)

    /** Distinct-count estimate: exact below k, (k−1)/θ at capacity. */
    def estimate(sk: Array[Long], k: Int): Double =
      if (sk.length < k) sk.length.toDouble
      else (k - 1).toDouble / thetaOf(sk, k)

    /** Union sketch: merged distinct minima, capped at k. */
    def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
      val merged = new java.util.TreeSet[java.lang.Long](
        java.lang.Long.compareUnsigned(_, _))
      a.foreach(merged.add(_)); b.foreach(merged.add(_))
      val out = new Array[Long](math.min(k, merged.size))
      val it = merged.iterator()
      var i = 0
      while (i < out.length) { out(i) = it.next(); i += 1 }
      out
    }

    /** Intersection-cardinality estimate (KMV θ rule): count the common
      * hashes below θ = min(θ_A, θ_B), scale by 1/θ. */
    def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
      val t = math.min(thetaOf(a, k), thetaOf(b, k))
      val bs = b.toSet
      val common = a.count(h => unsignedToUnit(h) < t && bs.contains(h))
      common / t
    }
  }

  /** Sketch-emitting KMV aggregator over pre-hashed longs (xxhash64 the
    * key first, as with [[HllAggregator]]). Buffer mutated in place:
    * sorted-unsigned distinct array, binary-search insert, cap k. */
  final class ThetaSketchAggregator(k: Int = 1024)
      extends Aggregator[Long, Array[Long], Array[Long]] {

    override def zero: Array[Long] = Array.empty

    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      // binary search in unsigned order
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Long.compareUnsigned(buf(mid), v)
        if (c < 0) lo = mid + 1 else hi = mid
      }
      if (lo < buf.length && buf(lo) == v) buf           // already present
      else if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, lo)
        out(lo) = v
        System.arraycopy(buf, lo, out, lo + 1, buf.length - lo)
        out
      } else if (lo < k) {                               // displaces the max
        System.arraycopy(buf, lo, buf, lo + 1, k - lo - 1)
        buf(lo) = v
        buf
      } else buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      Theta.union(a, b, k)

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: KMV theta sketch (array<bigint>) of pre-hashed longs. */
  def thetaSketch(col: Column, k: Int = 1024): Column =
    org.apache.spark.sql.functions.udaf(new ThetaSketchAggregator(k),
      Encoders.scalaLong).apply(col)

  /** The θ-rule estimate of a persisted sketch column, spelled as
    * expressions so it composes into (streaming) aggregations without a
    * UDF: exact size below k, else (k−1)/θ with θ = (last >>> 11)/2⁵³ —
    * the ONE column-level mirror of [[Theta.estimate]]/unsignedToUnit
    * (EventStreams.tumblingDistinctUsers and q_stream_distinct both use
    * this; the 11/2⁵³ constants live here and in Theta only). */
  def thetaEstimate(sk: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (shiftrightunsigned(element_at(sk, -1), 11)
          .cast("double") / lit(9007199254740992.0)))
  }

  /** Re-aggregates PERSISTED theta sketches (the materialized-view path,
    * [[HllMergeAggregator]]'s twin): union is the bitwise-exact set-law
    * merge, finish rounds the θ-rule estimate to a long. Because the
    * sketch is a pure function of the value set, rollup ≡ direct pass
    * BIT-exactly, not just within error (SketchesSpec). */
  final class ThetaMergeAggregator(k: Int = 1024)
      extends Aggregator[Array[Long], Array[Long], Long] {
    override def zero: Array[Long] = Array.empty
    override def reduce(b: Array[Long], v: Array[Long]): Array[Long] =
      Theta.union(b, v, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      Theta.union(a, b, k)
    override def finish(buf: Array[Long]): Long =
      math.round(Theta.estimate(buf, k))
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: distinct estimate from unioned persisted theta sketches. */
  def thetaMergeEstimate(col: Column, k: Int = 1024): Column =
    org.apache.spark.sql.functions.udaf(new ThetaMergeAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
      .apply(col)

  // ----------------------------------------------------------- t-digest ---

  /** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
    * Quantiles Using t-Digests"): centroids sized by the k₁ scale function
    * k(q) = (δ/2π)·asin(2q−1), so clusters shrink toward the tails — rank
    * error is O(q(1−q)/δ), tightest exactly where percentile queries care.
    *
    * The sketch completes the mergeable-summary family (HLL, count-min,
    * MinHash, Bloom, SimHash): associative merge ⇒ Spark runs it
    * partial+final, the shuffle carries one ≤(8·2δ+ε)-byte buffer per
    * group per map partition, never the values. No RNG anywhere —
    * compaction is a deterministic function of the accumulated multiset
    * and arrival order; estimates for ANY order stay inside the rank-error
    * bound (SketchesSpec pins both the local-order exact bound and a
    * distributed-run margin).
    *
    * Buffer layout (bytes): int n, then n × (double mean, double weight),
    * centroids kept sorted by mean.
    */
  object TDigest {
    /** Serialize (means, weights, n) — the empty sketch is 4 zero bytes. */
    def pack(means: Array[Double], ws: Array[Double], n: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(means(i)); bb.putDouble(ws(i)); i += 1 }
      bb.array()
    }

    def unpack(b: Array[Byte]): (Array[Double], Array[Double]) = {
      val bb = java.nio.ByteBuffer.wrap(b)
      val n = bb.getInt
      val means = new Array[Double](n)
      val ws = new Array[Double](n)
      var i = 0
      while (i < n) { means(i) = bb.getDouble; ws(i) = bb.getDouble; i += 1 }
      (means, ws)
    }

    /** k₁ scale function; δ caps the compressed centroid count at ~2δ. */
    @inline private def kScale(q: Double, delta: Int): Double =
      delta / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

    /** Merge-compress a (mean, weight) multiset sorted by mean into ≤ ~2δ
      * centroids: greedily absorb neighbors while the k-span stays < 1. */
    def compress(means: Array[Double], ws: Array[Double],
                 delta: Int): (Array[Double], Array[Double]) = {
      val n = means.length
      if (n == 0) return (means, ws)
      val idx = (0 until n).sortBy(means(_)).toArray
      val total = ws.sum
      val om = new Array[Double](n)
      val ow = new Array[Double](n)
      var out = 0
      var accW = ws(idx(0))
      var accSum = means(idx(0)) * ws(idx(0))
      var wSoFar = 0.0 // weight strictly before the open cluster
      var kLeft = kScale(0.0, delta)
      var i = 1
      while (i < n) {
        val w = ws(idx(i))
        val qRight = (wSoFar + accW + w) / total
        if (kScale(qRight, delta) - kLeft < 1.0) {
          accW += w; accSum += means(idx(i)) * w
        } else {
          om(out) = accSum / accW; ow(out) = accW; out += 1
          wSoFar += accW
          kLeft = kScale(wSoFar / total, delta)
          accW = w; accSum = means(idx(i)) * w
        }
        i += 1
      }
      om(out) = accSum / accW; ow(out) = accW; out += 1
      (om.take(out), ow.take(out))
    }

    /** Quantile estimate by linear interpolation between centroid
      * midpoints (centroid i sits at cumulative weight W_<i + w_i/2). */
    def quantile(means: Array[Double], ws: Array[Double], q: Double): Double = {
      val n = means.length
      require(n > 0, "quantile of an empty t-digest")
      if (n == 1) return means(0)
      val total = ws.sum
      val target = q * total
      var cum = 0.0
      var i = 0
      while (i < n) {
        val mid = cum + ws(i) / 2
        if (target <= mid) {
          if (i == 0) return means(0)
          val prevMid = cum - ws(i - 1) / 2
          val f = (target - prevMid) / (mid - prevMid)
          return means(i - 1) + f * (means(i) - means(i - 1))
        }
        cum += ws(i)
        i += 1
      }
      means(n - 1)
    }
  }

  /** Sketch-emitting aggregator: double column → serialized t-digest.
    *
    * The buffer is FIXED-capacity (4 + 16·8δ bytes) and mutated in place
    * (the HllAggregator discipline): points append as weight-1 centroids
    * at slot n; when the buffer fills it compresses back down to ≤ ~2δ
    * centroids in place. Merge concatenates live entries + compresses.
    * `finish` emits the compact (exact-length) serialized digest.
    */
  final class TDigestAggregator(delta: Int = 100)
      extends Aggregator[Double, Array[Byte], Array[Byte]] {
    private val bufCap = 8 * delta

    override def zero: Array[Byte] = new Array[Byte](4 + 16 * bufCap)

    private def compressInPlace(buf: Array[Byte]): Unit = {
      val (m, w) = TDigest.unpack(buf)
      val (cm, cw) = TDigest.compress(m, w, delta)
      val bb = java.nio.ByteBuffer.wrap(buf)
      bb.putInt(cm.length)
      var i = 0
      while (i < cm.length) { bb.putDouble(cm(i)); bb.putDouble(cw(i)); i += 1 }
    }

    override def reduce(buf: Array[Byte], v: Double): Array[Byte] = {
      val bb = java.nio.ByteBuffer.wrap(buf)
      var n = bb.getInt(0)
      if (n >= bufCap) { compressInPlace(buf); n = bb.getInt(0) }
      bb.putDouble(4 + 16 * n, v)
      bb.putDouble(4 + 16 * n + 8, 1.0)
      bb.putInt(0, n + 1)
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val (ma, wa) = TDigest.unpack(a)
      val (mb, wb) = TDigest.unpack(b)
      val (cm, cw) = TDigest.compress(ma ++ mb, wa ++ wb, delta)
      val out = new Array[Byte](4 + 16 * bufCap)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(cm.length)
      var i = 0
      while (i < cm.length) { bb.putDouble(cm(i)); bb.putDouble(cw(i)); i += 1 }
      out
    }

    override def finish(buf: Array[Byte]): Array[Byte] = {
      val (m, w) = TDigest.unpack(buf)
      val (cm, cw) = TDigest.compress(m, w, delta)
      TDigest.pack(cm, cw, cm.length)
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column form: serialized t-digest of a double column. */
  def tdigest(col: Column, delta: Int = 100): Column =
    org.apache.spark.sql.functions.udaf(new TDigestAggregator(delta),
      Encoders.scalaDouble).apply(col)

  /** Quantile estimates (array<double>) from a serialized t-digest. */
  def tdigestQuantiles(sketch: Array[Byte], qs: Seq[Double]): Seq[Double] = {
    val (m, w) = TDigest.unpack(sketch)
    qs.map(q => TDigest.quantile(m, w, q))
  }
}
