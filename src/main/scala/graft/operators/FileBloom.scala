package graft.operators

/** Per-file Bloom filter for snapshot-log data skipping — the role of
  * Delta's bloom-filter index (and Iceberg's puffin blobs): point
  * lookups on HIGH-CARDINALITY, UNCLUSTERED columns, exactly where
  * min/max stats prune nothing (every fragmented file spans the whole
  * value space) and clustering the layout on the column would cost a
  * table rewrite per indexed column.
  *
  * Construction: classic Bloom with double hashing
  * (Kirsch–Mitzenmacher): bit_i = h1 + i·h2 mod m, h1 = FNV-1a 64 over
  * the value's STRING form, h2 = a SplitMix64 avalanche of h1 (forced
  * odd). Both the build job (executors) and the probe (driver) call
  * these same functions, so a false NEGATIVE is impossible by
  * construction — the only asymmetric failure a skipping index must
  * never have. m is sized per FILE from its logged row count
  * (bitsPerValue · rows, rounded to a power of two, clamped to
  * [2^13, 2^24] bits = 1 KiB–2 MiB per file per column); k =
  * round(bitsPerValue · ln 2) (the optimum), so bitsPerValue = 10 gives
  * k = 7 and ~0.8% false positives — a fragmented point probe reads
  * ~1% of files instead of all of them. NULLs are never added and never
  * probed (null-count stats own IS NULL pruning).
  *
  * Hashing the CAST-TO-STRING form (Spark's `cast(c as string)`) keeps
  * the contract engine-independent: the probe passes the value's string
  * spelling, longs round-trip exactly, and no parquet binary layout
  * leaks into the index. */
object FileBloom {
  /** FNV-1a 64 over the UTF-16 code units (deterministic, allocation-free). */
  def hash1(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** SplitMix64 finalizer — decorrelates h2 from h1. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Optimal hash count for the configured bits-per-value. */
  def kFor(bitsPerValue: Int): Int =
    math.max(1, math.round(bitsPerValue * math.log(2)).toInt)

  /** Power-of-two filter size in BITS for a file of `rows` rows,
    * clamped to [2^13, 2^24]. */
  def mFor(rows: Long, bitsPerValue: Int): Int = {
    val want = math.max(8192L, math.max(1L, rows) * bitsPerValue)
    var m = 8192L
    while (m < want && m < (1L << 24)) m <<= 1
    m.toInt
  }

  def newBits(m: Int): Array[Long] = new Array[Long](m >>> 6)

  def add(bits: Array[Long], m: Int, k: Int, v: String): Unit = {
    val h1 = hash1(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val b = (((h1 + i * h2) % m) + m) % m
      bits((b >>> 6).toInt) |= 1L << (b & 63)
      i += 1
    }
  }

  def contains(bits: Array[Long], m: Int, k: Int, v: String): Boolean = {
    val h1 = hash1(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val b = (((h1 + i * h2) % m) + m) % m
      if ((bits((b >>> 6).toInt) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def or(into: Array[Long], from: Array[Long]): Unit = {
    var i = 0
    while (i < into.length) { into(i) |= from(i); i += 1 }
  }

  def toB64(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def fromB64(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length >>> 3)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
}
