package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond the dedup/packing families in
  * [[CorpusOps]]: boilerplate stripping, retrieval chunking, systematic
  * weight-proportional sampling, snapshot diffing, vocabulary-coverage
  * analysis, and a Bloom-filter membership dedup for incremental ingest.
  *
  * Shared scale doctrine (same as CorpusOps): every op is a bounded number
  * of shuffles keyed on uniform digests or intrinsic keys; driver state is
  * model-sized by contract (a stratum map, a bucket-offset table, a Bloom
  * bit array); no global windows, no data-sized collect, no UDF on a hot
  * path — everything below stays inside whole-stage codegen.
  */
object CurationOps {

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each row draws u ~ U(0,1] and the k largest u^(1/w) — equivalently
    * the k largest ln(u)/w — are the sample, giving exact
    * probability-proportional-to-size inclusion without replacement in
    * ONE pass. The draw is the catalog's content-keyed recipe: u is a
    * 52-bit dyadic from md5(salt:doc_id) (exact in both engines), so the
    * sample is deterministic, dup-stable, and reproducible anywhere with
    * md5 + ln. The key is rounded to 6 dp before ranking (round-before-
    * rank: Math.log vs libm ln can differ in the last ulp), ties break by
    * doc_id. Selection is top-k (TakeOrderedAndProject — no global sort
    * materializes at any scale). Returns (rn, doc_id, weight, key). */
  def weightedSample(docs: DataFrame, weight: Column, k: Int,
                     salt: String = "aes"): DataFrame = {
    require(k >= 1, s"k=$k")
    val u = (conv(substring(md5(concat(lit(salt), lit(":"),
        col("doc_id").cast("string"))), 1, 13), 16, 10).cast("double") + 1.0) /
      lit(4503599627370496.0) // 2^52
    val keyed = docs.where(weight > 0)
      .withColumn("weight", weight.cast("double"))
      .withColumn("key",
        floor(log(u) / col("weight") * 1e6 + lit(0.5)) / 1e6)
    val picked = keyed
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key").desc, col("doc_id"))
    // the global window runs over k rows only — bounded by contract
    picked.withColumn("rn", row_number().over(w))
      .select(col("rn"), col("doc_id"), col("weight"), col("key"))
  }

  /** (doc_id, <extra...>, pos, seg): fixed-`k`-token segments, the same
    * segmenter contract as [[CorpusOps.tokenChunks]] but carrying
    * passthrough columns (e.g. `source`) so per-stratum frequency ops
    * don't pay a join back to the corpus. */
  private def segments(docs: DataFrame, k: Int, extra: Seq[String]): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .select((col("doc_id") +: extra.map(col)) :+ explode(expr(
        s"transform(sequence(1, cast(ceil(size(toks) / $k.0) as int)), " +
        s"i -> named_struct('pos', i, " +
        s"'seg', array_join(slice(toks, (i - 1) * $k + 1, $k), ' ')))"))
        .as("ps"): _*)
      .select((col("doc_id") +: extra.map(col)) :+
        col("ps.pos").as("pos") :+ col("ps.seg").as("seg"): _*)

  /** CCNet/CC-style boilerplate removal: a segment (k-token chunk) is
    * boilerplate within its `source` when it appears in at least
    * max(minDocs, ceil(minFrac · n_docs_in_source)) DISTINCT documents of
    * that source — navigation bars, license footers, cookie banners.
    * Returns (doc_id, n_seg, n_boiler, text) with boilerplate segments
    * dropped and the remainder reassembled in order (empty string when
    * everything was boilerplate — the caller decides whether to keep the
    * husk).
    *
    * Scale shape: one (source, digest) shuffle for the document-frequency
    * count (segment-vocab-sized result, NOT broadcast — it is joined back
    * shuffle-on-key because a 100 TB crawl's segment vocabulary dwarfs
    * driver memory), one stratum-sized doc-count aggregate joined
    * broadcast, one doc_id shuffle to reassemble. Frequency counting is
    * over DISTINCT (source, digest, doc_id) so a segment repeated inside
    * one spammy document cannot promote itself to boilerplate. */
  def boilerplateRemove(docs: DataFrame, k: Int = 8, minFrac: Double = 0.25,
                        minDocs: Int = 2): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac=$minFrac")
    val segs = segments(docs, k, Seq("source"))
      .withColumn("__h", md5(col("seg")))
    val nDocs = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("__n_docs"))
    val boiler = segs.select(col("source"), col("__h"), col("doc_id"))
      .distinct()
      .groupBy(col("source"), col("__h"))
      .agg(count(lit(1)).as("__df"))
      .join(broadcast(nDocs), Seq("source"))
      .where(col("__df") >= greatest(lit(minDocs.toLong),
        ceil(col("__n_docs") * minFrac).cast("long")))
      .select(col("source"), col("__h"), lit(true).as("__boiler"))
    segs
      .join(boiler, Seq("source", "__h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_seg"),
        count(col("__boiler")).as("n_boiler"),
        // collect_list skips nulls: only kept segments enter the rebuild
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__boiler").isNull, struct(col("pos"), col("seg"))))),
            x => x.getField("seg")), " ").as("text"))
  }

  /** Retrieval/RAG chunking: overlapping token windows of `size` tokens
    * advancing by `stride` (< size ⇒ overlap = size − stride). Chunk c
    * (1-based) covers tokens [(c−1)·stride + 1, (c−1)·stride + size]; the
    * last chunk may be short but always reaches the final token, so every
    * token lands in ≥ 1 chunk. Returns (doc_id, chunk, n_toks, chunk_text).
    * A pure per-row map + bounded explode (≤ n/stride + 1 chunks per doc)
    * — embarrassingly parallel at any corpus size. */
  def chunkDocs(docs: DataFrame, size: Int = 32, stride: Int = 24): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"size=$size stride=$stride")
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("__n", size_of(col("toks")))
      .where(col("__n") >= 1)
      .select(col("doc_id"), col("toks"), col("__n"), explode(expr(
        s"sequence(1, cast(ceil(greatest(__n - $size, 0) / $stride.0) as int) + 1)"))
        .as("chunk"))
      .select(
        col("doc_id"), col("chunk").cast("long").as("chunk"),
        least(lit(size), col("__n") - (col("chunk") - 1) * stride)
          .cast("long").as("n_toks"),
        array_join(slice(col("toks"),
          ((col("chunk") - 1) * stride + 1).cast("int"), lit(size)), " ")
          .as("chunk_text"))
  }

  private def size_of(c: Column): Column = size(c)

  /** Systematic weight-proportional sampling: lay documents end-to-end on
    * a weight axis (doc_id order, weight = `weightCol`) and pick every
    * document whose interval contains a multiple of `grid` — the classic
    * PPS (probability-proportional-to-size) systematic design. Returns
    * (doc_id, weight, picks) for selected docs; picks > 1 when one giant
    * document straddles several grid points (sampling WITH replacement,
    * by design — drop to 1 for without-replacement semantics). Entirely
    * integer arithmetic ⇒ reproducible on any engine.
    *
    * Scale shape: the global running offset is the [[CorpusOps.packShards]]
    * parallel prefix sum — doc_id-range buckets, one nBuckets-row driver
    * offset table, per-bucket windows. No global window at any size. */
  def systematicSample(docs: DataFrame, grid: Long,
                       weightCol: String = "n_chars",
                       nBuckets: Int = 32): DataFrame = {
    require(grid >= 1, s"grid=$grid")
    val wts = docs.select(col("doc_id"),
      coalesce(col(weightCol).cast("long"), lit(0L)).as("weight"))
      .where(col("weight") >= 1)
    val bounds = wts.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    if (bounds.isNullAt(0))
      return wts.withColumn("picks", lit(0L)).where(lit(false))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    val maxB = ((hi - lo) / width).toInt
    val bucketed = wts.withColumn("__b",
      expr(s"cast((doc_id - $lo) div $width as int)"))
    val sums = bucketed.groupBy(col("__b")).agg(sum(col("weight")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 to maxB).scanLeft(0L)((acc, b) => acc + sums.getOrElse(b, 0L))
    val offCol = element_at(typedLit(offsets.take(maxB + 1)), col("__b") + 1)
    val w = Window.partitionBy(col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("__cum", sum(col("weight")).over(w) + offCol)
      .withColumn("picks",
        expr(s"__cum div $grid") - expr(s"(__cum - weight) div $grid"))
      .where(col("picks") >= 1)
      .select(col("doc_id"), col("weight"), col("picks"))
  }

  /** Snapshot diff for dataset versioning: compare two corpus snapshots by
    * content digest and classify every doc_id as added / removed / changed
    * / same. One full-outer join keyed on doc_id — digests are computed
    * per side first so only (doc_id, 16-byte digest) rows move, never
    * payloads. Returns (doc_id, status). */
  def datasetDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    def digests(df: DataFrame, name: String) =
      df.select(col("doc_id"), md5(col("text")).as(name))
    digests(oldSnap, "__old")
      .join(digests(newSnap, "__new"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(col("__old") === col("__new"), "same")
          .otherwise("changed").as("status"))
  }

  /** Vocabulary coverage / OOV analysis: build the top-`vocabSize` token
    * vocabulary by corpus frequency (count desc, token asc — a total
    * order, so the vocabulary is unique) and score every document's
    * out-of-vocabulary token rate against it. Returns
    * (doc_id, n_tokens, n_oov, oov_rate) with oov_rate rounded to 4dp.
    *
    * Scale shape: the vocabulary is a distributed top-k
    * (TakeOrderedAndProject — no global sort) and is vocabSize-bounded by
    * contract, so the membership join broadcasts; the token explode is one
    * pass; one doc_id shuffle aggregates the per-doc counts. */
  def oovRate(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize")
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("token").asc)
      .limit(vocabSize)
      .select(col("token"), lit(true).as("__in_vocab"))
    toks
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           (count(lit(1)) - count(col("__in_vocab"))).as("n_oov"))
      // n_oov*10000.0/n (not (n_oov/n)*10000): same operation ORDER as the
      // DuckDB oracle so floor-rounding can't diverge in the last ulp
      .withColumn("oov_rate",
        floor(col("n_oov") * lit(10000.0) / col("n_tokens") + 0.5) / 10000)
  }

  // ---------------------------------------------------------------- Bloom

  /** Bloom-filter bit array over a column of 64-bit hash pairs — a
    * double-hashing scheme in XOR-rotate form: probe i sets bit
    * (h1 XOR rotl(h2, 7i+1)) mod m. The additive Kirsch–Mitzenmacher
    * (h1 + i·h2) would be the textbook choice but overflows Long under
    * ANSI Column arithmetic; XOR/rotate are overflow-free, give the same
    * pairwise-independent probe family, and the FP bound is pinned
    * EMPIRICALLY by CurationOpsSpec rather than assumed. Deterministic
    * (hash inputs are xxhash64 columns with fixed seeds) ⇒ the filter is
    * a pure function of the input SET, invariant under partitioning —
    * also pinned by CurationOpsSpec.
    *
    * `m` is the bit count (power of two not required; mod is exact) and
    * the filter is m/8 bytes of driver state — model-sized by contract
    * (default 2^16 bits = 8 KiB; a 100 TB ingest frontier would size m in
    * the low GiB, still a broadcast, never a shuffle). */
  final class BloomAgg(m: Int, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(m >= 64 && k >= 1, s"m=$m k=$k")
    private val words = (m + 63) / 64
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], h: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < k) {
        val mixed = h._1 ^ java.lang.Long.rotateLeft(h._2, 7 * i + 1)
        val pos = java.lang.Math.floorMod(mixed, m.toLong).toInt
        b(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
    def outputEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
  }

  /** The (h1, h2) hash-pair columns every Bloom op keys on: two
    * independent xxhash64 draws over the NORMALIZED text (the exact-dedup
    * digest contract), the second salted. */
  def bloomHashes(text: Column): (Column, Column) =
    (xxhash64(lower(trim(text))),
     xxhash64(lit("graft-bloom-h2"), lower(trim(text))))

  /** Build the filter over a corpus' normalized-text digests. One partial+
    * final aggregate — m/8 bytes cross the wire per partition, nothing
    * else. */
  def bloomBuild(corpus: DataFrame, m: Int = 1 << 16, k: Int = 5): Array[Long] = {
    val (h1, h2) = bloomHashes(col("text"))
    val ds = corpus.select(h1.as("h1"), h2.as("h2"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    ds.select(new BloomAgg(m, k).toColumn).head()
  }

  /** Membership test as a pure codegen Column (no UDF, no mapPartitions):
    * the bit array rides along as ONE array literal (the PQ nested-literal
    * lesson — an element_at lookup, never a when-chain) and the k probes
    * unroll into a fixed AND chain. */
  def bloomMightContain(bits: Array[Long], m: Int, k: Int,
                        h1: Column, h2: Column): Column = {
    val lut = typedLit(bits.toSeq)
    (0 until k).map { i =>
      val s = 7 * i + 1 // rotl(h2, s) = (h2 << s) | (h2 >>> (64 - s))
      val rot = shiftleft(h2, s).bitwiseOR(shiftrightunsigned(h2, 64 - s))
      val pos = pmod(h1.bitwiseXOR(rot), lit(m.toLong))
      val word = element_at(lut, shiftright(pos, 6).cast("int") + 1)
      call_function("getbit", word, pos.bitwiseAND(lit(63L)).cast("int")) === 1
    }.reduce(_ && _)
  }

  /** Incremental-ingest dedup via Bloom membership: drop every batch doc
    * whose normalized text is (probably) already in the corpus filter.
    * NO false negatives — a true duplicate is always dropped; a false
    * positive drops a genuinely-new doc with probability ≈ (1−e^{−kn/m})^k,
    * the standard Bloom trade every ingest frontier accepts (the exact
    * [[CorpusOps.incrementalDedup]] anti-join is the no-loss alternative;
    * this one moves ZERO corpus bytes per batch — the filter is built once
    * and shipped). */
  def bloomDedup(batch: DataFrame, corpus: DataFrame,
                 m: Int = 1 << 16, k: Int = 5): DataFrame = {
    val bits = bloomBuild(corpus, m, k)
    // saturation guard: past ~half-full the FP rate explodes ((1−e^{−kn/m})^k
    // → 1) and the op would silently drop most of the GENUINELY-NEW batch —
    // the bit array is already driver-side, so the check is a popcount.
    // Fail loudly with the resize math instead of silently destroying data.
    val ones = bits.map(java.lang.Long.bitCount(_).toLong).sum
    val fill = ones.toDouble / m
    require(fill <= 0.5,
      f"bloomDedup: filter is $fill%.2f full (m=$m, ~${ones} bits set) — " +
      f"FP rate ≈ ${math.pow(fill, k)}%.3f would drop new documents en " +
      "masse; raise m to ≥ 2·k·corpusSize/ln(2) or use the exact " +
      "CorpusOps.incrementalDedup anti-join")
    val (h1, h2) = bloomHashes(col("text"))
    batch.where(!bloomMightContain(bits, m, k, h1, h2))
  }
}
