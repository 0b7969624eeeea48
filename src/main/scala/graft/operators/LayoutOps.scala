package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering + file-level data skipping —
  * the lakehouse `OPTIMIZE ZORDER` / Iceberg sort-order shape, the layout
  * lever that matters most at 100 TB: partition pruning only cuts the
  * partitioned dimension, and a linear sort only clusters its leading
  * column. Z-ordering interleaves the bits of k rank-scaled columns so a
  * range predicate on ANY of them touches a ~n^((k-1)/k) fraction of the
  * files, and the per-file min/max manifest turns that locality into
  * files actually not opened.
  *
  * The manifest here is materialized by a scan (one aggregate); a table
  * format (Delta/Iceberg) keeps the identical table in its transaction
  * log so skipping is metadata-only — this operator IS that table, built
  * from the data when no log exists.
  */
object LayoutOps {

  /** 16-bit Morton spread via the magic-mask doubling steps: places the
    * 16 low bits of `c` at even bit positions (0,2,4,…,30). Pure integer
    * arithmetic — codegen-friendly and exactly mirrorable in any engine
    * with shifts. */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** SQL for rank-scaling an integer column to [0, 2^bits − 1] by dataset
    * bounds using pure LONG arithmetic, deterministic and engine-portable
    * (no float rounding). Two regimes:
    *
    *   - range · (2^bits − 1) fits in a LONG (ranges below ~2^47 at 16
    *     bits — every realistic id/date/price column): multiply-first
    *     `(x − min) · maxVal div range`, full bucket resolution.
    *   - wider ranges (epoch-nanos spans, hash-valued columns): the
    *     multiply would silently WRAP and scramble the layout (reads stay
    *     correct — pruning uses real per-file min/max — but clustering
    *     degrades to noise). Divide-first instead: `(x − min) div step`
    *     with step = range div 2^bits + 1, which keeps the quotient in
    *     [0, 2^bits − 1] with no intermediate above the range itself.
    *
    * The regime is chosen driver-side from the bounds, so the per-row
    * expression stays a two-op integer chain inside codegen. */
  private def scaleSql(name: String, mn: Long, mx: Long, bits: Int): String = {
    val maxVal = (1L << bits) - 1L
    if (mx <= mn) "CAST(0 AS BIGINT)"
    else {
      val range = mx - mn
      if (range <= Long.MaxValue / maxVal)
        s"CAST(((CAST(`$name` AS BIGINT) - ($mn)) * $maxVal) DIV ($range) AS BIGINT)"
      else {
        val step = range / (maxVal + 1L) + 1L
        s"CAST((CAST(`$name` AS BIGINT) - ($mn)) DIV ($step) AS BIGINT)"
      }
    }
  }

  /** Scale an integer column to [0, 65535] by dataset bounds — see
    * [[scaleSql]]. Constant columns (max == min) scale to 0. */
  private def scale16(name: String, mn: Long, mx: Long): Column =
    expr(scaleSql(name, mn, mx, 16))

  /** Append a 32-bit Morton z-value column `zCol` interleaving two
    * integer columns, each rank-scaled to 16 bits by its dataset min/max
    * (computed here in one aggregate — pass `knownBounds` (xMin, xMax,
    * yMin, yMax) to skip the pass when stats are already known, as a
    * table format's log would). x takes even bits, y odd. */
  def zvalue(df: DataFrame, xCol: String, yCol: String, zCol: String = "z",
             knownBounds: Option[(Long, Long, Long, Long)] = None): DataFrame = {
    val (xMin, xMax, yMin, yMax) = knownBounds.getOrElse {
      val r = df.agg(
        min(col(xCol).cast("long")), max(col(xCol).cast("long")),
        min(col(yCol).cast("long")), max(col(yCol).cast("long"))).collect()(0)
      require(!r.anyNull, s"zvalue: empty input or null bounds for $xCol/$yCol")
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    df.withColumn(zCol,
      spread16(scale16(xCol, xMin, xMax))
        .bitwiseOR(shiftleft(spread16(scale16(yCol, yMin, yMax)), 1)))
  }

  /** k-column Morton z-value: each column rank-scales to
    * min(16, ⌊64/k⌋) bits (same pure-`DIV` arithmetic as [[zvalue]]);
    * bit j of column c lands at position j·k + c. The 2-column case
    * delegates to the magic-mask [[zvalue]] (bit-identical — pinned in
    * LayoutOpsSpec via the knownBounds generic path); for k ≥ 3 no
    * magic-mask ladder exists, so the interleave is the explicit
    * per-bit shift-mask-or chain per column — pure integer
    * arithmetic, stays inside codegen (no HOF, no UDF). A range
    * predicate on ANY of the k columns then prunes ~n^((k−1)/k) of a
    * z-sorted file set via the same [[skippingManifest]]. */
  def zvalueK(df: DataFrame, cols: Seq[String], zCol: String = "z",
              knownBounds: Option[Seq[(Long, Long)]] = None): DataFrame = {
    require(cols.size >= 2 && cols.size <= 8, s"k=${cols.size} not in [2,8]")
    val k = cols.size
    if (k == 2 && knownBounds.isEmpty)
      return zvalue(df, cols(0), cols(1), zCol)
    // 16 bits per column at any k (capped, not 64/k): k=2 stays
    // bit-identical with the magic-mask [[zvalue]] — the parity the spec
    // pins through the knownBounds generic path — and precision doesn't
    // silently grow/shrink as columns are added
    val bits = math.min(16, 64 / k)
    val bounds = knownBounds.getOrElse {
      val aggs = cols.flatMap(c => Seq(min(col(c).cast("long")),
        max(col(c).cast("long"))))
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      require(!r.anyNull, s"zvalueK: empty input or null bounds for $cols")
      cols.indices.map(i => (r.getLong(2 * i), r.getLong(2 * i + 1)))
    }
    require(bounds.size == k, s"need $k bound pairs, got ${bounds.size}")
    val z = cols.zipWithIndex.map { case (c, ci) =>
      val (mn, mx) = bounds(ci)
      val scaled = scaleSql(c, mn, mx, bits)
      (0 until bits).map(j =>
        s"shiftleft(shiftrightunsigned($scaled, $j) & 1, ${j * k + ci})")
        .mkString("(", " | ", ")")
    }.mkString("(", " | ", ")")
    df.withColumn(zCol, expr(z))
  }

  /** Write `df` z-ordered on (xCol, yCol) into `nFiles` parquet files:
    * range-repartition on the z-value (contiguous z-ranges per file —
    * the property the manifest exploits), sort within partitions, drop
    * the helper column at write. One shuffle; the sort is per-partition,
    * never global. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles=$nFiles")
    zvalue(df, xCol, yCol, zCol = "__z")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max manifest of `cols` over a parquet directory:
    * (file, <c>_min, <c>_max …), one row per physical file — the
    * data-skipping index. Built by one scan+aggregate here; a table
    * format maintains the same rows incrementally in its log. */
  def skippingManifest(spark: SparkSession, path: String,
                       cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Data-skipping read: list the files whose [min, max] envelope
    * overlaps every requested closed range, read ONLY those, then apply
    * the exact predicate. Returns (pruned reader, files read, files
    * total). The file list is manifest-sized (one row per file — driver
    * metadata by contract, like a table format's log scan); correctness
    * does not depend on the layout — a file wrongly absent from the
    * manifest is impossible because the manifest enumerates the
    * directory, and the envelope test can only FALSE-POSITIVE (read a
    * file with no matching rows), never skip a matching one. */
  def pruneRead(spark: SparkSession, path: String,
                ranges: Seq[(String, Long, Long)]): (DataFrame, Int, Int) = {
    val man = skippingManifest(spark, path, ranges.map(_._1)).cache()
    val total = man.count().toInt
    val keep = ranges.foldLeft(man) { case (m, (c, lo, hi)) =>
      m.where(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
    }
    val files = keep.select(col("file")).collect().map(_.getString(0))
    man.unpersist()
    val exact = ranges.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi }.reduce(_ && _)
    val df =
      if (files.isEmpty)
        spark.read.parquet(path).where(exact).where(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*).where(exact)
    (df, files.length, total)
  }
}
