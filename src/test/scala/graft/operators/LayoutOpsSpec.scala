package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  /** Local reference: 16-bit scale + Morton interleave, plain Scala. */
  private def localZ(x: Long, y: Long,
                     xMin: Long, xMax: Long, yMin: Long, yMax: Long): Long = {
    def sc(v: Long, mn: Long, mx: Long): Long =
      if (mx > mn) (v - mn) * 65535L / (mx - mn) else 0L
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(sc(x, xMin, xMax)) | (spread(sc(y, yMin, yMax)) << 1)
  }

  test("zvalue matches the local bit-interleave recompute, incl. bounds") {
    val rows = for (x <- Seq(0L, 1L, 7L, 99L, 100L); y <- Seq(3L, 50L, 1000L))
      yield (x, y)
    val df = rows.toDF("x", "y")
    val got = LayoutOps.zvalue(df, "x", "y").as[(Long, Long, Long)]
      .collect().toSeq
    got.foreach { case (x, y, z) =>
      assert(z == localZ(x, y, 0L, 100L, 3L, 1000L), s"($x,$y)")
    }
    // interleave structure: max scaled coords -> all 32 low bits set
    assert(localZ(100, 1000, 0, 100, 3, 1000) == 0xFFFFFFFFL)
    // known bounds skip the stats pass and override measured ones
    val kb = LayoutOps.zvalue(df, "x", "y",
        knownBounds = Some((0L, 200L, 0L, 2000L)))
      .as[(Long, Long, Long)].collect()
    kb.foreach { case (x, y, z) =>
      assert(z == localZ(x, y, 0L, 200L, 0L, 2000L), s"kb ($x,$y)")
    }
  }

  test("zvalue: ranges past 2^47 use the divide-first regime — no wrap") {
    // x spans ~2^62 (epoch-nanos-scale): the multiply-first form
    // (x-min)*65535 would wrap LONG and scramble the layout ordering
    val big = 1L << 62
    val xs = Seq(0L, big / 4, big / 2, (big / 4) * 3, big)
    val df = (for (x <- xs; y <- Seq(0L, 10L)) yield (x, y)).toDF("x", "y")
    val got = LayoutOps.zvalue(df, "x", "y").as[(Long, Long, Long)]
      .collect().toSeq
    got.foreach { case (_, _, z) =>
      assert(z >= 0 && z <= 0xFFFFFFFFL, s"z=$z outside 32-bit interleave")
    }
    // fixing y, z must be monotone in x (wrap would break the ordering)
    for (yv <- Seq(0L, 10L)) {
      val zs = got.filter(_._2 == yv).sortBy(_._1).map(_._3)
      assert(zs == zs.sorted, s"z not monotone in x at y=$yv: $zs")
      assert(zs.distinct.size == zs.size, s"wide-range x collapsed: $zs")
    }
  }

  /** Local reference k-way interleave at 16 bits per column. */
  private def localZK(vals: Seq[Long], bounds: Seq[(Long, Long)]): Long = {
    val k = vals.size
    var z = 0L
    for (c <- 0 until k) {
      val (mn, mx) = bounds(c)
      val s = if (mx > mn) (vals(c) - mn) * 65535L / (mx - mn) else 0L
      for (j <- 0 until math.min(16, 64 / k))
        z |= ((s >> j) & 1L) << (j * k + c)
    }
    z
  }

  test("zvalueK: k=2 generic path bit-identical to the magic-mask zvalue; k=3 matches local") {
    val rows = for (x <- Seq(0L, 7L, 100L); y <- Seq(3L, 1000L); w <- Seq(1L, 50L))
      yield (x, y, w)
    val df = rows.toDF("x", "y", "w")
    val b2 = Some(Seq((0L, 100L), (3L, 1000L)))
    val generic = LayoutOps.zvalueK(df, Seq("x", "y"), knownBounds = b2)
      .select("x", "y", "z").as[(Long, Long, Long)].collect().toSet
    val magic = LayoutOps.zvalue(df, "x", "y",
        knownBounds = Some((0L, 100L, 3L, 1000L)))
      .select("x", "y", "z").as[(Long, Long, Long)].collect().toSet
    assert(generic == magic, "generic k=2 diverges from the magic-mask ladder")
    val b3 = Seq((0L, 100L), (3L, 1000L), (1L, 50L))
    val z3 = LayoutOps.zvalueK(df, Seq("x", "y", "w"),
        knownBounds = Some(b3))
      .as[(Long, Long, Long, Long)].collect()
    z3.foreach { case (x, y, w, z) =>
      assert(z == localZK(Seq(x, y, w), b3), s"($x,$y,$w)")
    }
  }

  test("3-way z-order prunes a box on the THIRD dimension") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder3").toString
    val orders = graft.core.Tables.orders(spark, sf001)
      .select(col("o_orderkey"),
        col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"),
        col("o_totalprice").cast("long").as("price"))
    LayoutOps.zvalueK(orders, Seq("ck", "day", "price"), zCol = "__z")
      .repartitionByRange(64, col("__z")).sortWithinPartitions(col("__z"))
      .drop("__z").write.mode("overwrite").parquet(dir)
    val b = orders.agg(min(col("price")), max(col("price"))).collect()(0)
    val (pLo, pHi) = (b.getLong(0), b.getLong(1))
    val lo = pLo + (pHi - pLo) * 45 / 100
    val hi = pLo + (pHi - pLo) * 55 / 100
    val want = orders.where(col("price").between(lo, hi))
      .select("o_orderkey").as[Long].collect().toSet
    assert(want.nonEmpty)
    val (df, nRead, nTotal) =
      LayoutOps.pruneRead(spark, dir, Seq(("price", lo, hi)))
    assert(df.select("o_orderkey").as[Long].collect().toSet == want)
    assert(nTotal == 64 && nRead < 40,
      s"3-way z-order read $nRead/64 files for a 10% price box")
  }

  test("zorderWrite + pruneRead: exact rows, real file skipping on BOTH dims") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val orders = graft.core.Tables.orders(spark, sf001)
      .select(col("o_orderkey"),
        col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
    val zPath = s"$dir/z"
    val linPath = s"$dir/lin"
    LayoutOps.zorderWrite(orders, "ck", "day", zPath, nFiles = 64)
    // linear comparison layout: same file count, sorted by ck only
    orders.repartitionByRange(64, col("ck")).sortWithinPartitions(col("ck"))
      .write.mode("overwrite").parquet(linPath)

    val b = orders.agg(min(col("ck")), max(col("ck")),
      min(col("day")), max(col("day"))).collect()(0)
    val (ckLo, ckHi) = (b.getLong(0), b.getLong(1))
    val (dayLo, dayHi) = (b.getLong(2), b.getLong(3))
    // a ~10%-selective box on the NON-leading dimension (day)
    val dLo = dayLo + (dayHi - dayLo) * 45 / 100
    val dHi = dayLo + (dayHi - dayLo) * 55 / 100
    val dayRange = Seq(("day", dLo, dHi))

    val want = orders.where(col("day").between(dLo, dHi))
      .select("o_orderkey").as[Long].collect().toSet
    assert(want.nonEmpty, "vacuous box — widen the range")

    val (zDf, zRead, zTotal) = LayoutOps.pruneRead(spark, zPath, dayRange)
    assert(zDf.select("o_orderkey").as[Long].collect().toSet == want,
      "pruned read lost or invented rows")
    // z-layout skips files on the non-leading dimension…
    assert(zTotal == 64)
    assert(zRead <= zTotal / 3,
      s"z-order read $zRead/$zTotal files for a 10% day box")
    // …which the ck-linear layout cannot (every file spans ~all days)
    val (linDf, linRead, _) = LayoutOps.pruneRead(spark, linPath, dayRange)
    assert(linDf.select("o_orderkey").as[Long].collect().toSet == want)
    assert(linRead > zRead,
      s"linear layout read $linRead files, z-order $zRead — no win")

    // the leading dimension prunes in BOTH layouts
    val cLo = ckLo + (ckHi - ckLo) * 45 / 100
    val cHi = ckLo + (ckHi - ckLo) * 55 / 100
    val (zc, zcRead, _) = LayoutOps.pruneRead(spark, zPath, Seq(("ck", cLo, cHi)))
    val wantC = orders.where(col("ck").between(cLo, cHi))
      .select("o_orderkey").as[Long].collect().toSet
    assert(zc.select("o_orderkey").as[Long].collect().toSet == wantC)
    // x interleaves at the EVEN (less significant) bits, so the curve's
    // major order follows y and an x-slab is more scattered than a
    // y-slab — plus ck repeats across orders. Still strictly sub-half.
    assert(zcRead < 32, s"z-order read $zcRead/64 for a 10% ck box")

    // a box fully outside the data prunes to ZERO files and zero rows
    val (none, noneRead, _) =
      LayoutOps.pruneRead(spark, zPath, Seq(("day", dayHi + 10, dayHi + 20)))
    assert(noneRead == 0 && none.count() == 0)
  }
}
