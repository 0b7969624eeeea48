package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Geo operators: haversine sanity, grid-join losslessness vs brute force
  * (the 3×3-neighborhood completeness claim), and k-NN shape.
  */
class GeoSpec extends SparkSpec {

  private def points(n: Int) = spark.range(1, n + 1).select(
    col("id"),
    (col("id") * 7919 % 2000 / lit(100.0) - 10.0).as("lat"),
    (col("id") * 104729 % 6000 / lit(100.0) - 30.0).as("lon"))

  test("haversine: London-Paris ≈ 343.5 km, zero distance to self") {
    val df = spark.sql(
      "SELECT 51.5074d AS la1, -0.1278d AS lo1, 48.8566d AS la2, 2.3522d AS lo2")
    val d = df.select(Geo.haversineKm(col("la1"), col("lo1"),
      col("la2"), col("lo2")).as("d")).head().getDouble(0)
    assert(d > 343.0 && d < 344.5, s"got $d")
    val z = df.select(Geo.haversineKm(col("la1"), col("lo1"),
      col("la1"), col("lo1")).as("d")).head().getDouble(0)
    assert(z === 0.0)
  }

  test("radiusJoin finds exactly the brute-force pair set (grid lossless)") {
    val p = points(500).cache()
    val grid = Geo.radiusJoin(p, 10.0)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = p.as("a").crossJoin(p.as("b"))
      .where(col("a.id") < col("b.id"))
      .where(Geo.haversineKm(col("a.lat"), col("a.lon"),
        col("b.lat"), col("b.lon")) <= 10.0)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid === brute)
    assert(brute.nonEmpty, "fixture should produce at least one close pair")
  }

  test("radiusJoin rejects radii beyond the 1-degree grid's guarantee") {
    intercept[IllegalArgumentException] {
      Geo.radiusJoin(points(10), 100.0)
    }
  }

  test("knnJoin: symmetric candidates, rank bounds, radius respected") {
    val out = Geo.knnJoin(points(500), radiusKm = 10.0, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.forall(_._4 <= 10.0))
    out.groupBy(_._1).foreach { case (id, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks === (1 to rows.length), s"point $id")
      assert(rows.length <= 3, s"point $id")
      val ds = rows.sortBy(_._2).map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, s"point $id")
    }
    // rank-1 neighbor relation uses the same distance in both directions
    val dist = out.map(r => (r._1, r._3) -> r._4).toMap
    dist.foreach { case ((a, b), d) =>
      dist.get((b, a)).foreach(d2 => assert(d2 === d))
    }
  }

  test("radiusJoin pairs points straddling the antimeridian (lon cell wrap)") {
    // 1 & 2 are ~15 km apart across the ±180 seam; 3 is far away
    val p = spark.createDataFrame(Seq(
      (1L, 10.0, 179.93), (2L, 10.0, -179.93), (3L, 10.0, 0.0)))
      .toDF("id", "lat", "lon")
    val got = Geo.radiusJoin(p, 20.0).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("radiusJoin fails LOUDLY on latitudes outside the declared band") {
    val p = spark.createDataFrame(Seq((1L, 75.0, 0.0), (2L, 75.0, 0.1)))
      .toDF("id", "lat", "lon")
    val e = intercept[Exception] { Geo.radiusJoin(p, 10.0).collect() }
    // a bad point with NO candidate pair must still trip the assert (the
    // check rides the cell computation, not the matched-pair projection)
    val lone = spark.createDataFrame(
      Seq((1L, 75.0, 0.0), (2L, 5.0, 120.0), (3L, 5.01, 120.0)))
      .toDF("id", "lat", "lon")
    intercept[Exception] { Geo.radiusJoin(lone, 10.0).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("latitude outside")), e.toString)
    // same points pass once the band is widened (radius bound shrinks)
    val ok = Geo.radiusJoin(p, 10.0, maxAbsLatDeg = 80.0).collect()
    assert(ok.length === 1) // ~3 km apart at lat 75
  }

  test("salted radiusJoin/knnJoin ≡ unsalted on uniform and hot-cell data") {
    val uniform = points(400).cache()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(pairs(Geo.radiusJoin(uniform, 10.0, saltCells = 4)) ===
      pairs(Geo.radiusJoin(uniform, 10.0)))
    // hot cell: 300 of 350 points packed into ONE 1-degree cell
    val hot = spark.range(1, 351).select(col("id"),
      (when(col("id") <= 300, lit(0.0)).otherwise(col("id") % 50))
        .cast("double").as("lat") + col("id") % 90 / lit(10000.0),
      (when(col("id") <= 300, lit(0.0)).otherwise(col("id") % 60))
        .cast("double").as("lon") + col("id") % 70 / lit(10000.0))
      .toDF("id", "lat", "lon").cache()
    assert(pairs(Geo.radiusJoin(hot, 10.0, saltCells = 8)) ===
      pairs(Geo.radiusJoin(hot, 10.0)))
    assert(pairs(Geo.knnJoin(hot, 10.0, 3, saltCells = 8)) ===
      pairs(Geo.knnJoin(hot, 10.0, 3)))
    // the salted plan keys the join on (cla, clo, shard): the hot cell's
    // home rows really spread across >1 shard
    val shards = Geo.radiusJoin(hot, 10.0, saltCells = 8)
    assert(shards.queryExecution.analyzed.toString.contains("shard"))
  }

  test("knnToProbes: k rows per probe, ranks 1..k, distances nondecreasing") {
    val probes = spark.range(0, 4).select(
      col("id").cast("int").as("probe_id"),
      (col("id") * 37 % 20 - 10 + lit(0.5)).cast("double").as("plat"),
      (col("id") * 73 % 60 - 30 + lit(0.5)).cast("double").as("plon"))
    val out = Geo.knnToProbes(points(300), probes, k = 5).collect()
    assert(out.length === 20)
    out.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq === (1 to 5))
      val ds = byRank.map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }
}
