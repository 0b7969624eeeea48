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
