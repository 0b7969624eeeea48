package graft.functions

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Property checks for the sketch aggregators (SURVEY §2B ≈ checks). */
class SketchesSpec extends SparkSpec {

  test("HLL estimate within 5% of exact count-distinct on events.user_id") {
    val s = spark
    val ev = Tables.events(s, sf0001)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    val est = ev.select(Sketches.hll(xxhash64(col("user_id"))).as("e"))
      .head().getLong(0)
    val err = math.abs(est - exact).toDouble / exact
    assert(err <= 0.05, s"HLL est=$est exact=$exact err=$err")
  }

  test("approx_percentile lands within GK rank-error of the exact percentile") {
    val s = spark
    val o = Tables.orders(s, sf0001)
    // accuracy 10000 on n rows bounds rank error by n/10000; convert the
    // rank bound to a value bound by reading the sorted values at the
    // allowed rank window
    val vals = o.select(col("o_totalprice")).orderBy(col("o_totalprice"))
      .collect().map(_.getDouble(0))
    val n = vals.length
    val eps = math.max(1, n / 10000)
    for (p <- Seq(0.5, 0.9)) {
      val approx = o.agg(expr(s"approx_percentile(o_totalprice, $p, 10000)"))
        .head().getDouble(0)
      val rank = (p * (n - 1)).toInt
      val (lo, hi) = (vals(math.max(0, rank - eps - 1)),
                      vals(math.min(n - 1, rank + eps + 1)))
      assert(approx >= lo && approx <= hi,
        s"p=$p approx=$approx outside rank window [$lo, $hi]")
    }
  }

  test("HLL merge is order-independent (partial+final equals single-pass)") {
    val s = spark
    val ev = Tables.events(s, sf0001)
    val a = ev.repartition(1)
      .select(Sketches.hll(xxhash64(col("user_id")))).head().getLong(0)
    val b = ev.repartition(13)
      .select(Sketches.hll(xxhash64(col("user_id")))).head().getLong(0)
    assert(a == b, s"repartitioning changed the HLL estimate: $a vs $b")
  }

  test("MinHash signature equality estimates Jaccard within 0.15") {
    // two sets with known overlap: |A∩B|=60, |A∪B|=140 → J≈0.4286
    val a = (0 until 100).map(_.toLong)
    val b = (40 until 180).map(_.toLong)
    val jTrue = 60.0 / 180.0
    val s = spark
    import s.implicits._
    val sigA = a.toDF("v").agg(Sketches.minhash(col("v"), 128).as("sig"))
      .head().getSeq[Long](0)
    val sigB = b.toDF("v").agg(Sketches.minhash(col("v"), 128).as("sig"))
      .head().getSeq[Long](0)
    val est = Sketches.estimateJaccard(sigA, sigB)
    assert(math.abs(est - jTrue) <= 0.15, s"est=$est true=$jTrue")
  }

  test("MinHash merge is order-independent") {
    val s = spark
    import s.implicits._
    val vals = (0 until 500).map(i => Sketches.mix64(i.toLong))
    val one = vals.toDF("v").repartition(1)
      .agg(Sketches.minhash(col("v"), 64)).head().getSeq[Long](0)
    val many = vals.toDF("v").repartition(7)
      .agg(Sketches.minhash(col("v"), 64)).head().getSeq[Long](0)
    assert(one == many)
  }
}
