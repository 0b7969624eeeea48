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

  test("HLL sketch roll-up is BIT-exact vs a direct pass (materialized-view path)") {
    val s = spark
    val ev = Tables.events(s, sf0001)
      .withColumn("day", (col("ts").cast("long") / 86400L).cast("long"))
      .withColumn("week", (col("day") / 7L).cast("long"))
    // rolled-up: daily sketches merged per week
    val rolled = ev.groupBy(col("day"), col("week"))
      .agg(Sketches.hllSketch(xxhash64(col("user_id"))).as("sk"))
      .groupBy(col("week"))
      .agg(Sketches.hllMergeEstimate(col("sk")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // direct: one pass over raw events per week
    val direct = ev.groupBy(col("week"))
      .agg(Sketches.hll(xxhash64(col("user_id"))).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rolled == direct && rolled.nonEmpty,
      "register-max roll-up diverged from the direct sketch")
    // and the estimates are sane vs exact
    val exact = ev.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rolled.foreach { case (w, est) =>
      assert(math.abs(est - exact(w)).toDouble / exact(w) <= 0.05, s"week $w")
    }
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

  private def collectCms(df: org.apache.spark.sql.DataFrame,
                         depth: Int = 4, width: Int = 1024): Sketches.Cms = {
    val r = df.select(Sketches.countMin(col("token"), depth, width).as("c"))
      .select(col("c.depth"), col("c.width"), col("c.table"), col("c.n"))
      .head()
    Sketches.Cms(r.getInt(0), r.getInt(1), r.getSeq[Long](2), r.getLong(3))
  }

  test("Count-Min never undercounts and stays within the ε·n bound") {
    val s = spark
    import s.implicits._
    val toks = Tables.documents(s, sf0001)
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
        .as("token"))
    val cms = collectCms(toks)
    val exact = toks.groupBy(col("token")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(cms.n == n, s"sketch total ${cms.n} != $n")
    // guarantee half: estimate >= true for EVERY token
    exact.foreach { case (t, c) =>
      assert(cms.estimate(t) >= c, s"undercount for '$t': ${cms.estimate(t)} < $c")
    }
    // error half: e·n/width bound holds for the vast majority (it is a
    // probabilistic bound per query; depth 4 makes a violation rare)
    val bound = math.ceil(math.E * n / cms.width).toLong
    val violations = exact.count { case (t, c) => cms.estimate(t) - c > bound }
    assert(violations <= math.max(1, exact.size / 100),
      s"$violations of ${exact.size} tokens exceed the ε·n bound $bound")
  }

  test("Count-Min merge is order-independent and additive") {
    val s = spark
    import s.implicits._
    val toks = Tables.documents(s, sf0001)
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
        .as("token"))
    val one = collectCms(toks.repartition(1))
    val many = collectCms(toks.repartition(11))
    assert(one == many, "repartitioning changed the CMS")
    // additivity: sketch(A ⊎ B) = sketch(A) + sketch(B) cell-wise
    val a = collectCms(toks.where(expr("length(token) <= 4")))
    val b = collectCms(toks.where(expr("length(token) > 4")))
    val sum = a.table.zip(b.table).map { case (x, y) => x + y }
    assert(sum == one.table && a.n + b.n == one.n,
      "partition sketches must sum to the full sketch")
  }

  test("theta/KMV: exact below k, bit-deterministic under repartitioning") {
    val s = spark
    import s.implicits._
    val small = (1L to 500L).toDF("v").select(xxhash64(col("v")).as("h"))
    val sk = small.agg(Sketches.thetaSketch(col("h"), k = 1024).as("sk"))
      .as[Array[Long]].head()
    assert(sk.length === 500)
    assert(Sketches.Theta.estimate(sk, 1024) === 500.0)
    // pure function of the SET: partitioning must not change a single bit
    val sk11 = small.repartition(11)
      .agg(Sketches.thetaSketch(col("h"), k = 1024).as("sk"))
      .as[Array[Long]].head()
    assert(sk.toSeq === sk11.toSeq)
  }

  test("theta/KMV: estimate within 10% at 20x capacity; union law exact") {
    val s = spark
    import s.implicits._
    def sketch(lo: Long, hi: Long) = s.range(lo, hi)
      .select(xxhash64(col("id")).as("h"))
      .agg(Sketches.thetaSketch(col("h"), k = 1024).as("sk"))
      .as[Array[Long]].head()
    val a = sketch(0L, 20000L)
    assert(math.abs(Sketches.Theta.estimate(a, 1024) - 20000) / 20000.0
      <= 0.10)
    // union(sk(A), sk(B)) must equal sk(A ∪ B) exactly — KMV is a pure
    // function of the set, so the law holds bitwise, not just in estimate
    val b = sketch(15000L, 35000L)
    val ab = sketch(0L, 35000L)
    assert(Sketches.Theta.union(a, b, 1024).toSeq === ab.toSeq)
  }

  test("theta/KMV: intersection estimate tracks the true overlap") {
    val s = spark
    import s.implicits._
    def sketch(lo: Long, hi: Long) = s.range(lo, hi)
      .select(xxhash64(col("id")).as("h"))
      .agg(Sketches.thetaSketch(col("h"), k = 1024).as("sk"))
      .as[Array[Long]].head()
    val a = sketch(0L, 20000L)
    val b = sketch(10000L, 30000L) // true overlap 10000
    val est = Sketches.Theta.intersectEstimate(a, b, 1024)
    assert(math.abs(est - 10000) / 10000.0 <= 0.20, s"est=$est")
    // disjoint sets estimate ~zero
    val c = sketch(100000L, 120000L)
    assert(Sketches.Theta.intersectEstimate(a, c, 1024) / 20000.0 <= 0.01)
  }

  // deterministic shuffle of 0..n-1 by mix64 sort key — no RNG in specs
  private def shuffled(n: Int): Array[Double] =
    (0 until n).sortBy(i => Sketches.mix64(i.toLong + 7L)).map(_.toDouble).toArray

  test("t-digest: rank error ≤ 2% on a 10k uniform stream, all quantiles") {
    val agg = new Sketches.TDigestAggregator(delta = 100)
    val n = 10000
    var buf = agg.zero
    shuffled(n).foreach(v => buf = agg.reduce(buf, v))
    val sk = agg.finish(buf)
    // values ARE their own ranks (0..9999), so est value ≈ est rank
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = Sketches.tdigestQuantiles(sk, Seq(q)).head
      val err = math.abs(est - q * (n - 1)) / n
      assert(err <= 0.02, s"q=$q est=$est rank-err=$err")
    }
  }

  test("t-digest: tails tighter than the middle (k1 scale property)") {
    val agg = new Sketches.TDigestAggregator(delta = 100)
    val n = 10000
    var buf = agg.zero
    shuffled(n).foreach(v => buf = agg.reduce(buf, v))
    val sk = agg.finish(buf)
    def rankErr(q: Double) =
      math.abs(Sketches.tdigestQuantiles(sk, Seq(q)).head - q * (n - 1)) / n
    assert(rankErr(0.001) <= 0.005 && rankErr(0.999) <= 0.005,
      s"tail errors ${rankErr(0.001)} / ${rankErr(0.999)}")
  }

  test("t-digest: merge of chunk sketches stays within the rank bound") {
    val agg = new Sketches.TDigestAggregator(delta = 100)
    val n = 10000
    val data = shuffled(n)
    val chunks = data.grouped(2500).toArray.map { c =>
      var b = agg.zero
      c.foreach(v => b = agg.reduce(b, v))
      b
    }
    // two different merge trees
    val left = agg.finish(chunks.reduceLeft(agg.merge))
    val pairA = agg.merge(chunks(0), chunks(1))
    val pairB = agg.merge(chunks(2), chunks(3))
    val tree = agg.finish(agg.merge(pairA, pairB))
    for (sk <- Seq(left, tree); q <- Seq(0.05, 0.5, 0.95)) {
      val err = math.abs(Sketches.tdigestQuantiles(sk, Seq(q)).head
        - q * (n - 1)) / n
      assert(err <= 0.02, s"merged q=$q err=$err")
    }
    // total weight is conserved exactly through any merge tree
    val (_, w) = Sketches.TDigest.unpack(left)
    assert(w.sum === n.toDouble)
  }

  test("t-digest: distributed estimate brackets the exact percentile rank") {
    val s = spark
    import s.implicits._
    val li = Tables.lineitem(s, sf001).select(col("l_extendedprice"))
    val n = li.count().toDouble
    val sk = li.agg(Sketches.tdigest(col("l_extendedprice")).as("sk"))
      .as[Array[Byte]].head()
    for (q <- Seq(0.5, 0.95)) {
      val est = Sketches.tdigestQuantiles(sk, Seq(q)).head
      val rank = li.where(col("l_extendedprice") <= est).count() / n
      assert(math.abs(rank - q) <= 0.03,
        s"q=$q est=$est achieved-rank=$rank")
    }
  }
}
