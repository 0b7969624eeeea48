package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on a skewed key") {
    val s = spark
    import s.implicits._
    // 90% of rows share one key — the Undetermined shape
    val rows = (1 to 9000).map(i => ("hot", i.toDouble)) ++
               (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
           min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAgg(df, "k", salts = 16,
        Skew.count2("n"), Skew.sum2(col("v"), "s"),
        Skew.min2(col("v"), "mn"), Skew.max2(col("v"), "mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    for (k <- direct.keys) {
      val (dn, ds, dmn, dmx) = direct(k); val (sn, ss, smn, smx) = salted(k)
      assert(dn == sn && dmn == smn && dmx == smx, s"$k")
      assert(math.abs(ds - ss) < 1e-6, s"$k sum") // fp order differs
    }
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val s = spark
    import s.implicits._
    // one hot key carrying ~90% of bytes — the Undetermined-demux shape at
    // 100 TB; thresholds forced down so the toy fixture trips the same
    // OptimizeSkewedJoin path a real cluster run would. Parquet-backed:
    // AQE skips pure local-relation plans (same trap as optimizer-rule
    // tests), and the skew split is only legal when no parent requires the
    // join's hash partitioning — hence the global aggregate on top.
    val dir = java.nio.file.Files.createTempDirectory("graft_skewj").toString
    ((1 to 40000).map(i => ("hot", s"payload_payload_payload_$i")) ++
     (1 to 4000).map(i => (s"k${i % 100}", s"p$i")))
      .toDF("k", "v").write.mode("overwrite").parquet(s"$dir/left")
    ((1 to 50).map(i => ("hot", i)) ++
     (1 to 100).map(i => (s"k${i % 100}", i)))
      .toDF("k", "w").write.mode("overwrite").parquet(s"$dir/right")
    val left = s.read.parquet(s"$dir/left")
    val right = s.read.parquet(s"$dir/right")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // aggregate over v so column pruning can't drop the payload (the
      // shuffled bytes ARE the skew being tested)
      val j = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("v"))).as("b"))
      assert(j.collect().head.getLong(0) == 40000L * 50 + 4000)
      val finalPlan = j.queryExecution.executedPlan.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
      }.getOrElse(j.queryExecution.executedPlan.toString)
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val s = spark
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-bcast
    try {
      Tables.orders(s, sf0001)
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/t_orders").saveAsTable("t_orders_b")
      Tables.customer(s, sf0001)
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/t_cust").saveAsTable("t_cust_b")
      val j = s.table("t_orders_b")
        .join(s.table("t_cust_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must need no shuffle: the only exchange allowed is
      // the one feeding the final groupBy
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning(o_custkey") &&
             !joinPart.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.collect().nonEmpty)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS t_orders_b")
      s.sql("DROP TABLE IF EXISTS t_cust_b")
    }
  }

  test("saltedJoin spreads EXACT-DUPLICATE hot rows across salts") {
    val s = spark
    import s.implicits._
    // the worst skew shape: one hot key whose fact rows are IDENTICAL —
    // a content-derived salt would put them all in one shard
    val fact = Seq.fill(2000)(("hot", 1)).toDF("k", "v")
    val dim = Seq(("hot", "d1"), ("cold", "d2")).toDF("k", "d")
    val joined = Skew.saltedJoin(fact, dim, "k", salts = 8)
    assert(joined.count() === 2000L)
    // observe the salt distribution through the same derivation
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
      .groupBy(col("__salt")).count().collect()
    assert(spread.length > 1, "identical rows must spread over >1 salt")
  }

  test("saltedAgg rejects an empty aggregate list loudly") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", 1)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] { Skew.saltedAgg(df, "k", 4) }
    assert(e.getMessage.contains("aggregate"), e.getMessage)
  }

  test("saltedJoin equals the plain join and spreads a hot key") {
    val s = spark
    import s.implicits._
    // hot key 1 dominates the fact side
    val fact = ((1 to 500).map(i => (1L, i.toLong)) ++
      (1 to 20).map(i => (2L, i.toLong))).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "absent"))
      .toDF("k", "label")
    val plain = fact.join(dim, "k")
      .groupBy("label").count().as[(String, Long)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .groupBy("label").count().as[(String, Long)].collect().toSet
    assert(salted == plain, s"salted=$salted plain=$plain")
    // the hot key's fact rows actually use more than one salt value
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(col("k"), col("v")), lit(8)).cast("int"))
      .where(col("k") === 1L).select("__salt").distinct().count()
    assert(spread > 1, "hot key landed on a single salt")
  }
}
