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
}
