package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Bucketed-layout + dynamic-partition-pruning plan proofs: the whole
  * point of these operators is the SHAPE of the plan at scale, so the
  * shape is what the spec pins. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables sort-merge join with zero Exchange and zero Sort") {
    val s = spark
    val o = Tables.orders(s, sf001).select(col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(s, sf001)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Bucketing.writeBucketed(o, "graft_spec_bo", "o_custkey", 4)
    Bucketing.writeBucketed(c, "graft_spec_bc", "o_custkey", 4)
    val j = Bucketing.bucketedJoin(s, "graft_spec_bo", "graft_spec_bc", "o_custkey")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(!plan.contains("Sort "),
      s"bucket sortBy must make the per-query Sort unnecessary:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"not a bucketed scan:\n$plan")
    // result parity with the plain (shuffling) join
    val want = o.join(c, "o_custkey").count()
    assert(j.count() == want)
    // mismatched bucket counts degrade to correct-but-shuffled, never wrong
    Bucketing.writeBucketed(c, "graft_spec_bc8", "o_custkey", 8)
    val jm = Bucketing.bucketedJoin(s, "graft_spec_bo", "graft_spec_bc8", "o_custkey")
    assert(jm.count() == want)
  }

  test("runtime Bloom filter prunes the fact side before its shuffle") {
    val s = spark
    def li(ss: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(ss, sf001).select(col("l_partkey"), col("l_quantity"))
    def p(ss: org.apache.spark.sql.SparkSession) =
      Tables.part(ss, sf001).where(col("p_type").like("%BRASS%"))
        .select(col("p_partkey").as("l_partkey"), col("p_size"))
    val j = RuntimeFilters.bloomJoin(s, li, p, "l_partkey")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter on the fact scan:\n$plan")
    // Bloom false positives pass through to the exact join: row parity
    val want = li(s).join(p(s), "l_partkey").count()
    assert(j.count() == want)
    // conf isolation: the SHARED session's broadcast threshold untouched
    assert(s.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1",
      "bloomJoin must not leak conf into the shared session")
  }

  test("dynamic partition pruning injects the dim filter into the fact scan") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp_spec").toString
    Tables.orders(s, sf001)
      .select(col("o_orderkey"), col("o_totalprice"),
        (datediff(col("o_orderdate"), lit("1970-01-01")) % 16).as("day"))
      .write.mode("overwrite").partitionBy("day").parquet(tmp)
    val dim = s.range(0, 16).select(col("id").cast("int").as("day"),
      when(col("id") < 3, lit("hot")).otherwise(lit("cold")).as("tier"))
    val joined = s.read.parquet(tmp)
      .join(broadcast(dim.where(col("tier") === "hot")), "day")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$plan")
    // semantics: exactly the hot days' rows
    val want = s.read.parquet(tmp).where(col("day") < 3).count()
    assert(joined.count() == want)
  }
}
