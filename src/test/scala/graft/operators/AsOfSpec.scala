package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The carry-forward as-of join must agree with the range-join+rank-1
  * formulation everywhere, including ties and unmatched rows. */
class AsOfSpec extends SparkSpec {

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

  test("carry-forward equals range-join on the events table") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val sg = ev.where(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    val a = collectPairs(AsOf.viaCarryForward(p, sg, "user_id", "ts", "event_id", "event_id"))
    val b = collectPairs(AsOf.viaRangeJoin(p, sg, "user_id", "ts", "event_id", "event_id"))
    assert(a == b, s"diff: ${(a -- b).take(5)} / ${(b -- a).take(5)}")
    assert(a.nonEmpty)
  }

  test("ties at equal timestamp pick the highest right id; no-match is null") {
    val s = spark
    import s.implicits._
    // key 1: right rows at t=10 (ids 100, 101) and t=5 (id 99); left at t=10
    //   → must pick 101 (equal-ts visible, highest id)
    // key 2: left at t=3, no right ≤ 3 → null
    val left = Seq((1L, 1L, 10L), (2L, 2L, 3L)).toDF("event_id", "user_id", "tsl")
      .select(col("event_id"), col("user_id"), timestamp_seconds(col("tsl")).as("ts"))
    val right = Seq((99L, 1L, 5L), (100L, 1L, 10L), (101L, 1L, 10L),
                    (200L, 2L, 50L)).toDF("event_id", "user_id", "tsr")
      .select(col("event_id"), col("user_id"), timestamp_seconds(col("tsr")).as("ts"))
    val cf = collectPairs(AsOf.viaCarryForward(left, right, "user_id", "ts", "event_id", "event_id"))
    val rj = collectPairs(AsOf.viaRangeJoin(left, right, "user_id", "ts", "event_id", "event_id"))
    assert(cf == Set((1L, 101L), (2L, -1L)))
    assert(cf == rj)
  }

  test("tolerance bounds the lookback identically in both formulations") {
    val s = spark
    import s.implicits._
    // key 1: left at t=100 — latest right at t=40 is stale under tol=30
    //        but in range under tol=90; right at t=95 within both
    val left = Seq((1L, 1L, 100L), (2L, 2L, 100L)).toDF("event_id", "user_id", "tsl")
      .select(col("event_id"), col("user_id"), timestamp_seconds(col("tsl")).as("ts"))
    val right = Seq((90L, 1L, 95L), (91L, 1L, 40L), (200L, 2L, 40L))
      .toDF("event_id", "user_id", "tsr")
      .select(col("event_id"), col("user_id"), timestamp_seconds(col("tsr")).as("ts"))
    def run(tol: Long): (Set[(Long, Long)], Set[(Long, Long)]) = {
      val t = Some(expr(s"INTERVAL $tol SECONDS"))
      (collectPairs(AsOf.viaCarryForward(left, right, "user_id", "ts",
          "event_id", "event_id", t)),
       collectPairs(AsOf.viaRangeJoin(left, right, "user_id", "ts",
          "event_id", "event_id", t)))
    }
    val (cf30, rj30) = run(30)
    assert(cf30 == Set((1L, 90L), (2L, -1L)), s"tol=30: $cf30") // 200 stale
    assert(cf30 == rj30)
    val (cf90, rj90) = run(90)
    assert(cf90 == Set((1L, 90L), (2L, 200L)), s"tol=90: $cf90")
    assert(cf90 == rj90)
  }

  test("carry-forward plans one shuffle, no join") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val sg = ev.where(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    val plan = AsOf.viaCarryForward(p, sg, "user_id", "ts", "event_id", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"carry-forward must not join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one shuffle:\n$plan")
  }
}
