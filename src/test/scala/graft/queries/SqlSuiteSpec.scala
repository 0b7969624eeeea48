package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** SQL-text suite invariants. Value correctness is the driver's hash gate
  * (the SQL text IS the oracle, shared verbatim); these pin the properties
  * that make that gate trustworthy plus the plan shapes the suite exists to
  * exercise.
  */
class SqlSuiteSpec extends SparkSpec {

  test("oracle and query maps share the exact same text") {
    assert(SqlSuiteQueries.oracle eq SqlSuiteQueries.sqlTexts)
    assert(SqlSuiteQueries.queries.keySet == SqlSuiteQueries.sqlTexts.keySet)
  }

  test("every entry is deterministic: total ORDER BY or single-row agg") {
    for ((name, sql) <- SqlSuiteQueries.sqlTexts) {
      val singleRow = Seq("q_sql_h06", "q_sql_h14", "q_sql_h17", "q_sql_h19")
      assert(sql.contains("ORDER BY") || singleRow.contains(name),
        s"$name has no ORDER BY and is not a declared single-row aggregate")
    }
  }

  test("shared-dialect rules: no raw timestamp compares, no INTERVAL") {
    for ((name, sql) <- SqlSuiteQueries.sqlTexts) {
      assert(!sql.toUpperCase.contains("INTERVAL"),
        s"$name uses INTERVAL (date+int days is the shared idiom)")
      // every l_shipdate / o_orderdate reference is wrapped in CAST(AS DATE)
      // except the l3.l_shipdate > l1.l_shipdate self-compare in h21 (same
      // column both sides — timezone-free by construction)
      if (name != "q_sql_h21")
        for (c <- Seq("l_shipdate", "o_orderdate")) {
          val raw = sql.split(java.util.regex.Pattern.quote(s"CAST($c AS DATE)"))
            .mkString("")
          // GROUP BY / alias positions may re-mention the column; only
          // comparison operators adjacent to a raw timestamp are drift risk
          for (op <- Seq(s"$c >", s"$c <", s"$c ="))
            assert(!raw.contains(op), s"$name compares raw timestamp: $op")
        }
    }
  }

  test("all entries execute on sf0.001 (parse + plan under Spark)") {
    for ((name, q) <- SqlSuiteQueries.queries) {
      val n = q(spark, sf0001).count()
      assert(n >= 0, s"$name failed to execute")
    }
  }

  test("h05 snowflake broadcasts every dimension (no dim shuffles)") {
    val df = SqlSuiteQueries.queries("q_sql_h05")(spark, sf001)
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    // customer/supplier/nation/region are all dim-sized: every join below
    // the lineitem probe side must be a broadcast, never a sort-merge
    assert(s.contains("BroadcastHashJoin"), "expected broadcast dims")
  }

  test("h01 date filter reaches the parquet scan") {
    val df = SqlSuiteQueries.queries("q_sql_h01")(spark, sf001)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
           scan.contains("PushedFilters: [LessThanOrEqual(l_shipdate") ||
           scan.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate predicate not pushed:\n${scan.take(2000)}")
  }
}
