package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY §2B): hash agg with all core functions,
  * global agg, exact/approx count-distinct, rollup/cube with GROUPING,
  * conditional agg (pivot, R14), HAVING.
  *
  * All grouped aggs compile to partial+final HashAggregate (map-side
  * combine), so the shuffle carries pre-aggregated state — the property
  * that matters at 100 TB. Asserted in PlanSpec.
  */
object AggQueries {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 analogue — the flagship scan→filter→agg→sort pipeline
    "q_agg_q1" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q_agg_global" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(stddev_samp(col("l_quantity")), 2).as("sd_qty"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"))),

    "q_agg_countd" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))),

    // rollup with GROUPING() disambiguation; NULL group keys coalesced so
    // the output is null-free (null sort order differs across engines)
    "q_agg_rollup" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
             grouping(col("n_name")).cast("int").as("g_n"),
             grouping(col("c_mktsegment")).cast("int").as("g_s"))
        .select(
          coalesce(col("n_name"), lit("ALL")).as("nat"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
          col("g_n"), col("g_s"), col("n"))
        .orderBy(col("g_n"), col("g_s"), col("nat"), col("seg"))),

    "q_agg_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             grouping(col("o_orderstatus")).cast("int").as("g_st"),
             grouping(col("o_orderpriority")).cast("int").as("g_pr"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
          col("g_st"), col("g_pr"), col("n"))
        .orderBy(col("g_st"), col("g_pr"), col("st"), col("pr"))),

    // R14's conditional collect / pivot, as count(CASE WHEN)
    "q_agg_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
          count(when(col("event_type") === "error", lit(1))).as("n_error"),
          count(when(col("event_type") === "signup", lit(1))).as("n_signup"))
        .orderBy(col("user_id"))),

    "q_agg_having" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 20)
        .orderBy(col("c_mktsegment"))),

    // approx distinct — no exact oracle (≈ check lives in AggSpec); the
    // catalog entry gets a rows-only driver check
    "q_agg_approxd" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy(col("event_type"))),

    // median / interpolated percentiles (both engines use the linear
    // rank = p*(n-1) definition; floor-rounding per the engine-identical
    // discipline)
    // second-moment statistics: stddev / variance / correlation /
    // covariance. All are single-pass partial+final aggregates (the same
    // distributed-moments shape as avg), 4dp-rounded so engine summation
    // order can't surface in the last ulp.
    "q_agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          (floor(stddev_samp(col("l_quantity")) * 10000 + 0.5) / 10000)
            .as("sd_qty"),
          (floor(var_pop(col("l_quantity")) * 10000 + 0.5) / 10000)
            .as("var_qty"),
          (floor(corr(col("l_quantity"), col("l_extendedprice")) * 10000
            + 0.5) / 10000).as("corr_qp"),
          (floor(covar_samp(col("l_discount"), col("l_tax")) * 1000000
            + 0.5) / 1000000).as("cov_dt"))
        .orderBy(col("l_returnflag"))),

    "q_agg_percentile" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          (floor(expr("median(o_totalprice)") * 100 + 0.5) / 100).as("med"),
          (floor(expr("percentile(o_totalprice, 0.9)") * 100 + 0.5) / 100).as("p90"),
          (floor(expr("percentile(o_totalprice, 0.99)") * 100 + 0.5) / 100).as("p99"))
        .orderBy(col("o_orderstatus"))),

    // approx percentile sketch (GK summaries — the distributed-mergeable
    // twin of q_agg_percentile's exact path; at 100 TB exact percentile
    // means a full sort per group, the sketch is one pass + tiny merges).
    // Rows-only driver check; the rank-error property vs the exact
    // percentile is asserted in SketchesSpec.
    "q_agg_approxpctl" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          (floor(expr("approx_percentile(o_totalprice, 0.5, 10000)") * 100 + 0.5) / 100)
            .as("p50_approx"),
          (floor(expr("approx_percentile(o_totalprice, 0.9, 10000)") * 100 + 0.5) / 100)
            .as("p90_approx"))
        .orderBy(col("o_orderstatus"))),

    // custom typed-Aggregator HLL (graft.functions.Sketches) — the
    // TypedImperativeAggregate-style path with partial+final merge; rows-only
    // driver check, 5%-accuracy property in SketchesSpec
    "q_agg_hll_custom" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(graft.functions.Sketches.hll(xxhash64(col("user_id")))
          .as("hll_users"))
        .orderBy(col("event_type"))),

    // sketch ROLL-UP (materialized-view pattern): daily user sketches
    // re-aggregate to weekly estimates without touching raw events —
    // register-max is associative/idempotent so rollup ≡ direct pass
    // bit-exactly (SketchesSpec). Engine-pinned hash ⇒ rows-only.
    "q_agg_hll_rollup" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .withColumn("day", floor(col("ts").cast("long") / 86400L).cast("long"))
        .groupBy(col("day"))
        .agg(graft.functions.Sketches.hllSketch(xxhash64(col("user_id")))
          .as("sketch"))
      daily
        .withColumn("week", floor(col("day") / 7L).cast("long"))
        .groupBy(col("week"))
        .agg(graft.functions.Sketches.hllMergeEstimate(col("sketch"))
          .as("est_users"))
        .orderBy(col("week"))
    }),

    // theta-sketch ROLL-UP (hll_rollup's set-op twin): daily per-user
    // sketches re-aggregate to weekly distinct estimates without touching
    // raw events — and because the KMV sketch is a pure function of the
    // value set, rollup ≡ direct pass BIT-exactly (union law, pinned in
    // SketchesSpec). Below k the estimate is exact, so the weekly
    // count(DISTINCT) oracle hash-checks the whole persisted-sketch path
    // (k = 4096 > the 1500 weekly actives at sf0.1 — the exact regime;
    // beyond k the same query degrades gracefully to ±1/√k estimates).
    "q_agg_theta_rollup" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .withColumn("day", floor(col("ts").cast("long") / 86400L).cast("long"))
        .groupBy(col("day"))
        .agg(graft.functions.Sketches.thetaSketch(xxhash64(col("user_id")),
          k = 4096).as("sketch"))
      daily
        .withColumn("week", floor(col("day") / 7L).cast("long"))
        .groupBy(col("week"))
        .agg(graft.functions.Sketches.thetaMergeEstimate(col("sketch"),
          k = 4096).as("est_users"))
        .orderBy(col("week"))
    }),

    // deterministic MODE: most frequent brand per part type, ties broken
    // on the brand itself (built-in mode() is tie-arbitrary — unusable
    // cross-engine; the count + rank spelling is total-order exact)
    "q_agg_mode" -> ((s, d) => {
      val counts = Tables.part(s, d)
        .groupBy(col("p_type"), col("p_brand"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_type"))
        .orderBy(col("n").desc, col("p_brand").asc)
      counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("p_type"), col("p_brand").as("mode_brand"), col("n"))
        .orderBy(col("p_type"))
    }),

    // KMV/theta sketch audience overlap: per-type distinct-user sketches,
    // pairwise intersection estimates via the θ rule — the set-operation
    // capability HLL lacks. The sketch is a pure function of the user SET
    // (order/partition independent, bit-deterministic), so the rows-only
    // output is run-stable; SketchesSpec pins exactness below k, the
    // bitwise union law and overlap accuracy. 5×5 sketch pair join is
    // group-count-sized (PlanAudit allowlisted).
    "q_agg_theta" -> ((s, d) => {
      import s.implicits._
      val sks = Tables.events(s, d)
        .select(col("event_type"), xxhash64(col("user_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(graft.functions.Sketches.thetaSketch(col("h")).as("sk"))
      sks.as("a").join(sks.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.sk").as("ska"), col("b.sk").as("skb"))
        .as[(String, String, Array[Long], Array[Long])]
        .map { case (ta, tb, a, b) =>
          import graft.functions.Sketches.Theta
          (ta, tb,
            math.floor(Theta.estimate(a, 1024) * 100 + 0.5) / 100,
            math.floor(Theta.estimate(b, 1024) * 100 + 0.5) / 100,
            math.floor(Theta.intersectEstimate(a, b, 1024) * 100 + 0.5) / 100)
        }
        .toDF("type_a", "type_b", "est_a", "est_b", "est_overlap")
        .orderBy(col("type_a"), col("type_b"))
    }),

    // custom mergeable t-digest (Sketches.TDigestAggregator, k₁ scale):
    // per-group p50/p95 estimates from one associative sketch pass — the
    // shuffle carries ≤2δ centroids per group per map partition, never
    // values. Rows-only (estimates are order-dependent within the proven
    // rank-error bound); SketchesSpec pins exact-order bounds, merge
    // consistency and the distributed-vs-exact envelope. The 5-row
    // post-aggregate quantile readout is a typed Dataset.map (sanctioned
    // UDF-surface path), not a scalar udf.
    "q_agg_tdigest" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.Sketches.tdigest(col("l_extendedprice"))
            .as("sk"),
          count(lit(1)).as("n"))
        .as[(String, Array[Byte], Long)]
        .map { case (f, sk, n) =>
          val qs = graft.functions.Sketches.tdigestQuantiles(sk, Seq(0.5, 0.95))
          (f, n, math.floor(qs(0) * 100 + 0.5) / 100,
            math.floor(qs(1) * 100 + 0.5) / 100)
        }
        .toDF("l_returnflag", "n", "p50_est", "p95_est")
        .orderBy(col("l_returnflag"))
    })
  )

  val oracle: Map[String, String] = Map(
    // the k=4096 sketch is EXACT below capacity (weekly actives ≤1500 at
    // both sf), so plain count(DISTINCT) is a valid hash-exact oracle for
    // the whole persisted-sketch rollup path
    "q_agg_theta_rollup" ->
      """WITH e AS (
           SELECT (datediff('second', TIMESTAMP '1970-01-01 00:00:00',
                            CAST(ts AS TIMESTAMP)) // 86400) // 7 AS week,
                  user_id
           FROM events)
         SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
         FROM e GROUP BY 1 ORDER BY week""",
    "q_agg_mode" ->
      """WITH c AS (
           SELECT p_type, p_brand, count(*) AS n FROM part GROUP BY 1, 2),
         r AS (
           SELECT p_type, p_brand, n,
                  row_number() OVER (PARTITION BY p_type
                                     ORDER BY n DESC, p_brand ASC) AS rn
           FROM c)
         SELECT p_type, p_brand AS mode_brand, CAST(n AS BIGINT) AS n
         FROM r WHERE rn = 1 ORDER BY p_type""",
    "q_agg_q1" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(SUM(l_quantity), 2) AS sum_qty,
                ROUND(SUM(l_extendedprice), 2) AS sum_price,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                ROUND(AVG(l_extendedprice), 2) AS avg_price,
                ROUND(AVG(l_discount), 4) AS avg_disc,
                strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
                strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_global" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                ROUND(SUM(l_extendedprice), 2) AS sum_price,
                ROUND(AVG(l_quantity), 2) AS avg_qty,
                ROUND(STDDEV_SAMP(l_quantity), 2) AS sd_qty,
                MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
         FROM lineitem""",
    "q_agg_countd" ->
      """SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_agg_rollup" ->
      """SELECT COALESCE(n_name, 'ALL') AS nat, COALESCE(c_mktsegment, 'ALL') AS seg,
                CAST(GROUPING(n_name) AS INT) AS g_n,
                CAST(GROUPING(c_mktsegment) AS INT) AS g_s,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP(n_name, c_mktsegment)
         ORDER BY g_n, g_s, nat, seg""",
    "q_agg_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
                COALESCE(o_orderpriority, 'ALL') AS pr,
                CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
                CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY g_st, g_pr, st, pr""",
    "q_agg_stats" ->
      """SELECT l_returnflag,
                floor(stddev_samp(l_quantity) * 10000 + 0.5) / 10000 AS sd_qty,
                floor(var_pop(l_quantity) * 10000 + 0.5) / 10000 AS var_qty,
                floor(corr(l_quantity, l_extendedprice) * 10000 + 0.5) / 10000
                  AS corr_qp,
                floor(covar_samp(l_discount, l_tax) * 1000000 + 0.5) / 1000000
                  AS cov_dt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_percentile" ->
      """SELECT o_orderstatus,
                floor(median(o_totalprice) * 100 + 0.5) / 100 AS med,
                floor(quantile_cont(o_totalprice, 0.9) * 100 + 0.5) / 100 AS p90,
                floor(quantile_cont(o_totalprice, 0.99) * 100 + 0.5) / 100 AS p99
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_agg_pivot" ->
      """SELECT user_id,
                CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
                CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
                CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_agg_having" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
         FROM customer GROUP BY c_mktsegment
         HAVING COUNT(*) > 20 ORDER BY c_mktsegment"""
  )
}
