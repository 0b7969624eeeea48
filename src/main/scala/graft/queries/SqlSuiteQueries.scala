package graft.queries

import graft.core.{Q, Tables}

/** SQL-text front end: a TPC-H-shaped suite where every query is a single
  * ANSI-subset SQL string executed VERBATIM by both `spark.sql(...)` and the
  * DuckDB oracle — the text below IS the oracle (one map, zero duplication),
  * so any dialect drift between the two engines fails the hash gate instead
  * of hiding in a hand-translated twin.
  *
  * This is the main real-user entry point (most users arrive with SQL
  * strings, not DataFrame calls); the suite deliberately walks the surface
  * where dialect drift hides: multi-way joins (h03/h05/h07/h08/h09), EXISTS /
  * NOT EXISTS correlation (h04/h21/h22), IN / NOT IN subqueries
  * (h16/h18/h20), correlated scalar subqueries (h02/h17), scalar subqueries
  * in HAVING (h11) and WHERE (h15/h22), left joins with ON-clause filters
  * (h13/outerchain), GROUPING SETS (gsets), windowed aggregates with ROWS /
  * RANGE frames (winagg), set-op chains (chain), FULL OUTER (full), and the
  * comma-join syntax (h02).
  *
  * Shared-dialect rules (the subset both engines agree on bit-for-bit):
  *  - timestamps observed only through `CAST(x AS DATE)`; date arithmetic is
  *    `date + <int days>` and literal `DATE 'yyyy-mm-dd'` (no INTERVAL, no
  *    engine-specific date_diff);
  *  - every DOUBLE aggregate is pinned with the catalog's
  *    `floor(x * 100 + 0.5) / 100` idiom (ratios at 1e4/1e6) so partial-agg
  *    summation order can't surface ulp drift;
  *  - every integer aggregate is CAST to BIGINT (DuckDB sums INT32/64 into
  *    INT128, Spark into BIGINT — the round-6 lesson);
  *  - EXTRACT results are CAST to INT (BIGINT in DuckDB, INT in Spark);
  *  - every query ends in a total ORDER BY with unique keys (no NULL sort
  *    keys — the engines default NULLS FIRST vs LAST differently).
  *
  * Scale notes (the suite is also a plan-shape exercise): the star joins
  * drive Spark's broadcast selection (region/nation/supplier/part under the
  * 10 MB threshold at any SF — dims stay dim-sized as lineitem grows),
  * correlated subqueries decorrelate to aggregate+join
  * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery), and the
  * date filters reach the parquet scan as PushedFilters. h17/h21's
  * per-key correlations shuffle on the correlation key — the same key the
  * outer join needs, so AQE reuses the exchange.
  */
object SqlSuiteQueries {

  /** name -> shared SQL text (both the Spark query and the DuckDB oracle). */
  val sqlTexts: Map[String, String] = Map(
    // H1 pricing summary: full-scan agg, 8 aggregates over 2 group keys
    "q_sql_h01" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(count(*) AS BIGINT) AS count_order,
        |       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
        |         AS sum_disc_price,
        |       floor(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))
        |             * 100 + 0.5) / 100 AS sum_charge,
        |       floor(avg(l_quantity) * 1e4 + 0.5) / 1e4 AS avg_qty,
        |       floor(avg(l_discount) * 1e6 + 0.5) / 1e6 AS avg_disc
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // H2-shaped min-cost supplier: comma-join syntax + correlated min
    // subquery on the (part, supplier) bridge (lineitem stands in for
    // partsupp, which the synthetic schema doesn't have)
    "q_sql_h02" ->
      """SELECT s_acctbal, s_name, p_partkey, p_name
        |FROM part, supplier, lineitem
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size = 15
        |  AND s_acctbal = (SELECT min(s2.s_acctbal)
        |                   FROM supplier s2
        |                   JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
        |                   WHERE l2.l_partkey = p_partkey)
        |GROUP BY s_acctbal, s_name, p_partkey, p_name
        |ORDER BY p_partkey, s_name""".stripMargin,

    // H3 shipping priority: 3-way join + group + top-10
    "q_sql_h03" ->
      """SELECT l_orderkey,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
        |         AS revenue,
        |       CAST(o_orderdate AS DATE) AS orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    // H4 order-priority count gated by a correlated EXISTS (late lines)
    "q_sql_h04" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND CAST(l_shipdate AS DATE)
        |                    > CAST(o_orderdate AS DATE) + 30)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // H5 local-supplier volume: 6-way snowflake with the c=s nation equality
    "q_sql_h05" ->
      """SELECT n_name,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
        |         AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // H6 forecast revenue: tight range filters, single global agg
    "q_sql_h06" ->
      """SELECT floor(sum(l_extendedprice * l_discount) * 100 + 0.5) / 100
        |         AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // H7 volume shipping: nation self-aliased twice, symmetric OR pairs
    "q_sql_h07" ->
      """SELECT supp_nation, cust_nation, l_year,
        |       floor(sum(volume) * 100 + 0.5) / 100 AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS INT)
        |           AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
        |                                     AND DATE '1997-12-31'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // H8 market share: 8-table join, conditional-sum ratio per year
    "q_sql_h08" ->
      """SELECT o_year,
        |       floor(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
        |             / sum(volume) * 1e6 + 0.5) / 1e6 AS mkt_share
        |FROM (
        |  SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT)
        |           AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA'
        |    AND p_type = 'STANDARD'
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,

    // H9 product profit by nation x year (p_retailprice stands in for
    // ps_supplycost in the amount formula)
    "q_sql_h09" ->
      """SELECT nation, o_year,
        |       floor(sum(amount) * 100 + 0.5) / 100 AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |         CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT)
        |           AS o_year,
        |         l_extendedprice * (1 - l_discount)
        |           - p_retailprice * l_quantity * 0.1 AS amount
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year""".stripMargin,

    // H10 returned items: top-20 customers by returned revenue in a quarter
    "q_sql_h10" ->
      """SELECT c_custkey, c_name,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
        |         AS revenue,
        |       floor(c_acctbal * 100 + 0.5) / 100 AS acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // H11-shaped important share: HAVING against a scalar subquery
    "q_sql_h11" ->
      """SELECT n_name, floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS value
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |HAVING sum(l_extendedprice) >
        |       (SELECT sum(l_extendedprice) * 0.04 FROM lineitem)
        |ORDER BY n_name""".stripMargin,

    // H12-shaped late-shipment priority split (no shipmode column: the
    // CASE classes run on o_orderpriority, lateness on shipdate-orderdate)
    "q_sql_h12" ->
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                       OR o_orderpriority = '2-HIGH'
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |                      AND o_orderpriority <> '2-HIGH'
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 45
        |  AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    // H13 customer distribution: left join with ON-clause filter, then a
    // count-of-counts histogram
    "q_sql_h13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |       AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // H14 promo revenue: conditional-sum ratio over one month
    "q_sql_h14" ->
      """SELECT floor(100.00 * sum(CASE WHEN p_type = 'PROMO'
        |                               THEN l_extendedprice * (1 - l_discount)
        |                               ELSE 0 END)
        |             / sum(l_extendedprice * (1 - l_discount)) * 1e4 + 0.5)
        |         / 1e4 AS promo_revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'""".stripMargin,

    // H15 top supplier: CTE referenced twice (join + scalar max subquery)
    "q_sql_h15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |       floor(total_revenue * 100 + 0.5) / 100 AS total_revenue
        |FROM supplier
        |JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    // H16-shaped supplier-count per part slice: NOT IN + count(DISTINCT)
    "q_sql_h16" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#3'
        |  AND p_type NOT LIKE 'MED%'
        |  AND p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_name LIKE '%0000009%')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // H17 small-quantity revenue: correlated per-part avg threshold
    "q_sql_h17" ->
      """SELECT floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) / 100
        |         AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#5'
        |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // H18 large-volume customers: IN over a grouped HAVING subquery
    "q_sql_h18" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS orderdate,
        |       floor(o_totalprice * 100 + 0.5) / 100 AS totalprice,
        |       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 320)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_orderkey""".stripMargin,

    // H19 discounted revenue: disjunction of conjunctive ranges (the OR-of-
    // ANDs plan Catalyst must keep as a single join filter)
    "q_sql_h19" ->
      """SELECT floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
        |         AS revenue
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 21)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 10 AND l_quantity <= 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity >= 20 AND l_quantity <= 40)""".stripMargin,

    // H20-shaped potential promotion: nested IN subqueries with HAVING
    "q_sql_h20" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'blue%')
        |    AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |  GROUP BY l_suppkey
        |  HAVING sum(l_quantity) > 100)
        |ORDER BY s_suppkey""".stripMargin,

    // H21 suppliers who kept orders waiting: EXISTS + NOT EXISTS on the
    // same correlation key (latest shipper in a multi-supplier order)
    "q_sql_h21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderstatus = 'F'
        |  AND r_name = 'EUROPE'
        |  AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    // H22 global sales opportunity: scalar-avg gate + NOT EXISTS anti-join,
    // grouped by the last two digits of the customer name
    "q_sql_h22" ->
      """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |       floor(sum(c_acctbal) * 100 + 0.5) / 100 AS totacctbal
        |FROM (
        |  SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal
        |  FROM customer
        |  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                     WHERE c_acctbal > 0.00)
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderpriority = '1-URGENT')
        |) custsale
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,

    // GROUPING SETS in SQL text: mixed granularities + GROUPING() markers
    // (COALESCE labels keep NULLs out of the ORDER BY keys)
    "q_sql_gsets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |       CAST(count(*) AS BIGINT) AS n,
        |       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin,

    // Windowed aggregates in SQL text: running sum (ROWS), moving average
    // (bounded ROWS frame), and a RANGE frame over a date key
    "q_sql_winagg" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         sum(o_totalprice) AS rev,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY CAST(o_orderdate AS DATE))
        |SELECT d, floor(rev * 100 + 0.5) / 100 AS rev, n,
        |       floor(sum(rev) OVER (ORDER BY d
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             * 100 + 0.5) / 100 AS cum_rev,
        |       floor(avg(rev) OVER (ORDER BY d
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 100 + 0.5)
        |         / 100 AS ma7,
        |       CAST(count(*) OVER (ORDER BY d
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS days_seen
        |FROM daily
        |ORDER BY d
        |LIMIT 200""".stripMargin,

    // Set-op chain: UNION / INTERSECT / EXCEPT composed with explicit
    // nesting (no reliance on engine precedence defaults)
    "q_sql_chain" ->
      """SELECT k FROM (
        |  SELECT k FROM (
        |    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        |    UNION
        |    SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |  ) u
        |  INTERSECT
        |  SELECT c_custkey AS k FROM customer WHERE c_nationkey < 13
        |) t
        |WHERE k % 2 = 0
        |EXCEPT
        |SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY k""".stripMargin,

    // Left-join chain with ON-clause filters at both hops, mixed aggs
    "q_sql_outerchain" ->
      """SELECT n_name, r_name, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |LEFT JOIN customer ON c_nationkey = n_nationkey AND c_acctbal > 9000
        |LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'O'
        |GROUP BY n_name, r_name
        |ORDER BY n_name""".stripMargin,

    // LATERAL correlated subquery with ORDER BY + LIMIT (top-2 orders per
    // customer) — the per-row subquery shape Catalyst decorrelates into a
    // ranked window join; shared verbatim with DuckDB's LATERAL
    "q_sql_lateral" ->
      """SELECT c_custkey, t.o_orderkey, t.price
        |FROM customer
        |JOIN LATERAL (
        |  SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) / 100 AS price
        |  FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2
        |) t ON true
        |WHERE c_custkey < 50
        |ORDER BY c_custkey, t.price DESC, t.o_orderkey""".stripMargin,

    // Recursive CTE (Spark 4 WITH RECURSIVE): a generated month spine
    // LEFT-joined to real data — the gap-preserving calendar shape
    "q_sql_recursive" ->
      """WITH RECURSIVE seq(n) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT n + 1 FROM seq WHERE n < 12
        |)
        |SELECT s.n AS month_no, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        |FROM seq s
        |LEFT JOIN orders
        |  ON CAST(EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) AS INT) = s.n
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY s.n
        |ORDER BY s.n""".stripMargin,

    // Inline VALUES relation joined against a real table
    "q_sql_values" ->
      """SELECT v.seg, v.label, CAST(count(c_custkey) AS BIGINT) AS n
        |FROM (VALUES ('BUILDING', 'b2b'), ('AUTOMOBILE', 'consumer'),
        |             ('MACHINERY', 'b2b')) AS v(seg, label)
        |LEFT JOIN customer ON c_mktsegment = v.seg
        |GROUP BY v.seg, v.label
        |ORDER BY v.seg""".stripMargin,

    // Bag-semantics set op: INTERSECT ALL keeps min(multiplicity) copies
    "q_sql_setall" ->
      """SELECT k, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
        |  INTERSECT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |) t GROUP BY k
        |ORDER BY n DESC, k LIMIT 20""".stripMargin,

    // FULL OUTER between two pre-grouped sides (1:1 on k, nullable counts)
    "q_sql_full" ->
      """SELECT COALESCE(a.k, b.k) AS k, a.n_ord, b.n_line
        |FROM (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_ord
        |      FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey) a
        |FULL JOIN (SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS n_line
        |           FROM lineitem WHERE l_quantity = 50 GROUP BY l_suppkey) b
        |  ON a.k = b.k
        |ORDER BY k, n_ord, n_line""".stripMargin
  )

  def queries: Map[String, Q] = sqlTexts.map { case (name, text) =>
    name -> ((s: org.apache.spark.sql.SparkSession, d: String) => {
      Tables.registerAll(s, d)
      s.sql(text)
    }): (String, Q)
  }

  /** The oracle IS the query text — shared verbatim. */
  def oracle: Map[String, String] = sqlTexts
}
