package graft.queries

import graft.core.{Q, Tables}
import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Event-stream analytics catalog: ordered funnel and weekly cohort
  * retention over the events table. Timestamps compare as epoch seconds
  * (the catalog's cross-engine numeric contract, `WindowQueries.ep`). */
object AnalyticsQueries {

  private val ep =
    "datediff('second', TIMESTAMP '1970-01-01 00:00:00', CAST(ts AS TIMESTAMP))"

  val queries: Map[String, Q] = Map(
    // view → click → purchase, greedy-earliest chain within 24 h of the
    // first view
    "q_evt_funnel" -> ((s, d) =>
      Analytics.funnel(Tables.events(s, d),
          Seq("view", "click", "purchase"), withinSec = 86400L)
        .orderBy(col("step"))),

    // weekly cohorts (epoch-week of first event), distinct active users
    // per (cohort, offset)
    "q_evt_cohort" -> ((s, d) =>
      Analytics.cohortRetention(Tables.events(s, d))
        .orderBy(col("cohort_week"), col("week_offset"))),

    // first-order Markov transitions: (from, to) counts + row-normalized
    // probabilities over user-ordered event sequences
    "q_evt_transitions" -> ((s, d) =>
      Analytics.transitionMatrix(Tables.events(s, d))
        .orderBy(col("from_type"), col("to_type"))),

    // Welch two-sample t-test: every event_type variant vs 'view' as
    // control on event values — the A/B experiment readout
    "q_evt_abtest" -> ((s, d) =>
      Analytics.welchTTest(Tables.events(s, d), "event_type",
          control = "view")
        .orderBy(col("variant"))),

    // per-user OLS value-over-time trend (closed-form sufficient stats,
    // slope per day, zero-variance users excluded)
    "q_evt_trend" -> ((s, d) =>
      Analytics.olsTrend(Tables.events(s, d))
        .orderBy(col("user_id"))),

    // truncated EWMA smoothing of event values per user (α=0.5 dyadic
    // weights, 8-event lookback, ordered-fold determinism)
    "q_evt_ewma" -> ((s, d) =>
      Analytics.ewmaSmooth(Tables.events(s, d))
        .orderBy(col("user_id"), col("event_id"))),

    // market-basket association rules over order→part baskets: pairs
    // co-ordered ≥3 times, both rule directions with confidence + lift
    "q_mb_rules" -> ((s, d) =>
      Analytics.associationRules(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          minSupport = 3)
        .orderBy(col("antecedent"), col("consequent"))),

    // SCD-2 history: per-user event_type runs as validity intervals
    "q_evt_scd2" -> ((s, d) =>
      Analytics.scd2History(Tables.events(s, d), "user_id", "event_type")
        .orderBy(col("user_id"), col("valid_from"))),

    // incremental aggregate maintenance: saved per-status aggregate of
    // old orders + new batch ≡ full recompute (the oracle IS the full
    // recompute — equality proves the merge path)
    "q_evt_incr_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("cents",
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .withColumn("one", lit(1L))
      val state = o.where(col("o_orderkey") % 3 =!= 0)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("one")).as("one"), sum(col("cents")).as("cents"))
      graft.operators.Maintenance.incrementalAgg(
          state, o.where(col("o_orderkey") % 3 === 0),
          keys = Seq("o_orderstatus"), sumCols = Seq("one", "cents"))
        .select(col("o_orderstatus"), col("one").as("n"),
          col("cents").as("sum_cents"))
        .orderBy(col("o_orderstatus"))
    }),

    // daily top-3 trending event types with rank movement vs yesterday
    "q_evt_trending" -> ((s, d) =>
      Analytics.trendingTopK(Tables.events(s, d), k = 3)
        .orderBy(col("day"), col("rnk"))),

    // first/last-touch attribution: views within 24h before each purchase
    "q_evt_attribution" -> ((s, d) =>
      Analytics.touchAttribution(Tables.events(s, d),
          convType = "purchase", touchType = "view", windowSec = 86400L)
        .orderBy(col("user_id"), col("event_id"))),

    // rolling 7-day actives (WAU) alongside each day's DAU — the explode
    // dual of a sliding distinct window (which no engine has natively)
    "q_evt_wau" -> ((s, d) =>
      Analytics.rollingActiveUsers(Tables.events(s, d), windowDays = 7)
        .orderBy(col("day"))),

    // per-user hourly resample with linear interpolation (gap filling):
    // grid from each user's own span, values held flat outside the
    // observed range; 4-dp floor-rounding is the cross-engine contract
    "q_evt_resample" -> ((s, d) =>
      Analytics.resampleLinear(Tables.events(s, d), stepSec = 3600L)
        .select(col("user_id"), col("t"),
          (floor(col("v") * 1e4 + lit(0.5)) / 1e4).as("v"))
        .orderBy(col("user_id"), col("t"))),

    // LOCF gap fill: hourly grid holding the last observation — the
    // step-function twin of q_evt_resample's interpolation
    "q_evt_gapfill" -> ((s, d) =>
      Analytics.resampleHold(Tables.events(s, d), stepSec = 3600L)
        .select(col("user_id"), col("t"),
          (floor(col("v") * 1e4 + lit(0.5)) / 1e4).as("v"))
        .orderBy(col("user_id"), col("t"))),

    // rolling z-score anomalies: 10-event lookback per user, |z| > 2
    "q_evt_anomaly" -> ((s, d) =>
      Analytics.rollingAnomaly(Tables.events(s, d))
        .select(col("user_id"), col("event_id"),
          (floor(col("z") * 1e4 + lit(0.5)) / 1e4).as("z"),
          col("is_anomaly").cast("int").as("is_anomaly"))
        .orderBy(col("user_id"), col("event_id"))),

    // batch CEP: per-user event-symbol sequences matched against the
    // funnel pattern "view … purchase with no purchase between" —
    // Flink CEP's MATCH_RECOGNIZE shape as one codegen aggregate
    "q_evt_cep" -> ((s, d) =>
      Analytics.eventPattern(Tables.events(s, d),
          Map("view" -> "v", "click" -> "c", "purchase" -> "p",
            "signup" -> "s", "error" -> "e"),
          pattern = "v[^p]*p")
        .orderBy(col("user_id"))),

    // two-sample Kolmogorov–Smirnov: view vs click value distributions,
    // D statistic + α=0.05 critical value (bucketed parallel ECDF)
    "q_evt_ks" -> ((s, d) =>
      Analytics.ksTest(Tables.events(s, d), "event_type", "value",
        g1 = "view", g2 = "click")),

    // Kaplan–Meier conversion curve: hours from first event to first
    // purchase, right-censored at last event / 72 h follow-up cutoff
    "q_evt_survival" -> ((s, d) =>
      Analytics.kaplanMeier(Tables.events(s, d), convType = "purchase",
          followUpHours = 72)
        .orderBy(col("t_hours"))),

    // hour-of-day seasonal decomposition: additive seasonal component +
    // residual sd per hour (24 rows, epoch arithmetic — timezone-free)
    "q_evt_seasonal" -> ((s, d) =>
      Analytics.seasonalDecompose(Tables.events(s, d))
        .orderBy(col("hr"))),

    // Mann–Whitney U rank-sum (tie-corrected normal approx): the
    // non-parametric location test of the drift battery
    "q_evt_mannwhitney" -> ((s, d) =>
      Analytics.mannWhitney(Tables.events(s, d), "event_type", "value",
        g1 = "view", g2 = "click")),

    // offline change-point screen: per-user split maximizing
    // |mean(prefix) − mean(suffix)| from one prefix-sum window pair
    "q_evt_changepoint" -> ((s, d) =>
      Analytics.changePoint(Tables.events(s, d), minSeg = 5)
        .orderBy(col("user_id"))),

    // autocorrelation of the daily count series per event_type, lags
    // 1..7 — integer-exact sufficient statistics (n²-scaled centering),
    // one corpus pass, everything after runs on the |types|·|days| agg
    "q_evt_acf" -> ((s, d) =>
      Analytics.acf(Tables.events(s, d), maxLag = 7)
        .orderBy(col("event_type"), col("lag"))),

    // cross-correlation view→purchase at lags −7..7 (does view volume
    // predict purchase volume k days later?) — ACF's integer machinery
    // with a split-sqrt denominator that cannot overflow
    "q_evt_ccf" -> ((s, d) =>
      Analytics.ccf(Tables.events(s, d), "view", "purchase", maxLag = 7)
        .orderBy(col("lag"))),

    // per-group feature normalization: z-score (sample sd, explicit
    // algebra) + p05/p95 winsorize per event_type — group stats join
    // back broadcast (group-count-sized), the feature-prep map a
    // training pipeline runs before export
    "q_evt_znorm" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val stats = e.groupBy(col("event_type")).agg(
          count(lit(1)).cast("double").as("n"), sum(col("value")).as("sv"),
          sum(col("value") * col("value")).as("svv"),
          expr("percentile(value, 0.05)").as("p05"),
          expr("percentile(value, 0.95)").as("p95"))
        .select(col("event_type"), (col("sv") / col("n")).as("mu"),
          sqrt(greatest(lit(0.0),
            (col("svv") - col("sv") * col("sv") / col("n"))
              / (col("n") - 1))).as("sd"),
          col("p05"), col("p95"))
      e.join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"),
          (floor(when(col("sd") > 0,
              (col("value") - col("mu")) / col("sd")).otherwise(lit(0.0))
            * 1e4 + lit(0.5)) / 1e4).as("z"),
          (floor(least(greatest(col("value"), col("p05")), col("p95"))
            * 1e4 + lit(0.5)) / 1e4).as("vw"))
        .orderBy(col("event_id"))
    }))

  val oracle: Map[String, String] = Map(
    "q_evt_funnel" ->
      s"""WITH e AS (
            SELECT user_id, event_type, $ep AS t FROM events),
          s1 AS (
            SELECT user_id, min(t) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY 1),
          s2 AS (
            SELECT e.user_id, s1.t1, min(e.t) AS t2
            FROM e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.t > s1.t1
              AND e.t <= s1.t1 + 86400
            GROUP BY 1, 2),
          s3 AS (
            SELECT e.user_id, s2.t1, min(e.t) AS t3
            FROM e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.t > s2.t2
              AND e.t <= s2.t1 + 86400
            GROUP BY 1, 2),
          base AS (SELECT greatest(count(*), 1) AS b FROM s1),
          rows_ AS (
            SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
                   (SELECT count(*) FROM s1) AS n_users
            UNION ALL
            SELECT CAST(2 AS INT), 'click', (SELECT count(*) FROM s2)
            UNION ALL
            SELECT CAST(3 AS INT), 'purchase', (SELECT count(*) FROM s3))
          SELECT step, event_type, n_users,
                 floor(n_users / CAST(b AS DOUBLE) * 1e4 + 0.5) / 1e2
                   AS conv_pct
          FROM rows_ CROSS JOIN base ORDER BY step""",
    "q_evt_abtest" ->
      """WITH g AS (
           SELECT event_type AS grp, count(*) AS n, sum(value) AS sy,
                  sum(value * value) AS syy
           FROM events GROUP BY 1 HAVING count(*) >= 2),
         s AS (
           SELECT grp, n, sy / n AS mean,
                  (syy - sy * sy / n) / (n - 1) AS v
           FROM g),
         c AS (SELECT n AS n_c, mean AS mean_c, v AS v_c FROM s
               WHERE grp = 'view')
         SELECT s.grp AS variant, s.n AS n_v, c.n_c,
                floor((s.mean - c.mean_c) * 1e4 + 0.5) / 1e4 AS mean_diff,
                floor((s.mean - c.mean_c) / sqrt(s.v / s.n + c.v_c / c.n_c)
                      * 1e4 + 0.5) / 1e4 AS t_stat,
                floor(pow(s.v / s.n + c.v_c / c.n_c, 2) /
                      (pow(s.v / s.n, 2) / (s.n - 1)
                       + pow(c.v_c / c.n_c, 2) / (c.n_c - 1))
                      * 1e4 + 0.5) / 1e4 AS dof
         FROM s CROSS JOIN c WHERE s.grp <> 'view'
         ORDER BY variant""",
    "q_evt_trend" ->
      s"""WITH e AS (
           SELECT user_id, $ep AS ept, value AS y FROM events),
         c AS (
           SELECT user_id,
                  ept - min(ept) OVER (PARTITION BY user_id) AS x, y
           FROM e),
         g AS (
           SELECT user_id, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
                  sum(y) AS sy, sum(CAST(x AS DOUBLE) * y) AS sxy
           FROM c GROUP BY 1)
         SELECT user_id, n,
                floor((n * sxy - sx * sy) /
                      (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * 86400 * 1e4 + 0.5) / 1e4 AS slope_per_day
         FROM g
         WHERE CAST(n AS DOUBLE) * sxx > CAST(sx AS DOUBLE) * sx
         ORDER BY user_id""",
    "q_evt_ewma" ->
      """WITH e AS (
           SELECT user_id, event_id, value,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP)) AS rn
           FROM events),
         j AS (
           SELECT c.user_id, c.event_id, p.value AS v, c.rn - p.rn AS d
           FROM e c JOIN e p ON p.user_id = c.user_id
                             AND p.rn BETWEEN c.rn - 7 AND c.rn),
         g AS (
           SELECT user_id, event_id, list(v ORDER BY d DESC) AS vs
           FROM j GROUP BY 1, 2),
         s AS (
           SELECT user_id, event_id,
                  list_reduce(list_transform(vs, (x, i) ->
                    x * pow(0.5, len(vs) - i)), (a, x) -> a + x) AS num,
                  list_reduce(list_transform(vs, (x, i) ->
                    pow(0.5, len(vs) - i)), (a, x) -> a + x) AS den
           FROM g)
         SELECT user_id, event_id,
                floor(num / den * 1e4 + 0.5) / 1e4 AS ewma
         FROM s ORDER BY user_id, event_id""",
    "q_mb_rules" ->
      """WITH bi AS (
           SELECT DISTINCT l_orderkey AS basket_id, l_partkey AS item
           FROM lineitem),
         n AS (SELECT COUNT(DISTINCT basket_id) AS n FROM bi),
         freq AS (
           SELECT item, COUNT(*) AS n_i FROM bi GROUP BY item
           HAVING COUNT(*) >= 3),
         pairs AS (
           SELECT a.item AS pa, fa.n_i AS na, b.item AS pb, fb.n_i AS nb,
                  COUNT(*) AS n_pair
           FROM bi a JOIN bi b ON a.basket_id = b.basket_id
                                  AND a.item < b.item
                JOIN freq fa ON fa.item = a.item
                JOIN freq fb ON fb.item = b.item
           GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 3),
         rules AS (
           SELECT pa AS antecedent, pb AS consequent, n_pair,
                  na AS n_ante, nb AS n_cons FROM pairs
           UNION ALL
           SELECT pb, pa, n_pair, nb, na FROM pairs)
         SELECT antecedent, consequent, n_pair, n_ante,
                floor(n_pair / CAST(n_ante AS DOUBLE) * 1e4 + 0.5) / 1e4
                  AS confidence,
                floor(n_pair * n.n * 1.0e0 / (n_ante * n_cons) * 1e4 + 0.5)
                  / 1e4 AS lift
         FROM rules CROSS JOIN n
         ORDER BY antecedent, consequent""",
    "q_evt_transitions" ->
      s"""WITH e AS (
            SELECT user_id, event_type, event_id, $ep AS t FROM events),
          p AS (
            SELECT event_type AS from_type,
                   lead(event_type, 1) OVER (PARTITION BY user_id
                     ORDER BY t, event_id) AS to_type
            FROM e),
          cnt AS (
            SELECT from_type, to_type, count(*) AS n FROM p
            WHERE to_type IS NOT NULL GROUP BY 1, 2),
          tot AS (SELECT from_type, sum(n) AS tot FROM cnt GROUP BY 1)
          SELECT cnt.from_type, to_type, n,
                 floor(CAST(n AS DOUBLE) / tot * 1e4 + 0.5) / 1e4 AS p
          FROM cnt JOIN tot ON cnt.from_type = tot.from_type
          ORDER BY cnt.from_type, to_type""",
    "q_evt_scd2" ->
      s"""WITH e AS (
            SELECT user_id, event_type, event_id, $ep AS t FROM events),
          ch AS (
            SELECT user_id, event_type, event_id, t,
                   lag(event_type, 1) OVER w AS prev
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
          runs AS (
            SELECT user_id, event_type, event_id, t FROM ch
            WHERE prev IS NULL OR prev <> event_type)
          SELECT user_id, event_type, t AS valid_from,
                 lead(t, 1) OVER (PARTITION BY user_id
                                  ORDER BY t, event_id) AS valid_to
          FROM runs ORDER BY user_id, valid_from""",
    "q_evt_incr_agg" ->
      """WITH o AS (
            SELECT o_orderstatus,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders)
          SELECT o_orderstatus, count(*) AS n,
                 CAST(sum(cents) AS BIGINT) AS sum_cents
          FROM o GROUP BY 1 ORDER BY o_orderstatus""",
    "q_evt_trending" ->
      s"""WITH e AS (
            SELECT ($ep) // 86400 AS day, event_type FROM events),
          c AS (
            SELECT day, event_type, count(*) AS n FROM e GROUP BY 1, 2),
          r AS (
            SELECT day, event_type, n, row_number() OVER
              (PARTITION BY day ORDER BY n DESC, event_type) AS rnk
            FROM c),
          p AS (
            SELECT day + 1 AS day, event_type, rnk AS prev_rnk FROM r)
          SELECT r.day, r.event_type, r.n, CAST(r.rnk AS INT) AS rnk,
                 CAST(p.prev_rnk AS INT) AS prev_rnk,
                 CAST(p.prev_rnk - r.rnk AS INT) AS delta
          FROM r LEFT JOIN p ON r.day = p.day AND r.event_type = p.event_type
          WHERE r.rnk <= 3 ORDER BY r.day, rnk""",
    "q_evt_attribution" ->
      s"""WITH e AS (
            SELECT user_id, event_id, $ep AS t, event_type FROM events
            WHERE event_type IN ('purchase', 'view')),
          w AS (
            SELECT user_id, event_id, t, event_type,
                   min(CASE WHEN event_type = 'view' THEN t END)
                     OVER win AS first_t,
                   max(CASE WHEN event_type = 'view' THEN t END)
                     OVER win AS last_t
            FROM e
            WINDOW win AS (PARTITION BY user_id ORDER BY t
                           RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW))
          SELECT user_id, event_id, t, first_t, last_t
          FROM w WHERE event_type = 'purchase'
          ORDER BY user_id, event_id""",
    "q_evt_wau" ->
      s"""WITH ud AS (
            SELECT DISTINCT user_id, ($ep) // 86400 AS day FROM events),
          mx AS (SELECT max(day) AS m FROM ud),
          dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
          ex AS (
            SELECT DISTINCT user_id,
                   unnest(range(day, least(day + 7, m + 1))) AS day
            FROM ud CROSS JOIN mx),
          wau AS (SELECT day, count(*) AS wau FROM ex GROUP BY 1)
          SELECT dau.day, dau.dau, wau.wau
          FROM dau LEFT JOIN wau USING (day) ORDER BY day""",
    "q_evt_resample" ->
      s"""WITH o0 AS (
            SELECT user_id, $ep AS t, value FROM events),
          o AS (
            SELECT user_id, t, min(value) AS v FROM o0 GROUP BY 1, 2),
          b AS (
            SELECT user_id, min(t) AS mn, max(t) AS mx FROM o GROUP BY 1),
          g AS (
            SELECT user_id, unnest(range((mn + 3599) // 3600,
                                         mx // 3600 + 1)) * 3600 AS t
            FROM b),
          u AS (
            SELECT user_id, t, v, 1 AS is_obs FROM o
            UNION ALL
            SELECT user_id, t, NULL AS v, 0 AS is_obs FROM g),
          w AS (
            SELECT user_id, t, is_obs,
                   last_value(CASE WHEN is_obs = 1 THEN t END IGNORE NULLS)
                     OVER fwd AS pt,
                   last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                     OVER fwd AS pv,
                   last_value(CASE WHEN is_obs = 1 THEN t END IGNORE NULLS)
                     OVER bwd AS nt,
                   last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                     OVER bwd AS nv
            FROM u
            WINDOW fwd AS (PARTITION BY user_id ORDER BY t, is_obs DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   bwd AS (PARTITION BY user_id ORDER BY t DESC, is_obs DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          SELECT user_id, t,
                 floor((CASE WHEN pt IS NULL THEN nv
                             WHEN nt IS NULL THEN pv
                             WHEN nt = pt THEN pv
                             ELSE pv + (nv - pv) * (t - pt) / (nt - pt)
                        END) * 1e4 + 0.5) / 1e4 AS v
          FROM w WHERE is_obs = 0 ORDER BY user_id, t""",
    "q_evt_gapfill" ->
      s"""WITH o0 AS (
            SELECT user_id, $ep AS t, value FROM events),
          o AS (
            SELECT user_id, t, min(value) AS v FROM o0 GROUP BY 1, 2),
          b AS (
            SELECT user_id, min(t) AS mn, max(t) AS mx FROM o GROUP BY 1),
          g AS (
            SELECT user_id, unnest(range((mn + 3599) // 3600,
                                         mx // 3600 + 1)) * 3600 AS t
            FROM b),
          u AS (
            SELECT user_id, t, v, 1 AS is_obs FROM o
            UNION ALL
            SELECT user_id, t, NULL AS v, 0 AS is_obs FROM g),
          w AS (
            SELECT user_id, t, is_obs,
                   last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY t, is_obs DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS pv
            FROM u)
          SELECT user_id, t, floor(pv * 1e4 + 0.5) / 1e4 AS v
          FROM w WHERE is_obs = 0 AND pv IS NOT NULL
          ORDER BY user_id, t""",
    "q_evt_anomaly" ->
      s"""WITH e AS (
            SELECT user_id, event_id, value, $ep AS t FROM events),
          s AS (
            SELECT user_id, event_id, value,
                   sum(value) OVER w AS s1,
                   sum(value * value) OVER w AS s2,
                   count(value) OVER w AS n
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
          sd AS (
            SELECT user_id, event_id, value, s1,
                   sqrt(greatest(0.0,
                     s2 - 10.0 * (s1 / 10.0) * (s1 / 10.0)) / 9.0) AS sd
            FROM s WHERE n = 10)
          SELECT user_id, event_id,
                 CASE WHEN sd > 0.0
                   THEN floor((value - s1 / 10.0) / sd * 1e4 + 0.5) / 1e4
                   ELSE 0.0 END AS z,
                 CAST(sd > 0.0 AND abs((value - s1 / 10.0) / sd) > 2.0
                   AS INT) AS is_anomaly
          FROM sd ORDER BY user_id, event_id""",
    "q_evt_cohort" ->
      s"""WITH w AS (
            SELECT user_id, CAST(($ep // 86400) // 7 AS BIGINT) AS w
            FROM events),
          cohort AS (SELECT user_id, min(w) AS cw FROM w GROUP BY 1),
          act AS (
            SELECT DISTINCT w.user_id, cohort.cw, w.w - cohort.cw AS off
            FROM w JOIN cohort ON w.user_id = cohort.user_id)
          SELECT cw AS cohort_week, off AS week_offset,
                 count(*) AS n_users
          FROM act GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    // leftmost greedy non-overlapping matching is identical in Java regex
    // (Spark) and RE2 (DuckDB) for this alternation-free pattern
    "q_evt_cep" ->
      s"""WITH e AS (
            SELECT user_id, $ep AS t, event_id,
                   CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                        WHEN 'error' THEN 'e' ELSE '_' END AS sym
            FROM events),
          s AS (
            SELECT user_id, string_agg(sym, '' ORDER BY t, event_id) AS s
            FROM e GROUP BY 1)
          SELECT user_id, CAST(length(s) AS BIGINT) AS seq_len,
                 CAST(len(regexp_extract_all(s, 'v[^p]*p')) AS BIGINT)
                   AS n_matches,
                 CAST(len(regexp_extract_all(s, 'v[^p]*p')) > 0 AS INT)
                   AS has_match
          FROM s ORDER BY user_id""",
    "q_evt_ks" ->
      """WITH t AS (
           SELECT value AS v,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS i1,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i2
           FROM events WHERE event_type IN ('view', 'click')),
         g AS (SELECT v, sum(i1) AS c1, sum(i2) AS c2 FROM t GROUP BY 1),
         n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM g),
         e AS (SELECT v,
                 sum(c1) OVER (ORDER BY v) AS f1,
                 sum(c2) OVER (ORDER BY v) AS f2
               FROM g),
         d AS (SELECT max(abs(f1 / CAST(n.n1 AS DOUBLE)
                             - f2 / CAST(n.n2 AS DOUBLE))) AS d
               FROM e CROSS JOIN n)
         SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
                floor(d.d * 1e4 + 0.5) / 1e4 AS d_stat,
                floor(1.358 * sqrt((n.n1 + n.n2)
                      / (CAST(n.n1 AS DOUBLE) * n.n2)) * 1e4 + 0.5) / 1e4
                  AS crit_05,
                CAST(floor(d.d * 1e4 + 0.5) / 1e4
                     > floor(1.358 * sqrt((n.n1 + n.n2)
                             / (CAST(n.n1 AS DOUBLE) * n.n2)) * 1e4 + 0.5)
                       / 1e4 AS INT) AS reject_05
         FROM d CROSS JOIN n""",
    "q_evt_survival" ->
      s"""WITH u AS (
            SELECT user_id, min($ep) AS t0,
                   min(CASE WHEN event_type = 'purchase' THEN $ep END) AS tp,
                   max($ep) AS tc
            FROM events GROUP BY 1),
          l AS (
            SELECT (least(coalesce(tp, tc), t0 + 259200) - t0) // 3600 AS lt,
                   CASE WHEN tp IS NOT NULL AND tp <= t0 + 259200
                        THEN 1 ELSE 0 END AS death
            FROM u),
          d AS (SELECT lt, count(*) AS n_all, sum(death) AS n_death
                FROM l GROUP BY 1),
          r AS (SELECT lt, n_death,
                  sum(n_all) OVER (ORDER BY lt DESC) AS n_risk
                FROM d),
          s AS (SELECT lt, n_death, n_risk,
                  exp(sum(ln(1 - n_death / CAST(n_risk AS DOUBLE)))
                    OVER (ORDER BY lt)) AS surv
                FROM r)
          SELECT lt AS t_hours, CAST(n_risk AS BIGINT) AS n_risk,
                 CAST(n_death AS BIGINT) AS n_death,
                 floor(surv * 1e4 + 0.5) / 1e4 AS surv
          FROM s WHERE n_death > 0 ORDER BY t_hours""",
    "q_evt_seasonal" ->
      s"""WITH h AS (
            SELECT CAST(($ep // 3600) % 24 AS INT) AS hr,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(value) AS s, sum(value * value) AS ss
            FROM events GROUP BY 1),
          g AS (SELECT sum(s) / sum(n) AS gm FROM h)
          SELECT hr, CAST(n AS BIGINT) AS n,
                 floor(s / n * 1e4 + 0.5) / 1e4 AS hour_mean,
                 floor((s / n - g.gm) * 1e4 + 0.5) / 1e4 AS seasonal,
                 floor(sqrt(greatest(0.0,
                   ss / n - (s / n) * (s / n))) * 1e4 + 0.5) / 1e4
                   AS resid_sd
          FROM h CROSS JOIN g ORDER BY hr""",
    // ranks are half-integers ⇒ every sum below is EXACT in double;
    // only the final sqrt/divide rounds, on identical operands
    "q_evt_mannwhitney" ->
      """WITH t AS (
           SELECT value AS v,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS i1,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i2
           FROM events WHERE event_type IN ('view', 'click')),
         g AS (SELECT v, sum(i1) AS c1, sum(i2) AS c2 FROM t GROUP BY 1),
         e AS (SELECT v, c1, c2, c1 + c2 AS cnt,
                 COALESCE(sum(c1 + c2) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cb
               FROM g),
         a AS (SELECT sum(c1 * (cb + (cnt + 1) / 2.0)) AS r1,
                      sum(cnt * cnt * cnt - cnt) AS tt,
                      sum(c1) AS n1, sum(c2) AS n2
               FROM e),
         u AS (SELECT n1, n2, tt,
                      r1 - n1 * (n1 + 1) / 2.0 AS u1r
               FROM a)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                floor(u1r * 1e4 + 0.5) / 1e4 AS u1,
                floor((u1r - n1 * n2 / 2.0) /
                      sqrt(n1 * n2 / 12.0 *
                           ((n1 + n2 + 1) -
                            tt / ((n1 + n2) * (n1 + n2 - 1.0))))
                      * 1e4 + 0.5) / 1e4 AS z,
                CAST(abs(floor((u1r - n1 * n2 / 2.0) /
                      sqrt(n1 * n2 / 12.0 *
                           ((n1 + n2 + 1) -
                            tt / ((n1 + n2) * (n1 + n2 - 1.0))))
                      * 1e4 + 0.5) / 1e4) > 1.96 AS INT) AS reject_05
         FROM u""",
    // exact integer cents make every prefix/total sum order-independent
    "q_evt_changepoint" ->
      s"""WITH e AS (
            SELECT user_id, $ep AS t, event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
            FROM events),
          w AS (
            SELECT user_id, v,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY t, event_id) AS pos,
                   sum(v) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS ps,
                   count(*) OVER (PARTITION BY user_id) AS n,
                   sum(v) OVER (PARTITION BY user_id) AS st
            FROM e),
          g AS (
            SELECT user_id, n, pos,
                   floor(abs(ps / CAST(pos AS DOUBLE)
                             - (st - ps) / CAST(n - pos AS DOUBLE))
                         / 100.0 * 1e4 + 0.5) / 1e4 AS gap
            FROM w WHERE pos >= 5 AND pos <= n - 5),
          b AS (
            SELECT user_id, n, pos, gap,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY gap DESC, pos ASC) AS rn
            FROM g)
          SELECT user_id, CAST(n AS BIGINT) AS n,
                 CAST(pos AS BIGINT) AS split_pos, gap
          FROM b WHERE rn = 1 ORDER BY user_id""",
    // quantile_cont ≡ Spark percentile (q_agg_percentile convention);
    // variance algebra spelled identically to the Spark side
    "q_evt_znorm" ->
      """WITH s AS (
           SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
                  sum(value) AS sv, sum(value * value) AS svv,
                  quantile_cont(value, 0.05) AS p05,
                  quantile_cont(value, 0.95) AS p95
           FROM events GROUP BY 1),
         t AS (
           SELECT event_type, sv / n AS mu,
                  sqrt(greatest(0.0, (svv - sv * sv / n) / (n - 1))) AS sd,
                  p05, p95
           FROM s)
         SELECT e.event_id, e.event_type,
                floor((CASE WHEN t.sd > 0
                            THEN (e.value - t.mu) / t.sd ELSE 0.0 END)
                      * 1e4 + 0.5) / 1e4 AS z,
                floor(least(greatest(e.value, t.p05), t.p95) * 1e4 + 0.5)
                  / 1e4 AS vw
         FROM events e JOIN t USING (event_type) ORDER BY e.event_id""",
    // integer-exact ACF: numerator and denominator scaled by n² so every
    // summand is (n·x_t − S)(n·x_{t−k} − S) over integer daily counts —
    // both engines sum identical integers, one final double division
    "q_evt_acf" ->
      s"""WITH daily AS (
            SELECT event_type, ($ep) // 86400 AS d, count(*) AS x
            FROM events GROUP BY 1, 2),
          bounds AS (
            SELECT event_type, min(d) AS lo, max(d) AS hi
            FROM daily GROUP BY 1),
          grid AS (
            SELECT event_type, unnest(range(lo, hi + 1)) AS d FROM bounds),
          series AS (
            SELECT g.event_type, g.d, coalesce(daily.x, 0) AS x
            FROM grid g LEFT JOIN daily
              ON g.event_type = daily.event_type AND g.d = daily.d),
          st AS (
            SELECT event_type, count(*) AS n, sum(x) AS s
            FROM series GROUP BY 1),
          c AS (
            SELECT series.event_type, d, st.n * x - st.s AS cv
            FROM series JOIN st ON series.event_type = st.event_type),
          den AS (SELECT event_type, sum(cv * cv) AS de FROM c GROUP BY 1),
          lags AS (SELECT unnest(range(1, 8)) AS lag),
          num AS (
            SELECT a.event_type, lags.lag, sum(a.cv * b.cv) AS nu
            FROM c a CROSS JOIN lags JOIN c b
              ON a.event_type = b.event_type AND a.d - lags.lag = b.d
            GROUP BY 1, 2)
          SELECT num.event_type, CAST(lag AS INT) AS lag,
                 CAST(nu AS DOUBLE) / CAST(de AS DOUBLE) AS r
          FROM num JOIN den ON num.event_type = den.event_type
          WHERE de > 0 ORDER BY 1, 2""",
    // same integer centering as q_evt_acf; denominator split as
    // sqrt(dx)·sqrt(dy) (sqrt is IEEE correctly-rounded — engine-stable;
    // dx·dy as one integer could overflow 63 bits)
    "q_evt_ccf" ->
      s"""WITH e AS (
            SELECT event_type, ($ep) // 86400 AS d FROM events
            WHERE event_type IN ('view', 'purchase')),
          daily AS (
            SELECT event_type, d, count(*) AS x FROM e GROUP BY 1, 2),
          span AS (SELECT unnest(range(min(d), max(d) + 1)) AS d FROM e),
          sx AS (
            SELECT span.d, coalesce(x, 0) AS x FROM span LEFT JOIN daily
              ON daily.event_type = 'view' AND daily.d = span.d),
          sy AS (
            SELECT span.d, coalesce(x, 0) AS y FROM span LEFT JOIN daily
              ON daily.event_type = 'purchase' AND daily.d = span.d),
          xy AS (SELECT sx.d, x, y FROM sx JOIN sy ON sx.d = sy.d),
          st AS (SELECT count(*) AS n, sum(x) AS sxs, sum(y) AS sys
                 FROM xy),
          cent AS (
            SELECT d, st.n * x - st.sxs AS cx, st.n * y - st.sys AS cy
            FROM xy CROSS JOIN st),
          den AS (SELECT sum(cx * cx) AS dx, sum(cy * cy) AS dy FROM cent),
          lags AS (SELECT unnest(range(-7, 8)) AS lag),
          num AS (
            SELECT lag, sum(a.cx * b.cy) AS nu
            FROM cent a CROSS JOIN lags JOIN cent b ON b.d = a.d + lags.lag
            GROUP BY 1)
          SELECT CAST(lag AS INT) AS lag,
                 CAST(nu AS DOUBLE)
                   / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE)))
                   AS r
          FROM num CROSS JOIN den
          WHERE dx > 0 AND dy > 0 ORDER BY lag""")
}
