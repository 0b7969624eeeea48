package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("funnel: ordered-chain semantics, window bound, out-of-order excluded") {
    val ev = Seq(
      // u1 completes in order
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // u2: purchase BEFORE click → chain stops at click
      (2L, "view", ts(0)), (2L, "purchase", ts(5)), (2L, "click", ts(10)),
      // u3: click outside the window
      (3L, "view", ts(0)), (3L, "click", ts(200)),
      // u4: never views (click alone must not enter the funnel)
      (4L, "click", ts(1)), (4L, "purchase", ts(2)),
      // u5: completes; also has an EARLIER view whose chain fails —
      // greedy-earliest anchors at the first view
      (5L, "view", ts(0)), (5L, "view", ts(50)),
      (5L, "click", ts(60)), (5L, "purchase", ts(70))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(ev, Seq("view", "click", "purchase"),
        withinSec = 100L * 60)
      .select("step", "n_users").as[(Int, Long)].collect().toMap
    // step1: u1,u2,u3,u5; step2: u1,u2,u5 (u3 out of window); step3: u1,u5
    // (u2's purchase precedes its click)
    assert(got == Map(1 -> 4L, 2 -> 3L, 3 -> 2L))
  }

  test("funnel conversion percentages are relative to step 1") {
    val ev = Seq(
      (1L, "a", ts(0)), (1L, "b", ts(1)),
      (2L, "a", ts(0))).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(ev, Seq("a", "b"), withinSec = 3600)
      .select("step", "conv_pct").as[(Int, Double)].collect().toMap
    assert(got(1) == 100.0 && got(2) == 50.0)
  }

  test("cohortRetention: offsets count distinct users, week 0 covers everyone") {
    val ev = Seq(
      (1L, ts(0)), (1L, ts(7L * 1440)),                  // cohort w0, active w0+w1
      (2L, ts(0)), (2L, ts(0)),                          // dup events, one w0 row
      (3L, ts(7L * 1440)), (3L, ts(21L * 1440))          // cohort w1, active w1+w3
    ).map { case (u, t) => (u, "e", t) }.toDF("user_id", "event_type", "ts")
    val got = Analytics.cohortRetention(ev)
      .select("cohort_week", "week_offset", "n_users")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("transitionMatrix counts ordered pairs per user; rows normalize to 1") {
    val ev = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "b", ts(1)), (1L, 3L, "a", ts(2)),
      (2L, 4L, "a", ts(0)), (2L, 5L, "b", ts(1))
    ).map { case (u, id, a, t) => (u, id, a, t, 0.0) }
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.transitionMatrix(ev)
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect()
    val counts = got.map(r => (r._1, r._2) -> r._3).toMap
    // a→b twice (u1, u2), b→a once (u1)
    assert(counts == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
    got.groupBy(_._1).foreach { case (f, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-3, s"row $f not normalized")
    }
  }

  test("scd2History: runs become half-open intervals, current run open-ended") {
    val ev = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "a", ts(10)),   // run of a
      (1L, 3L, "b", ts(20)),                           // change to b
      (1L, 4L, "a", ts(30)),                           // back to a (new run)
      (2L, 5L, "x", ts(0))
    ).map { case (u, id, a, t) => (u, id, a, t, 0.0) }
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.scd2History(ev, "user_id", "event_type")
      .select("user_id", "event_type", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set(
      (1L, "a", 0L, 1200L), (1L, "b", 1200L, 1800L), (1L, "a", 1800L, -1L),
      (2L, "x", 0L, -1L)))
  }

  test("incrementalAgg merge equals a full recompute, including new groups") {
    val state = Seq(("A", 2L, 10.0), ("B", 1L, 5.0)).toDF("k", "n", "s")
    val batch = Seq(("A", 3.0), ("C", 7.0), ("C", 1.0)).toDF("k", "v")
      .withColumn("n", lit(1L)).withColumnRenamed("v", "s")
      .select("k", "n", "s")
    val got = graft.operators.Maintenance
      .incrementalAgg(state, batch, Seq("k"), Seq("n", "s"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("A", 3L, 13.0), ("B", 1L, 5.0), ("C", 2L, 8.0)))
  }

  test("rollingAnomaly flags a planted spike and matches a local recompute") {
    // user 1: 10 flat values then a spike; user 2: too short for a window
    val ev = ((1 to 10).map(i => (1L, i.toLong, ts(i), 5.0 + (i % 3) * 0.1)) :+
      (1L, 11L, ts(11), 50.0)) ++ Seq((2L, 20L, ts(1), 1.0))
    val df = ev.map { case (u, id, t, v) => (u, id, "e", t, v) }
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.rollingAnomaly(df, lookback = 10, zThreshold = 2.0)
      .select("event_id", "z", "is_anomaly")
      .as[(Long, Double, Boolean)].collect()
    assert(got.map(_._1).toSeq == Seq(11L), "only the spike row has a full window")
    val (_, z, anom) = got.head
    val vals = (1 to 10).map(i => 5.0 + (i % 3) * 0.1)
    val m = vals.sum / 10
    val sd = math.sqrt((vals.map(v => v * v).sum - 10 * m * m) / 9)
    assert(math.abs(z - (50.0 - m) / sd) < 1e-9)
    assert(anom, "spike not flagged")
  }

  test("trendingTopK: ranks, ties on name, rank movement vs yesterday") {
    def e(u: Long, id: Long, tp: String, day: Long) =
      (u, id, tp, new Timestamp(day * 86400 * 1000L + 1000), 1.0)
    // day 0: a×3, b×2, c×1; day 1: c×3, a×2, b×2 (b/a tie → a first)
    val rows = Seq(
      e(1, 1, "a", 0), e(1, 2, "a", 0), e(2, 3, "a", 0),
      e(1, 4, "b", 0), e(2, 5, "b", 0), e(1, 6, "c", 0),
      e(1, 7, "c", 1), e(2, 8, "c", 1), e(3, 9, "c", 1),
      e(1, 10, "a", 1), e(2, 11, "a", 1),
      e(1, 12, "b", 1), e(2, 13, "b", 1))
    val df = rows.toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.trendingTopK(df, k = 3)
      .orderBy(col("day"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) 99 else r.getInt(5)))
    assert(got.toSeq == Seq(
      (0L, "a", 1, -1, 99), (0L, "b", 2, -1, 99), (0L, "c", 3, -1, 99),
      (1L, "c", 1, 3, 2),   // c: 3rd → 1st, delta +2
      (1L, "a", 2, 1, -1),  // a: 1st → 2nd, delta −1
      (1L, "b", 3, 2, -1)), got.toSeq.toString)
  }

  test("touchAttribution: first/last view in 24h, out-of-window excluded") {
    def ev(id: Long, tp: String, sec: Long) =
      (1L, id, tp, new Timestamp(sec * 1000L), 1.0)
    val df = Seq(
      ev(1, "view", 1000),           // outside 24h of the purchase
      ev(2, "view", 90000),          // first in-window touch
      ev(3, "view", 95000),          // last in-window touch
      ev(4, "purchase", 100000),
      ev(5, "purchase", 200000)      // no view in its window
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.touchAttribution(df, "purchase", "view", 86400L)
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got.toSeq == Seq((4L, 90000L, 95000L), (5L, -1L, -1L)),
      got.toSeq.toString)
  }

  test("rollingActiveUsers: WAU windows, DAU exact, dedup within day") {
    def ev(u: Long, id: Long, day: Long) =
      (u, id, "e", new Timestamp(day * 86400 * 1000L + 500), 1.0)
    // u1 active d0,d1 (twice on d1); u2 active d0, d9
    val df = Seq(ev(1, 1, 0), ev(1, 2, 1), ev(1, 3, 1), ev(2, 4, 0),
      ev(2, 5, 9)).toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.rollingActiveUsers(df, windowDays = 7)
      .orderBy(col("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // d0: dau 2 (u1,u2), wau 2; d1: dau 1, wau 2 (d0 actives in window);
    // d9: dau 1, wau 1 (d1 fell out after d7)
    assert(got.toSeq == Seq((0L, 2L, 2L), (1L, 1L, 2L), (9L, 1L, 1L)),
      got.toSeq.toString)
  }

  test("resampleLinear: exact brackets, flat edges, on-tick passthrough") {
    // user 1 obs: (3600, 10), (9000, 20), (14400, 50) — hourly grid ticks
    // 3600/7200/10800/14400; user 2: one obs off-tick → its only tick
    // holds flat
    val df = Seq(
      (1L, 1L, "e", new Timestamp(3600 * 1000L), 10.0),
      (1L, 2L, "e", new Timestamp(9000 * 1000L), 20.0),
      (1L, 3L, "e", new Timestamp(14400 * 1000L), 50.0),
      (2L, 4L, "e", new Timestamp(7000 * 1000L), 7.0),
      (2L, 5L, "e", new Timestamp(7400 * 1000L), 9.0)
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.resampleLinear(df, stepSec = 3600L)
      .as[(Long, Long, Double)].collect().toSet
    val u1 = Map(
      3600L -> 10.0,                       // on-tick obs passes through
      7200L -> (10.0 + 10.0 * 3600.0 / 5400.0), // between (3600,10) (9000,20)
      10800L -> (20.0 + 30.0 * 1800.0 / 5400.0), // between (9000,20) (14400,50)
      14400L -> 50.0)
    val want = u1.map { case (t, v) => (1L, t, v) }.toSet +
      ((2L, 7200L, 7.0 + 2.0 * 200.0 / 400.0)) // interpolated mid-gap
    assert(got == want, s"got $got\nwant $want")
    // duplicate timestamps collapse deterministically (min)
    val dup = df.unionByName(Seq((1L, 9L, "e", new Timestamp(9000 * 1000L), 99.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value"))
    val got2 = Analytics.resampleLinear(dup, stepSec = 3600L)
      .as[(Long, Long, Double)].collect().toSet
    assert(got2 == want, "min-collapse must ignore the higher duplicate")
  }

  test("resample grid: spans with no step boundary emit nothing (no descending sequence)") {
    // u1: a single observation off-tick; u2: two observations strictly
    // inside one hour (4000..5000). Both spans contain NO multiple of
    // 3600, so ceil(mn/step) > floor(mx/step) — sequence(lo, hi) would
    // generate a DESCENDING [lo, hi] and a spurious tick AFTER mx got a
    // carried value before the guard
    val df = Seq(
      (1L, 1L, "e", new Timestamp(4000 * 1000L), 5.0),
      (2L, 2L, "e", new Timestamp(4000 * 1000L), 1.0),
      (2L, 3L, "e", new Timestamp(5000 * 1000L), 2.0)
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    assert(Analytics.resampleHold(df, stepSec = 3600L).count() == 0L)
    assert(Analytics.resampleLinear(df, stepSec = 3600L).count() == 0L)
    // a user WITH a boundary still resamples alongside boundary-less ones
    val mixed = df.unionByName(Seq(
      (3L, 4L, "e", new Timestamp(3000 * 1000L), 1.0),
      (3L, 5L, "e", new Timestamp(4200 * 1000L), 4.0)
    ).toDF("user_id", "event_id", "event_type", "ts", "value"))
    val hold = Analytics.resampleHold(mixed, stepSec = 3600L)
      .as[(Long, Long, Double)].collect().toSet
    assert(hold == Set((3L, 3600L, 1.0)), hold.toString)
  }

  test("ksTest/mannWhitney: empty group fails with the designed diagnostic") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val eKs = intercept[IllegalArgumentException] {
      Analytics.ksTest(df, "g", "v", "a", "b").collect()
    }
    assert(eKs.getMessage.contains("ksTest: empty group"), eKs.getMessage)
    val eMw = intercept[IllegalArgumentException] {
      Analytics.mannWhitney(df, "g", "v", "a", "b").collect()
    }
    assert(eMw.getMessage.contains("mannWhitney: empty group"), eMw.getMessage)
    // both groups absent entirely (no rows survive the filter)
    val eNone = intercept[IllegalArgumentException] {
      Analytics.ksTest(df.where(lit(false)), "g", "v", "a", "b").collect()
    }
    assert(eNone.getMessage.contains("n1=0 n2=0"), eNone.getMessage)
  }

  test("rollingAnomaly: a perfectly flat stream flags nothing (σ=0 guard)") {
    // 15 identical values: every full window has zero variance; without
    // the guard z = 0/0 = NaN and Spark's NaN ordering makes
    // abs(NaN) > 2.0 TRUE — every row of a flat telemetry stream would
    // read as an anomaly
    val df = (1 to 15).map(i => (1L, i.toLong, "e", ts(i), 7.5))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.rollingAnomaly(df, lookback = 10, zThreshold = 2.0)
      .select("z", "is_anomaly").as[(Double, Boolean)].collect()
    assert(got.length == 5, "rows 11-15 have full windows")
    assert(got.forall { case (z, a) => z == 0.0 && !a },
      s"flat stream must emit z=0, no anomalies; got ${got.toSeq}")
  }

  test("canonicalUrl goldens: case, port, tracking params, order, fragment") {
    val cases = Seq(
      "HTTPS://WWW.Ex.COM:443/A/?b=2&a=1&utm_source=x#f" -> "https://www.ex.com/A?a=1&b=2",
      "https://www.ex.com/A?a=1&b=2&ref=tw"              -> "https://www.ex.com/A?a=1&b=2",
      // the root slash merges with the empty path (round 9): same page
      "http://EX.com:80/"                                -> "http://ex.com",
      "http://ex.com:8080/p"                             -> "http://ex.com:8080/p",
      "https://ex.com/p?utm_campaign=z"                  -> "https://ex.com/p",
      "https://ex.com"                                   -> "https://ex.com",
      // default-port stripping is SCHEME-AWARE: :443 under http (and :80
      // under https) are real nonstandard ports, not defaults
      "http://ex.com:443/p"                              -> "http://ex.com:443/p",
      "https://ex.com:80/p"                              -> "https://ex.com:80/p",
      // no scheme://authority shape -> verbatim passthrough (canonicalizing
      // would merge all such strings onto one empty-host dedup key)
      "not a url"                                        -> "not a url",
      "mailto:someone@ex.com"                            -> "mailto:someone@ex.com")
    val got = cases.map(_._1).toDF("url")
      .select(WebOps.canonicalUrl(col("url"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("welchTTest: matches a local Welch computation, zero effect is zero") {
    // control: 10,12,14 (mean 12); variant A: 20,24,28 (mean 24, real
    // effect); variant B: 12,14,10 (same distribution as control)
    val ev = Seq(
      (1L, 1L, "ctl", ts(0), 10.0), (2L, 1L, "ctl", ts(1), 12.0),
      (3L, 1L, "ctl", ts(2), 14.0),
      (4L, 1L, "va", ts(0), 20.0), (5L, 1L, "va", ts(1), 24.0),
      (6L, 1L, "va", ts(2), 28.0),
      (7L, 1L, "vb", ts(0), 12.0), (8L, 1L, "vb", ts(1), 14.0),
      (9L, 1L, "vb", ts(2), 10.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Analytics.welchTTest(ev, "event_type", control = "ctl")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // local Welch: var ctl = 4, var va = 16, var vb = 4 (n=3 each)
    val tA = (24.0 - 12.0) / math.sqrt(16.0 / 3 + 4.0 / 3)
    val dofA = math.pow(16.0 / 3 + 4.0 / 3, 2) /
      (math.pow(16.0 / 3, 2) / 2 + math.pow(4.0 / 3, 2) / 2)
    assert(got("va") == ((3L, 3L, 12.0, r4(tA), r4(dofA))), s"va=${got("va")}")
    // identical distributions: mean diff 0, t 0, dof = 2(n-1) = 4
    assert(got("vb")._3 == 0.0 && got("vb")._4 == 0.0 && got("vb")._5 == 4.0)
  }

  test("olsTrend: exact slope on a planted line, zero-variance excluded") {
    // user 1: y = 5 + 2·day  (x in seconds; slope_per_day must be exactly 2)
    // user 2: constant ts (zero variance) -> excluded
    // user 3: y constant -> slope 0
    val day = 86400L
    val ev = (0 until 4).map(i => (i.toLong, 1L, "a",
        new Timestamp(i * day * 1000L), 5.0 + 2.0 * i)) ++
      Seq((10L, 2L, "a", ts(0), 1.0), (11L, 2L, "a", ts(0), 9.0)) ++
      (0 until 3).map(i => (20L + i, 3L, "a",
        new Timestamp(i * day * 1000L), 7.0))
    val got = Analytics.olsTrend(
        ev.toDF("event_id", "user_id", "event_type", "ts", "value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(1L, 3L), s"users: ${got.keySet}")
    assert(got(1L) == ((4L, 2.0)))
    assert(got(3L) == ((3L, 0.0)))
  }

  test("ewmaSmooth: hand-computed weights, lookback truncation, per-user isolation") {
    val ev = Seq(
      (1L, 1L, "a", ts(0), 10.0), (2L, 1L, "a", ts(1), 20.0),
      (3L, 1L, "a", ts(2), 40.0),
      (4L, 2L, "a", ts(0), 100.0)) // other user: own series
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Analytics.ewmaSmooth(ev, alpha = 0.5, lookback = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // event 1: only itself -> 10; event 2: (20 + 0.5*10)/1.5;
    // event 3 (lookback 2 truncates event 1): (40 + 0.5*20)/1.5
    assert(got(1L) == 10.0)
    assert(got(2L) == r4(25.0 / 1.5))
    assert(got(3L) == r4(50.0 / 1.5))
    assert(got(4L) == 100.0, "user 2 must not see user 1's series")
  }

  test("associationRules: exact support/confidence/lift on a planted corpus") {
    // {milk, bread} in 4 baskets, milk alone in 2, bread alone in 1,
    // {milk, eggs} once (below minSupport=2), N = 8 baskets
    val rows = Seq(
      (1L, "milk"), (1L, "bread"),
      (2L, "milk"), (2L, "bread"),
      (3L, "milk"), (3L, "bread"),
      (4L, "milk"), (4L, "bread"), (4L, "bread"), // dup in basket collapses
      (5L, "milk"), (6L, "milk"),
      (7L, "bread"),
      (8L, "milk"), (8L, "eggs"))
    val got = Analytics.associationRules(rows.toDF("basket_id", "item"),
        minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // milk in 7 baskets, bread in 5, pair in 4
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(got.keySet == Set(("milk", "bread"), ("bread", "milk")),
      s"rules: ${got.keySet}")
    assert(got(("milk", "bread"))  == ((4L, 7L, r4(4.0 / 7), r4(4.0 * 8 / (7 * 5)))))
    assert(got(("bread", "milk"))  == ((4L, 5L, r4(4.0 / 5), r4(4.0 * 8 / (7 * 5)))))
    // a-priori: the sub-support {milk, eggs} pair must not appear, and a
    // minConf filter drops the weaker direction only
    val conf = Analytics.associationRules(rows.toDF("basket_id", "item"),
        minSupport = 2, minConf = 0.7)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(conf == Set(("bread", "milk")))
  }

  test("eventPattern: ordered symbols, greedy non-overlapping matches") {
    val ev = Seq(
      (1L, 1L, "view", ts(0)), (1L, 2L, "click", ts(1)),
      (1L, 3L, "purchase", ts(2)), (1L, 4L, "view", ts(3)),
      (1L, 5L, "error", ts(4)), (1L, 6L, "purchase", ts(5)),
      (2L, 7L, "purchase", ts(0)), (2L, 8L, "view", ts(1)),
      // u3: "vvp" — [^p]* swallows the middle v, ONE match not two
      (3L, 9L, "view", ts(0)), (3L, 10L, "view", ts(1)),
      (3L, 11L, "purchase", ts(2))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Analytics.eventPattern(ev,
        Map("view" -> "v", "click" -> "c", "purchase" -> "p", "error" -> "e"),
        pattern = "v[^p]*p")
      .select("user_id", "seq_len", "n_matches", "has_match")
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((6L, 2L, 1)), s"u1: ${got(1L)}") // vcp + vep
    assert(got(2L) == ((2L, 0L, 0)), s"u2: ${got(2L)}") // pv: no match
    assert(got(3L) == ((3L, 1L, 1)), s"u3: ${got(3L)}")
  }

  test("eventPattern orders by ts then event_id within equal timestamps") {
    val ev = Seq(
      (1L, 2L, "purchase", ts(0)), (1L, 1L, "view", ts(0))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Analytics.eventPattern(ev, Map("view" -> "v", "purchase" -> "p"),
        "vp").select("n_matches").as[Long].head()
    assert(got == 1L, "event_id must break the ts tie (v before p)")
  }

  test("ksTest: identical samples D=0, disjoint samples D=1") {
    val same = (1 to 50).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("g", "v")
    val r0 = Analytics.ksTest(same, "g", "v", "a", "b").collect()(0)
    assert(r0.getLong(0) == 50L && r0.getLong(1) == 50L)
    assert(r0.getDouble(2) == 0.0 && r0.getInt(4) == 0, s"$r0")
    val disj = ((1 to 30).map(i => ("a", i.toDouble)) ++
      (1 to 30).map(i => ("b", 100.0 + i))).toDF("g", "v")
    val r1 = Analytics.ksTest(disj, "g", "v", "a", "b").collect()(0)
    assert(r1.getDouble(2) == 1.0 && r1.getInt(4) == 1, s"$r1")
  }

  test("ksTest bucketed ECDF equals the single-partition ECDF") {
    // adversarial bucket count (3) vs values straddling bucket edges
    val df = (1 to 101).map(i => (if (i % 3 == 0) "a" else "b",
      (i % 17).toDouble)).toDF("g", "v")
    val many = Analytics.ksTest(df, "g", "v", "a", "b", nBuckets = 3)
      .collect()(0).getDouble(2)
    val one = Analytics.ksTest(df, "g", "v", "a", "b", nBuckets = 1)
      .collect()(0).getDouble(2)
    assert(many == one, s"bucketed=$many single=$one")
  }

  test("kaplanMeier: textbook curve with conversion and censoring") {
    // u1 converts at 1 h, u2 at 2 h; u3 censored at 1 h (drops out, no
    // purchase); u4 observed past the 10 h horizon, censored there
    val ev = Seq(
      (1L, "e", ts(0)), (1L, "purchase", ts(60)),
      (2L, "e", ts(0)), (2L, "purchase", ts(150)),
      (3L, "e", ts(0)), (3L, "e", ts(90)),
      (4L, "e", ts(0)), (4L, "e", ts(20 * 60))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.kaplanMeier(ev, convType = "purchase",
        followUpHours = 10)
      .select("t_hours", "n_risk", "n_death", "surv")
      .as[(Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    // at t=1h: 4 at risk, 1 death (u3 censored AT 1h still at risk) →
    // S=0.75; at t=2h: 2 at risk (u1 dead, u3 censored), 1 death →
    // S=0.75·0.5=0.375; censor-only hours emit no row
    assert(got == List((1L, 4L, 1L, 0.75), (2L, 2L, 1L, 0.375)), s"$got")
  }

  test("kaplanMeier: survival is exactly 0 when the last at-risk cohort converts") {
    // u1 converts at 1 h; u2 AND u3 both convert at 2 h — at t=2h
    // n_death == n_risk, so S(2) = 0, not the previous 0.6-ish value
    // (Spark ln(0) is NULL and a window sum would silently skip it)
    val ev = Seq(
      (1L, "e", ts(0)), (1L, "purchase", ts(60)),
      (2L, "e", ts(0)), (2L, "purchase", ts(150)),
      (3L, "e", ts(0)), (3L, "purchase", ts(155))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.kaplanMeier(ev, convType = "purchase",
        followUpHours = 10)
      .select("t_hours", "n_risk", "n_death", "surv")
      .as[(Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(got == List((1L, 3L, 1L, 0.6667), (2L, 2L, 2L, 0.0)), s"$got")
  }

  test("welchTTest fails loudly on a missing control group") {
    val ev = Seq((1L, 1L, "va", ts(0), 1.0), (2L, 1L, "va", ts(1), 2.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      Analytics.welchTTest(ev, "event_type", control = "ctl")
    }
    assert(e.getMessage.contains("control group"), e.getMessage)
  }

  test("acf/ccf reject non-positive maxLag (descending-sequence trap)") {
    val ev = Seq((1L, 1L, "a", ts(0), 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    intercept[IllegalArgumentException] { Analytics.acf(ev, maxLag = 0) }
    intercept[IllegalArgumentException] { Analytics.ccf(ev, "a", "b", maxLag = -1) }
  }

  test("ksTest ignores NULL values instead of crashing on a null bucket") {
    val ev = Seq(
      (1L, 1L, "a", ts(0), Some(1.0)), (2L, 1L, "a", ts(1), Some(2.0)),
      (3L, 1L, "a", ts(2), None),
      (4L, 1L, "b", ts(0), Some(1.5)), (5L, 1L, "b", ts(1), Some(2.5)))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val row = Analytics.ksTest(ev, "event_type", "value", "a", "b")
      .collect()(0)
    // the null row contributes nothing: n1 counts only observed values
    assert(row.getLong(0) === 2L && row.getLong(1) === 2L, row.toString)
  }

  test("seasonalDecompose: planted two-hour profile") {
    val ev = Seq(
      (ts(0), 10.0), (ts(24L * 60), 10.0),          // hour 0: flat 10
      (ts(60), 20.0), (ts(24L * 60 + 60), 30.0)     // hour 1: 20/30
    ).toDF("ts", "value")
    val got = Analytics.seasonalDecompose(ev)
      .select("hr", "n", "hour_mean", "seasonal", "resid_sd")
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // grand mean 17.5; hour1 sd about its own mean 25: 5
    assert(got(0) == ((2L, 10.0, -7.5, 0.0)), s"${got(0)}")
    assert(got(1) == ((2L, 25.0, 7.5, 5.0)), s"${got(1)}")
  }

  test("mannWhitney: hand-computed U and z, with and without ties") {
    // g1 = {1,2}, g2 = {3,4}: R1 = 3, U1 = 0, z = -2/sqrt(5/3)
    val plain = Analytics.mannWhitney(
      Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v"),
      "g", "v", "a", "b").collect()(0)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(plain.getLong(0) == 2L && plain.getLong(1) == 2L)
    assert(plain.getDouble(2) == 0.0)
    assert(plain.getDouble(3) == r4(-2.0 / math.sqrt(5.0 / 3)), s"$plain")
    // ties: g1 = {1,1}, g2 = {1,2}: value 1 spans ranks 1..3 (avg 2),
    // U1 = 1, tie term T = 24 -> sigma = 1, z = -1
    val tied = Analytics.mannWhitney(
      Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v"),
      "g", "v", "a", "b").collect()(0)
    assert(tied.getDouble(2) == 1.0 && tied.getDouble(3) == -1.0, s"$tied")
    assert(tied.getInt(4) == 0)
  }

  test("changePoint finds a planted step; flat series splits earliest") {
    val ev = ((1 to 10).map(i => (1L, i.toLong, "a", ts(i), 0.0)) ++
      (11 to 20).map(i => (1L, i.toLong, "a", ts(i), 10.0)) ++
      (1 to 12).map(i => (2L, (100 + i).toLong, "a", ts(i), 7.0)))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = Analytics.changePoint(ev, minSeg = 5)
      .select("user_id", "n", "split_pos", "gap")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // u1: prefix mean 0, suffix mean 10 at pos 10 — the exact step
    assert(got(1L) == ((20L, 10L, 10.0)), s"${got(1L)}")
    // u2: flat — every gap 0, earliest eligible position wins
    assert(got(2L) == ((12L, 5L, 0.0)), s"${got(2L)}")
  }

  test("resampleHold carries the LAST observation flat (no interpolation)") {
    // obs at 0 min (v=10) and 180 min (v=40): hourly ticks at 60 and 120
    // must both read 10 (LOCF), where linear interpolation would read
    // 20 and 30
    val ev = Seq((1L, "a", ts(0), 10.0), (1L, "a", ts(180), 40.0))
      .toDF("user_id", "event_type", "ts", "value")
    val hold = Analytics.resampleHold(ev, stepSec = 3600L)
      .select("t", "v").as[(Long, Double)].collect().toMap
    assert(hold(3600L) == 10.0 && hold(7200L) == 10.0, s"$hold")
    // on-tick observation reads its own value
    assert(hold(0L) == 10.0 && hold(10800L) == 40.0, s"$hold")
    val lin = Analytics.resampleLinear(ev, stepSec = 3600L)
      .select("t", "v").as[(Long, Double)].collect().toMap
    assert(lin(3600L) == 20.0 && lin(7200L) == 30.0, s"$lin")
  }

  test("acf: hand-computed series, dense-grid zero fill, lag bounds") {
    // daily counts for type "a": days 0..4 → x = [2, 1, 0, 3, 1]
    // (day 2 has NO events — the dense grid must fill it with 0)
    def day(d: Int, k: Int) = (0 until k).map(i =>
      ("a", new Timestamp(d * 86400000L + i * 1000L)))
    val ev = (day(0, 2) ++ day(1, 1) ++ day(3, 3) ++ day(4, 1))
      .toDF("event_type", "ts")
    val got = Analytics.acf(ev, maxLag = 3)
      .select("event_type", "lag", "r")
      .as[(String, Int, Double)].collect()
      .map { case (_, l, r) => l -> r }.toMap
    // x̄ = 7/5; hand computation with c_t = 5·x_t − 7:
    //   c = [3, -2, -7, 8, -2], den = Σc² = 9+4+49+64+4 = 130
    //   lag1: 3·(−2) + (−2)(−7) + (−7)(8) + 8·(−2) = −64
    //   lag2: 3·(−7) + (−2)(8) + (−7)(−2) = −23
    //   lag3: 3·8 + (−2)(−2) = 28
    assert(got(1) === -64.0 / 130.0)
    assert(got(2) === -23.0 / 130.0)
    assert(got(3) === 28.0 / 130.0)
    assert(got.size === 3)
  }

  test("acf: constant series excluded (zero variance), maxLag honored") {
    val ev = (0 until 4).map(d => ("c", new Timestamp(d * 86400000L)))
      .toDF("event_type", "ts")
    assert(Analytics.acf(ev, maxLag = 2).count() === 0L)
    val mixed = ((0 until 4).map(d => ("c", new Timestamp(d * 86400000L))) ++
        Seq(("v", new Timestamp(0L)), ("v", new Timestamp(0L)),
            ("v", new Timestamp(86400000L))))
      .toDF("event_type", "ts")
    val rows = Analytics.acf(mixed, maxLag = 5)
      .select("event_type", "lag").as[(String, Int)].collect()
    // "v" spans 2 days → only lag 1 exists; "c" is constant → dropped
    assert(rows.toSet === Set(("v", 1)))
  }

  test("pointInTimeJoin: boundary lands on the NEW version, pre-history drops") {
    // dim: user 1 is 'a' from t=100, 'b' from t=200 (open)
    val dim = Seq(
      (1L, "a", 100L, Option(200L)),
      (1L, "b", 200L, Option.empty[Long])
    ).toDF("user_id", "attr", "valid_from", "valid_to")
    val fact = Seq(
      (10L, 1L, 50L),   // before first version → dropped
      (11L, 1L, 100L),  // exactly at first valid_from → 'a'
      (12L, 1L, 199L),  // last second of 'a'
      (13L, 1L, 200L),  // boundary: belongs to 'b', NOT 'a'
      (14L, 1L, 9999L), // open current version
      (15L, 2L, 150L)   // unknown key → dropped
    ).toDF("event_id", "user_id", "t")
    val got = Analytics.pointInTimeJoin(fact, dim, "user_id")
      .select("event_id", "attr").as[(Long, String)].collect().toMap
    assert(got === Map(11L -> "a", 12L -> "a", 13L -> "b", 14L -> "b"))
  }

  test("ccf: perfect one-day lead-lag, shared grid, other types ignored") {
    // view on day 0, purchase on day 1 → x = [1,0], y = [0,1]
    // cx = [1,−1], cy = [−1,1], dx = dy = 2
    val ev = Seq(
      ("view", new Timestamp(0L)),
      ("purchase", new Timestamp(86400000L)),
      ("error", new Timestamp(10 * 86400000L)) // must NOT stretch the grid
    ).toDF("event_type", "ts")
    val got = Analytics.ccf(ev, "view", "purchase", maxLag = 1)
      .select("lag", "r").as[(Int, Double)].collect().toMap
    val s2 = math.sqrt(2.0)
    assert(got(0) === -2.0 / (s2 * s2))   // anti-aligned at lag 0
    assert(got(1) === 1.0 / (s2 * s2))    // purchase follows view by 1 day
    assert(got(-1) === 1.0 / (s2 * s2))   // symmetric tiny series
    assert(got.size === 3)
  }
}
