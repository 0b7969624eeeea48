package graft.operators

import graft.core.GraftCheckpointOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream product analytics: ordered funnels and cohort retention —
  * the reference's event-sessionization family taken to its two standard
  * OLAP endpoints.
  *
  * Scale shape: both operators are per-user aggregations — one shuffle on
  * user_id each — and the funnel's per-step refinement joins the compact
  * per-user step-time table (|users| rows) back to the events scan, never
  * events-to-events. Timestamps compare as epoch seconds (the catalog's
  * cross-engine numeric contract).
  */
object Analytics {

  /** Ordered funnel: for each user, the earliest chain
    * t₁ < t₂ < … < tₙ with tᵢ an event of `steps(i−1)` and the whole chain
    * inside `withinSec` of t₁. GREEDY-EARLIEST chain (each tᵢ is the
    * earliest qualifying event after tᵢ₋₁) — the standard product-funnel
    * semantics. Returns one row per step:
    * (step, event_type, n_users, conv_pct) with conversion relative to
    * step 1.
    *
    * Each refinement round shuffles only the |users|-row frontier; the
    * events table is probed `steps.size` times map-side (same scan,
    * pushed filter on event_type). */
  def funnel(events: DataFrame, steps: Seq[String], withinSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col("user_id"), col("event_type"),
      col("ts").cast("long").as("t"))
    // frontier: (user_id, t_prev, t_first)
    var frontier = ev.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("t")).as("t_prev"))
      .withColumn("t_first", col("t_prev"))
      .graftCheckpoint()
    val counts = Seq.newBuilder[(Int, String, Long)]
    counts += ((1, steps.head, frontier.count()))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      frontier = ev.where(col("event_type") === step)
        .join(frontier, "user_id")
        .where(col("t") > col("t_prev") &&
          col("t") <= col("t_first") + withinSec)
        .groupBy(col("user_id"), col("t_first"))
        .agg(min(col("t")).as("t_prev"))
        .graftCheckpoint()
      counts += ((i + 1, step, frontier.count()))
    }
    val rows = counts.result()
    val base = math.max(1L, rows.head._3).toDouble
    val spark = events.sparkSession
    import spark.implicits._
    rows.toDF("step", "event_type", "n_users")
      .withColumn("conv_pct",
        floor(col("n_users") / base * 1e4 + lit(0.5)) / 1e2)
  }

  /** First-order Markov transition matrix of the event stream: counts and
    * row-normalized probabilities of (event_type → next event_type) per
    * user-ordered sequence — the behavioral-model summary a funnel is a
    * special case of. One lag window per user + one (from, to) count;
    * probabilities at 4 dp (sum-order-safe: numerator and denominator are
    * exact counts, one division per row). */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next", lead(col("event_type"), 1).over(w))
      .where(col("next").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (floor(col("n") / col("tot") * 1e4 + lit(0.5)) / 1e4).as("p"))
  }

  /** SCD-2 validity-interval history from an event log: one row per RUN
    * of equal `attr` values per key, (key, attr, valid_from, valid_to),
    * half-open [from, to), the current run open-ended (valid_to null).
    * Change detection is lag() per key; interval close is the next
    * change's timestamp — two window passes over the same key ordering
    * (one shuffle; Spark reuses the sort). The warehouse twin of
    * [[WebOps.snapshotMerge]]: merge answers "what is", this answers
    * "what was when". Timestamps surface as epoch seconds (the
    * cross-engine contract). */
  def scd2History(events: DataFrame, key: String, attr: String): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("t"), col("event_id"))
    val changes = events
      .select(col(key), col(attr), col("event_id"),
        col("ts").cast("long").as("t"))
      .withColumn("__prev", lag(col(attr), 1).over(ord))
      .where(col("__prev").isNull || col("__prev") =!= col(attr))
    val seq = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("t"), col("event_id"))
    changes
      .withColumn("valid_to", lead(col("t"), 1).over(seq))
      .select(col(key), col(attr), col("t").as("valid_from"), col("valid_to"))
  }

  /** Point-in-time join (the feature-store lookup): each fact row
    * (key, t, …) joins the [[scd2History]] dimension version valid at its
    * own timestamp — valid_from ≤ t < valid_to, open current version
    * included. Inner semantics: facts before the key's first version drop.
    *
    * Scale shape: equi-join on the key, interval predicate as a post-join
    * filter — per-key candidate product is versions(key), bounded by the
    * attribute's change count, not the fact volume. For dimensions with
    * per-key version counts in the thousands, switch to the [[AsOf]]
    * carry-forward machinery (union + one window pass) — same answer,
    * no candidate product.
    */
  def pointInTimeJoin(fact: DataFrame, dim: DataFrame, key: String): DataFrame = {
    val f = fact.as("f")
    val d = dim.as("d")
    f.join(d, col(s"f.$key") === col(s"d.$key") &&
        col("f.t") >= col("d.valid_from") &&
        (col("d.valid_to").isNull || col("f.t") < col("d.valid_to")))
      .select(fact.columns.map(c => col(s"f.$c")) ++
        dim.columns.filterNot(_ == key).map(c => col(s"d.$c")): _*)
  }

  /** Rolling z-score anomaly detection over each user's value stream: for
    * every event with ≥ `lookback` predecessors, z = (v − μ)/σ of the
    * PRECEDING `lookback` values (the event itself excluded — no
    * self-masking). μ/σ are written as EXPLICIT sum / sum-of-squares
    * algebra — var = (Σv² − n·μ²)/(n−1) — not `stddev_samp`, so any engine
    * mirroring the formula agrees to sum-order ulps (the 4 dp contract);
    * Welford-style built-ins differ in accumulation, explicit algebra
    * doesn't. One user-keyed shuffle; per-user frames are the natural
    * partitioning of a telemetry stream at any scale. Returns
    * (user_id, event_id, v, z, is_anomaly).
    *
    * Zero-variance lookback windows (a flat stream) are guarded twice:
    * the variance is clamped to ≥ 0 before sqrt (floating-point
    * cancellation can push Σv² − n·μ² a hair negative → NaN), and when
    * σ = 0 the row emits z = 0 / is_anomaly = false — without the guard
    * z is NaN/±Inf and Spark's NaN ordering makes abs(NaN) > threshold
    * TRUE, flagging every row of a perfectly flat stream. */
  def rollingAnomaly(events: DataFrame, lookback: Int = 10,
                     zThreshold: Double = 2.0): DataFrame = {
    require(lookback >= 2, s"lookback=$lookback")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"), col("event_id"))
      .rowsBetween(-lookback, -1)
    val n = lit(lookback.toDouble)
    val s1 = sum(col("value")).over(w)
    val cnt = count(col("value")).over(w)
    val s2 = sum(col("value") * col("value")).over(w)
    events
      .withColumn("__n", cnt)
      .withColumn("__m", s1 / n)
      .withColumn("__sd", sqrt(
        greatest(lit(0.0), s2 - n * (s1 / n) * (s1 / n)) / (n - lit(1.0))))
      .where(col("__n") === lookback)
      .select(col("user_id"), col("event_id"), col("value").as("v"),
        when(col("__sd") > 0.0,
          (col("value") - col("__m")) / col("__sd")).otherwise(lit(0.0)).as("z"),
        col("__sd"))
      .withColumn("is_anomaly", col("__sd") > 0.0 && abs(col("z")) > zThreshold)
      .drop("__sd")
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * first event; a cohort's week-w retention is the number of its users
    * with any event in week (cohort + w). Weeks are epoch-days/7 (both
    * engines integer-exact). Returns (cohort_week, week_offset, n_users).
    *
    * Two shuffles: first-event per user, then (cohort, offset) count over
    * the distinct per-user activity weeks. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      floor(col("ts").cast("long") / lit(86400L)).cast("long").as("d"))
      .select(col("user_id"), floor(col("d") / 7L).cast("long").as("w"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
    ev.join(cohort, "user_id")
      .select(col("user_id"), col("cw"), (col("w") - col("cw")).as("off"))
      .distinct()
      .groupBy(col("cw").as("cohort_week"), col("off").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user OLS trend of `value` over time: closed-form simple linear
    * regression from five sufficient statistics — slope = (nΣxy − ΣxΣy)
    * / (nΣx² − (Σx)²) — reported per day. One aggregation, no iteration:
    * regression at any corpus size is ONE partial+final agg pass.
    *
    * Engine-determinism contract (the rolling-z-score lesson, explicit
    * algebra only): x is INTEGER seconds since the user's own first event
    * (x, x², n, Σx, Σx² all exact integers — centering also keeps Σx²
    * ~1e14 instead of the ~1e20 of raw epochs, which would shred double
    * precision); the only inexact sums are Σy and Σxy whose order-of-
    * addition ulps sit ~10 orders below the 4 dp rounding. Users with
    * fewer than 2 distinct timestamps (zero variance) are excluded —
    * their slope is undefined, not zero. */
  def olsTrend(events: DataFrame): DataFrame = {
    val ep = col("ts").cast("long")
    val centered = events
      .withColumn("__x0", min(ep).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .select(col("user_id"), (ep - col("__x0")).as("x"),
        col("value").as("y"))
    centered
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        // Σx² as DECIMAL(38,0): a heavy multi-year user's sum crosses
        // Long.MaxValue (ANSI would abort); exact either way
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast("double") * col("y")).as("sxy"))
      // variance test and denominator in DOUBLE: n·Σx² and (Σx)² stay
      // exact as longs only up to ~1e18 — a heavy user's years of events
      // would overflow the integer product, the double loses only ulps
      .where(col("n").cast("double") * col("sxx") >
             col("sx").cast("double") * col("sx"))
      .select(col("user_id"), col("n"),
        expr("""floor((n * sxy - sx * sy) /
                      (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * 86400 * 1e4 + 0.5) / 1e4""").as("slope_per_day"))
  }

  /** Welch two-sample t-test per experiment group pair — the A/B readout:
    * for each value of `groupCol` (the variant) against the named
    * `control` group, t = (x̄_v − x̄_c) / √(s²_v/n_v + s²_c/n_c) with
    * Welch–Satterthwaite dof — no equal-variance assumption. ONE
    * aggregation to per-group sufficient statistics (n, Σy, Σy²), then
    * the test runs on the group-count-sized table. Returns
    * (variant, n_v, n_c, mean_diff, t_stat, dof) all rounded 4 dp;
    * explicit-algebra variance ((Σy² − (Σy)²/n)/(n−1)) keeps the op
    * sequence engine-portable (the rolling-z-score lesson). Groups with
    * n < 2 are excluded (undefined variance). */
  def welchTTest(events: DataFrame, groupCol: String,
                 control: String): DataFrame = {
    val g = events
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sy"),
        sum(col("value") * col("value")).as("syy"))
      .where(col("n") >= 2)
      .select(col("grp"), col("n"), (col("sy") / col("n")).as("mean"),
        ((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1))
          .as("v"))
    val c = g.where(col("grp") === control)
      .select(col("n").as("n_c"), col("mean").as("mean_c"),
        col("v").as("v_c"))
    // a missing (or single-row, variance-undefined) control group would
    // wipe every variant through the cross join — indistinguishable from
    // "no significant variants"; fail loudly instead (the ksTest /
    // mannWhitney empty-group contract)
    require(!c.isEmpty,
      s"welchTTest: control group '$control' absent or has < 2 rows")
    g.where(col("grp") =!= control)
      .crossJoin(broadcast(c))
      .select(col("grp").as("variant"), col("n").as("n_v"), col("n_c"),
        expr("floor((mean - mean_c) * 1e4 + 0.5) / 1e4").as("mean_diff"),
        expr("""floor((mean - mean_c) / sqrt(v / n + v_c / n_c)
                      * 1e4 + 0.5) / 1e4""").as("t_stat"),
        expr("""floor(pow(v / n + v_c / n_c, 2) /
                      (pow(v / n, 2) / (n - 1) + pow(v_c / n_c, 2) / (n_c - 1))
                      * 1e4 + 0.5) / 1e4""").as("dof"))
  }

  /** Truncated EWMA smoothing of `value` per user: the last `lookback`
    * events weighted (1−α)^distance and renormalized — the
    * finite-window form of exponential smoothing (the infinite-memory
    * recurrence isn't window-expressible, and at (1−α)^8 a weight is
    * already 0.4% of the newest for α = 0.5). Returns
    * (user_id, event_id, ewma) rounded 4 dp.
    *
    * Engine-determinism contract: the frame list is collected in frame
    * order ((user, ts) rows are unique in the events table — verified
    * both SFs), weighted and summed by an ORDERED left fold (HOF
    * `aggregate`, never a float sum whose order the engine may choose),
    * and α = 0.5 (the default) makes every weight an exact dyadic so the
    * only inexact ops are the value multiplies and the ordered adds —
    * the same IEEE sequence in any engine with a list fold. One window
    * shuffle; per-row state is the `lookback`-bounded list. */
  def ewmaSmooth(events: DataFrame, alpha: Double = 0.5,
                 lookback: Int = 8): DataFrame = {
    require(alpha > 0 && alpha < 1 && lookback >= 1,
      s"alpha=$alpha lookback=$lookback")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(-(lookback - 1), 0)
    val q = 1 - alpha
    events
      .withColumn("__vs", collect_list(col("value")).over(w))
      .select(col("user_id"), col("event_id"),
        expr(s"""floor(
          aggregate(transform(__vs, (x, i) ->
              x * pow($q, size(__vs) - 1 - i)), 0D, (a, x) -> a + x)
          / aggregate(transform(__vs, (x, i) ->
              pow($q, size(__vs) - 1 - i)), 0D, (a, x) -> a + x)
          * 1e4 + 0.5) / 1e4""").as("ewma"))
  }

  /** Pairwise association rules (market-basket): for item pairs co-present
    * in ≥ `minSupport` baskets, both directed rules a→b with
    * confidence = n_ab/n_a and lift = n_ab·N/(n_a·n_b) (Agrawal–Srikant
    * support/confidence framing, lift as the independence-normalized
    * strength — the PMI exponential). `baskets` is (basket_id, item);
    * duplicates within a basket collapse. Returns (antecedent, consequent,
    * n_pair, n_ante, confidence, lift) with conf ≥ `minConf`, both rounded
    * 4 dp (round-before-rank).
    *
    * Scale shape — the a-priori downward-closure prefilter: an item in
    * fewer than `minSupport` baskets cannot be in a frequent pair, so the
    * item-frequency table is filtered FIRST and semi-joined (broadcast,
    * frequency-table-sized) before any pair is formed. Pair enumeration
    * is a basket-keyed SELF-JOIN — deliberately NOT the per-basket
    * higher-order expression [[CorpusOps.pmiPairs]] uses: nested HOF
    * lambdas evaluate interpreted (outside codegen) and the slice-per-
    * element form is O(k²) array copies, measured 40 s for 38M pairs at
    * the 32× probe where this codegen join path runs the same volume in
    * seconds. pmiPairs keeps the HOF because its vocabulary cap bounds
    * the interpreted work; an open item space has no such bound. Both
    * self-join sides share one basket_id exchange (exchange reuse), and
    * item frequencies join AFTER the support filter, against the
    * rule-count-sized pair table — never carried through the explosion. */
  def associationRules(baskets: DataFrame, minSupport: Long = 3,
                       minConf: Double = 0.0,
                       knownCount: Option[Long] = None): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport")
    val spark = baskets.sparkSession
    val b = baskets.toDF("basket_id", "item")
    val n = knownCount.getOrElse(
      b.select(col("basket_id")).distinct().count())
    // the transaction table is read by the frequency pass AND both
    // self-join sides — cache it (the MLlib-FPGrowth multi-pass-mining
    // precedent; the CC edge-list lesson), released before returning
    val bi = b.distinct().cache()
    // item-frequency-sized (bounded); checkpointed once so its three
    // consumers (prefilter + two post-filter n_i joins) don't re-drive
    // the corpus-sized distinct+aggregate
    val freq = bi.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
      .where(col("n_i") >= minSupport)
      .graftCheckpoint()
    // pre-partitioned on the join key and cached: both self-join sides
    // read the SAME in-memory partitioning, so the pair join runs with
    // zero exchange (measured 70 -> ~35 s at the 32× probe)
    val confParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val biF = bi.join(broadcast(freq.select(col("item"))), Seq("item"))
      .repartition(confParts, col("basket_id"))
      .cache()
    val pairs = biF.select(col("basket_id"), col("item").as("a"))
      .join(biF.select(col("basket_id"), col("item").as("b")),
        Seq("basket_id"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minSupport)
      .join(broadcast(freq.select(col("item").as("a"), col("n_i").as("n_a"))),
        Seq("a"))
      .join(broadcast(freq.select(col("item").as("b"), col("n_i").as("n_b"))),
        Seq("b"))
      // rule-count-sized after the support filter; the EAGER checkpoint
      // materializes the whole mining pipeline, which both lets the
      // fwd/rev directions below read it instead of re-driving the pair
      // join and makes releasing the working caches safe right here
      .graftCheckpoint()
    bi.unpersist()
    biF.unpersist()
    val fwd = pairs.select(col("a").as("antecedent"),
      col("b").as("consequent"), col("n_pair"), col("n_a").as("n_ante"),
      col("n_b").as("n_cons"))
    val rev = pairs.select(col("b").as("antecedent"),
      col("a").as("consequent"), col("n_pair"), col("n_b").as("n_ante"),
      col("n_a").as("n_cons"))
    fwd.unionByName(rev)
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        col("n_ante"),
        expr("floor(n_pair / CAST(n_ante AS DOUBLE) * 1e4 + 0.5) / 1e4")
          .as("confidence"),
        expr(s"floor(n_pair * $n.0 / (n_ante * n_cons) * 1e4 + 0.5) / 1e4")
          .as("lift"))
      .where(col("confidence") >= minConf)
  }

  /** Daily top-k trending event types with rank movement: per epoch-day,
    * event types rank by count (ties break on name — total order, engine
    * portable); the top `k` rows also report yesterday's rank (null on
    * first appearance) and the delta. Everything after the one (day,
    * type) count shuffle runs on the day×type table — corpus-size
    * independent. Returns (day, event_type, n, rnk, prev_rnk, delta). */
  def trendingTopK(events: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"k=$k")
    val w = org.apache.spark.sql.expressions.Window
    val counts = events
      .select(floor(col("ts").cast("long") / lit(86400L)).cast("long").as("day"),
        col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("n"))
    val ranked = counts.withColumn("rnk", row_number().over(
      w.partitionBy(col("day")).orderBy(col("n").desc, col("event_type"))))
    // yesterday's rank arrives by self-join on (day+1, type): the ranked
    // table is day×type-sized, so this join is metadata-scale
    val prev = ranked.select((col("day") + 1).as("day"),
      col("event_type"), col("rnk").as("prev_rnk"))
    ranked.where(col("rnk") <= k)
      .join(prev, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"), col("n"), col("rnk"),
        col("prev_rnk"), (col("prev_rnk") - col("rnk")).as("delta"))
  }

  /** First/last-touch attribution: each conversion event is joined to the
    * earliest and latest `touchType` event of the same user in the
    * preceding `windowSec` (inclusive of the conversion instant). One
    * user-keyed RANGE-frame window over the tagged union — no self-join
    * of events against events, so a hot user costs its own row count,
    * not its square. Conversions with no touch in-window keep nulls.
    * Returns (user_id, event_id, t, first_t, last_t). */
  def touchAttribution(events: DataFrame, convType: String,
                       touchType: String, windowSec: Long = 86400L): DataFrame = {
    require(windowSec >= 1, s"windowSec=$windowSec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(-windowSec, 0)
    events
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("t"), col("event_type"))
      .where(col("event_type").isin(convType, touchType))
      .withColumn("first_t",
        min(when(col("event_type") === touchType, col("t"))).over(w))
      .withColumn("last_t",
        max(when(col("event_type") === touchType, col("t"))).over(w))
      .where(col("event_type") === convType)
      .select(col("user_id"), col("event_id"), col("t"),
        col("first_t"), col("last_t"))
  }

  /** Rolling 7-day active users (WAU) per day, plus that day's DAU:
    * window COUNT(DISTINCT) doesn't exist in Spark (or most engines), so
    * each (user, active-day) pair EXPLODES its 7-day contribution range
    * and the target day aggregates exact distinct users — the standard
    * dual of a sliding window. The explode multiplies the (user, day)
    * DISTINCT table (not raw events) by 7; days without activity don't
    * appear. Returns (day, dau, wau). */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays")
    val ud = events
      .select(col("user_id"),
        floor(col("ts").cast("long") / lit(86400L)).cast("long").as("day"))
      .distinct()
    val bounds = ud.agg(max(col("day"))).collect()(0)
    require(!bounds.isNullAt(0), "rollingActiveUsers: empty input")
    val maxDay = bounds.getLong(0)
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("day"),
        least(col("day") + (windowDays - 1), lit(maxDay)))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    // days with no activity of their own still have a WAU from the
    // trailing window; keep only observed days for a stable contract
    dau.join(wau, Seq("day"), "left")
      .select(col("day"), col("dau"), col("wau"))
  }

  /** Per-key time-series resampling onto a regular grid with linear
    * interpolation — telemetry normalization before any windowed model
    * (irregular event times → fixed `stepSec` ticks per user, value
    * linearly interpolated between the bracketing observations, held flat
    * outside them).
    *
    * Shape: observations collapse to one row per (user, second) (min —
    * deterministic under duplicate timestamps, unlike a float avg), the
    * per-user grid explodes from a `sequence()` over that user's own
    * [min, max] span (no driver loop, no global calendar), and
    * interpolation is TWO window passes over the union — forward
    * carry-last, backward carry-first — partitioned by user: one shuffle,
    * per-user state, scale-independent of the grid density of any other
    * key. Observations landing exactly on a tick short-circuit to their
    * own value (prev == next guard). Returns (user_id, t, v). */
  def resampleLinear(events: DataFrame, stepSec: Long = 3600L): DataFrame = {
    require(stepSec >= 1, s"stepSec=$stepSec")
    val obs = events
      .select(col("user_id"), col("ts").cast("long").as("t"), col("value"))
      .groupBy(col("user_id"), col("t")).agg(min(col("value")).as("v"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
      // integer ceil/floor division (epoch seconds are nonnegative) — no
      // float rounding to disagree with a mirroring engine
      .select(col("user_id"),
        expr(s"(mn + ${stepSec - 1}) div $stepSec").as("lo"),
        expr(s"mx div $stepSec").as("hi"))
      // a span with no grid boundary (single observation, or all events
      // strictly inside one step) has lo > hi, where sequence(lo, hi)
      // would generate DESCENDING [lo..hi] instead of empty
      .where(col("lo") <= col("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("k"))
      .select(col("user_id"), (col("k") * stepSec).as("t"))
    val tagged = obs.withColumn("is_obs", lit(1))
      .unionByName(grid.withColumn("v", lit(null).cast("double"))
        .withColumn("is_obs", lit(0)))
    // obs sorts BEFORE the grid row at the same t in both directions, so
    // an on-tick observation becomes its own prev AND next
    val fwd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_obs").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bwd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("t").desc, col("is_obs").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    tagged
      .withColumn("pt", last(when(col("is_obs") === 1, col("t")), ignoreNulls = true).over(fwd))
      .withColumn("pv", last(when(col("is_obs") === 1, col("v")), ignoreNulls = true).over(fwd))
      .withColumn("nt", last(when(col("is_obs") === 1, col("t")), ignoreNulls = true).over(bwd))
      .withColumn("nv", last(when(col("is_obs") === 1, col("v")), ignoreNulls = true).over(bwd))
      .where(col("is_obs") === 0)
      .select(col("user_id"), col("t"),
        when(col("pt").isNull, col("nv"))
          .when(col("nt").isNull, col("pv"))
          .when(col("nt") === col("pt"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("t") - col("pt")) / (col("nt") - col("pt")))
          .as("v"))
  }

  /** LOCF resampling (last observation carried forward): per-key hourly
    * grid where each tick holds the most recent observation at-or-before
    * it — the step-function semantics telemetry/finance pipelines use
    * where [[resampleLinear]]'s interpolation would invent values (a
    * gauge that was 5 stays 5 until re-read). Ticks before a key's first
    * observation are absent (nothing to carry). Same grid construction
    * and single user-keyed window shuffle as resampleLinear, forward
    * pass only. Returns (user_id, t, v). */
  def resampleHold(events: DataFrame, stepSec: Long = 3600L): DataFrame = {
    require(stepSec >= 1, s"stepSec=$stepSec")
    val obs = events
      .select(col("user_id"), col("ts").cast("long").as("t"), col("value"))
      .groupBy(col("user_id"), col("t")).agg(min(col("value")).as("v"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
      .select(col("user_id"),
        expr(s"(mn + ${stepSec - 1}) div $stepSec").as("lo"),
        expr(s"mx div $stepSec").as("hi"))
      // no boundary inside [mn, mx] → lo > hi → sequence would descend;
      // emit nothing (same guard as resampleLinear)
      .where(col("lo") <= col("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("k"))
      .select(col("user_id"), (col("k") * stepSec).as("t"))
    val tagged = obs.withColumn("is_obs", lit(1))
      .unionByName(grid.withColumn("v", lit(null).cast("double"))
        .withColumn("is_obs", lit(0)))
    val fwd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_obs").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    tagged
      .withColumn("pv", last(when(col("is_obs") === 1, col("v")),
        ignoreNulls = true).over(fwd))
      .where(col("is_obs") === 0 && col("pv").isNotNull)
      .select(col("user_id"), col("t"), col("pv").as("v"))
  }

  /** Batch complex-event-processing: regex pattern matching over each
    * user's ordered event-symbol sequence — the batch twin of Flink CEP
    * (the reference framework's flagship feature; the reference itself
    * orders per-sample FASTQ streams the same way, `workflow.py` pairing
    * stage). Each event type maps to one symbol char; a user's events in
    * (ts, event_id) order concatenate to a string; `pattern` is matched
    * non-overlapping (leftmost, greedy — identical in Java regex and
    * RE2 for patterns without alternation ambiguity, which is the
    * supported subset).
    *
    * Returns (user_id, seq_len, n_matches, has_match). Scale shape: ONE
    * shuffle on user_id into a single codegen'd aggregate —
    * `array_sort(collect_list(...))` + HOF transform + one regexp pass.
    * Per-user sequence length is bounded by per-user event count (the
    * sessionization bound; a user is a bounded entity at any corpus
    * scale — documents/devices with millions of events belong in
    * sessionized sub-keys upstream). */
  def eventPattern(events: DataFrame, symbols: Map[String, String],
                   pattern: String): DataFrame = {
    require(symbols.values.forall(_.length == 1),
      s"symbols must map to single chars: $symbols")
    val sym = symbols.foldLeft(lit("_")) { case (acc, (k, v)) =>
      when(col("event_type") === k, lit(v)).otherwise(acc)
    }
    events
      .select(col("user_id"), col("ts").cast("long").as("t"),
        col("event_id"), sym.as("sym"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("t"), col("event_id"),
        col("sym")))).as("seq"))
      .select(col("user_id"),
        array_join(expr("transform(seq, x -> x.sym)"), "").as("s"))
      .select(col("user_id"),
        length(col("s")).cast("long").as("seq_len"),
        regexp_count(col("s"), lit(pattern)).cast("long").as("n_matches"))
      .withColumn("has_match",
        (col("n_matches") > 0).cast("int"))
  }

  /** Two-sample Kolmogorov–Smirnov test between the `valueCol`
    * distributions of groups `g1` and `g2`: D = sup |F1(x) − F2(x)|,
    * evaluated at every distinct observed value, plus the α=0.05
    * rejection threshold c(α)·√((n1+n2)/(n1·n2)), c(0.05)=1.358.
    * Completes the drift family (PSI buckets, χ² categories — KS is the
    * distribution-free continuous test).
    *
    * Scale shape: one groupBy on value collapses the data to
    * |distinct values| rows of (value, c1, c2) partial counts — the ONLY
    * full-data shuffle. The ECDF prefix sums then run per range-bucket
    * (two-pass parallel prefix sum: per-bucket subtotals to the driver —
    * `nBuckets` rows — broadcast back as exclusive offsets), so no
    * global single-partition window touches the distinct-value table. */
  def ksTest(events: DataFrame, groupCol: String, valueCol: String,
             g1: String, g2: String, nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets")
    // NULL values carry no rank/ECDF information and would otherwise
    // surface as a NULL bucket key (driver NPE) — the tests operate on
    // observed values only
    val tagged = events.where(col(groupCol).isin(g1, g2))
      .where(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"),
        when(col(groupCol) === g1, 1L).otherwise(0L).as("i1"),
        when(col(groupCol) === g2, 1L).otherwise(0L).as("i2"))
    val byValue = tagged.groupBy(col("v"))
      .agg(sum(col("i1")).as("c1"), sum(col("i2")).as("c2"))
      .graftCheckpoint() // consumed 3× below (bounds, offsets, ecdf)
    val bounds = byValue.agg(min(col("v")), max(col("v")),
        coalesce(sum(col("c1")), lit(0L)), coalesce(sum(col("c2")), lit(0L)))
      .collect().head
    // fail with the designed diagnostic BEFORE the offsets machinery can
    // hit offs.last / null-cast artifacts on an empty filter result
    require(bounds.getLong(2) > 0 && bounds.getLong(3) > 0,
      s"ksTest: empty group n1=${bounds.getLong(2)} n2=${bounds.getLong(3)}")
    val (mnr, mxr) = (bounds.getDouble(0), bounds.getDouble(1))
    val span = math.max(mxr - mnr, java.lang.Double.MIN_NORMAL)
    val bucketed = byValue.withColumn("b",
      least(floor((col("v") - lit(mnr)) / lit(span) * nBuckets),
        lit(nBuckets - 1L)).cast("int"))
    // per-bucket subtotals → exclusive prefix offsets (nBuckets rows)
    val offs = bucketed.groupBy(col("b"))
      .agg(sum(col("c1")).as("s1"), sum(col("c2")).as("s2"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    val cum = offs.scanLeft((0L, 0L)) { case ((a1, a2), (_, (s1, s2))) =>
      (a1 + s1, a2 + s2) }.init
    val off1 = map(offs.map(_._1).zip(cum).flatMap {
      case (b, (o1, _)) => Seq(lit(b), lit(o1)) }: _*)
    val off2 = map(offs.map(_._1).zip(cum).flatMap {
      case (b, (_, o2)) => Seq(lit(b), lit(o2)) }: _*)
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ecdf = bucketed
      .withColumn("f1", sum(col("c1")).over(wb) + element_at(off1, col("b")))
      .withColumn("f2", sum(col("c2")).over(wb) + element_at(off2, col("b")))
    // totals come straight from the bounds row collected above (the early
    // empty-group require already guaranteed both are > 0)
    val (n1, n2) = (bounds.getLong(2), bounds.getLong(3))
    ecdf.agg(max(abs(col("f1") / lit(n1.toDouble) -
        col("f2") / lit(n2.toDouble))).as("d"))
      .select(lit(n1).as("n1"), lit(n2).as("n2"),
        (floor(col("d") * 1e4 + lit(0.5)) / 1e4).as("d_stat"),
        (floor(lit(1.358) * sqrt(lit((n1 + n2).toDouble / (n1.toDouble * n2))) * 1e4
          + lit(0.5)) / 1e4).as("crit_05"))
      .withColumn("reject_05", (col("d_stat") > col("crit_05")).cast("int"))
  }

  /** Offline change-point detection (binary-segmentation first split):
    * per key, the split position maximizing |mean(prefix) − mean(suffix)|
    * over the key's time-ordered values — computed from ONE pair of
    * prefix-sum windows (no per-candidate rescan), the standard
    * screening step before CUSUM/PELT refinement. Values convert to
    * EXACT integer cents first, so every prefix/total sum is
    * order-independent-exact and the gap doubles are bit-identical in
    * any engine (raw double sums flipped two 4dp boundaries at sf0.1);
    * gap rounds to 4dp BEFORE the argmax (earliest-position tie-break)
    * so the chosen split is engine-exact. Returns
    * (user_id, n, split_pos, gap) for keys with ≥ 2·minSeg
    * observations; splits respect `minSeg` on both sides (mean of
    * < minSeg points is noise, not a regime).
    *
    * Scale shape: one user-keyed shuffle; both windows and the argmax
    * run inside the per-user frame (bounded by per-user event count —
    * the sessionization bound). */
  def changePoint(events: DataFrame, minSeg: Int = 5): DataFrame = {
    require(minSeg >= 1, s"minSeg=$minSeg")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val scored = events
      .select(col("user_id"), col("ts").cast("long").as("t"),
        col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
      .withColumn("pos", row_number().over(w))
      .withColumn("ps", sum(col("v")).over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("st", sum(col("v")).over(wAll))
      .where(col("pos") >= minSeg && col("pos") <= col("n") - minSeg)
      .withColumn("gap",
        floor(abs(col("ps") / col("pos").cast("double") -
            (col("st") - col("ps")) / (col("n") - col("pos")).cast("double"))
          / 100.0 * 1e4 + lit(0.5)) / 1e4)
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("gap").desc, col("pos").asc)
    scored.withColumn("rn", row_number().over(wBest))
      .where(col("rn") === 1)
      .select(col("user_id"), col("n").cast("long").as("n"),
        col("pos").cast("long").as("split_pos"), col("gap"))
  }

  /** Mann–Whitney U rank-sum test (Wilcoxon two-sample): the
    * non-parametric location test next to Welch (means), KS (shape) and
    * χ² (categories). Average ranks for ties, tie-corrected normal
    * approximation: z = (U₁ − n₁n₂/2) / σ with
    * σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1))).
    *
    * Exactness: ranks are half-integers, so every rank sum is EXACT in
    * doubles (no summation-order sensitivity) — only the final z divide/
    * sqrt rounds, on identical operands in any engine. Scale shape: same
    * as [[ksTest]] — one value-keyed collapse to distinct-value counts,
    * bucketed two-pass parallel prefix sum for the rank offsets, final
    * 1-row aggregate. */
  def mannWhitney(events: DataFrame, groupCol: String, valueCol: String,
                  g1: String, g2: String, nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets")
    // NULL values carry no rank/ECDF information and would otherwise
    // surface as a NULL bucket key (driver NPE) — the tests operate on
    // observed values only
    val tagged = events.where(col(groupCol).isin(g1, g2))
      .where(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"),
        when(col(groupCol) === g1, 1L).otherwise(0L).as("i1"),
        when(col(groupCol) === g2, 1L).otherwise(0L).as("i2"))
    val byValue = tagged.groupBy(col("v"))
      .agg(sum(col("i1")).as("c1"), sum(col("i2")).as("c2"))
      .graftCheckpoint() // consumed 3× (bounds, offsets, rank pass)
    val bounds = byValue.agg(min(col("v")), max(col("v")),
        coalesce(sum(col("c1")), lit(0L)), coalesce(sum(col("c2")), lit(0L)))
      .collect().head
    require(bounds.getLong(2) > 0 && bounds.getLong(3) > 0,
      s"mannWhitney: empty group n1=${bounds.getLong(2)} n2=${bounds.getLong(3)}")
    val (mnr, mxr) = (bounds.getDouble(0), bounds.getDouble(1))
    val span = math.max(mxr - mnr, java.lang.Double.MIN_NORMAL)
    val bucketed = byValue.withColumn("b",
      least(floor((col("v") - lit(mnr)) / lit(span) * nBuckets),
        lit(nBuckets - 1L)).cast("int"))
    val offs = bucketed.groupBy(col("b"))
      .agg(sum(col("c1") + col("c2")).as("st"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val cum = offs.scanLeft(0L) { case (a, (_, s)) => a + s }.init
    val offT = map(offs.map(_._1).zip(cum).flatMap {
      case (b, o) => Seq(lit(b), lit(o)) }: _*)
    val wbExcl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = bucketed
      .withColumn("cnt", col("c1") + col("c2"))
      .withColumn("cb",
        coalesce(sum(col("c1") + col("c2")).over(wbExcl), lit(0L))
          + element_at(offT, col("b")))
      .withColumn("avgrank", col("cb") + (col("cnt") + lit(1L)) / lit(2.0))
    val a = ranked.agg(
      sum(col("c1") * col("avgrank")).as("r1"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tt"),
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // u1/z spelled with the exact parenthesization the oracle uses —
    // every operand up to the final sqrt/divide is integer- or
    // half-integer-exact in double
    a.select(col("n1"), col("n2"),
        (col("r1") - col("n1") * (col("n1") + lit(1L)) / lit(2.0)).as("u1r"),
        col("tt"))
      .select(col("n1"), col("n2"),
        (floor(col("u1r") * 1e4 + lit(0.5)) / 1e4).as("u1"),
        (floor((col("u1r") - col("n1") * col("n2") / lit(2.0)) /
          sqrt(col("n1") * col("n2") / lit(12.0) *
            ((col("n1") + col("n2") + lit(1L)) -
              col("tt") / ((col("n1") + col("n2")) *
                (col("n1") + col("n2") - lit(1.0)))))
          * 1e4 + lit(0.5)) / 1e4).as("z"))
      .withColumn("reject_05", (abs(col("z")) > lit(1.96)).cast("int"))
  }

  /** Kaplan–Meier conversion-survival: time (hours) from each user's
    * first event to their first `convType` event, right-censored at the
    * earlier of the user's last observed event and a `followUpHours`
    * analysis cutoff — the "N-day conversion curve" of product
    * analytics, with proper censoring for users who never convert inside
    * the follow-up. S(t) steps only at conversion times:
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with nᵢ = users still under
    * observation at tᵢ. Returns (t_hours, n_risk, n_death, surv).
    *
    * Scale shape: one shuffle to per-user (time, death) rows, then a
    * groupBy collapses to |distinct hours| ≤ `followUpHours` rows, so
    * the ordered product window runs single-partition over a provably
    * tiny, parameter-bounded frame. S(t) is the exp∘Σ∘ln form —
    * associative, partial-aggregable. */
  def kaplanMeier(events: DataFrame, convType: String = "purchase",
                  followUpHours: Int = 72): DataFrame = {
    require(followUpHours >= 1, s"followUpHours=$followUpHours")
    val perUser = events
      .select(col("user_id"), col("ts").cast("long").as("t"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(min(col("t")).as("t0"),
        min(when(col("event_type") === convType, col("t"))).as("tp"),
        max(col("t")).as("tc"))
    val horizon = followUpHours.toLong * 3600L
    val times = perUser.select(
      // observed time = conversion if seen, else censoring point; both
      // clipped to the follow-up horizon (tp ≤ tc always: tp is an event)
      expr(s"least(coalesce(tp, tc), t0 + ${horizon}L) - t0").as("dt"),
      (col("tp").isNotNull && col("tp") <= col("t0") + lit(horizon))
        .cast("long").as("death"))
      .select(expr("dt div 3600").as("lt"), col("death"))
    val byHour = times.groupBy(col("lt"))
      .agg(count(lit(1)).as("n_all"), sum(col("death")).as("n_death"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("lt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byHour
      // at-risk at t = everyone still observed at t = total − (count < t)
      .withColumn("n_risk",
        sum(col("n_all")).over(wCum.orderBy(col("lt").desc))
          .cast("long"))
      // n_death == n_risk (everyone still at risk converts here) can only
      // happen at the LAST time point — Spark's ln(0) is NULL, which the
      // window sum would silently skip, reporting the PREVIOUS survival;
      // the survival there is exactly 0
      .withColumn("surv",
        when(col("n_death") === col("n_risk"), lit(0.0))
          .otherwise(exp(
            sum(log(lit(1.0) - col("n_death") / col("n_risk").cast("double")))
              .over(wCum))))
      .where(col("n_death") > 0)
      .select(col("lt").as("t_hours"), col("n_risk"),
        col("n_death").cast("long").as("n_death"),
        (floor(col("surv") * 1e4 + lit(0.5)) / 1e4).as("surv"))
  }

  /** Classical seasonal decomposition of the event value series by
    * hour-of-day: per-hour mean, additive seasonal component
    * (hour mean − grand mean), and the residual standard deviation once
    * the hourly component is removed — 24 rows. The STL-lite profile a
    * telemetry pipeline computes before anomaly thresholds.
    *
    * Scale shape: one partial-aggregable groupBy to 24 rows (sum/count/
    * sum-of-squares sufficient statistics); the grand mean joins back as
    * a broadcast 1-row aggregate. No windows, no second data pass. */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    // hour-of-day from epoch arithmetic, not hour(): timezone-free, the
    // catalog's cross-engine contract (ts observed only as epoch seconds)
    val e = events.select(col("ts").cast("long").as("t"), col("value").as("v"))
      .select(expr("(t div 3600) % 24").cast("int").as("hr"), col("v"))
    val hourly = e.groupBy(col("hr"))
      .agg(count(lit(1)).cast("double").as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("ss"))
    val grand = hourly.agg((sum(col("s")) / sum(col("n"))).as("gm"))
    hourly.crossJoin(broadcast(grand))
      .select(col("hr"),
        col("n").cast("long").as("n"),
        (floor(col("s") / col("n") * 1e4 + lit(0.5)) / 1e4).as("hour_mean"),
        (floor((col("s") / col("n") - col("gm")) * 1e4 + lit(0.5)) / 1e4)
          .as("seasonal"),
        // residual sd about the HOURLY mean: sqrt(E[v²]−mean²), clamped
        // spelled (m*m), not pow(m,2): Math.pow is not bit-guaranteed to
        // equal the product, and the oracle multiplies
        (floor(sqrt(greatest(lit(0.0),
          col("ss") / col("n") -
            (col("s") / col("n")) * (col("s") / col("n")))) * 1e4
          + lit(0.5)) / 1e4).as("resid_sd"))
  }

  /** Sample autocorrelation function of the daily event-count series, per
    * event_type, lags 1..maxLag:
    *
    *   r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²
    *
    * computed INTEGER-EXACT: multiplying numerator and denominator by n²
    * turns every term into (n·x_t − S)(n·x_{t−k} − S) with x_t, n, S all
    * longs, so both engines sum identical integers in any order and the
    * single final long/long double division is IEEE-identical — the same
    * trick that made `changePoint` hash-exact. The day grid is densified
    * over [min_day, max_day] per type (missing days count 0), guarded
    * with lo ≤ hi (the resampleHold descending-`sequence` lesson).
    *
    * Scale shape: the corpus collapses to |types|·|days| rows in ONE
    * partial-aggregable groupBy; everything after (grid, lag self-join,
    * sufficient stats) runs on that tiny aggregate, keyed by event_type —
    * no global window, no single-partition stage. At 100 TB the daily
    * series is still driver-thin; the one corpus pass dominates.
    */
  def acf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag=$maxLag") // sequence(1, 0) DESCENDS
    val daily = events
      .select(col("event_type"),
        floor(col("ts").cast("long") / lit(86400L)).cast("long").as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("x"))
    val grid = daily.groupBy(col("event_type"))
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .where(col("lo") <= col("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("d"))
    val series = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("x"), lit(0L)).as("x"))
    val stats = series.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val centered = series.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("d"),
        (col("n") * col("x") - col("s")).as("c"))
    // c ≈ n·deviation can reach ~1e10 on real daily volumes, putting a
    // single c² past Long.MaxValue (ANSI mode would abort the query) —
    // the sufficient statistics accumulate as DECIMAL(38,0), exact like
    // the longs and overflow-free to 38 digits; the final cast to double
    // rounds the same exact integer either way
    val cDec = col("c").cast("decimal(38,0)")
    val den = centered.groupBy(col("event_type"))
      .agg(sum(cDec * cDec).as("den"))
    val lagged = centered
      .select(col("event_type"), col("d"), col("c"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .select(col("event_type"), (col("d") - col("lag")).as("d"),
        col("lag"), col("c").as("c_t"))
    val num = lagged
      .join(centered.withColumnRenamed("c", "c_tk"), Seq("event_type", "d"))
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(col("c_t").cast("decimal(38,0)")
        * col("c_tk").cast("decimal(38,0)")).as("num"))
    num.join(broadcast(den), "event_type")
      .where(col("den") > 0) // constant series has no defined ACF
      .select(col("event_type"), col("lag"),
        (col("num").cast("double") / col("den").cast("double")).as("r"))
  }

  /** Cross-correlation of two event types' daily-count series at lags
    * −maxLag..maxLag (positive lag: `typeB` FOLLOWS `typeA` by that many
    * days):
    *
    *   r_k = Σ_t (x_t − x̄)(y_{t+k} − ȳ) / √(Σ(x−x̄)² · Σ(y−ȳ)²)
    *
    * Determinism: same n²-scaled integer centering as [[acf]]; the
    * denominator is sqrt(dx)·sqrt(dy) — sqrt is IEEE correctly-rounded in
    * every engine, and dx·dy as one long could overflow where the split
    * form cannot. Both series share ONE day grid (the union span of the
    * two types), zero-filled, so lags align day-for-day.
    *
    * Scale shape mirrors [[acf]]: one corpus pass down to daily counts,
    * then tiny-table joins. The lead-lag readout (does marketing spend
    * predict signups k days later?) is the classic ops-analytics ask.
    */
  def ccf(events: DataFrame, typeA: String, typeB: String,
          maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag=$maxLag") // sequence(1, -1) DESCENDS
    val e = events
      .where(col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        floor(col("ts").cast("long") / lit(86400L)).cast("long").as("d"))
    val daily = e.groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("x"))
    val span = e.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .where(col("lo") <= col("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    def series(t: String, out: String) = span
      .join(daily.where(col("event_type") === t).drop("event_type"),
        Seq("d"), "left")
      .select(col("d"), coalesce(col("x"), lit(0L)).as(out))
    val xy = series(typeA, "x").join(series(typeB, "y"), Seq("d"))
    val st = xy.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"))
    val cent = xy.crossJoin(broadcast(st))
      .select(col("d"), (col("n") * col("x") - col("sx")).as("cx"),
        (col("n") * col("y") - col("sy")).as("cy"))
    // same DECIMAL(38,0) accumulation rationale as acf's den
    val cxD = col("cx").cast("decimal(38,0)")
    val cyD = col("cy").cast("decimal(38,0)")
    val den = cent.agg(sum(cxD * cxD).as("dx"), sum(cyD * cyD).as("dy"))
    // y at day d+lag pairs with x at day d
    val lagged = cent.select(col("d"), col("cx"),
      explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
    val num = lagged
      .join(cent.select(col("d").as("yd"), col("cy")),
        col("yd") === col("d") + col("lag"))
      .groupBy(col("lag"))
      .agg(sum(col("cx").cast("decimal(38,0)")
        * col("cy").cast("decimal(38,0)")).as("num"))
    num.crossJoin(broadcast(den))
      .where(col("dx") > 0 && col("dy") > 0)
      .select(col("lag"),
        (col("num").cast("double")
          / (sqrt(col("dx").cast("double"))
            * sqrt(col("dy").cast("double")))).as("r"))
  }
}
