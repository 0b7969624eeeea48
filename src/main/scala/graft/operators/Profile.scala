package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling + constraint-validation operators (the Deequ-shaped
  * production hygiene layer): column profiles and declarative quality
  * checks, both as single-pass aggregations.
  *
  * Scale shape: `columnProfile` is ONE aggregate job producing every
  * metric for every requested column (Spark plans multi-distinct via
  * expand — one shuffle, metric count independent of row count), then an
  * in-plan unpivot; no per-column jobs, no collect. Checks are small
  * aggregates (+ one anti-join for referential integrity) unioned into a
  * single report frame.
  */
object Profile {

  /** Backtick-quote a generated identifier (literal backticks double) —
    * profiled tables arrive with dots, spaces, hyphens, quotes in column
    * names and these land inside generated stack() SQL. */
  private def qid(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Single-quote a SQL string literal (embedded quotes double). */
  private def qlit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Per-column profile: (column, n, n_null, n_distinct, min_s, max_s).
    * min/max are computed in the column's native ordering, then rendered
    * as strings (cast AFTER the aggregate — "10" < "9" is exactly the bug
    * a string-first cast would bake in). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    // two cheap jobs instead of one multi-distinct aggregate: Spark plans
    // k distinct aggregates via a k+1-factor Expand feeding a doubled
    // shuffle (measured 3.9 s warm on a 15k-row table); min/max/null need
    // no distinct machinery at all, and the distinct counts come from an
    // unpivot → (col, value) two-level aggregate — linear rows, ordinary
    // partial+final combine, no expand anywhere
    // col("a.b") parses as struct access and a stray backtick throws —
    // reference profiled columns through the escaped-backtick form
    val aggs = cols.flatMap { c =>
      val rc = col(qid(c))
      Seq(sum(when(rc.isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        min(rc).cast("string").as(s"__min_$c"),
        max(rc).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"${qlit(c)}, __n, ${qid(s"__null_$c")}, ${qid(s"__min_$c")}, ${qid(s"__max_$c")}"
    }.mkString(", ")
    val basic = wide.select(expr(
      s"stack(${cols.size}, $stackArgs) " +
      "as (col_name, n, n_null, min_s, max_s)"))
    // string rendering is injective for the profiled types (ints, strings,
    // decimals), so distinct-of-rendered == distinct-of-native
    val valueStack = cols.map(c => s"${qlit(c)}, cast(${qid(c)} as string)").mkString(", ")
    val distincts = df
      .select(expr(s"stack(${cols.size}, $valueStack) as (col_name, __v)"))
      .where(col("__v").isNotNull)
      .groupBy(col("col_name"), col("__v")).agg(count(lit(1)).as("__c"))
      .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
    basic.join(distincts, Seq("col_name"), "left")
      .select(col("col_name"), col("n"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_s"), col("max_s"))
  }

  /** Population Stability Index between a baseline and a current sample
    * of a numeric column — the standard distribution-drift monitor
    * (PSI < 0.1 stable, > 0.25 drifted). Equal-width buckets over the
    * BASELINE's [min, max] (current values outside clamp to the edge
    * buckets); both histograms are add-half smoothed
    * (c + 0.5)/(n + 0.5·B) so empty buckets contribute finite terms
    * deterministically (no ε floor magic). Returns one row per bucket:
    * (bucket, n_base, n_cur, contrib) with contrib = (q−p)·ln(q/p);
    * PSI = Σ contrib. Two histogram aggregates + a B-row join — the
    * column never moves, only bucket counts do. */
  def psiDrift(base: DataFrame, current: DataFrame, valueCol: String,
               buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets")
    val b = base.select(col(valueCol).cast("double").as("__v")).where(col("__v").isNotNull)
    val c = current.select(col(valueCol).cast("double").as("__v")).where(col("__v").isNotNull)
    val r = b.agg(min(col("__v")), max(col("__v"))).collect()(0)
    require(!r.isNullAt(0), "psiDrift: empty baseline")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val width = math.max((hi - lo) / buckets, java.lang.Double.MIN_NORMAL)
    def bucketed(df: DataFrame, cname: String) = df
      .withColumn("bucket",
        least(lit(buckets - 1), greatest(lit(0),
          floor((col("__v") - lo) / width).cast("int"))))
      .groupBy(col("bucket")).agg(count(lit(1)).as(cname))
    val nB = b.count().toDouble
    val nC = c.count().toDouble
    val denomB = nB + 0.5 * buckets
    val denomC = nC + 0.5 * buckets
    val spark = base.sparkSession
    import spark.implicits._
    val allBuckets = (0 until buckets).toDF("bucket")
    allBuckets
      .join(bucketed(b, "n_base"), Seq("bucket"), "left")
      .join(bucketed(c, "n_cur"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("__p", (col("n_base") + 0.5) / denomB)
      .withColumn("__q", (col("n_cur") + 0.5) / denomC)
      .withColumn("contrib",
        floor((col("__q") - col("__p")) * log(col("__q") / col("__p"))
          * 1e6 + lit(0.5)) / 1e6)
      .select(col("bucket"), col("n_base"), col("n_cur"), col("contrib"))
  }

  /** One row per declarative check: (check, violations, passed).
    * Standard battery over a fact table and its dimension:
    * key uniqueness, non-null, referential integrity (fact key ⊆ dim key),
    * and a value-range predicate. */
  def checks(fact: DataFrame, keyCol: String, notNullCol: String,
             dim: DataFrame, factFk: String, dimKey: String,
             rangePredicate: org.apache.spark.sql.Column,
             rangeName: String): DataFrame = {
    def report(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check"),
        col("violations"),
        (col("violations") === 0L).as("passed"))
    val unique = report(s"unique($keyCol)",
      fact.agg((count(lit(1)) - countDistinct(col(keyCol))).as("violations")))
    val nonNull = report(s"not_null($notNullCol)",
      fact.agg(coalesce(sum(when(col(notNullCol).isNull, 1L).otherwise(0L)),
        lit(0L)).cast("long").as("violations")))
    val referential = report(s"ref($factFk -> $dimKey)",
      fact.select(col(factFk))
        .join(dim.select(col(dimKey).as(factFk)), Seq(factFk), "left_anti")
        .agg(count(lit(1)).as("violations")))
    val range = report(rangeName,
      fact.agg(coalesce(sum(when(!rangePredicate, 1L).otherwise(0L)),
        lit(0L)).cast("long").as("violations")))
    unique.unionByName(nonNull).unionByName(referential).unionByName(range)
  }

  /** Pearson χ² independence test between two categorical columns:
    * χ² = Σ_cells (o − e)²/e with e = rowTotal·colTotal/N, plus the
    * degrees of freedom (|A|−1)(|B|−1) — the standard "are these two
    * labels associated?" screen (e.g. language × source drift in a
    * corpus). Returns ONE row (n_cells, dof, chi2 4 dp).
    *
    * Scale shape: one corpus-sized aggregation to the contingency cells,
    * then everything runs on the CELL table (|A|·|B| rows — category-
    * sized by definition): marginals via windows over the cells, the
    * final Σ a single-row aggregate. The global window moves only the
    * cell table to one task, never the corpus. Cell counts are exact
    * longs; e and the Σ are double (order-of-addition ulps absorbed by
    * the 4 dp rounding over category-scale cell counts). */
  def chiSquareIndependence(df: DataFrame, colA: String,
                            colB: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val seen = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("o"))
    // χ² sums over the FULL |A|×|B| grid — a structurally-zero cell
    // contributes its whole expected count ((0−e)²/e = e), so dropping
    // unobserved combinations understates the statistic (a perfect 2×2
    // association would read N/2 instead of N). The grid cross join is
    // category-sized × category-sized, never corpus rows.
    val cells = seen.select(col("a")).distinct()
      .crossJoin(seen.select(col("b")).distinct())
      .join(seen, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    cells
      .withColumn("ra", sum(col("o")).over(w.partitionBy(col("a"))))
      .withColumn("cb", sum(col("o")).over(w.partitionBy(col("b"))))
      .withColumn("nn", sum(col("o")).over(w.partitionBy()))
      .agg(count(lit(1)).as("n_cells"),
        ((countDistinct(col("a")) - 1) * (countDistinct(col("b")) - 1))
          .as("dof"),
        expr("""floor(sum(pow(o - CAST(ra AS DOUBLE) * cb / nn, 2)
                          / (CAST(ra AS DOUBLE) * cb / nn))
                      * 1e4 + 0.5) / 1e4""").as("chi2"))
  }

  /** Equi-depth (equal-frequency) histogram: `buckets` ranges holding
    * ~n/B rows each — the skew-robust distribution summary equi-WIDTH
    * histograms can't give (one hot range swallows everything), and the
    * stats shape CBO bucket estimates come from.
    *
    * Scale shape: boundaries come from ONE percentile aggregate (swap in
    * `approx_percentile` past memory limits — same contract), NOT from
    * `ntile` over a global window (a single-partition sort at corpus
    * scale); assignment is then a map-only comparison against the
    * broadcast boundary array, and the final count is an ordinary
    * B-row aggregate. Boundaries are floor-rounded at 4 dp BEFORE
    * assignment so any engine whose percentiles agree to 1e-4 buckets
    * rows identically (the cross-engine determinism contract); ties on a
    * boundary go to the lower bucket (strict `<` comparison). */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets")
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val v = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val row = v.agg(expr(
      s"percentile(v, array(${probs.mkString(", ")}))")).collect()(0)
    require(!row.isNullAt(0), "equiDepthHistogram: empty input")
    val bounds = row.getSeq[Double](0)
      .map(b => math.floor(b * 1e4 + 0.5) / 1e4)
    val boundsArr = array(bounds.map(lit): _*)
    v.withColumn("bucket",
        size(filter(boundsArr, b => b < col("v"))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        (floor(min(col("v")) * 1e4 + lit(0.5)) / 1e4).as("lo"),
        (floor(max(col("v")) * 1e4 + lit(0.5)) / 1e4).as("hi"))
  }

  /** Approximate functional-dependency discovery (Tane/Metanome's g3
    * error): for each candidate `lhs → rhs`, the minimum fraction of rows
    * to delete for the FD to hold exactly — g3 = (N − Σ_groups max rhs
    * frequency) / N — plus the group/violation counts a profiler reports.
    * Returns one row per candidate:
    * (lhs, rhs, n_groups, bad_groups, rows_remove, g3).
    *
    * Scale shape, per candidate: groupBy(lhs, rhs) collapses the data in
    * one partial-aggregable shuffle; groupBy(lhs) then runs on the
    * collapsed |distinct pairs| table; the final 4-number rollup is a
    * 1-row aggregate. Candidates evaluate independently (a union of
    * per-candidate plans over the same scan — Spark reuses the exchange
    * when lhs repeats). */
  def functionalDeps(df: DataFrame,
                     candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "functionalDeps: no candidates")
    candidates.map { case (lhs, rhs) =>
      val pairs = df.groupBy(col(lhs).as("l"), col(rhs).as("r"))
        .agg(count(lit(1)).as("c"))
      val groups = pairs.groupBy(col("l"))
        .agg(count(lit(1)).as("nd"), max(col("c")).as("keep"),
          sum(col("c")).as("tot"))
      groups.agg(
        lit(lhs).as("lhs"), lit(rhs).as("rhs"),
        count(lit(1)).as("n_groups"),
        sum((col("nd") > 1).cast("long")).as("bad_groups"),
        sum(col("tot") - col("keep")).as("rows_remove"),
        (floor(sum(col("tot") - col("keep")) / sum(col("tot")).cast("double")
          * 1e4 + lit(0.5)) / 1e4).as("g3"))
    }.reduce(_.unionByName(_))
  }
}
