package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2B Q-JOIN-8): for each left row, the latest right row
  * with `right.ts <= left.ts` within the same key.
  *
  * Two formulations:
  *  - `viaRangeJoin` (the oracle-checked catalog shape): range join + rank-1.
  *    Correct, but materializes every (left, candidate-right) pair before
  *    ranking — O(pairs) shuffle. Fine when right-per-key is small.
  *  - `viaCarryForward` (the 100 TB shape): UNION the two sides, one
  *    range-partitioned sort by (key, ts), and carry the last-seen right row
  *    forward with `last(_, ignoreNulls)` over an unbounded-preceding frame.
  *    Cost is one shuffle + one sort of |L|+|R| rows — no pair blowup, skew
  *    bounded by per-key row counts, and Spark executes the window with a
  *    single `WindowExec` over the sorted run.
  *
  * Equivalence of the two is asserted in AsOfSpec; ties on equal ts resolve
  * identically (latest right by (ts, id) wins) because the union sorts right
  * rows before the left row at the same timestamp via the `side` tiebreak.
  */
object AsOf {

  /** left(leftId, key, ts) asof-join right(rightId, key, ts) →
    * (leftId, rightId nullable). Column names are parameters so callers keep
    * their schemas. `tolerance` (pandas merge_asof semantics) bounds the
    * lookback: a match only counts while `left.ts − right.ts <= tolerance`
    * — pass a numeric for numeric timestamps or an interval literal
    * (`expr("INTERVAL 5 MINUTES")`) for TimestampType; stale matches
    * surface as NULL rightId, same as no match. The carry-forward also
    * carries the matched row's timestamp, so the staleness check is one
    * more projected comparison — the plan stays one shuffle + one sort. */
  def viaCarryForward(left: DataFrame, right: DataFrame,
                      key: String, ts: String, leftId: String, rightId: String,
                      tolerance: Option[Column] = None): DataFrame = {
    val l = left.select(col(key).as("k"), col(ts).as("t"),
      col(leftId).as("lid"), lit(null).cast("long").as("rid_in"),
      lit(null).cast(left.schema(ts).dataType.sql).as("rt_in"),
      lit(1).as("side")) // left sorts AFTER right at equal ts
    val r = right.select(col(key).as("k"), col(ts).as("t"),
      lit(null).cast("long").as("lid"), col(rightId).as("rid_in"),
      col(ts).as("rt_in"),
      lit(0).as("side"))
    // right rows at equal ts must be visible to the left row (<=): sort
    // right (side=0) before left (side=1); among right rows the later
    // (t, rid) wins via the frame's last()
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("rid_in").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("rid0", last(col("rid_in"), ignoreNulls = true).over(w))
      .withColumn("rts", last(col("rt_in"), ignoreNulls = true).over(w))
      .where(col("lid").isNotNull)
    val rid = tolerance match {
      case None => col("rid0")
      case Some(tol) =>
        when(col("rts").isNotNull && (col("t") - col("rts")) <= tol,
          col("rid0"))
    }
    carried.select(col("lid"), rid.as("rid"))
  }

  /** Range join + rank-1 (the small-data / oracle-checkable formulation);
    * same optional `tolerance` lookback bound. */
  def viaRangeJoin(left: DataFrame, right: DataFrame,
                   key: String, ts: String, leftId: String, rightId: String,
                   tolerance: Option[Column] = None): DataFrame = {
    val l = left.select(col(key).as("lk"), col(ts).as("lt"), col(leftId).as("lid"))
    val r = right.select(col(key).as("rk"), col(ts).as("rt"), col(rightId).as("rid"))
    val w = Window.partitionBy(col("lid"))
      .orderBy(col("rt").desc, col("rid").desc)
    val cond = col("lk") === col("rk") && col("rt") <= col("lt") &&
      tolerance.map(tol => (col("lt") - col("rt")) <= tol).getOrElse(lit(true))
    l.join(r, cond, "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("lid"), col("rid"))
  }
}
