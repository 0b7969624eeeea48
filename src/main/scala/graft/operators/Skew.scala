package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7.4 #3 — the demux `Undetermined` hot key at
  * 100 TB): two-phase salted aggregation and salted broadcast join.
  *
  * `saltedAgg` splits each hot group across `salts` sub-groups in phase 1
  * (map-side + a shuffle over (key, salt) — at most `salts`× more groups,
  * each bounded at 1/salts of the hot key), then combines sub-aggregates in
  * a cheap phase 2 whose input is tiny (groups × salts rows). Correct for
  * any algebraic aggregate expressed as (phase1, phase2) pairs — helpers
  * below cover count/sum/min/max.
  */
object Skew {

  /** Aggregate spec: phase-1 expression over rows, phase-2 combiner over
    * phase-1 results, output name. */
  final case class TwoPhase(phase1: Column, phase2: Column => Column, out: String)

  def count2(out: String): TwoPhase =
    TwoPhase(count(lit(1)), sum(_), out)
  def sum2(c: Column, out: String): TwoPhase =
    TwoPhase(sum(c), sum(_), out)
  def min2(c: Column, out: String): TwoPhase =
    TwoPhase(min(c), min(_), out)
  def max2(c: Column, out: String): TwoPhase =
    TwoPhase(max(c), max(_), out)

  /** groupBy(key).agg(...) with `salts`-way key salting. */
  def saltedAgg(df: DataFrame, key: String, salts: Int, aggs: TwoPhase*): DataFrame = {
    require(salts > 0, s"salts=$salts")
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(aggs.head.phase1.as(s"__p0"),
        aggs.tail.zipWithIndex.map { case (a, i) => a.phase1.as(s"__p${i + 1}") }: _*)
    phase1.groupBy(col(key))
      .agg(aggs.head.phase2(col("__p0")).as(aggs.head.out),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.phase2(col(s"__p${i + 1}")).as(a.out) }: _*)
  }

  /** Skew-safe equi-join: the fact side salts each row into one of
    * `salts` sub-keys (deterministic row hash — NOT rand(), which breaks
    * retry/replay determinism), the dim side replicates `salts`× via an
    * explode, and the join runs on (key, salt) — a hot key's rows spread
    * over `salts` reducers instead of ONE. The manual twin of AQE's
    * skew-join split for the cases AQE can't see (pre-AQE writers,
    * deliberately disabled AQE, or non-shuffle-boundary skew); dim-side
    * cost is `salts`× its size, so salt counts stay small (8–32).
    * Returns the joined frame with the salt column dropped. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, s"salts=$salts")
    // salt from the row's IDENTITY (monotonically_increasing_id — stable
    // under task retry, the saltedAgg convention), not a hash of the row
    // CONTENT: a hot key's exact-duplicate rows (the Undetermined-demux
    // shape this op exists for) would all hash to ONE salt and the skew
    // would survive untouched; content hashing also breaks on MapType
    // columns
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
