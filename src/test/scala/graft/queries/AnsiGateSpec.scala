package graft.queries

import graft.SparkSpec
import graft.core.Sessions
import org.apache.spark.SparkException

/** ANSI-mode gate. Spark 4 enables `spark.sql.ansi.enabled` BY DEFAULT and
  * the engine's SessionFactory deliberately does not override it, so the
  * entire catalog — every CORRECTNESS row — already runs under ANSI
  * semantics. This spec pins that fact and its two consequences:
  *
  *  1. the scalar-function and aggregation families are MODE-NEUTRAL:
  *     re-running them with `ansi.enabled=false` yields row-identical
  *     results, i.e. no catalog query silently depends on ANSI-only
  *     behavior (or on legacy-only behavior — the results agree in both
  *     worlds, so a user can flip the flag without drift);
  *  2. the error semantics a real user hits first — integer overflow,
  *     malformed cast, division by zero — THROW under the engine's
  *     sessions (ANSI), and degrade to NULL/wraparound only when the user
  *     explicitly opts out.
  *
  * Documented in SURVEY §5.4 (ANSI addendum).
  */
class AnsiGateSpec extends SparkSpec {

  test("engine sessions run ANSI mode (Spark 4 default, not overridden)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "shared test session must be ANSI")
    assert(!Sessions.sparkConf(Sessions.Conf())
        .contains("spark.sql.ansi.enabled"),
      "SessionFactory must not override the ANSI default")
  }

  test("scalar-fn + agg families are mode-neutral (ansi on == ansi off)") {
    val fams = FunctionQueries.queries ++ AggQueries.queries
    def runAll(): Map[String, Seq[String]] =
      fams.map { case (name, q) =>
        name -> q(spark, sf0001).collect().map(_.toString).sorted.toSeq
      }
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val ansiOn = runAll()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ansiOff = runAll()
      for ((name, rows) <- ansiOn)
        assert(ansiOff(name) == rows,
          s"$name drifts between ANSI modes (first on-row: " +
            s"${rows.headOption}, first off-row: ${ansiOff(name).headOption})")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("ANSI error semantics: overflow, bad cast, and div-by-zero throw") {
    def fails(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.isInstanceOf[SparkException] ||
             e.isInstanceOf[ArithmeticException] ||
             e.isInstanceOf[NumberFormatException] ||
             e.getMessage.contains("ANSI") ||
             e.getMessage.contains("CAST_INVALID_INPUT") ||
             e.getMessage.contains("DIVIDE_BY_ZERO") ||
             e.getMessage.contains("ARITHMETIC_OVERFLOW") ||
             e.getMessage.contains("overflow"),
        s"unexpected error shape for [$sql]: ${e.getClass} ${e.getMessage}")
    }
    fails("SELECT 2147483647 + CAST(1 AS INT)")     // int overflow
    fails("SELECT CAST('not_a_number' AS INT)")     // malformed cast
    fails("SELECT 1 div 0")                         // integral division by zero
    fails("SELECT CAST(1 AS INT) / 0")              // div-by-zero (numeric /)
    // legacy opt-out: the same expressions degrade to NULL / wraparound
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val r = spark.sql(
        """SELECT 2147483647 + CAST(1 AS INT) AS wrap,
          |       CAST('not_a_number' AS INT) AS badcast,
          |       CAST(1 AS INT) / 0 AS divzero""".stripMargin).collect()(0)
      assert(r.getInt(0) == Int.MinValue, "legacy overflow wraps")
      assert(r.isNullAt(1), "legacy bad cast is NULL")
      assert(r.isNullAt(2), "legacy div-by-zero is NULL")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }
}
