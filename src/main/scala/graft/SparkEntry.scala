package graft

import graft.core.{Q, Tables}
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY §2B): every entry
  * is a (SparkSession, sfDir) => DataFrame; entries with a DuckDB twin in
  * `oracleSql` are hash-checked by the driver, the rest get rows-only checks
  * (approximate / Spark-specific ops, with their own ScalaTest properties).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.queries("q_agg_q1")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, Q] =
    RelationalQueries.queries ++
    JoinQueries.queries ++
    AggQueries.queries ++
    WindowQueries.queries ++
    FunctionQueries.queries ++
    LlmQueries.queries ++
    CurationQueries.queries ++
    WebQueries.queries ++
    RetrievalQueries.queries ++
    AnalyticsQueries.queries ++
    StreamingQueries.queries ++
    GenomicsQueries.queries ++
    SqlSuiteQueries.queries ++
    GeoQueries.queries ++
    MultimodalQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
    JoinQueries.oracle ++
    AggQueries.oracle ++
    WindowQueries.oracle ++
    FunctionQueries.oracle ++
    LlmQueries.oracle ++
    CurationQueries.oracle ++
    WebQueries.oracle ++
    RetrievalQueries.oracle ++
    AnalyticsQueries.oracle ++
    StreamingQueries.oracle ++
    SqlSuiteQueries.oracle ++
    GeoQueries.oracle
}
