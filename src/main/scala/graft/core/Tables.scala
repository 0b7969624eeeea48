package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated synthetic tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Every query in the catalog receives `(spark, sfDir)` and reads only through
  * these loaders, so partition/pushdown behavior is uniform: one parquet file
  * per table, schema inferred from parquet footers, filters and column pruning
  * pushed into the scan by Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to map to
    * TimestampType; sessions set spark.sql.legacy.parquet.nanosAsLong=true so
    * the scan yields BIGINT nanos, converted here to a µs timestamp. The
    * source data is µs-granular (verified), so `div 1000` is lossless.
    */
  def events(s: SparkSession, d: String): DataFrame =
    nanosToTs(load(s, d, "events"))

  def nanosToTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // µs-precision writers (e.g. the tools/scaleup.py probe data, or any
        // engine that emits TIMESTAMP without tz adjustment) surface as NTZ;
        // normalize to TimestampType in the session zone (UTC) so downstream
        // casts/arithmetic behave identically to the nanos-long path
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Repartition by `keys` ONLY when the input's scan parallelism is below
    * the session's core count. The small-SF fixtures are single-file parquet
    * (one split ⇒ one core) and need the spread before CPU-bound stages;
    * a corpus-scale table already has thousands of input splits, where a
    * blind repartition() is a full-corpus shuffle bought for nothing.
    * Inspecting `rdd.getNumPartitions` plans the scan but runs no job. */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    if (df.rdd.getNumPartitions >= df.sparkSession.sparkContext.defaultParallelism)
      df
    else df.repartition(keys: _*)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views (for spark.sql-flavored entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
