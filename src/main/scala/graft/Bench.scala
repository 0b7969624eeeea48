package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up outside the measurement, then stable name order
    try SparkEntry.queries("q_scan_parquet")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // the streaming engine's one-time init (state-store coordinator, offset
    // log, streaming codegen paths) is JVM warm-up, not operator cost — pay
    // it here on a 1-batch rate-source no-op so the first measured
    // q_stream_* query isn't charged ~1.5 s of machinery bring-up
    try {
      import org.apache.spark.sql.functions.col
      val wq = spark.readStream.format("rate").option("rowsPerSecond", "100")
        .load().groupBy(col("value") % 2).count()
        .writeStream.format("memory").queryName("graft_warm_stream")
        .outputMode("complete").start()
      val t0 = System.currentTimeMillis()
      while (wq.recentProgress.isEmpty && System.currentTimeMillis() - t0 < 5000)
        Thread.sleep(100)
      wq.stop()
    } catch { case _: Throwable => () }
    // a query that THROWS must not silently contribute a fast "time" (a
    // broken query would make the bench look better) — record it and fail
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // settle barrier: collect the previous query's garbage OUTSIDE the
      // next measurement, so a heavy neighbor (e.g. the ~30-job dedup-
      // clusters loop) doesn't tax the query that happens to sort after it
      // — measured effect: q_llm_dedup_exact read 3x its isolated time in
      // round 3 purely from adjacency
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
