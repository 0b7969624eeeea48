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
    // engine machinery warm-up on synthetic rows: broadcast + shuffle join,
    // hash aggregate, window and sort codegen paths all pay a one-time
    // Janino/JIT cost that is JVM bring-up, not operator cost — without
    // this the alphabetically-first query (or the only query, in isolated
    // SPARK_GRAFT_ONLY mode) absorbs it
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = spark.range(1000).toDF("id")
        .withColumn("k", col("id") % 7).withColumn("s", col("id").cast("string"))
      w.join(broadcast(w.groupBy(col("k")).agg(count(lit(1)).as("c"))), "k")
        .join(w.select(col("id"), col("s").as("s2")), "id")
        .withColumn("r", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("id"))))
        .where(col("r") <= 3).orderBy(col("id")).count()
    } catch { case _: Throwable => () }
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
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run to the named queries —
    // the isolated fresh-JVM mode used to adjudicate per-query regressions
    // without full-catalog adjacency noise. SPARK_GRAFT_REPEAT=n (default 1)
    // measures each selected query n times; all repeats are reported as
    // name#i so best-of-n is computable downstream.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(1)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    only.foreach { o =>
      val missing = o -- selected.map(_._1).toSet
      require(missing.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: ${missing.mkString(",")}")
    }
    // a query that THROWS must not silently contribute a fast "time" (a
    // broken query would make the bench look better) — record it and fail
    val results = selected.flatMap { case (name, fn) =>
      (1 to repeat).map { i =>
        // settle barrier: collect the previous query's garbage OUTSIDE the
        // next measurement, so a heavy neighbor (e.g. the ~30-job dedup-
        // clusters loop) doesn't tax the query that happens to sort after it
        // — measured effect: q_llm_dedup_exact read 3x its isolated time in
        // round 3 purely from adjacency
        System.gc()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        val label = if (repeat == 1) name else s"$name#$i"
        (label, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    // 4 decimals (0.1 ms): full double repr tripled the JSON line length and
    // overflowed the driver's byte-limited tail capture two rounds running
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // stdout is tail-captured by the driver and can truncate; also persist
    // the full line to a file so every per-query number survives
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_bench.json"),
        (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(json)
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
