package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only latency-floor probe for the q_stream_* catalog entries — not
  * part of the driver contract. Replays the staged events stream at 1, 2
  * and 4 micro-batches; the marginal cost per extra batch is Spark's
  * trigger/planning floor (state-store open+commit per shuffle partition
  * per batch), NOT data volume — the number BASELINE.md's streaming note
  * quantifies so bench regressions aren't chased into the trigger floor.
  *
  * Usage: tools/run.sh graft.tools.StreamProbe [sfDir]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val staged = java.nio.file.Files.createTempDirectory("graft_sprobe").toString
    graft.core.Tables.events(spark, sfDir).drop("props")
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    var n = 0
    def run(filesPerTrigger: Option[Int], stateParts: Int)
           (build: DataFrame => DataFrame): Double = {
      n += 1
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
      val t0 = System.nanoTime()
      try {
        val rd = spark.readStream.schema(schema)
        filesPerTrigger.foreach(k => rd.option("maxFilesPerTrigger", k.toString))
        val q = build(rd.parquet(staged)).writeStream
          .format("memory").queryName(s"sprobe_$n").outputMode("complete").start()
        q.processAllAvailable(); q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      (System.nanoTime() - t0) / 1e9
    }
    def tumbling(df: DataFrame): DataFrame =
      df.groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))
    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "tumbling_agg" -> tumbling,
      "sliding_agg" -> (df => df.groupBy(
          window(col("ts"), "10 minutes", "5 minutes")).agg(count(lit(1)).as("n"))),
      "distinct_sketch" -> (df => df.groupBy(window(col("ts"), "60 minutes"))
        .agg(graft.functions.Sketches.thetaSketch(
          xxhash64(col("user_id"))).as("sk"))))
    for ((nm, b) <- shapes) {
      run(Some(2), 8)(b) // warm the source/codegen once, untimed baseline
      val one = run(None, 8)(b)
      val two = run(Some(2), 8)(b)
      val four = run(Some(1), 8)(b)
      val two32 = run(Some(2), 32)(b)
      println(f"STREAMPROBE $nm%-16s 1batch=$one%.2f 2batch=$two%.2f " +
        f"4batch=$four%.2f 2batch@32parts=$two32%.2f " +
        f"perBatchFloor=${(four - one) / 3}%.2f s")
    }
    spark.stop()
  }
}
