package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the micro-batch trigger floor — not part of
  * the driver contract. Replays the staged events through a tumbling agg
  * and a stream-stream interval join, printing each batch's durationMs
  * breakdown (queryPlanning / addBatch / walCommit / commitOffsets /
  * getBatch / latestOffset) and state-operator commit times from the
  * StreamingQueryProgress — the numbers that justify (or refute) any
  * per-batch-cost optimization of the q_stream_* catalog entries.
  *
  * Usage: tools/run.sh graft.tools.BatchFloorProbe [sfDir]
  */
object BatchFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.build(
      graft.core.Sessions.local(appName = "graft-batchfloor"))
    val staged = java.nio.file.Files.createTempDirectory("graft_bfp").toString
    graft.core.Tables.events(spark, sfDir).drop("props")
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    var n = 0
    def run(label: String, stateParts: Int)(build: DataFrame => DataFrame): Unit = {
      n += 1
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
      try {
        val t0 = System.nanoTime()
        val q = build(spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(staged))
          .writeStream.format("memory").queryName(s"bfp_$n")
          .outputMode("append").start()
        q.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"BFP $label parts=$stateParts wall=$wall%.2f s")
        q.recentProgress.foreach { p =>
          val d = p.durationMs
          def g(k: String) = Option(d.get(k)).map(_.longValue).getOrElse(-1L)
          val st = p.stateOperators.map(s =>
            s"commit=${s.allUpdatesTimeMs}/${s.commitTimeMs}ms rows=${s.numRowsTotal}")
            .mkString(" | ")
          println(s"  batch=${p.batchId} trigger=${g("triggerExecution")}ms " +
            s"plan=${g("queryPlanning")} addBatch=${g("addBatch")} " +
            s"walCommit=${g("walCommit")} commitOffsets=${g("commitOffsets")} " +
            s"getBatch=${g("getBatch")} latestOffset=${g("latestOffset")} :: $st")
        }
        q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    def tumbling(df: DataFrame): DataFrame =
      df.withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    def ssj(df: DataFrame): DataFrame = {
      val p = df.where(col("event_type") === "purchase")
      val sg = df.where(col("event_type") === "signup")
      graft.streaming.EventStreams.intervalJoin(p, sg, "24 hours", "1 minute", "inner")
    }
    run("warm", 8)(tumbling)
    run("tumbling", 8)(tumbling)
    run("tumbling", 2)(tumbling)
    run("ssjoin-inner", 8)(ssj)
    run("ssjoin-inner", 2)(ssj)
    spark.stop()
  }
}
