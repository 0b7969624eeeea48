package graft.tools

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Dev-only job-level decomposition of commitMerge — not part of the
  * driver contract. Registers a SparkListener and prints every job fired
  * by one warm commitMerge (description, duration), so "merge is slow at
  * fixture scale" resolves to the actual action list.
  *
  * Usage: tools/run.sh graft.tools.MergeJobProbe [sfDir]
  */
object MergeJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.build(
      graft.core.Sessions.local(appName = "graft-merge-probe"))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("lang"))
    def freshTable() = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mjp").toString
      val t = graft.operators.SnapshotLog.open(spark, tmp, "doc_id")
      t.commitAppend(docs.where(col("doc_id") < 300))
      t.commitAppend(docs.where(col("doc_id") >= 300 && col("doc_id") < 500))
      t.commitDelete(docs.where(col("doc_id") % 7 === 0 && col("doc_id") < 500)
        .select(col("doc_id")))
      t
    }
    val band = docs.where(col("doc_id") >= 250 && col("doc_id") < 350)
    def upd = band.withColumn("n_chars", col("n_chars") * 2).unionByName(
      band.withColumn("doc_id", col("doc_id") + 250)
        .withColumn("n_chars", col("n_chars") + 7))
    freshTable().commitMerge(upd) // warm
    val t = freshTable()
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String)]
    val starts = new scala.collection.mutable.HashMap[Int, (Long, String)]
    val lst = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.synchronized {
          starts(j.jobId) = (j.time,
            Option(j.properties.getProperty("spark.job.description"))
              .orElse(Option(j.properties.getProperty("callSite.short")))
              .getOrElse("?"))
        }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach { case (t0, d) =>
            jobs += ((j.jobId, t0, j.time - t0, d)) }
        }
    }
    spark.sparkContext.addSparkListener(lst)
    val t0 = System.nanoTime()
    t.commitMerge(upd)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(lst)
    println(f"MERGEJOBPROBE wall=$wall%.2f s, jobs=${jobs.size}")
    jobs.sortBy(_._1).foreach { case (id, _, dur, d) =>
      println(s"  job=$id ${dur}ms $d") }
    spark.stop()
  }
}
