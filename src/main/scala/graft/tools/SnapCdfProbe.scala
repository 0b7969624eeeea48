package graft.tools

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Dev-only stage decomposition of q_stream_snapcdf — not part of the
  * driver contract. Times the fixture commits, the streaming backfill and
  * the final aggregate separately so optimization targets the real cost.
  *
  * Usage: tools/run.sh graft.tools.SnapCdfProbe [sfDir]
  */
object SnapCdfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.build(
      graft.core.Sessions.local(appName = "graft-snapcdf-probe"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SNAPCDFPROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val tmp = java.nio.file.Files.createTempDirectory("graft_scdfp").toString
      val t = graft.operators.SnapshotLog.open(spark, tmp, "doc_id")
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars"), col("lang"))
      time("commit v1 append")(t.commitAppend(docs.where(col("doc_id") < 300)))
      time("commit v2 append")(t.commitAppend(
        docs.where(col("doc_id") >= 300 && col("doc_id") < 500)))
      time("commit v3 delete")(t.commitDelete(
        docs.where(col("doc_id") % 7 === 0 && col("doc_id") < 500)
          .select(col("doc_id"))))
      val band = docs.where(col("doc_id") >= 250 && col("doc_id") < 350)
      time("commit v4 merge")(t.commitMerge(
        band.withColumn("n_chars", col("n_chars") * 2).unionByName(
          band.withColumn("doc_id", col("doc_id") + 250)
            .withColumn("n_chars", col("n_chars") + 7))))
      val sink = s"$tmp/cdf_sink"
      time("backfill stream")(graft.streaming.SnapshotCdf.backfill(
        spark, tmp, "doc_id", sink, s"$tmp/cdf_ckpt"))
      time("changes(0,1) direct")(t.changes(0, 1).count())
      time("changes(3,4) direct")(t.changes(3, 4).count())
      time("final agg")(graft.streaming.SnapshotCdf.feed(spark, sink)
        .groupBy(col("cdf_version").cast("int").as("v"),
          col("_change_type").as("change"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("v"), col("change")).count())
    }
    spark.stop()
  }
}
