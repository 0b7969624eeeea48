package graft.tools

import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

/** Scale probe for the snapshot-log write-side trio (round 12): the
  * catalog's `q_scan_merge` / `q_scan_cdf` / `q_scan_vacuum` run on the
  * 500-row documents slice, so the bench can't show the property the
  * operators exist for — that a MERGE's cost tracks the TOUCHED file
  * set, not the table. This probe builds a K·100k-row table range-
  * clustered into 64 part files, then times:
  *
  *   - merge_cow:  upsert into ONE 1/64 key band + a few inserts — the
  *     logged min/max stats should confine the rewrite to ~1-2 files,
  *     with the other ~62 carried as file-level entries (never read);
  *   - merge_full: the SAME upsert against an identical table written
  *     WITHOUT range clustering (every file spans the whole key space,
  *     stats prune nothing) — the full-rewrite contrast that prices
  *     what the stats buy;
  *   - cdf:        changes() across the merge — bounded by the entries
  *     present in exactly one version (the rewritten files), never a
  *     full-table exceptAll;
  *   - vacuum:     GC after the merge — file-count-proportional
  *     filesystem work, no data reads.
  *
  * At 100 TB the merge_cow/merge_full gap IS the operator: a table with
  * thousands of range-clustered files rewrites only the files the
  * update envelope touches.
  *
  * Usage: tools/run.sh graft.tools.SnapProbe [K] [repeats]
  * Prints one line per (op, rep): PROBE snap[<op>] K=… rows=… wall=…s
  */
object SnapProbe {

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(32)
    val repeats = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = graft.core.Sessions.build(graft.core.Sessions.Conf(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      appName = "graft-snap-probe",
      numTasks = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt))

    val n = k * 100000L
    val base = spark.range(0, n).select(col("id"),
      concat(lit("v"), col("id")).as("v"))
    // the update envelope: one 1/64 band in the middle + 1000 inserts
    val bandLo = n / 2
    val bandHi = bandLo + n / 64
    val upd = spark.range(bandLo, bandHi).select(col("id"),
      concat(lit("U"), col("id")).as("v"))
      .unionByName(spark.range(n + 1, n + 1001).select(col("id"),
        concat(lit("N"), col("id")).as("v")))

    def time(tag: String)(body: => Long): Unit =
      (1 to repeats).foreach { rep =>
        val t0 = System.nanoTime()
        val rows = body
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PROBE snap[$tag] K=$k rep=$rep rows=$rows wall=$s%.2fs")
      }

    def freshTable(clustered: Boolean): graft.operators.SnapshotTable = {
      val root = java.nio.file.Files.createTempDirectory("snap_probe").toString
      val t = SnapshotLog.open(spark, root, "id")
      val df = if (clustered) base.repartitionByRange(64, col("id"))
               else base.repartition(64) // every file spans the key space
      t.commitAppend(df)
      t
    }

    // COW merge against range-clustered files: stats confine the rewrite
    time("merge_cow") {
      val t = freshTable(clustered = true)
      val before = t.read().inputFiles.toSet
      t.commitMerge(upd)
      val after = t.read().inputFiles.toSet
      val carried = before.intersect(after).size
      println(s"  carried=$carried/64 rewritten=${64 - carried}")
      t.read().count()
    }

    // the contrast: unclustered files all intersect -> full rewrite
    time("merge_full") {
      val t = freshTable(clustered = false)
      t.commitMerge(upd)
      t.read().count()
    }

    // change feed across the merge: cost ~ rewritten files, not table
    time("cdf") {
      val t = freshTable(clustered = true)
      t.commitMerge(upd)
      t.changes(1, 2).count()
    }

    // vacuum after the merge: pure filesystem GC of unreferenced files
    time("vacuum") {
      val t = freshTable(clustered = true)
      t.commitMerge(upd)
      val (files, _) = t.vacuum(2)
      files.toLong
    }

    // per-commit stats derivation, isolated: footer reads (the commit
    // path since the footer-stats change) vs the scan-job alternative
    // (groupBy over input_file_name — what every commit used to pay on
    // top of its write). Rows carry a ~1 KB payload so the scan price
    // reflects real commit volume (the probe's 2-column rows understate
    // it ~100×); footers never read the payload at all. The dir is
    // written ONCE outside the timers; each rep times only the stats
    // pass over the same 64 files.
    val statsRoot = java.nio.file.Files
      .createTempDirectory("snap_probe_stats").toString
    val statsDir = s"$statsRoot/d"
    base
      .withColumn("payload",
        sha2(concat(lit("p"), col("id").cast("string")), 256))
      .withColumn("payload", concat((1 to 16).map(i =>
        sha2(concat(col("payload"), lit(i)), 256)): _*))
      .repartitionByRange(64, col("id"))
      .write.parquet(statsDir)
    val st = SnapshotLog.open(spark, statsRoot, "id")
    time("stats_footer") { st.statsFor(statsDir).size.toLong }
    time("stats_scan") {
      spark.read.parquet(statsDir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("id")).cast("long").as("lo"),
          max(col("id")).cast("long").as("hi"))
        .collect().length.toLong
    }

    spark.stop()
  }
}
