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
  * Round 13 adds the VERSION-count axis (every earlier probe scaled
  * ROWS): a 10⁴-commit history, in both regimes the entry format admits —
  * `flat` (compacted/maintained table: every entry lists O(1) data
  * entries, the steady state OPTIMIZE/compact produce) and `grow`
  * (maintenance-free appends: entry v lists v dirs, so entry SIZE is
  * live-entry-bound — the full-snapshot-listing design trades Delta's
  * log-replay for one-read version resolution, and this regime prices
  * that trade). Measured at head: per-publish latency early vs late
  * (flat must stay flat; grow may not), head-entry bytes, a REAL
  * commitAppend at v≈10⁴ (pays the rebase read of the previous entry),
  * `currentVersion()` with the `_latest.hint` vs cold (hint deleted —
  * the O(V) listing fallback), `history()` over 10⁴ retained versions,
  * a late-span `changes(V-1, V)` (bounded by the tail commit's files,
  * never history length), and `vacuum` of 90% of history.
  *
  * Usage: tools/run.sh graft.tools.SnapProbe [K] [repeats] [V]
  * Prints one line per (op, rep): PROBE snap[<op>] K=… rows=… wall=…s
  */
object SnapProbe {

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(32)
    val repeats = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val vCount = args.drop(2).headOption.map(_.toInt).getOrElse(10000)
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

    def freshTableAt(clustered: Boolean)
        : (graft.operators.SnapshotTable, String) = {
      val root = java.nio.file.Files.createTempDirectory("snap_probe").toString
      val t = SnapshotLog.open(spark, root, "id")
      val df = if (clustered) base.repartitionByRange(64, col("id"))
               else base.repartition(64) // every file spans the key space
      t.commitAppend(df)
      (t, root)
    }
    def freshTable(clustered: Boolean): graft.operators.SnapshotTable =
      freshTableAt(clustered)._1

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

    // ---- round 13: the DSv2 connector at scale ---------------------------
    // the snaplog format's planning-time pruning on the same K·100k-row
    // clustered table: the FULL scan is data-bound (the contrast), the
    // band probe must stay band-sized — plan-level file pruning means its
    // wall tracks the 1-2 kept files, not K
    locally {
      val (t, root) = freshTableAt(clustered = true)
      t.commitDelete(spark.range(bandLo, bandLo + 100).toDF("id"))
      def con = spark.read.format("snaplog").load(root)
      time("dsv2_scan_full") { con.count() }
      time("dsv2_scan_band") {
        val probe = con.where(col("id") >= bandLo && col("id") < bandHi)
        val got = probe.count()
        require(got == (bandHi - bandLo) - 100, s"band count $got")
        got
      }
    }

    // ---- round 13 (late): predicate DML — retention vs rewrite ----------
    // DELETE WHERE on the clustered table: an ALIGNED band (covering
    // whole files) must be METADATA-only (no data read, no data written);
    // the same band on the UNCLUSTERED twin has no provably-inside files
    // and pays the copy-on-write rewrite — the gap is the operator.
    locally {
      // table builds OUTSIDE the timers — only the DML commit is priced
      def timedDml(tag: String, clustered: Boolean)(body:
          graft.operators.SnapshotTable => Unit): Unit =
        (1 to repeats).foreach { rep =>
          val t = freshTable(clustered)
          val before = t.read().inputFiles.length
          val t0 = System.nanoTime()
          body(t)
          val s = (System.nanoTime() - t0) / 1e9
          val after = t.read().inputFiles.length
          println(f"PROBE snap[$tag] K=$k rep=$rep " +
            f"files=$before->$after wall=$s%.2fs")
        }
      timedDml("dml_retention_clustered", clustered = true)(
        _.commitDeleteWhere("id", 0L, n / 4 - 1))
      timedDml("dml_retention_fragmented", clustered = false)(
        _.commitDeleteWhere("id", 0L, n / 4 - 1))
      timedDml("dml_update_band", clustered = true)(
        _.commitUpdateWhere("id", bandLo, bandHi - 1,
          Map("v" -> "concat('U', v)")))
    }

    // ---- round 13 (late): Bloom-index point probes, fragmented layout ----
    // the shape neither min/max stats nor clustering can serve: random
    // layout (every file spans the whole key/value space), point lookups
    // on high-cardinality columns. Contrast: the same probe without the
    // index (reads all 64 files) vs with it (reads the fpp-admitted
    // files), the indexed commit vs the plain commit (prices the build's
    // one batch re-read), and the probe through the DSv2 connector's
    // pushed EqualTo.
    locally {
      val probeId = (n / 3).toString
      val (tPlain, _) = freshTableAt(clustered = false)
      time("bloom_probe_noindex") {
        val p = tPlain.readWhereEquals("id", probeId)
        println(s"  filesRead=${p.inputFiles.length}/64")
        p.count()
      }
      val root = java.nio.file.Files
        .createTempDirectory("snap_probe_bl").toString
      val t = SnapshotLog.open(spark, root, "id")
      t.commitAppend(base.limit(1).coalesce(1)) // seed so config can commit
      t.setBloomColumns(Seq("id", "v"))
      time("bloom_build_commit") { t.commitAppend(base.repartition(64)); n }
      time("bloom_probe_indexed") {
        val p = t.readWhereEquals("id", probeId)
        println(s"  filesRead=${p.inputFiles.length}")
        p.count()
      }
      time("bloom_probe_str") {
        val p = t.readWhereEquals("v", "v" + probeId)
        println(s"  filesRead=${p.inputFiles.length}")
        p.count()
      }
      def con = spark.read.format("snaplog").load(root)
      time("bloom_dsv2_point") {
        con.where(col("v") === ("v" + probeId)).count()
      }
      val tNoIdx = SnapshotLog.open(spark, java.nio.file.Files
        .createTempDirectory("snap_probe_bn").toString, "id")
      time("bloom_plain_commit") { tNoIdx.commitAppend(base.repartition(64)); n }
    }

    // ---- round 13: VERSION-count scaling --------------------------------
    // Both regimes publish entries through the real atomic-link path; the
    // flat table's dirs are real (reads work), grow's historical dirs are
    // synthetic (never read — only entry size matters there) except the
    // tail, which is real so the late-span change feed actually reads.
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    locally {
      val root = java.nio.file.Files.createTempDirectory("snap_probe_v").toString
      val t = SnapshotLog.open(spark, root, "id")
      t.commitAppend(spark.range(0, 1000).select(col("id"),
        concat(lit("v"), col("id")).as("v")).coalesce(1))
      val e1 = t.readEntry(1)
      // flat regime: every entry re-lists v1's single dir + stats
      var earlyMs = 0.0; var lateMs = 0.0
      val tenPct = math.max(1, vCount / 10)
      val tPub0 = System.nanoTime()
      for (v <- 2 to vCount) {
        val t0 = System.nanoTime()
        require(t.publishEntry(v, e1.data, Nil, e1.stats, sv = e1.sv))
        val d = ms(t0)
        if (v <= 1 + tenPct) earlyMs += d
        if (v > vCount - tenPct) lateMs += d
      }
      val pubTotal = ms(tPub0) / 1000
      println(f"PROBE snap[versions_flat_publish] V=$vCount wall=$pubTotal%.2fs " +
        f"early10pct=${earlyMs / tenPct}%.3fms late10pct=${lateMs / tenPct}%.3fms " +
        f"headBytes=${java.nio.file.Files.size(
          java.nio.file.Paths.get(root, "_log", s"$vCount.json"))}")

      // real commit at head: pays the write + footer stats + the rebase
      // read of the (constant-size) previous entry
      (1 to repeats).foreach { rep =>
        val t0 = System.nanoTime()
        val v = t.commitAppend(spark.range(0, 1000).select(col("id"),
          concat(lit("h"), col("id")).as("v")).coalesce(1))
        println(f"PROBE snap[versions_flat_real_commit] V=$v rep=$rep " +
          f"wall=${ms(t0) / 1000}%.2fs")
      }

      // version resolution: hinted (the steady state) vs cold (hint gone)
      val tH0 = System.nanoTime()
      var acc = 0L
      (1 to 1000).foreach(_ => acc += t.currentVersion())
      println(f"PROBE snap[versions_cv_hinted_x1000] V=${t.currentVersion()} " +
        f"wall=${ms(tH0) / 1000}%.3fs")
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(root, "_log", "_latest.hint"))
      val tC0 = System.nanoTime()
      val cold = t.currentVersion()
      println(f"PROBE snap[versions_cv_cold] V=$cold wall=${ms(tC0) / 1000}%.3fs")

      // history over the full retained range (driver metadata, O(V) reads)
      val tHi0 = System.nanoTime()
      val hRows = t.history().count()
      println(f"PROBE snap[versions_history] V=$hRows wall=${ms(tHi0) / 1000}%.2fs")

      // late-span change feed: bounded by the tail commit's files
      val head = t.currentVersion()
      val tCh0 = System.nanoTime()
      val chRows = t.changes(head - 1, head).count()
      println(f"PROBE snap[versions_changes_tail] V=$head rows=$chRows " +
        f"wall=${ms(tCh0) / 1000}%.2fs")

      // vacuum 90% of history: entry deletes + one sweep of real dirs
      val keepFrom = math.max(1, (head * 0.9).toInt)
      val tV0 = System.nanoTime()
      val (vf, ve) = t.vacuum(keepFrom)
      println(f"PROBE snap[versions_vacuum90] entriesRemoved=$ve files=$vf " +
        f"wall=${ms(tV0) / 1000}%.2fs")
      require(t.read().count() == 1000L * (1 + repeats),
        "flat table must stay readable after the vacuum")
    }

    // grow regime: entry v lists v data entries (no maintenance ever ran);
    // capped — cumulative bytes are O(V²) by design, which is the point
    locally {
      val vGrow = math.min(vCount, 2000)
      val root = java.nio.file.Files.createTempDirectory("snap_probe_g").toString
      val t = SnapshotLog.open(spark, root, "id")
      t.commitAppend(spark.range(0, 1000).select(col("id"),
        concat(lit("v"), col("id")).as("v")).coalesce(1))
      val e1 = t.readEntry(1)
      var dirs = e1.data
      var earlyMs = 0.0; var lateMs = 0.0
      val tenPct = math.max(1, vGrow / 10)
      for (v <- 2 until vGrow) {
        dirs = dirs :+ s"$root/data/c-synth-$v" // never read
        val t0 = System.nanoTime()
        require(t.publishEntry(v, dirs, Nil, e1.stats, sv = 1))
        val d = ms(t0)
        if (v <= 1 + tenPct) earlyMs += d
        if (v > vGrow - tenPct) lateMs += d
      }
      // the tail commit is REAL so the late-span diff reads actual files
      val tReal0 = System.nanoTime()
      val head = t.commitAppend(spark.range(5000, 6000).select(col("id"),
        concat(lit("t"), col("id")).as("v")).coalesce(1))
      val realMs = ms(tReal0)
      val headBytes = java.nio.file.Files.size(
        java.nio.file.Paths.get(root, "_log", s"$head.json"))
      println(f"PROBE snap[versions_grow_publish] V=$vGrow " +
        f"early10pct=${earlyMs / tenPct}%.3fms late10pct=${lateMs / tenPct}%.3fms " +
        f"realCommitAtHead=${realMs / 1000}%.2fs headBytes=$headBytes")
      // round 14: per-entry bytes across the last checkpoint window —
      // deltas must be CHANGE-sized (flat in live-dir count) with one
      // full checkpoint per interval; and a COLD head resolution (fresh
      // handle, no cache) = checkpoint + delta tail reads
      val tail = (math.max(1, head - 11) to head).map { v =>
        val raw = SnapshotLog.Json.readTree(java.nio.file.Files.readString(
          java.nio.file.Paths.get(root, "_log", s"$v.json")))
        val kind = if (raw.has("base")) "d" else "F"
        s"$v:$kind${java.nio.file.Files.size(
          java.nio.file.Paths.get(root, "_log", s"$v.json"))}"
      }.mkString(",")
      println(s"PROBE snap[versions_grow_entry_bytes] $tail")
      val tR0 = System.nanoTime()
      val cold = SnapshotLog.open(spark, root, "id").readEntry(head)
      println(f"PROBE snap[versions_grow_cold_resolve] V=$head " +
        f"entries=${cold.data.size} wall=${ms(tR0) / 1000}%.3fs")
      val tCh0 = System.nanoTime()
      val chRows = t.changes(head - 1, head).count()
      println(f"PROBE snap[versions_grow_changes_tail] V=$head rows=$chRows " +
        f"wall=${ms(tCh0) / 1000}%.2fs")
    }

    spark.stop()
  }
}
