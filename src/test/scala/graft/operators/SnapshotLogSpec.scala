package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotLogSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("snapshot log: versions, time travel, MOR deletes, compact fold") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val t = SnapshotLog.open(spark, root, "id")
    val a = (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v")
    val b = (11L to 15L).map(i => (i, s"b$i")).toDF("id", "v")

    assert(t.currentVersion() == 0)
    assert(t.commitAppend(a) == 1)
    assert(t.commitAppend(b) == 2)
    // v1 sees only the first commit; v2 the union
    assert(t.read(1).count() == 10)
    assert(t.read(2).count() == 15)

    // merge-on-read delete: data untouched, reads apply the anti-join
    assert(t.commitDelete(Seq(2L, 4L, 12L).toDF("id")) == 3)
    assert(t.read(3).as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      ((1L to 15L).toSet -- Set(2L, 4L, 12L)).toSeq.sorted)
    // time travel still sees the pre-delete snapshots
    assert(t.read(1).count() == 10 && t.read(2).count() == 15)
    // latest == explicit
    assert(t.read().count() == t.read(3).count())

    // compact folds deletes into data; rows identical, no delete sidecar
    val before = t.read().as[(Long, String)].collect().toSet
    val v4 = t.compact()
    assert(v4 == 4)
    assert(t.read(4).as[(Long, String)].collect().toSet == before)
    val plan = t.read(4).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("anti"),
      s"compacted read must not carry the delete anti-join:\n$plan")

    // overwrite replaces everything
    t.commitOverwrite(Seq((100L, "x")).toDF("id", "v"))
    assert(t.read().count() == 1)
    // prior history still resolvable
    assert(t.read(2).count() == 15)

    // version bounds fail loudly
    intercept[IllegalArgumentException](t.read(99))
    intercept[IllegalArgumentException](
      SnapshotLog.open(spark, root + "_empty", "id").read())
  }

  test("log stats prune files by key range at any time-travel version") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_st").toString
    val t = SnapshotLog.open(spark, root, "id")
    // commit 1: keys 1..100 range-partitioned into 4 files (disjoint
    // key ranges per file — the shape stats skipping exists for)
    t.commitAppend((1L to 100L).map(i => (i, s"a$i")).toDF("id", "v")
      .repartitionByRange(4, col("id")))
    // commit 2: keys 1000..1100, 4 more files
    t.commitAppend((1000L to 1100L).map(i => (i, s"b$i")).toDF("id", "v")
      .repartitionByRange(4, col("id")))
    val all = t.read(2)
    assert(all.inputFiles.length === 8, all.inputFiles.mkString(","))
    // a probe inside commit 1's low range must touch a strict subset
    val pruned = t.readRange(1, 20)
    assert(pruned.inputFiles.length < 8,
      s"no files skipped: ${pruned.inputFiles.mkString(",")}")
    assert(pruned.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (1L to 20L))
    // pruning ≡ unpruned filter, at BOTH versions (stats are versioned
    // with the entry, so v1 reads skip within v1's file set)
    val v1 = t.readRange(50, 1050, version = 1)
    assert(v1.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (50L to 100L), "v1 must not see commit 2")
    val v2 = t.readRange(50, 1050, version = 2)
    assert(v2.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      ((50L to 100L) ++ (1000L to 1050L)))
    // an out-of-range probe reads nothing but stays schema-correct
    assert(t.readRange(500, 600).count() === 0)
    // deletes still apply on the pruned path
    t.commitDelete(Seq(5L, 10L).toDF("id"))
    assert(t.readRange(1, 20).as[(Long, String)].collect().map(_._1)
      .sorted.toSeq === (1L to 20L).filterNot(Set(5L, 10L)))
    // compaction rewrites data and recomputes stats — pruning still live
    t.compact()
    val afterCompact = t.readRange(1000, 1100)
    assert(afterCompact.count() === 101)
    assert(afterCompact.inputFiles.length <= t.read().inputFiles.length)
  }

  test("non-integral keys carry no stats and readRange stays correct") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_ns").toString
    val t = SnapshotLog.open(spark, root, "name")
    t.commitAppend(Seq(("a", 1L), ("b", 2L)).toDF("name", "x"))
    // string key: no stats rows — readRange would need a long key; the
    // plain read path is unaffected
    assert(t.read().count() === 2)
  }

  test("optimistic concurrency: interleaved committers lose no update") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_occ").toString
    // two independent handles, as two drivers would hold
    val t1 = SnapshotLog.open(spark, root, "id")
    val t2 = SnapshotLog.open(spark, root, "id")
    t1.commitAppend(Seq((0L, "seed")).toDF("id", "v"))
    // interleave: each writer appends 6 commits from its own thread; the
    // version claims race on the shared _log directory
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(t: SnapshotTable, tag: String): Thread = {
      val th = new Thread(() =>
        try (1 to 6).foreach { i =>
          t.commitAppend(Seq((tag.hashCode.toLong * 100 + i, s"$tag$i"))
            .toDF("id", "v"))
        } catch { case e: Throwable => errs.add(e); () })
      th.start(); th
    }
    val ths = Seq(writer(t1, "w1"), writer(t2, "w2"))
    ths.foreach(_.join(120000))
    assert(errs.isEmpty, Option(errs.peek()).map(_.toString).getOrElse(""))
    // no lost update: all 13 commits claimed distinct versions, and the
    // final snapshot carries every appended row
    assert(t1.currentVersion() === 13)
    val rows = t1.read().as[(Long, String)].collect().map(_._2).toSet
    val expected = Set("seed") ++
      (1 to 6).flatMap(i => Seq(s"w1$i", s"w2$i")).toSet
    assert(rows === expected)
    // every intermediate version is a readable, monotone snapshot
    val counts = (1 to 13).map(v => t1.read(v).count())
    assert(counts === counts.sorted)
    assert(counts.last === 13L)
    // stats survived every rebase: a single-key range probe still finds
    // its row AND skips files (the loser re-reads the winner's stats and
    // re-appends its own — a lost race never drops skipping metadata)
    val k = "w1".hashCode.toLong * 100 + 3
    val probe = t1.readRange(k, k)
    assert(probe.as[(Long, String)].collect().map(_._2).toSeq === Seq("w13"))
    assert(probe.inputFiles.length < t1.read().inputFiles.length,
      s"rebased stats must still skip files: ${probe.inputFiles.length}")
  }

  test("publish-if-absent: exactly one claimant of a version wins") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_occ2").toString
    val t1 = SnapshotLog.open(spark, root, "id")
    val t2 = SnapshotLog.open(spark, root, "id")
    // the CAS primitive itself: second publish of the same version fails
    assert(t1.publishEntry(1, Seq(s"$root/data/c-a"), Nil))
    assert(!t2.publishEntry(1, Seq(s"$root/data/c-b"), Nil),
      "a second claim of v1 must lose")
    assert(!t1.publishEntry(1, Seq(s"$root/data/c-c"), Nil),
      "even the original winner cannot re-claim")
    // the loser's commit path rebases: a full commit now lands at v2 with
    // the winner's listing preserved
    val rows = Seq((7L, "ours")).toDF("id", "v")
    val v = t2.commitAppend(rows)
    assert(v === 2)
    // many-way race on one version: 8 threads, exactly one winner
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val ths = (1 to 8).map { i =>
      val th = new Thread(() => {
        if (t1.publishEntry(3, Seq(s"$root/data/c-$i"), Nil))
          { wins.incrementAndGet(); () }
      })
      th.start(); th
    }
    ths.foreach(_.join(30000))
    assert(wins.get() === 1)
  }

  // ---- round 12: MERGE / change feed / VACUUM ---------------------------

  test("merge: copy-on-write upsert rewrites ONLY stats-intersecting files") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_mg").toString
    val t = SnapshotLog.open(spark, root, "id")
    // 4 files with disjoint key ranges (1-25, 26-50, 51-75, 76-100)
    t.commitAppend((1L to 100L).map(i => (i, s"a$i")).toDF("id", "v")
      .repartitionByRange(4, col("id")))
    val filesBefore = t.read().inputFiles.toSet
    assert(filesBefore.size === 4)
    t.commitDelete(Seq(40L, 60L, 90L).toDF("id"))

    // upsert: update 55-60 (inside file 3; resurrects deleted key 60),
    // insert 200-204. The single [min,max] envelope [55, 204] would drag
    // file 4 (76-100) into the rewrite; the exact stab test must not —
    // no update key lands inside 76-100, and the inserts stab nothing
    val upd = ((55L to 60L).map(i => (i, s"U$i")) ++
      (200L to 204L).map(i => (i, s"N$i"))).toDF("id", "v")
    val v3 = t.commitMerge(upd)
    assert(v3 === 3)

    val after = t.read().as[(Long, String)].collect().toMap
    // updated band carries new values, including resurrected 60
    (55L to 60L).foreach(i => assert(after(i) === s"U$i", s"key $i"))
    // inserts present
    (200L to 204L).foreach(i => assert(after(i) === s"N$i"))
    // untouched rows intact; deletes OUTSIDE the update band still apply
    assert(after(1L) === "a1" && after(100L) === "a100")
    assert(!after.contains(40L) && !after.contains(90L),
      "non-upserted deleted keys must stay deleted")
    assert(after.size === 100 - 3 + 1 + 5) // 100 - 3 deletes + 60 back + 5 new

    // the COW contract: every unstabbed file was CARRIED, not rewritten —
    // files 1, 2 AND 4 (which the naive envelope would have rewritten)
    // survive physically into the merged snapshot; only file 3 moved
    val filesAfter = t.read().inputFiles.toSet
    val carried = filesBefore.intersect(filesAfter)
    assert(carried.size === 3,
      s"expected exactly the 3 unstabbed files carried; got ${carried.size}")

    // carried stats still prune: a probe into the low range skips files
    val probe = t.readRange(1, 20)
    assert(probe.inputFiles.length < filesAfter.size,
      "logged stats must keep pruning after a merge")
    assert(probe.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (1L to 20L))

    // pre-merge versions still time-travel intact
    assert(t.read(1).count() === 100)
    assert(t.read(2).count() === 97)
  }

  test("merge fails loudly when a commit lands underneath it") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_mc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    // the conflicting commit fires from INSIDE the merge's first action
    // on the updates frame (the bounds agg) — deterministically after
    // merge pinned its snapshot, before it claims the version. The task
    // touches only the filesystem (never Spark), publishing a minimal
    // valid log entry for v2 exactly like a racing writer would.
    val rootS = root // capture only the string in the task closure
    val s0 = spark
    import s0.implicits._
    val upd = Seq((5L, "U5")).toDF("id", "v").as[(Long, String)]
      .mapPartitions { it =>
        // idempotent: every partition (re-)writes the same entry bytes
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(rootS, "data", "c-racer"))
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(rootS, "_log"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(rootS, "_log", "2.json"),
          s"""{"version":2,"data":["$rootS/data/c-racer"],""" +
            """"deletes":[],"stats":[]}""")
        it
      }.toDF("id", "v")
    val e = intercept[java.util.ConcurrentModificationException](
      t.commitMerge(upd))
    assert(e.getMessage.contains("copy-on-write file set is stale"))
    // the table is unharmed: v2 is the racer's entry, no merge published
    assert(t.currentVersion() === 2)
  }

  test("change feed: exact multiset diff across append/delete/merge") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_cd").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))   // v1
    t.commitAppend((11L to 15L).map(i => (i, s"b$i")).toDF("id", "v"))  // v2
    t.commitDelete(Seq(2L, 12L).toDF("id"))                             // v3
    t.commitMerge(Seq((5L, "U5"), (20L, "N20")).toDF("id", "v"))        // v4

    def diff(a: Int, b: Int): Set[(Long, String, String)] =
      t.changes(a, b).as[(Long, String, String)].collect().toSet

    // pure append: inserts only
    assert(diff(1, 2) ===
      (11L to 15L).map(i => (i, s"b$i", "insert")).toSet)
    // sidecar flip: deletes surface from SHARED files via the key probe
    assert(diff(2, 3) ===
      Set((2L, "a2", "delete"), (12L, "b12", "delete")))
    // merge: update = old deleted + new inserted; insert plain
    assert(diff(3, 4) ===
      Set((5L, "a5", "delete"), (5L, "U5", "insert"), (20L, "N20", "insert")))
    // composed span — updates collapse to net old-out/new-in
    assert(diff(1, 4) ===
      Set((2L, "a2", "delete"), (5L, "a5", "delete"),
        (5L, "U5", "insert"), (20L, "N20", "insert")) ++
        Seq(11L, 13L, 14L, 15L).map(i => (i, s"b$i", "insert")).toSet)
    // bounds checked loudly
    intercept[IllegalArgumentException](t.changes(2, 2))
    intercept[IllegalArgumentException](t.changes(1, 99))
  }

  test("vacuum: GC unreferenced files, keep file-level refs, fail loud reads") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_vc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 100L).map(i => (i, s"a$i")).toDF("id", "v")
      .repartitionByRange(4, col("id")))                                // v1
    t.commitDelete(Seq(40L).toDF("id"))                                 // v2
    t.commitMerge((55L to 60L).map(i => (i, s"U$i")).toDF("id", "v"))   // v3
    // a torn writer: data dir written, never published
    val torn = java.nio.file.Paths.get(root, "data", "c-torn")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.writeString(torn.resolve("part-0.parquet"), "junk")

    val expect = t.read().as[(Long, String)].collect().toSet
    val keptFiles = t.read().inputFiles.toSet

    val (files, entries) = t.vacuum(3)
    assert(entries === 2, s"log entries 1-2 should drop, got $entries")
    assert(files > 0, "the rewritten files + torn dir must be collected")
    assert(!java.nio.file.Files.exists(torn), "torn dir must be GC'd")

    // live view byte-identical; carried file-level entries survived the
    // sweep of their partially-referenced parent dirs
    assert(t.read().as[(Long, String)].collect().toSet === expect)
    assert(t.read().inputFiles.toSet === keptFiles)
    // stats intact: pruning still works post-vacuum
    assert(t.readRange(1, 20).inputFiles.length < keptFiles.size)
    // vacuumed history is loudly unreachable
    val e = intercept[IllegalArgumentException](t.read(1))
    assert(e.getMessage.contains("vacuumed"))
    // idempotent re-run collects nothing further
    assert(t.vacuum(3) === ((0, 0)))
  }

  test("optimize: range-clustering turns no-op pruning into minimal scans") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_op").toString
    val t = SnapshotLog.open(spark, root, "id")
    // fragmented ingest: two appends, every file spanning the key space
    t.commitAppend((1L to 4000L by 2).map(i => (i, s"a$i")).toDF("id", "v")
      .repartition(8))
    t.commitAppend((2L to 4000L by 2).map(i => (i, s"b$i")).toDF("id", "v")
      .repartition(8))
    val allFiles = t.read().inputFiles.length
    assert(allFiles === 16)
    // a narrow probe prunes nothing — all 16 files overlap [100, 120]
    assert(t.readRange(100, 120).inputFiles.length === 16)

    val expect = t.read().as[(Long, String)].collect().toSet
    val v3 = t.optimize(8)
    assert(v3 === 3)
    // rows identical, layout now key-disjoint: the same probe reads 1 file
    assert(t.read().as[(Long, String)].collect().toSet === expect)
    assert(t.read().inputFiles.length === 8)
    assert(t.readRange(100, 120).inputFiles.length === 1,
      "post-optimize, a narrow probe must hit exactly one clustered file")
    assert(t.readRange(100, 120).as[(Long, String)].collect()
      .map(_._1).sorted.toSeq === (100L to 120L))
    // and a merge into one band now rewrites one file, carries seven
    val before = t.read().inputFiles.toSet
    t.commitMerge(Seq((100L, "U100")).toDF("id", "v"))
    assert(before.intersect(t.read().inputFiles.toSet).size === 7)
  }

  test("history: one row per retained version, labeled by operation") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_hy").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 5L).map(i => (i, s"a$i")).toDF("id", "v"))
    t.commitAppendTxn((6L to 9L).map(i => (i, s"b$i")).toDF("id", "v"),
      "w", 0L)
    t.commitDelete(Seq(1L).toDF("id"))
    t.commitMerge(Seq((2L, "U2")).toDF("id", "v"))
    t.restore(1)
    t.optimize(2)
    t.compact()
    t.commitOverwrite((20L to 22L).map(i => (i, s"o$i")).toDF("id", "v"))
    val ops = t.history().orderBy(col("version"))
      .select("version", "operation")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
    assert(ops == Seq(1 -> "append", 2 -> "txn-append", 3 -> "delete",
      4 -> "merge", 5 -> "restore", 6 -> "optimize", 7 -> "compact",
      8 -> "overwrite"))
    // history is exactly what time travel can still reach
    t.vacuum(5)
    assert(t.history().select("version").collect().map(_.getInt(0)).toSeq
      == Seq(5, 6, 7, 8))
  }

  test("multi-column log stats: readWhere prunes on non-key columns") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_mc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(spark.range(0, 4000)
      .select(col("id"), (col("id") * 3 + 7).as("ts"),
        concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(8, col("id")))
    assert(t.read().inputFiles.length == 8)

    // a ts-range predicate prunes from the LOG (ts rides the id
    // clustering here, so its per-file intervals are disjoint too)
    val probe = t.readWhere("ts", 1000L * 3 + 7, 1099L * 3 + 7)
    assert(probe.count() == 100)
    assert(probe.inputFiles.length == 1,
      s"expected 1 file, scanned ${probe.inputFiles.length}")
    assert(probe.select(sum(col("id")).cast("long")).collect().head
      .getLong(0) == (1000L to 1099L).sum)
    // readWhere(keyCol) ≡ readRange
    assert(t.readWhere("id", 500, 599).count() ==
      t.readRange(500, 599).count())

    // non-key stats survive a merge's carry/rebase: update one band,
    // the ts probe on an untouched band still prunes and stays exact
    t.commitMerge(spark.range(100, 150)
      .select(col("id"), lit(-1L).as("ts"),
        concat(lit("U"), col("id")).as("v")))
    val probe2 = t.readWhere("ts", 3000L * 3 + 7, 3099L * 3 + 7)
    assert(probe2.count() == 100)
    assert(probe2.inputFiles.length == 1,
      "carried file-level stats must keep pruning after a merge")
    // the rewritten band reads back through ts stats too (ts = -1 now)
    assert(t.readWhere("ts", -1L, -1L).count() == 50)

    // time travel prunes with THAT version's stats
    val probe1 = t.readWhere("ts", 1000L * 3 + 7, 1099L * 3 + 7, version = 1)
    assert(probe1.count() == 100 && probe1.inputFiles.length == 1)

    // a column without stats (non-integral) never prunes, stays correct
    assert(t.read().where(col("v") === "U120").count() == 1)
  }

  test("string-column log stats: readWhereString prunes on clustered strings") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_st").toString
    val t = SnapshotLog.open(spark, root, "id")
    val langs = Seq("ar", "de", "en", "fr", "ja", "ru", "uk", "zh")
    t.commitAppend(spark.range(0, 4000)
      .select(col("id"),
        element_at(lit(langs.toArray), (col("id") % 8 + 1).cast("int"))
          .as("lang"),
        concat(lit("d"), col("id")).as("body"))
      .repartitionByRange(8, col("lang"), col("id")))
    assert(t.read().inputFiles.length == 8)

    // lang-clustered layout: a point lookup hits exactly the en file(s)
    val probe = t.readWhereString("lang", "en", "en")
    assert(probe.count() == 500)
    assert(probe.inputFiles.length < 8,
      s"string stats must prune; scanned ${probe.inputFiles.length}/8")
    assert(probe.where(col("lang") =!= "en").count() == 0)
    // a range probe too
    assert(t.readWhereString("lang", "de", "fr").count() == 1500)

    // bounds longer than the safe cap (or non-ASCII) never materialize:
    // body values exceed no cap here but include none for 'body' is
    // still collected (short ASCII) — a probe on it stays CORRECT even
    // when it prunes nothing useful
    assert(t.readWhereString("body", "d100", "d100").count() == 1)

    // non-ASCII bounds are dropped, file always scanned, still exact
    t.commitAppend(spark.range(4000, 4010)
      .select(col("id"), lit("日本語").as("lang"),
        concat(lit("d"), col("id")).as("body")))
    assert(t.readWhereString("lang", "日本語", "日本語").count() == 10)
    assert(t.readWhereString("lang", "en", "en").count() == 500)
  }

  test("_latest.hint is advisory: stale, garbled, or missing never lies") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_h").toString
    val t = SnapshotLog.open(spark, root, "id")
    (1 to 4).foreach(i =>
      t.commitAppend(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val hint = java.nio.file.Paths.get(root, "_log", "_latest.hint")
    assert(java.nio.file.Files.exists(hint), "publish must advance the hint")
    assert(t.currentVersion() == 4)
    // stale hint (lost-race overwrite): probe-forward recovers
    java.nio.file.Files.writeString(hint, "1")
    assert(t.currentVersion() == 4)
    // garbled hint: falls back to the full listing
    java.nio.file.Files.writeString(hint, "not-a-number")
    assert(t.currentVersion() == 4)
    // hint above any published entry (impossible by construction, but
    // a byzantine write must not invent versions): falls back
    java.nio.file.Files.writeString(hint, "99")
    assert(t.currentVersion() == 4)
    // missing hint: full listing
    java.nio.file.Files.delete(hint)
    assert(t.currentVersion() == 4)
    // and the next commit repairs it
    t.commitAppend(Seq((5L, "v5")).toDF("id", "v"))
    assert(java.nio.file.Files.readString(hint).trim == "5")
  }

  test("schema in the log: add-only evolution, per-version time travel") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_sc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 5L).map(i => (i, s"a$i")).toDF("id", "v"))
    // add a column: old files read it as NULL, new rows carry it
    t.commitAppend((6L to 8L).map(i => (i, s"b$i", i * 10.0))
      .toDF("id", "v", "score"))
    assert(t.schemaOf(1).get.fieldNames.toSeq == Seq("id", "v"))
    assert(t.schemaOf(2).get.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(t.read().columns.toSeq == Seq("id", "v", "score"))
    assert(t.read().where(col("score").isNull).count() == 5)
    assert(t.read().where(col("score").isNotNull).count() == 3)
    // time travel sees version 1 under ITS schema — no phantom column
    assert(t.read(1).columns.toSeq == Seq("id", "v"))

    // type changes are rejected loudly (append may only ADD columns)
    intercept[IllegalArgumentException] {
      t.commitAppend(Seq((9L, 42)).toDF("id", "v"))
    }

    // merge on the evolved table: survivors from pre-evolution files
    // carry NULL score, updates land with theirs
    t.commitMerge(Seq((2L, "U2", 99.0), (100L, "N100", 1.0))
      .toDF("id", "v", "score"))
    val m = t.read()
    assert(m.where(col("id") === 2L).select("score")
      .collect().head.getDouble(0) == 99.0)
    assert(m.where(col("id") === 1L).select("score")
      .collect().head.isNullAt(0))
    assert(m.count() == 9)

    // change feed across the evolution diffs under toV's schema
    val ch = t.changes(1, 2)
    assert(ch.columns.toSeq == Seq("id", "v", "score", "_change_type"))
    assert(ch.count() == 3 &&
      ch.where(col("_change_type") === "insert").count() == 3)

    // restore: metadata-only rollback to v1 as a NEW commit
    val rv = t.restore(1)
    assert(rv == 4 && t.currentVersion() == 4)
    assert(t.read().columns.toSeq == Seq("id", "v"))
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      (1L to 5L))
    // history intact: the evolved versions still read as they were
    assert(t.read(3).count() == 9)
    // and the restored entry's refs protect v1's files from vacuum
    t.vacuum(4)
    assert(t.read().count() == 5)
    intercept[IllegalArgumentException] { t.read(3) }
    ()
  }

  test("restore refuses a vacuumed target and keeps txn watermarks") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_rs").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppendTxn((1L to 3L).map(i => (i, "x")).toDF("id", "v"), "w", 0L)
    t.commitOverwrite((4L to 6L).map(i => (i, "y")).toDF("id", "v"))
    t.vacuum(2) // v1's files are gone
    intercept[IllegalArgumentException] { t.restore(1) }
    // restore to a live version does not regress the watermark
    val rv = t.restore(2)
    assert(t.read(rv).count() == 3)
    assert(t.lastTxn("w").contains(0L),
      "restore must carry txn watermarks forward, not roll them back")
    assert(t.commitAppendTxn(Seq((9L, "z")).toDF("id", "v"), "w", 0L).isEmpty)
  }

  test("txn: idempotent append, watermarks survive every commit path") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_tx").toString
    val t = SnapshotLog.open(spark, root, "id")
    val b0 = (1L to 5L).map(i => (i, s"a$i")).toDF("id", "v")
    val b1 = (6L to 9L).map(i => (i, s"b$i")).toDF("id", "v")

    assert(t.lastTxn("w").isEmpty)
    assert(t.commitAppendTxn(b0, "w", 0L).contains(1))
    assert(t.commitAppendTxn(b1, "w", 1L).contains(2))
    assert(t.lastTxn("w").contains(1L))

    // replay of an applied batch: no commit, no rows, no orphan data dir
    val dirsBefore = java.nio.file.Files
      .list(java.nio.file.Paths.get(root, "data")).count()
    assert(t.commitAppendTxn(b1, "w", 1L).isEmpty)
    assert(t.commitAppendTxn(b0, "w", 0L).isEmpty)
    assert(t.currentVersion() == 2 && t.read().count() == 9)
    assert(java.nio.file.Files
      .list(java.nio.file.Paths.get(root, "data")).count() == dirsBefore,
      "a skipped replay must remove its just-written data dir")

    // a second app's watermark is independent
    assert(t.commitAppendTxn(b0.withColumn("id", col("id") + 100),
      "w2", 0L).contains(3))
    assert(t.lastTxn("w").contains(1L) && t.lastTxn("w2").contains(0L))

    // watermarks ride every other commit path: delete, merge, overwrite
    t.commitDelete(Seq(1L).toDF("id"))
    t.commitMerge(Seq((2L, "U2")).toDF("id", "v"))
    t.commitOverwrite(t.read())
    assert(t.lastTxn("w").contains(1L) && t.lastTxn("w2").contains(0L),
      "txn watermarks must survive delete/merge/overwrite commits")
    // and the replay guard still holds after all of them
    assert(t.commitAppendTxn(b1, "w", 1L).isEmpty)

    // unsafe app ids are rejected before anything is written
    intercept[IllegalArgumentException] {
      t.commitAppendTxn(b0, """a"b""", 5L)
    }
    ()
  }

  // ---- round 13: entry robustness / complete coverage / null stats ------

  test("string bounds with JSON metacharacters survive the log round-trip") {
    // round-12 regression: the regex entry parser lost the whole stats
    // object of a file whose string bound contained '}' — the file then
    // silently fell out of pruned reads. Jackson-written entries escape
    // everything; only the ASCII-ordering rule may drop a bound.
    val root = java.nio.file.Files.createTempDirectory("graft_snap_js").toString
    val t = SnapshotLog.open(spark, root, "id")
    val rows = Seq(
      (1L, """a}b"""), (2L, """a{b"""), (3L, """q"w"""), (4L, """p\q"""),
      (5L, "z]x"), (6L, "z[x"), (7L, "zz"), (8L, "za"))
      .toDF("id", "s")
    t.commitAppend(rows.repartitionByRange(2, col("s")))
    assert(t.read().inputFiles.length == 2)
    // both files kept their stats rows (complete coverage), and a probe
    // into the low (brace-y) range prunes the high file
    val probe = t.readWhereString("s", "a", "b")
    assert(probe.count() == 2, "metachar-bounded file must not lose rows")
    assert(probe.inputFiles.length == 1,
      s"metachar bounds must still prune: ${probe.inputFiles.length}/2")
    // key pruning unaffected
    assert(t.readRange(1, 2).count() == 2)
  }

  test("files without key bounds are never pruned out by non-key reads") {
    // round-12 regression (ADVICE): a part file with all-NULL keyCol got
    // no stats row, and if a sibling file was statted the dir counted as
    // covered — readWhere silently lost the null-key file's rows. Now
    // every file gets a (possibly unbounded) row and stays scanned.
    val root = java.nio.file.Files.createTempDirectory("graft_snap_nk").toString
    val t = SnapshotLog.open(spark, root, "id")
    val withKeys = spark.range(0, 100)
      .select(col("id"), (col("id") % 10).as("x"))
    val nullKeys = spark.range(0, 5)
      .select(lit(null).cast("long").as("id"), lit(777L).as("x"))
    t.commitAppend(withKeys.coalesce(1).unionByName(nullKeys.coalesce(1))
      .repartitionByRange(2, col("id"))) // nulls sort first: own file
    // the null-key rows are visible to a non-key predicate read
    assert(t.readWhere("x", 777L, 777L).count() == 5,
      "null-key rows must survive readWhere pruning")
    // and to a null-probe on the key itself
    assert(t.readWhereNull("id", isNull = true).count() == 5)
    // while key-range reads exclude them by predicate semantics
    assert(t.readRange(0, 1000).count() == 100)
  }

  test("legacy partial-coverage entries scan unstatted files (no silent loss)") {
    // hand-publish an sv=1 entry whose stats cover only one of two part
    // files — the pre-round-13 on-disk shape. Pruned reads must list the
    // dir and scan the unstatted file rather than dropping its rows.
    val root = java.nio.file.Files.createTempDirectory("graft_snap_lg").toString
    val t = SnapshotLog.open(spark, root, "id")
    val dir = s"$root/data/c-legacy"
    spark.range(0, 100).select(col("id"), (col("id") * 2).as("x"))
      .repartitionByRange(2, col("id"))
      .write.parquet(dir)
    val full = t.statsFor(dir)
    assert(full.size == 2)
    assert(t.publishEntry(1, Seq(dir), Nil, full.take(1), sv = 1))
    // rows in the UNSTATTED file (the high id range) still surface
    assert(t.readWhere("x", 0L, 500L).count() == 100,
      "unstatted legacy file must be scanned, not pruned")
    // the sharp case: a probe whose rows live ONLY in unstatted files —
    // x ∈ [150, 500] is ids 75..99, the high half (whichever file kept
    // its stats row, the other must be listed and scanned)
    assert(t.readWhere("x", 150L, 500L).count() == 25,
      "a probe hitting only unstatted rows must still find them")
    assert(t.readWhere("x", 0L, 20L).count() == 11)
    assert(t.readRange(0, 99).count() == 100)
    // the statted file still prunes when the predicate excludes the rest
    val lowProbe = t.readRange(0, 10)
    assert(lowProbe.count() == 11)
  }

  test("keyCol always gets a stats slot on wide tables") {
    // 40 eligible columns precede the key in schema order; the statCols
    // budget must not evict the KEY bounds (round 13 — previously the
    // key could fall out of `wanted` and the file lost ALL stats)
    val root = java.nio.file.Files.createTempDirectory("graft_snap_wd").toString
    val t = SnapshotLog.open(spark, root, "id")
    val wide = (0 until 40).foldLeft(spark.range(0, 1000).toDF("k0")) {
      case (df, i) => df.withColumn(f"c$i%02d", col("k0") + i)
    }.withColumn("id", col("k0")).drop("k0")
    t.commitAppend(wide.repartitionByRange(4, col("id")))
    val probe = t.readRange(0, 100)
    assert(probe.count() == 101)
    assert(probe.inputFiles.length < 4,
      s"key stats must survive the budget: ${probe.inputFiles.length}/4")
  }

  test("null-count stats: readWhereNull prunes both polarities exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_nn").toString
    val t = SnapshotLog.open(spark, root, "id")
    // id-clustered layout where `tag` is NULL exactly for id < 2000 —
    // low files are all-NULL in tag, high files null-free
    t.commitAppend(spark.range(0, 4000)
      .select(col("id"),
        when(col("id") >= 2000, concat(lit("t"), col("id"))).as("tag"))
      .repartitionByRange(8, col("id")))
    assert(t.read().inputFiles.length == 8)
    // range partitioning SAMPLES boundaries: the id=2000 null boundary
    // may straddle one file — 4 or 5 of 8 scanned, never all
    val notNull = t.readWhereNull("tag", isNull = false)
    assert(notNull.count() == 2000)
    assert(notNull.inputFiles.length <= 5,
      s"IS NOT NULL must skip the all-NULL files: ${notNull.inputFiles.length}/8")
    val isNull = t.readWhereNull("tag", isNull = true)
    assert(isNull.count() == 2000)
    assert(isNull.inputFiles.length <= 5,
      s"IS NULL must skip the null-free files: ${isNull.inputFiles.length}/8")
    // null counts ride a merge carry: update one high band, re-probe
    t.commitMerge(spark.range(3000, 3100)
      .select(col("id"), lit("U").as("tag")))
    assert(t.readWhereNull("tag", isNull = true).count() == 2000)
    assert(t.readWhereNull("tag", isNull = true).inputFiles.length <= 5,
      "carried null counts must keep pruning after a merge")
    // pre-evolution files (column absent) are conservatively scanned:
    // add a column, old files have no trusted count for it
    t.commitAppend(spark.range(4000, 4010)
      .select(col("id"), lit("x").as("tag"), lit(1L).as("extra")))
    assert(t.readWhereNull("extra", isNull = true).count() == 4000,
      "old files read the added column as NULL and must all be scanned")
  }

  test("optimize/compact conflict-check: an interleaved commit throws, never vanishes") {
    // round-13 ADVICE fix: optimize()/compact() materialize a snapshot
    // then publish an overwrite — an append landing in between must
    // surface as ConcurrentModificationException, not be dropped.
    val root = java.nio.file.Files.createTempDirectory("graft_snap_oc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(spark.range(0, 100000)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartition(8))
    val e1 = t.readEntry(1)
    val dataDir = java.nio.file.Paths.get(root, "data")
    val dirsBefore = java.nio.file.Files.list(dataDir).count()
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val opt = new Thread(() =>
      try { t.optimize(8); () }
      catch { case e: Throwable => failure.set(e) })
    opt.start()
    // wait until optimize's rewrite dir appears — it is created strictly
    // AFTER optimize pinned its base version, so a commit published now
    // is guaranteed to conflict; the racing publish is pure filesystem
    // (a no-op append re-listing v1), so it always beats the rewrite
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (java.nio.file.Files.list(dataDir).count() == dirsBefore &&
      System.nanoTime() < deadline) Thread.sleep(2)
    assert(java.nio.file.Files.list(dataDir).count() > dirsBefore,
      "optimize never started writing")
    assert(t.publishEntry(2, e1.data, e1.deletes, e1.stats,
      schema = t.schemaOf(1), sv = e1.sv), "the racer must claim v2")
    opt.join(120000)
    assert(failure.get() != null &&
      failure.get().isInstanceOf[java.util.ConcurrentModificationException],
      s"expected CME, got ${failure.get()}")
    // nothing lost: v2 is the racer's entry, optimize published nothing
    assert(t.currentVersion() == 2)
    assert(t.read().count() == 100000)
  }

  test("multi-column OPTIMIZE ZORDER: secondary-column probes prune too") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_zo").toString
    val t = SnapshotLog.open(spark, root, "id")
    // two independent dimensions: id and a decorrelated y
    t.commitAppend(spark.range(0, 65536)
      .select(col("id"),
        ((col("id") * 48271) % 65536).as("y"),
        concat(lit("v"), col("id")).as("v"))
      .repartition(8))
    // fragmented: a y-probe prunes nothing
    assert(t.readWhere("y", 0, 4095).inputFiles.length == t.read().inputFiles.length)
    val expect = t.read().count()
    t.optimize(64, "id", "y")
    assert(t.read().count() == expect)
    assert(t.read().inputFiles.length == 64)
    // a 1/16 box on EITHER dimension touches far fewer than all files
    val py = t.readWhere("y", 0, 4095)
    assert(py.count() == 4096)
    assert(py.inputFiles.length < 40,
      s"z-order must prune the non-leading dim: ${py.inputFiles.length}/64")
    val pid = t.readRange(0, 4095)
    assert(pid.count() == 4096)
    assert(pid.inputFiles.length < 40,
      s"z-order must prune the key dim: ${pid.inputFiles.length}/64")
  }

  test("merge cdc sidecar: exact change rows, vacuum-protected (round 13)") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_cc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 100L).map(i => (i, s"a$i")).toDF("id", "v")
      .repartitionByRange(4, col("id")))                                 // v1
    t.commitDelete(Seq(60L).toDF("id"))                                  // v2
    // upsert: update 55-60 (60 was deleted → resurrection, NO delete
    // pre-image), insert 200
    val upd = ((55L to 60L).map(i => (i, s"U$i")) :+ ((200L, "N200")))
      .toDF("id", "v")
    t.commitMerge(upd, cdc = true)                                       // v3
    val e3 = t.readEntry(3)
    assert(e3.cdc.isDefined, "cdc=true must record the sidecar in the entry")
    // the sidecar IS changes(2, 3), type column included
    val sidecar = spark.read.parquet(e3.cdc.get)
      .select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    val batch = t.changes(2, 3).as[(Long, String, String)].collect().toSet
    assert(sidecar === batch, s"sidecar=$sidecar batch=$batch")
    // resurrected 60 has no delete pre-image; plain updates do
    assert(!sidecar.contains((60L, "a60", "delete")))
    assert(sidecar.contains((55L, "a55", "delete")))
    assert(sidecar.contains((60L, "U60", "insert")))
    assert(sidecar.contains((200L, "N200", "insert")))
    // vacuum keeps the sidecar while v3 is retained, sweeps it after
    t.commitOverwrite((1L to 3L).map(i => (i, "z")).toDF("id", "v"))     // v4
    t.vacuum(3)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(e3.cdc.get)), "retained cdc must survive")
    t.vacuum(4)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(e3.cdc.get)), "unreferenced cdc must be swept")
    // cdc=false (the default) records nothing
    val root2 = java.nio.file.Files.createTempDirectory("graft_snap_cc2").toString
    val t2 = SnapshotLog.open(spark, root2, "id")
    t2.commitAppend((1L to 10L).map(i => (i, "x")).toDF("id", "v"))
    t2.commitMerge(Seq((5L, "U")).toDF("id", "v"))
    assert(t2.readEntry(2).cdc.isEmpty)
  }

  test("entry format round-trips arbitrary stats exactly (property)") {
    // the round-13 Jackson rework's contract: publishEntry ∘ readEntry is
    // the identity on every representable entry — arbitrary printable-
    // ASCII string bounds (quotes, braces, backslashes included),
    // arbitrary column names, extreme longs, missing/present optional
    // fields. The round-12 regex parser failed this on '}' in a bound.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val root = java.nio.file.Files.createTempDirectory("graft_snap_pp").toString
    val t = SnapshotLog.open(spark, root, "id")
    val asciiStr = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(' ', '~')).map(_.mkString))
    val name = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val longG = Gen.oneOf(Gen.choose(-1000L, 1000L),
      Gen.oneOf(Long.MinValue + 1, -1L, 0L, Long.MaxValue))
    val boundsG = Gen.zip(longG, longG)
    val statGen = for {
      f <- name.map(n => s"$root/data/c-x/$n.parquet")
      keyed <- Gen.oneOf(true, false)
      kb <- boundsG
      cols <- Gen.mapOfN(2, Gen.zip(name, boundsG))
      scols <- Gen.mapOfN(2, Gen.zip(name, Gen.zip(asciiStr, asciiStr)))
      nulls <- Gen.mapOfN(2, Gen.zip(name, Gen.choose(0L, 1000L)))
      rows <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 100000L))
      bytes <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 1000000L))
    } yield SnapshotLog.FileStat(f,
      if (keyed) math.min(kb._1, kb._2) else Long.MinValue,
      if (keyed) math.max(kb._1, kb._2) else Long.MaxValue,
      cols, scols, nulls, rows, bytes)
    val entryGen = for {
      data <- Gen.listOfN(3, name.map(n => s"$root/data/c-$n"))
      dels <- Gen.choose(0, 2).flatMap(n =>
        Gen.listOfN(n, name.map(m => s"$root/deletes/c-$m")))
      stats <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, statGen))
      sv <- Gen.oneOf(1, 2)
      txn <- Gen.mapOfN(2, Gen.zip(name, Gen.choose(0L, 100L)))
      op <- Gen.oneOf("append", "merge", "txn-append")
    } yield (data, dels, stats, sv, txn, op)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val prop = Prop.forAll(entryGen) { case (data, dels, stats, sv, txn, op) =>
      val v = counter.incrementAndGet() + 1000
      assert(t.publishEntry(v, data, dels, stats, txn,
        Some(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType)))), op, sv))
      val e = t.readEntry(v)
      e.data == data && e.deletes == dels && e.stats == stats &&
        e.sv == sv && t.opOf(v) == op &&
        t.keyOf(v).contains("id") &&
        t.schemaOf(v).exists(_.fieldNames.toSeq == Seq("id"))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withWorkers(1),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("txn: two racing committers of the same (app, batch) → one winner") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_tr").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 3L).map(i => (i, "x")).toDF("id", "v"))
    val batch = (10L to 14L).map(i => (i, s"r$i")).toDF("id", "v")
    // the zombie-driver scenario: an old incarnation of the same
    // streaming query races the restarted one on the same batch id
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val results = (0 until 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Option[Int]] {
        def call(): Option[Int] = {
          gate.await()
          SnapshotLog.open(spark, root, "id")
            .commitAppendTxn(batch, "app", 7L)
        }
      })
    }
    gate.countDown()
    val outcomes = results.map(_.get())
    pool.shutdown()
    assert(outcomes.count(_.isDefined) == 1,
      s"exactly one racer must commit, got $outcomes")
    assert(t.read().where(col("id") >= 10L).count() == 5,
      "the batch must land exactly once")
    assert(t.lastTxn("app").contains(7L))
  }

  // ---- round 13 (late): partitioned tables ---------------------------------

  private def partDf(ids: Range, lang: Long => String) =
    ids.map(i => (i.toLong, lang(i.toLong), s"v$i")).toDF("id", "lang", "v")

  test("partitioned append: leaf entries, logged pvals, stats prune partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_pt").toString
    val t = SnapshotLog.open(spark, root, "id")
    val df = partDf(1 to 90, i => Seq("en", "fr", "de")((i % 3).toInt))
    assert(t.commitAppend(df, Seq("lang")) == 1)

    // one data entry per partition value, each with its logged values
    val pv = t.partitionValues()
    assert(pv.size == 3 && pv.values.map(_("lang")).toSet == Set("en", "fr", "de"))
    assert(pv.keys.forall(d => d.contains("/gp_lang=")))

    // the partition column stays IN the files: min = max footer stats →
    // a point probe prunes foreign partitions through the EXISTING
    // stats machinery (no partition-specific read logic)
    val all = t.read()
    assert(all.count() == 90 && all.columns.toSeq == Seq("id", "lang", "v"))
    val en = t.readWhereString("lang", "en", "en")
    assert(en.inputFiles.length < all.inputFiles.length,
      s"partition stats pruned nothing (${en.inputFiles.length})")
    assert(en.count() == 30 &&
      en.select("lang").distinct().as[String].collect().toSeq == Seq("en"))

    // metadata-level partition read: entry selection by pvals
    val fr = t.readPartitions(Map("lang" -> "fr"))
    assert(fr.count() == 30 &&
      fr.select("lang").distinct().as[String].collect().toSeq == Seq("fr"))
    // a MOR delete still applies through the partition read
    t.commitDelete(Seq(1L, 4L).toDF("id")) // ids 1, 4 are fr (i % 3 == 1)
    assert(t.readPartitions(Map("lang" -> "fr")).count() == 28)

    // value hygiene fails loudly: nulls and path-hostile values
    intercept[IllegalArgumentException](t.commitAppend(
      Seq((200L, null: String, "x")).toDF("id", "lang", "v"), Seq("lang")))
    intercept[IllegalArgumentException](t.commitAppend(
      Seq((201L, "a/b", "x")).toDF("id", "lang", "v"), Seq("lang")))
    intercept[IllegalArgumentException](t.commitAppend(
      Seq((202L, "x", "y")).toDF("id", "lang", "v"), Seq("nope")))
  }

  test("optimizePartition: rewrite one partition, others metadata-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_op").toString
    val t = SnapshotLog.open(spark, root, "id")
    // fragment the en partition across 3 appends; fr/de land once each
    t.commitAppend(partDf(1 to 90, i => Seq("en", "fr", "de")((i % 3).toInt)),
      Seq("lang"))
    t.commitAppend(partDf(91 to 120, _ => "en"), Seq("lang"))
    t.commitAppend(partDf(121 to 150, _ => "en"), Seq("lang"))
    t.commitDelete(Seq(3L, 91L).toDF("id")) // two en rows masked (v4)
    val e0 = t.readEntry(t.currentVersion())
    val enEntries = e0.pvals.collect {
      case (d, vs) if vs("lang") == "en" => d }.toSet
    val foreign = e0.data.filterNot(enEntries)
    assert(enEntries.size == 3)

    val v = t.optimizePartition(Map("lang" -> "en"), 2)
    assert(t.opOf(v) == "optimize-partition")
    val e1 = t.readEntry(v)
    // foreign partitions carry METADATA-identical (same entry strings)
    assert(foreign.forall(e1.data.contains), "foreign entries must carry")
    assert(!e1.data.exists(enEntries), "en entries must leave the snapshot")
    // the sidecar FOLDED into the rewrite (masked en rows gone from
    // files) and carries for the other partitions
    assert(e1.deletes == e0.deletes)
    assert(t.read().count() == 148)
    // alignment PRESERVED: the rewritten dir re-enters pvals, partition
    // reads and replacePartitions keep working
    val en = t.readPartitions(Map("lang" -> "en"))
    assert(en.count() == 88 && // 90 appended en rows minus 2 masked
      en.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
    assert(t.partitionValues().values.count(_("lang") == "en") == 1)
    assert(t.partitionValues().values.exists(_ == Map("lang" -> "en")),
      "the rewritten dir must re-enter pvals under its assignment")

    // no-such-partition = exact metadata no-op
    val vNow = t.currentVersion()
    assert(t.optimizePartition(Map("lang" -> "zz"), 2) == vNow)

    // conflict pin: a commit landing under the rewrite throws (stale
    // base simulated by racing an append in between via a second handle)
    val t2 = SnapshotLog.open(spark, root, "id")
    val raceDf = partDf(300 to 301, _ => "fr")
    // interleave: compute-then-commit is not exposed, so emulate with
    // the documented base-pin semantics — optimizePartition re-reads the
    // base at entry, so race it with a concurrent append thread
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val th = new Thread(() =>
      try { t2.commitAppend(raceDf, Seq("lang")); () }
      catch { case e: Throwable => err.set(e) })
    th.start(); th.join(120000)
    assert(err.get() == null)
    // after the racing append, a fresh optimizePartition still works
    val v2 = t.optimizePartition(Map("lang" -> "fr"), 1)
    assert(t.opOf(v2) == "optimize-partition")
    assert(t.readPartitions(Map("lang" -> "fr")).count() == 32)

    // CALL spelling through the catalog
    spark.conf.set("spark.sql.catalog.opsnap", "graft.sources.SnaplogCatalog")
    val ov = spark.sql(s"CALL opsnap.optimize(table => '$root', " +
      "num_files => 1, partition => 'lang=de')").as[Int].head()
    assert(t.opOf(ov) == "optimize-partition")
    assert(t.readPartitions(Map("lang" -> "de")).count() == 30)
  }

  test("concurrent optimizePartition of DISJOINT partitions both land") {
    // the replacePartitions concurrency model applied to maintenance
    // (round 15): per-partition optimize jobs rebase instead of
    // conflict-pinning, so disjoint maintenance never serialises
    val root = java.nio.file.Files.createTempDirectory("graft_snap_oc").toString
    val t = SnapshotLog.open(spark, root, "id")
    for (_ <- 1 to 3)
      t.commitAppend(partDf(1 to 60, i => Seq("en", "fr")((i % 2).toInt)),
        Seq("lang"))
    assert(t.partitionValues().size == 6) // 3 fragments per lang
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ths = Seq("en", "fr").map { lang =>
      val th = new Thread(() =>
        try {
          SnapshotLog.open(spark, root, "id")
            .optimizePartition(Map("lang" -> lang), 1)
          ()
        } catch { case e: Throwable => errs.add(e); () })
      th.start(); th
    }
    ths.foreach(_.join(300000))
    assert(errs.isEmpty, errs.toString)
    assert(t.currentVersion() == 5, "both maintenance commits must land")
    val pv = t.partitionValues()
    assert(pv.size == 2 && pv.values.map(_("lang")).toSet == Set("en", "fr"),
      s"each partition must collapse to ONE aligned entry: $pv")
    assert(t.read().count() == 180)
    assert(t.readPartitions(Map("lang" -> "en")).count() == 90)
    // after a table-wide compact drops alignment, a partition optimize
    // finds no matching entries and is an exact metadata no-op
    t.compact()
    val vNow = t.currentVersion()
    assert(t.optimizePartition(Map("lang" -> "en"), 1) == vNow)
  }

  test("replacePartitions: metadata swap of exactly the incoming partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_rp").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(partDf(1 to 90, i => Seq("en", "fr", "de")((i % 3).toInt)),
      Seq("lang"))
    val enBefore = t.readPartitions(Map("lang" -> "en"))
      .select("id").as[Long].collect().toSet

    // replace ONLY the en partition (new ids 1000+); fr/de untouched,
    // their entries carried verbatim (same dirs, same pvals)
    val pvBefore = t.partitionValues()
    val v2 = t.commitReplacePartitions(
      partDf(1000 to 1019, _ => "en"), Seq("lang"))
    assert(v2 == 2)
    val pvAfter = t.partitionValues()
    val keptDirs = pvBefore.collect { case (d, vs) if vs("lang") != "en" => d }
    assert(keptDirs.forall(pvAfter.contains),
      "foreign partitions must carry over as the SAME entries")
    val en = t.readPartitions(Map("lang" -> "en")).select("id")
      .as[Long].collect().toSet
    assert(en == (1000L to 1019L).toSet && en.intersect(enBefore).isEmpty)
    assert(t.readPartitions(Map("lang" -> "fr")).count() == 30)
    assert(t.read().count() == 60 + 20)
    // time travel still sees the pre-replace partition
    assert(t.readPartitions(Map("lang" -> "en"), version = 1)
      .select("id").as[Long].collect().toSet == enBefore)

    // idempotent re-run (the backfill retry): same partitions, same rows
    t.commitReplacePartitions(partDf(1000 to 1019, _ => "en"), Seq("lang"))
    assert(t.read().count() == 80)

    // vacuum after the replace GCs the replaced leaf only after history
    // drops below it; with full retention nothing is collectable
    assert(t.vacuum(1)._1 == 0)
    val (gone, _) = { t.compact(); t.vacuum(t.currentVersion()) }
    assert(gone > 0, "replaced partition files must be collectable")
    assert(t.read().count() == 80)
  }

  test("replacePartitions refuses misalignment and pending sidecars loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_rr").toString
    val t = SnapshotLog.open(spark, root, "id")
    // unpartitioned entry in the listing → misaligned
    t.commitAppend(partDf(1 to 10, _ => "en"))
    intercept[IllegalStateException](
      t.commitReplacePartitions(partDf(11 to 12, _ => "en"), Seq("lang")))
    // partition-aligned table but a pending delete sidecar → refuse
    val root2 = java.nio.file.Files.createTempDirectory("graft_snap_rs").toString
    val t2 = SnapshotLog.open(spark, root2, "id")
    t2.commitAppend(partDf(1 to 10, _ => "en"), Seq("lang"))
    t2.commitDelete(Seq(1L).toDF("id"))
    intercept[IllegalArgumentException](
      t2.commitReplacePartitions(partDf(11 to 12, _ => "en"), Seq("lang")))
    // compact folds the sidecar; the replace then lands
    t2.compact()
    // post-compact the table is unpartitioned (rewrite drops alignment) —
    // the documented trade; re-ingesting partitioned restores it
    intercept[IllegalStateException](
      t2.commitReplacePartitions(partDf(11 to 12, _ => "en"), Seq("lang")))
  }

  test("concurrent replacePartitions of DISJOINT partitions both land") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_rc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(partDf(1 to 90, i => Seq("en", "fr", "de")((i % 3).toInt)),
      Seq("lang"))
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val jobs = Seq("en" -> (1000 to 1009), "fr" -> (2000 to 2009)).map {
      case (lang, ids) =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            gate.await()
            SnapshotLog.open(spark, root, "id")
              .commitReplacePartitions(partDf(ids, _ => lang), Seq("lang"))
          }
        })
    }
    gate.countDown()
    val versions = jobs.map(_.get()).sorted
    pool.shutdown()
    assert(versions == Seq(2, 3), s"both racers must land, got $versions")
    // the rebase composed both replaces: en AND fr replaced, de untouched
    assert(t.readPartitions(Map("lang" -> "en")).select("id")
      .as[Long].collect().toSet == (1000L to 1009L).toSet)
    assert(t.readPartitions(Map("lang" -> "fr")).select("id")
      .as[Long].collect().toSet == (2000L to 2009L).toSet)
    assert(t.readPartitions(Map("lang" -> "de")).count() == 30)
  }

  // ---- round 13 (late): CHECK constraints ----------------------------------

  test("constraints: add validates the table, every ingest path enforces") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_ck").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, i * 10, s"a$i")).toDF("id", "n", "v"))

    // an invariant existing rows violate is refused outright
    intercept[IllegalArgumentException](t.addConstraint("n_big", "n > 50"))
    assert(t.constraints().isEmpty)

    t.addConstraint("n_pos", "n > 0 AND v IS NOT NULL")
    assert(t.constraints() == Map("n_pos" -> "n > 0 AND v IS NOT NULL"))
    assert(t.opOf(t.currentVersion()) == "add-constraint")

    // every ingest path validates its batch (batch-sized, pre-write)
    val bad = Seq((20L, -1L, "x")).toDF("id", "n", "v")
    intercept[IllegalArgumentException](t.commitAppend(bad))
    intercept[IllegalArgumentException](t.commitAppend(bad, Seq("v")))
    intercept[IllegalArgumentException](t.commitAppendTxn(bad, "app", 1L))
    intercept[IllegalArgumentException](t.commitOverwrite(bad))
    intercept[IllegalArgumentException](t.commitMerge(bad))
    // NULL passes (SQL CHECK semantics): n IS NULL is not a violation
    t.commitAppend(Seq((21L, null.asInstanceOf[java.lang.Long], "ok"))
      .toDF("id", "n", "v"))

    // constraints carry across data commits and survive compact/optimize
    t.commitAppend(Seq((22L, 5L, "y")).toDF("id", "n", "v"))
    t.compact()
    assert(t.constraints().contains("n_pos"))
    intercept[IllegalArgumentException](t.commitAppend(bad))

    // drop re-admits; double-add and unknown-drop fail loudly
    intercept[IllegalArgumentException](t.addConstraint("n_pos", "n > 0"))
    t.dropConstraint("n_pos")
    intercept[IllegalArgumentException](t.dropConstraint("n_pos"))
    t.commitAppend(bad)
    assert(t.read().where(col("n") === -1L).count() == 1)
  }

  test("addConstraint conflict-checks: an interleaved commit throws") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_cc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 5L).map(i => (i, i)).toDF("id", "n"))
    // a commit lands between the validation scan (pinned at v1) and the
    // publish: the guard must throw, never publish a constraint the
    // interleaved rows were not validated against
    t.commitAppend(Seq((6L, 6L)).toDF("id", "n"))
    intercept[java.util.ConcurrentModificationException](
      t.addConstraintAt("late", "n > 0", v0 = 1))
    assert(t.constraints().isEmpty)
    // and with no interleaving the same pin commits cleanly
    t.addConstraintAt("ok", "n > 0", v0 = t.currentVersion())
    assert(t.constraints().contains("ok"))
  }

  // ---- round 13 (late): shallow clone --------------------------------------

  test("shallow clone: metadata-only copy, divergence stays independent") {
    val srcRoot = java.nio.file.Files.createTempDirectory("graft_snap_cs").toString
    val dstRoot = java.nio.file.Files.createTempDirectory("graft_snap_cd").toString
    java.nio.file.Files.delete(java.nio.file.Paths.get(dstRoot))
    val src = SnapshotLog.open(spark, srcRoot, "id")
    src.commitAppend(partDf(1 to 30, i => Seq("en", "fr")((i % 2).toInt)),
      Seq("lang"))
    src.addConstraint("pos", "id > 0")
    src.commitDelete(Seq(1L, 2L).toDF("id"))

    val before = src.read().select("id").as[Long].collect().toSet
    val clone = src.cloneTo(dstRoot)

    // pure metadata: the clone holds NO parquet of its own
    import scala.jdk.CollectionConverters._
    val owned = java.nio.file.Files.walk(java.nio.file.Paths.get(dstRoot))
      .iterator().asScala.filter(p => p.toString.endsWith(".parquet")).toSeq
    assert(owned.isEmpty, s"shallow clone copied data: $owned")
    assert(clone.read().select("id").as[Long].collect().toSet == before)
    // pvals, constraints, and the MOR sidecar all cross
    assert(clone.partitionValues().values.map(_("lang")).toSet ==
      Set("en", "fr"))
    intercept[IllegalArgumentException](
      clone.commitAppend(Seq((-5L, "en", "x")).toDF("id", "lang", "v")))

    // divergence: source delete invisible to the clone; clone append
    // invisible to the source
    src.commitDelete(Seq(10L).toDF("id"))
    clone.commitAppend(Seq((100L, "en", "z")).toDF("id", "lang", "v"))
    assert(clone.read().select("id").as[Long].collect().toSet.contains(10L),
      "a post-clone source delete must not leak into the clone")
    assert(clone.read().count() == before.size + 1)
    assert(src.read().count() == before.size - 1)

    // clone-side vacuum sweeps only clone-owned dirs: source files survive
    clone.compact()
    clone.vacuum(clone.currentVersion())
    assert(src.read().count() == before.size - 1,
      "vacuum on the clone must never touch source files")

    // cloning onto a non-empty table fails loudly
    intercept[IllegalArgumentException](src.cloneTo(dstRoot))
  }

  // ---- round 13 (late): predicate DML (DELETE WHERE / UPDATE WHERE) -------

  test("DELETE WHERE: aligned retention bands drop as PURE metadata") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_dw").toString
    val t = SnapshotLog.open(spark, root, "id")
    // key-clustered with EXACT 500-wide bands: parallelize slices the
    // ordered range evenly (repartitionByRange samples and may straddle
    // boundaries; a union of coalesced ranges gets collapsed by the
    // optimizer into one partition)
    t.commitAppend(spark.sparkContext.parallelize(0L until 4000L, 8)
      .toDF("id").select(col("id"), concat(lit("v"), col("id")).as("v")))
    def dataDirs() = {
      val p = java.nio.file.Paths.get(root, "data")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(p).iterator().asScala.size
    }
    val dirsBefore = dataDirs()
    val filesBefore = t.read().inputFiles.length

    // retention: drop ids < 1000 — two whole files, band-aligned, so the
    // commit writes NO data (no new c- dir) and reads NOTHING
    val v = t.commitDeleteWhere("id", 0L, 999L)
    assert(v == 2 && t.opOf(2) == "delete-where")
    assert(dataDirs() == dirsBefore, "aligned DELETE WHERE must be metadata-only")
    assert(t.read().inputFiles.length < filesBefore)
    assert(t.read().count() == 3000L &&
      t.read().agg(min(col("id"))).head().getLong(0) == 1000L)
    // time travel still sees the pre-delete snapshot
    assert(t.read(1).count() == 4000L)

    // boundary band: 1200..1399 straddles one 500-wide file — exactly
    // one file rewritten, the rest carried
    val v2 = t.commitDeleteWhere("id", 1200L, 1399L)
    assert(v2 == 3)
    assert(dataDirs() == dirsBefore + 1, "boundary delete rewrites once")
    assert(t.read().count() == 2800L)
    assert(t.read().where(col("id") >= 1200L && col("id") <= 1399L).count() == 0)

    // provable no-op commits NOTHING (version unchanged)
    assert(t.commitDeleteWhere("id", 50000L, 60000L) == 3)
    assert(t.currentVersion() == 3)
  }

  test("DELETE WHERE: NULL rows never match a range predicate and survive") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_dn").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(Seq(
      (1L, Some(10L)), (2L, Some(20L)), (3L, None), (4L, Some(30L)))
      .toDF("id", "n"))
    t.commitDeleteWhere("n", 0L, 25L)
    // 10 and 20 deleted; NULL and 30 survive
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 4L))
  }

  test("UPDATE WHERE: COW rewrite touches only stats-hit files") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_uw").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((0L until 4000L).map(i => (i, i * 10L, s"v$i"))
      .toDF("id", "n", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions(col("id")))
    val before = t.read().inputFiles.toSet
    t.commitUpdateWhere("id", 600L, 700L,
      Map("n" -> "n + 1000000", "v" -> "concat('U', v)"))
    val after = t.read().inputFiles.toSet
    assert(before.intersect(after).size >= 6,
      s"update must carry untouched files (${before.intersect(after).size})")
    val upd = t.read().where(col("id") >= 600L && col("id") <= 700L)
    assert(upd.count() == 101L)
    assert(upd.where(!col("v").startsWith("U")).count() == 0)
    assert(upd.agg(min(col("n"))).head().getLong(0) == 1006000L)
    // rows outside the band are untouched
    assert(t.read().where(col("id") === 599L).select("n").as[Long]
      .head() == 5990L)
    assert(t.read().count() == 4000L)

    // UPDATE validates the rewritten rows against CHECK constraints
    t.addConstraint("n_pos", "n >= 0")
    intercept[IllegalArgumentException](
      t.commitUpdateWhere("id", 0L, 10L, Map("n" -> "-1")))
    // a failed update leaves the table untouched
    assert(t.read().where(col("n") < 0L).count() == 0)
  }

  test("bucket transform: point lookups map through the hash to ONE entry") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_tb").toString
    val t = SnapshotLog.open(spark, root, "id")
    val df = (1L to 4000L).map(i => (i, s"u$i")).toDF("id", "v")
    t.commitAppend(df, Seq("bucket(8, id)"))
    val pv = t.partitionValues()
    assert(pv.values.flatMap(_.keySet).toSet == Set("bucket(8,id)"),
      "pvals must key by the CANONICAL spec")
    assert(pv.size == 8, s"4000 ids must hit all 8 buckets, got ${pv.size}")

    // hidden point-lookup pruning: the probe reads only the one bucket's
    // leaf (stats can't prune a hash layout; the transform mapping can)
    val probe = t.readWhereEquals("id", "1234")
    val expect = PTransform.bucketOf("1234", 8).toString
    assert(probe.count() == 1)
    assert(probe.inputFiles.nonEmpty &&
      probe.inputFiles.forall(_.contains(s"gp_bucket8_id=$expect")),
      s"probe escaped its bucket: ${probe.inputFiles.toSeq}")

    // readPartitions addresses a bucket by its derived value
    val bCount = t.readPartitions(Map("bucket(8,id)" -> expect)).count()
    assert(bCount > 0 &&
      t.readPartitions(Map("bucket(8, id)" -> expect)).count() == bCount,
      "spec spelling must canonicalize")
    // replacePartitions swaps exactly the buckets present in the new df
    t.commitReplacePartitions(
      Seq((1234L, "REPL")).toDF("id", "v"), Seq("bucket(8,id)"))
    assert(t.read().count() == 4000L - bCount + 1)
    assert(t.readWhereEquals("id", "1234").select("v").as[String]
      .collect().toSeq == Seq("REPL"))

    // spec hygiene fails loudly
    intercept[IllegalArgumentException](
      t.commitAppend(df, Seq("bucket(1, id)")))
    intercept[IllegalArgumentException](
      t.commitAppend(df, Seq("nonsense(id")))
    intercept[IllegalArgumentException](
      t.commitAppend(df, Seq("bucket(4, v)", "bucket(4,v)")))
  }

  test("truncate transform: band leaves serve range reads via footer stats") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_tt").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 4000L).map(i => (i, s"u$i")).toDF("id", "v"),
      Seq("truncate(1000, id)"))
    val pv = t.partitionValues()
    assert(pv.values.map(_("truncate(1000,id)")).toSet ==
      Set("0", "1000", "2000", "3000", "4000"))
    // the SOURCE column stays in the files, so each leaf's footer bounds
    // it to its band and readRange prunes with ZERO transform logic
    val r = t.readRange(1500L, 1700L)
    assert(r.count() == 201L)
    assert(r.inputFiles.forall(_.contains("gp_trunc1000_id=1000")),
      s"range read escaped its band: ${r.inputFiles.toSeq}")
    assert(t.readPartitions(Map("truncate(1000,id)" -> "2000"))
      .count() == 1000L)
    // string truncate: prefix bands
    val root2 = java.nio.file.Files.createTempDirectory("graft_snap_ts").toString
    val t2 = SnapshotLog.open(spark, root2, "id")
    t2.commitAppend(Seq((1L, "apple"), (2L, "apric"), (3L, "berry"))
      .toDF("id", "v"), Seq("truncate(2, v)"))
    assert(t2.partitionValues().values.map(_("truncate(2,v)")).toSet ==
      Set("ap", "be"))
    assert(t2.readWhereEquals("v", "apple").inputFiles
      .forall(_.contains("gp_trunc2_v=ap")))
  }

  test("days transform: calendar-day leaves, partition reads exact") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_td").toString
    val t = SnapshotLog.open(spark, root, "id")
    val base = 1704067200000L // 2024-01-01T00:00Z
    val df = (0 until 96).map(h =>
      (h.toLong, new java.sql.Timestamp(base + h * 3600000L)))
      .toDF("id", "ts")
    t.commitAppend(df, Seq("days(ts)"))
    val days = t.partitionValues().values.map(_("days(ts)")).toSet
    assert(days.size == 4 || days.size == 5, s"96 hours ≈ 4 days: $days")
    // each day's partition read ≡ the exact date_format filter
    for (d <- days) {
      val part = t.readPartitions(Map("days(ts)" -> d))
      val exact = df.where(date_format(col("ts"), "yyyy-MM-dd") === d)
      assert(part.count() == exact.count(), s"day $d mismatch")
    }
    // a days table refuses non-temporal sources
    intercept[IllegalArgumentException](
      t.commitAppend((1L to 3L).map(i => (i, s"x$i")).toDF("id", "v"),
        Seq("days(v)")))
  }

  // ---- round 13 (late): Bloom-filter file-skipping index -------------------

  test("bloom index: fragmented point lookups skip files, never lose rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_bl").toString
    val t = SnapshotLog.open(spark, root, "id")
    def batch(ids: Range) =
      ids.map(i => (i.toLong, s"u$i", s"p$i")).toDF("id", "url", "v")
    // pre-config commit: its files never get filters — always scanned
    t.commitAppend(batch(1 to 4000).repartition(8))
    assert(t.readWhereEquals("url", "u123").count() == 1)

    t.setBloomColumns(Seq("url", "id"))
    assert(t.bloomColumns() == Map("url" -> 10, "id" -> 10))
    t.commitAppend(batch(4001 to 8000).repartition(8))

    // the new commit's dir carries the sidecar; the old one doesn't
    import scala.jdk.CollectionConverters._
    val blooms = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala
      .filter(_.getFileName.toString == "_bloom.json").toSeq
    assert(blooms.size == 1, s"exactly the post-config commit is indexed: $blooms")

    val total = t.read().inputFiles.length
    // a value in the BLOOMED batch: 8 unbloomed files always scanned,
    // bloom admits ~1 of the 8 indexed ones
    val probe = t.readWhereEquals("url", "u5000")
    assert(probe.inputFiles.length < total,
      s"bloom pruned nothing (${probe.inputFiles.length}/$total)")
    assert(probe.count() == 1)
    // integral column probes through the same index
    assert(t.readWhereEquals("id", "6000").count() == 1)
    // a value NOT in the table: zero rows (and only unbloomed+fp files read)
    val miss = t.readWhereEquals("url", "absent")
    assert(miss.count() == 0 && miss.inputFiles.length < total)

    // OPTIMIZE rewrites everything under the config → all files indexed;
    // the point probe now reads a small fraction of the table
    t.optimize(8)
    val opt = t.readWhereEquals("url", "u123")
    assert(opt.inputFiles.length <= 2,
      s"post-OPTIMIZE bloom must prune hard (${opt.inputFiles.length}/8)")
    assert(opt.count() == 1)

    // no false negatives, ever (shared hash contract build↔probe)
    for (i <- 1 to 20)
      assert(t.readWhereEquals("url", s"u${i * 397}").count() == 1,
        s"false negative for u${i * 397}")

    // MOR delete still applies through the bloom read
    t.commitDelete(Seq(123L).toDF("id"))
    assert(t.readWhereEquals("url", "u123").count() == 0)
  }

  test("bloom config: validation, clear, partitioned builds, clone crossing") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_bc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(Seq((1L, "en", 0.5, "x")).toDF("id", "lang", "score", "v"))
    intercept[IllegalArgumentException](t.setBloomColumns(Seq("nope")))
    intercept[IllegalArgumentException](t.setBloomColumns(Seq("score")))
    intercept[IllegalArgumentException](t.setBloomColumns(Seq("v"), 99))

    t.setBloomColumns(Seq("v"))
    // partitioned appends build per-LEAF sidecars
    t.commitAppend((2L to 41L).map(i =>
        (i, Seq("en", "fr")((i % 2).toInt), 0.1, s"v$i"))
      .toDF("id", "lang", "score", "v"), Seq("lang"))
    import scala.jdk.CollectionConverters._
    def sidecars() = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala
      .filter(_.getFileName.toString == "_bloom.json").toSeq
    assert(sidecars().size == 2, s"one sidecar per leaf: ${sidecars()}")
    assert(t.readWhereEquals("v", "v7").count() == 1)

    // clearing the config stops indexing new commits
    t.setBloomColumns(Nil)
    assert(t.bloomColumns().isEmpty)
    val before = sidecars().size
    t.commitAppend(Seq((99L, "en", 0.2, "z")).toDF("id", "lang", "score", "v"))
    assert(sidecars().size == before, "cleared config must not build filters")

    // the config crosses a shallow clone
    t.setBloomColumns(Seq("v"))
    val dst = root + "_clone"
    val clone = t.cloneTo(dst)
    assert(clone.bloomColumns() == Map("v" -> 10))
  }

  // ---- round 14: ADVICE r13 closures ---------------------------------------

  test("days transform derives the UTC day under ANY session time zone") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_tz").toString
    val t = SnapshotLog.open(spark, root, "id")
    val base = 1704067200000L // 2024-01-01T00:00Z
    // rows straddle a UTC midnight: hours 22..26 of 2023-12-31
    val df = (0 until 5).map(h =>
      (h.toLong, new java.sql.Timestamp(base - 7200000L + h * 3600000L)))
      .toDF("id", "ts")
    t.commitAppend(df, Seq("days(ts)"))
    val days = t.partitionValues().values.map(_("days(ts)")).toSet
    assert(days == Set("2023-12-31", "2024-01-01"), s"UTC days: $days")
    def counts() = days.map(d =>
      d -> t.readPartitions(Map("days(ts)" -> d)).count()).toMap
    val utcCounts = counts()
    assert(utcCounts == Map("2023-12-31" -> 2L, "2024-01-01" -> 3L))
    // a reader session pinned to a DIFFERENT zone recomputes the SAME
    // derived day (ADVICE r13: session-TZ date_format silently dropped
    // rows from correctly-selected partitions)
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
      assert(counts() == utcCounts,
        "partition reads must be session-TZ independent")
      // and a WRITER in a foreign zone logs the same UTC day values
      val root2 = java.nio.file.Files.createTempDirectory("graft_snap_tz2")
        .toString
      val t2 = SnapshotLog.open(spark, root2, "id")
      t2.commitAppend(df, Seq("days(ts)"))
      assert(t2.partitionValues().values.map(_("days(ts)")).toSet == days,
        "logged day values must be UTC regardless of the writer's zone")
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
    // DATE columns are calendar days already — never shifted by the pin
    val dt = SnapshotLog.open(spark,
      java.nio.file.Files.createTempDirectory("graft_snap_tzd").toString, "id")
    val dDf = Seq((1L, java.sql.Date.valueOf("2024-03-05")),
      (2L, java.sql.Date.valueOf("2024-03-06"))).toDF("id", "d")
    dt.commitAppend(dDf, Seq("days(d)"))
    assert(dt.partitionValues().values.map(_("days(d)")).toSet ==
      Set("2024-03-05", "2024-03-06"))
    assert(dt.readPartitions(Map("days(d)" -> "2024-03-05")).count() == 1)
  }

  test("UPDATE SET on the key column refuses pending delete sidecars") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_uk").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 20L).map(i => (i, i * 10)).toDF("id", "n"))
    t.commitDelete(Seq(5L).toDF("id"))
    // rewriting id under the sidecar could resurrect id=5 (ADVICE r13)
    intercept[IllegalArgumentException](
      t.commitUpdateWhere("n", 40, 60, Map("id" -> "id + 100")))
    assert(t.read().where(col("id") === 5L).count() == 0)
    // non-key SET columns stay allowed under a sidecar
    t.commitUpdateWhere("n", 40, 60, Map("n" -> "n + 1"))
    assert(t.read().where(col("id") === 5L).count() == 0,
      "the sidecar must still mask after a non-key update")
    // after compact folds the sidecar, key updates are unambiguous
    t.compact()
    t.commitUpdateWhere("n", 41, 41, Map("id" -> "id + 100"))
    assert(t.read().where(col("id") === 104L).count() == 1)
    assert(t.read().where(col("id") === 5L).count() == 0)
  }

  test("append rebasing over a racing addConstraint re-validates the batch") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_rc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 5L).map(i => (i, i)).toDF("id", "n"))
    t.addConstraint("n_pos", "n > 0")
    // a batch validated BEFORE the constraint existed (the seam pins the
    // stale validated set) must be re-checked on rebase, not published
    intercept[IllegalArgumentException](
      t.commitAppendValidated(Seq((9L, -1L)).toDF("id", "n"), Map.empty))
    assert(t.read().where(col("n") === -1L).count() == 0,
      "the racing append must not land rows the new invariant forbids")
    // a conforming batch under the same stale set still lands
    t.commitAppendValidated(Seq((10L, 10L)).toDF("id", "n"), Map.empty)
    assert(t.read().where(col("id") === 10L).count() == 1)
  }

  test("readWhereEquals canonicalizes integral probe spellings") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_cn").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 50L).map(i => (i, s"u$i")).toDF("id", "url"))
    t.setBloomColumns(Seq("id"))
    t.commitAppend((51L to 100L).map(i => (i, s"u$i")).toDF("id", "url"))
    // non-canonical spellings of 77 (bloomed batch) and 5 (bucketed probe
    // path) must match — the filter hashed "77", never "077" (ADVICE r13)
    for (sp <- Seq("77", "077", " 77", "77 ")) {
      assert(t.readWhereEquals("id", sp).count() == 1,
        s"spelling '$sp' must probe the canonical form")
    }
    // bucket-transform pval pruning probes the canonical spelling too
    val root2 = java.nio.file.Files.createTempDirectory("graft_snap_cb").toString
    val t2 = SnapshotLog.open(spark, root2, "id")
    t2.commitAppend((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq("bucket(4,id)"))
    for (sp <- Seq("7", "07", " 7")) {
      assert(t2.readWhereEquals("id", sp).count() == 1,
        s"bucket pval pruning must canonicalize '$sp'")
    }
  }

  test("vacuum sweeps orphan markers of fully-dropped partition leaves") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap_vm").toString
    val t2 = SnapshotLog.open(spark, root, "id")
    t2.commitAppend(partDf(1 to 30, i => Seq("en", "fr")((i % 2).toInt)),
      Seq("lang"))
    t2.setBloomColumns(Seq("v")) // build _bloom.json per leaf
    t2.commitAppend(partDf(31 to 60, i => Seq("en", "fr")((i % 2).toInt)),
      Seq("lang"))
    // replace ONLY the "fr" partition: both commits' fr leaves drop out
    // of the listing while their sibling en leaves stay referenced
    t2.commitReplacePartitions(partDf(61 to 70, _ => "fr"), Seq("lang"))
    t2.vacuum(t2.currentVersion())
    import scala.jdk.CollectionConverters._
    val leaves = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("gp_lang="))
      .toSeq
    // every surviving leaf dir holds data; no leaf survives as a bare
    // marker shell (ADVICE r13: keptNames was computed across the whole
    // commit dir, so a dropped leaf kept its _bloom.json forever)
    for (leaf <- leaves) {
      val files = java.nio.file.Files.list(leaf).iterator().asScala
        .map(_.getFileName.toString).toSeq
      assert(files.exists(_.endsWith(".parquet")),
        s"orphan marker shell survived vacuum: $leaf -> $files")
    }
    assert(t2.read().count() == 15 + 15 + 10)
  }

  test("RESTORE TO TIMESTAMP resolves against logged commit times") {
    val root = java.nio.file.Files.createTempDirectory("graft_rts").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")) // v1
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    t.commitAppend((11L to 20L).map(i => (i, s"v$i")).toDF("id", "v")) // v2
    t.commitDeleteWhere("id", 1, 3)                                    // v3
    assert(t.versionAtTime(between) == 1)
    // API spelling
    val rv = t.restoreToTimestamp(between)
    assert(t.opOf(rv) == "restore")
    assert(t.read().count() == 10)
    // CALL spelling: roll FORWARD again to v3's state by version, then
    // back by timestamp through SQL
    spark.conf.set("spark.sql.catalog.rtsw", "graft.sources.SnaplogCatalog")
    spark.sql(s"CALL rtsw.restore(table => '$root', version => 3)")
    assert(t.read().count() == 17)
    spark.sql(s"CALL rtsw.restore(table => '$root', " +
      s"timestamp_ms => $between)")
    assert(t.read().count() == 10)
    // exactly-one-spelling guard + too-early timestamp refuse loudly
    intercept[Exception](spark.sql(
      s"CALL rtsw.restore(table => '$root')"))
    intercept[IllegalArgumentException](t.restoreToTimestamp(1000L))
  }
}
