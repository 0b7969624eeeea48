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
}
