package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotLogDeltaSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def entryBytes(root: String, v: Int): Long =
    java.nio.file.Files.size(java.nio.file.Paths.get(root, "_log", s"$v.json"))

  private def isDelta(root: String, v: Int): Boolean =
    SnapshotLog.Json.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "_log", s"$v.json"))).has("base")

  test("delta entries: change-sized publishes, checkpoints every K, exact reads") {
    val root = java.nio.file.Files.createTempDirectory("graft_sd").toString
    val t = SnapshotLog.open(spark, root, "id")
    for (i <- 1 to 25)
      t.commitAppend(Seq((i.toLong, s"v$i")).toDF("id", "v"))
    // v1 and every 10th version are FULL checkpoints; the rest deltas
    assert(!isDelta(root, 1) && !isDelta(root, 10) && !isDelta(root, 20))
    for (v <- Seq(2, 5, 9, 11, 19, 21, 25))
      assert(isDelta(root, v), s"v$v should be a delta")
    // per-publish bytes are CHANGE-sized: the last delta is no bigger
    // than the first even though 24 more dirs are live (the r13 full
    // listing grew ~57 B per live dir per publish)
    assert(entryBytes(root, 25) <= entryBytes(root, 2) + 64,
      s"delta bytes grew with live-entry count: " +
        s"v2=${entryBytes(root, 2)} v25=${entryBytes(root, 25)}")
    // a checkpoint DOES carry the full listing (sanity: it is bigger)
    assert(entryBytes(root, 20) > 3 * entryBytes(root, 21))
    // every version resolves exactly
    for (v <- 1 to 25) assert(t.read(v).count() == v.toLong, s"v$v")
    // stats pruning works through delta resolution at any version
    val pruned = t.readRange(3, 3, version = 25)
    assert(pruned.count() == 1 &&
      pruned.inputFiles.length < t.read().inputFiles.length)
  }

  test("delta chains survive MOR deletes, merges, DML, and vacuum") {
    val root = java.nio.file.Files.createTempDirectory("graft_sd2").toString
    val t = SnapshotLog.open(spark, root, "id")
    for (i <- 0 until 4)
      t.commitAppend((i * 100L until i * 100L + 100L).map(j => (j, s"v$j"))
        .toDF("id", "v"))                                     // v1..v4
    t.commitDelete(Seq(5L, 105L).toDF("id"))                  // v5 (delta)
    assert(isDelta(root, 5))
    assert(t.read().count() == 398)
    val band = (50L to 59L).map(j => (j, s"M$j")).toDF("id", "v")
    t.commitMerge(band)                                       // v6
    assert(t.read().where(col("v").startsWith("M")).count() == 10)
    t.commitUpdateWhere("id", 200, 209, Map("v" -> "'U'"))    // v7
    assert(t.read().where(col("v") === "U").count() == 10)
    t.commitDeleteWhere("id", 300, 319)                       // v8
    assert(t.read().count() == 378)
    // resolution at every retained version agrees with recorded history
    val counts = (1 to 8).map(v => t.read(v).count())
    assert(counts == counts.take(4) ++ Seq(398L, 398L, 398L, 378L),
      counts.toString)

    // vacuum to a mid-chain horizon: the horizon entry materializes FULL
    // so no retained delta references a vacuumed ancestor
    assert(isDelta(root, 6))
    val (_, droppedEntries) = t.vacuum(6)
    assert(droppedEntries == 5)
    assert(!isDelta(root, 6), "the horizon entry must be self-contained")
    // fresh handle (no cache): everything retained still resolves
    val t2 = SnapshotLog.open(spark, root, "id")
    assert(t2.read(6).count() == 398 && t2.read(8).count() == 378)
    intercept[IllegalArgumentException](t2.read(3))
    // and new commits keep working on the vacuumed chain
    t2.commitAppend(Seq((9999L, "z")).toDF("id", "v"))
    assert(t2.read().count() == 379)
  }

  test("constraints/bloom/txn/pvals ride delta entries full (no chain reads)") {
    val root = java.nio.file.Files.createTempDirectory("graft_sd3").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 40L).map(i =>
      (i, Seq("en", "fr")((i % 2).toInt), s"v$i")).toDF("id", "lang", "v"),
      Seq("lang"))                                            // v1 full
    t.addConstraint("pos", "id > 0")                          // v2 delta
    t.setBloomColumns(Seq("v"))                               // v3 delta
    t.commitAppendTxn((41L to 42L).map(i => (i, "en", s"v$i"))
      .toDF("id", "lang", "v"), "app", 7L)                    // v4 delta
    assert(isDelta(root, 2) && isDelta(root, 3) && isDelta(root, 4))
    assert(t.constraints() == Map("pos" -> "id > 0"))
    assert(t.bloomColumns() == Map("v" -> 10))
    assert(t.lastTxn("app").contains(7L))
    // pvals carried through delta resolution: partition reads stay exact
    assert(t.readPartitions(Map("lang" -> "fr")).count() == 20)
    assert(t.partitionValues().values.map(_("lang")).toSet ==
      Set("en", "fr"))
    // the bloom probe still prunes through a delta-resolved entry
    t.commitAppend((100L to 139L).map(i => (i, "de", s"v$i"))
      .toDF("id", "lang", "v"))                               // v5 delta
    val probe = t.readWhereEquals("v", "v120")
    assert(probe.count() == 1)
  }
}
