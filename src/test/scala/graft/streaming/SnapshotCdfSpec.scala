package graft.streaming

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

class SnapshotCdfSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._
  import scala.jdk.CollectionConverters._

  private def files(dir: String): Set[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) Set.empty
    else {
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).toSet
      finally s.close()
    }
  }

  test("snapshot CDF stream: backfill, incremental catch-up, idempotence") {
    val root = java.nio.file.Files.createTempDirectory("graft_scdf_sp").toString
    val sink = s"$root/feed"
    val ckpt = s"$root/ckpt"
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))   // v1
    t.commitAppend((11L to 15L).map(i => (i, s"b$i")).toDF("id", "v"))  // v2

    // initial backfill drains versions 1-2
    SnapshotCdf.backfill(spark, root, "id", sink, ckpt)
    val feed1 = SnapshotCdf.feed(spark, sink)
    assert(feed1.select("cdf_version").distinct().as[Int]
      .collect().sorted.toSeq == Seq(1, 2))
    // version 1 is the pure-insert backfill of the first commit
    assert(feed1.where(col("cdf_version") === 1).count() == 10)
    assert(feed1.where(col("cdf_version") === 1 &&
      col("_change_type") =!= "insert").count() == 0)

    val v1FilesAfterFirst = files(s"$sink/cdf_version=1")
    assert(v1FilesAfterFirst.nonEmpty)

    // two more commits land AFTER the first drain
    t.commitDelete(Seq(2L, 12L).toDF("id"))                             // v3
    t.commitMerge(Seq((5L, "U5"), (20L, "N20")).toDF("id", "v"))        // v4

    // catch-up with the SAME checkpoint processes exactly v3-v4:
    // the already-landed v=1 partition is untouched (same physical files)
    SnapshotCdf.backfill(spark, root, "id", sink, ckpt)
    val feed2 = SnapshotCdf.feed(spark, sink)
    assert(feed2.select("cdf_version").distinct().as[Int]
      .collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(files(s"$sink/cdf_version=1") == v1FilesAfterFirst,
      "catch-up must not rewrite already-processed versions")

    // per-version slices are EXACTLY the batch changes() diffs
    for (v <- 1 to 4) {
      val streamed = feed2.where(col("cdf_version") === v)
        .select("id", "v", "_change_type")
        .as[(Long, String, String)].collect().toSet
      val batch = t.changes(v - 1, v)
        .as[(Long, String, String)].collect().toSet
      assert(streamed == batch, s"version $v slice diverges")
    }

    // a third run with nothing new is a no-op
    val allBefore = files(sink)
    SnapshotCdf.backfill(spark, root, "id", sink, ckpt)
    assert(files(sink) == allBefore, "idle re-run must write nothing")
  }

  test("snapcdf MicroBatchStream: version admission, backfill parity, catch-up") {
    val base = java.nio.file.Files.createTempDirectory("graft_mbs").toString
    val root = s"$base/table"; val ckpt = s"$base/ckpt"
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, s"a$i")).toDF("id", "v")
      .repartition(2))                                                  // v1
    assert(t.commitAppendTxn((11L to 15L).map(i => (i, s"b$i")).toDF("id", "v"),
      "w", 0L).contains(2))                                             // v2
    t.commitAppend((16L to 18L).map(i => (i, s"c$i")).toDF("id", "v"))  // v3

    val batches = scala.collection.mutable.ListBuffer.empty[(Long, Set[(Long, String, String, Int)])]
    def drain(): Unit = {
      val q = spark.readStream.format("snapcdf")
        .option("maxVersionsPerTrigger", 1)
        .load(root)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = b.select("id", "v", "_change_type", "cdf_version")
            .collect().map(r => (r.getLong(0), r.getString(1),
              r.getString(2), r.getInt(3))).toSet
          batches.synchronized { batches += ((id, rows)); () }
        }
        .start()
      q.awaitTermination()
    }
    drain()
    // per-version admission: every non-empty micro-batch carries EXACTLY
    // one version, and versions arrive in order
    val nonEmpty = batches.toList.filter(_._2.nonEmpty)
    assert(nonEmpty.forall(_._2.map(_._4).size >= 1))
    assert(nonEmpty.forall(b => b._2.map(_._4).toSeq.distinct.size == 1),
      s"maxVersionsPerTrigger=1 violated: $nonEmpty")
    assert(nonEmpty.map(_._2.head._4) == List(1, 2, 3))
    // parity with the file-source backfill composition on the same table
    val sink = s"$base/feed"
    SnapshotCdf.backfill(spark, root, "id", sink, s"$base/bckpt")
    val fromBackfill = SnapshotCdf.feed(spark, sink)
      .select("id", "v", "_change_type", "cdf_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3))).toSet
    assert(batches.flatMap(_._2).toSet == fromBackfill,
      "MicroBatchStream feed must equal the backfill composition")

    // restart/catch-up: two more commits, same checkpoint → only 4 and 5
    batches.clear()
    t.commitAppend((19L to 20L).map(i => (i, s"d$i")).toDF("id", "v"))  // v4
    t.commitAppend(Seq((21L, "e21")).toDF("id", "v"))                   // v5
    drain()
    assert(batches.flatMap(_._2).map(_._4).toSet == Set(4, 5),
      s"catch-up must process only new versions: ${batches.toList}")

    // a non-append commit in the admitted range fails LOUDLY
    t.commitDelete(Seq(1L).toDF("id"))                                  // v6
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("append-family")), e.toString)

    // startVersion skips history; the admitted appends apply their own
    // entry's delete sidecar in-reader: v7 re-appends the deleted key 1,
    // which is invisible at v7 (still sidecar-deleted) and must NOT
    // surface as an insert — exactly changes(6, 7)
    t.commitAppend(Seq((1L, "GHOST"), (22L, "f22")).toDF("id", "v"))    // v7
    val fresh = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Int)]
    val q2 = spark.readStream.format("snapcdf")
      .option("startVersion", 6)
      .load(root)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        fresh.synchronized {
          fresh ++= b.select("id", "v", "_change_type", "cdf_version")
            .collect().map(r => (r.getLong(0), r.getString(1),
              r.getString(2), r.getInt(3)))
          ()
        }
      }
      .start()
    q2.awaitTermination()
    assert(fresh.toSet == Set((22L, "f22", "insert", 7)),
      s"sidecar-deleted re-append must not surface: ${fresh.toList}")
    val batchDiff = t.changes(6, 7).as[(Long, String, String)].collect().toSet
    assert(fresh.map(x => (x._1, x._2, x._3)).toSet == batchDiff)
  }

  test("snapcdf MicroBatchStream serves cdc-enabled merges (round 13)") {
    val base = java.nio.file.Files.createTempDirectory("graft_mbs2").toString
    val root = s"$base/table"
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))    // v1
    t.commitMerge(Seq((5L, "U5"), (20L, "N20")).toDF("id", "v"),
      cdc = true)                                                        // v2
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Int)]
    val q = spark.readStream.format("snapcdf").load(root)
      .writeStream.option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= b.select("id", "v", "_change_type", "cdf_version")
            .collect().map(r => (r.getLong(0), r.getString(1),
              r.getString(2), r.getInt(3)))
          ()
        }
      }
      .start()
    q.awaitTermination()
    val v2Rows = rows.filter(_._4 == 2).map(x => (x._1, x._2, x._3)).toSet
    val batch = t.changes(1, 2).as[(Long, String, String)].collect().toSet
    assert(v2Rows === batch,
      s"merge version must stream its exact diff: $v2Rows vs $batch")
    assert(v2Rows.contains((5L, "a5", "delete")) &&
      v2Rows.contains((5L, "U5", "insert")) &&
      v2Rows.contains((20L, "N20", "insert")))
    assert(rows.count(_._4 == 1) === 10, "the backfill inserts still stream")
    // a cdc-LESS merge still fails loudly
    t.commitMerge(Seq((6L, "U6")).toDF("id", "v"))                       // v3
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = spark.readStream.format("snapcdf").load(root)
        .writeStream.option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      q2.awaitTermination()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("cdc = true")), e.toString)
  }

  test("cdc predicate DML: exact change rows, masked rows stay invisible") {
    // round 16 — Delta's CDF on DELETE/UPDATE: cdc = true materializes
    // the exact change rows (dropped-whole files' rows included) and the
    // snapcdf stream serves the DML versions instead of refusing
    val root = java.nio.file.Files.createTempDirectory("graft_cdml").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 100L).map(i => (i, i * 10))
      .toDF("id", "n").repartitionByRange(5, col("id")))          // v1
    t.commitDelete(Seq(25L, 60L).toDF("id"))                      // v2 (MOR)
    // banded cdc DELETE: [21,40] spans a fully-dropped file and boundary
    // files; the MOR-masked id 25 must NOT surface as a change row
    val v3 = t.commitDeleteWhere("id", 21, 40, cdc = true)        // v3
    assert(t.readEntry(v3).cdc.isDefined)
    val del3 = spark.read.parquet(t.readEntry(v3).cdc.get)
    assert(del3.count() == 19, s"got ${del3.count()}") // 20 minus masked 25
    assert(del3.where(col("id") === 25L).count() == 0,
      "sidecar-masked rows must not surface as deletes")
    // cdc UPDATE: pre+post pairs for visible matched rows only
    val v4 = t.commitUpdateWhere("id", 55, 65,
      Map("n" -> "n + 1000"), cdc = true)                         // v4
    val ch4 = spark.read.parquet(t.readEntry(v4).cdc.get)
    assert(ch4.count() == 20, s"got ${ch4.count()}") // 10 visible × 2
    assert(ch4.where(col("id") === 60L).count() == 0)
    assert(ch4.where(col("id") === 55L && col("n") === 1550L).count() == 1)
    // the batch diff and the sidecar agree exactly
    val diff4 = t.changes(3, 4)
    assert(diff4.exceptAll(ch4.select(diff4.columns.map(col): _*)).isEmpty)
    assert(ch4.select(diff4.columns.map(col): _*).exceptAll(diff4).isEmpty)

    // the snapcdf stream drains the DML versions (started past the v2
    // MOR sidecar commit — plain `delete` stays an exact-diff refusal)
    val sink = java.nio.file.Files.createTempDirectory("graft_cdmls")
      .toString
    val q = spark.readStream.format("snapcdf")
      .option("startVersion", 2).load(root)
      .writeStream.option("checkpointLocation", s"$sink/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(s"$sink/out")
        ()
      }.start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$sink/out")
    assert(out.where(col("cdf_version") === 3 &&
      col("_change_type") === "delete").count() == 19)
    assert(out.where(col("cdf_version") === 4).count() == 20)
    assert(out.where(col("cdf_version") === 4 &&
      col("_change_type") === "insert" && col("n") > 1000L).count() == 10)
    // a NON-cdc DML version still refuses loudly
    t.commitDeleteWhere("id", 1, 2)                               // v5
    val q2 = spark.readStream.format("snapcdf")
      .option("startVersion", 4).load(root)
      .writeStream.option("checkpointLocation", s"$sink/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val err = intercept[Exception](q2.awaitTermination())
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(err).exists(_.contains("cdc = true")), err.toString)
  }

  test("txn ingest: exactly-once across restart, catch-up, forced replay") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_snapsink_sp").toString
    val srcDir = s"$base/src"
    val root = s"$base/table"
    val ckpt = s"$base/ckpt"
    // 3 source files, one per micro-batch, mtime-ordered like stagedEvents
    val rows = (1L to 30L).map(i => (i, s"r$i"))
    for (g <- 0 until 3)
      rows.slice(g * 10, g * 10 + 10).toDF("id", "v").coalesce(1)
        .write.parquet(s"$srcDir/g$g")
    val parts = new java.io.File(srcDir).listFiles().sortBy(_.getName)
      .flatMap(d => d.listFiles().filter(_.getName.startsWith("part-")))
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1000000L + i * 1000L); () }
    val schema = spark.read.parquet(s"$srcDir/g0").schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(srcDir)

    SnapshotCdf.ingest(src, root, "id", "app", ckpt)
    val t = SnapshotLog.open(spark, root, "id")
    val vAfter = t.currentVersion()
    assert(vAfter >= 1 && t.read().count() == 30)
    assert(t.lastTxn("app").isDefined)

    // restart on the same checkpoint with no new data: nothing commits
    SnapshotCdf.ingest(src, root, "id", "app", ckpt)
    assert(t.currentVersion() == vAfter && t.read().count() == 30)

    // FORCED replay: delete the final batch's commit marker so the
    // restart re-executes it (offsets say "planned", commits say "never
    // finished" — the crash-between-sink-and-commit window). foreachBatch
    // alone would double those 10 rows; the txn watermark must skip them.
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists) assert(crc.delete()) // ChecksumFs shadow of the marker
    SnapshotCdf.ingest(src, root, "id", "app", ckpt)
    assert(t.read().count() == 30,
      "replayed final batch must be deduplicated by the txn watermark")
    assert(t.read().groupBy(col("id")).count()
      .where(col("count") > 1).count() == 0)

    // new source data after all that still lands (watermark advances)
    rows.take(3).map { case (i, v) => (i + 100, v) }.toDF("id", "v")
      .coalesce(1).write.parquet(s"$srcDir/g3")
    SnapshotCdf.ingest(src, root, "id", "app", ckpt)
    assert(t.read().count() == 33)
  }

  test("snapcdf streams partitioned appends; metadata-only commits admit silently") {
    val base = java.nio.file.Files.createTempDirectory("graft_mbp").toString
    val root = s"$base/table"; val ckpt = s"$base/ckpt"
    val t = SnapshotLog.open(spark, root, "id")
    def part(ids: Range, tag: String) =
      ids.map(i => (i.toLong, Seq("a", "b")((i % 2)), s"$tag$i"))
        .toDF("id", "p", "v")
    t.commitAppend(part(1 to 12, "x"), Seq("p"))   // v1 — two leaf entries
    t.addConstraint("pos", "id > 0")               // v2 — metadata-only
    t.setBloomColumns(Seq("v"))                    // v3 — metadata-only
    t.commitAppend(part(13 to 15, "y"), Seq("p"))  // v4 — leaf entries again
    val got = scala.collection.mutable.Set.empty[(Long, String, String, Int)]
    val q = spark.readStream.format("snapcdf")
      .option("maxVersionsPerTrigger", 1)
      .load(root)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("id", "p", "_change_type", "cdf_version").collect()
          .foreach(r => got.synchronized {
            got += ((r.getLong(0), r.getString(1), r.getString(2),
              r.getInt(3))); ()
          })
        ()
      }
      .start()
    q.awaitTermination()
    // every row surfaces exactly once as an insert at its commit's
    // version, partition column included; the metadata commits (v2, v3)
    // contribute nothing and never fail the stream
    assert(got.map(_._4).toSet == Set(1, 4), s"versions: ${got.map(_._4)}")
    assert(got.count(_._4 == 1) == 12 && got.count(_._4 == 4) == 3)
    assert(got.forall(_._3 == "insert"))
    assert(got.filter(_._4 == 4).map(r => (r._1, r._2)) ==
      Set((13L, "b"), (14L, "a"), (15L, "b")))
  }
}
