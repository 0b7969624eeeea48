package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColumnMappingSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def parquetCount(root: String): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala.count(_.toString.endsWith(".parquet")).toLong
  }

  test("rename: metadata-only, per-version names, appends + pruning follow") {
    val root = java.nio.file.Files.createTempDirectory("graft_cm").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 100L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "score", "name").repartitionByRange(4, col("id")))
    val files1 = parquetCount(root)

    t.renameColumn("score", "points")                       // v2, metadata
    assert(parquetCount(root) == files1, "rename must move NO data")
    assert(t.columnMap() == Map("points" -> "score"))
    assert(t.read().columns.toSeq == Seq("id", "points", "name"))
    assert(t.read().where(col("points") === 500L).count() == 1)
    // time travel reads v1 under its own names
    assert(t.read(1).columns.toSeq == Seq("id", "score", "name"))

    // appends after the rename land under the PHYSICAL name and read back
    t.commitAppend((101L to 120L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "points", "name"))                        // v3
    assert(t.read().count() == 120)
    assert(t.read().where(col("points") === 1100L).count() == 1)
    // stats pruning on the renamed column probes the physical stats
    val pr = t.readWhere("points", 10L, 100L)
    assert(pr.count() == 10 &&
      pr.inputFiles.length < t.read().inputFiles.length,
      "logged stats must still prune through the mapping")
    // MOR deletes apply (key column is never mapped)
    t.commitDelete(Seq(5L).toDF("id"))
    assert(t.read().count() == 119)

    // chained rename + rename-back collapses to identity
    t.renameColumn("points", "pts")
    assert(t.columnMap() == Map("pts" -> "score"))
    t.renameColumn("pts", "score")
    assert(t.columnMap().isEmpty, "rename back to the file name = identity")
    t.renameColumn("score", "points") // leave mapped for the next phase

    // COW ops run THROUGH the mapping (round 15 parity — previously
    // refused): merge updates in logical space, lands physical files
    t.commitMerge(Seq((1L, 1L, "x")).toDF("id", "points", "name"))
    assert(t.read().where(col("id") === 1L)
      .select("points", "name").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x")))
    assert(t.columnMap() == Map("points" -> "score"),
      "the mapping must survive a merge")
    t.commitUpdateWhere("id", 2, 2, Map("name" -> "'y'"))
    assert(t.read().where(col("id") === 2L).select("name")
      .as[String].collect().toSeq == Seq("y"))
    // predicate DML on the MAPPED column translates to physical stats
    t.commitUpdateWhere("points", 30L, 30L, Map("points" -> "points + 1"))
    assert(t.read().where(col("id") === 3L).select("points")
      .as[Long].collect().toSeq == Seq(31L))
    // compact materializes: files now carry logical names, map resets
    t.compact()
    assert(t.columnMap().isEmpty)
    assert(t.read().columns.toSeq == Seq("id", "points", "name"))
    assert(t.read().count() == 119)
    t.commitMerge(Seq((1L, 77L, "m1")).toDF("id", "points", "name"))
    assert(t.read().where(col("points") === 77L).count() == 1)
  }

  test("drop: metadata-only, physical name retired, compact clears") {
    val root = java.nio.file.Files.createTempDirectory("graft_cmd").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 50L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "score", "name"))
    val files1 = parquetCount(root)
    t.dropColumn("score")                                    // v2, metadata
    assert(parquetCount(root) == files1, "drop must move NO data")
    assert(t.read().columns.toSeq == Seq("id", "name"))
    assert(t.read(1).columns.toSeq == Seq("id", "score", "name"))
    // appends no longer carry the column; re-adding the retired name is
    // refused (old files' bytes would resurface under the new column)
    t.commitAppend(Seq((51L, "u51")).toDF("id", "name"))
    assert(t.read().count() == 51)
    intercept[IllegalArgumentException](
      t.commitAppend(Seq((52L, "u52", 1L)).toDF("id", "name", "score")))
    // compact rewrites without the column; the retirement clears
    t.compact()
    t.commitAppend(Seq((52L, "u52", 1L)).toDF("id", "name", "score"))
    assert(t.read().where(col("score").isNotNull).count() == 1)
  }

  test("rename parity: partition sources and CHECK-referenced columns " +
      "rename; key/bloom and drops keep their blockers") {
    val root = java.nio.file.Files.createTempDirectory("graft_cmr").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 30L).map(i =>
      (i, Seq("en", "fr")((i % 2).toInt), i * 2, s"v$i"))
      .toDF("id", "lang", "n", "v"), Seq("lang"))
    t.addConstraint("n_pos", "n > 0")
    t.setBloomColumns(Seq("v"))
    // still blocked: the key column, unknown columns, and DROPPING a
    // Bloom-indexed column (its rename is lifted — see the bloom test)
    intercept[IllegalArgumentException](t.renameColumn("id", "id2"))
    intercept[IllegalArgumentException](t.dropColumn("v"))
    intercept[IllegalArgumentException](t.renameColumn("nope", "x"))
    // LIFTED (round 16): a partition-SOURCE column renames — pvals key by
    // the rename-invariant physical name, probes translate
    t.renameColumn("lang", "language")
    val fr = t.readPartitions(Map("language" -> "fr"))
    assert(fr.count() == 15)
    assert(fr.columns.contains("language"))
    assert(fr.inputFiles.length < t.read().inputFiles.length,
      "partition selection must still prune after the source rename")
    // partitioned appends under the NEW logical name land in the same
    // physical layout and co-read with the old era
    t.commitAppend(Seq((31L, "fr", 62L, "x31"))
      .toDF("id", "language", "n", "v"), Seq("language"))
    assert(t.readPartitions(Map("language" -> "fr")).count() == 16)
    // the user-facing partition values translate back to logical names
    assert(t.partitionValues().values.forall(_.keySet == Set("language")))
    // LIFTED (round 16): a CHECK-referenced column renames and the
    // stored predicate SQL rewrites atomically — still ENFORCED
    t.renameColumn("n", "m")
    assert(t.constraints().values.exists(_.contains("m")),
      s"constraint must rewrite, got ${t.constraints()}")
    intercept[Exception](t.commitAppend(
      Seq((32L, "fr", -5L, "bad")).toDF("id", "language", "m", "v"),
      Seq("language")))
    assert(t.read().where(col("m") === 20L).count() == 1)
    // dropping the rewritten-constraint column still refuses; dropping
    // the constraint unblocks
    intercept[IllegalArgumentException](t.dropColumn("m"))
    t.dropConstraint("n_pos")
    // dropping a partition source still refuses (exact recompute needs it)
    intercept[IllegalArgumentException](t.dropColumn("language"))
  }

  test("connector writes + SQL DML work on mapped tables (physical names)") {
    val root = java.nio.file.Files.createTempDirectory("graft_cmw").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 50L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "score", "name"))
    t.renameColumn("score", "points")

    // connector append: logical frame in, PHYSICAL file names out
    (51L to 60L).map(i => (i, i * 10, s"u$i")).toDF("id", "points", "name")
      .write.format("snaplog").mode("append").save(root)
    assert(t.read().count() == 60)
    assert(t.read().where(col("points") === 550L).count() == 1)
    // the new files really carry the physical name
    val newDir = t.read(t.currentVersion()).inputFiles
      .filterNot(t.read(1).inputFiles.toSet).head
    assert(spark.read.parquet(newDir).columns.contains("score"),
      "staged files must carry the physical column name")

    // SQL UPDATE and MERGE ride the row-level COW with physicalized
    // replacement files
    spark.conf.set("spark.sql.catalog.cmw", "graft.sources.SnaplogCatalog")
    spark.sql(s"UPDATE cmw.`$root` SET points = points + 1000 " +
      "WHERE id BETWEEN 5 AND 8")
    assert(t.read().where(col("points") === 1060L).count() == 1)
    assert(t.read().count() == 60)
    spark.sql(s"DELETE FROM cmw.`$root` WHERE id % 10 = 0 AND id <= 30")
    assert(t.read().count() == 57)
    // mapping survived the DML (only touched files were replaced)
    assert(t.columnMap() == Map("points" -> "score"))
    assert(t.read(1).columns.toSeq == Seq("id", "score", "name"))
  }

  test("partitioned writes honor retirement and mapping guards") {
    val root = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 20L).map(i =>
      (i, Seq("en", "fr")((i % 2).toInt), i * 2, s"v$i"))
      .toDF("id", "lang", "score", "v"), Seq("lang"))
    t.dropColumn("score")
    // a partitioned re-append reusing the retired physical name must
    // refuse exactly like the plain append (old bytes would resurface)
    intercept[IllegalArgumentException] {
      t.commitAppend(Seq((21L, "en", 9L, "x"))
        .toDF("id", "lang", "score", "v"), Seq("lang"))
    }
    // renamed non-source columns physicalize through partitioned appends
    t.renameColumn("v", "txt")
    t.commitAppend(Seq((21L, "en", "x")).toDF("id", "lang", "txt"),
      Seq("lang"))
    assert(t.readPartitions(Map("lang" -> "en"))
      .where(col("txt") === "x").count() == 1)
    assert(t.read().count() == 21)
  }

  test("SQL UPDATE may not rewrite a key a pending sidecar masks") {
    val root = java.nio.file.Files.createTempDirectory("graft_cmk").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 30L).map(i => (i, i * 10)).toDF("id", "n"))
    t.commitDelete(Seq(5L).toDF("id"))
    spark.conf.set("spark.sql.catalog.cmk", "graft.sources.SnaplogCatalog")
    // rewriting id 7 -> 5 would make the updated row vanish behind the
    // sidecar (or resurrect the deleted original): refused loudly
    val e = intercept[Exception](spark.sql(
      s"UPDATE cmk.`$root` SET id = 5 WHERE id = 7"))
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("sidecar")), e.toString)
    assert(t.read().where(col("id") === 7L).count() == 1,
      "the refused UPDATE must leave the table untouched")
    // non-colliding key rewrites still work under a sidecar
    spark.sql(s"UPDATE cmk.`$root` SET id = 107 WHERE id = 7")
    assert(t.read().where(col("id") === 107L).count() == 1)
    assert(t.read().where(col("id") === 5L).count() == 0)
  }

  test("connector overwrite of a mapped table resets the mapping") {
    // ADVICE r14: the staged-commit cmap guard must not apply to
    // truncate/overwrite — the replacement files carry LOGICAL names and
    // the commit resets the mapping, so a non-empty live mapping is fine
    val root = java.nio.file.Files.createTempDirectory("graft_cmo").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 40L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "score", "name"))
    t.renameColumn("score", "points")
    assert(t.columnMap().nonEmpty)

    Seq((500L, 7L, "z")).toDF("id", "points", "name")
      .write.format("snaplog").mode("overwrite").save(root)
    assert(t.read().count() == 1)
    assert(t.columnMap().isEmpty, "overwrite materializes the mapping")
    assert(t.read().columns.toSeq == Seq("id", "points", "name"))
    // the replacement files really carry the LOGICAL name
    assert(spark.read.parquet(t.read().inputFiles.head)
      .columns.contains("points"))
    // time travel still reads v1 under its own names
    assert(t.read(1).columns.toSeq == Seq("id", "score", "name"))
    // and the table keeps working: append + read through the connector
    Seq((501L, 8L, "y")).toDF("id", "points", "name")
      .write.format("snaplog").mode("append").save(root)
    assert(spark.read.format("snaplog").load(root).count() == 2)
  }

  test("staged commit refuses when a drop retired a name since planning") {
    // ADVICE r14: dropping an identity-mapped column leaves cmap
    // unchanged (only `retired` grows) — a staged write planned before
    // the drop must refuse, or widen() re-adds the dropped column and
    // old files' bytes silently resurface
    val root = java.nio.file.Files.createTempDirectory("graft_cmr").toString
    val t = SnapshotLog.open(spark, root, "id")
    val preDrop = (1L to 20L).map(i => (i, i * 2, s"v$i"))
      .toDF("id", "score", "name")
    t.commitAppend(preDrop)
    val preDropSchema = t.schemaOf(1).get
    t.dropColumn("score") // identity-mapped: cmap stays empty
    assert(t.columnMap().isEmpty && t.retiredColumns() == Set("score"))

    // stage files the way a connector write planned BEFORE the drop
    // would have (pre-drop schema, empty cmap, empty retired set)
    val dir = s"$root/data/c-${java.util.UUID.randomUUID()}"
    preDrop.write.parquet(dir)
    val files = spark.read.parquet(dir).inputFiles.toSeq
    val e = intercept[Exception] {
      t.commitStaged(dir, files, preDropSchema,
        cmap = Map.empty, retired = Set.empty)
    }
    assert(e.getMessage.contains("changed while a connector write"),
      e.toString)
    // the dropped column must NOT have resurfaced
    assert(t.read().columns.toSeq == Seq("id", "name"))
    // a write planned AFTER the drop (current mapping + retired set)
    // publishes normally
    val dir2 = s"$root/data/c-${java.util.UUID.randomUUID()}"
    Seq((21L, "x")).toDF("id", "name").write.parquet(dir2)
    val files2 = spark.read.parquet(dir2).inputFiles.toSeq
    assert(t.commitStaged(dir2, files2, t.schemaOf(2).get,
      cmap = Map.empty, retired = Set("score")).nonEmpty)
    assert(t.read().count() == 21)
  }

  test("zero-row connector batch never publishes an empty data dir") {
    // ADVICE r14: INSERT ... WHERE false must not commit the empty dir
    // mkdirs'd by the orphan sweep as a live entry
    val root = java.nio.file.Files.createTempDirectory("graft_cm0").toString
    val s1 = spark
    import s1.implicits._
    (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.format("snaplog").option("key", "id").mode("append").save(root)
    val t = SnapshotLog.open(spark, root, "id")
    val dataBefore = t.readEntry(1).data

    (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      .where(org.apache.spark.sql.functions.lit(false))
      .write.format("snaplog").mode("append").save(root)
    val v = t.currentVersion()
    assert(t.readEntry(v).data == dataBefore,
      "a zero-row batch must publish a data-identical entry")
    assert(t.read().count() == 10)
    // the staged dir was swept — data/ holds only the one live commit dir
    val dataDirs = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "data")).count()
    assert(dataDirs == 1, s"empty staged dirs must be swept, got $dataDirs")

    // zero-row OVERWRITE = truncate to empty, also without an empty dir
    (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      .where(org.apache.spark.sql.functions.lit(false))
      .write.format("snaplog").mode("overwrite").save(root)
    assert(t.read().count() == 0)
    assert(t.readEntry(t.currentVersion()).data.isEmpty)
  }

  test("Bloom-indexed columns rename; sidecars keep skipping through " +
      "the mapping and across a compact re-key") {
    val root = java.nio.file.Files.createTempDirectory("graft_cmb").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 40L).map(i => (i, s"u$i"))
      .toDF("id", "v").repartition(4))
    t.setBloomColumns(Seq("v"))
    t.commitAppend((41L to 80L).map(i => (i, s"u$i"))
      .toDF("id", "v").repartition(4)) // sidecar built, keyed physical "v"
    // LIFTED (round 16): the Bloom column renames; probes translate
    t.renameColumn("v", "text")
    assert(t.bloomColumns() == Map("text" -> 10),
      s"config must surface the LOGICAL name, got ${t.bloomColumns()}")
    val probe = t.readWhereEquals("text", "u55")
    assert(probe.count() == 1)
    assert(probe.inputFiles.length < t.read().inputFiles.length,
      "the sidecar must still skip files through the mapping")
    // dropping the renamed Bloom column still refuses
    intercept[IllegalArgumentException](t.dropColumn("text"))
    // appends under the new logical name keep building sidecars (the
    // physical-keyed config matches the physicalized files)
    t.commitAppend((81L to 120L).map(i => (i, s"u$i"))
      .toDF("id", "text").repartition(4))
    val probe2 = t.readWhereEquals("text", "u100")
    assert(probe2.count() == 1)
    assert(probe2.inputFiles.length < t.read().inputFiles.length)
    // compact RESETS the mapping: the config re-keys to the logical
    // (now-physical) name and keeps working
    t.compact()
    assert(t.columnMap().isEmpty)
    assert(t.bloomColumns() == Map("text" -> 10))
    t.commitAppend((121L to 160L).map(i => (i, s"u$i"))
      .toDF("id", "text").repartition(4))
    val probe3 = t.readWhereEquals("text", "u140")
    assert(probe3.count() == 1)
    assert(probe3.inputFiles.length < t.read().inputFiles.length,
      "post-compact sidecars must build under the re-keyed config")
  }

  test("clone of a mapped table keeps the mapping and the retired set") {
    // ADVICE r15: cloneTo previously published v1 with an EMPTY
    // cmap/retired — the clone referenced the source's physical-named
    // files with no mapping (renamed columns read as NULL) and lost the
    // drop-resurrection guard
    val root = java.nio.file.Files.createTempDirectory("graft_cmcl").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_cmcld").toString
    java.nio.file.Files.delete(java.nio.file.Paths.get(dst))
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 30L).map(i => (i, i * 10, s"u$i", i % 7))
      .toDF("id", "score", "name", "junk"))
    t.renameColumn("score", "points")
    t.dropColumn("junk")
    val c = t.cloneTo(dst)

    assert(c.read().columns.toSeq == Seq("id", "points", "name"))
    assert(c.read().where(col("points").isNull).count() == 0,
      "the clone must read renamed columns through the source's mapping")
    assert(c.read().where(col("points") === 150L).count() == 1)
    assert(c.columnMap() == Map("points" -> "score"))
    assert(c.retiredColumns() == Set("junk"))
    // the resurrection guard traveled: re-adding the retired name refuses
    intercept[IllegalArgumentException] {
      c.commitAppend(Seq((31L, 1L, "x", 9L))
        .toDF("id", "points", "name", "junk"))
    }
    // appends to the clone physicalize through the inherited mapping
    c.commitAppend(Seq((31L, 310L, "x")).toDF("id", "points", "name"))
    assert(c.read().where(col("id") === 31L).head()
      .getAs[Long]("points") == 310L)
    assert(t.read().count() == 30, "the source is untouched")
  }

  test("connector reads column-mapped tables; snapcdf drains them") {
    val root = java.nio.file.Files.createTempDirectory("graft_cmc").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 100L).map(i => (i, i * 10, s"u$i"))
      .toDF("id", "score", "name").repartitionByRange(4, col("id")))
    t.renameColumn("score", "points")
    t.commitDelete(Seq(7L).toDF("id"))

    val con = spark.read.format("snaplog").load(root)
    assert(con.columns.toSeq == Seq("id", "points", "name"))
    assert(con.count() == 99)
    assert(con.where(col("points") === 500L).count() == 1)
    // pushed filters on the mapped column still PRUNE files (stats are
    // remapped to logical names at scan build)
    def parts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.size
      }.sum
    assert(parts(con.where(col("points") >= 10 && col("points") <= 100)) <
      parts(con), "mapped-column pushdown must prune files")
    // time travel through the connector sees v1's names
    val v1 = spark.read.format("snaplog").option("version", 1).load(root)
    assert(v1.columns.toSeq == Seq("id", "score", "name"))
    assert(v1.count() == 100)

    // snapcdf streams DRAIN mapped tables (round 15 parity — previously
    // refused): files read under physical names, rows emitted logical;
    // the rename version admits as a no-row metadata commit
    t.commitAppend(Seq((200L, 1L, "x")).toDF("id", "points", "name"))
    val sink = java.nio.file.Files.createTempDirectory("graft_cmc_sink")
      .toString
    // start past the v3 MOR-delete commit (exact-diff ops stay refused);
    // the admitted append's entry CARRIES the sidecar, applied in-reader
    val q = spark.readStream.format("snapcdf")
      .option("startVersion", 3).load(root)
      .writeStream.option("checkpointLocation", s"$sink/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(s"$sink/out")
        ()
      }.start()
    q.awaitTermination()
    val drained = spark.read.parquet(s"$sink/out")
    assert(drained.columns.toSet ==
      Set("id", "points", "name", "_change_type", "cdf_version"))
    assert(drained.count() == 1)
    assert(drained.where(col("points") === 1L && col("id") === 200L)
      .count() == 1,
      "physical column bytes must surface under the LOGICAL name")
    assert(spark.read.format("snaplog").load(root).count() == 100)
  }
}
