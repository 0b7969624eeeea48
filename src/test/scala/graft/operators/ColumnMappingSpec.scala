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

    // refusals: COW ops need materialization first
    intercept[IllegalArgumentException](
      t.commitMerge(Seq((1L, 1L, "x")).toDF("id", "points", "name")))
    intercept[IllegalArgumentException](
      t.commitUpdateWhere("id", 1, 2, Map("name" -> "'y'")))
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

  test("rename/drop refusals: key, partition source, bloom, constraint") {
    val root = java.nio.file.Files.createTempDirectory("graft_cmr").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 30L).map(i =>
      (i, Seq("en", "fr")((i % 2).toInt), i * 2, s"v$i"))
      .toDF("id", "lang", "n", "v"), Seq("lang"))
    t.addConstraint("n_pos", "n > 0")
    t.setBloomColumns(Seq("v"))
    intercept[IllegalArgumentException](t.renameColumn("id", "id2"))
    intercept[IllegalArgumentException](t.renameColumn("lang", "language"))
    intercept[IllegalArgumentException](t.dropColumn("v"))
    intercept[IllegalArgumentException](t.renameColumn("n", "m"))
    intercept[IllegalArgumentException](t.renameColumn("v", "lang"))
    intercept[IllegalArgumentException](t.renameColumn("nope", "x"))
    // dropping the constraint/bloom unblocks
    t.dropConstraint("n_pos")
    t.renameColumn("n", "m")
    assert(t.read().where(col("m") === 20L).count() == 1)
    // partition reads still exact under the mapping (sources identity)
    assert(t.readPartitions(Map("lang" -> "fr")).count() == 15)
    assert(t.readPartitions(Map("lang" -> "fr")).columns.contains("m"))
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

  test("connector reads column-mapped tables; snapcdf refuses loudly") {
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

    // snapcdf streams refuse mapped tables (compact() first)
    val err = intercept[Exception] {
      val q = spark.readStream.format("snapcdf").load(root)
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(err).exists(_.contains("column-mapped")), err.toString)
    // ... and API appends still work
    t.commitAppend(Seq((200L, 1L, "x")).toDF("id", "points", "name"))
    assert(spark.read.format("snaplog").load(root).count() == 100)
  }
}
