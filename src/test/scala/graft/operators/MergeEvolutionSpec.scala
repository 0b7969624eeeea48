package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MERGE schema evolution (round 16 — Delta's `MERGE WITH SCHEMA
  * EVOLUTION`): `commitMerge(autoMerge = true)` widens the table schema
  * like appends do; carried files and survivors null-fill the new
  * columns. */
class MergeEvolutionSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("autoMerge widens add-only; carried rows null-fill; CDC follows") {
    val root = java.nio.file.Files.createTempDirectory("graft_me").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 50L).map(i => (i, i * 10))
      .toDF("id", "n").repartitionByRange(4, col("id")))          // v1
    // default stays strict
    intercept[IllegalArgumentException](
      t.commitMerge(Seq((5L, 1L, "x")).toDF("id", "n", "tag")))
    // evolving merge: updates carry a NEW column
    t.commitMerge(Seq((5L, 500L, "u5"), (51L, 510L, "u51"))
      .toDF("id", "n", "tag"), cdc = true, autoMerge = true)       // v2
    assert(t.schemaOf(2).get.fieldNames.toSeq == Seq("id", "n", "tag"))
    assert(t.schemaOf(2).get("tag").nullable)
    val now = t.read()
    assert(now.count() == 51)
    assert(now.where(col("tag").isNotNull).count() == 2,
      "only upserted rows carry the new column")
    assert(now.where(col("id") === 5L).head().getAs[String]("tag") == "u5")
    // carried (unstabbed) files still read — null tag, values intact
    assert(now.where(col("id") === 40L).head().getAs[Long]("n") == 400L)
    assert(t.readEntry(2).data.size >= 2,
      "evolution must not force a full rewrite — unstabbed files carry")
    // the cdc sidecar serves the exact change rows at the WIDE schema
    val diff = t.changes(1, 2)
    assert(diff.where(col("_change_type") === "insert").count() == 2)
    assert(diff.where(col("_change_type") === "delete").count() == 1)
    // time travel reads v1 at its own narrow schema
    assert(t.read(1).columns.toSeq == Seq("id", "n"))
    // a source MISSING table columns refuses even with autoMerge
    val e = intercept[IllegalArgumentException](
      t.commitMerge(Seq((6L, "y")).toDF("id", "tag"), autoMerge = true))
    assert(e.getMessage.contains("missing table column"))
  }

  test("autoMerge refuses resurrecting a retired physical name") {
    val root = java.nio.file.Files.createTempDirectory("graft_mer").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, i * 2, s"v$i"))
      .toDF("id", "score", "v"))
    t.dropColumn("score") // retires the physical name
    intercept[IllegalArgumentException] {
      t.commitMerge(Seq((1L, "x", 9L)).toDF("id", "v", "score"),
        autoMerge = true)
    }
    // a fresh name evolves fine on the mapped/retired table
    t.commitMerge(Seq((1L, "x", 9L)).toDF("id", "v", "pts"),
      autoMerge = true)
    assert(t.read().where(col("pts") === 9L).count() == 1)
  }

  test("evolving merge under column mapping keeps the map") {
    val root = java.nio.file.Files.createTempDirectory("graft_mem").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 20L).map(i => (i, i * 10)).toDF("id", "score"))
    t.renameColumn("score", "points")
    t.commitMerge(Seq((3L, 999L, 7L)).toDF("id", "points", "w"),
      autoMerge = true)
    assert(t.columnMap() == Map("points" -> "score"))
    val r = t.read()
    assert(r.columns.toSeq == Seq("id", "points", "w"))
    assert(r.where(col("id") === 3L).head().getAs[Long]("points") == 999L)
    assert(r.where(col("w").isNotNull).count() == 1)
    assert(r.count() == 20)
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION evolves through the catalog") {
    // the AUTOMATIC_SCHEMA_EVOLUTION capability routes the statement's
    // add-column changes through alterTable (one atomic metadata commit)
    // before the COW rewrite plans
    val root = java.nio.file.Files.createTempDirectory("graft_mes").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 20L).map(i => (i, i * 10)).toDF("id", "n"))
    spark.conf.set("spark.sql.catalog.mesc", "graft.sources.SnaplogCatalog")
    Seq((5L, 500L, "x"), (21L, 210L, "y")).toDF("id", "n", "tag")
      .createOrReplaceTempView("graft_mes_src")
    spark.sql(s"MERGE WITH SCHEMA EVOLUTION INTO mesc.`$root` t " +
      "USING graft_mes_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    val r = t.read()
    assert(r.columns.contains("tag"))
    assert(r.where(col("id") === 21L).count() == 1)
    assert(r.where(col("tag") === "x").count() == 1)
    assert(r.where(col("tag").isNull).count() == 19,
      "pre-evolution rows null-fill the evolved column")
    assert(r.count() == 21)
    // WITHOUT the keyword the same wider source does NOT evolve — the
    // capability only unlocks the WITH SCHEMA EVOLUTION spelling; a
    // plain MERGE resolves SET */INSERT * by name and ignores the
    // extra source column (Spark's own semantics)
    Seq((6L, 66L, "z", 1L)).toDF("id", "n", "tag", "extra2")
      .createOrReplaceTempView("graft_mes_src2")
    spark.sql(s"MERGE INTO mesc.`$root` t " +
      "USING graft_mes_src2 s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    val r2 = t.read()
    assert(r2.columns.toSeq == Seq("id", "n", "tag"))
    assert(r2.where(col("id") === 6L).head().getAs[Long]("n") == 66L)
    assert(r2.count() == 21)
  }
}
