package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ALTER COLUMN TYPE widening (round 16 — Delta's type widening):
  * metadata-only re-type along the lossless lattice, old files upcast
  * at read on BOTH read paths (spark.read.schema and the DSv2
  * connector's materializer). */
class TypeWideningSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def parquets(root: String): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala.count(_.toString.endsWith(".parquet")).toLong
  }

  test("int->long widen: metadata-only, both eras aggregate, appends wide") {
    val root = java.nio.file.Files.createTempDirectory("graft_tw").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 40L).map(i => (i, i.toInt, i.toFloat / 2))
      .toDF("id", "n", "x"))                                   // v1: INT/FLOAT
    val before = parquets(root)
    t.alterColumnType("n", LongType)                           // v2
    t.alterColumnType("x", DoubleType)                         // v3
    assert(parquets(root) == before, "widening must move NO data")
    assert(t.opOf(2) == "widen-column")
    assert(t.schemaOf(3).get("n").dataType == LongType)
    assert(t.schemaOf(3).get("x").dataType == DoubleType)
    // time travel reads v1 under its own narrow types
    assert(t.read(1).schema("n").dataType == IntegerType)
    // appends land at the WIDE type; both eras aggregate exactly
    t.commitAppend(Seq((41L, 5000000000L, 1.25)).toDF("id", "n", "x")) // v4
    val agg = t.read().agg(sum(col("n")).as("s"), count(lit(1)).as("c"))
      .head()
    assert(agg.getAs[Long]("c") == 41L)
    assert(agg.getAs[Long]("s") == (1L to 40L).sum + 5000000000L)
    assert(t.read().where(col("x") === 1.25d).count() == 1)
    // a narrow-typed append now refuses (appends match the logged type)
    intercept[IllegalArgumentException](
      t.commitAppend(Seq((42L, 7, 0.5)).toDF("id", "n", "x")))
  }

  test("refusals: narrowing, unknown, key column, double on bloom source") {
    val root = java.nio.file.Files.createTempDirectory("graft_twr").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, i.toInt, s"v$i"))
      .toDF("id", "n", "v"))
    intercept[IllegalArgumentException](t.alterColumnType("id", IntegerType))
    intercept[IllegalArgumentException](t.alterColumnType("n", IntegerType))
    intercept[IllegalArgumentException](t.alterColumnType("v", LongType))
    intercept[IllegalArgumentException](t.alterColumnType("nope", LongType))
    // key column refuses even for a legal widening shape
    intercept[IllegalArgumentException](t.alterColumnType("id", DoubleType))
    t.setBloomColumns(Seq("n"))
    intercept[IllegalArgumentException](t.alterColumnType("n", DoubleType))
    t.alterColumnType("n", LongType) // integral→integral stays fine
    assert(t.read().where(col("n") === 5L).count() == 1)
  }

  test("partition-source widens integral->integral; derived values hold") {
    val root = java.nio.file.Files.createTempDirectory("graft_twp").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 30L).map(i => (i, (i % 100).toInt, s"v$i"))
      .toDF("id", "band", "v"), Seq("truncate(10, band)"))
    intercept[IllegalArgumentException](
      t.alterColumnType("band", DoubleType))
    t.alterColumnType("band", LongType)
    t.commitAppend(Seq((31L, 7L, "x")).toDF("id", "band", "v"),
      Seq("truncate(10, band)"))
    val p = t.readPartitions(Map("truncate(10, band)" -> "0"))
    assert(p.where(col("id") === 31L).count() == 1)
    assert(p.where(col("band") === 5L).count() == 1, "old era in partition")
  }

  test("connector + SQL DDL: ALTER COLUMN TYPE, reads upcast per slot") {
    val root = java.nio.file.Files.createTempDirectory("graft_tws").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 25L).map(i => (i, i.toInt, i.toFloat))
      .toDF("id", "n", "x"))
    spark.conf.set("spark.sql.catalog.twc", "graft.sources.SnaplogCatalog")
    spark.sql(s"ALTER TABLE twc.`$root` ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"ALTER TABLE twc.`$root` ALTER COLUMN x TYPE DOUBLE")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE twc.`$root` ALTER COLUMN n TYPE INT"))
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    // Spark's analyzer pre-refuses narrowings via Cast.canUpCast
    // (NOT_SUPPORTED_CHANGE_COLUMN) before the catalog; either layer's
    // refusal is fine as long as it is loud
    assert(msgs(e).exists(m => m.contains("LOSSLESS") ||
      m.contains("NOT_SUPPORTED_CHANGE_COLUMN")), e.toString)
    // the DSv2 reader decodes INT32 pages into the widened LONG slots
    val con = spark.read.format("snaplog").load(root)
    assert(con.schema("n").dataType == LongType)
    assert(con.schema("x").dataType == DoubleType)
    assert(con.agg(sum("n")).head().getLong(0) == (1L to 25L).sum)
    assert(con.where(col("x") === 5.0d).count() == 1)
    // pushed filters on the widened column still prune + return exactly
    assert(con.where(col("n") >= 10L && col("n") <= 12L).count() == 3)
    // SQL DML runs at the wide type over narrow files
    spark.sql(s"UPDATE twc.`$root` SET n = n + 1000000000000 WHERE id = 3")
    assert(t.read().where(col("n") === 1000000000003L).count() == 1)
  }

  test("widen under column mapping; merge and delete follow") {
    val root = java.nio.file.Files.createTempDirectory("graft_twm").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 20L).map(i => (i, i.toInt)).toDF("id", "score"))
    t.renameColumn("score", "points")           // cmap points->score
    t.alterColumnType("points", LongType)       // widen the MAPPED column
    assert(t.columnMap() == Map("points" -> "score"))
    assert(t.read().where(col("points") === 7L).count() == 1)
    t.commitMerge(Seq((5L, 9999999999L), (21L, 1L)).toDF("id", "points"))
    assert(t.read().where(col("points") === 9999999999L).count() == 1)
    assert(t.read().count() == 21)
    t.commitDeleteWhere("id", 10, 12)
    assert(t.read().count() == 18)
    assert(t.read(1).schema("score").dataType == IntegerType)
  }

  test("streams: widen in backfill admits; widen mid-stream fails loudly") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_twst").toString
    val work = java.nio.file.Files.createTempDirectory("graft_twsw").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, i.toInt)).toDF("id", "n")) // v1
    t.alterColumnType("n", LongType)                                   // v2
    t.commitAppend(Seq((11L, 5000000000L)).toDF("id", "n"))            // v3

    // a widen BEFORE the stream started: backfill admits, narrow files
    // upcast into the wide frozen schema
    val q = spark.readStream.format("snapcdf").load(root)
      .writeStream.option("checkpointLocation", s"$work/c1")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(s"$work/out")
        ()
      }.start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$work/out")
    assert(out.count() == 11)
    assert(out.agg(sum("n")).head().getLong(0) == (1L to 10L).sum + 5000000000L)

    // a widen AFTER the stream froze: loud refusal naming the column
    val t2root = java.nio.file.Files.createTempDirectory("graft_twst2")
      .toString
    val t2 = SnapshotLog.open(spark, t2root, "id")
    t2.commitAppend((1L to 5L).map(i => (i, i.toFloat)).toDF("id", "f"))
    val q2 = spark.readStream.format("snaplog").load(t2root)
      .writeStream.option("checkpointLocation", s"$work/c2")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    try {
      q2.processAllAvailable()
      t2.alterColumnType("f", DoubleType)
      t2.commitAppend(Seq((6L, 0.5d)).toDF("id", "f"))
      val err = intercept[Exception](q2.processAllAvailable())
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Nil
        else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(err).exists(_.contains("restart the stream")),
        err.toString)
    } finally q2.stop()
  }
}
