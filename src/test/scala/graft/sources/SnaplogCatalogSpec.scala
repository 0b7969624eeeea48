package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

class SnaplogCatalogSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("name-addressed catalog: CREATE/INSERT/time-travel/SHOW/DROP") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.whsnap", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.whsnap.warehouse", wh)

    // CREATE TABLE: metadata-only empty v1 under the warehouse root
    spark.sql("CREATE TABLE whsnap.events (user_id BIGINT, n BIGINT) " +
      "USING snaplog TBLPROPERTIES ('key'='user_id')")
    val t = SnapshotLog.open(spark, s"$wh/events", "user_id")
    assert(t.currentVersion() == 1 && t.opOf(1) == "create")
    assert(spark.sql("SELECT * FROM whsnap.events").count() == 0)

    // INSERT INTO by name, twice; VERSION AS OF by name
    spark.sql("INSERT INTO whsnap.events " +
      "SELECT id AS user_id, id * 2 AS n FROM range(1, 51)")
    spark.sql("INSERT INTO whsnap.events " +
      "SELECT id AS user_id, id * 2 AS n FROM range(51, 101)")
    assert(spark.sql("SELECT count(*) FROM whsnap.events").as[Long].head()
      == 100)
    assert(spark.sql(
      "SELECT count(*) FROM whsnap.events VERSION AS OF 2").as[Long].head()
      == 50)

    // SQL DML works on name-addressed tables too
    spark.sql("DELETE FROM whsnap.events WHERE user_id <= 10")
    assert(spark.sql("SELECT count(*) FROM whsnap.events").as[Long].head()
      == 90)

    // CTAS / saveAsTable create-then-append
    spark.sql("CREATE TABLE whsnap.big AS " +
      "SELECT user_id, n FROM whsnap.events WHERE n > 100")
    assert(spark.sql("SELECT count(*) FROM whsnap.big").as[Long].head() ==
      spark.sql("SELECT count(*) FROM whsnap.events WHERE n > 100")
        .as[Long].head())

    // SHOW TABLES lists warehouse tables
    val shown = spark.sql("SHOW TABLES IN whsnap").select("tableName")
      .as[String].collect().toSet
    assert(shown == Set("events", "big"), s"SHOW TABLES: $shown")

    // double CREATE fails loudly; IF NOT EXISTS is quiet
    intercept[Exception](spark.sql(
      "CREATE TABLE whsnap.events (x BIGINT) USING snaplog"))
    spark.sql("CREATE TABLE IF NOT EXISTS whsnap.events (x BIGINT) " +
      "USING snaplog")

    // DROP really deletes the directory (name-addressed only)
    spark.sql("DROP TABLE whsnap.big")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$wh/big")))
    assert(spark.sql("SHOW TABLES IN whsnap").count() == 1)

    // path-addressed tables refuse DROP (external semantics)
    val ext = java.nio.file.Files.createTempDirectory("graft_ext").toString
    SnapshotLog.open(spark, ext, "id")
      .commitAppend(Seq((1L, 2L)).toDF("id", "n"))
    assert(spark.sql(s"SELECT count(*) FROM whsnap.`$ext`").as[Long].head()
      == 1)
    intercept[Exception](spark.sql(s"DROP TABLE whsnap.`$ext`"))
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN: metadata-only SQL DDL") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wha").toString
    spark.conf.set("spark.sql.catalog.altsnap", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.altsnap.warehouse", wh)
    spark.sql("CREATE TABLE altsnap.t (id BIGINT, score BIGINT, v STRING) " +
      "USING snaplog TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO altsnap.t " +
      "SELECT id, id * 10 AS score, concat('v', id) AS v FROM range(1, 51)")
    import scala.jdk.CollectionConverters._
    def parquets() = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    val before = parquets()

    spark.sql("ALTER TABLE altsnap.t RENAME COLUMN score TO points")
    spark.sql("ALTER TABLE altsnap.t ADD COLUMN note STRING")
    spark.sql("ALTER TABLE altsnap.t DROP COLUMN v")
    assert(parquets() == before, "SQL DDL must be metadata-only")

    assert(spark.sql("SELECT * FROM altsnap.t").columns.toSeq ==
      Seq("id", "points", "note"))
    assert(spark.sql(
      "SELECT count(*) FROM altsnap.t WHERE points = 200").as[Long].head()
      == 1)
    assert(spark.sql(
      "SELECT count(*) FROM altsnap.t WHERE note IS NULL").as[Long].head()
      == 50, "pre-add rows read the new column as NULL")
    // time travel reads v2 (the insert) under its own names
    assert(spark.sql("SELECT * FROM altsnap.t VERSION AS OF 2")
      .columns.toSeq == Seq("id", "score", "v"))
    // inserts after the DDL land under the evolved schema
    spark.sql("INSERT INTO altsnap.t VALUES (100, 1, 'kept')")
    assert(spark.sql(
      "SELECT note FROM altsnap.t WHERE id = 100").as[String].head()
      == "kept")
    // refusals surface through SQL: key column, type changes
    intercept[Exception](spark.sql(
      "ALTER TABLE altsnap.t RENAME COLUMN id TO id2"))
    intercept[Exception](spark.sql(
      "ALTER TABLE altsnap.t ALTER COLUMN points TYPE DOUBLE"))
  }

  test("CALL procedures: optimize/compact/vacuum/restore/history via SQL") {
    val wh = java.nio.file.Files.createTempDirectory("graft_whp").toString
    spark.conf.set("spark.sql.catalog.procsnap", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.procsnap.warehouse", wh)
    spark.sql("CREATE TABLE procsnap.t (id BIGINT, n BIGINT) USING snaplog")
    spark.sql("INSERT INTO procsnap.t SELECT id, id * 2 FROM range(1, 2001)")
    spark.sql("INSERT INTO procsnap.t " +
      "SELECT id, id * 2 FROM range(2001, 4001)")
    spark.sql("DELETE FROM procsnap.t WHERE id <= 100")
    val t = graft.operators.SnapshotLog.open(spark, s"$wh/t", "id")

    // OPTIMIZE: clustered rewrite; probes prune afterwards
    val ov = spark.sql(
      "CALL procsnap.optimize(table => 't', num_files => 8)")
      .as[Int].head()
    assert(ov == t.currentVersion() && t.opOf(ov) == "optimize")
    val pr = t.readRange(500, 600)
    assert(pr.inputFiles.length < t.read().inputFiles.length)
    assert(t.read().count() == 3900)

    // history as a result set
    val hist = spark.sql("CALL procsnap.history(table => 't')")
      .select("version", "operation").as[(Int, String)].collect().toMap
    assert(hist(ov) == "optimize" && hist(1) == "create")

    // RESTORE by CALL: back to the pre-delete state
    spark.sql("CALL procsnap.restore(table => 't', version => 3)")
    assert(t.read().count() == 4000)

    // VACUUM by CALL: drops pre-horizon entries, reports counts
    val (vf, ve) = spark.sql(
      s"CALL procsnap.vacuum(table => 't', retain_from => ${t.currentVersion()})")
      .as[(Int, Int)].head()
    assert(ve == t.currentVersion() - 1 && vf > 0, s"($vf, $ve)")
    assert(t.read().count() == 4000)

    // COMPACT by CALL (path-addressed spelling works too)
    spark.sql("DELETE FROM procsnap.t WHERE id <= 50")
    val cv = spark.sql(s"CALL procsnap.compact(table => '$wh/t')")
      .as[Int].head()
    assert(t.opOf(cv) == "compact" && t.read().count() == 3950)

    // SHOW PROCEDURES lists the five verbs
    val shown = spark.sql("SHOW PROCEDURES IN procsnap")
      .collect().map(_.toString).mkString(",")
    for (p <- Seq("optimize", "compact", "vacuum", "restore", "history"))
      assert(shown.contains(p), s"missing $p in $shown")
  }

  test("SQL constraint DDL: ADD/DROP CONSTRAINT map to the log's own set") {
    val wh = java.nio.file.Files.createTempDirectory("graft_whc").toString
    spark.conf.set("spark.sql.catalog.conssnap", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.conssnap.warehouse", wh)
    spark.sql("CREATE TABLE conssnap.t (id BIGINT, n BIGINT) USING snaplog")
    spark.sql("INSERT INTO conssnap.t SELECT id, id * 2 FROM range(1, 101)")
    val t = graft.operators.SnapshotLog.open(spark, s"$wh/t", "id")

    spark.sql("ALTER TABLE conssnap.t ADD CONSTRAINT n_pos CHECK (n >= 0)")
    assert(t.constraints().contains("n_pos"))
    assert(t.opOf(t.currentVersion()) == "add-constraint")

    // violating INSERT refused from SQL text, NO version behind
    val v0 = t.currentVersion()
    intercept[Exception](
      spark.sql("INSERT INTO conssnap.t VALUES (9999, -5)"))
    assert(t.currentVersion() == v0 && t.read().count() == 100,
      "a violating SQL INSERT must commit nothing")

    // duplicate ADD refused; a constraint existing rows violate refused
    intercept[Exception](spark.sql(
      "ALTER TABLE conssnap.t ADD CONSTRAINT n_pos CHECK (n > 1)"))
    intercept[Exception](spark.sql(
      "ALTER TABLE conssnap.t ADD CONSTRAINT n_huge CHECK (n > 100000)"))
    assert(t.constraints().keySet == Set("n_pos"))

    // the table REPORTS its constraints through the DSv2 API
    val reported = spark.sessionState.catalogManager
      .catalog("conssnap")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "t"))
      .constraints()
    assert(reported.length == 1 && reported.head.name() == "n_pos")

    // DROP CONSTRAINT re-admits; IF EXISTS of a missing name is a no-op;
    // a plain drop of a missing name throws
    spark.sql("ALTER TABLE conssnap.t DROP CONSTRAINT n_pos")
    assert(t.constraints().isEmpty)
    spark.sql("INSERT INTO conssnap.t VALUES (9999, -5)")
    assert(t.read().where(col("n") < 0).count() == 1)
    spark.sql("ALTER TABLE conssnap.t DROP CONSTRAINT IF EXISTS nope")
    intercept[Exception](spark.sql(
      "ALTER TABLE conssnap.t DROP CONSTRAINT nope"))
  }

  test("CALL vacuum by retention duration: newest never deleted") {
    val wh = java.nio.file.Files.createTempDirectory("graft_whv").toString
    spark.conf.set("spark.sql.catalog.vacsnap", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.vacsnap.warehouse", wh)
    spark.sql("CREATE TABLE vacsnap.t (id BIGINT, n BIGINT) USING snaplog")
    spark.sql("INSERT INTO vacsnap.t SELECT id, id FROM range(1, 101)")
    spark.sql("INSERT INTO vacsnap.t SELECT id, id FROM range(101, 201)")
    val t = graft.operators.SnapshotLog.open(spark, s"$wh/t", "id")
    assert(t.currentVersion() == 3)
    // backdate v1/v2's LOGGED commit times ten days; v3 stays fresh
    for (v <- 1 to 2)
      t.backdateTs(v, System.currentTimeMillis() - 10L * 24 * 3600 * 1000)

    // a huge window retains everything
    val (f0, e0) = spark.sql(
      "CALL vacsnap.vacuum(table => 't', retain_hours => 1000.0)")
      .as[(Int, Int)].head()
    assert(f0 == 0 && e0 == 0, s"($f0, $e0)")

    // DRY RUN reports what the 24 h sweep WOULD remove and touches
    // nothing — versions below the horizon stay time-travelable
    val (df1, de1) = spark.sql("CALL vacsnap.vacuum(table => 't', " +
      "retain_hours => 24.0, dry_run => true)").as[(Int, Int)].head()
    assert(de1 == 2 && df1 >= 0, s"($df1, $de1)")
    assert(t.read(1).count() == 0 && t.read(2).count() == 100,
      "dry run must not vacuum anything")

    // RETAIN 24 HOURS drops the two backdated versions, keeps the head
    val (_, e1) = spark.sql(
      "CALL vacsnap.vacuum(table => 't', retain_hours => 24.0)")
      .as[(Int, Int)].head()
    assert(e1 == 2, s"entries removed: $e1")
    assert(t.read().count() == 200, "the newest version must survive")
    intercept[Exception](t.read(1)) // below the horizon

    // RETAIN 0 HOURS degenerates to keep-head-only — never an empty table
    spark.sql("INSERT INTO vacsnap.t SELECT id, id FROM range(201, 211)")
    t.vacuumRetainHours(0.0)
    assert(t.read().count() == 210, "head must always survive RETAIN 0")

    // exactly one spelling required
    intercept[Exception](spark.sql("CALL vacsnap.vacuum(table => 't')"))
    intercept[Exception](spark.sql(
      "CALL vacsnap.vacuum(table => 't', retain_from => 1, " +
        "retain_hours => 1.0)"))
  }

  test("CALL detail + readStream.table: catalog-native ops and streaming") {
    val wh = java.nio.file.Files.createTempDirectory("graft_whd").toString
    spark.conf.set("spark.sql.catalog.dsnap", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.dsnap.warehouse", wh)
    spark.sql("CREATE TABLE dsnap.t (id BIGINT, n BIGINT) USING snaplog")
    spark.sql("INSERT INTO dsnap.t SELECT id, id * 2 FROM range(1, 101)")
    spark.sql("INSERT INTO dsnap.t SELECT id, id * 2 FROM range(101, 151)")
    val t = graft.operators.SnapshotLog.open(spark, s"$wh/t", "id")
    t.addConstraint("pos", "n >= 0")

    // DESCRIBE DETAIL: one metadata row, totals from the logged stats
    val d = spark.sql("CALL dsnap.detail(table => 't')").collect().head
    assert(d.getInt(0) == t.currentVersion())
    assert(d.getString(1) == "add-constraint")
    assert(d.getString(2) == "id")
    assert(d.getLong(5) == 150L, s"num_rows ${d.getLong(5)}")
    assert(d.getLong(6) > 0L)
    assert(d.getInt(9) == 1) // constraints
    assert(d.getLong(12) == t.commitTimeOf(t.currentVersion()))

    // streaming read by catalog NAME — MICRO_BATCH_READ through the
    // catalog-resolved table, same machinery as format("snaplog")
    val sink = s"$wh/_sink"
    val q = spark.readStream.table("dsnap.t")
      .writeStream.option("checkpointLocation", s"$wh/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(sink)
        ()
      }.start()
    q.awaitTermination()
    assert(spark.read.parquet(sink).count() == 150)
  }

  test("CALL clone + SQL MERGE NOT MATCHED BY SOURCE complete the verbs") {
    val wh = java.nio.file.Files.createTempDirectory("graft_whm").toString
    spark.conf.set("spark.sql.catalog.msnap", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.msnap.warehouse", wh)
    spark.sql("CREATE TABLE msnap.t (id BIGINT, n BIGINT) USING snaplog")
    spark.sql("INSERT INTO msnap.t SELECT id, id FROM range(1, 11)")

    // SHALLOW CLONE by CALL: metadata-only copy under the warehouse
    spark.sql("CALL msnap.clone(table => 't', dest => 't2')")
    assert(spark.sql("SELECT count(*) FROM msnap.t2").as[Long].head() == 10)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(wh, "t2", "data")),
      "clone must copy METADATA only")
    // divergence is independent
    spark.sql("INSERT INTO msnap.t2 SELECT id, id FROM range(11, 16)")
    assert(spark.sql("SELECT count(*) FROM msnap.t").as[Long].head() == 10)

    // full 3-branch SQL MERGE: MATCHED / NOT MATCHED / NOT MATCHED BY
    // SOURCE (the Delta upsert-with-retire shape) through the row-level
    // COW route
    spark.sql("SELECT id, id * 100 AS n FROM range(8, 13)")
      .createOrReplaceTempView("graft_mbs_src")
    spark.sql("MERGE INTO msnap.t t USING graft_mbs_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET n = s.n " +
      "WHEN NOT MATCHED THEN INSERT (id, n) VALUES (s.id, s.n) " +
      "WHEN NOT MATCHED BY SOURCE AND t.id <= 2 THEN DELETE")
    val out = spark.sql("SELECT id, n FROM msnap.t ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(out == ((3L to 7L).map(i => (i, i)) ++
      (8L to 12L).map(i => (i, i * 100))), out.toString)
  }

  test("multi-change ALTER is atomic; torn CREATEs are droppable") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wht").toString
    spark.conf.set("spark.sql.catalog.tornsnap", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.tornsnap.warehouse", wh)
    spark.sql("CREATE TABLE tornsnap.t (id BIGINT, n BIGINT) USING snaplog")
    spark.sql("INSERT INTO tornsnap.t SELECT id, id FROM range(1, 4)")
    val t = graft.operators.SnapshotLog.open(spark, s"$wh/t", "id")
    val v0 = t.currentVersion()
    // second change collides with an existing column → the WHOLE
    // statement publishes nothing (one atomic commit per statement)
    intercept[Exception](spark.sql(
      "ALTER TABLE tornsnap.t ADD COLUMNS (ok BIGINT, id BIGINT)"))
    assert(t.currentVersion() == v0, "failed ALTER must commit nothing")
    assert(!t.read().columns.contains("ok"))
    // a multi-change statement lands as ONE commit
    spark.sql("ALTER TABLE tornsnap.t ADD COLUMNS (a BIGINT, b STRING)")
    assert(t.currentVersion() == v0 + 1 &&
      t.opOf(v0 + 1) == "alter-table")
    assert(t.read().columns.toSeq == Seq("id", "n", "a", "b"))

    // torn CREATE: a warehouse dir with an empty _log is not listed and
    // IS droppable (otherwise the phantom could never be cleaned up)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$wh/phantom/_log"))
    val shown = spark.sql("SHOW TABLES IN tornsnap").select("tableName")
      .as[String].collect().toSet
    assert(shown == Set("t"), s"torn create must not be listed: $shown")
    // SQL DROP can't address a phantom (analysis resolves the table
    // first), so cleanup goes through the catalog API
    val cat = spark.sessionState.catalogManager.catalog("tornsnap")
      .asInstanceOf[graft.sources.SnaplogCatalog]
    assert(cat.dropTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "phantom")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$wh/phantom")))
  }

  test("created-empty tables read/append/evolve like any other") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    val t = SnapshotLog.open(spark, s"$wh/t", "id")
    t.createEmpty(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))))
    assert(t.read().isEmpty && t.read().columns.toSeq == Seq("id", "v"))
    assert(t.readRange(1, 10).isEmpty)
    // the key rides the entry; appends widen from the created schema
    t.commitAppend(Seq((1L, "a", 9L)).toDF("id", "v", "extra"))
    assert(t.read().columns.toSeq == Seq("id", "v", "extra"))
    assert(t.read(1).columns.toSeq == Seq("id", "v"))
    // a second create on a non-empty table refuses
    intercept[IllegalArgumentException](t.createEmpty(t.read().schema))
  }
}
