package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class SnaplogSourceSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def scanParts(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.size
    }.sum

  private def snap(root: String, version: Int = -1): DataFrame = {
    val r = spark.read.format("snaplog")
    (if (version > 0) r.option("version", version) else r).load(root)
  }

  test("snaplog DSv2: versioned reads ≡ SnapshotTable.read, MOR deletes inline") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 100L).map(i => (i, s"a$i", i * 2.0)).toDF("id", "v", "w")
      .repartitionByRange(4, col("id")))
    t.commitAppend((101L to 150L).map(i => (i, s"b$i", i * 2.0)).toDF("id", "v", "w"))
    t.commitDelete(Seq(7L, 40L, 120L).toDF("id"))

    for (v <- 1 to 3) {
      val api = t.read(v).as[(Long, String, Double)].collect().toSet
      val dsv2 = snap(root, v).as[(Long, String, Double)].collect().toSet
      assert(dsv2 === api, s"version $v mismatch")
    }
    // Delta-spelling reader options: versionAsOf + timestampAsOf
    assert(spark.read.format("snaplog").option("versionAsOf", 1)
      .load(root).count() === 100)
    val e1 = java.nio.file.Paths.get(root, "_log", "1.json")
    java.nio.file.Files.setLastModifiedTime(e1,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(e1).toMillis - 3600000L))
    val cutMs = java.nio.file.Files.getLastModifiedTime(e1).toMillis + 1000L
    assert(spark.read.format("snaplog").option("timestampAsOf", cutMs)
      .load(root).count() === 100)
    intercept[Exception](spark.read.format("snaplog")
      .option("version", 1).option("timestampAsOf", cutMs).load(root))

    // default = latest; deletes applied INSIDE the readers, no join node
    val live = snap(root)
    assert(live.count() === 147)
    val plan = live.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"MOR deletes must not plan a join:\n$plan")
    assert(live.where(col("id") === 7L).count() === 0)
    // version bounds fail loudly
    intercept[Exception](snap(root, 99).collect())
  }

  test("snaplog DSv2: pushed filters prune input partitions from the log stats") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2p").toString
    val t = SnapshotLog.open(spark, root, "id")
    val langs = Seq("ar", "de", "en", "fr")
    t.commitAppend(spark.range(0, 4000)
      .select(col("id"), (col("id") * 3).as("ts"),
        element_at(lit(langs.toArray), (col("id") % 4 + 1).cast("int")).as("lang"),
        when(col("id") >= 2000, concat(lit("t"), col("id"))).as("tag"))
      .repartitionByRange(8, col("id"))) // id-clustered: ts rides it; lang does not
    val total = scanParts(snap(root))
    assert(total === 8)

    // key range prunes
    val keyProbe = snap(root).where(col("id") >= 100 && col("id") <= 300)
    assert(scanParts(keyProbe) < total, "key filter must prune partitions")
    assert(keyProbe.count() === 201)
    // non-key integral range prunes
    val tsProbe = snap(root).where(col("ts") === 3000L)
    assert(scanParts(tsProbe) === 1, s"got ${scanParts(tsProbe)}")
    assert(tsProbe.count() === 1)
    // IS NULL / IS NOT NULL prune via logged null counts (range
    // partitioning SAMPLES boundaries, so the id=2000 null boundary may
    // straddle one file — 4 or 5 of 8 scanned, never all)
    val nn = snap(root).where(col("tag").isNotNull)
    assert(scanParts(nn) <= 5, s"got ${scanParts(nn)}")
    assert(nn.count() === 2000)
    val nl = snap(root).where(col("tag").isNull)
    assert(scanParts(nl) <= 5, s"got ${scanParts(nl)}")
    assert(nl.count() === 2000)
    // IN-list prunes to the stabbed files
    val inProbe = snap(root).where(col("id").isin(5L, 3995L))
    assert(scanParts(inProbe) === 2, s"got ${scanParts(inProbe)}")
    assert(inProbe.count() === 2)
    // an unprunable filter (lang spans every file) still answers exactly
    val lp = snap(root).where(col("lang") === "en")
    assert(lp.count() === 1000)

    // string stats prune on a lang-clustered layout
    val root2 = java.nio.file.Files.createTempDirectory("graft_dsv2s").toString
    val t2 = SnapshotLog.open(spark, root2, "id")
    t2.commitAppend(spark.range(0, 4000)
      .select(col("id"),
        element_at(lit(langs.toArray), (col("id") % 4 + 1).cast("int")).as("lang"))
      .repartitionByRange(8, col("lang"), col("id")))
    val sp = snap(root2).where(col("lang") === "en")
    assert(scanParts(sp) < 8, s"string stats must prune: ${scanParts(sp)}/8")
    assert(sp.count() === 1000)
    // LIKE 'prefix%' prunes via the same bounds (StringStartsWith)
    val pre = snap(root2).where(col("lang").startsWith("e"))
    assert(scanParts(pre) < 8, s"prefix filter must prune: ${scanParts(pre)}/8")
    assert(pre.count() === 1000)
  }

  test("snaplog DSv2: column pruning reaches the parquet readers") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2c").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 50L).map(i => (i, s"v$i", s"body-$i" * 10))
      .toDF("id", "v", "body"))
    val pruned = snap(root).select(col("id"))
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("id"),
      scans.head.scan.readSchema().toString)
    assert(pruned.as[Long].collect().sorted.toSeq === (1L to 50L))
    // with deletes, the key is decoded for the probe but NOT emitted
    t.commitDelete(Seq(3L).toDF("id"))
    val vOnly = snap(root).select(col("v"))
    assert(vOnly.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head.scan.readSchema().fieldNames.toSeq === Seq("v"))
    assert(vOnly.as[String].collect().toSet ===
      (1L to 50L).filterNot(_ == 3L).map(i => s"v$i").toSet)
    // count(*) over a delete-bearing table stays exact (empty projection
    // still probes the key)
    assert(snap(root).count() === 49)
  }

  test("snaplog DSv2: logged-schema evolution and per-version schemas") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2e").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 5L).map(i => (i, s"a$i")).toDF("id", "v"))
    t.commitAppend((6L to 8L).map(i => (i, s"b$i", i * 10.0))
      .toDF("id", "v", "score"))
    // latest reads under the evolved schema; old files null-fill score
    val live = snap(root)
    assert(live.columns.toSeq === Seq("id", "v", "score"))
    assert(live.where(col("score").isNull).count() === 5)
    assert(live.where(col("score").isNotNull).count() === 3)
    // time travel reads v1 under ITS schema — no phantom column
    assert(snap(root, 1).columns.toSeq === Seq("id", "v"))
    assert(snap(root, 1).count() === 5)
    // a projection of ONLY the evolved column over pre-evolution files
    // (empty file projection) still yields the right row count
    assert(snap(root).select(col("score")).where(col("score").isNull)
      .count() === 5)
  }

  test("snaplog DSv2: composes with SQL text and broadcast joins") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2q").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("g"))
      .repartitionByRange(4, col("id")))
    snap(root).createOrReplaceTempView("snap_sql_view")
    val joined = spark.sql(
      """SELECT d.name, count(*) AS n, sum(s.id) AS sum_ids
         FROM snap_sql_view s
         JOIN (SELECT 1 AS g, 'one' AS name) d ON s.g = d.g
         WHERE s.id < 500
         GROUP BY d.name""")
    val r = joined.collect()
    val expect = (0L until 500L).filter(_ % 7 == 1)
    assert(r.length === 1 && r.head.getLong(1) === expect.size.toLong &&
      r.head.getLong(2) === expect.sum)
    // the SQL-text WHERE pushed through to partition pruning
    assert(scanParts(spark.sql(
      "SELECT * FROM snap_sql_view WHERE id < 100")) < 4)
  }

  test("snaplog DSv2: logged sizes/rows feed planner statistics post-pruning") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2st").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(spark.range(0, 10000)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(4, col("id")))
    // unpruned: size = exact sum of the part files, rows = exact count
    val full = snap(root)
    val fullStats = full.queryExecution.optimizedPlan.stats
    val diskBytes = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data"))
      try s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .filter { p =>
          val n = p.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        }
        .map(java.nio.file.Files.size).sum
      finally s.close()
    }
    assert(fullStats.sizeInBytes === BigInt(diskBytes),
      s"${fullStats.sizeInBytes} vs disk $diskBytes")
    assert(fullStats.rowCount.contains(BigInt(10000)), fullStats.toString)
    // pruned: statistics shrink WITH the kept file set — the planner
    // sees a band probe as broadcast-sized even on a huge table
    val band = snap(root).where(col("id") >= 0 && col("id") < 100)
    val bandStats = band.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats
    }.head
    assert(bandStats.sizeInBytes < fullStats.sizeInBytes / 2,
      s"pruned ${bandStats.sizeInBytes} vs full ${fullStats.sizeInBytes}")
    // a delete sidecar makes exact row counts unknowable (reader-side
    // filtering) — rows go empty, size stays
    t.commitDelete(Seq(1L).toDF("id"))
    val afterDel = snap(root).queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats
    }.head
    assert(afterDel.rowCount.isEmpty)
    // and the small pruned side broadcasts in a join without hints
    val big = spark.range(0, 2000000).toDF("id")
    val joined = big.join(band.select(col("id"), col("v")), "id")
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin"),
      s"pruned snaplog side must broadcast:\n$planStr")
    assert(joined.count() === 100)
  }

  test("snaplog DSv2: runtime (dynamic) file pruning from a broadcast join") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2r").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(spark.range(0, 64000)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(64, col("id")))
    // the dim's keys exist only at EXECUTION time (selective filter on a
    // broadcast side) — the scan must re-prune its file list when the
    // join's runtime In-filter arrives, Delta's dynamic file pruning
    val dim = spark.range(0, 64000, 1000).toDF("id")
      .where(col("id") < 2000) // keys 0 and 1000: stab ≤2 of 64 files
    val joined = snap(root).join(broadcast(dim), "id")
    val rows = joined.collect()
    assert(rows.length === 2, rows.mkString(","))
    // AQE wraps materialized stages in QueryStageExec leaves — descend
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[SnaplogScan] =
      (p match {
        case b: BatchScanExec => b.scan match {
          case s: SnaplogScan => Seq(s); case _ => Nil
        }
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
        case _ => Nil
      }) ++ p.children.flatMap(scansOf)
    val scans = scansOf(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, "snaplog scan missing from the executed plan")
    assert(scans.exists(_.runtimeApplied),
      "the broadcast join's runtime filter never reached the scan")
  }

  test("snaplog DSv2: write path commits through the log (append/overwrite)") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2w").toString
    // first commit to a fresh table: key comes from the writer option
    spark.range(0, 1000)
      .select(col("id"), concat(lit("a"), col("id")).as("v"))
      .repartitionByRange(4, col("id"))
      .write.format("snaplog").option("key", "id").mode("append").save(root)
    val t = SnapshotLog.open(spark, root, "id")
    assert(t.currentVersion() === 1)
    assert(t.read().count() === 1000)
    // the connector write went through commitAppend: stats logged, key
    // recorded — a later append needs NO option, and pruning works
    spark.range(1000, 1500)
      .select(col("id"), concat(lit("b"), col("id")).as("v"))
      .write.format("snaplog").mode("append").save(root)
    assert(t.currentVersion() === 2)
    assert(t.read().count() === 1500)
    val probe = t.readRange(0, 200)
    assert(probe.inputFiles.length < t.read().inputFiles.length,
      "connector-written commits must carry pruning stats")
    // round-trip: read back through the connector, deletes included
    t.commitDelete(Seq(5L).toDF("id"))
    assert(snap(root).count() === 1499)
    // overwrite REPLACES (truncate semantics)
    spark.range(0, 10)
      .select(col("id"), lit("x").as("v"))
      .write.format("snaplog").mode("overwrite").save(root)
    assert(t.currentVersion() === 4)
    assert(snap(root).count() === 10)
    assert(t.read(2).count() === 1500, "history must survive the overwrite")
    // a fresh table without option(\"key\") fails loudly
    val root2 = java.nio.file.Files.createTempDirectory("graft_dsv2w2").toString
    val e = intercept[Exception] {
      spark.range(0, 5).toDF("id")
        .write.format("snaplog").mode("append").save(root2)
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("key")), e.toString)
  }

  test("snaplog catalog: SQL-native VERSION/TIMESTAMP AS OF and INSERT INTO") {
    spark.conf.set("spark.sql.catalog.snap", classOf[SnaplogCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    // push the first entry's LOGGED commit time into the past so
    // TIMESTAMP AS OF distinguishes the versions deterministically
    val past = System.currentTimeMillis() - 3600000L
    t.backdateTs(1, past)
    val cut = new java.sql.Timestamp(past + 1000L)
    t.commitAppend((11L to 15L).map(i => (i, s"b$i")).toDF("id", "v"))

    def q(sql: String): Long = spark.sql(sql).collect().head.getLong(0)
    assert(q(s"SELECT count(*) FROM snap.`$root`") === 15)
    assert(q(s"SELECT count(*) FROM snap.`$root` VERSION AS OF 1") === 10)
    assert(q(s"SELECT count(*) FROM snap.`$root` TIMESTAMP AS OF '$cut'") === 10)
    // predicates in SQL text still prune files at plan time
    assert(q(s"SELECT count(*) FROM snap.`$root` WHERE id <= 3") === 3)
    // INSERT INTO rides the table's write path (commitAppend)
    spark.sql(s"INSERT INTO snap.`$root` SELECT id, 'x' AS v FROM range(100, 103)")
    assert(t.currentVersion() === 3)
    assert(q(s"SELECT count(*) FROM snap.`$root`") === 18)
    assert(t.read().where(col("v") === "x").count() === 3)
    // MOR deletes apply through the catalog read too
    t.commitDelete(Seq(1L).toDF("id"))
    assert(q(s"SELECT count(*) FROM snap.`$root`") === 17)
    // DDL verbs fail loudly
    intercept[Exception](spark.sql(s"DROP TABLE snap.`$root`"))
    // a missing table is NoSuchTable, not a crash
    intercept[Exception](
      spark.sql(s"SELECT * FROM snap.`$root-none`").collect())
  }

  test("snaplog DSv2: pushed point predicates probe the Bloom sidecars") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2bl").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(Seq((0L, "seed")).toDF("id", "url"))
    t.setBloomColumns(Seq("url"))
    // fragmented high-cardinality ingest: string bounds span every file,
    // so only the Bloom sidecar can exclude files for a point probe
    t.commitAppend((1L to 8000L).map(i => (i, s"u$i")).toDF("id", "url")
      .repartition(8))
    val all = scanParts(snap(root))
    val eq = snap(root).where(col("url") === "u5000")
    assert(scanParts(eq) < all,
      s"bloom pruned nothing through the connector (${scanParts(eq)}/$all)")
    assert(eq.count() === 1L)
    val in = snap(root).where(col("url").isin("u5000", "u17"))
    assert(scanParts(in) < all && in.count() === 2L)
    val miss = snap(root).where(col("url") === "absent")
    assert(scanParts(miss) < all && miss.count() === 0L)
    // pre-config files (the seed commit) are never bloom-excluded
    assert(snap(root).where(col("url") === "seed").count() === 1L)
  }

  test("snaplog DSv2: pushed EqualTo maps through bucket partitioning") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2tb").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 4000L).map(i => (i, s"u$i")).toDF("id", "v"),
      Seq("bucket(8, id)"))
    val all = scanParts(snap(root))
    val probe = snap(root).where(col("id") === 1234L)
    assert(scanParts(probe) < all,
      s"bucket transform pruned nothing (${scanParts(probe)}/$all)")
    assert(probe.count() === 1L)
    // IN probes keep the union of admissible buckets
    val in = snap(root).where(col("id").isin(1234L, 77L))
    assert(scanParts(in) < all && in.count() === 2L)
  }

  test("snaplog DSv2: footer stats prune ROW GROUPS inside kept files") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2rg").toString
    val t = SnapshotLog.open(spark, root, "id")
    // small parquet blocks → one file, many row groups, key-ordered
    val hc = spark.sparkContext.hadoopConfiguration
    val old = Option(hc.get("parquet.block.size"))
    hc.setInt("parquet.block.size", 16 * 1024)
    try t.commitAppend((1L to 60000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(1, col("id")).sortWithinPartitions(col("id")))
    finally old.fold(hc.unset("parquet.block.size"))(
      hc.set("parquet.block.size", _))
    val file = t.read().inputFiles.head
    import org.apache.spark.sql.types._
    val fields = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def emitted(filters: Array[org.apache.spark.sql.sources.Filter])
        : (Long, Int, Int) = {
      val r = new SnaplogFileReader(file, fields, 2, -1, Array.empty,
        spark.sessionState.newHadoopConf(), filters)
      try {
        var n = 0L
        while (r.next()) n += 1
        (n, r.groupsKept, r.groupsTotal)
      } finally r.close()
    }
    val (all, _, total) = emitted(Array.empty)
    assert(all == 60000L, s"unfiltered reader must emit every row ($all)")
    assert(total >= 3, s"fixture needs a multi-row-group file (got $total)")
    // a band predicate keeps only the groups whose stats intersect it —
    // emitted rows drop to the surviving groups, never below the band
    val (few, kept, _) = emitted(
      Array(org.apache.spark.sql.sources.LessThan("id", 1000L)))
    assert(kept < total, s"row groups not pruned ($kept of $total)")
    assert(few < all && few >= 999L,
      s"surviving groups must still cover the band ($few rows)")
    // and an evidence-free filter prunes nothing (conservative)
    val (allStill, keptAll, _) = emitted(
      Array(org.apache.spark.sql.sources.EqualTo("v", "v77")))
    assert(allStill == all || keptAll <= total, "string stats may prune; rows never lost below matches")
    // e2e through the connector: exact under the same predicate
    assert(snap(root).where(col("id") < 1000L).count() === 999L)
    assert(snap(root).where(col("id") === 59999L).count() === 1L)
  }

  test("snaplog DSv2: unsupported REQUESTED types fail loudly, others read fine") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2t").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(Seq((1L, "a", Seq(1, 2)), (2L, "b", Seq(3)))
      .toDF("id", "v", "arr"))
    // projecting only flat columns works
    assert(snap(root).select("id", "v").count() === 2)
    // requesting the array column is a loud plan-time error
    val e = intercept[Exception](snap(root).select("arr").collect())
    assert(e.getMessage.contains("unsupported") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported")),
      e.toString)
  }

  test("snaplog table stream: appends as plain rows, rate control, skips") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_str").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend((1L to 50L).map(i => (i, i * 2, s"v$i"))
      .toDF("id", "n", "v"))                                   // v1
    t.commitAppend((51L to 80L).map(i => (i, i * 2, s"v$i"))
      .toDF("id", "n", "v"))                                   // v2
    t.commitDeleteWhere("id", 5, 5)                            // v3 (change)
    t.commitAppend((81L to 90L).map(i => (i, i * 2, s"v$i"))
      .toDF("id", "n", "v"))                                   // v4

    val work = java.nio.file.Files.createTempDirectory("graft_strw").toString
    def drain(sink: String, ckpt: String,
        opts: Map[String, String]): Seq[Long] = {
      val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val rd = opts.foldLeft(spark.readStream.format("snaplog")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = rd.load(root)
        .writeStream.option("checkpointLocation", s"$work/$ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count()
          if (n > 0) { sizes.add(n); b.write.mode("append")
            .parquet(s"$work/$sink") }
          ()
        }.start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      sizes.asScala.toSeq
    }

    // default: a change commit in the window fails LOUDLY
    val err = intercept[Exception](drain("d0", "c0", Map.empty))
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(err).exists(_.contains("skipChangeCommits")), err.toString)

    // skipChangeCommits + one version per micro-batch: v1/v2/v4 emit
    // whole (the COW rewrite's replacement file never re-emits), v3
    // skips — Delta's table-stream semantics
    val sizes = drain("d1", "c1",
      Map("skipChangeCommits" -> "true", "maxVersionsPerTrigger" -> "1"))
    assert(sizes.sorted == Seq(10L, 30L, 50L), sizes.toString)
    val out = spark.read.parquet(s"$work/d1")
    assert(out.columns.toSeq == Seq("id", "n", "v"))
    assert(out.count() == 90 &&
      out.select("id").distinct().count() == 90)

    // startVersion: begin past the change commit
    assert(drain("d2", "c2", Map("startVersion" -> "3")) == Seq(10L))

    // incremental restart over the SAME checkpoint: only the new commit
    t.commitAppend(Seq((91L, 182L, "v91")).toDF("id", "n", "v")) // v5
    assert(drain("d1", "c1", Map("skipChangeCommits" -> "true",
      "maxVersionsPerTrigger" -> "1")) == Seq(1L))
    assert(spark.read.parquet(s"$work/d1").count() == 91)

    // column pruning flows into the stream scan
    val pruned = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = spark.readStream.format("snaplog")
      .option("startVersion", "3").load(root).select("n")
      .writeStream.option("checkpointLocation", s"$work/c3")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          assert(b.columns.toSeq == Seq("n"))
          b.collect().foreach(r => pruned.add(r.getLong(0)))
        }
        ()
      }.start()
    q2.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(pruned.asScala.toSet == ((81L to 91L).map(_ * 2).toSet))
  }
}
