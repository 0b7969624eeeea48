package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

class SnaplogWriteSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("native batch write: append + truncate land as real log commits") {
    val root = java.nio.file.Files.createTempDirectory("graft_wn").toString +
      "/table"
    // fresh table: first commit carries the key via option
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id"))
      .write.format("snaplog").option("key", "id").mode("append").save(root)
    val t = SnapshotLog.open(spark, root, "id")
    assert(t.currentVersion() == 1)
    assert(t.read().count() == 100)
    assert(t.opOf(1) == "append")

    // the staged files carry footer stats into the log: range reads prune
    val pruned = t.readRange(1, 10)
    assert(pruned.inputFiles.length < t.read().inputFiles.length,
      "stats from natively written files must prune")
    assert(pruned.count() == 10)

    // second append works without the key option (read from the log)
    (101L to 120L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.format("snaplog").mode("append").save(root)
    assert(t.read().count() == 120)

    // MOR delete applies on reads of natively written data
    t.commitDelete(Seq(5L, 115L).toDF("id"))
    assert(t.read().count() == 118)

    // overwrite = truncate-capability replace semantics
    Seq((500L, "z")).toDF("id", "v")
      .write.format("snaplog").mode("overwrite").save(root)
    assert(t.read().count() == 1)
    assert(t.read(2).count() == 120, "history survives the overwrite")

    // constraints gate the native path too
    t.addConstraint("pos", "id > 0")
    intercept[Exception] {
      Seq((-1L, "bad")).toDF("id", "v")
        .write.format("snaplog").mode("append").save(root)
    }
    assert(t.read().where(col("id") < 0).count() == 0)
    // and the staged dir of the refused batch was swept or unreferenced:
    // vacuum reports it gone either way
    t.compact()
    t.vacuum(t.currentVersion())
    assert(t.read().count() == 1)
  }

  test("native streaming write: exactly-once micro-batch appends") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_ws").toString
    val staged = s"$tmp/staged"
    val root = s"$tmp/table"
    val ckpt = s"$tmp/ckpt"
    val df = (1L to 60L).map(i => (i, i * 2)).toDF("id", "n")
    df.where(col("id") <= 20).write.parquet(s"$staged/b0")
    df.where(col("id") > 20 && col("id") <= 40).write.parquet(s"$staged/b1")

    def run(): Unit = {
      val q = spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$staged/*")
        .writeStream.format("snaplog")
        .option("key", "id").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(root)
      q.awaitTermination()
    }
    run()
    val t = SnapshotLog.open(spark, root, "id")
    assert(t.read().count() == 40, s"got ${t.read().count()}")

    // re-run over the same checkpoint: nothing new, nothing duplicated
    run()
    assert(t.read().count() == 40, "restart must not duplicate batches")

    // new files arrive; only they are ingested
    df.where(col("id") > 40).write.parquet(s"$staged/b2")
    run()
    assert(t.read().count() == 60)
    assert(t.read().select("id").distinct().count() == 60)

    // the txn watermark is visible in the log like any API writer's:
    // the latest entry carries a "snaplog-sink-<queryId>" app watermark
    val v = t.currentVersion()
    val tree = graft.operators.SnapshotLog.Json.readTree(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(root, "_log", s"$v.json")))
    val apps = Option(tree.get("txn")).map { o =>
      val b = Seq.newBuilder[String]
      o.fieldNames().forEachRemaining(n => b += n)
      b.result()
    }.getOrElse(Nil)
    assert(apps.exists(_.startsWith("snaplog-sink-")),
      s"latest entry must carry the sink's txn watermark, got $apps")
    assert((1 to v).forall(i => t.opOf(i) == "txn-append"),
      "streaming commits must ride the txn action")
  }
}
