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
}
