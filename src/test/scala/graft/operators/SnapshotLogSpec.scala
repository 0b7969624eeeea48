package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotLogSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("snapshot log: versions, time travel, MOR deletes, compact fold") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val t = SnapshotLog.open(spark, root, "id")
    val a = (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v")
    val b = (11L to 15L).map(i => (i, s"b$i")).toDF("id", "v")

    assert(t.currentVersion() == 0)
    assert(t.commitAppend(a) == 1)
    assert(t.commitAppend(b) == 2)
    // v1 sees only the first commit; v2 the union
    assert(t.read(1).count() == 10)
    assert(t.read(2).count() == 15)

    // merge-on-read delete: data untouched, reads apply the anti-join
    assert(t.commitDelete(Seq(2L, 4L, 12L).toDF("id")) == 3)
    assert(t.read(3).as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      ((1L to 15L).toSet -- Set(2L, 4L, 12L)).toSeq.sorted)
    // time travel still sees the pre-delete snapshots
    assert(t.read(1).count() == 10 && t.read(2).count() == 15)
    // latest == explicit
    assert(t.read().count() == t.read(3).count())

    // compact folds deletes into data; rows identical, no delete sidecar
    val before = t.read().as[(Long, String)].collect().toSet
    val v4 = t.compact()
    assert(v4 == 4)
    assert(t.read(4).as[(Long, String)].collect().toSet == before)
    val plan = t.read(4).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("anti"),
      s"compacted read must not carry the delete anti-join:\n$plan")

    // overwrite replaces everything
    t.commitOverwrite(Seq((100L, "x")).toDF("id", "v"))
    assert(t.read().count() == 1)
    // prior history still resolvable
    assert(t.read(2).count() == 15)

    // version bounds fail loudly
    intercept[IllegalArgumentException](t.read(99))
    intercept[IllegalArgumentException](
      SnapshotLog.open(spark, root + "_empty", "id").read())
  }
}
