package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Small-file bin-packing compaction (round 16 — Delta's plain
  * OPTIMIZE): only fragments move; right-sized files carry as
  * metadata. */
class BinPackSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def entry(t: SnapshotTable) = t.readEntry(t.currentVersion())

  test("unpartitioned: fragments pack, the big file never moves") {
    val root = java.nio.file.Files.createTempDirectory("graft_bp").toString
    val t = SnapshotLog.open(spark, root, "id")
    t.commitAppend(spark.range(200000)
      .select(col("id"), concat(lit("big-"), col("id")).as("v"))
      .repartition(1))                                          // v1: big
    for (i <- 1 to 4)
      t.commitAppend(spark.range(1000000L + i * 100L,
          1000000L + i * 100L + 100L)
        .select(col("id"), concat(lit(s"s$i-"), col("id")).as("v"))
        .repartition(1))                                        // v2..v5
    t.commitDelete(Seq(1000150L).toDF("id"))                    // v6: MOR
    val e0 = entry(t)
    val bigBytes = e0.stats.map(_.bytes).max
    val bigFile = e0.stats.maxBy(_.bytes).file

    val v = t.compactSmallFiles(bigBytes) // strictly-smaller selection
    assert(v == 7)
    assert(t.opOf(v) == "compact-files")
    val e1 = entry(t)
    // the big file carries METADATA-identical; fragments collapse
    assert(e1.stats.exists(_.file == bigFile))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      new java.net.URI(bigFile).getPath)))
    assert(e1.data.size == 2, s"got ${e1.data}") // big entry + one pack
    // rows exact: 200000 big + 400 small - 1 sidecar-masked
    assert(t.read().count() == 200399L)
    assert(t.read().where(col("id") === 1000150L).count() == 0,
      "sidecar-deleted keys must not resurrect through the pack")
    assert(t.read().where(col("v") === "s2-1000250").count() == 1)
    // no-op when nothing qualifies
    assert(t.compactSmallFiles(1L) == v)
  }

  test("partitioned: all-small leaves pack per assignment, mixed stay") {
    val root = java.nio.file.Files.createTempDirectory("graft_bpp").toString
    val t = SnapshotLog.open(spark, root, "id")
    def mk(p: String, lo: Long, n: Long) =
      spark.range(lo, lo + n).select(col("id"), lit(p).as("p"))
    // partition a: two small leaves (two commits); partition b: one
    // MIXED leaf (a big and a small file in one leaf dir)
    t.commitAppend(mk("a", 0, 50).repartition(1), Seq("p"))
    t.commitAppend(mk("a", 50, 50).repartition(1), Seq("p"))
    t.commitAppend(mk("b", 1000, 100000).repartition(2), Seq("p"))
    val e0 = entry(t)
    val bLeaf = e0.pvals.collect {
      case (d, vs) if vs("p") == "b" => d }.head
    // the largest file overall is b's big part: using it as the cutoff
    // keeps b a MIXED leaf (one file at the threshold, one under it)
    // while every a file stays strictly smaller
    val threshold = e0.stats.map(_.bytes).max

    val v = t.compactSmallFiles(threshold)
    val e1 = entry(t)
    // partition a: ONE packed leaf carrying the assignment
    val aLeaves = e1.pvals.collect { case (d, vs) if vs("p") == "a" => d }
    assert(aLeaves.size == 1, s"got ${e1.pvals}")
    assert(!e0.pvals.keySet.contains(aLeaves.head), "a must be repacked")
    // the mixed b leaf is untouched (optimizePartition's job)
    assert(e1.data.contains(bLeaf))
    assert(t.readPartitions(Map("p" -> "a")).count() == 100)
    assert(t.readPartitions(Map("p" -> "b")).count() == 100000)
    assert(t.read().count() == 100100)
    assert(t.opOf(v) == "compact-files")
  }

  test("CALL compact_files drives the pack through SQL") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bpc").toString
    spark.conf.set("spark.sql.catalog.bpw", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.bpw.warehouse", wh)
    val root = s"$wh/t"
    val t = SnapshotLog.open(spark, root, "id")
    for (i <- 0 until 3)
      t.commitAppend(spark.range(i * 10L, i * 10L + 10L)
        .select(col("id"), lit(s"g$i").as("v")).repartition(1))
    val got = spark.sql("CALL bpw.compact_files(table => 't', " +
      "small_bytes => 10485760)").head().getInt(0)
    assert(got == 4)
    assert(entry(t).data.size == 1)
    assert(t.read().count() == 30)
  }
}
