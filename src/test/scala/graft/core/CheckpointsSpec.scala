package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Checkpoints knob: default = localCheckpoint semantics; reliable =
  * filesystem checkpoint (survives executor loss — exercised for real by
  * `tools.ClusterCheck --chaos`, which SIGKILLs an executor mid-loop).
  * Here: result parity across modes, dir setup, and lineage truncation.
  */
class CheckpointsSpec extends SparkSpec {

  test("default mode is localCheckpoint; reliable mode writes files — same rows") {
    val s = spark.newSession()
    import s.implicits._
    def loop(): Seq[(Long, Long)] = {
      // a mini iterative loop through the truncation point, the shape
      // every GraphOps/Dedup round has
      var df = s.range(0, 100).toDF("id").withColumn("v", col("id") % 7)
      for (_ <- 0 until 3)
        df = Checkpoints.checkpoint(
          df.groupBy(col("v")).agg(sum(col("id")).as("id"))
            .select(col("id"), col("v")))
      df.as[(Long, Long)].collect().sortBy(_._2).toSeq
    }
    val defaultRows = loop()
    assert(s.sparkContext.getCheckpointDir.isEmpty,
      "default mode must not touch the checkpoint dir")
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec")
    s.conf.set(Checkpoints.reliableKey, "true")
    s.conf.set(Checkpoints.dirKey, dir.toString)
    try {
      val reliableRows = loop()
      assert(reliableRows === defaultRows)
      assert(s.sparkContext.getCheckpointDir.exists(_.contains(
        dir.getFileName.toString)), s.sparkContext.getCheckpointDir)
      // files really landed on the filesystem (the durability substrate)
      def count(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(count).sum
        else 1
      assert(count(dir.toFile) > 0, "reliable checkpoint wrote no files")
    } finally {
      s.conf.unset(Checkpoints.reliableKey)
      s.conf.unset(Checkpoints.dirKey)
    }
  }

  test("reliable mode fails fast on a non-local master with no explicit dir") {
    // the guard itself is the pure resolver — a driver tmp fallback is
    // only legal when executors share the driver's filesystem
    val err = intercept[IllegalArgumentException] {
      Checkpoints.resolveReliableDir("yarn", None)
    }
    assert(err.getMessage.contains(Checkpoints.dirKey))
    intercept[IllegalArgumentException] {
      Checkpoints.resolveReliableDir("spark://host:7077", None)
    }
    intercept[IllegalArgumentException] {
      Checkpoints.resolveReliableDir("k8s://https://host:443", None)
    }
    // explicit dir always wins, any master
    assert(Checkpoints.resolveReliableDir("yarn", Some("/shared/ckpt"))
      === "/shared/ckpt")
    // single-machine masters may fall back to a driver tmp dir
    assert(Checkpoints.singleMachineMaster("local[32]"))
    assert(Checkpoints.singleMachineMaster("local-cluster[2,4,3072]"))
    assert(!Checkpoints.singleMachineMaster("yarn"))
    val tmp = Checkpoints.resolveReliableDir("local[2]", None)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(tmp)))
  }

  test("checkpoint truncates lineage in both modes") {
    val s = spark.newSession()
    val base = s.range(0, 10).toDF("id").where(col("id") > 2)
    val local = Checkpoints.checkpoint(base)
    assert(local.queryExecution.optimizedPlan.collectLeaves()
      .exists(_.getClass.getSimpleName.contains("LogicalRDD")),
      "localCheckpoint must replace the plan with a scan of the blocks")
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec2")
    s.conf.set(Checkpoints.reliableKey, "true")
    s.conf.set(Checkpoints.dirKey, dir.toString)
    try {
      val rel = Checkpoints.checkpoint(base)
      assert(rel.queryExecution.optimizedPlan.collectLeaves()
        .exists(_.getClass.getSimpleName.contains("LogicalRDD")),
        "reliable checkpoint must also truncate to a scan")
      assert(rel.collect().map(_.getLong(0)).sorted ===
        base.collect().map(_.getLong(0)).sorted)
    } finally {
      s.conf.unset(Checkpoints.reliableKey)
      s.conf.unset(Checkpoints.dirKey)
    }
  }
}
