package graft.core

import org.apache.spark.sql.Dataset

/** Lineage-truncation point for every iterative loop in the engine
  * (GraphOps rank/label loops, Dedup's connected-components loop,
  * CorpusOps BPE training, the Analytics multi-consumer materializations).
  *
  * Default (`spark.graft.checkpoint.reliable` unset/false):
  * `localCheckpoint` — blocks live in executor memory/disk, zero extra
  * jobs, the right call for a healthy cluster and the measured-fast path
  * every loop was tuned on. The documented failure mode is EXECUTOR
  * LOSS: localCheckpoint blocks are unreplicated and lineage is
  * truncated, so a lost executor fails the JOB loudly (never a wrong
  * answer) — Spark's own contract for localCheckpoint.
  *
  * Reliable mode (`spark.graft.checkpoint.reliable=true`): swaps in
  * `Dataset.checkpoint` to the filesystem at
  * `spark.graft.checkpoint.dir`. When the dir is unset, a driver tmp-dir
  * fallback is allowed ONLY on `local`/`local-cluster` masters (single
  * machine — every executor can read the driver's filesystem). On any
  * other master the fallback would scatter "reliable" checkpoint
  * partitions across node-LOCAL disks that stage retries on other nodes
  * cannot read — recovery would degrade to confusing FileNotFound
  * failures — so [[checkpoint]] fails fast with the knob to set instead.
  * Executor loss then degrades to RECOMPUTE-from-checkpoint
  * instead of job failure: stage retry re-reads the checkpoint files,
  * the loop continues, the answer is unchanged (the chaos gate in
  * tools.ClusterCheck kills an executor mid-loop and asserts exactly
  * this). Cost: a reliable checkpoint writes the dataset out (one extra
  * materialization per call) — pay it when the job is long enough that
  * restarting from zero costs more, i.e. precisely the 100 TB runs.
  *
  * Superseded-checkpoint cleanup: sessions built through
  * [[Sessions.build]] set `spark.cleaner.referenceTracking
  * .cleanCheckpoints=true`, so each loop round's files are deleted once
  * the previous round's Dataset is GC'd — the checkpoint dir holds
  * O(live datasets), not O(iterations). Sessions built elsewhere should
  * set that conf too (it is context-build-time only); without it
  * reliable mode grows the dir by one dataset copy per checkpoint call
  * until application exit.
  */
object Checkpoints {

  val reliableKey = "spark.graft.checkpoint.reliable"
  val dirKey = "spark.graft.checkpoint.dir"

  def reliable(ds: Dataset[_]): Boolean =
    ds.sparkSession.conf.get(reliableKey, "false").toBoolean

  /** Masters where every executor shares the driver's filesystem, so a
    * driver-local tmp checkpoint dir is actually readable cluster-wide. */
  private[graft] def singleMachineMaster(master: String): Boolean =
    master.startsWith("local")

  /** Resolve the reliable-checkpoint directory: the explicit `dirKey`
    * value if set; otherwise a driver tmp dir on single-machine masters;
    * otherwise FAIL FAST — on a real cluster a driver-local fallback
    * scatters checkpoint partitions across node disks that other nodes'
    * stage retries cannot read. Pure (side effect only in the tmp-dir
    * thunk) so the guard is unit-testable without a non-local context. */
  private[graft] def resolveReliableDir(
      master: String, explicit: Option[String]): String =
    explicit.getOrElse {
      if (!singleMachineMaster(master))
        throw new IllegalArgumentException(
          s"$reliableKey=true on master '$master' requires an " +
            s"executor-shared checkpoint directory: set $dirKey (or " +
            "SparkContext.setCheckpointDir) to an HDFS/S3/NFS path. " +
            "A driver-local temp dir would leave checkpoint partitions " +
            "on individual node disks that stage retries on other nodes " +
            "cannot read.")
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    }

  /** `localCheckpoint(eager)` by default; reliable checkpoint under the
    * conf knob. Drop-in at every loop's truncation point. */
  def checkpoint[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] =
    if (!reliable(ds)) ds.localCheckpoint(eager)
    else {
      val sc = ds.sparkSession.sparkContext
      // idempotent one-time dir setup per context; getOption keeps the
      // tmp-dir fallback LAZY (an explicit dirKey must not create a
      // stray temp directory)
      if (sc.getCheckpointDir.isEmpty) sc.synchronized {
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(resolveReliableDir(
            sc.master, ds.sparkSession.conf.getOption(dirKey)))
      }
      ds.checkpoint(eager)
    }
}
