package graft.bench

import org.apache.spark.sql.SparkSession

/** R23 cache-drop barrier (`experiment.py:37-40` single node;
  * `experiment.py:136-150` fans the same command over every YARN
  * nodemanager with pdsh): between benchmark attempts the reference drops
  * the OS page cache so repeats measure cold I/O instead of the previous
  * run's warm files. Spark-native equivalent, pluggable as
  * `Experiment.run(preRun = CacheDrop.barrier(spark))`:
  *
  *  - engine caches: `catalog.clearCache()` drops every cached
  *    DataFrame/block so no attempt reads a sibling's materialization;
  *  - OS page cache: best-effort `echo 3 > /proc/sys/vm/drop_caches` —
  *    root-only, silently reported false otherwise (the reference assumes
  *    passwordless sudo; a shared container usually has no such grant);
  *  - cluster fan-out: one task per executor slot runs the same drop —
  *    the reference's pdsh-over-nodemanagers re-expressed as a Spark job,
  *    so the barrier reaches every node that holds page cache.
  */
object CacheDrop {

  /** Best-effort OS page-cache drop on the local machine; returns whether
    * the write actually happened (needs root). Never throws. */
  def dropOsCaches(): Boolean =
    try {
      val p = java.nio.file.Paths.get("/proc/sys/vm/drop_caches")
      if (java.nio.file.Files.isWritable(p)) {
        java.nio.file.Files.writeString(p, "3")
        true
      } else false
    } catch { case _: Exception => false }

  /** A `preRun` barrier for `Experiment.run`. With `executorSlots > 0` the
    * OS drop fans out as one task per slot (cluster shape); otherwise it
    * runs driver-side only (local mode — same machine either way). */
  def barrier(spark: SparkSession, executorSlots: Int = 0): () => Unit = () => {
    spark.catalog.clearCache()
    // clearCache only covers CacheManager (cached DataFrames); blocks
    // persisted OUTSIDE it — localCheckpoint RDDs from the engine's loop
    // operators, direct RDD persists — otherwise survive until Dataset
    // GC and leak one attempt's materialization into the next. Between
    // attempts no dataset legitimately spans the barrier, so drop them
    // all (round 16: the barrier's "drops every cached block" contract
    // previously held only up to GC timing).
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    if (executorSlots > 0)
      spark.sparkContext.parallelize(0 until executorSlots, executorSlots)
        .foreach(_ => CacheDrop.dropOsCaches())
    else dropOsCaches()
  }
}
