package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runtime (Bloom) filter injection — the NON-partitioned complement of
  * dynamic partition pruning: when a selective dim-side filter exists only
  * at runtime and the fact side is keyed by an ordinary column (no disk
  * partitioning to prune), Catalyst's InjectRuntimeFilter builds a Bloom
  * filter from the filtered creation side and applies `might_contain`
  * BEFORE the fact side's shuffle — at 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the ~matching
  * fraction. Rows are never dropped wrongly (Bloom false positives pass
  * through to the exact join); the filter only shrinks the exchange.
  *
  * Spark gates the rewrite on size estimates tuned for clusters (the
  * application side must look ≥ 10 GB); `bloomJoin` relaxes the gates so
  * the behavior is deterministic at any input size — the engine decides
  * WHERE to use it, not the statistics of a test fixture. */
object RuntimeFilters {

  /** Equi-join fact ⋈ dim on `key` with runtime Bloom-filter injection
    * enabled and its size gates opened. The dim side should carry a
    * selective filter for the Bloom to be worth building — exactly the
    * DPP setup, minus the disk partitioning.
    *
    * The sides arrive as BUILDERS because the join runs in its own
    * `newSession()`: injection requires the join to be a probable SHUFFLE
    * join (`canBroadcastBySize` false — a broadcast join already probes
    * the dim hash table at scan time, hints don't enter that check), and
    * un-broadcasting via `autoBroadcastJoinThreshold=-1` on the SHARED
    * session would silently de-optimize every concurrently-running query.
    * The child session shares the SparkContext but owns its SQLConf, so
    * the knobs stay scoped to this one join. */
  def bloomJoin(spark: SparkSession,
                fact: SparkSession => DataFrame,
                dim: SparkSession => DataFrame,
                key: String): DataFrame = {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // fixture-sized inputs would never clear the cluster-tuned estimates;
    // open the gates so plan shape is input-size independent
    ns.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    ns.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact(ns).join(dim(ns), key)
  }
}
