package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming change-feed source over a [[graft.operators.SnapshotLog]]
  * table — the Delta "table as a stream" read side, built on Structured
  * Streaming's file source rather than a custom Source: every committed
  * version IS exactly one immutable `_log/<N>.json` file published
  * atomically (hard-link CAS), so tailing the log directory with a file
  * stream gives a replayable, checkpointed version feed for free. Each
  * micro-batch maps the newly seen entry files to their versions and
  * computes the exact per-version row diff `changes(v-1, v)` with the
  * batch API (v = 1 diffs against the empty table: a pure-insert
  * backfill), writing each version's diff to its own `cdf_version=<N>`
  * partition directory with overwrite — so a retried batch rewrites the same
  * bytes and the sink stays exactly-once per version without a
  * transactional sink.
  *
  * Scale shape: the per-version diff cost is bounded by the entries the
  * version touched (see [[graft.operators.SnapshotTable.changes]]), the
  * file-source checkpoint holds one line per version (driver metadata),
  * and a catch-up run after N new commits processes exactly those N
  * entry files. Vacuumed history fails loudly inside `changes` if a
  * stream starts below the retention horizon — resume from a retained
  * version instead.
  *
  * `Trigger.AvailableNow` drains everything committed so far and
  * terminates (the incremental-backfill mode); re-running with the same
  * checkpoint picks up only versions committed since.
  */
object SnapshotCdf {

  /** Drain all unprocessed versions of `root`'s log into
    * `sinkDir/cdf_version=<N>/` partition dirs (schema: table columns +
    * `_change_type`), tracking progress in `ckptDir`. Returns after
    * catch-up. */
  def backfill(spark: SparkSession, root: String, keyCol: String,
      sinkDir: String, ckptDir: String): Unit = {
    val entries = spark.readStream
      .option("maxFilesPerTrigger", 2) // several versions per batch is fine
      .text(s"$root/_log")
      .select(input_file_name().as("f"))
    val q = entries.writeStream
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val vs = batch
          .select(regexp_extract(col("f"), "([0-9]+)\\.json$", 1)
            .cast("int").as("v"))
          .where(col("v").isNotNull).distinct()
          .collect().map(_.getInt(0)).sorted
        val t = graft.operators.SnapshotLog.open(spark, root, keyCol)
        // per-version diffs are independent jobs writing disjoint
        // idempotent-overwrite dirs — overlap them (guide §2.6) so a
        // catch-up batch's later diffs back-fill the cores the earlier
        // diff's tail leaves idle, instead of serializing N diff jobs.
        // Bounded pool: 2–3 jobs in flight is the guide's sweet spot.
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(3, vs.length)))
        try vs.map { v =>
          pool.submit(new Runnable {
            override def run(): Unit =
              t.changes(v - 1, v)
                .write.mode("overwrite").parquet(s"$sinkDir/cdf_version=$v")
          })
        }.foreach(_.get())
        finally pool.shutdown()
      }
      .start()
    q.awaitTermination()
  }

  /** The accumulated feed: one row per changed row per version, with the
    * `cdf_version` partition column. */
  def feed(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir)

  /** Exactly-once streaming INGEST into a snapshot-log table — the write
    * side of this file's read side, and the Delta streaming-sink
    * pattern: each micro-batch lands via
    * [[graft.operators.SnapshotTable.commitAppendTxn]], which records
    * `(appId, batchId)` in the same atomic log publish as the data, so a
    * foreachBatch retry or a restart that replays batches the sink
    * already applied (offsets checkpointed, sink effect already durable)
    * commits NOTHING the second time. foreachBatch alone is only
    * at-least-once; the txn watermark is what upgrades it. `appId` must
    * be stable across restarts (it identifies the writer, not the run).
    *
    * Scale shape: one log entry + one data dir per micro-batch — commit
    * cost is batch-sized, the replay check is one log-entry read, and
    * concurrent batch writers/other streams interleave freely through
    * the OCC loop. Drains with `Trigger.AvailableNow` and terminates;
    * re-running with the same checkpoint appends only new source data. */
  def ingest(stream: DataFrame, root: String, keyCol: String,
      appId: String, ckptDir: String): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.SnapshotLog
          .open(batch.sparkSession, root, keyCol)
          .commitAppendTxn(batch, appId, batchId)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
