package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply — maintain a keyed latest-state table from an
  * upsert/delete change stream via `foreachBatch`: the production
  * "apply the change feed to the serving snapshot" pattern (a Delta
  * MERGE loop without a table format). Each micro-batch:
  *
  *  1. collapse the batch to its LAST change per key (max `versionCol` —
  *     a batch may carry several changes for one key; versions must be
  *     unique per key, the CDC feed contract),
  *  2. merge with the current snapshot by MAX VERSION per key — not
  *     "batch wins": an out-of-order or replayed batch carrying older
  *     versions cannot regress state,
  *  3. deletes persist as TOMBSTONES (the `op` column stays in the
  *     stored snapshot) — a late-arriving upsert with a version below
  *     the delete's stays deleted, the compacted-log contract,
  *  4. write the new snapshot to `stateDir/gen_<batchId>` — OVERWRITE,
  *     so a restarted/replayed batch rewrites the same generation and
  *     the apply is idempotent for downstream readers.
  *
  * Scale shape: one per-key shuffle of (snapshot ∪ batch-winners) per
  * batch — the snapshot rewrite IS the operation being asked for (a
  * table format buys sub-file rewrites, not a different dataflow); the
  * per-key collapse windows only within a micro-batch plus one prior
  * row per key. Generation dirs double as retention/time travel;
  * `currentSnapshot` resolves the newest one by listing (driver
  * metadata only) and filters tombstones.
  */
object CdcApply {

  /** Newest generation strictly below `beforeGen` (None = any). */
  private[streaming] def latestGen(spark: SparkSession, stateDir: String,
                                   beforeGen: Option[Long] = None): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val gens = fs.listStatus(path).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("gen_") => n.drop(4).toLong }
        .filter(g => beforeGen.forall(g < _))
      if (gens.isEmpty) None else Some(gens.max)
    }
  }

  /** The current live state (tombstones filtered), or None before the
    * first batch lands. */
  def currentSnapshot(spark: SparkSession, stateDir: String,
                      opCol: String = "op"): Option[DataFrame] =
    latestGen(spark, stateDir).map(g =>
      spark.read.parquet(s"$stateDir/gen_$g")
        .where(col(opCol) =!= "d").drop(opCol))

  /** Apply ONE change batch (also the unit a backfill driver calls
    * directly). Reads the newest generation BELOW `batchId` — a replayed
    * batch must not read its own half-written output. */
  def applyBatch(batch: DataFrame, stateDir: String, batchId: Long,
                 key: String = "key", versionCol: String = "version",
                 opCol: String = "op"): Unit = {
    val spark = batch.sparkSession
    val w = Window.partitionBy(col(key)).orderBy(col(versionCol).desc)
    val last = batch
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val merged = latestGen(spark, stateDir, beforeGen = Some(batchId)) match {
      case Some(g) =>
        spark.read.parquet(s"$stateDir/gen_$g")
          .unionByName(last)
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
      case None => last
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/gen_$batchId")
  }

  /** Snapshot retention (VACUUM): delete every generation older than the
    * newest `keepLast`. Driver-metadata listing + recursive dir deletes —
    * no data read; the newest generation is never deleted, so readers
    * resolving via [[currentSnapshot]] are unaffected (readers pinned to
    * an EXPIRED generation lose time travel, the standard retention
    * trade). Returns the deleted generation ids. */
  def expireGenerations(spark: SparkSession, stateDir: String,
                        keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, s"keepLast=$keepLast")
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else {
      val gens = fs.listStatus(path).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("gen_") => n.drop(4).toLong }
        .sorted.reverse
      val drop = gens.drop(keepLast)
      drop.foreach(g =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/gen_$g"), true))
      drop
    }
  }

  /** Attach the apply loop to a change stream. `changes` must carry
    * (`key`, `versionCol`, `opCol`, payload…). */
  def cdcApply(changes: DataFrame, stateDir: String, checkpoint: String,
               key: String = "key", versionCol: String = "version",
               opCol: String = "op"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, stateDir, batchId, key, versionCol, opCol)
      }
      .start()
}
