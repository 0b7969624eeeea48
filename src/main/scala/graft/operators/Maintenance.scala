package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operations. The one that matters at 100 TB is
  * small-file compaction: streaming ingest and fine-grained partitioned
  * writes accumulate thousands of KB-sized parquet parts per directory,
  * and every downstream scan then pays per-file open/footer costs and
  * loses row-group locality. Compaction rewrites a directory into
  * ~`targetBytes` files sized from the MEASURED input, never a guessed
  * constant.
  */
object Maintenance {

  /** Compact `src` (a parquet directory) into `dst` with output files
    * targeting `targetBytes` each. Returns (input file count, output
    * partition count). Always writes to a NEW directory — compaction
    * must be atomic-by-rename/swap at the orchestration layer, never an
    * in-place overwrite that a concurrent reader could half-see.
    *
    * Scale shape: the file listing and size sum come from the Hadoop
    * FileSystem (driver metadata, no data read); the rewrite is one
    * round-robin repartition to ceil(bytes/targetBytes) partitions —
    * a single full shuffle of the data being compacted, which IS the
    * job being asked for. */
  def compactParquet(spark: SparkSession, src: String, dst: String,
                     targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes >= 1, s"targetBytes=$targetBytes")
    val path = new org.apache.hadoop.fs.Path(src)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive listing: a partitionBy layout nests its files in
    // partition directories — a top-level listStatus would size the
    // rewrite from zero bytes and silently collapse it to one partition
    val files = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) files += st
    }
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(src)
      .repartition(nOut)
      .write.mode("overwrite").parquet(dst)
    (files.length, nOut)
  }

  /** Incremental aggregate maintenance (materialized-view upkeep): merge
    * a saved additive aggregate table with the aggregate of a NEW batch —
    * the history is never rescanned, which is the entire point at 100 TB
    * (the state table is group-cardinality-sized, the batch is the only
    * data-sized input). Supports the additive family (count/sum — and
    * avg/stddev via keeping their sum/sumsq parts additive, the caller's
    * schema choice). `state` and the batch aggregate must share
    * (keys ++ sumCols) schemas; missing groups on either side merge as
    * zero. One batch-sized aggregate + one state-sized outer join. */
  def incrementalAgg(state: DataFrame, batch: DataFrame, keys: Seq[String],
                     sumCols: Seq[String]): DataFrame = {
    val delta = batch.groupBy(keys.map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .toDF(keys ++ sumCols: _*)
    val merged = state.select(keys.map(col) ++
        sumCols.map(c => col(c).as(s"__s_$c")): _*)
      .join(delta.select(keys.map(col) ++
        sumCols.map(c => col(c).as(s"__d_$c")): _*), keys, "full_outer")
    // lit(0) coerces to each column's own numeric type, so long counts
    // stay long and double sums stay double
    merged.select(keys.map(col) ++ sumCols.map(c =>
      (coalesce(col(s"__s_$c"), lit(0)) +
        coalesce(col(s"__d_$c"), lit(0))).as(c)): _*)
  }
}
