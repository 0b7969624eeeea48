package graft.operators

import org.apache.spark.sql.SparkSession

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
}
