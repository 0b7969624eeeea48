package graft.genomics

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PRQ / FASTQ line codecs and the partitioned gzip sink (SURVEY §2A
  * R6/R7/R14/R16).
  */
object Codecs {

  /** PRQ line: id, mate1 seq/qual, mate2 seq/qual — one pair per line
    * (the Seal `prq` format the reference's Stage 2 consumes,
    * `workflow.py:35`). */
  def toPrqLine(r: PrqRead): String =
    s"${r.id}\t${r.seq1}\t${r.qual1}\t${r.seq2}\t${r.qual2}"

  def parsePrqLine(line: String): (String, String, String, String, String) = {
    val f = line.split('\t')
    (f(0), f(1), f(2), f(3), f(4))
  }

  /** R6: write PRQ as `out/sample=<s>/part-*.txt.gz`, `numTasks` writers per
    * sample. Repartitioning by (sample, writer-salt) before the sink means
    * every written part has rows — R7's empty-part pruning pass becomes
    * unnecessary by construction (the reference needed it because its sink
    * pre-allocated one file per writer regardless of content,
    * `workflow.py:360-373`). */
  def writePartitionedGzip(reads: Dataset[PrqRead], outDir: String,
                           numTasks: Int = 4): Unit = {
    import reads.sparkSession.implicits._
    reads
      .repartition(col("sample"), pmod(xxhash64(col("id")), lit(numTasks)))
      .select(col("sample"), concat_ws("\t",
        col("id"), col("seq1"), col("qual1"), col("seq2"), col("qual2")).as("value"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("sample")
      .option("compression", "gzip")
      .text(outDir)
  }

  /** Read a PRQ directory written by `writePartitionedGzip` back to rows;
    * the `sample=` partition column is restored by the scan. */
  def readPrq(spark: SparkSession, dir: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.text(dir)
      .select(input_file_name().as("file"), col("value"))
      .withColumn("sample", regexp_extract(col("file"), "sample=([^/]+)/", 1))
      .select(col("sample"), col("value")).as[(String, String)]
  }

  /** Partition-value escaping, matching what the `partitionBy("sample")`
    * sink writes into directory names (Hive-style path escaping). */
  def escapePartitionValue(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)

  /** R9 as the reference does it (`workflow.py:398-405`): a driver-side
    * listing of the sink's `sample=<s>/` partition directories — no data
    * scan — with the same name filter as `Demux.discoverSamples` (no
    * `_`-prefix, no unknown/undetermined). Listed through the Hadoop
    * FileSystem API so any scheme the sink can write (hdfs://, s3a://,
    * file://) lists the same way — the reference's `phdfs.lsl`. */
  def listSamplePartitions(spark: SparkSession, prqDir: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(prqDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("sample=") =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(st.getPath.getName.stripPrefix("sample="))
    }.filter { s =>
      val l = s.toLowerCase
      !s.startsWith("_") && !l.contains("unknown") && !l.contains("undetermined")
    }.sorted
  }

  /** R7 for sinks that can't avoid empty parts: delete files under `dir`
    * smaller than `minBytes` (gzip header ≈ 20 B ⇒ no payload). Driver-side
    * filesystem pass, exactly like the reference's `_clean_up_bcl_output`;
    * FS-agnostic via the Hadoop FileSystem API. */
  def pruneSmallFiles(spark: SparkSession, dir: String, minBytes: Long = 30): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return 0
    val it = fs.listFiles(root, true)
    var n = 0
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.startsWith("part-") && st.getLen < minBytes) {
        fs.delete(st.getPath, false); n += 1
      }
    }
    n
  }

  /** R16/R14: FASTQ 4-line records → (id, seq, qual). Gzip text files are
    * unsplittable, so each input file arrives as one partition and the
    * 4-line grouping inside `mapPartitions` is safe; for splittable inputs
    * this codec must be fed per-file partitions (`wholetext` or a
    * repartition by file). */
  def parseFastq(lines: Dataset[String]): Dataset[(String, String, String)] = {
    import lines.sparkSession.implicits._
    lines.mapPartitions { it =>
      it.grouped(4).map { g =>
        require(g.length == 4 && g(0).startsWith("@"),
          s"malformed FASTQ record: ${g.headOption.getOrElse("")}")
        (g(0).substring(1), g(1), g(3))
      }
    }
  }

  /** FASTQ filename grammar (R14, `baseline_workflow.py:109-117`):
    * name_S##_L###_R{1,2}_001.fastq.gz → (sample, lane, readNo). */
  val fastqNameRe = "^(.+)_S\\d+_L(\\d{3})_R([12])_001\\.fastq(\\.gz)?$"
}
