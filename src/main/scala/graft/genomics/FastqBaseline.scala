package graft.genomics

import org.apache.spark.sql.{Dataset, SparkSession}

/** The reference's BASELINE arm (R14/R15/R16, `baseline_workflow.py`): a
  * directory of bcl2fastq-style `*.fastq.gz` output → per-sample mate-paired
  * reads → the same PRQ rows the BCL arm produces.
  *
  * Reference semantics re-expressed:
  *  - `_get_samples_from_bcl_output` (`baseline_workflow.py:93-119`):
  *    driver-side directory listing, keep `*.fastq.gz` not starting with
  *    "undetermined", sample = first `_`-separated filename token, read
  *    number from the 4th token (`R1`/`R2`, anything else is an error).
  *  - `_run_bwa` (`baseline_workflow.py:137-138`): each sample's R1 and R2
  *    file lists are SORTED and consumed side by side — record i of the
  *    concatenated R1 stream pairs with record i of R2. We pair per file
  *    couple (sorted R1[i] with sorted R2[i]), which is the same pairing as
  *    long as mate files hold equal record counts — enforced, since a
  *    mismatch means a corrupt run.
  *
  * Scale: each `.fastq.gz` is unsplittable, so one file = one partition and
  * the positional mate pairing is a zero-shuffle `rdd.zip` of two
  * single-partition RDDs. A run with thousands of mate files parallelizes
  * across executors file-by-file with no shuffle anywhere before the PRQ
  * sink's own partitioning.
  */
object FastqBaseline {

  /** One mate-file couple of a sample: R1[i] pairs with R2[i] after the
    * per-read-number lexicographic sort. `lane` parsed from the filename
    * grammar (`Codecs.fastqNameRe`), 0 if the name doesn't match. */
  final case class MatePair(sample: String, lane: Int, r1: String, r2: String)

  private val NameRe = Codecs.fastqNameRe.r

  /** Driver-side listing + filename-grammar group-by + sorted positional
    * file pairing (`baseline_workflow.py:93-119,137-138`). Hadoop FileSystem
    * listing, so any scheme works. */
  def discoverMatePairs(spark: SparkSession, dir: String): Seq[MatePair] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val files = fs.listStatus(root).toSeq
      .filter(st => st.isFile && {
        val n = st.getPath.getName.toLowerCase
        n.endsWith(".fastq.gz") && !n.startsWith("undetermined")
      })
      .map(_.getPath)
    files.groupBy(_.getName.split('_')(0)).toSeq.sortBy(_._1)
      .flatMap { case (sample, sampleFiles) =>
        def readFiles(r: String): Seq[org.apache.hadoop.fs.Path] =
          sampleFiles.filter { p =>
            val parts = p.getName.split('_')
            require(parts.length > 3 && (parts(3) == "R1" || parts(3) == "R2"),
              s"unrecognized read number in filename ${p.getName}")
            parts(3) == r
          }.sortBy(_.getName)
        val (r1, r2) = (readFiles("R1"), readFiles("R2"))
        require(r1.length == r2.length,
          s"sample $sample has ${r1.length} R1 but ${r2.length} R2 files")
        r1.zip(r2).map { case (a, b) =>
          val lane = NameRe.findFirstMatchIn(a.getName).map(_.group(2).toInt).getOrElse(0)
          MatePair(sample, lane, a.toString, b.toString)
        }
      }
  }

  /** "id/1", "id/2", and Illumina "id 1:N:0:BC" all normalize to "id". */
  private[genomics] def normalizeReadId(raw: String): String = {
    val beforeSpace = raw.split(' ')(0)
    if (beforeSpace.endsWith("/1") || beforeSpace.endsWith("/2"))
      beforeSpace.dropRight(2)
    else beforeSpace
  }

  /** Positional mate pairing of one file couple: record i of R1 pairs with
    * record i of R2 — a zero-shuffle `rdd.zip` (both gzip files are exactly
    * one partition each; unequal record counts fail the zip, which is the
    * right outcome for a truncated mate file). Mate ids are cross-checked
    * per record. bcl2fastq output carries only pass-filter reads, so
    * `passFilter = true`; the barcode lives in the sample sheet, not the
    * FASTQ, so it is left empty (the reference's PRQ drops it too). */
  def readMatePair(spark: SparkSession, mp: MatePair): Dataset[PrqRead] = {
    import spark.implicits._
    // the FASTQ DataSource V2 plans exactly one InputPartition per file
    // (the invariant the positional zip below depends on — with the text
    // composition it was only a gzip-unsplittability side effect)
    def readFastq(path: String) =
      spark.read.format("fastq").load(path)
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("seq"),
          org.apache.spark.sql.functions.col("qual"))
        .as[(String, String, String)]
    val r1 = readFastq(mp.r1)
    val r2 = readFastq(mp.r2)
    val sample = mp.sample
    val lane = mp.lane
    r1.rdd.zip(r2.rdd).map { case ((id1, s1, q1), (id2, s2, q2)) =>
      val id = normalizeReadId(id1)
      require(id == normalizeReadId(id2),
        s"mate id mismatch at the same record position: '$id1' vs '$id2'")
      PrqRead(id, sample, s1, q1, s2, q2, barcode = "",
        passFilter = true, lane = lane, tile = 0)
    }.toDS()
  }

  /** The whole baseline Stage-1: directory of mate files → one PrqRead
    * dataset (union keeps one partition per input file — no shuffle). Feed
    * it to `Codecs.writePartitionedGzip` + `Pipeline` stage 2 and the
    * baseline and BCL arms share everything downstream. */
  def toPrq(spark: SparkSession, fastqDir: String): Dataset[PrqRead] = {
    val pairs = discoverMatePairs(spark, fastqDir)
    require(pairs.nonEmpty, s"no paired fastq.gz mates found under $fastqDir")
    pairs.map(readMatePair(spark, _)).reduce(_ union _)
  }

  /** R19: the baseline's stage 2 — samples aligned ONE AT A TIME in sorted
    * order (`baseline_workflow.py:150-167`; the deliberate contrast to
    * `Pipeline.run`'s concurrent fan-out), each sample's aligned output
    * consumed and released before the next sample starts (`os.remove` at
    * `baseline_workflow.py:167` — here `onSampleDone`, the eager-cleanup
    * slot). Returns per-sample aligned line counts. */
  def runSequential(spark: SparkSession, fastqDir: String,
                    alignCmd: Seq[String],
                    onSampleDone: String => Unit = _ => ())
      : Map[String, Long] = {
    import spark.implicits._
    discoverMatePairs(spark, fastqDir).groupBy(_.sample).toSeq.sortBy(_._1)
      .map { case (sample, mps) =>
        val reads = mps.map(readMatePair(spark, _)).reduce(_ union _)
        val n = ExternalProcessMap.pipePartitions(
          reads.map(Codecs.toPrqLine), alignCmd).count()
        onSampleDone(sample)
        sample -> n
      }.toMap
  }
}
