package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.genomics._

/** The reference's ACTUAL vertical as one composed catalog entry
  * (R1→R10 end-to-end): synthetic BCL run → decode → chastity filter →
  * 1-mismatch demux → drop Undetermined → partitioned gzip PRQ sink →
  * sample discovery from the sink layout → per-sample external-process
  * mock alignment → SAM parse → per-sample digest. GenomicsSpec pins the
  * same stages with goldens; this entry additionally runs them under the
  * driver's per-round Verify/Bench eye like every other operator.
  *
  * Rows-only (no oracle SQL): the pipeline spans binary decode + an
  * external process, not SQL. Determinism contract: the fixture is a pure
  * function of cluster index ([[SyntheticRun]]), aligner positions derive
  * from read ids (partition-order independent), and the digest sorts
  * before hashing — identical rows every invocation.
  */
object GenomicsQueries {
  type Q = (org.apache.spark.sql.SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_genomics_e2e" -> ((s, _) => {
      val work = java.nio.file.Files.createTempDirectory("graft_e2e")
      val runDir = SyntheticRun.writeRun(work.resolve("run"))
      val aligner = SyntheticRun.writeMockAligner(work.resolve("align.sh"))
      val prqDir = work.resolve("prq").toString
      // stage 1 (R1–R8): decode → filter → demux → drop Undetermined →
      // partitioned gzip PRQ. Metadata-driven (round 12): ReadStructure
      // comes from the run's own RunInfo.xml and read names from the
      // .locs/.clocs cluster coordinates, as the reference's reader does
      // from a bare run dir (workflow.py:251 passes only root=)
      val reads = Demux.demux(
        Bcl.applyFilter(Bcl.decodeRun(s, runDir.toString)),
        SyntheticRun.sheet)
      Codecs.writePartitionedGzip(Demux.dropUndetermined(reads), prqDir)
      // R9: sample discovery from the sink's partition layout
      val samples = Codecs.listSamplePartitions(s, prqDir)
      // stage 2 (R10) + SAM parse: per-sample external process over the
      // SINK's bytes (round-trips the gzip codec), one frame per sample
      import s.implicits._
      val sam = samples.map { sample =>
        Sam.fromAligned(
          ExternalProcessMap.pipePartitions(
            Pipeline.readSamplePrq(s, prqDir, sample),
            Seq(aligner.toString))
          .map(sample -> _))
      }.reduce(_ unionByName _)
      // per-sample digest: mate counts, distinct reads, position mass,
      // and an order-insensitive md5 over the full records
      sam.groupBy(col("sample"))
        .agg(count(lit(1)).as("n_records"),
          count_distinct(col("qname")).as("n_reads"),
          sum(when(col("flag") === 99, 1L).otherwise(0L)).as("n_r1"),
          sum(col("pos")).as("pos_sum"),
          md5(concat_ws("|", sort_array(collect_list(
            concat_ws("\t", col("qname"), col("flag"), col("pos"),
              col("seq"), col("qual")))))).as("digest"))
        .orderBy(col("sample"))
    }))

  /** Non-SQL-expressible (binary decode + external process): rows-only. */
  val oracle: Map[String, String] = Map.empty
}
