package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}

/** V2 WRITE path for mate-split FASTQ — the write half of
  * `format("fastq")` (the read half is [[FastqDataSource]]): a pair
  * table with the PRQ columns (`sample, id, seq1, qual1, seq2, qual2`)
  * writes as per-sample R1/R2 4-line FASTQ files whose names follow the
  * reference baseline's filename grammar
  * (`<sample>_S<n>_L<lane>_R<1|2>_<part>.fastq.gz`,
  * reference baseline_workflow.py:109-117 — the baseline splits on `_`
  * and consumes parts[0] as the sample and parts[3] as the mate).
  *
  * Mate pairing is POSITIONAL (the baseline grammar's contract): each
  * writer task emits record i of a sample's R1 file and record i of its
  * R2 file from the same input row, so line 4i of R1 and R2 always hold
  * the two mates of one pair — `sorted positional pairing` downstream
  * (FastqBaseline.pairMates) reassembles pairs without ids matching.
  *
  * Same staged-commit protocol and scale shape as [[PrqWrite]]:
  * writer-requested clustering on `sample` (one shuffle the engine
  * plans, a handful of open gzip streams per task), staging + verified
  * rename commit, queryId-unique part names so cross-application
  * appends can never clobber. Truncate clears prior `*.fastq.gz` files
  * (the flat layout the baseline scans).
  */
object FastqWrite {
  val FieldOrder = Seq("id", "seq1", "qual1", "seq2", "qual2")

  /** parts[0] of the grammar IS the sample: a `_` or `/` inside the
    * sample name would shift the mate field the baseline reads, and a
    * leading `.` or `_` would make the file invisible to the engine's
    * own reader (listFiles skips hidden/metadata names) — silent data
    * loss on round-trip, so all four are rejected loudly. */
  def grammarSafe(sample: String): Boolean =
    sample.nonEmpty && !sample.contains('_') && !sample.contains('/') &&
      sample.charAt(0) != '.'
}

class FastqWriteBuilder(path: String, info: LogicalWriteInfo,
                        conf: SerializableHadoopConf)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val schema = info.schema()
    val missing = ("sample" +: FastqWrite.FieldOrder)
      .filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"fastq write requires columns sample,id,seq1,qual1,seq2,qual2; " +
      s"missing: ${missing.mkString(",")}")
    new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution =
        Distributions.clustered(Array(Expressions.identity("sample")))
      override def requiredOrdering(): Array[SortOrder] = Array.empty
      override def toBatch: StagedBatchWrite =
        new FastqBatchWrite(path, schema.fieldNames, conf,
          info.queryId(), doTruncate)
    }
  }
}

class FastqBatchWrite(path: String, fields: Array[String],
                      conf: SerializableHadoopConf, queryId: String,
                      truncate: Boolean)
    extends StagedBatchWrite(path, conf, queryId, truncate) {
  override protected def deletesOnTruncate(name: String): Boolean =
    name.endsWith(".fastq.gz")
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    FastqWriterFactory(stagingDir.toString, fields, conf, queryId)
}

case class FastqWriterFactory(stagingDir: String, fields: Array[String],
                              conf: SerializableHadoopConf, queryId: String)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val iSample = fields.indexOf("sample")
      private val Array(iId, iSeq1, iQual1, iSeq2, iQual2) =
        FastqWrite.FieldOrder.map(f => fields.indexOf(f)).toArray
      // sample -> ((R1 writer, R1 rel), (R2 writer, R2 rel))
      private val open = mutable.LinkedHashMap.empty[
        String, ((BufferedWriter, String), (BufferedWriter, String))]
      private val fs = new Path(stagingDir).getFileSystem(conf.value)

      private def openOne(sample: String, mate: Int): (BufferedWriter, String) = {
        // S/L fields are synthesized (the baseline consumes only
        // parts[0] and parts[3]); the trailing part carries the
        // queryId-task identity that makes the name application-unique
        val rel = f"${sample}_S1_L${partitionId + 1}%03d_R$mate%d_" +
          s"$queryId-$partitionId-$taskId.fastq.gz"
        val p = new Path(stagingDir, rel)
        fs.mkdirs(p.getParent)
        (new BufferedWriter(new OutputStreamWriter(
          new GZIPOutputStream(fs.create(p, true)),
          StandardCharsets.UTF_8)), rel)
      }

      private def writersFor(sample: String) =
        open.getOrElseUpdate(sample, {
          require(FastqWrite.grammarSafe(sample),
            s"fastq write: sample '$sample' breaks the filename grammar " +
            "(empty, or contains '_' or '/')")
          (openOne(sample, 1), openOne(sample, 2))
        })

      private def record(w: BufferedWriter, id: String, seq: String,
                         qual: String): Unit = {
        w.write('@'); w.write(id); w.write('\n')
        w.write(seq); w.write('\n')
        w.write('+'); w.write('\n')
        w.write(qual); w.write('\n')
      }

      private val consumed = (iSample +:
        Array(iId, iSeq1, iQual1, iSeq2, iQual2)).toArray

      override def write(row: InternalRow): Unit = {
        // null-check only the six consumed columns — extra columns ride
        // through untouched (and unwritten), they must not fail the job
        var i = 0
        while (i < consumed.length) {
          require(!row.isNullAt(consumed(i)),
            s"fastq write: null ${fields(consumed(i))}")
          i += 1
        }
        val ((w1, _), (w2, _)) = writersFor(row.getUTF8String(iSample).toString)
        val id = row.getUTF8String(iId).toString
        record(w1, id, row.getUTF8String(iSeq1).toString,
          row.getUTF8String(iQual1).toString)
        record(w2, id, row.getUTF8String(iSeq2).toString,
          row.getUTF8String(iQual2).toString)
      }

      override def commit(): WriterCommitMessage = {
        open.values.foreach { case ((w1, _), (w2, _)) => w1.close(); w2.close() }
        PrqCommit(open.values.flatMap { case ((_, r1), (_, r2)) =>
          Seq(r1, r2) }.toSeq)
      }

      override def abort(): Unit = {
        open.values.foreach { case ((w1, r1), (w2, r2)) =>
          try w1.close() catch { case _: Exception => () }
          try w2.close() catch { case _: Exception => () }
          fs.delete(new Path(stagingDir, r1), false)
          fs.delete(new Path(stagingDir, r2), false); ()
        }
      }

      override def close(): Unit = ()
    }
}
