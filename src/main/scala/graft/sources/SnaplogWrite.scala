package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.operators.SnapshotLog

/** The snaplog DSv2 WRITE path (round 14 — replaces the round-13
  * `V1Write` fallback): executors stream [[InternalRow]]s straight into
  * snappy parquet part files inside a commit-unique data dir, and the
  * DRIVER publishes the snapshot-log entry from the reported file list
  * through the log's own OCC loop ([[graft.operators.SnapshotTable
  * .commitStaged]]) — footer stats, Bloom sidecars, CHECK constraints,
  * schema widening and the atomic version claim all included, so a
  * `df.write.format("snaplog")` append is indistinguishable in the log
  * from an API append.
  *
  * Task-retry safety without rename: writers use ATTEMPT-UNIQUE file
  * names (partition id + UUID) inside the commit dir and report exactly
  * the files their committed attempt wrote; the driver's commit sweeps
  * every unreported file (failed/speculative attempts) before the entry
  * publishes — the Delta pattern (write direct, track exact files),
  * which on object storage costs zero renames. An aborted JOB deletes
  * the whole staged dir; a torn driver leaves an unreferenced dir for
  * [[graft.operators.SnapshotTable.vacuum]].
  *
  * Streaming (`df.writeStream.format("snaplog")`) is exactly-once: each
  * epoch stages `data/s-<writeId>-e<epoch>`, and `commit(epochId, _)`
  * rides the log's `txn` action keyed by the QUERY id — a replayed
  * micro-batch (foreachBatch-style retry or restart from an older
  * checkpoint) cleans up its staged dir and commits nothing, the
  * [[graft.operators.SnapshotTable.commitAppendTxn]] contract moved
  * inside the connector.
  *
  * Scope matches the read side: flat long/int/double/float/boolean/
  * string schemas (loud error otherwise — the `SnapshotTable` API
  * remains the general path). */
object SnaplogWrite {
  private[sources] def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType =>
          b.addField(Types.optional(PrimitiveTypeName.INT64).named(f.name))
        case IntegerType =>
          b.addField(Types.optional(PrimitiveTypeName.INT32).named(f.name))
        case DoubleType =>
          b.addField(Types.optional(PrimitiveTypeName.DOUBLE).named(f.name))
        case FloatType =>
          b.addField(Types.optional(PrimitiveTypeName.FLOAT).named(f.name))
        case BooleanType =>
          b.addField(Types.optional(PrimitiveTypeName.BOOLEAN).named(f.name))
        case StringType =>
          b.addField(Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case dt => throw new IllegalArgumentException(
          s"snaplog DSv2 writes flat long/int/double/float/boolean/string " +
            s"columns; unsupported: ${f.name}:${dt.simpleString} — " +
            "use the SnapshotTable API for these")
      }
    }
    b.named("graft_snaplog")
  }
}

/** Row-by-row parquet writing of flat [[InternalRow]]s — the mirror of
  * the read side's [[SnaplogRowMaterializer]]; statistics (min/max/null
  * counts) come from parquet-hadoop for free, which is what the
  * driver-side footer lift turns into log stats. */
private[sources] class FlatWriteSupport(schema: StructType)
    extends WriteSupport[InternalRow] {
  private var rc: RecordConsumer = _
  private val mt = SnaplogWrite.messageType(schema)

  override def init(conf: Configuration): WriteSupport.WriteContext =
    new WriteSupport.WriteContext(
      mt, java.util.Collections.emptyMap[String, String]())
  override def prepareForWrite(r: RecordConsumer): Unit = rc = r

  override def write(row: InternalRow): Unit = {
    rc.startMessage()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val f = schema.fields(i)
        rc.startField(f.name, i)
        f.dataType match {
          case LongType    => rc.addLong(row.getLong(i))
          case IntegerType => rc.addInteger(row.getInt(i))
          case DoubleType  => rc.addDouble(row.getDouble(i))
          case FloatType   => rc.addFloat(row.getFloat(i))
          case BooleanType => rc.addBoolean(row.getBoolean(i))
          case StringType  => rc.addBinary(
            Binary.fromReusedByteArray(row.getUTF8String(i).getBytes))
          case dt => throw new IllegalStateException(dt.simpleString)
        }
        rc.endField(f.name, i)
      }
      i += 1
    }
    rc.endMessage()
  }
}

/** Files one committed writer attempt produced (empty for a zero-row
  * attempt — no empty part files ever land). */
case class SnaplogWriteMessage(files: Seq[String]) extends WriterCommitMessage

/** Writes one partition's rows to ONE attempt-unique part file in
  * `dir`, created lazily on the first row. */
private[sources] class SnaplogDataWriter(dir: String, schema: StructType,
    conf: Configuration) extends DataWriter[InternalRow] {

  private var file: String = _
  private var writer: ParquetWriter[InternalRow] = _

  private final class B(out: HadoopOutputFile)
      extends ParquetWriter.Builder[InternalRow, B](out) {
    override def self(): B = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new FlatWriteSupport(schema)
  }

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      file = s"$dir/part-${UUID.randomUUID().toString}.snappy.parquet"
      val p = new Path(file)
      p.getFileSystem(conf).mkdirs(p.getParent)
      writer = new B(HadoopOutputFile.fromPath(p, conf))
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    }
    writer.write(row)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    SnaplogWriteMessage(Option(file).toSeq)
  }

  override def abort(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    if (file != null) {
      val p = new Path(file)
      p.getFileSystem(conf).delete(p, false)
      ()
    }
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}

/** Batch factory: every task writes into the single commit dir. */
case class SnaplogWriterFactory(dir: String, schema: StructType,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new SnaplogDataWriter(dir, schema, conf.value)
}

/** Streaming factory: the epoch picks the staged dir, so however many
  * times Spark re-creates factories across micro-batches, an epoch's
  * files land in exactly one dir and `commit(epochId, _)` can stage and
  * sweep it deterministically. */
case class SnaplogStreamingWriterFactory(dirPrefix: String,
    schema: StructType, conf: SerializableHadoopConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new SnaplogDataWriter(s"$dirPrefix-e$epochId", schema, conf.value)
}

/** The table's write surface: batch append/overwrite + streaming
  * exactly-once append. One instance per planned write. */
class SnaplogWriteImpl(spark: SparkSession, path: String, keyCol: String,
    schema: StructType, queryId: String, truncate: Boolean,
    cmap: Map[String, String] = Map.empty,
    retired: Set[String] = Set.empty) extends Write {

  private def conf = new SerializableHadoopConf(
    spark.sessionState.newHadoopConf())

  // appends to a column-mapped table write PHYSICAL field names (rows
  // stay positionally identical); truncate REPLACES the table, so its
  // files carry the logical names and the commit resets the mapping
  private val writeCmap = if (truncate) Map.empty[String, String] else cmap
  private val fileSchema = StructType(schema.fields.map(f =>
    f.copy(name = writeCmap.getOrElse(f.name, f.name))))

  override def toBatch: BatchWrite = new BatchWrite {
    private val dir = s"$path/data/c-${UUID.randomUUID().toString}"

    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : DataWriterFactory = SnaplogWriterFactory(dir, fileSchema, conf)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.flatMap {
        case SnaplogWriteMessage(fs) => fs
        case other => throw new IllegalStateException(
          s"unexpected commit message $other")
      }.toSeq
      val t = SnapshotLog.open(spark, path, keyCol)
      t.commitStaged(dir, files, schema, overwrite = truncate,
        cmap = writeCmap, retired = if (truncate) Set.empty else retired)
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val p = new Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      ()
    }
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    // epoch dirs hang off one write-unique prefix; the queryId keys the
    // txn watermark so restarts of the same query dedupe across runs
    private val prefix = s"$path/data/s-${UUID.randomUUID().toString}"

    override def createStreamingWriterFactory(info: PhysicalWriteInfo)
        : StreamingDataWriterFactory =
      SnaplogStreamingWriterFactory(prefix, fileSchema, conf)

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.flatMap {
        case SnaplogWriteMessage(fs) => fs
        case other => throw new IllegalStateException(
          s"unexpected commit message $other")
      }.toSeq
      if (files.isEmpty) return // empty batch: replay is harmless, skip
      val t = SnapshotLog.open(spark, path, keyCol)
      t.commitStaged(s"$prefix-e$epochId", files, schema,
        txn = Some((s"snaplog-sink-$queryId", epochId)), cmap = writeCmap,
        retired = retired)
      ()
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val p = new Path(s"$prefix-e$epochId")
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      ()
    }
  }

  override def description(): String =
    s"snaplog $path ${if (truncate) "overwrite" else "append"}"
}
