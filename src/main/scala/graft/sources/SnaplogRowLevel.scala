package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{SnapshotLog, SnapshotTable}

/** Group-based COPY-ON-WRITE row-level operation for snaplog tables —
  * the `SupportsRowLevelOperations` half of SQL-text DML (round 14):
  * `UPDATE`, `MERGE INTO`, and every `DELETE` whose condition the
  * metadata path can't translate, rewritten by Spark's own analyzer
  * rules (`RewriteUpdateTable`/`RewriteMergeIntoTable`/
  * `RewriteDeleteFromTable`) into a ReplaceData plan over THIS
  * operation's scan and write.
  *
  * The 100 TB contract is the same exact-file COW the API's
  * [[SnapshotTable.commitMerge]] has: the operation's SCAN receives the
  * command's condition via `GroupBasedRowLevelOperationScanPlanning`
  * (static pushdown) and matched-group keys via
  * `RowLevelOperationRuntimeGroupFiltering` (the scan's
  * SupportsRuntimeV2Filtering hook), so only files the condition may
  * touch are read and rewritten; the commit then swaps EXACTLY the
  * planned file set for the replacement
  * ([[SnapshotTable.commitStagedReplace]]), carrying every other live
  * file as metadata and conflict-pinning against the scanned version
  * (an interleaved commit throws, never a lost update).
  *
  * Scan capture: Spark builds scans through this operation both for the
  * main ReplaceData read and (when runtime group filtering fires) for
  * the matched-groups subquery. The scan whose files the commit must
  * replace is the one that received runtime filters — the subquery scan
  * never does — so the commit picks the runtime-filtered scan when one
  * exists and the first-built scan otherwise.
  *
  * MERGE additionally consolidates pending merge-on-read delete
  * sidecars to (old keys) minus (keys present in the replacement), so a
  * MERGE INSERT of a previously deleted key resurrects it — the
  * [[SnapshotTable.commitMerge]] contract. */
class SnaplogRowLevelOperation(spark: SparkSession, table: SnaplogTable,
    t: SnapshotTable, path: String, version: Int, keyCol: String,
    tableSchema: StructType, cmd: Command,
    cmap: Map[String, String] = Map.empty) extends RowLevelOperation {

  private val scans =
    new java.util.concurrent.CopyOnWriteArrayList[SnaplogScan]()

  override def command(): Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    table.scanBuilder(s => { scans.add(s); () }, rowLevel = true)

  /** `_file` is the group identity: Spark's rewrite reads it alongside
    * every row and its runtime group filtering collects the matched
    * files as a plain `_file IN (...)` the scan prunes EXACTLY on. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("_file"))

  /** The file set the committed replacement must swap out. */
  private[sources] def replacedFiles: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val built = scans.iterator().asScala.toSeq
    require(built.nonEmpty,
      s"row-level $cmd on $path committed before any scan was planned")
    val main = built.reverse.find(_.runtimeApplied).getOrElse(built.head)
    main.plannedFiles.getOrElse(throw new IllegalStateException(
      s"row-level $cmd on $path: the operation scan never planned " +
        "partitions — nothing defines the replaced file set"))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = replaceWrite(info)
    }

  private def replaceWrite(info: LogicalWriteInfo): Write =
    new Write {
      override def toBatch: BatchWrite = new BatchWrite {
        private val dir = s"$path/data/c-${UUID.randomUUID().toString}"

        override def createBatchWriterFactory(p: PhysicalWriteInfo)
            : DataWriterFactory = {
          // mapped tables: the replacement files carry the PHYSICAL
          // names so they splice next to the carried files
          val fileSchema = StructType(info.schema().fields.map(f =>
            f.copy(name = cmap.getOrElse(f.name, f.name))))
          SnaplogWriterFactory(dir, fileSchema, new SerializableHadoopConf(
            spark.sessionState.newHadoopConf()))
        }

        override def commit(messages: Array[WriterCommitMessage]): Unit = {
          val files = messages.flatMap {
            case SnaplogWriteMessage(fs) => fs
            case other => throw new IllegalStateException(
              s"unexpected commit message $other")
          }.toSeq
          val tw = SnapshotLog.open(spark, path, keyCol)
          tw.commitStagedReplace(dir, files, info.schema(),
            replacedFiles, base = version,
            op = s"sql-${cmd.toString.toLowerCase}",
            consolidateSidecar = cmd == Command.MERGE)
          ()
        }

        override def abort(messages: Array[WriterCommitMessage]): Unit = {
          val p = new Path(dir)
          p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
          ()
        }
      }

      override def description(): String = s"snaplog $path $cmd (COW)"
    }

  override def description(): String = s"snaplog $path $cmd (group-based COW)"
}
