package graft.sources

import java.io.{BufferedWriter, IOException, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** V2 WRITE path for the PRQ layout — the other half of the
  * `TableProvider` rung: `df.write.format("prq").mode(...).save(dir)`
  * produces exactly the `dir/sample=<s>/part-*.txt.gz` layout of
  * [[graft.genomics.Codecs.writePartitionedGzip]], with three things the
  * manual sink spelled by hand now owned by the engine:
  *
  *   - [[RequiresDistributionAndOrdering]] asks Spark to CLUSTER the
  *     input by `sample` before the writers run — the writer-requested
  *     shuffle replaces the manual `repartition(col("sample"), salt)`;
  *     each task then holds a handful of open gzip streams instead of
  *     one per (task × sample).
  *   - A staging-directory commit protocol: writers emit to
  *     `.spark-staging-<queryId>/`, the job-level commit verifies every
  *     staged file exists and only then publishes — a failed JOB never
  *     leaves half-written part files visible. TRUNCATE commits (round
  *     11) publish by MOVE-ASIDE + whole-entry rename: prior layout
  *     entries rename into `.spark-old-<queryId>/` (never deleted
  *     early), then each staged TOP-LEVEL entry (a whole `sample=` dir)
  *     renames into place, and only then is the old layout deleted.
  *     Staging is first PRUNED to the files the committed tasks vouched
  *     for, so partials from attempts that died without `abort()` are
  *     never published. A
  *     driver crash mid-commit can leave some samples briefly missing
  *     or stale, but NEVER permanently lost — every pre-commit byte
  *     sits intact in `.spark-old-*` until the final cleanup, so
  *     recovery is a rename back. The commit is still not one atomic
  *     operation (no POSIX multi-dir rename exists); the loss window,
  *     however, is now zero rather than rename-only.
  *   - SaveMode mapping: `append` adds part files; `overwrite` (via
  *     [[SupportsTruncate]]) replaces the previous layout. Part names
  *     embed the job's `queryId`, so appends from a second application
  *     can never collide with (and silently clobber) files committed by
  *     an earlier run.
  *
  * Scale note: one writer task per post-shuffle partition, each file a
  * sequential gzip stream — at 100 TB the writer width is the shuffle
  * partition count, and the per-sample fan-in is handled by the
  * clustered distribution, not driver coordination.
  */
object PrqWrite {
  val FieldOrder = Seq("id", "seq1", "qual1", "seq2", "qual2")
}

case class PrqCommit(files: Seq[String]) extends WriterCommitMessage

class PrqWriteBuilder(path: String, info: LogicalWriteInfo,
                      conf: SerializableHadoopConf)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val schema = info.schema()
    val missing = ("sample" +: PrqWrite.FieldOrder)
      .filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"prq write requires columns sample,id,seq1,qual1,seq2,qual2; " +
      s"missing: ${missing.mkString(",")}")
    new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution =
        Distributions.clustered(Array(Expressions.identity("sample")))
      override def requiredOrdering(): Array[SortOrder] = Array.empty
      override def toBatch: BatchWrite =
        new PrqBatchWrite(path, schema, conf, info.queryId(), doTruncate)
    }
  }
}

/** Shared staged-commit protocol for the line-format sinks (PRQ, FASTQ):
  * writers emit to `.spark-staging-<queryId>/`; job commit verifies every
  * staged file, then publishes. Truncate publishes by move-aside +
  * whole-entry rename (old bytes recoverable until the final cleanup);
  * append renames staged files into the live layout. See [[PrqWrite]]'s
  * scaladoc for the exact remaining window. */
abstract class StagedBatchWrite(path: String, conf: SerializableHadoopConf,
                                queryId: String, truncate: Boolean)
    extends BatchWrite {
  protected val stagingDir = new Path(path, s".spark-staging-$queryId")

  /** Which existing top-level entries an overwrite clears. */
  protected def deletesOnTruncate(name: String): Boolean

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    val staged = messages.flatMap {
      case PrqCommit(files) => files
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    // Verify every staged file before touching the existing layout — the
    // publish phase only starts once all of its inputs are known present.
    staged.foreach { rel =>
      val src = new Path(stagingDir, rel)
      if (!fs.exists(src))
        throw new IOException(s"staged-commit: staged file missing $src")
    }
    if (truncate) {
      // 0) prune staging to the VERIFIED set: a task attempt that died
      //    without running DataWriter.abort (executor JVM kill) leaves
      //    partial part files in staging that no commit message vouches
      //    for — the whole-entry rename in step 2 must not publish them.
      //    (The append branch below is per-verified-file and never could.)
      val stagedSet = staged.toSet
      if (fs.exists(stagingDir)) {
        val qStaging = fs.makeQualified(stagingDir)
        val files = fs.listFiles(qStaging, true)
        while (files.hasNext) {
          val st = files.next()
          val rel = qStaging.toUri.relativize(st.getPath.toUri).getPath
          if (!stagedSet.contains(rel)) fs.delete(st.getPath, false)
        }
        // a sample= dir whose only files were unverified is now empty —
        // publishing it would violate the no-empty-parts layout contract
        fs.listStatus(qStaging)
          .filter(st => st.isDirectory && fs.listStatus(st.getPath).isEmpty)
          .foreach(st => fs.delete(st.getPath, false))
      }
      // 1) move the prior layout ASIDE (rename, not delete — every old
      //    byte stays recoverable until step 3)
      val oldDir = new Path(path, s".spark-old-$queryId")
      if (fs.exists(root)) {
        val doomed = fs.listStatus(root)
          .filter(st => deletesOnTruncate(st.getPath.getName))
        if (doomed.nonEmpty) fs.mkdirs(oldDir)
        doomed.foreach { st =>
          val aside = new Path(oldDir, st.getPath.getName)
          if (!fs.rename(st.getPath, aside))
            throw new IOException(
              s"staged-commit: move-aside failed ${st.getPath} -> $aside")
        }
      }
      // 2) publish whole TOP-LEVEL staged entries (a full sample= dir is
      //    one rename, not one per part file)
      if (fs.exists(stagingDir)) fs.listStatus(stagingDir).foreach { st =>
        val dst = new Path(root, st.getPath.getName)
        if (!fs.rename(st.getPath, dst))
          throw new IOException(
            s"staged-commit: rename failed ${st.getPath} -> $dst")
      }
      // 3) only now drop the old layout
      fs.delete(oldDir, true)
    } else {
      staged.foreach { rel =>
        val src = new Path(stagingDir, rel)
        val dst = new Path(root, rel)
        fs.mkdirs(dst.getParent)
        if (!fs.rename(src, dst))
          throw new IOException(s"staged-commit: rename failed $src -> $dst")
      }
    }
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(conf.value)
    fs.delete(stagingDir, true)
  }
}

class PrqBatchWrite(path: String, schema: StructType,
                    conf: SerializableHadoopConf, queryId: String,
                    truncate: Boolean)
    extends StagedBatchWrite(path, conf, queryId, truncate) {
  override protected def deletesOnTruncate(name: String): Boolean =
    name.startsWith("sample=")
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    PrqWriterFactory(stagingDir.toString, schema.fieldNames, conf, queryId)
}

case class PrqWriterFactory(stagingDir: String, fields: Array[String],
                            conf: SerializableHadoopConf, queryId: String)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val iSample = fields.indexOf("sample")
      private val iFields = PrqWrite.FieldOrder.map(f => fields.indexOf(f)).toArray
      private val open = mutable.LinkedHashMap.empty[String, (BufferedWriter, String)]
      private val fs = new Path(stagingDir).getFileSystem(conf.value)

      private def writerFor(sample: String): BufferedWriter =
        open.getOrElseUpdate(sample, {
          val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(sample)
          // queryId (a UUID) makes the name unique across applications:
          // append from a second run can never regenerate a committed
          // filename and clobber it mid-rename.
          val rel = s"sample=$esc/part-$queryId-$partitionId-$taskId.txt.gz"
          val p = new Path(stagingDir, rel)
          fs.mkdirs(p.getParent)
          (new BufferedWriter(new OutputStreamWriter(
            new GZIPOutputStream(fs.create(p, true)),
            StandardCharsets.UTF_8)), rel)
        })._1

      override def write(row: InternalRow): Unit = {
        require(!row.isNullAt(iSample), "prq write: null sample")
        val w = writerFor(row.getUTF8String(iSample).toString)
        var i = 0
        while (i < iFields.length) {
          if (i > 0) w.write('\t')
          val f = iFields(i)
          require(!row.isNullAt(f),
            s"prq write: null ${PrqWrite.FieldOrder(i)}")
          w.write(row.getUTF8String(f).toString)
          i += 1
        }
        w.write('\n')
      }

      override def commit(): WriterCommitMessage = {
        open.values.foreach(_._1.close())
        PrqCommit(open.values.map(_._2).toSeq)
      }

      override def abort(): Unit = {
        open.values.foreach { case (w, rel) =>
          try w.close() catch { case _: Exception => () }
          fs.delete(new Path(stagingDir, rel), false); ()
        }
      }

      override def close(): Unit = ()
    }
}
