package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{SnapshotLog, SnapshotTable}

/** Streaming change-feed source for [[graft.operators.SnapshotLog]]
  * tables — `spark.readStream.format("snapcdf").load(root)` — the custom
  * `MicroBatchStream` twin of [[graft.streaming.SnapshotCdf.backfill]]'s
  * file-source-over-`_log` composition, for the case where RATE CONTROL
  * matters: offsets are VERSIONS (one checkpointed long), and
  * `option("maxVersionsPerTrigger", n)` admits at most n commits per
  * micro-batch through [[SupportsAdmissionControl]] — the Delta-source
  * `maxFilesPerTrigger` role. A restart resumes from the checkpointed
  * version; `option("startVersion", v)` begins a fresh stream after
  * version v (0 = full backfill — every retained commit replays as
  * inserts).
  *
  * Emitted schema: the table's LOGGED schema (as of the stream's start)
  * plus `_change_type` (always `insert` here) and `cdf_version` (the
  * commit that produced the row). Each admitted version contributes
  * exactly its NEW data entries' files as input partitions — change-data
  * cost is bounded by what the commit wrote, never table size — read by
  * the same parquet assembly as the snaplog batch connector, with the
  * version's delete-sidecar keys applied in-reader so rows invisible at
  * that version never surface as inserts.
  *
  * Scope: APPEND-family commits (`append`, `txn-append` — the streaming
  * ingest shapes), plus MERGE and predicate-DML commits written with
  * `cdc = true` (commitMerge / commitDeleteWhere / commitUpdateWhere) —
  * those carry their exact change rows in a log-referenced sidecar
  * (Delta's `_change_data`) and are served verbatim, `delete`
  * pre-images included. Any other
  * delete/merge/overwrite commit in the admitted range fails LOUDLY —
  * its exact diff needs the batch `changes()` machinery — and the
  * [[graft.streaming.SnapshotCdf.backfill]] composition remains the
  * general path. Versions below a vacuum horizon fail loudly at
  * `readEntry` (resume from a retained version instead). */
object SnapCdfSource {
  private[sources] val ChangeTypeCol = "_change_type"
  private[sources] val VersionCol = "cdf_version"

  private[sources] def cdfSchema(table: StructType): StructType =
    StructType(table.fields ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(VersionCol, IntegerType, nullable = false)))
}

case class SnapCdfOffset(v: Int) extends Offset {
  override def json: String = s"""{"version":$v}"""
}

class SnapCdfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "snapcdf"
  override def supportsExternalMetadata(): Boolean = false

  private def open(options: util.Map[String, String]): SnapshotTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("snapcdf source requires a path"))
    SnapshotLog.open(SparkSession.active, path, "__resolve")
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val t = open(options)
    val latest = t.currentVersion()
    require(latest >= 1, "empty snaplog table — nothing to stream")
    SnapCdfSource.cdfSchema(t.schemaOf(latest).getOrElse(
      throw new IllegalArgumentException(
        "legacy snaplog entry carries no schema — use SnapshotCdf.backfill")))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val t = open(properties)
    val path = properties.get("path")
    val maxVersions = Option(properties.get("maxVersionsPerTrigger"))
      .map(_.toInt)
    val startVersion = Option(properties.get("startVersion"))
      .map(_.toInt).getOrElse(0)
    val endVersion = Option(properties.get("endVersion")).map(_.toInt)
    maxVersions.foreach(n => require(n >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $n"))
    val tableSchema = schema
    new Table with SupportsRead {
      override def name(): String = s"snapcdf:$path"
      override def schema(): StructType = tableSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
          TableCapability.BATCH_READ)
      override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = new Scan {
            override def readSchema(): StructType = tableSchema
            override def toMicroBatchStream(ckpt: String): MicroBatchStream =
              new SnapCdfStream(SparkSession.active, t, path, tableSchema,
                maxVersions, startVersion)
            // BATCH change-feed read (round 16 — Delta's
            // `readChangeFeed` + startingVersion/endingVersion):
            // `spark.read.format("snapcdf").option("startVersion", v)
            // .option("endVersion", w).load(root)` serves (v, w] with
            // the SAME per-version planning, admission rules, and
            // mapping translation as the stream — one distributed scan,
            // never a driver-side collect
            override def toBatch: Batch = {
              val live = t.currentVersion()
              val to = endVersion.getOrElse(live)
              require(to >= 1 && to <= live,
                s"endVersion $to out of [1, $live] for $path")
              require(startVersion >= 0 && startVersion <= to,
                s"startVersion $startVersion out of [0, $to] for $path")
              val stream = new SnapCdfStream(SparkSession.active, t, path,
                tableSchema, None, startVersion)
              new Batch {
                override def planInputPartitions(): Array[InputPartition] =
                  stream.planInputPartitions(
                    SnapCdfOffset(startVersion), SnapCdfOffset(to))
                override def createReaderFactory(): PartitionReaderFactory =
                  stream.createReaderFactory()
              }
            }
          }
        }
    }
  }
}

/** `tableMode = true` (round 15 — `spark.readStream.format("snaplog")`,
  * the Delta "table as an append stream" read): emit the table's PLAIN
  * rows (no `_change_type`/`cdf_version` columns, `emitSchema` already
  * column-pruned), and treat every row-CHANGING commit (delete, merge —
  * cdc or not — overwrite, DML, restore, replace-partitions) as a
  * change commit: fail loudly by default, or skip it entirely with
  * `option("skipChangeCommits", "true")` — Delta's option of the same
  * name. Append-family and metadata-only commits stream as in cdf mode.
  * `tableMode = false` is the snapcdf change feed (emitSchema = data
  * fields + the two CDF metadata columns). */
class SnapCdfStream(spark: SparkSession, t: SnapshotTable, root: String,
                    emitSchema: StructType, maxVersions: Option[Int],
                    startVersion: Int, tableMode: Boolean = false,
                    skipChangeCommits: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val dataFields =
    if (tableMode) emitSchema
    else StructType(emitSchema.fields.dropRight(2)) // minus the CDF cols

  // --- column-mapping resolution (round 16) -------------------------------
  // The stream's schema — and so its LOGICAL field names — is frozen at
  // construction; the table's files carry PHYSICAL names. Physical names
  // are RENAME-INVARIANT (a rename commits a new cmap, never touches
  // files), so the logical→physical translation resolves ONCE against
  // the mapping in force at the freeze version, and a rename landing
  // mid-stream cannot skew it. (Round 15 resolved per plan window via
  // `cmEnd.getOrElse(f.name, f.name)`: after a mid-stream rename the new
  // cmap no longer carried the stream's stale logical name, the fallback
  // probed the files for a column that only ever existed logically, and
  // every subsequent batch silently emitted NULL.)
  //
  // The only ops that CHANGE a column's physical name are whole-table
  // rewrites that materialize the mapping into the files — compact /
  // optimize / overwrite / restore. Those are refused outright in cdf
  // mode, and in table mode admitted only under skipChangeCommits, where
  // files on each side of the reset carry DIFFERENT physical names: the
  // resolution below walks the reset boundaries between the freeze
  // version and the planned version, so every version's files read under
  // the mapping in force when they were written (ADVICE r15 — the
  // end-of-window shortcut read pre-reset appends in a mixed window
  // under post-reset names).
  private val freezeVersion = t.currentVersion()
  private val frozenLogical: Seq[String] = dataFields.fieldNames.toSeq
  private val cmapCache =
    scala.collection.concurrent.TrieMap.empty[Int, Map[String, String]]
  private val opCache =
    scala.collection.concurrent.TrieMap.empty[Int, String]
  private def cmapOf(v: Int): Map[String, String] =
    if (v < 1) Map.empty
    else cmapCache.getOrElseUpdate(v, t.readEntry(v).cmap)
  private def opOfCached(v: Int): String =
    opCache.getOrElseUpdate(v, t.opOf(v))
  private val alterFamily =
    Set("rename-column", "drop-column", "add-column", "alter-table")
  /** Did version `v` rewrite files under a new mapping? Alter-family ops
    * change the cmap but keep physical names invariant; any OTHER op
    * whose cmap differs from its parent's rewrote the files (compact/
    * optimize/overwrite reset it to identity, restore re-points at an
    * older mapping). */
  private def isMapReset(v: Int): Boolean =
    v >= 2 && !alterFamily(opOfCached(v)) && cmapOf(v) != cmapOf(v - 1)
  private def invert(m: Map[String, String], phys: String): String =
    m.collectFirst { case (l, p) if p == phys => l }.getOrElse(phys)

  /** PHYSICAL (in-file) name of each stream field for files written at
    * version `v` — Nil when identity (readers skip the rename). Resolved
    * from the freeze-version mapping, then walked across any mapping-
    * reset boundary between `v` and the freeze version: crossing a reset
    * at `r` forward maps physical→logical through cmap(r−1) and back to
    * physical through cmap(r) (logical names carry across a rewrite);
    * crossing backward inverts. All lookups are memoized log-entry reads
    * — no data is touched. */
  private[sources] def physNamesAt(v: Int): Seq[String] = {
    val cmF = cmapOf(freezeVersion)
    var phys = frozenLogical.map(c => cmF.getOrElse(c, c))
    if (v > freezeVersion) {
      var r = freezeVersion + 1
      while (r <= v) {
        if (isMapReset(r)) {
          val before = cmapOf(r - 1); val after = cmapOf(r)
          phys = phys.map { p =>
            val l = invert(before, p); after.getOrElse(l, l)
          }
        }
        r += 1
      }
    } else if (v < freezeVersion) {
      var r = freezeVersion
      while (r > v) {
        if (isMapReset(r)) {
          val before = cmapOf(r - 1); val after = cmapOf(r)
          phys = phys.map { p =>
            val l = invert(after, p); before.getOrElse(l, l)
          }
        }
        r -= 1
      }
    }
    if (phys == frozenLogical) Nil else phys
  }

  // Trigger.AvailableNow: drain exactly what was committed at start (in
  // maxVersionsPerTrigger-sized batches), then terminate
  @volatile private var availableNowTarget: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(t.currentVersion())

  override def initialOffset(): Offset = SnapCdfOffset(startVersion)

  override def deserializeOffset(json: String): Offset =
    SnapCdfOffset(SnapshotLog.Json.readTree(json).get("version").asInt())

  override def getDefaultReadLimit: ReadLimit =
    maxVersions.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called (admission control)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SnapCdfOffset].v
    val live = t.currentVersion()
    val latest = availableNowTarget.fold(live)(math.min(_, live))
    val capped = limit match {
      case r: ReadMaxRows => math.min(latest.toLong, s + r.maxRows()).toInt
      case _              => latest
    }
    SnapCdfOffset(math.max(s, capped))
  }

  override def reportLatestOffset(): Offset = SnapCdfOffset(t.currentVersion())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapCdfOffset].v
    val e = end.asInstanceOf[SnapCdfOffset].v
    // column-mapped tables: files carry PHYSICAL names; the stream emits
    // LOGICAL ones. Each version's partitions resolve their own physical
    // names via physNamesAt (per-version, reset-boundary-aware — see the
    // field's scaladoc). The key column is never mapped (rename refuses
    // it).
    val parts = Array.newBuilder[InputPartition]
    for (v <- (s + 1) to e) {
      val op = t.opOf(v)
      val entry = t.readEntry(v)
      val physNames = physNamesAt(v)
      // a TYPE widening MID-STREAM (after the schema froze) cannot be
      // represented (the frozen narrow slots would truncate the wide
      // values later appends carry) nor skipped (same reason): fail
      // loudly even under skipChangeCommits — a restart re-freezes on
      // the widened schema and old files upcast on read. A widen in the
      // BACKFILL range (v ≤ freeze) is harmless: the frozen schema is
      // already the wide one and pre-widen files upcast per slot.
      // Batched alters are probed by comparing shared-field types.
      if (v > freezeVersion && (op == "widen-column" || op == "alter-table")) {
        for (ps <- t.schemaOf(v - 1); cs <- t.schemaOf(v)) {
          val prevBy = ps.fields.map(f => f.name -> f.dataType).toMap
          val widened = cs.fields
            .filter(f => prevBy.get(f.name).exists(_ != f.dataType))
          require(widened.isEmpty,
            s"version $v widened column(s) ${widened.map(_.name).mkString(", ")} " +
              "mid-stream — the stream's schema froze at the narrow " +
              "type; restart the stream to pick up the widened schema " +
              "(old files upcast on read)")
        }
      }
      val appendFamily = op == "append" || op == "txn-append" ||
        op == "add-constraint" || op == "drop-constraint" ||
        op == "set-bloom" || op == "rename-column" ||
        op == "drop-column" || op == "add-column" ||
        op == "alter-table" || op == "widen-column" || op == "create" ||
        (op == "clone" && v == 1)
      if (tableMode && !appendFamily) {
        // the TABLE stream has no change-row vocabulary: a row-changing
        // commit either skips whole (Delta's skipChangeCommits) or
        // fails loudly pointing at the two exact-diff surfaces
        require(skipChangeCommits,
          s"snaplog table stream reads append-family commits; version " +
            s"$v is '$op' — set option(\"skipChangeCommits\", " +
            "\"true\") to skip change commits, or stream the exact " +
            "diff via format(\"snapcdf\") / SnapshotCdf.backfill")
      } else if (!tableMode && entry.cdc.isDefined &&
          (op == "merge" || op == "delete-where" || op == "update-where")) {
        // a CDF-enabled merge or predicate DML (commitMerge/
        // commitDeleteWhere/commitUpdateWhere with cdc = true)
        // materialized its exact change rows — serve them verbatim,
        // types included (the sidecar carries the same physical names
        // as the data files)
        for (f <- t.dataFilesOf(entry.cdc.get))
          parts += SnapCdfPartition(f, v, typed = true, physNames)
      } else {
        // metadata-only commits (constraint/bloom/schema-alter changes)
        // admit cleanly and contribute no rows; a clone's v1 is a pure
        // backfill (all inherited files surface as inserts). Ops that
        // REMOVE rows (delete/merge/overwrite/restore/replace-partitions)
        // fail loudly.
        require(appendFamily,
          s"snapcdf streams append-family commits (and merge/DELETE " +
            s"WHERE/UPDATE WHERE commits with cdc = true); version $v " +
            s"is '$op' — use SnapshotCdf.backfill for exact diffs of " +
            "other history")
        val prev = if (v == 1) Set.empty[String]
          else t.readEntry(v - 1).data.toSet
        for (d <- entry.data if !prev.contains(d); f <- t.dataFilesOf(d))
          parts += SnapCdfPartition(f, v, typed = false, physNames)
      }
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // one delete-key set per version could differ; the admitted window is
    // maxVersions-bounded and sidecars are key-count-sized by contract
    val latest = t.currentVersion()
    val keyCol = t.keyOf(latest).getOrElse(
      throw new IllegalArgumentException("legacy snaplog entry has no key"))
    val needKey = !dataFields.fieldNames.contains(keyCol)
    SnapCdfReaderFactory(dataFields, keyCol, needKey,
      root, new SerializableHadoopConf(spark.sessionState.newHadoopConf()),
      meta = !tableMode)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** `physNames` — the in-file (physical) name of each data field,
  * positionally; empty = identity (unmapped table). */
case class SnapCdfPartition(file: String, version: Int,
                            typed: Boolean = false,
                            physNames: Seq[String] = Nil)
    extends InputPartition

/** Per-file reader: the snaplog parquet assembly plus the two appended
  * CDF metadata columns. The version's delete-sidecar keys load lazily
  * ON THE EXECUTOR (one small parquet read via hadoop, key-count-sized)
  * so the factory stays a thin serializable shell. */
case class SnapCdfReaderFactory(dataFields: StructType, keyCol: String,
                                needKey: Boolean, root: String,
                                conf: SerializableHadoopConf,
                                meta: Boolean = true)
    extends PartitionReaderFactory {

  /** The fields to request FROM THE FILE: the stream's data fields with
    * each name swapped for its physical (in-file) spelling when the
    * table is column-mapped. Output stays positional, so the emitted
    * schema is untouched. */
  private def physFields(p: SnapCdfPartition): StructType =
    if (p.physNames.isEmpty) dataFields
    else StructType(dataFields.fields.zip(p.physNames).map {
      case (f, n) => f.copy(name = n)
    })

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapCdfPartition]
    if (p.typed) return typedReader(p) // cdc sidecar: change rows verbatim
    // resolve the version's delete sidecars from its entry — executor-
    // local raw JSON reads (no SparkSession out here). Round 14: entries
    // may be DELTAS; the sidecar list resolves by walking the base chain
    // down to the nearest FULL entry (≤ checkpointInterval small reads)
    // and replaying delRemove/delAdd oldest-first.
    val fs = new org.apache.hadoop.fs.Path(s"$root/_log")
      .getFileSystem(conf.value)
    def parseTree(ver: Int): com.fasterxml.jackson.databind.JsonNode = {
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$root/_log/$ver.json"))
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
        SnapshotLog.Json.readTree(bos.toString("UTF-8"))
      } finally in.close()
    }
    def arr(t: com.fasterxml.jackson.databind.JsonNode,
        field: String): Seq[String] = Option(t.get(field)).map { n =>
      val b = Seq.newBuilder[String]
      n.elements().forEachRemaining(e => b += e.asText())
      b.result()
    }.getOrElse(Nil)
    var chain = List(parseTree(p.version)) // full entry first, then deltas
    while (chain.head.has("base"))
      chain ::= parseTree(chain.head.get("base").asInt())
    val delDirs = chain.tail.foldLeft(arr(chain.head, "deletes")) {
      (dels, t) =>
        val rm = arr(t, "delRemove").toSet
        dels.filterNot(rm) ++ arr(t, "delAdd")
    }
    val deletedKeys: Array[Any] =
      if (delDirs.isEmpty) Array.empty
      else readSidecarKeys(delDirs, fs)
    val readFields =
      if (needKey && deletedKeys.nonEmpty)
        StructType(physFields(p).fields :+ keyFieldOf())
      else physFields(p)
    val keyIdx =
      if (deletedKeys.isEmpty) -1 else readFields.fieldNames.indexOf(keyCol)
    val inner = new SnaplogFileReader(p.file, readFields, dataFields.size,
      keyIdx, deletedKeys, conf.value)
    val insertU = UTF8String.fromString("insert")
    val extra = if (meta) 2 else 0
    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = {
        val r = inner.get()
        val out = new Array[Any](dataFields.size + extra)
        var i = 0
        while (i < dataFields.size) {
          out(i) = if (r.isNullAt(i)) null
            else r.get(i, dataFields.fields(i).dataType)
          i += 1
        }
        if (meta) {
          out(dataFields.size) = insertU
          out(dataFields.size + 1) = p.version
        }
        new GenericInternalRow(out)
      }
      override def close(): Unit = inner.close()
    }
  }

  /** Reader for a cdc-sidecar file: rows already carry their
    * `_change_type` — decode it as a data column, append the version,
    * and apply NO delete filtering (change records are exact). */
  private def typedReader(p: SnapCdfPartition): PartitionReader[InternalRow] = {
    val readFields = StructType(physFields(p).fields :+
      StructField(SnapCdfSource.ChangeTypeCol, StringType, nullable = true))
    val inner = new SnaplogFileReader(p.file, readFields, readFields.size,
      -1, Array.empty, conf.value)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = {
        val r = inner.get()
        val out = new Array[Any](dataFields.size + 2)
        var i = 0
        while (i < dataFields.size) {
          out(i) = if (r.isNullAt(i)) null
            else r.get(i, dataFields.fields(i).dataType)
          i += 1
        }
        out(dataFields.size) =
          if (r.isNullAt(dataFields.size)) null
          else r.getUTF8String(dataFields.size)
        out(dataFields.size + 1) = p.version
        new GenericInternalRow(out)
      }
      override def close(): Unit = inner.close()
    }
  }

  private def keyFieldOf(): StructField =
    dataFields.fields.find(_.name == keyCol).getOrElse(
      // key evolved out of the projected schema shape: default to long
      StructField(keyCol, LongType, nullable = true))

  /** Distinct sidecar keys via the snaplog parquet assembly (no session
    * on executors) — sidecars are single-column, key-count-sized. */
  private def readSidecarKeys(dirs: Seq[String],
      fs: org.apache.hadoop.fs.FileSystem): Array[Any] = {
    val keyField = keyFieldOf()
    val acc = new java.util.HashSet[Any]()
    for (d <- dirs) {
      val dp = new org.apache.hadoop.fs.Path(d)
      val files = fs.listStatus(dp).filter(_.isFile)
        .map(_.getPath.toString)
        .filterNot { f =>
          val n = f.substring(f.lastIndexOf('/') + 1)
          n.startsWith("_") || n.startsWith(".")
        }
      for (f <- files) {
        val rdr = new SnaplogFileReader(f, StructType(Seq(keyField)), 1,
          -1, Array.empty, conf.value)
        try {
          while (rdr.next()) {
            val r = rdr.get()
            if (!r.isNullAt(0)) {
              keyField.dataType match {
                case LongType    => acc.add(java.lang.Long.valueOf(r.getLong(0)))
                case IntegerType =>
                  acc.add(java.lang.Long.valueOf(r.getInt(0).toLong))
                case StringType  => acc.add(r.getUTF8String(0).toString)
                case dt => throw new IllegalArgumentException(
                  s"unsupported snapcdf key type ${dt.simpleString}")
              }
              ()
            }
          }
        } finally rdr.close()
      }
    }
    acc.toArray.map(x => x: Any)
  }
}
