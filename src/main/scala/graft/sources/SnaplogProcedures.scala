package graft.sources

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.SnapshotLog

/** SQL `CALL`-able MAINTENANCE procedures for snaplog tables — the
  * Iceberg/Delta procedure surface (round 14): the table-maintenance
  * verbs that have no ANSI DML spelling become SQL-native through the
  * catalog's [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]
  * hook:
  *
  * {{{
  * CALL snap.optimize(table => '/data/events', num_files => 16,
  *                    zorder => 'user_id,ts')
  * CALL snap.compact(table => 'events')      -- warehouse name works too
  * CALL snap.vacuum(table => 'events', retain_from => 7)
  * CALL snap.restore(table => 'events', version => 3)
  * CALL snap.history(table => 'events')
  * }}}
  *
  * Each procedure opens the table with the key column read from its
  * latest entry, runs the corresponding [[graft.operators.SnapshotTable]]
  * maintenance op (the same OCC/conflict semantics as the API — an
  * interleaved commit under optimize/compact still throws), and returns
  * its result as rows via a [[LocalScan]] (driver-metadata-sized:
  * versions, file counts — never data). `history` is DESCRIBE HISTORY
  * as a result set. */
private[sources] object SnaplogProcedures {

  val names: Seq[String] =
    Seq("optimize", "compact", "compact_files", "vacuum", "restore",
      "history", "detail", "clone")

  private def param(n: String, dt: DataType) =
    ProcedureParameter.in(n, dt).build()
  private def paramD(n: String, dt: DataType, default: String) =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  private def open(cat: SnaplogCatalog, table: String) = {
    val path = cat.resolvePath(table)
    val probe = SnapshotLog.open(SparkSession.active, path, "__resolve")
    val latest = probe.currentVersion()
    require(latest >= 1, s"empty snaplog table at $path")
    val key = probe.keyOf(latest).getOrElse(throw new IllegalArgumentException(
      s"legacy snaplog entry at $path carries no key column"))
    SnapshotLog.open(SparkSession.active, path, key)
  }

  private def result(schema: StructType, out: Seq[InternalRow])
      : java.util.Iterator[Scan] = {
    val materialized = out.toArray
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = materialized
    }
    Collections.singletonList(scan).iterator()
  }

  private def row(vals: Any*): InternalRow =
    new GenericInternalRow(vals.toArray)

  def load(cat: SnaplogCatalog, name: String): UnboundProcedure =
    name.toLowerCase match {
      case "optimize" => unbound("optimize",
        // `partition => 'col=value,col2=value2'` (round 15) scopes the
        // rewrite to the matching partition entries — Delta's
        // `OPTIMIZE t WHERE part = v`; empty = whole table
        Array(param("table", StringType), param("num_files", IntegerType),
          paramD("zorder", StringType, "''"),
          paramD("partition", StringType, "''")),
        new StructType().add("version", IntegerType, false)) { (in, _) =>
        val t = open(cat, in.getUTF8String(0).toString)
        val z = Option(in.getUTF8String(2)).map(_.toString).getOrElse("")
        val cols = z.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val part = Option(in.getUTF8String(3)).map(_.toString).getOrElse("")
        if (part.isEmpty) Seq(row(t.optimize(in.getInt(1), cols: _*)))
        else {
          val values = part.split(",").map(_.trim).filter(_.nonEmpty).map {
            kv =>
              val i = kv.indexOf('=')
              require(i > 0, s"partition spec '$kv' is not col=value")
              kv.substring(0, i).trim -> kv.substring(i + 1).trim
          }.toMap
          Seq(row(t.optimizePartition(values, in.getInt(1), cols: _*)))
        }
      }
      case "compact" => unbound("compact",
        Array(param("table", StringType)),
        new StructType().add("version", IntegerType, false)) { (in, _) =>
        Seq(row(open(cat, in.getUTF8String(0).toString).compact()))
      }
      case "compact_files" => unbound("compact_files",
        // small-file BIN-PACKING (round 16 — Delta's plain OPTIMIZE):
        // rewrite only files below small_bytes into ~target_bytes
        // outputs; right-sized files carry as metadata
        Array(param("table", StringType), param("small_bytes", LongType),
          paramD("target_bytes", LongType, (128L * 1024 * 1024).toString)),
        new StructType().add("version", IntegerType, false)) { (in, _) =>
        val t = open(cat, in.getUTF8String(0).toString)
        val target = if (in.isNullAt(2)) 128L * 1024 * 1024 else in.getLong(2)
        Seq(row(t.compactSmallFiles(in.getLong(1), target)))
      }
      case "vacuum" => unbound("vacuum",
        // two spellings (round 15): retain_from = oldest version to keep
        // (the log-native form), retain_hours = retention DURATION (the
        // Delta-runbook form — horizon resolved from logged commit times, the
        // newest version always kept). Exactly one must be given.
        Array(param("table", StringType),
          paramD("retain_from", IntegerType, "-1"),
          paramD("retain_hours", DoubleType, "-1.0"),
          paramD("dry_run", BooleanType, "false")),
        new StructType().add("files_removed", IntegerType, false)
          .add("entries_removed", IntegerType, false)) { (in, _) =>
        val t = open(cat, in.getUTF8String(0).toString)
        val retainFrom = if (in.isNullAt(1)) -1 else in.getInt(1)
        val retainHours = if (in.isNullAt(2)) -1.0 else in.getDouble(2)
        val dry = !in.isNullAt(3) && in.getBoolean(3)
        require((retainFrom >= 1) != (retainHours >= 0),
          "CALL vacuum needs exactly one of retain_from => <version> or " +
            "retain_hours => <duration>")
        val (f, e) =
          if (retainFrom >= 1) t.vacuum(retainFrom, dryRun = dry)
          else t.vacuumRetainHours(retainHours, dryRun = dry)
        Seq(row(f, e))
      }
      case "restore" => unbound("restore",
        // two spellings (round 16): version => N, or timestamp_ms => T
        // (Delta's RESTORE TO TIMESTAMP — resolved against the logged
        // commit times). Exactly one must be given.
        Array(param("table", StringType),
          paramD("version", IntegerType, "-1"),
          paramD("timestamp_ms", LongType, "-1")),
        new StructType().add("version", IntegerType, false)) { (in, _) =>
        val t = open(cat, in.getUTF8String(0).toString)
        val version = if (in.isNullAt(1)) -1 else in.getInt(1)
        val tsMs = if (in.isNullAt(2)) -1L else in.getLong(2)
        require((version >= 1) != (tsMs >= 0),
          "CALL restore needs exactly one of version => <n> or " +
            "timestamp_ms => <epoch millis>")
        Seq(row(if (version >= 1) t.restore(version)
          else t.restoreToTimestamp(tsMs)))
      }
      case "detail" => unbound("detail",
        // DESCRIBE DETAIL (round 15): one driver-metadata-sized row from
        // the latest entry alone — file/row/byte totals come from the
        // logged per-file stats, never a data scan or directory listing
        Array(param("table", StringType)),
        new StructType().add("version", IntegerType, false)
          .add("operation", StringType, false)
          .add("key_column", StringType, false)
          .add("data_entries", IntegerType, false)
          .add("num_files", IntegerType, false)
          .add("num_rows", LongType, true)
          .add("size_bytes", LongType, true)
          .add("delete_entries", IntegerType, false)
          .add("partitioned_entries", IntegerType, false)
          .add("constraints", IntegerType, false)
          .add("bloom_columns", IntegerType, false)
          .add("mapped_columns", IntegerType, false)
          .add("commit_time_ms", LongType, false)) { (in, _) =>
        val t = open(cat, in.getUTF8String(0).toString)
        val v = t.currentVersion()
        val e = t.readEntry(v)
        val rows = if (e.stats.nonEmpty && e.stats.forall(_.rows >= 0))
          java.lang.Long.valueOf(e.stats.map(_.rows).sum) else null
        val bytes = if (e.stats.nonEmpty && e.stats.forall(_.bytes >= 0))
          java.lang.Long.valueOf(e.stats.map(_.bytes).sum) else null
        Seq(row(v, UTF8String.fromString(t.opOf(v)),
          UTF8String.fromString(t.keyOf(v).getOrElse("")),
          e.data.size, e.stats.size, rows, bytes, e.deletes.size,
          e.pvals.size, e.constraints.size, e.bloomCols.size,
          e.cmap.size, t.commitTimeOf(v)))
      }
      case "clone" => unbound("clone",
        // SHALLOW CLONE via CALL (round 15 — Spark's parser has no
        // CREATE TABLE ... SHALLOW CLONE): one metadata publish copies
        // the snapshot listing/stats/schema/sidecars to `dest` (same
        // table addressing rules), zero data files move
        Array(param("table", StringType), param("dest", StringType)),
        new StructType().add("version", IntegerType, false)) { (in, _) =>
        val t = open(cat, in.getUTF8String(0).toString)
        val dest = cat.resolvePath(in.getUTF8String(1).toString)
        t.cloneTo(dest)
        Seq(row(1))
      }
      case "history" => unbound("history",
        Array(param("table", StringType)),
        new StructType().add("version", IntegerType, false)
          .add("operation", StringType, false)
          .add("data_entries", IntegerType, false)
          .add("delete_entries", IntegerType, false)
          .add("stat_files", IntegerType, false)) { (in, _) =>
        // DESCRIBE HISTORY: one row per retained version, driver-sized
        val t = open(cat, in.getUTF8String(0).toString)
        t.history().collect().toSeq.map(r =>
          row(r.getInt(0), UTF8String.fromString(r.getString(1)),
            r.getInt(2), r.getInt(3), r.getInt(4)))
      }
      case other => throw new IllegalArgumentException(
        s"unknown snaplog procedure '$other' " +
          s"(have: ${names.mkString(", ")})")
    }

  private def unbound(procName: String,
      params: Array[ProcedureParameter], outSchema: StructType)(
      body: (InternalRow, StructType) => Seq[InternalRow])
      : UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"snaplog $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"snaplog $procName"
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            result(outSchema, body(input, outSchema))
        }
    }

  def list(): Array[Identifier] =
    names.map(n => Identifier.of(Array.empty[String], n)).toArray
}
