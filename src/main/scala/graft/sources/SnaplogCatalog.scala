package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Column, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.SnapshotLog

/** Path-based [[TableCatalog]] for snapshot-log tables — the rung that
  * makes the log's versioned reads SQL-NATIVE. Register once:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.snap",
  *   "graft.sources.SnaplogCatalog")
  * }}}
  *
  * then SQL text addresses tables by path, Delta's `delta.`/path``
  * convention:
  *
  * {{{
  * SELECT * FROM snap.`/data/events` VERSION AS OF 3
  * SELECT * FROM snap.`/data/events` TIMESTAMP AS OF '2026-08-15 12:00:00'
  * INSERT INTO snap.`/data/events` SELECT ...
  * }}}
  *
  * `VERSION AS OF` resolves through the same entry reads as
  * `option("version", N)`; `TIMESTAMP AS OF` picks the highest version
  * whose log-entry mtime is ≤ the timestamp — mtimes are informational
  * (the log's ordering authority is the version number), so this is the
  * single-writer-clock convenience Delta's commit-timestamp resolution
  * also is, documented as such. `INSERT INTO` rides the table's write
  * path ([[SnaplogTable]]'s `V1Write` → `commitAppend`). DDL
  * (create/alter/drop/rename) is out of scope — tables are CREATED by
  * their first commit (API or `df.write.format("snaplog")`), and the
  * catalog fails those verbs loudly. */
class SnaplogCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def tableAt(ident: Identifier, version: Option[Int]): Table = {
    val path = pathOf(ident)
    val t = SnapshotLog.open(SparkSession.active, path, "__resolve")
    val latest = t.currentVersion()
    if (latest < 1)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    val v = version.getOrElse(latest)
    require(v >= 1 && v <= latest,
      s"version $v out of range [1, $latest] for $path")
    val key = t.keyOf(v).getOrElse(throw new IllegalArgumentException(
      s"legacy snaplog entry at $path carries no key column — " +
        "read it through the SnapshotTable API"))
    val schema = t.schemaOf(v).getOrElse(throw new IllegalArgumentException(
      s"snaplog entry $v at $path carries no schema (legacy table)"))
    new SnaplogTable(SparkSession.active, t, path, v, key, schema)
  }

  override def loadTable(ident: Identifier): Table = tableAt(ident, None)

  override def loadTable(ident: Identifier, version: String): Table =
    tableAt(ident, Some(version.toInt))

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    // timestamp arrives in MICROseconds since epoch (Spark's contract);
    // resolve to the newest version whose entry mtime is at or before it
    val path = pathOf(ident)
    val t = SnapshotLog.open(SparkSession.active, path, "__resolve")
    val latest = t.currentVersion()
    if (latest < 1)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    val tsMillis = timestamp / 1000L
    val v = (1 to latest).filter { i =>
      val p = java.nio.file.Paths.get(path, "_log", s"$i.json")
      java.nio.file.Files.exists(p) &&
        java.nio.file.Files.getLastModifiedTime(p).toMillis <= tsMillis
    }.lastOption.getOrElse(throw new IllegalArgumentException(
      s"no snaplog version of $path committed at or before " +
        s"timestamp $tsMillis ms (earliest retained entry is newer)"))
    tableAt(ident, Some(v))
  }

  override def tableExists(ident: Identifier): Boolean =
    SnapshotLog.open(SparkSession.active, pathOf(ident), "__resolve")
      .currentVersion() >= 1

  override def listTables(namespace: Array[String]): Array[Identifier] =
    throw new UnsupportedOperationException(
      "snaplog catalog is path-addressed; listing is not supported")

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "snaplog tables are created by their first commit " +
        "(SnapshotTable.commitAppend or df.write.format(\"snaplog\"))")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "snaplog schema evolution happens on append " +
        "(SnapshotTable.commitAppend widens add-only)")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "snaplog retention is explicit: SnapshotTable.vacuum")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "snaplog tables are path-addressed; move the directory")
}
