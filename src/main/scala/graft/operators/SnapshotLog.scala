package graft.operators

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Minimal snapshot-log table format — the three read-side primitives a
  * Delta/Iceberg transaction log provides (versioned snapshots, time
  * travel, merge-on-read deletes), on plain parquet plus a JSON-lines
  * log. Complements the other table-maintenance operators here: the
  * z-order [[LayoutOps.skippingManifest]] is the per-file stats half of
  * such a log, [[Maintenance.compactParquet]] its rewrite half, and
  * [[graft.streaming.CdcApply]] its streaming writer; this object is the
  * versioned-read half.
  *
  * Layout: `<table>/data/v<N>/part-*.parquet` (one directory per commit),
  * `<table>/_log/<N>.json` with
  * `{"version":N,"data":[dirs alive],"deletes":[dirs alive]}`. The log
  * entry is a FULL snapshot listing (not a delta), so resolving any
  * version is one file read — log entries are snapshot-count-sized driver
  * metadata, exactly like a Delta checkpoint.
  *
  * Merge-on-read deletes: a delete commit writes the doomed KEYS as a
  * parquet sidecar and a log entry keeping the data dirs untouched;
  * readers apply one (broadcast-sized) anti-join. Write cost is key-count
  * proportional, data files are never rewritten until
  * [[SnapshotTable.compact]] folds the deletes in (the deletion-vector
  * pattern). At 100 TB: commits move only NEW data, deletes move only
  * keys, and the log keeps every reader one JSON read away from a
  * consistent file set.
  */
object SnapshotLog {
  def open(spark: SparkSession, root: String, keyCol: String): SnapshotTable =
    new SnapshotTable(spark, root, keyCol)
}

final class SnapshotTable(spark: SparkSession, root: String, keyCol: String) {
  private val logDir = Paths.get(root, "_log")

  private def entryPath(v: Int): Path = logDir.resolve(s"$v.json")

  /** Latest committed version, or 0 when the table is empty. */
  def currentVersion(): Int =
    if (!Files.isDirectory(logDir)) 0
    else Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toInt).foldLeft(0)(math.max)

  private def readEntry(v: Int): (Seq[String], Seq[String]) = {
    val txt = Files.readString(entryPath(v))
    def arr(field: String): Seq[String] = {
      val m = (s""""$field":\\[([^\\]]*)\\]""").r.findFirstMatchIn(txt)
      m.map(_.group(1).split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    }
    (arr("data"), arr("deletes"))
  }

  private def writeEntry(v: Int, data: Seq[String], deletes: Seq[String]): Unit = {
    Files.createDirectories(logDir)
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    Files.writeString(entryPath(v),
      s"""{"version":$v,"data":${arr(data)},"deletes":${arr(deletes)}}""")
  }

  private def newDataDir(v: Int) = s"$root/data/v$v"
  private def newDeleteDir(v: Int) = s"$root/deletes/v$v"

  /** Append `df` as a new snapshot; returns the new version. */
  def commitAppend(df: DataFrame): Int = {
    val v = currentVersion() + 1
    val (data, deletes) = if (v == 1) (Nil, Nil) else readEntry(v - 1)
    df.write.mode("errorifexists").parquet(newDataDir(v))
    writeEntry(v, data :+ newDataDir(v), deletes)
    v
  }

  /** Replace the table's contents with `df` (drops prior delete sidecars
    * too — they referred to replaced data). */
  def commitOverwrite(df: DataFrame): Int = {
    val v = currentVersion() + 1
    df.write.mode("errorifexists").parquet(newDataDir(v))
    writeEntry(v, Seq(newDataDir(v)), Nil)
    v
  }

  /** Merge-on-read delete: write `keys` (one column, matching `keyCol`)
    * as a sidecar; data files stay untouched. */
  def commitDelete(keys: DataFrame): Int = {
    val v = currentVersion() + 1
    require(v > 1, "delete on an empty table")
    val (data, deletes) = readEntry(v - 1)
    keys.select(col(keys.columns.head).as(keyCol))
      .write.mode("errorifexists").parquet(newDeleteDir(v))
    writeEntry(v, data, deletes :+ newDeleteDir(v))
    v
  }

  /** Read the table at `version` (default: latest). One log-entry read
    * resolves the file set; deletes apply as a broadcast anti-join. */
  def read(version: Int = -1): DataFrame = {
    val latest = currentVersion()
    require(latest >= 1, s"empty table at $root")
    val v = if (version < 0) latest else version
    require(v >= 1 && v <= latest,
      s"version $v out of range [1, $latest] for $root")
    val (data, deletes) = readEntry(v)
    val base = spark.read.parquet(data: _*)
    if (deletes.isEmpty) base
    else base.join(
      broadcast(spark.read.parquet(deletes: _*).select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")
  }

  /** Fold delete sidecars into the data (the deletion-vector compaction):
    * materializes the current view as one overwrite commit. */
  def compact(): Int = commitOverwrite(read())
}
