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
  * `{"version":N,"data":[dirs alive],"deletes":[dirs alive],
  * "stats":[{f,lo,hi} per part file]}`. The log entry is a FULL snapshot
  * listing (not a delta), so resolving any version is one file read —
  * log entries are snapshot-count-sized driver metadata, exactly like a
  * Delta checkpoint. Since round 12 the entry also carries per-file
  * min/max stats of `keyCol` (computed once at commit time), so
  * [[SnapshotTable.readRange]] skips files from the LOG alone — data
  * skipping that stays correct at every time-travel version, the stats
  * half [[LayoutOps.skippingManifest]] keeps outside the log.
  *
  * Merge-on-read deletes: a delete commit writes the doomed KEYS as a
  * parquet sidecar and a log entry keeping the data dirs untouched;
  * readers apply one (broadcast-sized) anti-join. Write cost is key-count
  * proportional, data files are never rewritten until
  * [[SnapshotTable.compact]] folds the deletes in (the deletion-vector
  * pattern). At 100 TB: commits move only NEW data, deletes move only
  * keys, and the log keeps every reader one JSON read away from a
  * consistent file set.
  *
  * Multi-writer safety (round 11 — the Delta/Iceberg single-table
  * multi-writer contract): data/sidecar dirs are named by a commit UUID
  * (never by version, so two in-flight writers can't clobber payloads),
  * and the version claim is an atomic PUBLISH-IF-ABSENT of
  * `_log/<N>.json` — write a temp file, then `Files.createLink` it to
  * the target (link(2) fails with EEXIST atomically; filesystems
  * without hard links fall back to a documented check-then-atomic-move).
  * On collision the loser re-reads the new latest snapshot, REBASES its
  * listing (append/delete compose with whatever won), and retries; after
  * `maxCommitRetries` losses it throws `ConcurrentModificationException`
  * loudly rather than spinning. A torn writer (died after data write,
  * before publish) leaves an unreferenced data dir — never a corrupt
  * log entry, because entries appear only via the atomic link.
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

  /** Per-file key stats carried IN the log entry (round 12): (file,
    * min(keyCol), max(keyCol)) for every part file of every live data
    * dir — the Delta/Iceberg pattern where data skipping works at ANY
    * time-travel version because the stats are versioned with the
    * snapshot, not rebuilt from the live layout. */
  private[operators] case class FileStat(file: String, lo: Long, hi: Long)

  private val StatRe =
    """\{"f":"([^"]+)","lo":(-?\d+),"hi":(-?\d+)\}""".r

  private def readEntry(v: Int): (Seq[String], Seq[String], Seq[FileStat]) = {
    val txt = Files.readString(entryPath(v))
    def arr(field: String): Seq[String] = {
      val m = (s""""$field":\\[([^\\]]*)\\]""").r.findFirstMatchIn(txt)
      m.map(_.group(1).split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    }
    val stats = StatRe.findAllMatchIn(txt)
      .map(m => FileStat(m.group(1), m.group(2).toLong, m.group(3).toLong))
      .toSeq
    (arr("data"), arr("deletes"), stats)
  }

  /** min/max of `keyCol` per part file of a freshly written data dir —
    * one small Spark job per commit (file-count-sized result). Stats are
    * collected only for integral key types; for anything else the entry
    * carries none and reads fall back to scanning every file (correct,
    * just unpruned). Files whose keys are all NULL get no stats row and
    * are likewise always scanned. */
  private def statsFor(dir: String): Seq[FileStat] = {
    import org.apache.spark.sql.types._
    val df = spark.read.parquet(dir)
    val integral = df.schema.fields.find(_.name == keyCol).map(_.dataType)
      .exists {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    if (!integral) Nil
    else df.groupBy(input_file_name().as("f"))
      .agg(min(col(keyCol)).cast("long").as("lo"),
           max(col(keyCol)).cast("long").as("hi"))
      .collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => FileStat(r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  /** Atomically publish `_log/<v>.json` if and only if no writer claimed
    * `v` first. The temp file is hard-linked to the target — link(2)
    * fails with EEXIST atomically, so exactly one concurrent publisher
    * of a version wins. Filesystems without hard-link support fall back
    * to exists-check + ATOMIC_MOVE (a small check-to-move window — the
    * documented weaker mode; every POSIX/HDFS-local deployment takes the
    * link path). Returns false on collision. */
  private[operators] def publishEntry(
      v: Int, data: Seq[String], deletes: Seq[String],
      stats: Seq[FileStat] = Nil): Boolean = {
    Files.createDirectories(logDir)
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val statArr = stats
      .map(s => s"""{"f":"${s.file}","lo":${s.lo},"hi":${s.hi}}""")
      .mkString("[", ",", "]")
    val tmp = logDir.resolve(
      s".commit-${java.util.UUID.randomUUID().toString}.tmp")
    Files.writeString(tmp,
      s"""{"version":$v,"data":${arr(data)},"deletes":${arr(deletes)},""" +
        s""""stats":$statArr}""")
    try {
      try { Files.createLink(entryPath(v), tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          if (Files.exists(entryPath(v))) false
          else {
            // ATOMIC_MOVE is NOT a CAS: on providers where it maps to
            // rename(2) a racer inside the check-to-move window is
            // silently REPLACED (lost update — the documented weaker
            // mode); providers that do check existence throw instead,
            // which must surface as "lost the race", not an abort, so
            // the commit loop can rebase and retry.
            try {
              Files.move(tmp, entryPath(v),
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              true
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => false
            }
          }
      }
    } finally { Files.deleteIfExists(tmp); () }
  }

  /** Losing more than this many version races in one commit call throws —
    * a pathological writer storm should surface, not spin. */
  val maxCommitRetries = 20

  /** Optimistic-concurrency commit loop: compose the entry against the
    * CURRENT latest version, publish-if-absent, rebase and retry on
    * collision. `compose` sees the version it is trying to claim. */
  private def commitWithRetry(
      compose: Int => (Seq[String], Seq[String], Seq[FileStat])): Int = {
    var attempt = 0
    while (attempt <= maxCommitRetries) {
      val v = currentVersion() + 1
      val (data, deletes, stats) = compose(v)
      if (publishEntry(v, data, deletes, stats)) return v
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost $maxCommitRetries version races committing to $root — " +
        "a concurrent writer storm is claiming every version; retry or " +
        "serialize the writers")
  }

  private def newDataDir() =
    s"$root/data/c-${java.util.UUID.randomUUID().toString}"
  private def newDeleteDir() =
    s"$root/deletes/c-${java.util.UUID.randomUUID().toString}"

  /** Append `df` as a new snapshot; returns the committed version. Safe
    * under concurrent writers: the data dir is commit-unique, the version
    * claim is atomic, and on collision the listing REBASES onto the
    * winner's snapshot (append commutes with any committed change). */
  def commitAppend(df: DataFrame): Int = {
    val dir = newDataDir()
    df.write.mode("errorifexists").parquet(dir)
    val newStats = statsFor(dir)
    commitWithRetry { v =>
      val (data, deletes, stats) =
        if (v == 1) (Nil, Nil, Nil) else readEntry(v - 1)
      // stats ride the rebase: the winner's per-file stats are re-read
      // from its entry and our new dir's appended — a lost race never
      // drops skipping metadata
      (data :+ dir, deletes, stats ++ newStats)
    }
  }

  /** Replace the table's contents with `df` (drops prior delete sidecars
    * too — they referred to replaced data). */
  def commitOverwrite(df: DataFrame): Int = {
    val dir = newDataDir()
    df.write.mode("errorifexists").parquet(dir)
    val newStats = statsFor(dir)
    commitWithRetry(_ => (Seq(dir), Nil, newStats))
  }

  /** Merge-on-read delete: write `keys` (one column, matching `keyCol`)
    * as a sidecar; data files stay untouched. */
  def commitDelete(keys: DataFrame): Int = {
    val dir = newDeleteDir()
    keys.select(col(keys.columns.head).as(keyCol))
      .write.mode("errorifexists").parquet(dir)
    commitWithRetry { v =>
      require(v > 1, "delete on an empty table")
      val (data, deletes, stats) = readEntry(v - 1)
      (data, deletes :+ dir, stats)
    }
  }

  /** Read the table at `version` (default: latest). One log-entry read
    * resolves the file set; deletes apply as a broadcast anti-join. */
  def read(version: Int = -1): DataFrame = readImpl(version, None)

  /** Range read with LOG-STATS file skipping: resolve `version`'s entry,
    * keep only part files whose logged [min,max] of `keyCol` intersects
    * [keyLo, keyHi], scan just those, and still apply the predicate (the
    * stats skip files; the filter is exact). Files without a stats row
    * (non-integral key, all-NULL keys, legacy entries) are always
    * scanned — pruning is never allowed to change results. Because the
    * stats live IN the versioned entry, skipping works identically at
    * any time-travel version — no live-layout manifest to rebuild. */
  def readRange(keyLo: Long, keyHi: Long, version: Int = -1): DataFrame =
    readImpl(version, Some((keyLo, keyHi)))

  private def readImpl(version: Int, range: Option[(Long, Long)]): DataFrame = {
    val latest = currentVersion()
    require(latest >= 1, s"empty table at $root")
    val v = if (version < 0) latest else version
    require(v >= 1 && v <= latest,
      s"version $v out of range [1, $latest] for $root")
    val (data, deletes, stats) = readEntry(v)
    val base = range match {
      case Some((lo, hi)) if stats.nonEmpty =>
        // file paths in stats come from input_file_name() (URI form);
        // live data dirs are matched by substring so dir-path spelling
        // differences (file: scheme, double slashes) cannot unprune
        val keep = stats.filter(s => s.hi >= lo && s.lo <= hi)
          .map(_.file).filter(f => data.exists(d => f.contains(d)))
        val statCovered = stats.map(_.file).toSet
        // dirs contributing files with no stats row must be scanned whole
        val uncovered = data.filterNot(d => statCovered.exists(_.contains(d)))
        val paths = keep ++ uncovered
        val df = if (paths.isEmpty)
          spark.read.parquet(data: _*).where(lit(false))
        else spark.read.parquet(paths: _*)
        df.where(col(keyCol) >= lo && col(keyCol) <= hi)
      case Some((lo, hi)) =>
        spark.read.parquet(data: _*)
          .where(col(keyCol) >= lo && col(keyCol) <= hi)
      case None => spark.read.parquet(data: _*)
    }
    if (deletes.isEmpty) base
    else base.join(
      broadcast(spark.read.parquet(deletes: _*).select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")
  }

  /** Fold delete sidecars into the data (the deletion-vector compaction):
    * materializes the current view as one overwrite commit. */
  def compact(): Int = commitOverwrite(read())
}
