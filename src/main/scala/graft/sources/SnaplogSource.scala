package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{SnapshotLog, SnapshotTable}

/** DataSource V2 reader for [[graft.operators.SnapshotLog]] tables —
  * `spark.read.format("snaplog").load(root)` — making the log's read-side
  * contract ENGINE-native instead of a method-call surface: versioned
  * snapshots (`option("version", N)` time travel), the LOGGED schema
  * (old files read added columns as NULL, each version under its own
  * schema, zero footer inference), merge-on-read delete application, and
  * log-stats FILE PRUNING as a *planning* fact — pushed filters shrink
  * `planInputPartitions`, so `explain`/`BatchScanExec` show exactly which
  * files a predicate reads, and the pruned scan composes with joins,
  * AQE, and SQL text like any other V2 relation.
  *
  * What the planner pushes down:
  *   - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the parquet
  *     readers decode only requested columns (plus the key column when a
  *     delete sidecar must be applied).
  *   - FILTERS ([[SupportsPushDownFilters]]): =, <, <=, >, >=, IN,
  *     IS NULL / IS NOT NULL, and AND/OR of those prune whole FILES via
  *     the per-file bounds + null counts carried in the versioned log
  *     entry — the same evidence `SnapshotTable.readWhere*` uses, so
  *     pruning works at any time-travel version with no directory
  *     listing (sv≥2 entries' stats are the complete file listing).
  *     Every filter is also RE-EVALUATED by Spark (file-level pruning is
  *     never exact), so unsupported predicates are merely unpruned.
  *
  * Merge-on-read deletes are applied INSIDE the readers: the sidecar
  * keys (key-count-sized by the log's contract — the deletion-vector
  * bound) load once at plan time and ship with the reader factory; each
  * row's key probes a hash set. A reader therefore returns exactly the
  * anti-joined view without a join node in the plan.
  *
  * Scope: flat schemas of {long, int, double, float, boolean, string}
  * columns — the analytic shapes the snapshot log's stats cover. Nested
  * or temporal REQUESTED columns fail LOUDLY at scan build; the
  * `SnapshotTable` API remains the general path. The key column name
  * rides in every entry (`"key"`), so no out-of-band configuration is
  * needed; legacy entries accept `option("key", col)`.
  */
object SnaplogSource {

  private[sources] val SupportedTypes: Set[DataType] = Set(
    LongType, IntegerType, DoubleType, FloatType, BooleanType, StringType)

  /** Numeric filter value → Long (None for non-integral values). */
  private[sources] def asLong(v: Any): Option[Long] = v match {
    case n: Long  => Some(n)
    case n: Int   => Some(n.toLong)
    case n: Short => Some(n.toLong)
    case n: Byte  => Some(n.toLong)
    case _        => None
  }

  /** Could `s`'s file hold rows satisfying `f`? True when the logged
    * evidence cannot EXCLUDE the file — unknown columns, untyped values
    * and unsupported filter shapes all keep the file (pruning never
    * changes results; Spark re-applies every filter exactly). */
  private[sources] def mayKeep(s: SnapshotLog.FileStat, keyCol: String,
                               f: Filter): Boolean = {
    def lb(c: String): Option[(Long, Long)] =
      if (c == keyCol && s.keyed) Some((s.lo, s.hi)) else s.cols.get(c)
    def cmpLong(c: String, v: Any)(test: (Long, Long, Long) => Boolean) =
      asLong(v) match {
        case Some(x) => lb(c).forall { case (l, h) => test(l, h, x) }
        case None    => true
      }
    def cmpStr(c: String, v: Any)(test: (String, String, String) => Boolean) =
      v match {
        case x: String => s.scols.get(c).forall { case (l, h) => test(l, h, x) }
        case _         => true
      }
    f match {
      case And(a, b) => mayKeep(s, keyCol, a) && mayKeep(s, keyCol, b)
      case Or(a, b)  => mayKeep(s, keyCol, a) || mayKeep(s, keyCol, b)
      case EqualTo(c, v) =>
        cmpLong(c, v)((l, h, x) => l <= x && x <= h) &&
          cmpStr(c, v)((l, h, x) => l <= x && x <= h)
      case GreaterThan(c, v) =>
        cmpLong(c, v)((_, h, x) => h > x) && cmpStr(c, v)((_, h, x) => h > x)
      case GreaterThanOrEqual(c, v) =>
        cmpLong(c, v)((_, h, x) => h >= x) && cmpStr(c, v)((_, h, x) => h >= x)
      case LessThan(c, v) =>
        cmpLong(c, v)((l, _, x) => l < x) && cmpStr(c, v)((l, _, x) => l < x)
      case LessThanOrEqual(c, v) =>
        cmpLong(c, v)((l, _, x) => l <= x) && cmpStr(c, v)((l, _, x) => l <= x)
      case In(c, vs) =>
        vs.isEmpty || vs.exists(v => mayKeep(s, keyCol, EqualTo(c, v)))
      case StringStartsWith(c, p) =>
        // any s with prefix p satisfies p <= s < p.init + (p.last+1) in
        // Java string order — intersect that band with the logged bounds
        // (no ceiling when the last char cannot be bumped)
        s.scols.get(c).forall { case (l, h) =>
          h >= p && (p.isEmpty || p.last == Char.MaxValue || {
            val ceil = p.init + (p.last + 1).toChar
            l < ceil
          })
        }
      case IsNull(c) =>
        s.rows < 0 || s.nulls.get(c).forall(_ > 0)
      case IsNotNull(c) =>
        s.rows < 0 || s.nulls.get(c).forall(_ < s.rows)
      case _ => true
    }
  }

  /** One ROW GROUP's statistics as a pseudo [[SnapshotLog.FileStat]], so
    * [[mayKeep]] prunes row groups inside a kept file with the same
    * (conservative) logic that pruned files from the log — the second
    * granularity level of the scan: the log's per-file stats prune
    * FILES at plan time; the footer's per-block stats prune ROW GROUPS
    * at execution time. Same trust rules as the commit-time footer
    * lift: only top-level integral/string primitives, string bounds
    * only when short printable ASCII (Java order ≡ parquet's
    * unsigned-byte order), missing/empty statistics → unbounded. */
  private[sources] def blockStat(
      b: org.apache.parquet.hadoop.metadata.BlockMetaData)
      : SnapshotLog.FileStat = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, INT32, INT64}
    import org.apache.parquet.schema.LogicalTypeAnnotation.{IntLogicalTypeAnnotation, StringLogicalTypeAnnotation}
    def safeBound(x: String): Boolean =
      x.length <= 64 && x.forall(c => c >= ' ' && c <= '~')
    val lo = Map.newBuilder[String, (Long, Long)]
    val slo = Map.newBuilder[String, (String, String)]
    val nn = Map.newBuilder[String, Long]
    b.getColumns.forEach { c =>
      if (c.getPath.size() == 1) {
        val name = c.getPath.toDotString
        val pt = c.getPrimitiveType
        val integral = (pt.getPrimitiveTypeName == INT32 ||
          pt.getPrimitiveTypeName == INT64) &&
          (pt.getLogicalTypeAnnotation == null ||
            pt.getLogicalTypeAnnotation.isInstanceOf[IntLogicalTypeAnnotation])
        val stringy = pt.getPrimitiveTypeName == BINARY &&
          pt.getLogicalTypeAnnotation.isInstanceOf[StringLogicalTypeAnnotation]
        val s = c.getStatistics
        if (s != null) {
          if (s.isNumNullsSet) { nn += name -> s.getNumNulls; () }
          if (!s.isEmpty && s.hasNonNullValue) {
            if (integral) {
              lo += name -> ((s.genericGetMin.asInstanceOf[Number].longValue,
                s.genericGetMax.asInstanceOf[Number].longValue))
              ()
            } else if (stringy) {
              val mn = s.genericGetMin
                .asInstanceOf[org.apache.parquet.io.api.Binary]
                .toStringUsingUTF8
              val mx = s.genericGetMax
                .asInstanceOf[org.apache.parquet.io.api.Binary]
                .toStringUsingUTF8
              if (safeBound(mn) && safeBound(mx)) { slo += name -> ((mn, mx)); () }
            }
          }
        }
      }
    }
    SnapshotLog.FileStat("", Long.MinValue, Long.MaxValue,
      lo.result(), slo.result(), nn.result(), b.getRowCount, -1L)
  }
}

class SnaplogDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "snaplog"
  // reads infer the logged schema; WRITES to a fresh table arrive with
  // the dataframe's schema (there is no entry to infer from yet)
  override def supportsExternalMetadata(): Boolean = true

  /** (handle, resolved version — 0 for an empty table, key column —
    * empty only when the table is empty and no option("key") given). */
  private def resolve(options: util.Map[String, String])
      : (SnapshotTable, Int, String) = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("snaplog source requires a path"))
    // the handle is used for entry/schema resolution only; the real key
    // column is read back out of the versioned entry itself
    val t = SnapshotLog.open(SparkSession.active, path, "__resolve")
    val latest = t.currentVersion()
    if (latest == 0) // a write target — reads fail loudly at scan build
      return (t, 0, Option(options.get("key")).getOrElse(""))
    // version / versionAsOf (Delta spelling) pin a version; timestampAsOf
    // resolves to the newest entry whose mtime is at or before the
    // timestamp (millis or 'yyyy-MM-dd HH:mm:ss[.S]') — the same
    // single-writer-clock convenience as the catalog's TIMESTAMP AS OF
    val byVersion = Option(options.get("version"))
      .orElse(Option(options.get("versionAsOf"))).map(_.toInt)
    val byTs = Option(options.get("timestampAsOf")).map { raw =>
      val tsMillis =
        if (raw.forall(c => c.isDigit)) raw.toLong
        else java.sql.Timestamp.valueOf(raw).getTime
      (1 to latest).filter { i =>
        val p = java.nio.file.Paths.get(path, "_log", s"$i.json")
        java.nio.file.Files.exists(p) &&
          java.nio.file.Files.getLastModifiedTime(p).toMillis <= tsMillis
      }.lastOption.getOrElse(throw new IllegalArgumentException(
        s"no snaplog version of $path committed at or before $raw"))
    }
    require(byVersion.isEmpty || byTs.isEmpty,
      "pass either version/versionAsOf or timestampAsOf, not both")
    val v = byVersion.orElse(byTs).getOrElse(latest)
    require(v >= 1 && v <= latest,
      s"version $v out of range [1, $latest] for $path")
    val key = t.keyOf(v).orElse(Option(options.get("key"))).getOrElse(
      throw new IllegalArgumentException(
        "legacy snaplog entry carries no key column; pass option(\"key\", ...)"))
    (t, v, key)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (t, v, _) = resolve(options)
    require(v >= 1, s"empty snaplog table at ${options.get("path")}")
    t.schemaOf(v).getOrElse(throw new IllegalArgumentException(
      s"snaplog entry $v carries no schema (legacy table) — " +
        "read it through the SnapshotTable API"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val (t, v, key) = resolve(properties)
    val e = if (v >= 1) Some(t.readEntry(v)) else None
    new SnaplogTable(SparkSession.active, t, properties.get("path"), v, key,
      schema, e.fold(Map.empty[String, String])(_.cmap),
      e.fold(Set.empty[String])(_.retired))
  }
}

class SnaplogTable(spark: SparkSession, t: SnapshotTable,
                   path: String, version: Int, keyCol: String,
                   tableSchema: StructType,
                   cmap: Map[String, String] = Map.empty,
                   retired: Set[String] = Set.empty)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"snaplog:$path@v$version"
  override def schema(): StructType = tableSchema

  /** `_file` — the row's data file path, served by the readers from
    * their own partition (no parquet column behind it). Queryable like
    * any metadata column, and the GROUP identity of the row-level COW
    * path: `requiredMetadataAttributes = [_file]` makes Spark's
    * runtime group filtering collect exactly the matched FILES, and the
    * write-side projections split rows from metadata so the replacement
    * files land without the rewrite's bookkeeping columns. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "data file path of the row"
    })
  override def capabilities(): util.Set[TableCapability] =
    // AUTOMATIC_SCHEMA_EVOLUTION (round 16): `MERGE WITH SCHEMA
    // EVOLUTION` routes its add-column/widen changes through the
    // catalog's alterTable (one atomic metadata commit) before the
    // rewrite plans — Delta's withSchemaEvolution, on the SQL surface
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** The version's CHECK constraints, surfaced through Spark 4's DSv2
    * constraint API (round 15) — DESCRIBE shows them, `ALTER TABLE ADD
    * CONSTRAINT` sees duplicates, and the analyzer enforces them on SQL
    * writes (a second, plan-time gate in front of the log's own
    * batch-validation at commit). Always VALID: the log never publishes
    * a constraint without scanning the table it was added to. */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    if (version < 1) Array.empty
    else t.readEntry(version).constraints.toSeq.sortBy(_._1).map {
      case (n, sql) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(n).predicateSql(sql).enforced(true)
          .validationStatus(org.apache.spark.sql.connector.catalog
            .constraints.Constraint.ValidationStatus.VALID)
          .build()
          : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  /** `df.write.format("snaplog")` / `df.writeStream.format("snaplog")` —
    * the ENGINE-NATIVE write path (round 14; replaces the round-13
    * `V1Write` fallback): executors write parquet part files straight
    * into a commit-unique data dir ([[SnaplogDataWriter]]) and the
    * driver publishes the log entry from the reported file list through
    * the log's own OCC loop ([[SnapshotTable.commitStaged]]) — footer
    * stats, Bloom sidecars, CHECK constraints and the atomic version
    * claim all included. TRUNCATE = overwrite (replace semantics);
    * streaming commits are exactly-once via the `txn` action keyed by
    * the query id. A fresh table needs `option("key", col)` for its
    * first commit; later commits read the key from the log. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replace = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        replace = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write = {
        require(keyCol.nonEmpty,
          "first commit to a fresh snaplog table needs " +
            "option(\"key\", <column>)")
        require(info.schema().fieldNames.contains(keyCol),
          s"snaplog write is missing its key column '$keyCol'")
        SnaplogWrite.messageType(info.schema()) // loud type-scope check
        new SnaplogWriteImpl(spark, path, keyCol, info.schema(),
          info.queryId(), replace, cmap, retired)
      }
    }

  /** Shared scan-builder shape for the table read path and the
    * row-level operation's read side; `onBuild` lets the operation
    * capture the scan it will have to replace at commit, `rowLevel`
    * switches runtime filtering to file-identity group semantics. */
  private[sources] def scanBuilder(onBuild: SnaplogScan => Unit,
      rowLevel: Boolean = false,
      streamOpts: Map[String, String] = Map.empty): ScanBuilder = {
    require(version >= 1, s"empty snaplog table at $path")
    new ScanBuilder
        with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      private var pushed: Array[Filter] = Array.empty

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters
        filters // file-level pruning is inexact: Spark re-applies them all
      }
      override def pushedFilters(): Array[Filter] = pushed

      override def build(): Scan = {
        val bad = required.fields.filterNot(f =>
          SnaplogSource.SupportedTypes.contains(f.dataType))
        require(bad.isEmpty,
          s"snaplog DSv2 reads flat long/int/double/float/boolean/string " +
            s"columns; unsupported: ${bad.map(f =>
              s"${f.name}:${f.dataType.simpleString}").mkString(",")} — " +
            "use the SnapshotTable API for these")
        val s = new SnaplogScan(spark, t, path, version, keyCol, tableSchema,
          required, pushed, rowLevel, cmap, streamOpts)
        onBuild(s)
        s
      }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    scanBuilder(_ => (), streamOpts = {
      // streaming-read knobs ride the read options (round 15 — the
      // Delta "table as an append stream" read): rate control, fresh
      // start point, and change-commit skipping
      import scala.jdk.CollectionConverters._
      options.asScala.toMap.filter { case (k, _) =>
        Set("maxversionspertrigger", "startversion", "skipchangecommits")
          .contains(k.toLowerCase)
      }
    })

  // ---- SQL DELETE: metadata/COW hybrid ------------------------------------
  //
  // Both delete surfaces are implemented, which gives SQL text Delta's
  // exact behavior split: `OptimizeMetadataOnlyDeleteFromTable` converts
  // a DELETE whose condition translates to a single-column band into
  // [[SnapshotTable.commitDeleteWhere]] — aligned files DROP as pure
  // metadata, only boundary files rewrite — and every other condition
  // falls back to the group-based copy-on-write rewrite below (exact,
  // file-pruned by the pushed condition). A range predicate never
  // matches NULLs and dmlWhere keeps NULL rows; Spark's rewrite applies
  // the same three-valued logic, so both routes agree.

  private[sources] def bandOf(filters: Array[Filter])
      : Option[(String, Either[(Long, Long), (String, String)])] = {
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x         => Seq(x)
    }
    val fs = filters.toSeq.flatMap(conjuncts)
      .filterNot(_.isInstanceOf[IsNotNull]) // implied by any range pred
    if (fs.isEmpty) return None
    val cols = fs.flatMap(_.references).distinct
    if (cols.length != 1) return None
    val c = cols.head
    val integral = tableSchema.fields.find(_.name == c).exists(f =>
      Seq[DataType](LongType, IntegerType).contains(f.dataType))
    val stringy = tableSchema.fields.find(_.name == c)
      .exists(_.dataType == StringType)
    if (integral) {
      var lo = Long.MinValue; var hi = Long.MaxValue
      for (f <- fs) f match {
        case EqualTo(_, v) => SnaplogSource.asLong(v) match {
          case Some(x) => lo = math.max(lo, x); hi = math.min(hi, x)
          case None    => return None
        }
        case GreaterThan(_, v) => SnaplogSource.asLong(v) match {
          case Some(x) if x < Long.MaxValue => lo = math.max(lo, x + 1)
          case Some(_) => lo = Long.MaxValue; hi = Long.MinValue // empty
          case None    => return None
        }
        case GreaterThanOrEqual(_, v) => SnaplogSource.asLong(v) match {
          case Some(x) => lo = math.max(lo, x)
          case None    => return None
        }
        case LessThan(_, v) => SnaplogSource.asLong(v) match {
          case Some(x) if x > Long.MinValue => hi = math.min(hi, x - 1)
          case Some(_) => lo = Long.MaxValue; hi = Long.MinValue // empty
          case None    => return None
        }
        case LessThanOrEqual(_, v) => SnaplogSource.asLong(v) match {
          case Some(x) => hi = math.min(hi, x)
          case None    => return None
        }
        case _ => return None
      }
      Some((c, Left((lo, hi))))
    } else if (stringy) {
      // inclusive bounds only (no string successor for exclusive ones)
      var lo: String = null; var hi: String = null
      def max(a: String, b: String) = if (a == null || a < b) b else a
      def min(a: String, b: String) = if (a == null || a > b) b else a
      for (f <- fs) f match {
        case EqualTo(_, v: String) => lo = max(lo, v); hi = min(hi, v)
        case GreaterThanOrEqual(_, v: String) => lo = max(lo, v)
        case LessThanOrEqual(_, v: String)    => hi = min(hi, v)
        case _ => return None
      }
      if (lo == null || hi == null) return None
      Some((c, Right((lo, hi))))
    } else None
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    cmap.isEmpty && bandOf(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val tw = SnapshotLog.open(spark, path, keyCol)
    bandOf(filters) match {
      case Some((c, Left((lo, hi)))) => tw.commitDeleteWhere(c, lo, hi); ()
      case Some((c, Right((lo, hi)))) =>
        tw.commitDeleteWhereString(c, lo, hi); ()
      case None => throw new IllegalArgumentException(
        s"snaplog metadata delete supports single-column bands; got " +
          filters.mkString(", "))
    }
  }

  // ---- SQL UPDATE / MERGE / general DELETE: group-based copy-on-write -----

  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new SnaplogRowLevelOperation(spark, this, t, path, version,
      keyCol, tableSchema, info.command(), cmap)
}

class SnaplogScan(spark: SparkSession, t: SnapshotTable,
                  path: String, version: Int, keyCol: String,
                  tableSchema: StructType, required: StructType,
                  filters: Array[Filter], rowLevel: Boolean = false,
                  cmap: Map[String, String] = Map.empty,
                  streamOpts: Map[String, String] = Map.empty)
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** `spark.readStream.format("snaplog")` (round 15 — Delta's "table as
    * an append stream", its most common streaming read): offsets are
    * VERSIONS, each admitted append contributes exactly its new files
    * as PLAIN rows (column-pruned; the version's delete sidecar applied
    * in-reader), rate control via `maxVersionsPerTrigger`, a fresh
    * start point via `startVersion`, and row-CHANGING commits
    * (delete/merge/overwrite/DML) fail loudly unless
    * `skipChangeCommits=true` skips them whole — exact diffs stay the
    * snapcdf/change-feed surface. Shares the snapcdf machinery, so
    * column-mapped tables, exactly-once replay, and AvailableNow
    * draining all behave identically. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    def opt(k: String): Option[String] =
      streamOpts.collectFirst { case (n, v) if n.equalsIgnoreCase(k) => v }
    val maxV = opt("maxVersionsPerTrigger").map(_.toInt)
    maxV.foreach(n => require(n >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $n"))
    new SnapCdfStream(spark, t, path, required, maxV,
      opt("startVersion").map(_.toInt).getOrElse(0),
      tableMode = true,
      skipChangeCommits = opt("skipChangeCommits").exists(_.toBoolean))
  }

  private val entry = t.readEntry(version)

  // ---- runtime (dynamic) file pruning — Delta's dynamic file pruning:
  // a broadcast join's build-side keys arrive at EXECUTION time as an
  // In(...) filter; re-pruning the file list against the logged stats
  // then shrinks the probe side to the files the dim keys actually stab.
  // Every column may be offered (columns without logged evidence simply
  // never exclude a file — mayKeep is conservative by construction).
  @volatile private var runtimeFilters: Array[Filter] = Array.empty
  private[sources] def runtimeApplied: Boolean = runtimeFilters.nonEmpty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // a ROW-LEVEL scan offers only `_file`: runtime group filtering then
    // arrives as a plain `_file IN (matched files)` — translatable to a
    // source filter and EXACT (file identity is the group identity), so
    // the COW rewrite reads and replaces precisely the matched files.
    // Regular scans offer their output columns — a multi-column DPP
    // struct may fail filter translation, which only costs pruning,
    // never correctness (mayKeep never excludes without evidence).
    if (rowLevel)
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column("_file"))
    else
      required.fieldNames.filterNot(_ == "_file").map(
        org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(fs: Array[Filter]): Unit = { runtimeFilters = fs }

  private def norm(p: String): String = {
    val viaUri =
      try {
        val u = new java.net.URI(p)
        if (u.getScheme != null) u.getPath else p
      } catch { case _: Exception => p }
    viaUri.replaceAll("/{2,}", "/").stripSuffix("/")
  }
  private def normBelongs(f: String, d: String): Boolean = {
    val nf = norm(f); val nd = norm(d)
    nf == nd || nf.startsWith(nd + "/")
  }

  /** Stats rows and no-stats extras the pushed filters cannot exclude,
    * from the versioned entry's stats alone — the planning-time half of
    * `SnapshotTable.readWhere*`. sv≥2 entries need no listing (stats ARE
    * the file listing); legacy entries fall back to one listing per live
    * dir so unstatted files are scanned, never lost. */
  // column mapping: logged stats are keyed by PHYSICAL names; pushed
  // filters arrive logical — remap each stat row's column maps onto the
  // table's logical fields once (identity tables pass through)
  private def statToLogical(s: SnapshotLog.FileStat): SnapshotLog.FileStat =
    if (cmap.isEmpty) s
    else {
      def remap[T](m: Map[String, T]): Map[String, T] =
        tableSchema.fields.flatMap(f =>
          m.get(cmap.getOrElse(f.name, f.name)).map(f.name -> _)).toMap
      s.copy(cols = remap(s.cols), scols = remap(s.scols),
        nulls = remap(s.nulls))
    }

  private lazy val (keptStats, extraFiles): (Seq[SnapshotLog.FileStat], Seq[String]) = {
    val live = entry.data
    val liveStats = entry.stats.filter(s =>
      live.exists(d => normBelongs(s.file, d))).map(statToLogical)
    val kept = liveStats
      .filter(s => filters.forall(f => SnaplogSource.mayKeep(s, keyCol, f)))
    val extra =
      if (entry.sv >= 2)
        live.filterNot(d => entry.stats.exists(s => normBelongs(s.file, d)))
          .flatMap(t.dataFilesOf)
      else {
        val statted = entry.stats.map(s => norm(s.file)).toSet
        live.flatMap(d => t.dataFilesOf(d))
          .filterNot(f => statted.contains(norm(f)))
      }
    (kept, extra)
  }

  /** Top-level conjunctive point predicates (col, admissible values)
    * the Bloom sidecars can refute: every row of a file must satisfy
    * each top-level AND term, so an EqualTo/In term whose value set the
    * file's filter proves absent excludes the whole file. Only string
    * and integral values participate — the build hashed the
    * cast-to-string form. */
  private def pointProbes(fs: Array[Filter]): Seq[(String, Seq[String])] =
    fs.toSeq.flatMap {
      case EqualTo(c, v: String) => Some(c -> Seq(v))
      case EqualTo(c, v) if SnaplogSource.asLong(v).isDefined =>
        Some(c -> Seq(SnaplogSource.asLong(v).get.toString))
      case In(c, vs) if vs.nonEmpty && vs.forall(v =>
          v.isInstanceOf[String] || SnaplogSource.asLong(v).isDefined) =>
        Some(c -> vs.toSeq.map {
          case s: String => s
          case v         => SnaplogSource.asLong(v).get.toString
        })
      case _ => None
    }

  /** Statically-kept files, re-pruned by any runtime filters that
    * arrived since planning (extras have no stats — never re-pruned),
    * then by the per-file BLOOM sidecars for pushed point predicates
    * (files without a filter for the column are kept; a Bloom can only
    * refute, so skipping stays conservative). */
  private def keptFiles: Seq[String] = {
    val statKept = keptStats
      .filter(s => runtimeFilters.forall(f =>
        SnaplogSource.mayKeep(s, keyCol, f)))
      .map(_.file)
    val probes = pointProbes(filters) ++ pointProbes(runtimeFilters)
    val bloomKept =
      if (probes.isEmpty) statKept
      else {
        val byDir = statKept.groupBy(f => f.substring(0, f.lastIndexOf('/')))
        byDir.toSeq.sortBy(_._1).flatMap { case (dir, fsOfDir) =>
          t.loadBloom(dir) match {
            case None => fsOfDir
            case Some(bm) => fsOfDir.filter { f =>
              val base = f.substring(f.lastIndexOf('/') + 1)
              probes.forall { case (c, vals) =>
                bm.get(base).flatMap(_.get(cmap.getOrElse(c, c))) match {
                  case None => true // no filter for this column — scan
                  case Some((m, k, bits)) =>
                    vals.exists(v =>
                      graft.operators.FileBloom.contains(bits, m, k, v))
                }
              }
            }
          }
        }
      }
    // hidden-partition pruning (Iceberg transform mapping): a pushed
    // point predicate maps through an entry's logged partition TRANSFORM
    // — an entry whose bucket/truncate/identity value differs from every
    // admissible probe value's derived form cannot hold matching rows
    val pvalKept =
      if (entry.pvals.isEmpty || probes.isEmpty) bloomKept
      else bloomKept.filter { f =>
        entry.data.find(d => normBelongs(f, d))
          .flatMap(entry.pvals.get).forall(vs =>
            vs.forall { case (specStr, pv) =>
              val tr = graft.operators.PTransform.parse(specStr)
              probes.forall { case (c, vals) =>
                cmap.getOrElse(c, c) != tr.srcCol || {
                  val integral = tableSchema.fields.find(_.name == c)
                    .exists(fd => Seq[DataType](IntegerType, LongType,
                      ShortType, ByteType).contains(fd.dataType))
                  vals.exists(v => tr.derive(v, integral).forall(_ == pv))
                }
              }
            })
      }
    // `_file` identity pruning: a pushed/runtime EqualTo/In on the
    // metadata column names data files directly (the row-level runtime
    // group filter) — keep exactly those; files named by no admitted
    // value cannot hold matching rows by construction
    val fileProbes: Seq[Set[String]] =
      (filters ++ runtimeFilters).toSeq.collect {
        case EqualTo("_file", v: String) => Set(norm(v))
        case In("_file", vs) if vs.forall(_.isInstanceOf[String]) =>
          vs.map(v => norm(v.asInstanceOf[String])).toSet
      }
    val all = pvalKept ++ extraFiles
    if (fileProbes.isEmpty) all
    else all.filter(f => fileProbes.forall(_.contains(norm(f))))
  }

  /** Post-pruning statistics straight from the LOG (exact file bytes and
    * row counts recorded at commit) — the planning fact that lets Spark
    * auto-broadcast a pruned snapshot in a join. Unknown when any kept
    * file lacks logged numbers; row count additionally requires no
    * pending delete sidecar (deletes shrink visible rows in-reader). */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      if (extraFiles.isEmpty && keptStats.forall(_.bytes >= 0))
        java.util.OptionalLong.of(keptStats.map(_.bytes).sum)
      else java.util.OptionalLong.empty()
    override def numRows(): java.util.OptionalLong =
      if (extraFiles.isEmpty && entry.deletes.isEmpty &&
          keptStats.forall(_.rows >= 0))
        java.util.OptionalLong.of(keptStats.map(_.rows).sum)
      else java.util.OptionalLong.empty()
  }

  /** Sidecar delete keys, loaded ONCE at plan time (key-count-sized by
    * the log's deletion-vector contract) and shipped to every reader. */
  private lazy val deletedKeys: Array[Any] =
    if (entry.deletes.isEmpty) Array.empty
    else {
      import org.apache.spark.sql.functions.col
      spark.read.parquet(entry.deletes: _*).select(col(keyCol)).distinct()
        .collect().flatMap(r =>
          if (r.isNullAt(0)) None else Some(normKey(r.get(0))))
    }

  private def normKey(v: Any): Any = v match {
    case n: Int    => java.lang.Long.valueOf(n.toLong)
    case n: Long   => java.lang.Long.valueOf(n)
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"snaplog DSv2 delete sidecars support long/int/string keys; " +
        s"got ${other.getClass.getSimpleName}")
  }

  // last-planned file set, snapshotted for the row-level COW commit
  // (SupportsRowLevelOperations): the files this scan fed into a
  // DELETE/UPDATE/MERGE rewrite are exactly the files its replacement
  // must swap out — runtime group filters have been applied by the time
  // partitions are planned, so the snapshot is the post-DPP set
  @volatile private var planned: Option[Seq[String]] = None
  private[sources] def plannedFiles: Option[Seq[String]] = planned

  override def planInputPartitions(): Array[InputPartition] = {
    val kf = keptFiles.sorted
    planned = Some(kf)
    kf.map(f => SnaplogFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // readers decode required columns plus (when deletes apply) the key
    val needKey = deletedKeys.nonEmpty &&
      !required.fieldNames.contains(keyCol)
    val readFields: StructType =
      if (needKey)
        StructType(required.fields :+
          tableSchema.fields.find(_.name == keyCol).getOrElse(
            throw new IllegalArgumentException(
              s"key column $keyCol missing from table schema")))
      else required
    val keyIdx =
      if (deletedKeys.isEmpty) -1 else readFields.fieldNames.indexOf(keyCol)
    // the same pushed (and runtime) filters that pruned FILES from the
    // log prune ROW GROUPS inside surviving files, against the footer's
    // per-block statistics — evaluated once per file on the executor
    SnaplogReaderFactory(readFields, required.size, keyIdx,
      deletedKeys, new SerializableHadoopConf(
        spark.sessionState.newHadoopConf()),
      filters ++ runtimeFilters, cmap)
  }

  override def description(): String =
    s"snaplog $path v$version files=${keptFiles.size} " +
      s"deletes=${deletedKeys.length} " +
      s"PushedFilters=[${filters.mkString(", ")}]"
}

case class SnaplogFilePartition(file: String) extends InputPartition

case class SnaplogReaderFactory(readFields: StructType, requiredCount: Int,
                                keyIdx: Int, deletedKeys: Array[Any],
                                conf: SerializableHadoopConf,
                                filters: Array[Filter] = Array.empty,
                                cmap: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SnaplogFilePartition].file
    new SnaplogFileReader(file, readFields, requiredCount, keyIdx,
      deletedKeys, conf.value, filters, cmap)
  }
}

/** Reads one parquet file into [[InternalRow]]s of `readFields` order via
  * parquet-column's record assembly (MessageColumnIO + a custom
  * [[org.apache.parquet.io.api.RecordMaterializer]]): column projection
  * is pushed to the page level, columns the file lacks (pre-evolution)
  * surface as NULL, and rows whose key is in `deletedKeys` are dropped
  * in-place (merge-on-read without a join node). Only the first
  * `requiredCount` fields are emitted — the key may be decoded solely
  * for the delete probe. */
class SnaplogFileReader(file: String, readFields: StructType,
                        requiredCount: Int, keyIdx: Int,
                        deletedKeys: Array[Any],
                        conf: org.apache.hadoop.conf.Configuration,
                        filters: Array[Filter] = Array.empty,
                        cmap: Map[String, String] = Map.empty)
    extends PartitionReader[InternalRow] {
  // column mapping: files hold PHYSICAL names; slots/filters are logical
  private def physName(n: String): String = cmap.getOrElse(n, n)
  private val p2l: Map[String, String] = cmap.map(_.swap)
  private def blockToLogical(
      bs: SnapshotLog.FileStat): SnapshotLog.FileStat =
    if (cmap.isEmpty) bs
    else {
      def remap[T](m: Map[String, T]): Map[String, T] =
        m.map { case (k, v) => (p2l.getOrElse(k, k), v) }
      bs.copy(cols = remap(bs.cols), scols = remap(bs.scols),
        nulls = remap(bs.nulls))
    }
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.io.ColumnIOFactory
  import org.apache.parquet.schema.MessageType

  private val deleted: java.util.HashSet[Any] = {
    val s = new java.util.HashSet[Any](math.max(16, deletedKeys.length * 2))
    deletedKeys.foreach(s.add)
    s
  }

  // the `_file` METADATA column is served from the partition itself —
  // no parquet column behind it; filled into every emitted row
  private val fileIdx: Int = readFields.fieldNames.indexOf("_file")
  private val fileValue: UTF8String = UTF8String.fromString(file)
  private def fillFile(r: InternalRow): InternalRow = {
    if (fileIdx >= 0 && fileIdx < requiredCount) r.update(fileIdx, fileValue)
    r
  }

  private val reader =
    ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  // ROW-GROUP pruning: the filters that pruned files from the log prune
  // blocks inside this file against the footer's per-block statistics —
  // conservative exactly like mayKeep at file level (missing evidence
  // keeps the block; Spark re-applies every filter on the rows), so the
  // scan's skipping granularity drops from file to row group. At 100 TB
  // a kept 1 GB file with 8 row groups reads ~1 group for a point probe
  // instead of all 8.
  private val keepGroup: IndexedSeq[Boolean] = {
    val blocks = reader.getFooter.getBlocks
    val out = new Array[Boolean](blocks.size())
    var i = 0
    while (i < out.length) {
      out(i) = filters.isEmpty || {
        val bs = blockToLogical(SnaplogSource.blockStat(blocks.get(i)))
        filters.forall(f => SnaplogSource.mayKeep(bs, "", f))
      }
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
  private[sources] def groupsKept: Int = keepGroup.count(identity)
  private[sources] def groupsTotal: Int = keepGroup.length
  private var groupIdx = -1

  // project to the wanted columns PRESENT in this file (older files may
  // lack evolved columns — they stay NULL in the assembled row); the
  // projection asks for PHYSICAL names, the materializer fills LOGICAL
  // slots (positional correspondence)
  private val presentNames = readFields.fieldNames
    .filter(n => fileSchema.containsField(physName(n)))
  private val projection: Option[MessageType] =
    if (presentNames.isEmpty) None
    else Some(new MessageType(fileSchema.getName,
      presentNames.map(n => fileSchema.getType(Seq(physName(n)): _*)): _*))
  projection.foreach(reader.setRequestedSchema)

  private val materializer =
    new SnaplogRowMaterializer(readFields, presentNames.toIndexedSeq)
  private val columnIO =
    projection.map(p => new ColumnIOFactory().getColumnIO(p))

  private var rowsLeftInGroup = 0L
  private var recordReader: org.apache.parquet.io.RecordReader[GenericInternalRow] = _
  // no wanted column present in the file: emit bare (all-NULL) rows so
  // row COUNTS stay exact for pre-evolution files and count(*) pushups
  // (kept groups only — pruned groups are rows the filters exclude)
  private var emptyRowsLeft: Long =
    if (projection.isEmpty) {
      var n = 0L; var i = 0
      val blocks = reader.getFooter.getBlocks
      while (i < keepGroup.length) {
        if (keepGroup(i)) n += blocks.get(i).getRowCount
        i += 1
      }
      n
    } else 0L
  private var row: InternalRow = _

  private def advanceGroup(): Boolean = {
    while (true) {
      groupIdx += 1
      if (groupIdx >= keepGroup.length) return false
      if (keepGroup(groupIdx)) {
        val pages = reader.readNextRowGroup()
        if (pages == null) return false
        rowsLeftInGroup = pages.getRowCount
        recordReader = columnIO.get.getRecordReader(pages, materializer)
        return true
      } else reader.skipNextRowGroup()
    }
    false // unreachable
  }

  override def next(): Boolean = {
    if (projection.isEmpty) {
      if (emptyRowsLeft <= 0) return false
      emptyRowsLeft -= 1
      row = fillFile(new GenericInternalRow(new Array[Any](requiredCount)))
      true
    } else {
      while (true) {
        if (rowsLeftInGroup <= 0 && !advanceGroup()) return false
        while (rowsLeftInGroup > 0) {
          rowsLeftInGroup -= 1
          val assembled = recordReader.read()
          if (keyIdx < 0 || !isDeleted(assembled)) {
            row = fillFile(
              if (assembled.numFields == requiredCount) assembled
              else new GenericInternalRow(
                Array.tabulate[Any](requiredCount)(i =>
                  assembled.get(i, readFields.fields(i).dataType))))
            return true
          }
        }
      }
      false // unreachable: the loop above always returns
    }
  }

  private def isDeleted(r: GenericInternalRow): Boolean = {
    if (r.isNullAt(keyIdx)) return false // null keys never match a key set
    val k = readFields.fields(keyIdx).dataType match {
      case LongType    => java.lang.Long.valueOf(r.getLong(keyIdx))
      case IntegerType => java.lang.Long.valueOf(r.getInt(keyIdx).toLong)
      case StringType  => r.getUTF8String(keyIdx).toString
      case dt => throw new IllegalArgumentException(
        s"unsupported snaplog key type ${dt.simpleString}")
    }
    deleted.contains(k)
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

/** Assembles parquet records straight into [[GenericInternalRow]]s laid
  * out in `readFields` order; fields absent from the file's projection
  * (`projected` is the file-present subset, in projection order) remain
  * NULL. Flat primitive schemas only (the provider enforces the type set
  * at scan build). */
class SnaplogRowMaterializer(readFields: StructType, projected: IndexedSeq[String])
    extends org.apache.parquet.io.api.RecordMaterializer[GenericInternalRow] {
  import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter}

  private val values = new Array[Any](readFields.size)
  private val idxByName = readFields.fieldNames.zipWithIndex.toMap

  /** Per-slot decode with UPCAST to the slot's LOGGED type (round 16 —
    * type widening): after `ALTER COLUMN ... TYPE`, old files still
    * carry the narrow physical type (INT32 under a long slot, FLOAT
    * under a double slot); the converter coerces along the lossless
    * lattice so Spark's typed accessors (getLong/getDouble) never meet
    * a narrower boxed value. Unwidened tables hit only the identity
    * arms. */
  private class FieldConverter(slot: Int,
      dt: org.apache.spark.sql.types.DataType) extends PrimitiveConverter {
    import org.apache.spark.sql.types._
    override def addLong(v: Long): Unit = values(slot) = dt match {
      case DoubleType => v.toDouble
      case _ => v
    }
    override def addInt(v: Int): Unit = values(slot) = dt match {
      case LongType => v.toLong
      case DoubleType => v.toDouble
      case ShortType => v.toShort
      case ByteType => v.toByte
      case _ => v
    }
    override def addDouble(v: Double): Unit = values(slot) = v
    override def addFloat(v: Float): Unit = values(slot) = dt match {
      case DoubleType => v.toDouble
      case _ => v
    }
    override def addBoolean(v: Boolean): Unit = values(slot) = v
    override def addBinary(v: Binary): Unit =
      values(slot) = UTF8String.fromBytes(v.getBytes)
  }

  private val converters: Array[Converter] =
    projected.map { name =>
      val i = idxByName(name)
      new FieldConverter(i, readFields.fields(i).dataType): Converter
    }.toArray

  private val root: GroupConverter = new GroupConverter {
    override def getConverter(fieldIndex: Int): Converter =
      converters(fieldIndex)
    override def start(): Unit =
      java.util.Arrays.fill(values.asInstanceOf[Array[AnyRef]], null)
    override def end(): Unit = ()
  }

  override def getRootConverter: GroupConverter = root

  override def getCurrentRecord: GenericInternalRow =
    new GenericInternalRow(values.clone())
}
