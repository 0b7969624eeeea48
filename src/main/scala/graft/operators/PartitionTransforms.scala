package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType}

/** Iceberg-style partition TRANSFORMS for the snapshot log — hidden
  * partitioning: the table partitions on a value DERIVED from a source
  * column (`bucket(16, id)`, `truncate(100, id)`, `days(ts)`), queries
  * keep predicating on the SOURCE column, and the engine maps the
  * predicate through the transform to prune partitions. The derived
  * value exists only in the directory name and the log's `pvals`; the
  * source column stays IN the files, so footer min/max stats still
  * serve range predicates on truncate/days layouts for free — the one
  * shape stats can never serve is bucket (hash scatters the order),
  * which is exactly what the metadata bucket-prune in
  * `readWhereEquals` (and the snaplog DSv2 EqualTo pushdown) covers.
  *
  * Spec grammar (the `partitionBy` strings): a bare column name is the
  * identity transform; `bucket(N, col)` hashes to N buckets (graft's
  * own FNV-1a + SplitMix64 over the cast-to-string form — engine-owned
  * so the probe side can recompute it anywhere, and a native codegen
  * expression on the write path: [[graft.functions.GraftBucket]]);
  * `truncate(W, col)` floors integrals to W-wide bands and prefixes
  * strings to W chars; `days(col)` formats a timestamp/date to its UTC
  * calendar day — pinned to UTC regardless of
  * `spark.sql.session.timeZone` (Iceberg's day-transform contract), so
  * a reader session in another zone recomputes the SAME derived value
  * the writer logged and partition-exact filters never drop rows. */
private[graft] sealed trait PTransform {
  /** Canonical spec string — the `pvals` key, e.g. "bucket(16,id)". */
  def spec: String
  def srcCol: String
  /** Path-safe directory key (no '(' '=' '/' ','). */
  def dirKey: String
  /** The derived STRING value as a Spark column over the source column
    * of declared type `dt` — MUST be deterministic across sessions
    * (the logged value and every later recompute must agree). */
  def derivedExpr(dt: DataType): Column
  /** Driver-side twin of [[derivedExpr]] for a probe value's string
    * form; None when this transform cannot map an equality probe
    * (pruning then never fires — conservative). */
  def derive(value: String, isIntegral: Boolean): Option[String]
  /** The same transform over another source column — the logical ⇄
    * physical translation hook (round 16: partition-source columns may
    * rename; `pvals` stores specs under the rename-invariant PHYSICAL
    * name and probes translate through the mapping). */
  def withSrc(c: String): PTransform
}

private[graft] object PTransform {
  final case class IdentityT(srcCol: String) extends PTransform {
    def spec = srcCol
    def dirKey = srcCol
    def derivedExpr(dt: DataType): Column = col(srcCol).cast("string")
    def derive(value: String, isIntegral: Boolean): Option[String] =
      Some(value)
    def withSrc(c: String): PTransform = copy(srcCol = c)
  }

  final case class Bucket(n: Int, srcCol: String) extends PTransform {
    def spec = s"bucket($n,$srcCol)"
    def dirKey = s"bucket${n}_$srcCol"
    // native codegen expression (round 14; replaces the round-13
    // ScalaUDF): the derive column sits on EVERY ingested row's path,
    // so it runs inside whole-stage codegen via the registered
    // graft_bucket function — same FileBloom.hash1/mix kernel as the
    // driver-side bucketOf twin
    def derivedExpr(dt: DataType): Column =
      call_function("graft_bucket", col(srcCol).cast("string"), lit(n))
    def derive(value: String, isIntegral: Boolean): Option[String] =
      Some(bucketOf(value, n).toString)
    def withSrc(c: String): PTransform = copy(srcCol = c)
  }

  final case class Truncate(w: Int, srcCol: String) extends PTransform {
    def spec = s"truncate($w,$srcCol)"
    def dirKey = s"trunc${w}_$srcCol"
    def derivedExpr(dt: DataType): Column =
      if (SnapshotTypes.integral(dt))
        (col(srcCol) - pmod(col(srcCol), lit(w))).cast("long").cast("string")
      else substring(col(srcCol), 1, w)
    def derive(value: String, isIntegral: Boolean): Option[String] =
      if (isIntegral)
        scala.util.Try(value.toLong).toOption
          .map(v => (v - java.lang.Math.floorMod(v, w.toLong)).toString)
      else Some(value.take(w))
    def withSrc(c: String): PTransform = copy(srcCol = c)
  }

  final case class Days(srcCol: String) extends PTransform {
    def spec = s"days($srcCol)"
    def dirKey = s"days_$srcCol"
    // UTC-pinned (ADVICE r13): a TIMESTAMP column is an instant —
    // date_format alone renders it in spark.sql.session.timeZone, so a
    // reader session in another zone would recompute a DIFFERENT day
    // than the writer logged and readPartitions' exact filter would
    // silently drop rows. convert_timezone('UTC', ts) yields the UTC
    // wall clock (session-TZ-independent). A DATE column is already a
    // calendar day: date_format round-trips it in any zone, and casting
    // it through timestamp would wrongly shift it by the session offset.
    def derivedExpr(dt: DataType): Column = dt match {
      case DateType => date_format(col(srcCol), "yyyy-MM-dd")
      case _ =>
        date_format(convert_timezone(lit("UTC"), col(srcCol)), "yyyy-MM-dd")
    }
    // equality probes on a raw timestamp don't map through days() here
    // (string-form timestamp parsing is locale/precision-fraught) —
    // days layouts prune via readPartitions on the day value instead
    def derive(value: String, isIntegral: Boolean): Option[String] = None
    def withSrc(c: String): PTransform = copy(srcCol = c)
  }

  /** graft's bucket hash: FNV-1a 64 + SplitMix64 over the value's
    * string form, top bit cleared, mod n — reproducible on the driver,
    * in executors, and by any external reader of the log. */
  def bucketOf(s: String, n: Int): Int =
    (((FileBloom.mix(FileBloom.hash1(s)) >>> 1) % n).toInt)

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
  private val DaysRe = """days\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val PlainRe = """([A-Za-z0-9_]+)""".r

  def parse(s: String): PTransform = s.trim match {
    case BucketRe(n, c) =>
      require(n.toInt >= 2, s"bucket count must be >= 2 in '$s'"); Bucket(n.toInt, c)
    case TruncRe(w, c) =>
      require(w.toInt >= 1, s"truncate width must be >= 1 in '$s'"); Truncate(w.toInt, c)
    case DaysRe(c)  => Days(c)
    case PlainRe(c) => IdentityT(c)
    case other => throw new IllegalArgumentException(
      s"unsupported partition spec '$other' — use a column name, " +
        "bucket(N, col), truncate(W, col), or days(col)")
  }
}

/** Shared type predicates for the snapshot log's transform machinery. */
private[graft] object SnapshotTypes {
  import org.apache.spark.sql.types._
  def integral(dt: DataType): Boolean =
    Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(dt)
}
