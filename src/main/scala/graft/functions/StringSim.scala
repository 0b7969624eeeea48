package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity and geocoding scalar kernels.
  *
  * Both expressions stay inside whole-stage codegen by emitting a static
  * call into [[StringSimKernels]] — the same pattern Spark's own string
  * builtins use (a JVM static beats inlining a 60-line algorithm into the
  * generated method, which would blow past the JIT inline budget).
  */
object StringSimKernels {

  /** Classic Jaro-Winkler similarity (Winkler 1990): scaling p = 0.1,
    * common-prefix cap 4, boost applied only when jaro > 0.7. Operates on
    * UTF-16 code units (matching DuckDB/RapidFuzz on ASCII inputs, the
    * catalog's fixture domain).
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: aligned walk over the matched characters
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(n, m))
    while (prefix < cap && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Longest-common-subsequence length of two token sequences — the
    * ROUGE-L kernel. Classic O(n·m) DP with a rolling 1-row table;
    * callers bound token counts (the catalog caps at 200) so the per-pair
    * cost is a constant, not corpus-dependent. */
  def lcsLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val at = new Array[UTF8String](n)
    var i = 0
    while (i < n) { at(i) = a.getUTF8String(i); i += 1 }
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        cur(j + 1) =
          if (at(i) == b.getUTF8String(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash (Niemeyer 2008): interleaved lat/lon bisection,
    * base-32 alphabet, `precision` output characters (1..12). */
  def geohash(lat: Double, lon: Double, precision: Int): UTF8String = {
    val p = math.max(1, math.min(12, precision))
    val out = new java.lang.StringBuilder(p)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    var bits = 0
    var ch = 0
    while (out.length < p) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bits += 1
      if (bits == 5) { out.append(Base32.charAt(ch)); bits = 0; ch = 0 }
    }
    UTF8String.fromString(out.toString)
  }
}

/** `jaro_winkler(a, b)` — double in [0,1]; null if either side is null. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
      s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `lcs_len(a, b)` — longest-common-subsequence length of two string
  * arrays (the ROUGE-L kernel); null if either side is null. */
case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
      s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_len"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.lcsLen(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimKernels.lcsLen($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `char_ngrams(text, n)` — a native GENERATOR (the `explode`/`inline`
  * extension point, the table-valued side of the Expression surface):
  * emits one row per character n-gram of `text`, streaming UTF8String
  * slices straight into GenerateExec's row pipeline. The composed
  * spelling (`explode(transform(sequence(...), i -> substring(...)))`)
  * first materializes the full n-gram ARRAY per row — for a 100 kB
  * document that is a ~300 k-element ArrayData allocation per input row;
  * the generator's iterator never builds it.
  */
case class CharNgrams(child: Expression, n: Expression)
    extends org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // CodegenFallback only covers the generator EXPRESSION slot —
  // GenerateExec drives `eval` directly (the same shape as Spark's own
  // JsonTuple generator), so the surrounding operators still codegen.

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n.dataType == IntegerType &&
        n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got " +
      s"${child.dataType.simpleString}, ${n.dataType.simpleString}")

  override def elementSchema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("gram", StringType, nullable = false)

  override def prettyName: String = "char_ngrams"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    val nn = n.eval(input).asInstanceOf[Int]
    if (s == null || nn <= 0) return Nil
    val len = s.numChars()
    if (len < nn) return Nil
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i <= len - nn
      // fresh row per element (the ExplodeBase discipline — GenerateExec
      // may buffer emitted rows, so the row object cannot be reused)
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        val row =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        row.update(0, s.substringSQL(i + 1, nn))
        i += 1
        row
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))
}

/** `geohash(lat, lon, precision)` — base-32 geohash string. */
case class GeohashEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double, int), got " +
      s"${Seq(first, second, third).map(_.dataType.simpleString).mkString(", ")}")

  override def dataType: DataType = StringType
  override def prettyName: String = "geohash"

  override def nullSafeEval(lat: Any, lon: Any, p: Any): Any =
    StringSimKernels.geohash(lat.asInstanceOf[Double],
      lon.asInstanceOf[Double], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon, p) =>
      s"${ev.value} = graft.functions.StringSimKernels.geohash($lat, $lon, $p);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
