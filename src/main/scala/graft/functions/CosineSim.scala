package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors,
  * accumulated in double (SURVEY §4.3 "custom pieces": a codegen'd scalar
  * expression beats the `aggregate(zip_with(...))` higher-order chain by
  * avoiding two intermediate ArrayData allocations per row — the hot path of
  * brute-force similarity search).
  *
  * Sum order is sequential over indices, identical to the HOF formulation,
  * so results are bit-compatible with the oracle-checked queries.
  * Returns null if either side is null; lengths must match (min is used).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == FloatType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
      s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xv = (double) $a.getFloat($i);
        |  double $yv = (double) $b.getFloat($i);
        |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        |}
        |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native float-array dot product in double precision — same sequential sum
  * order as `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (s,v)->s+v)`, so it is
  * bit-compatible with the HOF formulation used by the oracle queries. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == FloatType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
      s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |${ev.value} = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native functions.
  *
  * Two paths: `GraftExtensions` for `spark.sql.extensions`-configured
  * sessions, and `GraftFunctions.register` for an already-built session
  * (idempotent; the catalog queries call it so any driver session works).
  */
object GraftFunctions {
  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSim].getName, null, "cosine_sim",
    "_FUNC_(a, b) - cosine similarity of two float arrays in double precision.",
    "")

  private val dotInfo = new ExpressionInfo(
    classOf[DotProductF].getName, null, "dot_f",
    "_FUNC_(a, b) - dot product of two float arrays in double precision.", "")

  private val simhashInfo = new ExpressionInfo(
    classOf[SimHash64].getName, null, "simhash64",
    "_FUNC_(tokens) - 64-bit SimHash of a string array.", "")

  private val normInfo = new ExpressionInfo(
    classOf[NormalizeText].getName, null, "normalize_text",
    "_FUNC_(s) - NFC-normalize, strip diacritics, lowercase.", "")

  private val dotI8Info = new ExpressionInfo(
    classOf[DotProductI8].getName, null, "dot_i8",
    "_FUNC_(a, b) - integer dot product of two int arrays in long.", "")

  private val pqEncodeInfo = new ExpressionInfo(
    classOf[PqEncode].getName, null, "pq_encode",
    "_FUNC_(v, codebooks) - PQ sub-codes of a float vector (argmin-L2 per subspace).",
    "")

  private val adcScoreInfo = new ExpressionInfo(
    classOf[AdcScore].getName, null, "adc_score",
    "_FUNC_(qv, codes, codebooks, base) - asymmetric-distance PQ score.", "")

  private val jwInfo = new ExpressionInfo(
    classOf[JaroWinkler].getName, null, "jaro_winkler",
    "_FUNC_(a, b) - Jaro-Winkler similarity of two strings (p=0.1, prefix cap 4).",
    "")

  private val geohashInfo = new ExpressionInfo(
    classOf[GeohashEncode].getName, null, "geohash",
    "_FUNC_(lat, lon, precision) - base-32 geohash of a point.", "")

  private val lcsInfo = new ExpressionInfo(
    classOf[LcsLen].getName, null, "lcs_len",
    "_FUNC_(a, b) - longest-common-subsequence length of two string arrays.",
    "")

  private val sessionIdInfo = new ExpressionInfo(
    classOf[GapSessionId].getName, null, "session_id",
    "_FUNC_(ts, gap) - window function: 1-based gap-rule session id.", "")

  private val charNgramsInfo = new ExpressionInfo(
    classOf[CharNgrams].getName, null, "char_ngrams",
    "_FUNC_(text, n) - generator: one row per character n-gram.", "")

  private val bucketInfo = new ExpressionInfo(
    classOf[GraftBucket].getName, null, "graft_bucket",
    "_FUNC_(s, n) - snapshot-log bucket id (FNV-1a+SplitMix64 mod n) as string.",
    "")

  // ONE builder per function, arity-checked, shared by BOTH registration
  // paths — register() and the spark.sql.extensions injector — so a wrong
  // arity fails analysis identically however the session was configured
  private[functions] val cosineBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "cosine_sim takes exactly 2 arguments")
      CosineSim(args.head, args(1))
    }

  private[functions] val dotBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "dot_f takes exactly 2 arguments")
      DotProductF(args.head, args(1))
    }

  private[functions] val simhashBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 1, "simhash64 takes exactly 1 argument")
      SimHash64(args.head)
    }

  private[functions] val normBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 1, "normalize_text takes exactly 1 argument")
      NormalizeText(args.head)
    }

  private[functions] val dotI8Builder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "dot_i8 takes exactly 2 arguments")
      DotProductI8(args.head, args(1))
    }

  private[functions] val pqEncodeBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "pq_encode takes exactly 2 arguments")
      PqEncode(args.head, args(1))
    }

  private[functions] val adcScoreBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 4, "adc_score takes exactly 4 arguments")
      AdcScore(args.head, args(1), args(2), args(3))
    }

  private[functions] val jwBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "jaro_winkler takes exactly 2 arguments")
      JaroWinkler(args.head, args(1))
    }

  private[functions] val geohashBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 3, "geohash takes exactly 3 arguments")
      GeohashEncode(args.head, args(1), args(2))
    }

  private[functions] val lcsBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "lcs_len takes exactly 2 arguments")
      LcsLen(args.head, args(1))
    }

  private[functions] val sessionIdBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "session_id takes exactly 2 arguments")
      GapSessionId(args.head, args(1))
    }

  private[functions] val charNgramsBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "char_ngrams takes exactly 2 arguments")
      CharNgrams(args.head, args(1))
    }

  private[functions] val bucketBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2, "graft_bucket takes exactly 2 arguments")
      GraftBucket(args.head, args(1))
    }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash64"), simhashInfo, simhashBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("normalize_text"), normInfo, normBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"), cosineInfo, cosineBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f"), dotInfo, dotBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_i8"), dotI8Info, dotI8Builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pq_encode"), pqEncodeInfo, pqEncodeBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("adc_score"), adcScoreInfo, adcScoreBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"), jwInfo, jwBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("geohash"), geohashInfo, geohashBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lcs_len"), lcsInfo, lcsBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("session_id"), sessionIdInfo, sessionIdBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("char_ngrams"), charNgramsInfo, charNgramsBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bucket"), bucketInfo, bucketBuilder)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injector:
  * functions + optimizer rules. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    // the arity-checked builders are shared with GraftFunctions.register —
    // without the checks a call like simhash64(a, b) resolved via the
    // extension would silently drop the extra argument instead of failing
    // analysis
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, null, "cosine_sim"),
      GraftFunctions.cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, null, "dot_f"),
      GraftFunctions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, null, "simhash64"),
      GraftFunctions.simhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, null, "normalize_text"),
      GraftFunctions.normBuilder))
    ext.injectFunction((
      FunctionIdentifier("dot_i8"),
      new ExpressionInfo(classOf[DotProductI8].getName, null, "dot_i8"),
      GraftFunctions.dotI8Builder))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, null, "pq_encode"),
      GraftFunctions.pqEncodeBuilder))
    ext.injectFunction((
      FunctionIdentifier("adc_score"),
      new ExpressionInfo(classOf[AdcScore].getName, null, "adc_score"),
      GraftFunctions.adcScoreBuilder))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, null, "jaro_winkler"),
      GraftFunctions.jwBuilder))
    ext.injectFunction((
      FunctionIdentifier("geohash"),
      new ExpressionInfo(classOf[GeohashEncode].getName, null, "geohash"),
      GraftFunctions.geohashBuilder))
    ext.injectFunction((
      FunctionIdentifier("lcs_len"),
      new ExpressionInfo(classOf[LcsLen].getName, null, "lcs_len"),
      GraftFunctions.lcsBuilder))
    ext.injectFunction((
      FunctionIdentifier("session_id"),
      new ExpressionInfo(classOf[GapSessionId].getName, null, "session_id"),
      GraftFunctions.sessionIdBuilder))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, null, "char_ngrams"),
      GraftFunctions.charNgramsBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bucket"),
      new ExpressionInfo(classOf[GraftBucket].getName, null, "graft_bucket"),
      GraftFunctions.bucketBuilder))
    ext.injectOptimizerRule(_ => graft.plans.SimplifySelfSimilarity)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
