package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Shared codebook materialization for the PQ expressions: a foldable
  * `array<array<array<float>>>` literal (m × ksub × dsub) flattens ONCE per
  * expression instance into primitive arrays the generated loops index
  * directly — the literal child is never traversed per row.
  */
private[functions] object PqCodebook {
  final case class Flat(flat: Array[Float], halfs: Array[Double],
                        m: Int, ksub: Int, dsub: Int)

  def fromLiteral(mat: Expression): Flat = {
    val m3 = mat.eval(null).asInstanceOf[ArrayData]
    val m = m3.numElements()
    val ksub = m3.getArray(0).numElements()
    val dsub = m3.getArray(0).getArray(0).numElements()
    val flat = new Array[Float](m * ksub * dsub)
    val halfs = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val bj = m3.getArray(j)
      var k = 0
      while (k < ksub) {
        val c = bj.getArray(k)
        // sequential double sum of squares, THEN halve — the exact order
        // the previous half-norm literal used, so scores are bit-identical
        var ss = 0.0
        var t = 0
        while (t < dsub) {
          val x = c.getFloat(t)
          flat((j * ksub + k) * dsub + t) = x
          ss += x.toDouble * x
          t += 1
        }
        halfs(j * ksub + k) = ss / 2.0
        k += 1
      }
      j += 1
    }
    Flat(flat, halfs, m, ksub, dsub)
  }

  def checkMat(mat: Expression, name: String): TypeCheckResult = mat.dataType match {
    case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) if mat.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$name requires a foldable array<array<array<float>>> codebook, got " +
      s"${mat.dataType.simpleString} (foldable=${mat.foldable})")
  }
}

/** `pq_encode(v, codebooks)`: all m PQ sub-codes of a float vector —
  * codes[j] = argmax over k of (x_j · c_jk − ‖c_jk‖²/2), the L2-nearest
  * sub-centroid per subspace (argmin‖x−c‖² = argmax(x·c − ‖c‖²/2)), score
  * ties to the LOWEST k. A real `doGenCode` three-deep primitive loop: the
  * higher-order `transform(sequence …)` formulation this replaces is
  * CodegenFallback in Spark (the lambda bodies evaluate interpreted,
  * allocating m·ksub structs per vector); here one vector costs m·ksub·dsub
  * fused multiply-adds against two flat primitive arrays and a single
  * int[m] allocation. Sum order matches dot_f exactly (sequential double
  * accumulation, half-norm subtracted AFTER the dot), so the codes are
  * bit-identical to the HOF path it replaces.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(FloatType, _) => PqCodebook.checkMat(right, prettyName)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  @transient private lazy val cb = PqCodebook.fromLiteral(right)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, ignoredMat: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Int](cb.m)
    var j = 0
    while (j < cb.m) {
      var best = 0
      var bestS = Double.NegativeInfinity
      var k = 0
      while (k < cb.ksub) {
        var dot = 0.0
        val off = (j * cb.ksub + k) * cb.dsub
        var t = 0
        while (t < cb.dsub) {
          dot += x.getFloat(j * cb.dsub + t).toDouble * cb.flat(off + t)
          t += 1
        }
        val s = dot - cb.halfs(j * cb.ksub + k)
        if (s > bestS) { bestS = s; best = k }
        k += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val flatRef = ctx.addReferenceObj("pqFlat", cb.flat, "float[]")
      val halfRef = ctx.addReferenceObj("pqHalf", cb.halfs, "double[]")
      val out = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      s"""
        |int[] $out = new int[${cb.m}];
        |for (int $j = 0; $j < ${cb.m}; $j++) {
        |  int $best = 0; double $bestS = Double.NEGATIVE_INFINITY;
        |  for (int $k = 0; $k < ${cb.ksub}; $k++) {
        |    double $dot = 0.0;
        |    int $off = ($j * ${cb.ksub} + $k) * ${cb.dsub};
        |    for (int $t = 0; $t < ${cb.dsub}; $t++) {
        |      $dot += (double) $a.getFloat($j * ${cb.dsub} + $t)
        |            * (double) $flatRef[$off + $t];
        |    }
        |    double $s = $dot - $halfRef[$j * ${cb.ksub} + $k];
        |    if ($s > $bestS) { $bestS = $s; $best = $k; }
        |  }
        |  $out[$j] = $best;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `adc_score(qv, codes, codebooks, base)`: asymmetric-distance score of a
  * PQ-coded candidate against an exact query — base + Σⱼ qᵥⱼ · c_{j,codes[j]}
  * — as one generated loop over primitive arrays (the `aggregate(sequence…)`
  * fold it replaces is CodegenFallback: interpreted lambdas and a struct
  * walk per subspace). The accumulation order is exactly the fold's
  * (acc starts at `base`, each subspace's FULL dot is computed then added),
  * so scores are bit-identical to the HOF path. `base` carries the IVF
  * residual centroid term (0.0 for plain ADC).
  */
case class AdcScore(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _), DoubleType) =>
        PqCodebook.checkMat(third, prettyName)
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<int>, codebooks, double), " +
        s"got (${a.simpleString}, ${b.simpleString}, _, ${c.simpleString})")
    }

  @transient private lazy val cb = PqCodebook.fromLiteral(third)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override def nullSafeEval(q: Any, codes: Any, ignoredMat: Any,
                            base: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cs = codes.asInstanceOf[ArrayData]
    var acc = base.asInstanceOf[Double]
    var j = 0
    while (j < cb.m) {
      var dot = 0.0
      val off = (j * cb.ksub + cs.getInt(j)) * cb.dsub
      var t = 0
      while (t < cb.dsub) {
        dot += qv.getFloat(j * cb.dsub + t).toDouble * cb.flat(off + t)
        t += 1
      }
      acc += dot
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, codes, _, base) => {
      val flatRef = ctx.addReferenceObj("pqFlat", cb.flat, "float[]")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val acc = ctx.freshName("acc")
      s"""
        |double $acc = $base;
        |for (int $j = 0; $j < ${cb.m}; $j++) {
        |  double $dot = 0.0;
        |  int $off = ($j * ${cb.ksub} + $codes.getInt($j)) * ${cb.dsub};
        |  for (int $t = 0; $t < ${cb.dsub}; $t++) {
        |    $dot += (double) $q.getFloat($j * ${cb.dsub} + $t)
        |          * (double) $flatRef[$off + $t];
        |  }
        |  $acc += $dot;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
