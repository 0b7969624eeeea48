package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Integer dot product of two int-array columns, accumulated in long —
  * the scoring kernel of int8-quantized similarity search
  * ([[graft.operators.Similarity.int8TopK]]). With |code| ≤ 127 and
  * dims ≤ 2²⁴ the sum is exact, so quantized scores are
  * integer-deterministic across engines and partitionings (no 4 dp
  * tolerance needed on the dot itself — only the final scale
  * multiplication is floating point).
  *
  * The int8 path exists for bandwidth: 4× less data per vector than
  * float32 through the same codegen loop, which is what a 100 TB
  * embedding scan is bounded by.
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, got " +
      s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += x.getInt(i).toLong * y.getInt(i).toLong; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |${ev.value} = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  ${ev.value} += (long) $a.getInt($i) * (long) $b.getInt($i);
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
