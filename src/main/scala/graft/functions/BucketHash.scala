package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.FileBloom

/** The snapshot-log bucket transform (`bucket(N, col)`) as a native
  * codegen expression — FNV-1a 64 + SplitMix64 over the value's string
  * form, top bit cleared, mod N: bit-identical to the driver-side
  * [[graft.operators.PTransform.bucketOf]] probe twin (both delegate to
  * [[graft.operators.FileBloom.hash1]]/[[graft.operators.FileBloom.mix]],
  * which the generated code calls through the object's static
  * forwarders). Replaces the round-13 ScalaUDF on the partitioned WRITE
  * path: the bucket id of every ingested row now computes inside
  * whole-stage codegen instead of through per-row Scala boxing — at
  * 100 TB ingest the derive column is on every row's path, so it must
  * not be the one non-codegen island in the write plan.
  *
  * Returns the bucket id AS A STRING (the derived partition value is a
  * directory-name string everywhere: `pvals`, the hive leaf dir, the
  * probe comparison). NULL in → NULL out (the write path separately
  * rejects NULL-derived partition values, loudly).
  */
case class GraftBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable) {
      // n is foldable — validate its VALUE at analysis time (ADVICE r14):
      // n = 0 would otherwise surface as a raw ArithmeticException from
      // whole-stage codegen, and n < 0 yields negative bucket-id strings
      // that can never match logged pvals
      val n = right.eval()
      if (n == null || n.asInstanceOf[Int] >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName bucket count must be a positive int, got $n")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bucket"

  override def nullSafeEval(s: Any, n: Any): Any =
    UTF8String.fromString(graft.operators.PTransform
      .bucketOf(s.asInstanceOf[UTF8String].toString, n.asInstanceOf[Int])
      .toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) => {
      val h = ctx.freshName("h")
      val fb = classOf[FileBloom.type].getName.stripSuffix("$")
      s"""
        |long $h = $fb.mix($fb.hash1($s.toString()));
        |${ev.value} = UTF8String.fromString(
        |  java.lang.Integer.toString((int) (($h >>> 1) % $n)));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
