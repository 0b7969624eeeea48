package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array (sign bits
  * of per-bit ±1 vote sums over mixed token hashes — Charikar '02). Replaces
  * the last Scala UDF on a dedup hot path: a ScalaUDF here forced a
  * CatalystTypeConverters round-trip (ArrayData → Seq[String] → boxed
  * result) per document; this expression reads the UTF8String array
  * in place and stays inside whole-stage codegen.
  *
  * Bit-for-bit compatible with the historical UDF: per-token hash is
  * mix64(String.hashCode), per-bit votes ±1, ties break to 0.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row (the loop body is scalar Java either way);
    // the win over a ScalaUDF is skipping the converter round-trip
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Token array → 64-bit SimHash, reading UTF8Strings in place. Called
    * from generated code via the companion's static forwarder. */
  def compute(toks: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val h = Sketches.mix64(toks.getUTF8String(t).toString.hashCode.toLong)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }
}
