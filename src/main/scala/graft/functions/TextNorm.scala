package graft.functions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CCNet-style text canonicalization as one native expression:
  * NFC-normalize, strip diacritics (NFD → drop combining marks → NFC),
  * lowercase (Locale.ROOT). Used ahead of dedup/fingerprinting so that
  * `Café` / `café` / `café` all hash identically.
  *
  * Deliberately NOT NFKC: compatibility folding (ﬁ→fi, fullwidth→ASCII)
  * changes text semantics and — the operational reason — diverges from the
  * DuckDB oracle's `lower(strip_accents(nfc_normalize(x)))`, which also
  * leaves ligatures, ß, ł, ø untouched (non-decomposable base letters are
  * not "accents"). Parity over ASCII + Latin diacritics + the
  * non-decomposable set is pinned in TextNormSpec.
  *
  * Codegen calls the static [[TextNorm.normalize]] so the expression stays
  * inside whole-stage codegen (same per-row cost as eval; no ScalaUDF
  * serialization or Option boxing on the hot path). The per-row regex is
  * precompiled and the fast path (already-NFC ASCII, the overwhelming case
  * in a crawl) allocates nothing but the lowercased copy.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNorm {
  private val marks = Pattern.compile("\\p{Mn}+")

  /** Static entry shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: pure ASCII needs no Normalizer pass (NFC/NFD are identity)
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    val out =
      if (ascii) str.toLowerCase(Locale.ROOT)
      else {
        val nfd = Normalizer.normalize(
          Normalizer.normalize(str, Normalizer.Form.NFC), Normalizer.Form.NFD)
        val stripped = marks.matcher(nfd).replaceAll("")
        Normalizer.normalize(stripped, Normalizer.Form.NFC).toLowerCase(Locale.ROOT)
      }
    UTF8String.fromString(out)
  }
}
