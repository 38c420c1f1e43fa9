package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd Catalyst
  * expression — Spark has no built-in. Normalizing before hashing is
  * what keeps visually-identical text from defeating exact dedup:
  * 'café' composed (U+00E9) and decomposed (e + U+0301) must produce
  * the same fingerprint. DuckDB twin: `nfc_normalize(text)`.
  *
  * Scale: row-local, no shuffle; `java.text.Normalizer` short-circuits
  * via `isNormalized`-style quick checks for ASCII-dominant corpora, so
  * the common path is a cheap scan.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form: $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
