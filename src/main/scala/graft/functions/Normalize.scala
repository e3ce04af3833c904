package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — stage-zero corpus hygiene: the same
  * word crawled from two sites can differ only in composition form
  * (é as U+00E9 vs e + U+0301), which silently splits vocabulary,
  * dedup fingerprints, and n-gram overlap. `nfc` canonicalizes to
  * NFC (UAX #15, the form virtually all tokenizers assume);
  * `stripAccents` folds diacritics (NFD then drop the Mn combining
  * marks — ñ→n, ç→c; characters with no canonical decomposition, ø
  * ß, pass through) for accent-insensitive matching/langid features.
  *
  * Oracle parity: DuckDB's `nfc_normalize`/`strip_accents`
  * (utf8proc) implement the same UAX #15 tables — verified
  * equivalent on composed, decomposed, and non-decomposable inputs —
  * so queries over these are hash-checkable end to end.
  */
object Normalize {
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  private val Mn = java.util.regex.Pattern.compile("\\p{Mn}+")

  def stripAccents(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val d = java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFD)
      UTF8String.fromString(Mn.matcher(d).replaceAll(""))
    }
}

private[functions] abstract class NormalizeBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  protected def kernel: String
  override protected def nullSafeEval(input: Any): Any
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Normalize.$kernel($c)")
}

/** NFC canonical composition (codegen'd static call). */
case class NfcNormalizeExpr(child: Expression) extends NormalizeBase {
  override def prettyName: String = "nfc_normalize"
  override protected def kernel: String = "nfc"
  override protected def nullSafeEval(input: Any): Any =
    Normalize.nfc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

/** Diacritic folding: NFD, drop Mn combining marks (codegen'd). */
case class StripAccentsExpr(child: Expression) extends NormalizeBase {
  override def prettyName: String = "strip_accents"
  override protected def kernel: String = "stripAccents"
  override protected def nullSafeEval(input: Any): Any =
    Normalize.stripAccents(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(
      newChild: Expression): StripAccentsExpr = copy(child = newChild)
}
