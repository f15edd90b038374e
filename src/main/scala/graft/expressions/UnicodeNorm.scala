package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(string) -> string` — Unicode NFC normalization (canonical
  * decomposition + canonical composition, UAX #15 via the JDK's
  * `java.text.Normalizer`). The text-cleaning step that makes "é" (U+00E9)
  * and "e"+U+0301 byte-identical BEFORE any content hash, shingle, or
  * exact-dedup key is computed — without it, visually identical documents
  * hash apart and every dedup pass silently under-merges.
  *
  * Engine-portable: NFC is a Unicode-standard mapping, so DuckDB's
  * `nfc_normalize` produces the same bytes (the q119 oracle relies on
  * this). Pure projection — fuses into the scan, no shuffle. The fast
  * path (`Normalizer.isNormalized`) skips allocation for the
  * already-NFC majority of real corpora.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = (UTF8String) $ref.nullSafeEvalPub($s);")
  }
  def nullSafeEvalPub(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
