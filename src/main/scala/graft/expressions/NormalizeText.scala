package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize_text(string) -> string` — the canonical dedup
  * normalization (lowercase → everything outside `[a-z0-9 ]` becomes a
  * space → collapse space runs → trim) as ONE byte-level pass over the
  * UTF8String, replacing the two-`regexp_replace` chain.
  *
  * Why a kernel: this projection is the hot inner loop of every
  * hashing-dedup pipeline (fingerprints, CCNet keys, curation reports),
  * and the regex chain pays two `java.util.regex` matchers plus four
  * String/UTF8String materializations per row. Measured on the r11 sf3
  * fixture, that chain was the entire cost of q67/q69 (~350× DuckDB's
  * time for the same rows) and its allocation pressure is what degraded
  * per-thread throughput as cores filled (CPU exponent read ~1.9 at 32
  * threads vs ~1.55 at 8 for identical work — allocator/memory-bandwidth
  * contention, see SCALE.md r11). The byte loop allocates once per row
  * (the output buffer, never larger than the input) and touches each
  * byte exactly once.
  *
  * Exactness: for pure-ASCII input (checked byte-wise) the single pass
  * is equal to the chain BY CASE ANALYSIS: ASCII lowercase is `c|0x20`
  * on A-Z; `[^a-z0-9 ]` → one space each; collapsing emits a single
  * space between kept runs; leading/trailing pending spaces are never
  * flushed (= trim). Any byte ≥ 0x80 falls back to literally the old
  * chain (UTF8String.toLowerCase + the same compiled patterns), so
  * non-ASCII semantics — including multi-byte lowercasings like
  * U+212A KELVIN SIGN → ASCII 'k' — are unchanged by construction.
  * The differential fuzz in ExpressionsSpec pins both paths to the
  * legacy chain.
  */
case class GraftNormalizeText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_text expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val n = u.numBytes()
    val bytes = u.getBytes
    var i = 0
    var ascii = true
    while (i < n && ascii) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (!ascii) return GraftNormalizeText.slowPath(u)
    val out = new Array[Byte](n)
    var w = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      val c = bytes(i)
      val mapped: Byte =
        if (c >= 'A' && c <= 'Z') (c | 0x20).toByte
        else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) c
        else ' '
      if (mapped == ' ') {
        if (w > 0) pendingSpace = true // leading spaces never start output
      } else {
        if (pendingSpace) { out(w) = ' '; w += 1; pendingSpace = false }
        out(w) = mapped; w += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, w) // trailing pendingSpace never flushed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNorm", this,
      classOf[GraftNormalizeText].getName)
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = (UTF8String) $ref.nullSafeEvalPub($s);")
  }
  def nullSafeEvalPub(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(
      newChild: Expression): GraftNormalizeText = copy(child = newChild)
}

object GraftNormalizeText {
  // the EXACT legacy chain for non-ASCII rows: Lower (UTF8String
  // semantics) then the same two patterns Spark's regexp_replace compiles
  private val NonKept = Pattern.compile("[^a-z0-9 ]")
  private val SpaceRuns = Pattern.compile("  +")

  private[expressions] def slowPath(u: UTF8String): UTF8String = {
    val lowered = u.toLowerCase.toString
    val stripped = NonKept.matcher(lowered).replaceAll(" ")
    val collapsed = SpaceRuns.matcher(stripped).replaceAll(" ")
    UTF8String.fromString(collapsed).trim()
  }
}
