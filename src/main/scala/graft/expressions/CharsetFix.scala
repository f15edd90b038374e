package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Charset repair for crawl payloads — the hop between a WARC body's raw
  * bytes and the HTML/text kernels. `cast(binary AS string)` assumes
  * UTF-8 and silently replaces everything else; real crawls carry
  * latin-1/windows-1252 bodies. This implements the HTML5 rule: bytes
  * that validate as UTF-8 ARE UTF-8; anything else decodes as
  * windows-1252 (the WHATWG default fallback, a superset of latin-1).
  *
  *  - `graft_charset_guess(binary) -> string`: `'ascii'` (all bytes <
  *    0x80), `'utf-8'` (valid with multibyte present), else
  *    `'windows-1252'` — the corpus-stats companion.
  *  - `graft_charset_fix(binary) -> string`: the decoded text. UTF-8
  *    validation is EXACT (RFC 3629 ranges: overlongs, surrogates,
  *    > U+10FFFF, truncated sequences all rejected — fuzz-pinned against
  *    `CharsetDecoder` in REPORT mode); the fallback uses the WHATWG
  *    windows-1252 index (0x80–0x9F table, 0xA0–0xFF = U+00A0–U+00FF —
  *    fuzz-pinned against the JDK's own windows-1252 decoder byte for
  *    byte, except the five positions the WHATWG index defines as C1
  *    controls (0x81/0x8D/0x8F/0x90/0x9D) where the JDK emits U+FFFD;
  *    the kernel follows WHATWG, the rule HTML5 actually specifies).
  *
  * Both are total scan-side codegen projections: no UDF, no shuffle, and
  * the whole-buffer validity rule keeps the result a pure function of
  * the bytes (no per-chunk decisions that could split across row
  * boundaries). Reference scope: sybil has no charset surface; this is
  * the training-data-pipeline extension tier (q217 chains WARC → fix →
  * HTML text).
  */
object CharsetKernel {

  /** WHATWG windows-1252 index for 0x80–0x9F (0xA0+ maps to itself). */
  private val Cp1252Hi: Array[Char] = Array(
    0x20ac, 0x0081, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008d, 0x017d, 0x008f,
    0x0090, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, 0x009d, 0x017e, 0x0178)
    .map(_.toChar)

  def isAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }

  /** Exact RFC 3629 validation (the UTF-8 well-formedness table):
    * rejects continuation-lead bytes, overlongs (C0/C1, E0 80–9F,
    * F0 80–8F), surrogates (ED A0–BF), > U+10FFFF (F4 90+, F5+), and
    * truncated sequences. */
  def validUtf8(b: Array[Byte]): Boolean = {
    val n = b.length
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false
      else if (c < 0xe0) {
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) {
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80
        val hi = if (c == 0xed) 0x9f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) {
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false
    }
    true
  }

  def guess(b: Array[Byte]): UTF8String =
    if (isAscii(b)) CharsetKernel.Ascii
    else if (validUtf8(b)) CharsetKernel.Utf8
    else CharsetKernel.Cp1252

  private val Ascii = UTF8String.fromString("ascii")
  private val Utf8 = UTF8String.fromString("utf-8")
  private val Cp1252 = UTF8String.fromString("windows-1252")

  def fix(b: Array[Byte]): UTF8String = {
    if (validUtf8(b)) return UTF8String.fromBytes(b.clone())
    // windows-1252 → UTF-8 (every source byte yields one cp < 0x10000)
    val out = new Array[Byte](3 * b.length)
    var len = 0
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      val cp: Int =
        if (c < 0x80) c
        else if (c < 0xa0) Cp1252Hi(c - 0x80).toInt
        else c
      if (cp < 0x80) { out(len) = cp.toByte; len += 1 }
      else if (cp < 0x800) {
        out(len) = (0xc0 | (cp >> 6)).toByte
        out(len + 1) = (0x80 | (cp & 0x3f)).toByte
        len += 2
      } else {
        out(len) = (0xe0 | (cp >> 12)).toByte
        out(len + 1) = (0x80 | ((cp >> 6) & 0x3f)).toByte
        out(len + 2) = (0x80 | (cp & 0x3f)).toByte
        len += 3
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, len))
  }
}

/** `graft_charset_guess(binary) -> string` — see [[CharsetKernel]]. */
case class GraftCharsetGuess(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_charset_guess expects binary, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_charset_guess"

  override protected def nullSafeEval(input: Any): Any =
    CharsetKernel.guess(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.CharsetKernel.guess($s);")

  override protected def withNewChildInternal(
      newChild: Expression): GraftCharsetGuess = copy(child = newChild)
}

/** `graft_charset_fix(binary) -> string` — see [[CharsetKernel]]. */
case class GraftCharsetFix(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_charset_fix expects binary, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_charset_fix"

  override protected def nullSafeEval(input: Any): Any =
    CharsetKernel.fix(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.CharsetKernel.fix($s);")

  override protected def withNewChildInternal(
      newChild: Expression): GraftCharsetFix = copy(child = newChild)
}
