package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_deflate_len(string|binary) -> int` — the DEFLATE-compressed byte
  * length of the input at a fixed level (6, raw stream, no zlib/gzip
  * framing). The compression-ratio quality signal of the Gopher/RefinedWeb
  * lineage: `compressed/raw` near 0 flags template/repetition-heavy
  * documents that n-gram repetition counters miss (long-range structure),
  * near 1 flags high-entropy noise (binary junk, encrypted blobs) — both
  * ends are cut candidates in a pre-training corpus.
  *
  * No cross-engine oracle exists for this signal (DEFLATE output depends
  * on the zlib implementation; DuckDB exposes no compressor): the catalog
  * entry is declared rows-only and correctness is spec-level — exact
  * length properties on known inputs, determinism, and the
  * repetitive < natural < noise ordering the signal exists to detect.
  *
  * Scale: pure projection over the scan (fuses, no shuffle); the Deflater
  * is thread-local and reset per row, so the hot path allocates only the
  * native stream once per executor thread.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects string or binary, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    DeflateLen.lengthOf(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDeflate", this, classOf[DeflateLen].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (Integer) $ref.nullSafeEvalPub($s);")
  }
  def nullSafeEvalPub(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** Raw-deflate stream, fixed level: the signal must not drift with a
    * session codec config, and `nowrap` drops the 6-byte zlib frame so
    * tiny inputs aren't dominated by framing. */
  private val local: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(6, true))

  def lengthOf(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
