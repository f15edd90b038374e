package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `graft_gzip(binary) -> binary` — one complete gzip MEMBER (RFC 1952)
  * per input value: the write-side complement of [[WarcKernel]]'s
  * member walk. Concatenating per-record outputs produces a spec-
  * conformant multi-member `.warc.gz` in the CommonCrawl packing (one
  * member per record — the layout [[graft.operators.Crawl.buildIndex]]
  * emits range-GET-servable member offsets for), so an export pipeline
  * can write compressed archives whose own index round-trips through
  * `fetchPlan`/`fetchRecords`.
  *
  * DETERMINISTIC by construction: `GZIPOutputStream` writes a constant
  * header (MTIME 0, XFL 0, OS 0) and the default-level deflate of a
  * given input is a pure function of its bytes — same input, same
  * member, so the expression is safe under speculative re-execution
  * and in cached plans. NULL in → NULL out (the kernel convention).
  *
  * Reference scope: sybil's only compression surface is the gzipped
  * TSV export (src/sybil/cmd_export.go); per-record archive members
  * belong to the training-data-pipeline extension tier. */
case class GraftGzip(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gzip expects binary, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gzip"

  override protected def nullSafeEval(input: Any): Any =
    evalGzip(input.asInstanceOf[Array[Byte]])

  /** Codegen entry point (shared with nullSafeEval). */
  def evalGzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(
      math.max(64, bytes.length / 3))
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes)
    g.close()
    bos.toByteArray
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftGzip", this,
      classOf[GraftGzip].getName)
    defineCodeGen(ctx, ev, s => s"(byte[]) $ref.evalGzip($s)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftGzip = copy(child = newChild)
}
