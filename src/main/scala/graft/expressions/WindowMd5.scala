package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Every k-token sliding window's md5 hex, positionally (element `i` is
  * `md5(array_join(slice(tk, i + 1, k), ' '))`), in ONE fused pass.
  *
  * Exists for the window-dedup family (operators/Dedup.windowDedup,
  * q129), whose content-defined sampler keys on the md5 HEX DIGITS — the
  * oracle replays the identical md5 selection, so unlike the shingle-hash
  * paths the digest CANNOT be swapped for a 64-bit hash. What CAN go: the
  * per-window work the HOF formulation pays. `transform(sequence(...),
  * p -> md5(array_join(slice(tk, p+1, k), ' ')))` evaluates the lambda
  * INTERPRETED per window and allocates a sliced array + a joined string
  * per window (O(len·k) bytes copied per document). Here the document is
  * joined ONCE into a byte buffer with token start offsets, and each
  * window's digest runs over the buffer slice in place — no per-window
  * array, no per-window string, the md5 itself (the irreducible,
  * oracle-pinned cost) is all that remains.
  *
  * Output is bit-identical to the HOF formulation: md5 over the UTF-8
  * bytes of the space-joined window, lowercase hex. Null tokens (never
  * produced by `split`, the only caller shape) fall back to the exact
  * `array_join` skip-null semantics via a per-window join.
  */
case class GraftWindowMd5All(child: Expression, k: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 => TypeCheckResult.TypeCheckFailure(
      s"graft_window_md5_all window width must be >= 1, got $k")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_window_md5_all expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_window_md5_all"

  override protected def nullSafeEval(toks: Any): Any =
    compute(toks.asInstanceOf[ArrayData])

  private val HexDigits = "0123456789abcdef".getBytes

  private def hex(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(digest(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    if (len < k) return new GenericArrayData(Array.empty[Any])
    var hasNull = false
    var i = 0
    while (i < len && !hasNull) { hasNull = toks.isNullAt(i); i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](len - k + 1)
    if (!hasNull) {
      // fast path: join the whole document once; window p is the buffer
      // slice [starts(p), starts(p + k - 1) + lens(p + k - 1))
      val bytes = new Array[Array[Byte]](len)
      var total = 0L
      i = 0
      while (i < len) {
        bytes(i) = toks.getUTF8String(i).getBytes
        total += bytes(i).length
        i += 1
      }
      val buf = new Array[Byte]((total + (len - 1)).toInt)
      val starts = new Array[Int](len)
      var off = 0
      i = 0
      while (i < len) {
        if (i > 0) { buf(off) = ' '; off += 1 }
        starts(i) = off
        System.arraycopy(bytes(i), 0, buf, off, bytes(i).length)
        off += bytes(i).length
        i += 1
      }
      var p = 0
      while (p <= len - k) {
        val s = starts(p)
        val e = starts(p + k - 1) + bytes(p + k - 1).length
        md.update(buf, s, e - s)
        out(p) = hex(md.digest())
        p += 1
      }
    } else {
      // exact array_join semantics: null elements are skipped with no
      // separator contribution
      var p = 0
      while (p <= len - k) {
        var first = true
        var j = p
        while (j < p + k) {
          if (!toks.isNullAt(j)) {
            if (!first) md.update(' '.toByte)
            md.update(toks.getUTF8String(j).getBytes)
            first = false
          }
          j += 1
        }
        out(p) = hex(md.digest())
        p += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWindowMd5All", this,
      classOf[GraftWindowMd5All].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftWindowMd5All =
    copy(child = newChild)
}
