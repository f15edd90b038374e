package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash over a token array: per DISTINCT token, the first 60 bits
  * of its md5 (= the integer value of the first 15 hex digits, exactly what
  * `conv(substring(md5(t),1,15),16,10)` yields); each of the low `bits`
  * bits votes +1/-1; output sets bit b when its vote sum is positive.
  *
  * Bit-identical to the HOF formulation in operators/TextAnalysis.simhash
  * (and its DuckDB oracle twin): deduplication produces the same token SET
  * and vote sums are order-independent, so an internal hash-set dedupe is
  * exact. One fused pass computes every bit's votes — the HOF version runs
  * `bits` interpreted aggregate() folds per row, re-walking the hash array
  * each time.
  */
case class GraftSimHash(tokens: Expression, bits: Expression)
  extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = bits

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, bits.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if bits.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects (array<string>, int literal), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(toks: Any, b: Any): Any =
    compute(toks.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  def compute(toks: ArrayData, bits: Int): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](bits)
    val seen = new java.util.HashSet[UTF8String]()
    val md = GraftMinHash.digest.get()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (seen.add(t.clone())) { // clone: the array may reuse backing memory
          md.reset()
          val d = md.digest(t.getBytes)
          // first 15 hex digits = bytes 0..6 plus the high nibble of byte 7
          var h = 0L
          var j = 0
          while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
          h = (h << 4) | ((d(7) >> 4) & 0xfL)
          var b = 0
          while (b < bits) {
            votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSimhash", this, classOf[GraftSimHash].getName)
    nullSafeCodeGen(ctx, ev, (toks, b) =>
      s"${ev.value} = $ref.compute($toks, (int) $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftSimHash =
    copy(tokens = newLeft, bits = newRight)
}
