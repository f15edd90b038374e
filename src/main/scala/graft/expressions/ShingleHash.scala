package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Distinct 64-bit hashes of a token array's n-token shingles (default 3),
  * in one fused pass: for i in 0..len-n, FNV-1a over
  * `tok[i] ' ' tok[i+1] … ' ' tok[i+n-1]` bytes (streamed — the shingle
  * string is never materialized), deduped in insertion order.
  *
  * Used by the exact-Jaccard verify stage (operators/Dedup.jaccardVerify):
  * |A∩B| and |A∪B| over hashed shingle sets equal the counts over the
  * string sets barring 64-bit collisions (a candidate pair holds ~1e3
  * shingles → within-pair collision probability ~1e-13; the DuckDB oracle
  * computes the same counts from the string lists and agrees). The win:
  * the HOF pipeline re-built each shingle string per row interpreted and
  * shuffled string arrays through two joins — this ships arrays of longs
  * (≈4x smaller) and fuses into codegen.
  */
case class GraftShingleHash(child: Expression, n: Int = 3) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash shingle width must be >= 1, got $n")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

  override protected def nullSafeEval(toks: Any): Any =
    compute(toks.asInstanceOf[ArrayData])

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def compute(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= len - n) {
      var h = FnvOffset
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= ' '.toLong; h *= FnvPrime }
        if (!toks.isNullAt(i + j)) {
          val b = toks.getUTF8String(i + j).getBytes
          var k = 0
          while (k < b.length) { h ^= (b(k) & 0xffL); h *= FnvPrime; k += 1 }
        }
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftShingleHash", this, classOf[GraftShingleHash].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftShingleHash =
    copy(child = newChild)
}

/** [[GraftShingleHash]]'s POSITIONAL sibling: every n-gram's 64-bit hash
  * in token order, NOT deduped — element `i` is the hash of the gram
  * starting at token `i`, so `posexplode` recovers (position, hash)
  * pairs. The form span-level consumers need (duplicated-span merging
  * keys on start positions, where dedup would destroy the alignment);
  * same streamed FNV-1a, same string-oracle no-collision argument.
  */
case class GraftShingleHashAll(child: Expression, n: Int = 3)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash_all shingle width must be >= 1, got $n")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash_all expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash_all"

  override protected def nullSafeEval(toks: Any): Any =
    compute(toks.asInstanceOf[ArrayData])

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def compute(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var h = FnvOffset
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= ' '.toLong; h *= FnvPrime }
        if (!toks.isNullAt(i + j)) {
          val b = toks.getUTF8String(i + j).getBytes
          var k = 0
          while (k < b.length) { h ^= (b(k) & 0xffL); h *= FnvPrime; k += 1 }
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftShingleHashAll", this,
      classOf[GraftShingleHashAll].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftShingleHashAll =
    copy(child = newChild)
}
