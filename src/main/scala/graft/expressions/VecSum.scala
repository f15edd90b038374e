package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_vecsum(arr)` — elementwise exact long sum of fixed-width
  * integer arrays: the aggregate that turns "explode k slots per row,
  * then group" into "one array-sum per group". The bootstrap family is
  * the motivating case: 40 replicate counters per row exploded to 40
  * rows each before aggregation — 24M in-flight rows at sf0.1 for what
  * is arithmetically a vector add. This buffer holds the k running
  * longs, adds each row's vector in place (map-side combine applies —
  * the merge is the same elementwise add), and the k-row fan-out happens
  * AFTER aggregation on group-sized data.
  *
  * Width is adopted from the first non-null row and enforced —
  * mismatched widths fail loudly (silent zero-padding would corrupt
  * replicate alignment). Null rows are skipped; null ELEMENTS are
  * rejected (the counter producers never emit them). A group with no
  * non-null rows yields null, like SUM.
  */
case class GraftVecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vecsum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum expects array<int|bigint>, got ${t.sql}")
  }

  private val isInt = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  // empty array = "no rows seen yet" sentinel (a real zero-width input
  // is rejected below, so the sentinel is unambiguous)
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def widthError(a: Int, b: Int): Nothing =
    throw new IllegalStateException(
      s"graft_vecsum: mismatched vector widths $a vs $b for ${child.sql}")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0)
      throw new IllegalStateException(
        s"graft_vecsum: empty vector for ${child.sql}")
    val out = if (buf.length == 0) new Array[Long](n)
      else if (buf.length != n) widthError(buf.length, n)
      else buf
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalStateException(
          s"graft_vecsum: null element at $i for ${child.sql}")
      out(i) = Math.addExact(out(i),
        if (isInt) arr.getInt(i).toLong else arr.getLong(i))
      i += 1
    }
    out
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    if (buf.length != other.length) widthError(buf.length, other.length)
    var i = 0
    while (i < buf.length) {
      buf(i) = Math.addExact(buf(i), other(i)); i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](8 * buf.length)
    var i = 0
    while (i < buf.length) {
      var j = 0
      while (j < 8) { out(8 * i + j) = (buf(i) >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) {
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (bytes(8 * i + j) & 0xffL); j += 1 }
      buf(i) = v
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftVecSum =
    copy(child = newChildren(0))
}
