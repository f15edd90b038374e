package graft.expressions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_dsum(x, scale)` — the exact-decimal sum
  * `CAST(SUM(CAST(x AS DECIMAL(38, scale))) AS DOUBLE)` at (almost) long
  * speed: each double is converted to its EXACT half-up-scaled long
  * (`round(x·10^scale)` of the double's true binary value — an FMA
  * error-free product gives the exact residual; values landing within 1e-9
  * of a rounding boundary take the BigDecimal slow path, and exact decimal
  * ties are impossible for binary doubles when scale ≥ 1), accumulated
  * into a signed int128 (two-long) buffer, converted once per group to
  * `BigDecimal(sum, scale).doubleValue` — the identical nearest-double the
  * decimal pipeline produces.
  *
  * Why: Spark's decimal sum keeps a BigDecimal-backed buffer above
  * precision 18 — measured 4.5x slower than a long sum on the q01 shape.
  * The int128 buffer never overflows in practice (2^127 / 10^6-scaled
  * values ≈ 1.7e32 of headroom). Long/int inputs never touch a double:
  * their scaled value v·10^scale is computed exactly in 128-bit (so epoch
  * nanos and snowflake ids sum exactly). Doubles whose scaled value leaves
  * the long window, and weighted integral products past 64 bits, take an
  * exact BigInteger path; only a value that alone exceeds the int128
  * window (|v|·10^scale ≥ 2^126, i.e. |v| ≥ ~8.5e31 at scale 6) fails,
  * loudly, naming the expression. A SUM whose FINAL total leaves the
  * window also fails loudly — detected order-independently by wrapping
  * adds (associative mod 2^128) plus a net wrap counter checked once in
  * eval(), so a transient prefix excursion that cancels out is fine no
  * matter the row/merge order.
  *
  * Null semantics match decimal SUM: null inputs are skipped; a group with
  * no non-null inputs yields null.
  */
/** The int128 exact-decimal accumulation kernel shared by
  * [[GraftDecimalSum]] (the aggregate) and [[GraftDecimalDot]] (the
  * per-row array fold): identical buffer layout
  * `[sumHi, sumLo, nonNullCount, wrapCounter]`, identical double→scaled-
  * long rounding (Spark's shortest-repr HALF_UP), identical overflow
  * discipline — so a dot product computed per row is bit-identical to
  * the exploded-dim `SUM(CAST(x·y AS DECIMAL(38,scale)))` it replaces. */
private[expressions] object Decimal128 {

  def pow10(scale: Int): Long = {
    require(scale >= 0 && scale <= 18,
      s"decimal scale must be in [0,18], got $scale")
    var p = 1L; var i = 0
    while (i < scale) { p *= 10L; i += 1 }
    p
  }

  /** Accumulate a signed 128-bit value (vHi, vLo) with wrap-around,
    * tracking the net wrap direction (see [[GraftDecimalSum]] scaladoc
    * for why wrapping adds + a net counter are exact and order-free). */
  def add128(buf: Array[Long], vHi: Long, vLo: Long): Unit = {
    val newLo = buf(1) + vLo
    val carry = if (java.lang.Long.compareUnsigned(newLo, buf(1)) < 0) 1L else 0L
    val newHi = buf(0) + vHi + carry
    if (((buf(0) ^ newHi) & (vHi ^ newHi)) < 0)
      buf(3) += (if (buf(0) >= 0) 1L else -1L)
    buf(0) = newHi
    buf(1) = newLo
    buf(2) += 1
  }

  /** HALF_UP(x·10^scale) as a long, bit-compatible with Spark's
    * double→decimal cast (shortest-repr rounding; FMA fast path defers
    * to the authoritative BigDecimal path near rounding boundaries). */
  def scaledLong(x: Double, scale: Int, pow: Double): Long = {
    val hi = x * pow
    if (math.abs(hi) > 4.5e15) return slowScaled(x, scale)
    val lo = Math.fma(x, pow, -hi)
    val n0 = Math.rint(hi)
    val d = (hi - n0) + lo
    if (math.abs(math.abs(d) - 0.5) <= Math.ulp(hi) + 1e-9)
      return slowScaled(x, scale)
    if (d > 0.5) n0.toLong + 1
    else if (d < -0.5) n0.toLong - 1
    else n0.toLong
  }

  def slowScaled(x: Double, scale: Int): Long =
    new JBigDecimal(java.lang.Double.toString(x))
      .setScale(scale, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def addBig(buf: Array[Long], big: BigInteger, what: => String): Unit = {
    if (big.bitLength > 126)
      throw new ArithmeticException(
        s"$what exceeds the int128 window")
    add128(buf, big.shiftRight(64).longValue(), big.longValue())
  }

  /** Double input: fast exact-scaled-long path inside the long window;
    * exact BigDecimal (shortest-repr) outside it. `w` null = unweighted. */
  def addFractional(buf: Array[Long], x: Double, w: java.lang.Long,
      scale: Int, pow: Double, what: => String): Unit = {
    if (math.abs(x * pow) >= 9.0e18) {
      var big = new JBigDecimal(java.lang.Double.toString(x))
        .setScale(scale, RoundingMode.HALF_UP).unscaledValue()
      if (w != null) big = big.multiply(BigInteger.valueOf(w.longValue()))
      addBig(buf, big, what)
      return
    }
    val s = scaledLong(x, scale, pow)
    if (w == null) add128(buf, s >> 63, s)
    else add128(buf, Math.multiplyHigh(s, w.longValue()), s * w.longValue())
  }

  /** Final buffer → nearest double (null when no terms, loud on wrap). */
  def evalDouble(buf: Array[Long], scale: Int, what: => String): Any = {
    if (buf(2) == 0) return null
    if (buf(3) != 0)
      throw new ArithmeticException(s"$what exceeds the int128 window")
    val loBytes = new Array[Byte](8)
    var i = 0
    while (i < 8) { loBytes(i) = (buf(1) >>> (56 - 8 * i)).toByte; i += 1 }
    val big = BigInteger.valueOf(buf(0)).shiftLeft(64)
      .add(new BigInteger(1, loBytes))
    new JBigDecimal(big, scale).doubleValue()
  }
}

case class GraftDecimalSum(
    child: Expression,
    scale: Int,
    weight: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child +: weight.toSeq
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dsum"

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType,
      weight.map(_.dataType).getOrElse(LongType)) match {
    case (DoubleType | FloatType | LongType | IntegerType,
          LongType | IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (t, w) => TypeCheckResult.TypeCheckFailure(
      s"graft_dsum expects (numeric [, integral weight]), got ${t.sql}, ${w.sql}")
  }

  private val pow: Double = math.pow(10.0, scale)
  private val pow10: Long = Decimal128.pow10(scale)

  // buffer: [sumHi, sumLo (unsigned), nonNullCount, wrapCounter]
  // wrapCounter = net number of ±2^128 wraps of the signed int128 sum.
  // Adds WRAP (mod 2^128, associative, so row/merge order never matters);
  // eval() fails iff the NET counter is nonzero — i.e. only when the final
  // total genuinely left the int128 window, not when a transient prefix did.
  // The arithmetic lives in [[Decimal128]] (shared with graft_ddot).
  override def createAggregationBuffer(): Array[Long] = new Array[Long](4)

  /** Long/int input: v·10^scale is exact in 128-bit for EVERY long (no
    * double round-trip, so values past 2^53 keep full precision). Weighted
    * products past 64 bits go through BigInteger. */
  private def addIntegral(buf: Array[Long], v: Long, w: java.lang.Long): Unit = {
    if (w == null) {
      Decimal128.add128(buf, Math.multiplyHigh(v, pow10), v * pow10)
    } else {
      val wl = w.longValue()
      val pLo = v * wl
      if (Math.multiplyHigh(v, wl) == (pLo >> 63)) { // v·w fits a long
        Decimal128.add128(buf, Math.multiplyHigh(pLo, pow10), pLo * pow10)
      } else {
        Decimal128.addBig(buf,
          BigInteger.valueOf(v).multiply(BigInteger.valueOf(wl))
            .multiply(BigInteger.valueOf(pow10)),
          s"graft_dsum overflow: |${child.sql} * 10^$scale|")
      }
    }
  }

  private def addFractional(buf: Array[Long], x: Double,
      w: java.lang.Long): Unit =
    Decimal128.addFractional(buf, x, w, scale, pow,
      s"graft_dsum overflow: |${child.sql} * 10^$scale|")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val w: java.lang.Long = weight match {
      case None => null
      case Some(we) =>
        val wv = we.eval(input)
        if (wv == null) return buf // null weight: row contributes nothing
        wv match {
          case l: java.lang.Long => l
          case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
          case other => java.lang.Long.valueOf(other.toString.toLong)
        }
    }
    v match {
      case l: java.lang.Long => addIntegral(buf, l.longValue(), w)
      case i: java.lang.Integer => addIntegral(buf, i.longValue(), w)
      case d: java.lang.Double => addFractional(buf, d.doubleValue(), w)
      case f: java.lang.Float => addFractional(buf, f.doubleValue(), w)
      case other => addFractional(buf, other.toString.toDouble, w)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val newLo = buf(1) + other(1)
    val carry = if (java.lang.Long.compareUnsigned(newLo, buf(1)) < 0) 1L else 0L
    val newHi = buf(0) + other(0) + carry
    if (((buf(0) ^ newHi) & (other(0) ^ newHi)) < 0)
      buf(3) += (if (buf(0) >= 0) 1L else -1L)
    buf(0) = newHi
    buf(1) = newLo
    buf(2) += other(2)
    buf(3) += other(3)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    // deferred overflow check: wrapping adds are associative mod 2^128, so a
    // transient excursion past the window cancels out; only a nonzero NET
    // wrap count means the true total is outside [-2^127, 2^127)
    Decimal128.evalDouble(buf, scale,
      s"graft_dsum overflow: SUM(${child.sql} * 10^$scale)")

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) { out(8 * i + j) = (buf(i) >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](4)
    var i = 0
    while (i < 4) {
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (bytes(8 * i + j) & 0xffL); j += 1 }
      buf(i) = v
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftDecimalSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftDecimalSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftDecimalSum =
    copy(child = newChildren(0),
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)
}

/** `graft_ddot(a, b, scale)` — the exact-decimal dot product of two
  * vectors as ONE per-row fold: Σ_i decimal(a_i·b_i) over the shared
  * [[Decimal128]] kernel, finished to double once. Bit-identical to the
  * exploded-dim formulation it replaces —
  * `groupBy(pair).agg(graft_dsum(x·y, scale))` — because each term takes
  * the identical double→decimal rounding and the int128 accumulation is
  * order-free; what disappears is the dims× row fan-out, the join that
  * re-paired the dimensions, and the pair-keyed aggregation (r17: q193
  * pushed 3M exploded rows through a hash aggregate to produce 48k
  * dots). Null elements on either side are skipped (the dsum null rule);
  * a pair with NO surviving terms yields null, matching an empty
  * aggregation group. Elements may be float or double; floats widen
  * exactly.
  *
  * LENGTH CONTRACT: when the vectors differ in length only the first
  * `min(|a|, |b|)` element pairs fold — the overlap semantics of the
  * exploded-dim inner join this expression replaced (a dimension present
  * on one side only had no join partner and contributed nothing). SQL
  * callers wanting a hard error on ragged inputs should guard with
  * `size(a) = size(b)` upstream.
  */
case class GraftDecimalDot(left: Expression, right: Expression, scale: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def vec(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (scale < 0 || scale > 18) TypeCheckResult.TypeCheckFailure(
      s"graft_ddot scale must be in [0,18], got $scale")
    else if (vec(left.dataType) && vec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ddot expects two array<float|double> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ddot"

  private val pow: Double = math.pow(10.0, scale)
  // lazy: dataType may only be read after resolution — an eager val would
  // throw UnresolvedException if the expression is constructed or copied
  // with unresolved children (r17 ADVICE)
  private lazy val leftDouble =
    left.dataType == ArrayType(DoubleType, true) ||
      left.dataType == ArrayType(DoubleType, false)
  private lazy val rightDouble =
    right.dataType == ArrayType(DoubleType, true) ||
      right.dataType == ArrayType(DoubleType, false)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = math.min(a.numElements(), b.numElements())
    val buf = new Array[Long](4)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (leftDouble) a.getDouble(i) else a.getFloat(i).toDouble
        val y = if (rightDouble) b.getDouble(i) else b.getFloat(i).toDouble
        Decimal128.addFractional(buf, x * y, null, scale, pow,
          s"graft_ddot overflow: |term * 10^$scale|")
      }
      i += 1
    }
    Decimal128.evalDouble(buf, scale, s"graft_ddot overflow: SUM * 10^$scale")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDdot", this,
      classOf[GraftDecimalDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = $ref.compute($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $res).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftDecimalDot =
    copy(left = newLeft, right = newRight)
}
