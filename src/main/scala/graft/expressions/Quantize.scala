package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_l2_normalize(array<float>) -> array<double>`: one fused pass —
  * norm from an in-order fold of squares (deterministic across engines),
  * then each element divided by it. A zero vector normalizes to NaNs
  * (IEEE x/0 — identical in any engine; filter zero vectors upstream). */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_l2_normalize expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; sum += x * x; i += 1 }
    val norm = math.sqrt(sum)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = a.getFloat(i).toDouble / norm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftL2", this, classOf[L2Normalize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (ArrayData) $ref.nullSafeEvalPub($a);")
  }
  def nullSafeEvalPub(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** `graft_quantize8(array<float>) -> struct<scale double, q array<tinyint>>`
  * — symmetric int8 quantization for embedding storage/transport:
  * `scale = 127 / max|x|`, `q_i = floor(x_i * scale + 0.5)` (the explicit
  * floor(+0.5) formulation rounds identically in every engine, unlike
  * round()'s half-even-vs-half-away ambiguity). Dequantize as `q / scale`;
  * at 100 TB this cuts embedding bytes 4x before a shuffle or sink. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize8 expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_quantize8"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getFloat(i).toDouble)
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = 127.0 / maxAbs // 0-vector → Infinity → q all 0·inf = NaN floor? guarded below
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      val v = if (maxAbs == 0.0) 0.0 else math.floor(a.getFloat(i).toDouble * scale + 0.5)
      q(i) = v.toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](if (maxAbs == 0.0) 0.0 else scale,
      new GenericArrayData(q)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftQ8", this, classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (InternalRow) $ref.nullSafeEvalPub($a);")
  }
  def nullSafeEvalPub(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}
