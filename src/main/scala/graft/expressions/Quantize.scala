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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double __x = (double) $a.getFloat($i);
         |  $sum += __x * __x;
         |}
         |double $norm = Math.sqrt($sum);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = ((double) $a.getFloat($i)) / $norm;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
      val fields = ctx.freshName("fields")
      // (byte)(int) Math.floor(...) mirrors Scala's Double.toByte
      // truncation in nullSafeEval exactly (values are in [-127.5,
      // 127.5], so the int cast never clamps)
      s"""
         |int $n = $a.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double __x = Math.abs((double) $a.getFloat($i));
         |  if (__x > $maxAbs) $maxAbs = __x;
         |}
         |double $scale = 127.0 / $maxAbs;
         |byte[] $q = new byte[$n];
         |if ($maxAbs != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $q[$i] = (byte)(int) Math.floor(
         |      ((double) $a.getFloat($i)) * $scale + 0.5);
         |  }
         |}
         |Object[] $fields = new Object[2];
         |$fields[0] = Double.valueOf($maxAbs == 0.0 ? 0.0 : $scale);
         |$fields[1] = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($q);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow($fields);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}
