package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(bloomBytes, long) -> boolean` — probe a
  * serialized `org.apache.spark.util.sketch.BloomFilter` for a 64-bit
  * hash, fully inside whole-stage codegen.
  *
  * The bloom side must be FOLDABLE (a literal): it is deserialized ONCE
  * on the driver and travels to executors inside the codegen references
  * array — which rides the per-stage broadcast taskBinary, so the
  * transfer cost equals an explicit `SparkContext.broadcast` of the same
  * filter. This is Spark's own design for bloom pushdown (the internal
  * `BloomFilterMightContain` evaluates its bloom child once and probes
  * via a cached filter); a row UDF doing the same probe would blind
  * whole-stage codegen across the filter stage — the reason this
  * expression exists (it replaced the engine's last hot-path lambda in
  * [[graft.operators.Decontam.overlapViaBloom]]).
  *
  * A null bloom or null probe value yields null (never a silent
  * pass-through), mirroring `might_contain`.
  */
case class GraftBloomContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        if (left.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains: the bloom argument must be foldable " +
            "(a serialized-filter literal)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (binary, bigint), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"
  override def nullable: Boolean = bloom == null || right.nullable

  /** Deserialized once (driver side at planning/codegen, executor side on
    * first interpreted eval after deserialization of the references).
    * Guarded on `left.foldable`: `nullable` runs during ANALYSIS, before
    * checkInputDataTypes is consulted — forcing `left.eval(null)` on an
    * attribute child would throw UnsupportedOperationException there and
    * mask the clean 'must be foldable' type-check error. */
  @transient private lazy val bloom: BloomFilter = {
    if (!left.foldable) null
    else {
      val bytes = left.eval(null).asInstanceOf[Array[Byte]]
      if (bytes == null) null
      else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }
  }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) return null
    val v = right.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloom == null) {
      ev.copy(code = code"", isNull = TrueLiteral,
        value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
      val rightGen = right.genCode(ctx)
      ev.copy(code = code"""
        ${rightGen.code}
        boolean ${ev.isNull} = ${rightGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${rightGen.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftBloomContains =
    copy(left = newLeft, right = newRight)
}
