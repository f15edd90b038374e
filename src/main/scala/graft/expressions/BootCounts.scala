package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_boot_counts(id, salt, reps)` — the Poisson-bootstrap draw
  * vector for one row: an `array<int>` of `reps` Poisson(1)-ish counts,
  * each a pure function of `(salt, id, replicate)`.
  *
  * Batching: draw `r` reads 16-bit bucket `r % 8` of
  * `md5(salt || "|" || id || "#" || (r / 8))` — one digest feeds eight
  * replicates, so 40 replicates cost 5 md5s instead of 40. The bucket is
  * byte pair `(2q, 2q+1)` of the digest, numerically equal to the SQL
  * oracle's `CAST('0x' || substring(md5hex, q*4+1, 4) AS BIGINT)` (a hex
  * quad IS those two bytes), and the count thresholds are the pinned
  * 16-bit Poisson(1) CDF `round(CDF(k)·65536)` =
  * 24109/48219/60273/64292/65296, tail capped at 5.
  *
  * Why native: the composed form (array of md5 hexes before an explode,
  * then per-replicate substring + base-16 `conv`) allocates a hex string
  * and parses it back per (row, replicate) — measured 8.6 s at
  * sf0.1/40 reps vs 15.5 s for one-digest-per-replicate, still dominated
  * by UTF8String slicing. Here the digest bytes are consumed directly:
  * zero intermediate strings, one tight loop per row.
  */
case class GraftBootCounts(id: Expression, salt: Expression,
    reps: Expression) extends TernaryExpression {

  override def first: Expression = id
  override def second: Expression = salt
  override def third: Expression = reps

  override def checkInputDataTypes(): TypeCheckResult =
    (id.dataType, salt.dataType, reps.dataType) match {
      case (StringType, StringType, IntegerType)
          if salt.foldable && reps.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_boot_counts expects (string, string literal, int literal), " +
          s"got ${a.sql}, ${b.sql}, ${c.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_boot_counts"

  override protected def nullSafeEval(idv: Any, saltv: Any, repsv: Any): Any =
    compute(idv.asInstanceOf[UTF8String], saltv.asInstanceOf[UTF8String],
      repsv.asInstanceOf[Int])

  def compute(idv: UTF8String, saltv: UTF8String, nReps: Int): GenericArrayData = {
    val md = GraftMinHash.digest.get()
    val idBytes = idv.getBytes
    val saltBytes = saltv.getBytes
    val out = new Array[Any](nReps)
    var h = 0
    var r = 0
    while (r < nReps) {
      md.reset()
      md.update(saltBytes)
      md.update('|'.toByte)
      md.update(idBytes)
      md.update('#'.toByte)
      // chunk index as decimal ASCII (h < 10 covers reps <= 80; general
      // case uses the string form)
      if (h < 10) md.update(('0' + h).toByte)
      else md.update(h.toString.getBytes("UTF-8"))
      val d = md.digest()
      var q = 0
      while (q < 8 && r < nReps) {
        val bucket = ((d(2 * q) & 0xff) << 8) | (d(2 * q + 1) & 0xff)
        out(r) =
          if (bucket < 24109) 0
          else if (bucket < 48219) 1
          else if (bucket < 60273) 2
          else if (bucket < 64292) 3
          else if (bucket < 65296) 4
          else 5
        q += 1
        r += 1
      }
      h += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBootCounts", this,
      classOf[GraftBootCounts].getName)
    nullSafeCodeGen(ctx, ev, (idv, saltv, repsv) =>
      s"${ev.value} = $ref.compute($idv, $saltv, (int) $repsv);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): GraftBootCounts =
    copy(id = newFirst, salt = newSecond, reps = newThird)
}
