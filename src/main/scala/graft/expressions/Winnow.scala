package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_winnow(tokens, k, w, salt)` — winnowing fingerprint selection
  * (Schleimer/Wilkerson/Aiken, MOSS) in one native pass: hash every
  * `k`-token gram as `md5(salt ":" gram)`, slide a window of `w` hashes,
  * keep each window's minimum, return the DISTINCT selected hex digests.
  *
  * Bit-identical to the HOF formulation (`array_min` of md5 hex slices —
  * lexicographic hex order equals unsigned digest-byte order, see
  * [[GraftMinHash]]) and therefore to the DuckDB oracle.
  *
  * Why native: the HOF form nests the gram-hash `transform` INSIDE the
  * per-window lambda, and CollapseProject substitutes single-use
  * projections into lambdas — every window re-hashed every gram,
  * O(n²·w) md5 calls per document (measured 217 s at sf0.1 for the pair
  * report vs ~2 s here). This pass hashes each gram once and tracks
  * window minima with a monotonic deque — O(n) digests + O(n) compares
  * per document.
  *
  * Fewer than `k` tokens → empty array; fewer than `w` grams → one
  * fingerprint (the min of what exists). Grams touching a null token are
  * skipped (the HOF form hashed them to null and `array_min` ignored
  * nulls); windows with no valid gram contribute nothing.
  */
case class GraftWinnow(tokens: Expression, k: Expression, w: Expression,
    salt: Expression) extends QuaternaryExpression {

  override def first: Expression = tokens
  override def second: Expression = k
  override def third: Expression = w
  override def fourth: Expression = salt

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, k.dataType, w.dataType, salt.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType, StringType)
          if k.foldable && w.foldable && salt.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "graft_winnow expects (array<string>, int literal, int literal, " +
          s"string literal), got ${a.sql}, ${b.sql}, ${c.sql}, ${d.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(tv: Any, kv: Any, wv: Any,
      sv: Any): Any =
    compute(tv.asInstanceOf[ArrayData], kv.asInstanceOf[Int],
      wv.asInstanceOf[Int], sv.asInstanceOf[UTF8String])

  def compute(toks: ArrayData, k: Int, w: Int,
      salt: UTF8String): GenericArrayData = {
    val n = toks.numElements()
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val md = GraftMinHash.digest.get()
    val saltBytes = salt.getBytes
    val space = ' '.toByte
    val colon = ':'.toByte
    // gram digests, null where a gram touches a null token
    val hs = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      var ok = true
      var j = 0
      while (ok && j < k) {
        if (toks.getUTF8String(i + j) == null) ok = false
        j += 1
      }
      if (ok) {
        md.reset()
        md.update(saltBytes)
        md.update(colon)
        j = 0
        while (j < k) {
          if (j > 0) md.update(space)
          md.update(toks.getUTF8String(i + j).getBytes)
          j += 1
        }
        hs(i) = md.digest()
      }
      i += 1
    }
    // sliding minima via monotonic deque of indices (front = current min)
    val nWin = math.max(nGrams - w + 1, 1)
    val selected = new java.util.LinkedHashSet[String]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    var g = 0
    while (g < nGrams) {
      if (hs(g) != null) {
        while (tail > head &&
            !GraftMinHash.unsignedLess(hs(deque(tail - 1)), hs(g)))
          tail -= 1
        deque(tail) = g
        tail += 1
      }
      // window ending at g covers grams [g - w + 1, g]; windows are
      // j = 0..nWin-1 (0-based start), i.e. the first complete window
      // ends at min(w, nGrams) - 1
      val winStart = g - w + 1
      while (tail > head && deque(head) < winStart) head += 1
      val isWindowEnd = g >= math.min(w, nGrams) - 1 && winStart < nWin
      if (isWindowEnd && tail > head)
        selected.add(GraftMinHash.hex(hs(deque(head))))
      g += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWinnow", this,
      classOf[GraftWinnow].getName)
    nullSafeCodeGen(ctx, ev, (tv, kv, wv, sv) =>
      s"${ev.value} = $ref.compute($tv, (int) $kv, (int) $wv, $sv);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): GraftWinnow =
    copy(tokens = newFirst, k = newSecond, w = newThird, salt = newFourth)
}
