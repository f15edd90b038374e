package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-seed MinHash over a token array: for each seed s in 1..k,
  * `min over 3-token shingles of md5hex(s + ":" + shingle)` — one fused
  * pass over the tokens, all k minima tracked together.
  *
  * Bit-identical to the HOF formulation used by the r1 pipeline
  * (`array_min(transform(shingles, x -> md5(concat('s:', x))))`, see
  * operators/Dedup.scala) and therefore to the DuckDB oracle: md5 bytes are
  * the same, and lexicographic hex-string order equals unsigned byte order
  * of the digests, so minima are tracked on raw digests and hexed once at
  * the end.
  *
  * Why native: Spark 4 higher-order functions are interpreted (no codegen,
  * no subexpression elimination), and each of the k seeds re-walked the
  * shingle array allocating a hex-string array per row. Here the md5s for
  * all seeds stream over the shingles once with zero intermediate arrays —
  * the same reasoning as [[DotProduct]] (reference behavior:
  * /root/reference/src/lib/hist_basic.go has no minhash; this operator is a
  * training-data-pipeline extension).
  *
  * Returns array<string> of length k (nulls when there are < 3 tokens,
  * matching `array_min` of an empty transform).
  */
case class GraftMinHash(tokens: Expression, k: Expression)
  extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = k

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, k.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if k.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<string>, int literal), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(toks: Any, kv: Any): Any =
    compute(toks.asInstanceOf[ArrayData], kv.asInstanceOf[Int])

  /** One pass: for every 3-token shingle, update the running min digest of
    * every seed. Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val mins = new Array[Array[Byte]](k)
    if (n >= 3) {
      val md = GraftMinHash.digest.get()
      val space = " ".getBytes("UTF-8")
      var i = 0
      while (i <= n - 3) {
        // shingle bytes = tok[i] ' ' tok[i+1] ' ' tok[i+2]; a shingle with a
        // null token is skipped — the HOF formulation this replaces hashes
        // it to null and array_min ignores nulls
        val u0 = toks.getUTF8String(i)
        val u1 = toks.getUTF8String(i + 1)
        val u2 = toks.getUTF8String(i + 2)
        if (u0 != null && u1 != null && u2 != null) {
          val t0 = u0.getBytes
          val t1 = u1.getBytes
          val t2 = u2.getBytes
          var s = 1
          while (s <= k) {
            md.reset()
            md.update(GraftMinHash.seedPrefix(s))
            md.update(t0); md.update(space); md.update(t1); md.update(space); md.update(t2)
            val d = md.digest()
            val cur = mins(s - 1)
            if (cur == null || GraftMinHash.unsignedLess(d, cur)) mins(s - 1) = d
            s += 1
          }
        }
        i += 1
      }
    }
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      out(s) = if (mins(s) == null) null
        else UTF8String.fromString(GraftMinHash.hex(mins(s)))
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftMinhash", this, classOf[GraftMinHash].getName)
    nullSafeCodeGen(ctx, ev, (toks, kv) =>
      s"${ev.value} = $ref.compute($toks, (int) $kv);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftMinHash =
    copy(tokens = newLeft, k = newRight)
}

object GraftMinHash {
  private[expressions] val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  // seeds are small ints; cache their "s:" UTF-8 prefixes
  private val prefixCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
  private[expressions] def seedPrefix(s: Int): Array[Byte] =
    prefixCache.computeIfAbsent(s, i => s"$i:".getBytes("UTF-8"))

  /** Unsigned byte-array compare — equals lexicographic order of the hex
    * strings (each nibble maps monotonically to its hex digit). */
  private[expressions] def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private[expressions] def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
