package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in ONE fused pass over the token
  * array: `struct(n_words, n_distinct, top_bigram, n_bigrams)`.
  *
  * The composed-operator formulation (explode bigrams → groupBy(doc, bigram)
  * → groupBy(doc) → join back) shuffles the ENTIRE exploded bigram stream
  * twice and joins — at 100 TB that is a corpus-sized shuffle for a signal
  * that is purely row-local. This expression computes the same numbers with
  * zero shuffles; the downstream fractions (Gopher-style duplicate-word /
  * top-bigram ratios, cf. reference-style per-column scans at
  * /root/reference/src/lib/table_query.go) become a pure projection.
  *
  * Exactness: distinct words are counted over the actual token strings
  * (hash set on UTF8String — no hashing-collision caveat), and bigram
  * counts key on the space-joined bigram string, matching the
  * `concat_ws(" ", slice(...))` semantics of the composed plan and the
  * DuckDB oracle's `array_to_string(w[i:i+1], ' ')` bit-for-bit.
  */
case class GraftRepetition(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  override def prettyName: String = "graft_repetition"

  override protected def nullSafeEval(toks: Any): Any =
    compute(toks.asInstanceOf[ArrayData])

  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData): InternalRow = {
    val len = toks.numElements()
    val distinct = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < len) {
      // split() never yields null tokens; mapping a hypothetical null to
      // empty keeps the expression total without a null-handling branch
      distinct.add(if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8
        else toks.getUTF8String(i))
      i += 1
    }
    var top = 0L
    var nBigrams = 0L
    if (len >= 2) {
      nBigrams = (len - 1).toLong
      val counts = new java.util.HashMap[UTF8String, Int]()
      i = 0
      while (i < len - 1) {
        val a = if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i)
        val b = if (toks.isNullAt(i + 1)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i + 1)
        val key = UTF8String.concatWs(Space, a, b)
        val c = counts.merge(key, 1, (x, y) => x + y)
        if (c > top) top = c.toLong
        i += 1
      }
    }
    InternalRow(len.toLong, distinct.size.toLong, top, nBigrams)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRepetition", this,
      classOf[GraftRepetition].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftRepetition =
    copy(child = newChild)
}

/** Distinct n-token shingle STRINGS of a token array, in one fused pass —
  * the string-output sibling of [[GraftShingleHash]] for paths where the
  * n-grams themselves are the result (boilerplate reports). Equivalent to
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(toks, i+1, n))))` — same first-occurrence order, same
  * space-joining, same empty-array result for short docs — but the HOF
  * chain runs interpreted and re-materializes slices per shingle; this is
  * a single pass that participates in whole-stage codegen.
  */
case class GraftShingles(child: Expression, n: Int = 3) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles shingle width must be >= 1, got $n")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(toks: Any): Any =
    compute(toks.asInstanceOf[ArrayData])

  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftShingles", this,
      classOf[GraftShingles].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftShingles =
    copy(child = newChild)
}

/** Shannon entropy (bits/char) of a string's code-point distribution in
  * ONE row-local pass — the character-diversity quality signal (gibberish
  * and binary-ish text score near-uniform high; template/repetitive text
  * scores low). The composed formulation (explode per character → two
  * groupBys → join) shuffles a corpus-sized per-character stream for a
  * signal that never leaves the row; this is zero-shuffle and fuses into
  * the scan.
  *
  * Determinism contract: terms `-(c/n)·log2(c/n)` are accumulated in
  * ASCENDING code-point order, so the IEEE sum is partition-independent
  * and reproducible against an oracle folding a sorted character list in
  * the same order (UTF-8 byte order == code-point order). log2 is the one
  * transcendental — engines may differ in the last ulp, so catalog
  * comparisons round to 6 decimals (the q45 convention).
  */
case class GraftCharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy expects string, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(s: Any): Any =
    compute(s.asInstanceOf[UTF8String])

  private val Log2 = math.log(2.0)

  def compute(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      sum += -p * (math.log(p) / Log2)
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCharEntropy", this,
      classOf[GraftCharEntropy].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftCharEntropy =
    copy(child = newChild)
}
