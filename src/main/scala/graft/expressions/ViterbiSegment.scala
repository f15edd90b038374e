package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_viterbi_segment(word, pieces, scores) -> array<string>` — the
  * unigram-LM E-step kernel ([[graft.operators.Unigram]]): the maximum-
  * score segmentation of `word` into vocabulary pieces, where a
  * segmentation's score is the sum of its pieces' (log-probability)
  * scores. Classic Viterbi over cut positions: `best(i) = max_j
  * best(j) + score(word[j..i))`.
  *
  * Deterministic by construction: candidate cuts are scanned longest-
  * piece-first and replaced only on a STRICTLY greater score, so equal-
  * score ties resolve to the longest final piece — the same rule the
  * spec's in-memory reference implements. NULL when the word cannot be
  * covered (a character missing from the vocabulary); the trainer keeps
  * every seed character in the vocabulary precisely so this never
  * happens mid-training.
  *
  * The vocabulary arrives as two parallel array arguments (piece,
  * score) — in training these are LITERALS rebuilt from the bounded
  * model frame each round (the k-means broadcast-codebook convention),
  * so the piece→score map is built once per expression instance, not
  * per row; non-foldable vocab columns fall back to a per-row build.
  */
case class GraftViterbiSegment(wordE: Expression, piecesE: Expression,
    scoresE: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(wordE, piecesE, scoresE)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_viterbi_segment"
  override def checkInputDataTypes(): TypeCheckResult =
    (wordE.dataType, piecesE.dataType, scoresE.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_viterbi_segment expects (string, array<string>, array<double>)")
    }

  /** (piece → score, max piece length); built once when the vocab
    * arguments fold to constants. */
  @transient private lazy val foldedVocab: (java.util.HashMap[String, java.lang.Double], Int) =
    if (piecesE.foldable && scoresE.foldable)
      buildVocab(piecesE.eval(null).asInstanceOf[ArrayData],
        scoresE.eval(null).asInstanceOf[ArrayData])
    else null

  private def buildVocab(ps: ArrayData, ss: ArrayData)
      : (java.util.HashMap[String, java.lang.Double], Int) = {
    require(ps.numElements() == ss.numElements(),
      "graft_viterbi_segment: pieces and scores must align")
    val m = new java.util.HashMap[String, java.lang.Double](ps.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < ps.numElements()) {
      // null piece/score elements are skipped, not crashed on: the
      // registered function accepts containsNull arrays (the
      // ShingleHash/TextStats totality convention)
      if (!ps.isNullAt(i) && !ss.isNullAt(i)) {
        val p = ps.getUTF8String(i).toString
        m.put(p, ss.getDouble(i))
        if (p.length > maxLen) maxLen = p.length
      }
      i += 1
    }
    (m, maxLen)
  }

  def segment(word: UTF8String, ps: ArrayData, ss: ArrayData): ArrayData = {
    val fv = foldedVocab
    val (vocab, maxLen) = if (fv != null) fv else buildVocab(ps, ss)
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    java.util.Arrays.fill(back, -1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      // longest piece first; strictly-greater replacement → ties keep
      // the longest piece ending at i
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (back(j) >= 0 || j == 0) {
          val sc = vocab.get(w.substring(j, i))
          if (sc != null && best(j) + sc > best(i)) {
            best(i) = best(j) + sc
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    if (back(n) < 0) return null
    var cuts = List.empty[Int]
    var k = n
    while (k > 0) { cuts = k :: cuts; k = back(k) }
    val out = new Array[Any](cuts.length)
    var prev = 0
    var o = 0
    for (c <- cuts) {
      out(o) = UTF8String.fromString(w.substring(prev, c))
      prev = c
      o += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val w = wordE.eval(input)
    val ps = piecesE.eval(input)
    val ss = scoresE.eval(input)
    if (w == null || ps == null || ss == null) null
    else segment(w.asInstanceOf[UTF8String], ps.asInstanceOf[ArrayData],
      ss.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftViterbi", this,
      classOf[GraftViterbiSegment].getName)
    val gens = children.map(_.genCode(ctx))
    ev.copy(code = code"""
        ${gens.map(_.code.toString).mkString("\n")}
        boolean ${ev.isNull} =
          ${gens.map(_.isNull.toString).mkString(" || ")};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.segment(${gens(0).value}, ${gens(1).value},
            ${gens(2).value});
          ${ev.isNull} = ${ev.value} == null;
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftViterbiSegment =
    GraftViterbiSegment(newChildren(0), newChildren(1), newChildren(2))
}
