package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two `array<float>` columns, with whole-stage
  * codegen (`doGenCode`) — the hot inner loop of every similarity operator.
  *
  * The built-in alternative (`aggregate(zip_with(...))`) allocates a zipped
  * array per row and evaluates the lambda interpreted (higher-order
  * functions don't participate in codegen). This expression is a tight
  * fused loop. Accumulation order (left-to-right from 0.0, each term
  * widened to double) matches the fold exactly, so results are
  * bit-identical with the HOF formulation and the DuckDB oracle.
  *
  * Null elements are skipped (embeddings never contain them; skipping keeps
  * the expression total).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two array<float> args, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        sum += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** [[DotProduct]]'s mixed-width sibling: `array<float>` embedding against
  * an `array<double>` weight vector (LSH hyperplanes are double literals —
  * narrowing them to float would flip near-zero projection signs and break
  * oracle parity). Same left-to-right fold from 0.0, so results are
  * bit-identical to `aggregate(zip_with(v, w, (x,wt) -> double(x)*wt))`
  * while running fused in codegen instead of interpreted. */
case class DotProductW(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dotw expects (array<float>, array<double>), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dotw"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        sum += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductW =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering graft's native expressions
  * (`spark.sql.extensions=graft.expressions.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  /** Fold a construction-time argument. Guarded: the expression must be
    * FOLDABLE and DETERMINISTIC before it is evaluated with no row — a
    * column argument would otherwise surface as a raw Catalyst
    * `Unevaluable` exception, and a foldable-but-nondeterministic one
    * (e.g. `rand()`) would be silently frozen at plan time. Failures are
    * a clean `AnalysisException` (the standard `NON_FOLDABLE_ARGUMENT`
    * error condition) naming the function and parameter. */
  private def litArg(e: Expression, fn: String, param: String,
      typ: String): Any = {
    if (!e.foldable || !e.deterministic)
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`",
          "paramType" -> s""""$typ""""),
        None)
    e.eval()
  }
  /** Numeric literal → Double (SQL decimal literals like `0.5` arrive as
    * Decimal, DataFrame `lit(0.5)` as Double). */
  private def litDouble(e: Expression, fn: String, param: String): Double =
    litArg(e, fn, param, "DOUBLE") match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case v => throw new IllegalArgumentException(
        s"$fn: expected a numeric literal for $param, got $v")
    }
  private def litLong(e: Expression, fn: String, param: String): Long =
    litArg(e, fn, param, "BIGINT") match {
      case d: org.apache.spark.sql.types.Decimal => d.toLong
      case n: java.lang.Number => n.longValue()
      case v => throw new IllegalArgumentException(
        s"$fn: expected a numeric literal for $param, got $v")
    }
  private def litInt(e: Expression, fn: String, param: String): Int =
    litLong(e, fn, param).toInt
  private def litString(e: Expression, fn: String, param: String): String =
    litArg(e, fn, param, "STRING") match {
      case null => throw new IllegalArgumentException(
        s"$fn: expected a string literal for $param, got null")
      case v => v.toString
    }
  private def litBool(e: Expression, fn: String, param: String): Boolean =
    litArg(e, fn, param, "BOOLEAN") match {
      case b: java.lang.Boolean => b.booleanValue()
      case v => throw new IllegalArgumentException(
        s"$fn: expected a boolean literal for $param, got $v")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[GraftMinHash].getName, "graft_minhash"),
      (children: Seq[Expression]) => GraftMinHash(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[GraftSimHash].getName, "graft_simhash"),
      (children: Seq[Expression]) => GraftSimHash(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dotw"),
      new ExpressionInfo(classOf[DotProductW].getName, "graft_dotw"),
      (children: Seq[Expression]) => DotProductW(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hash"),
      new ExpressionInfo(classOf[GraftShingleHash].getName, "graft_shingle_hash"),
      (children: Seq[Expression]) => GraftShingleHash(children(0),
        if (children.length > 1)
          litInt(children(1), "graft_shingle_hash", "k")
        else 3)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hash_all"),
      new ExpressionInfo(classOf[GraftShingleHashAll].getName,
        "graft_shingle_hash_all"),
      (children: Seq[Expression]) => GraftShingleHashAll(children(0),
        if (children.length > 1)
          litInt(children(1), "graft_shingle_hash_all", "k")
        else 3)))
    ext.injectFunction((
      FunctionIdentifier("graft_window_md5_all"),
      new ExpressionInfo(classOf[GraftWindowMd5All].getName,
        "graft_window_md5_all"),
      (children: Seq[Expression]) => GraftWindowMd5All(children(0),
        litInt(children(1), "graft_window_md5_all", "k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_image_dims"),
      new ExpressionInfo(classOf[ImageDims].getName, "graft_image_dims"),
      (children: Seq[Expression]) => ImageDims(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_audio_meta"),
      new ExpressionInfo(classOf[AudioMeta].getName, "graft_audio_meta"),
      (children: Seq[Expression]) => AudioMeta(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_video_meta"),
      new ExpressionInfo(classOf[VideoMeta].getName, "graft_video_meta"),
      (children: Seq[Expression]) => VideoMeta(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2_normalize"),
      (children: Seq[Expression]) => L2Normalize(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_quantize8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "graft_quantize8"),
      (children: Seq[Expression]) => QuantizeInt8(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_repetition"),
      new ExpressionInfo(classOf[GraftRepetition].getName, "graft_repetition"),
      (children: Seq[Expression]) => GraftRepetition(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[GraftShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => GraftShingles(children(0),
        if (children.length > 1)
          litInt(children(1), "graft_shingles", "k")
        else 3)))
    ext.injectFunction((
      FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[GraftCharEntropy].getName, "graft_char_entropy"),
      (children: Seq[Expression]) => GraftCharEntropy(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_dsum"),
      new ExpressionInfo(classOf[GraftDecimalSum].getName, "graft_dsum"),
      (children: Seq[Expression]) => GraftDecimalSum(children(0),
        litInt(children(1), "graft_dsum", "scale"),
        weight = children.drop(2).headOption)))
    ext.injectFunction((
      FunctionIdentifier("graft_ddot"),
      new ExpressionInfo(classOf[GraftDecimalDot].getName, "graft_ddot"),
      (children: Seq[Expression]) => GraftDecimalDot(children(0), children(1),
        litInt(children(2), "graft_ddot", "scale"))))
    ext.injectFunction((
      FunctionIdentifier("graft_vecsum"),
      new ExpressionInfo(classOf[GraftVecSum].getName, "graft_vecsum"),
      (children: Seq[Expression]) => GraftVecSum(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[GraftNormalizeText].getName,
        "graft_normalize_text"),
      (children: Seq[Expression]) => GraftNormalizeText(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_pii_count"),
      new ExpressionInfo(classOf[GraftPiiCount].getName, "graft_pii_count"),
      (children: Seq[Expression]) => GraftPiiCount(children(0),
        litString(children(1), "graft_pii_count", "kind"))))
    ext.injectFunction((
      FunctionIdentifier("graft_pii_redact"),
      new ExpressionInfo(classOf[GraftPiiRedact].getName, "graft_pii_redact"),
      (children: Seq[Expression]) => GraftPiiRedact(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      (children: Seq[Expression]) => DeflateLen(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_synth_ppm"),
      new ExpressionInfo(classOf[GraftSynthPpm].getName, "graft_synth_ppm"),
      (children: Seq[Expression]) => GraftSynthPpm(children(0), children(1),
        children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_ppm_phash"),
      new ExpressionInfo(classOf[GraftPpmPhash].getName, "graft_ppm_phash"),
      (children: Seq[Expression]) => GraftPpmPhash(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_ppm_resize"),
      new ExpressionInfo(classOf[GraftPpmResize].getName, "graft_ppm_resize"),
      (children: Seq[Expression]) => GraftPpmResize(children(0), children(1),
        children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_png_to_ppm"),
      new ExpressionInfo(classOf[GraftPngToPpm].getName, "graft_png_to_ppm"),
      (children: Seq[Expression]) => GraftPngToPpm(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_jpeg_to_ppm"),
      new ExpressionInfo(classOf[GraftJpegToPpm].getName, "graft_jpeg_to_ppm"),
      (children: Seq[Expression]) => GraftJpegToPpm(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_synth_jpeg"),
      new ExpressionInfo(classOf[GraftSynthJpeg].getName, "graft_synth_jpeg"),
      (children: Seq[Expression]) => GraftSynthJpeg(children(0), children(1),
        children(2), children(3), children(4))))
    ext.injectFunction((
      FunctionIdentifier("graft_synth_png"),
      new ExpressionInfo(classOf[GraftSynthPng].getName, "graft_synth_png"),
      (children: Seq[Expression]) => GraftSynthPng(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[GraftBloomContains].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) => GraftBloomContains(children(0),
        children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_boot_counts"),
      new ExpressionInfo(classOf[GraftBootCounts].getName, "graft_boot_counts"),
      (children: Seq[Expression]) => GraftBootCounts(children(0), children(1),
        children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[GraftWinnow].getName, "graft_winnow"),
      (children: Seq[Expression]) => GraftWinnow(children(0), children(1),
        children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_synth_wav"),
      new ExpressionInfo(classOf[GraftSynthWav].getName, "graft_synth_wav"),
      (children: Seq[Expression]) => GraftSynthWav(children(0), children(1),
        children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_wav_pcm_stats"),
      new ExpressionInfo(classOf[GraftWavPcmStats].getName,
        "graft_wav_pcm_stats"),
      (children: Seq[Expression]) => GraftWavPcmStats(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_wav_decimate"),
      new ExpressionInfo(classOf[GraftWavDecimate].getName,
        "graft_wav_decimate"),
      (children: Seq[Expression]) => GraftWavDecimate(children(0),
        children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_synth_flac"),
      new ExpressionInfo(classOf[GraftSynthFlac].getName, "graft_synth_flac"),
      (children: Seq[Expression]) => GraftSynthFlac(children(0), children(1),
        children(2), children(3), children(4))))
    ext.injectFunction((
      FunctionIdentifier("graft_flac_to_wav"),
      new ExpressionInfo(classOf[GraftFlacToWav].getName, "graft_flac_to_wav"),
      (children: Seq[Expression]) => GraftFlacToWav(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_synth_flac_n"),
      new ExpressionInfo(classOf[GraftSynthFlacN].getName, "graft_synth_flac_n"),
      (children: Seq[Expression]) => GraftSynthFlacN(children(0), children(1),
        children(2), children(3), children(4))))
    ext.injectFunction((
      FunctionIdentifier("graft_flac_meta"),
      new ExpressionInfo(classOf[GraftFlacMeta].getName, "graft_flac_meta"),
      (children: Seq[Expression]) => GraftFlacMeta(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_canon_url"),
      new ExpressionInfo(classOf[GraftCanonUrl].getName, "graft_canon_url"),
      (children: Seq[Expression]) => GraftCanonUrl(children(0),
        children.drop(1).headOption
          .exists(litBool(_, "graft_canon_url", "idn_fold")))))
    ext.injectFunction((
      FunctionIdentifier("graft_html_text"),
      new ExpressionInfo(classOf[GraftHtmlText].getName, "graft_html_text"),
      (children: Seq[Expression]) => GraftHtmlText(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_html_extract"),
      new ExpressionInfo(classOf[GraftHtmlExtract].getName,
        "graft_html_extract"),
      (children: Seq[Expression]) => GraftHtmlExtract(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_html_meta"),
      new ExpressionInfo(classOf[GraftHtmlMeta].getName, "graft_html_meta"),
      (children: Seq[Expression]) => GraftHtmlMeta(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_html_links"),
      new ExpressionInfo(classOf[GraftHtmlLinks].getName, "graft_html_links"),
      (children: Seq[Expression]) => GraftHtmlLinks(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_warc_parse"),
      new ExpressionInfo(classOf[GraftWarcParse].getName, "graft_warc_parse"),
      (children: Seq[Expression]) => GraftWarcParse(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_gzip"),
      new ExpressionInfo(classOf[GraftGzip].getName, "graft_gzip"),
      (children: Seq[Expression]) => GraftGzip(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_charset_guess"),
      new ExpressionInfo(classOf[GraftCharsetGuess].getName,
        "graft_charset_guess"),
      (children: Seq[Expression]) => GraftCharsetGuess(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_charset_fix"),
      new ExpressionInfo(classOf[GraftCharsetFix].getName,
        "graft_charset_fix"),
      (children: Seq[Expression]) => GraftCharsetFix(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_resolve_url"),
      new ExpressionInfo(classOf[GraftResolveUrl].getName,
        "graft_resolve_url"),
      (children: Seq[Expression]) => GraftResolveUrl(children(0),
        children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cdxj_parse"),
      new ExpressionInfo(classOf[GraftCdxjParse].getName,
        "graft_cdxj_parse"),
      (children: Seq[Expression]) => GraftCdxjParse(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_surt"),
      new ExpressionInfo(classOf[GraftSurt].getName, "graft_surt"),
      (children: Seq[Expression]) => GraftSurt(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_crawl_audit"),
      new ExpressionInfo(classOf[GraftCrawlAudit].getName,
        "graft_crawl_audit"),
      (children: Seq[Expression]) => GraftCrawlAudit(children(0),
        children.lift(1).map(litDouble(_, "graft_crawl_audit",
          "max_link_density")).getOrElse(0.5),
        children.lift(2).map(litLong(_, "graft_crawl_audit",
          "min_text_bytes")).getOrElse(50L))))
    ext.injectFunction((
      FunctionIdentifier("graft_robots_allowed"),
      new ExpressionInfo(classOf[GraftRobotsAllowed].getName,
        "graft_robots_allowed"),
      (children: Seq[Expression]) => GraftRobotsAllowed(children(0),
        children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_sitemap_parse"),
      new ExpressionInfo(classOf[GraftSitemapParse].getName,
        "graft_sitemap_parse"),
      (children: Seq[Expression]) => GraftSitemapParse(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_robots_delay"),
      new ExpressionInfo(classOf[GraftRobotsDelay].getName,
        "graft_robots_delay"),
      (children: Seq[Expression]) => GraftRobotsDelay(children(0),
        children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_viterbi_segment"),
      new ExpressionInfo(classOf[GraftViterbiSegment].getName,
        "graft_viterbi_segment"),
      (children: Seq[Expression]) => GraftViterbiSegment(children(0),
        children(1), children(2))))
  }
}
