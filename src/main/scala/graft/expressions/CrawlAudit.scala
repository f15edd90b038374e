package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Loss accounting for the crawl ingest — the counted funnel
  * [[graft.operators.Crawl.cleanCorpus]] is missing on its own: that
  * operator's kernels return loud NULLs on malformed input, but
  * `explode` then turns a NULL into ZERO rows, so at 100 TB a corrupt
  * archive, a 404 storm, or an over-eager boilerplate threshold all
  * look identical — rows that simply aren't there. The reference counts
  * what it skips (`BLOCKS SKIPPED`, sybil table_query.go:383; ingest
  * warnings cmd_ingest.go); a production ingest needs the same.
  *
  * `graft_crawl_audit(payload binary, max_link_density double,
  * min_text_bytes bigint) -> struct<…>` runs the WHOLE cleanCorpus
  * funnel over one archive in ONE kernel pass (parse once, classify
  * every record, extract only gate-passed pages — exactly the work
  * cleanCorpus's surviving rows pay, no more) and returns per-archive
  * counters, each the count of records leaving the funnel at that
  * stage, in funnel order:
  *
  *  - `records` — WARC records parsed (0 when the archive is malformed);
  *  - `parse_nulls` — 1 when the payload is NULL or `graft_warc_parse`
  *    returned its loud NULL (corrupt/over-cap archive), else 0;
  *  - `non_response` — records whose `WARC-Type` is not `response`
  *    (warcinfo, request, metadata, …);
  *  - `gated_status` — response records with HTTP status ≠ 200 (or no
  *    parseable HTTP status line at all);
  *  - `gated_mime` — 200 responses whose `Content-Type` is not
  *    `text/html…`;
  *  - `charset_fallbacks` — gate-passed pages whose bytes fell back to
  *    windows-1252 (`graft_charset_guess`). NOT a drop — these pages
  *    continue down the funnel — but the canary for encoding rot;
  *  - `dropped_small` — gate-passed pages whose extracted
  *    `text_bytes < min_text_bytes`;
  *  - `dropped_boilerplate` — remaining pages whose link density
  *    (`anchor_text_bytes / text_bytes`, the [[graft.operators
  *    .HtmlExtract.linkDensity]] division) exceeds `max_link_density`;
  *  - `kept` — pages cleanCorpus emits.
  *
  * Invariants (spec-pinned): `records = non_response + gated_status +
  * gated_mime + dropped_small + dropped_boilerplate + kept`, and
  * `charset_fallbacks ≤ dropped_small + dropped_boilerplate + kept`.
  * The struct is NEVER null (a null payload is a counted loss, not a
  * silent one), and every field is a plain sum — `auditCorpus` rolls
  * archives up with map-side partial aggregation and ships nine longs
  * per group, not payloads.
  */
object CrawlAuditKernel {

  /** Field order of the output struct / the `counts` array. */
  val Fields: Seq[String] = Seq("records", "parse_nulls", "non_response",
    "gated_status", "gated_mime", "charset_fallbacks", "dropped_small",
    "dropped_boilerplate", "kept")

  private val HtmlPrefix = "text/html".getBytes("US-ASCII")

  private def isHtmlMime(m: Array[Byte]): Boolean = {
    if (m == null || m.length < HtmlPrefix.length) return false
    var i = 0
    while (i < HtmlPrefix.length) {
      if (m(i) != HtmlPrefix(i)) return false
      i += 1
    }
    true
  }

  /** Kernel invocations — test observability: the operator plan must
    * evaluate the funnel ONCE per archive (not once per output field). */
  val auditCount = new java.util.concurrent.atomic.AtomicLong

  /** The funnel counters for one archive; indices follow [[Fields]]. */
  def audit(payload: Array[Byte], maxLinkDensity: Double,
      minTextBytes: Long): Array[Long] = {
    auditCount.incrementAndGet()
    val c = new Array[Long](9)
    val parsed = if (payload == null) null else WarcKernel.parse(payload)
    if (parsed == null) { c(1) = 1L; return c }
    val (recs, buf) = parsed
    c(0) = recs.length.toLong
    var i = 0
    while (i < recs.length) {
      val r = recs(i)
      val isResponse = r.recType != null && r.recType.length == 8 && {
        var k = 0; var eq = true
        while (eq && k < 8) {
          var ch = r.recType(k).toInt
          if (ch >= 'A' && ch <= 'Z') ch += 32
          eq = ch == "response".charAt(k); k += 1
        }
        eq
      }
      if (!isResponse) c(2) += 1L
      else if (r.status == null || r.status.intValue() != 200) c(3) += 1L
      else if (!isHtmlMime(r.mime)) c(4) += 1L
      else {
        val body = java.util.Arrays.copyOfRange(buf, r.bodyOff,
          r.bodyOff + r.bodyLen)
        if (!CharsetKernel.isAscii(body) && !CharsetKernel.validUtf8(body))
          c(5) += 1L // windows-1252 fallback (kept in the funnel)
        val e = HtmlKernel.extract(CharsetKernel.fix(body))
        val textBytes = e.text.length.toLong
        if (textBytes < minTextBytes) c(6) += 1L
        else {
          // same IEEE division as HtmlExtract.linkDensity; textBytes >= 1
          // here because minTextBytes is required >= 1
          val ld = e.anchorTextBytes.toDouble / textBytes.toDouble
          if (ld > maxLinkDensity) c(7) += 1L else c(8) += 1L
        }
      }
      i += 1
    }
    c
  }
}

/** `graft_crawl_audit(binary, double, bigint) -> struct<records,
  * parse_nulls, non_response, gated_status, gated_mime,
  * charset_fallbacks, dropped_small, dropped_boilerplate, kept>` — see
  * [[CrawlAuditKernel]]. Never null: a NULL payload counts as a
  * `parse_nulls` loss. Thresholds are construction-time constants
  * (literals at the SQL surface) so the funnel matches one specific
  * cleanCorpus configuration. */
case class GraftCrawlAudit(child: Expression, maxLinkDensity: Double,
    minTextBytes: Long) extends UnaryExpression {
  require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
    s"graft_crawl_audit: max_link_density must be in [0,1], got " +
      maxLinkDensity)
  require(minTextBytes >= 1L,
    s"graft_crawl_audit: min_text_bytes must be >= 1, got $minTextBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_crawl_audit expects binary payload, got ${t.sql}")
  }
  override def dataType: DataType = StructType(
    CrawlAuditKernel.Fields.map(f => StructField(f, LongType,
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_crawl_audit"

  override def eval(input: InternalRow): Any =
    evalAudit(child.eval(input).asInstanceOf[Array[Byte]])

  /** Codegen entry point (shared with eval); accepts null payloads. */
  def evalAudit(payload: Array[Byte]): InternalRow = {
    val c = CrawlAuditKernel.audit(payload, maxLinkDensity, minTextBytes)
    val out = new Array[Any](c.length)
    var i = 0
    while (i < c.length) { out(i) = c(i); i += 1 }
    new GenericInternalRow(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCrawlAudit", this,
      classOf[GraftCrawlAudit].getName)
    val in = child.genCode(ctx)
    // total expression: a null payload still produces a (counted) row
    ev.copy(code = code"""
        ${in.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          $ref.evalAudit(${in.isNull} ? null : ${in.value});""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftCrawlAudit = copy(child = newChild)
}
