package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC container parse — the web-archive format CommonCrawl ships, i.e.
  * the byte layer UNDER the HTML tier: a crawl pipeline's very first hop
  * is WARC bytes → records → HTTP response split → body → `graft_html_*`.
  * Zero-dependency (ISO 28500 header walk + `java.util.zip` for the
  * customary per-record gzip members), like the other container parsers
  * ([[AudioMeta]], [[VideoMeta]]).
  *
  * `graft_warc_parse(binary) -> array<struct<rec_type string, uri string,
  * status int, mime string, location string, last_modified string,
  * etag string, body binary, date string, rec_offset bigint,
  * rec_length bigint>>`, one element per WARC record:
  *
  *  - gzip input (magic `1f 8b`) inflates first — multi-member streams
  *    (the warc.gz convention: one member per record) read end-to-end;
  *    decompressed size is capped at 256 MiB and the cap returns NULL
  *    (the PNG-FDICT lesson: a tiny crafted payload must not pin an
  *    executor; loud null over silent truncation);
  *  - records: `WARC/…` version line, then `Name: value` headers (ASCII
  *    case-insensitive names, obs-fold continuation lines joined with one
  *    space, values trimmed of spaces/tabs), a blank line, then exactly
  *    `Content-Length` block bytes; CR/LF runs between records are
  *    skipped (both CRLF and bare-LF line endings parse);
  *  - `uri` = `WARC-Target-URI`, surrounding `<…>` stripped (the WARC 1.0
  *    angle-bracket variant);
  *  - a `response` record whose block starts with `HTTP/` splits: `status`
  *    = the integer after the first space of the status line (exactly 3
  *    digits — a 4th digit rejects), `mime` = the HTTP `Content-Type`
  *    value verbatim (parameters kept), `location` = the HTTP `Location`
  *    value (the redirect target a frontier follows — r14; null when
  *    absent), `last_modified` / `etag` = the HTTP freshness validators
  *    (RFC 9110 §8.8.2/§8.8.3 — what an incremental recrawl sends back
  *    as `If-Modified-Since` / `If-None-Match`; strings kept VERBATIM,
  *    IMF-fixdate parsing belongs downstream via `to_timestamp`), `body`
  *    = the bytes after the HTTP header terminator (no terminator →
  *    empty body); any other record keeps `status` null, `mime` = the
  *    record-level `Content-Type`, the HTTP-only fields null, `body`
  *    = the whole block;
  *  - `date` = `WARC-Date` (ISO 28500 §5.4, the capture instant,
  *    verbatim — the CDX `ts` derives from it downstream), and
  *    `rec_offset`/`rec_length` = the record's extent IN THE RECORD
  *    STREAM (version line through the trailing CR/LF separators, so a
  *    `[offset, offset+length)` slice re-parses standalone — the
  *    buildIndex → fetchRecords round-trip contract). For plain WARC
  *    payloads these address the stored bytes; for warc.gz they address
  *    the INFLATED stream, not the compressed member (CDX offsets for
  *    compressed archives are member offsets, which a payload kernel
  *    cannot see — [[graft.operators.Crawl.buildIndex]] documents the
  *    restriction);
  *  - anything malformed — wrong magic, missing/invalid `Content-Length`,
  *    a block running past the input — returns NULL for the whole value
  *    (corrupt archives surface, never half-parse).
  *
  * Reference scope note: sybil ingests flattened JSON only
  * (src/sybil/ingest.go); WARC belongs to the training-data-pipeline
  * extension tier (q216 chains it into the HTML kernel).
  */
object WarcKernel {
  /** Decompressed-size cap (bytes): loud NULL past it. */
  val MaxInflated: Int = 256 << 20

  final class Rec(
      val recType: Array[Byte], // null when header absent
      val uri: Array[Byte],
      val status: java.lang.Integer,
      val mime: Array[Byte],
      val location: Array[Byte], // HTTP Location (redirect target)
      val lastModified: Array[Byte], // HTTP Last-Modified (RFC 9110 §8.8.2)
      val etag: Array[Byte], // HTTP ETag (RFC 9110 §8.8.3)
      val date: Array[Byte], // WARC-Date (ISO 28500 §5.4; capture instant)
      val bodyOff: Int,
      val bodyLen: Int,
      val recOff: Int, // record start (version line) in the record stream
      val recLen: Int) // through the record's trailing CR/LF separators

  private def isGzip(b: Array[Byte]): Boolean =
    b.length > 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  private[expressions] def looksGzip(b: Array[Byte]): Boolean = isGzip(b)

  /** Multi-member gzip inflate with the size cap; null on corruption.
    * Shared with the sitemap kernel (sitemap.xml.gz is the same
    * convention as warc.gz). */
  private[expressions] def gunzip(b: Array[Byte]): Array[Byte] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      // initial-size hint in Long: b.length*4 overflows Int past 512 MiB
      // and a negative hint throws OUTSIDE the IOException catch below
      val out = new java.io.ByteArrayOutputStream(
        math.min(b.length.toLong * 4, 1L << 20).toInt)
      val buf = new Array[Byte](64 << 10)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size() + n > MaxInflated) return null
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case _: java.io.IOException => null }
  }

  private def lowerEq(b: Array[Byte], s: Int, e: Int, name: String): Boolean = {
    if (e - s != name.length) return false
    var i = 0
    while (i < name.length) {
      var c = b(s + i).toInt
      if (c >= 'A' && c <= 'Z') c += 32
      if (c != name.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Kernel invocations — test observability (the CrawlAuditKernel
    * convention): operators that claim one-archive-pass plans
    * ([[graft.operators.Crawl.mergeGeneration]]) assert the delta. */
  val parseCount = new java.util.concurrent.atomic.AtomicLong

  /** (records, payloadBytes) — payload is the (possibly inflated) buffer
    * the records' body offsets index into; null on any malformation. */
  def parse(raw: Array[Byte]): (Array[Rec], Array[Byte]) = {
    parseCount.incrementAndGet()
    val b = if (isGzip(raw)) gunzip(raw) else raw
    if (b == null) return null
    val n = b.length
    val recs = new scala.collection.mutable.ArrayBuffer[Rec]()
    var i = 0
    def skipCrlf(): Unit =
      while (i < n && (b(i) == '\r' || b(i) == '\n')) i += 1
    /** Line end scan: returns (contentEnd, nextLineStart) packed. */
    def lineEnd(p0: Int): Long = {
      var p = p0
      while (p < n && b(p) != '\n') p += 1
      val ce = if (p > p0 && p <= n && p - 1 >= p0 && p - 1 < n &&
        b(p - 1) == '\r') p - 1
      else p
      ((ce.toLong) << 32) | math.min(p + 1, n).toLong
    }
    skipCrlf()
    while (i < n) {
      // record start — the version line's offset in the (inflated)
      // record stream; with the post-separator end below it makes each
      // record re-sliceable ([start, start+len) re-parses to exactly
      // this record — the buildIndex/fetchRecords contract)
      val recOff = i
      // version line
      if (i + 5 > n || b(i) != 'W' || b(i + 1) != 'A' || b(i + 2) != 'R' ||
        b(i + 3) != 'C' || b(i + 4) != '/') return null
      i = lineEnd(i).toInt
      // headers
      var recType: Array[Byte] = null
      var uri: Array[Byte] = null
      var recMime: Array[Byte] = null
      var recDate: Array[Byte] = null
      var contentLength = -1L
      var lastName: String = null
      var blank = false
      while (!blank && i < n) {
        val le = lineEnd(i)
        val ce = (le >>> 32).toInt
        val ls = i
        i = le.toInt
        if (ce == ls) blank = true
        else if (b(ls) == ' ' || b(ls) == '\t') {
          // obs-fold: extend the previous header's value with one space
          var vs = ls
          while (vs < ce && (b(vs) == ' ' || b(vs) == '\t')) vs += 1
          if (lastName != null && vs < ce) {
            val ext = java.util.Arrays.copyOfRange(b, vs, ce)
            def join(old: Array[Byte]): Array[Byte] =
              if (old == null) ext
              else {
                val j = new Array[Byte](old.length + 1 + ext.length)
                System.arraycopy(old, 0, j, 0, old.length)
                j(old.length) = ' '
                System.arraycopy(ext, 0, j, old.length + 1, ext.length)
                j
              }
            lastName match {
              case "warc-type" => recType = join(recType)
              case "warc-target-uri" => uri = join(uri)
              case "content-type" => recMime = join(recMime)
              case "warc-date" => recDate = join(recDate)
              case _ => ()
            }
          }
        } else {
          var c = ls
          while (c < ce && b(c) != ':') c += 1
          if (c < ce) {
            var vs = c + 1
            while (vs < ce && (b(vs) == ' ' || b(vs) == '\t')) vs += 1
            var ve = ce
            while (ve > vs && (b(ve - 1) == ' ' || b(ve - 1) == '\t')) ve -= 1
            val v = java.util.Arrays.copyOfRange(b, vs, ve)
            if (lowerEq(b, ls, c, "warc-type")) {
              recType = v; lastName = "warc-type"
            } else if (lowerEq(b, ls, c, "warc-target-uri")) {
              uri = v; lastName = "warc-target-uri"
            } else if (lowerEq(b, ls, c, "content-type")) {
              recMime = v; lastName = "content-type"
            } else if (lowerEq(b, ls, c, "warc-date")) {
              recDate = v; lastName = "warc-date"
            } else if (lowerEq(b, ls, c, "content-length")) {
              lastName = null // folding a length is malformed; ignore
              contentLength = 0L
              var k = vs
              if (k >= ve) contentLength = -1L
              while (k < ve && contentLength >= 0L) {
                val d = b(k)
                if (d >= '0' && d <= '9')
                  contentLength = contentLength * 10 + (d - '0')
                else contentLength = -1L
                if (contentLength > Int.MaxValue) contentLength = -1L
                k += 1
              }
            } else lastName = null
          } else lastName = null
        }
      }
      if (!blank || contentLength < 0L ||
        i + contentLength > n) return null
      val blockOff = i
      val blockLen = contentLength.toInt
      i += blockLen
      // strip <...> around the URI (WARC 1.0 angle-bracket variant)
      if (uri != null && uri.length >= 2 && uri(0) == '<' &&
        uri(uri.length - 1) == '>')
        uri = java.util.Arrays.copyOfRange(uri, 1, uri.length - 1)
      // HTTP split for response records
      var status: java.lang.Integer = null
      var mime = recMime
      var httpLoc: Array[Byte] = null
      var httpLm: Array[Byte] = null
      var httpEtag: Array[Byte] = null
      var bodyOff = blockOff
      var bodyLen = blockLen
      val isResponse = recType != null &&
        lowerEq(recType, 0, recType.length, "response")
      if (isResponse && blockLen >= 5 && b(blockOff) == 'H' &&
        b(blockOff + 1) == 'T' && b(blockOff + 2) == 'T' &&
        b(blockOff + 3) == 'P' && b(blockOff + 4) == '/') {
        val blockEnd = blockOff + blockLen
        // status = digits after the first space of the status line
        var p = blockOff
        while (p < blockEnd && b(p) != ' ' && b(p) != '\n') p += 1
        if (p < blockEnd && b(p) == ' ') {
          p += 1
          var v = 0
          var digits = 0
          while (p < blockEnd && b(p) >= '0' && b(p) <= '9' && digits < 3) {
            v = v * 10 + (b(p) - '0'); digits += 1; p += 1
          }
          // a 4th digit means this is not a 3-digit HTTP code: reject
          val more = p < blockEnd && b(p) >= '0' && b(p) <= '9'
          if (digits > 0 && !more) status = Integer.valueOf(v)
        }
        // headers until blank line; Content-Type overrides record mime,
        // Location is the redirect frontier's edge target
        var q = blockOff
        var httpBody = -1
        var httpMime: Array[Byte] = null
        // skip status line first
        while (q < blockEnd && b(q) != '\n') q += 1
        q = math.min(q + 1, blockEnd)
        var done = false
        while (!done && q < blockEnd) {
          var e = q
          while (e < blockEnd && b(e) != '\n') e += 1
          var ce2 = e
          if (ce2 > q && b(ce2 - 1) == '\r') ce2 -= 1
          if (ce2 == q) { httpBody = math.min(e + 1, blockEnd); done = true }
          else {
            var c2 = q
            while (c2 < ce2 && b(c2) != ':') c2 += 1
            if (c2 < ce2) {
              val isCt = lowerEq(b, q, c2, "content-type")
              val isLoc = !isCt && lowerEq(b, q, c2, "location")
              val isLm = !isCt && !isLoc && lowerEq(b, q, c2, "last-modified")
              val isEtag = !isCt && !isLoc && !isLm && lowerEq(b, q, c2, "etag")
              if (isCt || isLoc || isLm || isEtag) {
                var vs2 = c2 + 1
                while (vs2 < ce2 && (b(vs2) == ' ' || b(vs2) == '\t')) vs2 += 1
                var ve2 = ce2
                while (ve2 > vs2 && (b(ve2 - 1) == ' ' || b(ve2 - 1) == '\t'))
                  ve2 -= 1
                val v2 = java.util.Arrays.copyOfRange(b, vs2, ve2)
                if (isCt) httpMime = v2
                else if (isLoc) httpLoc = v2
                else if (isLm) httpLm = v2
                else httpEtag = v2
              }
            }
            q = math.min(e + 1, blockEnd)
          }
        }
        if (httpMime != null) mime = httpMime
        if (httpBody >= 0) { bodyOff = httpBody; bodyLen = blockEnd - httpBody }
        else { bodyOff = blockEnd; bodyLen = 0 } // headers never ended
      }
      // the record's extent runs through its trailing CR/LF separators
      // (= up to the next record's version line, or end of stream) so a
      // [recOff, recOff+recLen) slice re-parses standalone
      skipCrlf()
      recs += new Rec(recType, uri, status, mime, httpLoc, httpLm, httpEtag,
        recDate, bodyOff, bodyLen, recOff, i - recOff)
    }
    (recs.toArray, b)
  }
}

/** `graft_warc_parse(binary) -> array<struct<rec_type, uri, status, mime,
  * location, last_modified, etag, body, date, rec_offset, rec_length>>`
  * — see [[WarcKernel]]. NULL on malformed/over-cap input. */
case class GraftWarcParse(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_warc_parse expects binary, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rec_type", StringType, nullable = true),
    StructField("uri", StringType, nullable = true),
    StructField("status", IntegerType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("location", StringType, nullable = true),
    StructField("last_modified", StringType, nullable = true),
    StructField("etag", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false),
    StructField("date", StringType, nullable = true),
    StructField("rec_offset", LongType, nullable = false),
    StructField("rec_length", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_parse"

  override protected def nullSafeEval(input: Any): Any =
    evalWarc(input.asInstanceOf[Array[Byte]])

  /** Codegen entry point (shared with nullSafeEval). */
  def evalWarc(bytes: Array[Byte]): GenericArrayData =
    WarcKernel.parse(bytes) match {
      case null => null
      case (recs, buf) =>
        val out = new Array[Any](recs.length)
        var i = 0
        while (i < recs.length) {
          val r = recs(i)
          out(i) = new GenericInternalRow(Array[Any](
            if (r.recType == null) null else UTF8String.fromBytes(r.recType),
            if (r.uri == null) null else UTF8String.fromBytes(r.uri),
            if (r.status == null) null else r.status.intValue(),
            if (r.mime == null) null else UTF8String.fromBytes(r.mime),
            if (r.location == null) null
            else UTF8String.fromBytes(r.location),
            if (r.lastModified == null) null
            else UTF8String.fromBytes(r.lastModified),
            if (r.etag == null) null
            else UTF8String.fromBytes(r.etag),
            java.util.Arrays.copyOfRange(buf, r.bodyOff,
              r.bodyOff + r.bodyLen),
            if (r.date == null) null
            else UTF8String.fromBytes(r.date),
            r.recOff.toLong,
            r.recLen.toLong))
          i += 1
        }
        new GenericArrayData(out)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWarcParse", this,
      classOf[GraftWarcParse].getName)
    val tmp = ctx.freshName("warc")
    // evalWarc returns null on malformed input — propagate to isNull (a
    // bare assignment would NPE downstream consumers like explode)
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |Object $tmp = $ref.evalWarc($s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.GenericArrayData) $tmp; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftWarcParse = copy(child = newChild)
}
