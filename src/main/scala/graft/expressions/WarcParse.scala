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
  * rec_length bigint, member_offset bigint, member_length bigint,
  * payload_digest string>>`, one element per WARC record:
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
  *    the INFLATED stream;
  *  - `member_offset`/`member_length` = the record's STORAGE extent —
  *    the coordinates a range GET against the stored file can serve.
  *    Plain WARC: equal to `rec_offset`/`rec_length`. warc.gz: the
  *    gzip-MEMBER run (compressed coordinates, from the kernel's own
  *    member walk) whose inflated bytes are exactly this record — the
  *    CommonCrawl CDX convention (one member per record), and each
  *    such slice is itself a complete gzip stream this kernel
  *    re-parses standalone. NULL (loud) when the packing is
  *    misaligned — e.g. a whole-file single-member gzip holding many
  *    records, which cannot be range-sliced per record;
  *  - `payload_digest` = `WARC-Payload-Digest` (ISO 28500 §5.9,
  *    verbatim `labelled-digest` e.g. `sha-256:<hex>`) — the header a
  *    `revisit` record (ISO 28500 §6.7.2 `identical-payload-digest`
  *    profile) uses to point at its original's payload, i.e. the field
  *    that lets [[graft.operators.Crawl.buildIndex]] index revisit
  *    records into the digest groups
  *    [[graft.operators.Crawl.collapseRevisits]] folds; null when the
  *    record carries none;
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
      val payloadDigest: Array[Byte], // WARC-Payload-Digest (ISO 28500 §5.9)
      val bodyOff: Int,
      val bodyLen: Int,
      val recOff: Int, // record start (version line) in the record stream
      val recLen: Int, // through the record's trailing CR/LF separators
      val memOff: Long, // record's STORAGE extent: the gzip member run
      val memLen: Long) // (compressed coords) or == rec extent; -1 = null

  /** One gzip member's extents: where its compressed bytes sit in the
    * stored stream, and where its inflated bytes landed in the record
    * stream — the mapping the CDX convention for `.warc.gz` is built
    * on (one member per record; member offsets are what a range GET
    * can actually serve). */
  final class GzMember(val compOff: Int, val compLen: Int,
      val infOff: Int, val infLen: Int)

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

  /** Member-TRACKING multi-member gunzip (RFC 1952, hand-walked): same
    * inflated output and loud-null rules as [[gunzip]], plus each
    * member's compressed and inflated extents — the coordinates
    * [[graft.operators.Crawl.buildIndex]] needs to emit range-GET-
    * servable offsets for `.warc.gz` (the CommonCrawl CDX convention
    * addresses gzip MEMBERS, one per record — invisible to a stream
    * API like GZIPInputStream, hence the manual header/trailer walk).
    * CRC32 and ISIZE verify per member (the GZIPInputStream checks);
    * trailing bytes after a member that do not open another member end
    * the stream (also the GZIPInputStream convention), while a corrupt
    * FIRST header, a truncated deflate body, a bad CRC, or the
    * [[MaxInflated]] cap return null. */
  private[expressions] def gunzipMembers(
      b: Array[Byte]): (Array[Byte], Array[GzMember]) = {
    val n = b.length
    val out = new java.io.ByteArrayOutputStream(
      math.min(b.length.toLong * 4, 1L << 20).toInt)
    val members = new scala.collection.mutable.ArrayBuffer[GzMember]()
    var pos = 0
    try {
      var done = false
      while (!done) {
        if (pos + 10 > n || (b(pos) & 0xff) != 0x1f ||
            (b(pos + 1) & 0xff) != 0x8b) {
          // not a member start: garbage after members ends the stream;
          // no member at all (caller checked the magic) is corruption
          if (members.isEmpty) return null
          done = true
        } else {
          val start = pos
          var bad = (b(pos + 2) & 0xff) != 8 // CM must be deflate
          val flg = b(pos + 3) & 0xff
          pos += 10
          if (!bad && (flg & 0x04) != 0) { // FEXTRA: XLEN (LE) + data
            if (pos + 2 > n) bad = true
            else {
              pos += 2 + ((b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8))
              if (pos > n) bad = true
            }
          }
          if (!bad && (flg & 0x08) != 0) { // FNAME: zero-terminated
            while (pos < n && b(pos) != 0) pos += 1
            if (pos >= n) bad = true else pos += 1
          }
          if (!bad && (flg & 0x10) != 0) { // FCOMMENT: zero-terminated
            while (pos < n && b(pos) != 0) pos += 1
            if (pos >= n) bad = true else pos += 1
          }
          if (!bad && (flg & 0x02) != 0) { // FHCRC
            pos += 2
            if (pos > n) bad = true
          }
          if (bad) {
            // corrupt FIRST header is corruption; a later one is the
            // trailing-garbage rule (GZIPInputStream parity)
            if (members.isEmpty) return null
            done = true
          } else {
            val inf = new java.util.zip.Inflater(true)
            try {
              inf.setInput(b, pos, n - pos)
              val crc = new java.util.zip.CRC32
              val infStart = out.size()
              val buf = new Array[Byte](64 << 10)
              while (!inf.finished()) {
                val k = inf.inflate(buf)
                if (k == 0 && inf.finished()) ()
                else if (k == 0) return null // truncated deflate body
                else {
                  if (out.size() + k > MaxInflated) return null
                  out.write(buf, 0, k)
                  crc.update(buf, 0, k)
                }
              }
              pos += inf.getBytesRead.toInt
              // trailer: CRC32 then ISIZE (mod 2^32), little-endian
              if (pos + 8 > n) return null
              def le4(p: Int): Long =
                (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
                  ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
              if (le4(pos) != crc.getValue) return null
              if (le4(pos + 4) !=
                (inf.getBytesWritten & 0xffffffffL)) return null
              pos += 8
              members += new GzMember(start, pos - start, infStart,
                out.size() - infStart)
            } finally inf.end()
          }
        }
      }
      (out.toByteArray, members.toArray)
    } catch { case _: java.util.zip.DataFormatException => null }
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
    var members: Array[GzMember] = null
    val b =
      if (isGzip(raw)) {
        val gm = gunzipMembers(raw)
        if (gm == null) return null
        members = gm._2
        gm._1
      } else raw
    if (b == null) return null
    val n = b.length
    val recs = new scala.collection.mutable.ArrayBuffer[Rec]()
    var i = 0
    var memCursor = 0
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
      var recDigest: Array[Byte] = null
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
              case "warc-payload-digest" => recDigest = join(recDigest)
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
            } else if (lowerEq(b, ls, c, "warc-payload-digest")) {
              recDigest = v; lastName = "warc-payload-digest"
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
      // STORAGE extent: plain input — the record extent itself; gzip
      // input — the contiguous member run whose INFLATED extent equals
      // the record's extent exactly (the warc.gz convention packs one
      // record per member; the trailing CR/LFs ride the same member).
      // Misaligned packing (e.g. a whole-file single member holding
      // many records) maps to -1 → null: LOUD, such an archive cannot
      // be range-sliced per record without re-packing
      var memOff = recOff.toLong
      var memLen = (i - recOff).toLong
      if (members != null) {
        memOff = -1L; memLen = -1L
        while (memCursor < members.length &&
          members(memCursor).infOff + members(memCursor).infLen <= recOff)
          memCursor += 1
        if (memCursor < members.length &&
            members(memCursor).infOff == recOff) {
          var j = memCursor
          var end = members(j).infOff + members(j).infLen
          while (end < i && j + 1 < members.length &&
              members(j + 1).infOff == end) {
            j += 1
            end = members(j).infOff + members(j).infLen
          }
          if (end == i) {
            memOff = members(memCursor).compOff.toLong
            memLen = (members(j).compOff + members(j).compLen -
              members(memCursor).compOff).toLong
          }
        }
      }
      recs += new Rec(recType, uri, status, mime, httpLoc, httpLm, httpEtag,
        recDate, recDigest, bodyOff, bodyLen, recOff, i - recOff,
        memOff, memLen)
    }
    (recs.toArray, b)
  }
}

/** `graft_warc_parse(binary) -> array<struct<rec_type, uri, status, mime,
  * location, last_modified, etag, body, date, rec_offset, rec_length,
  * member_offset, member_length, payload_digest>>` — see [[WarcKernel]].
  * NULL on malformed/over-cap input. */
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
    StructField("rec_length", LongType, nullable = false),
    StructField("member_offset", LongType, nullable = true),
    StructField("member_length", LongType, nullable = true),
    StructField("payload_digest", StringType, nullable = true))),
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
            r.recLen.toLong,
            if (r.memOff < 0L) null else r.memOff,
            if (r.memLen < 0L) null else r.memLen,
            if (r.payloadDigest == null) null
            else UTF8String.fromBytes(r.payloadDigest)))
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
