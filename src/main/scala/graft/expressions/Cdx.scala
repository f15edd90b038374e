package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CDXJ crawl-index records + SURT keys — the layer that makes 100 TB
  * archives QUERYABLE without scanning them: CommonCrawl publishes a
  * per-crawl CDXJ index (one line per capture: SURT key, 14-digit
  * timestamp, flat JSON metadata with the capture's WARC `filename`/
  * `offset`/`length`), and a selective pipeline filters THE INDEX first,
  * then range-reads only the matching records. Zero-dependency, like
  * the WARC/sitemap walkers; formats are public conventions (pywb's
  * CDXJ, the Heritrix SURT transform).
  *
  * `graft_cdxj_parse(line string) -> struct<urlkey string, ts string,
  * url string, mime string, status int, digest string, length bigint,
  * offset bigint, filename string, languages string>`:
  *
  *  - line = `<urlkey> <ts> <json>`, split on the first two spaces;
  *    `ts` must be 4–17 digits (the CDX convention, usually 14);
  *  - the JSON block is a FLAT object; string values are unescaped
  *    (`\"
  *    \\ \/ \b \f \n \r \t \uXXXX`); bare numbers keep their literal
  *    text, `true`/`false`/`null` and nested objects/arrays are SKIPPED
  *    (a `null` mime is an absent field, never the string "null");
  *    unknown keys ignored, our keys extracted;
  *  - `status`/`length`/`offset` arrive as JSON STRINGS by convention
  *    (pywb writes them quoted); bare JSON numbers are accepted too;
  *    non-numeric → that field null, never a guess — and a "status"
  *    past 999 nulls too (3-digit HTTP codes only; truncating a corrupt
  *    wide value to an in-range int would FABRICATE a success code);
  *  - anything structurally malformed (missing spaces, bad ts, JSON
  *    that does not parse to a flat object) → NULL for the whole value,
  *    the loud-null kernel rule.
  *
  * `graft_surt(url string) -> string` — the Sort-friendly URI
  * Reordering Transform key the index is sorted by, with pywb's
  * canonicalization defaults, DOCUMENTED here as this engine's exact
  * semantics: lowercase everything; drop scheme, userinfo, fragment,
  * and the scheme's DEFAULT port (http/ws 80, https/wss 443, ftp 21;
  * an unknown scheme has no default, so its port always keeps) —
  * a NON-default port is RETAINED as `host-key:port)` the way
  * pywb/Heritrix SURTs keep it (`com,example:8080)/`): distinct
  * origins must not collide onto one key; strip one leading `www\d*.`
  * host label; reverse host labels joined by commas, then `)`; a
  * bracketed IPv6 authority (`[2001:db8::1]`) keeps the bracketed
  * literal VERBATIM un-reversed (commas separate reversed registered-
  * name labels; an address literal has none) with the same port rule
  * applied after the closing bracket; path kept (lowercase,
  * trailing-slash-only path folds to `/`); query parameters sorted
  * bytewise and re-joined with `&` (empty query dropped). NULL on
  * non-absolute/malformed URLs. NOTE: this is the EXTERNAL-index join
  * key; `graft_canon_url` remains the engine's internal dedup key — the
  * two are deliberately different normalizations (SURT is lossy:
  * case-folded path, stripped www) and a spec pins the difference.
  *
  * KEY-FORMAT BREAK (r16): before r16 this kernel DROPPED every port
  * and nulled bracketed IPv6 authorities; it now retains non-default
  * ports (`com,example:8080)`) and keeps v6 literals verbatim — the
  * pywb/CommonCrawl rules. A urlkey persisted by the pre-r16 kernel
  * for a non-default-port or IPv6 URL will NOT join against newly
  * computed keys: rebuild any stored SURT-keyed index (re-run
  * [[graft.operators.Crawl.buildIndex]] / re-key the stored frame)
  * before mixing eras. Keys for default-port, portless, and
  * registered-name URLs — the overwhelming majority — are unchanged.
  *
  * Reference scope: sybil has no crawl surface (README.md:30-34);
  * training-data-pipeline extension tier.
  */
object CdxKernel {

  val Fields: Seq[String] = Seq("urlkey", "ts", "url", "mime", "status",
    "digest", "length", "offset", "filename", "languages")

  /** Parsed record; string fields null when absent. */
  final class Rec(
      val urlkey: String, val ts: String, val url: String,
      val mime: String, val status: java.lang.Integer,
      val digest: String, val length: java.lang.Long,
      val offset: java.lang.Long, val filename: String,
      val languages: String)

  /** One CDXJ line → Rec; null on structural malformation. */
  def parse(line: String): Rec = {
    if (line == null) return null
    val s1 = line.indexOf(' ')
    if (s1 <= 0) return null
    val s2 = line.indexOf(' ', s1 + 1)
    if (s2 <= s1 + 1) return null
    val urlkey = line.substring(0, s1)
    val ts = line.substring(s1 + 1, s2)
    if (ts.length < 4 || ts.length > 17 || !ts.forall(c => c >= '0' && c <= '9'))
      return null
    val fields = parseFlatJson(line, s2 + 1)
    if (fields == null) return null
    def g(k: String): String = fields.getOrElse(k, null)
    def num(k: String): java.lang.Long = {
      val v = g(k)
      if (v == null || v.isEmpty || !v.forall(c => c >= '0' && c <= '9') ||
        v.length > 18) null
      else java.lang.Long.valueOf(v)
    }
    // HTTP status codes are 3 digits; anything larger is corruption and
    // nulls the field rather than TRUNCATING to a fabricated code
    // ("4294967496".toInt would wrap to 200 — never guess)
    val st0 = num("status")
    val st = if (st0 != null && st0.longValue() > 999L) null else st0
    new Rec(urlkey, ts, g("url"), g("mime"),
      if (st == null) null else Integer.valueOf(st.intValue()),
      g("digest"), num("length"), num("offset"), g("filename"),
      g("languages"))
  }

  /** Flat-JSON object scan from `from` to end of string: returns the
    * string-valued fields (numbers/true/false/null coerced to their
    * literal text; nested objects/arrays skipped balanced). Null on
    * malformation. */
  private def parseFlatJson(s: String, from: Int): Map[String, String] = {
    val n = s.length
    var i = from

    def skipWs(): Unit = while (i < n && (s(i) == ' ' || s(i) == '\t')) i += 1

    def parseString(): String = {
      if (i >= n || s(i) != '"') return null
      i += 1
      val b = new java.lang.StringBuilder
      while (i < n && s(i) != '"') {
        val c = s(i)
        if (c == '\\') {
          if (i + 1 >= n) return null
          s(i + 1) match {
            case '"' => b.append('"'); i += 2
            case '\\' => b.append('\\'); i += 2
            case '/' => b.append('/'); i += 2
            case 'b' => b.append('\b'); i += 2
            case 'f' => b.append('\f'); i += 2
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'u' =>
              if (i + 5 >= n) return null
              val hex = s.substring(i + 2, i + 6)
              if (!hex.forall(h => (h >= '0' && h <= '9') ||
                (h >= 'a' && h <= 'f') || (h >= 'A' && h <= 'F')))
                return null
              b.append(Integer.parseInt(hex, 16).toChar)
              i += 6
            case _ => return null
          }
        } else { b.append(c); i += 1 }
      }
      if (i >= n) return null
      i += 1 // closing quote
      b.toString
    }

    def skipBalanced(): Boolean = {
      var depth = 0
      var inStr = false
      while (i < n) {
        val c = s(i)
        if (inStr) {
          if (c == '\\') i += 1
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '{' | '[' => depth += 1
          case '}' | ']' =>
            depth -= 1
            if (depth == 0) { i += 1; return true }
          case _ => ()
        }
        i += 1
      }
      false
    }

    skipWs()
    if (i >= n || s(i) != '{') return null
    i += 1
    val out = Map.newBuilder[String, String]
    skipWs()
    var ok = true
    var done = false
    if (i < n && s(i) == '}') { i += 1; done = true }
    while (ok && !done) {
      skipWs()
      val k = parseString()
      if (k == null) { ok = false }
      else {
        skipWs()
        if (i >= n || s(i) != ':') ok = false
        else {
          i += 1
          skipWs()
          if (i >= n) ok = false
          else s(i) match {
            case '"' =>
              val v = parseString()
              if (v == null) ok = false else out += (k -> v)
            case '{' | '[' =>
              if (!skipBalanced()) ok = false
            case _ =>
              // bare JSON value: numbers are kept as their literal text
              // (bare status/length/offset acceptance), true/false/null
              // are SKIPPED (per the scaladoc: non-string values skip),
              // anything else — including an EMPTY value, which is not
              // JSON at all — is malformation
              val st = i
              while (i < n && s(i) != ',' && s(i) != '}') i += 1
              if (i >= n) ok = false
              else {
                val t = s.substring(st, i).trim
                if (t.isEmpty) ok = false
                else if (t == "true" || t == "false" || t == "null") ()
                else if (t.forall(c => (c >= '0' && c <= '9') || c == '-'
                  || c == '+' || c == '.' || c == 'e' || c == 'E'))
                  out += (k -> t)
                else ok = false
              }
          }
          if (ok) {
            skipWs()
            if (i < n && s(i) == ',') i += 1
            else if (i < n && s(i) == '}') { i += 1; done = true }
            else ok = false
          }
        }
      }
    }
    if (!ok) return null
    // trailing garbage after the object is malformation, not decoration
    skipWs()
    if (i != n) return null
    out.result()
  }

  /** SURT key for an absolute URL — see the object scaladoc for the
    * exact documented semantics. Null on malformed/non-absolute. */
  def surt(url: String): String = {
    if (url == null) return null
    val lower = {
      // ASCII-only lowercase, locale-proof (the RobotsKernel rule)
      val a = url.toCharArray
      var i = 0
      while (i < a.length) {
        val c = a(i)
        if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
        i += 1
      }
      new String(a)
    }
    val schemeEnd = lower.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = lower.substring(0, schemeEnd)
    if (!scheme.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      || c == '+' || c == '-' || c == '.')) return null
    var rest = lower.substring(schemeEnd + 3)
    // fragment off first
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    // authority ends at the FIRST of '/' or '?' — a query can appear
    // with no path at all (http://h?a=1), and a '/' INSIDE that query
    // must not be mistaken for the path start (the UrlResolve.parse
    // rule: strip '?' before the authority/path split)
    val slash = rest.indexOf('/')
    val qmark = rest.indexOf('?')
    val cut =
      if (slash < 0) qmark
      else if (qmark >= 0 && qmark < slash) qmark
      else slash
    var authority = if (cut < 0) rest else rest.substring(0, cut)
    var pathQ =
      if (cut < 0) "/"
      else if (rest(cut) == '?') "/" + rest.substring(cut)
      else rest.substring(cut)
    // userinfo off
    val at = authority.lastIndexOf('@')
    if (at >= 0) authority = authority.substring(at + 1)
    // host/port split — a bracketed IPv6 literal carries colons INSIDE
    // the brackets, so the port colon is only searched after ']'
    var hostPart: String = null
    var portStr: String = null
    if (authority.startsWith("[")) {
      val close = authority.indexOf(']')
      if (close < 0) return null // unterminated v6 literal
      hostPart = authority.substring(0, close + 1)
      if (hostPart.length <= 2) return null // "[]"
      val after = authority.substring(close + 1)
      if (after.nonEmpty) {
        if (after(0) != ':') return null // garbage after the bracket
        portStr = after.substring(1)
      }
    } else {
      val colon = authority.indexOf(':')
      if (colon >= 0) {
        hostPart = authority.substring(0, colon)
        portStr = authority.substring(colon + 1)
      } else hostPart = authority
    }
    if (portStr != null) {
      if (portStr.isEmpty) portStr = null // "host:" — empty port drops
      else if (!portStr.forall(c => c >= '0' && c <= '9') ||
        portStr.length > 9) return null
    }
    if (hostPart.isEmpty) return null
    // the scheme's default port drops (pywb keeps only NON-default
    // ports in the key); numeric compare so ":080" folds like ":80"
    val port: String =
      if (portStr == null) null
      else {
        val p = Integer.parseInt(portStr)
        val default = scheme match {
          case "http" | "ws" => 80
          case "https" | "wss" => 443
          case "ftp" => 21
          case _ => -1 // unknown scheme: no default, port always keeps
        }
        if (p == default) null else String.valueOf(p)
      }
    // one leading www\d*. label strips (the pywb canonicalization rule);
    // hand-rolled — a per-row kernel must not compile a regex per call;
    // never applies to a bracketed v6 literal (it cannot start with 'w')
    val host = {
      var h = hostPart
      if (h.startsWith("www")) {
        var i = 3
        while (i < h.length && h(i) >= '0' && h(i) <= '9') i += 1
        if (i < h.length && h(i) == '.' && i + 1 < h.length)
          h = h.substring(i + 1)
      }
      h
    }
    if (host.isEmpty) return null
    // reversed-label key; a bracketed v6 literal keeps verbatim (no
    // registered-name labels to reverse)
    val key0 =
      if (host.charAt(0) == '[') host
      else host.split('.').reverse.mkString(",")
    val key = if (port == null) key0 else key0 + ":" + port
    // query params sort bytewise; empty query drops
    val qm = pathQ.indexOf('?')
    val (path0, query) =
      if (qm < 0) (pathQ, null)
      else (pathQ.substring(0, qm), pathQ.substring(qm + 1))
    val path = if (path0.isEmpty) "/" else path0
    val q2 =
      if (query == null || query.isEmpty) null
      else query.split("&", -1).filter(_.nonEmpty).sorted.mkString("&")
    key + ")" + path + (if (q2 == null || q2.isEmpty) "" else "?" + q2)
  }
}

/** `graft_cdxj_parse(string) -> struct<…>` — see [[CdxKernel]]. */
case class GraftCdxjParse(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdxj_parse expects string, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("urlkey", StringType, nullable = true),
    StructField("ts", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("status", IntegerType, nullable = true),
    StructField("digest", StringType, nullable = true),
    StructField("length", LongType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("filename", StringType, nullable = true),
    StructField("languages", StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cdxj_parse"

  override protected def nullSafeEval(input: Any): Any =
    evalCdx(input.asInstanceOf[UTF8String])

  def evalCdx(line: UTF8String): InternalRow = {
    val r = CdxKernel.parse(if (line == null) null else line.toString)
    if (r == null) return null
    def s(v: String): Any = if (v == null) null else UTF8String.fromString(v)
    new GenericInternalRow(Array[Any](s(r.urlkey), s(r.ts), s(r.url),
      s(r.mime), if (r.status == null) null else r.status.intValue(),
      s(r.digest), if (r.length == null) null else r.length.longValue(),
      if (r.offset == null) null else r.offset.longValue(),
      s(r.filename), s(r.languages)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCdxjParse", this,
      classOf[GraftCdxjParse].getName)
    val tmp = ctx.freshName("cdx")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |Object $tmp = $ref.evalCdx($s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.InternalRow) $tmp; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftCdxjParse = copy(child = newChild)
}

/** `graft_surt(string) -> string` — see [[CdxKernel.surt]]. */
case class GraftSurt(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_surt expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_surt"

  override protected def nullSafeEval(input: Any): Any =
    evalSurt(input.asInstanceOf[UTF8String])

  def evalSurt(url: UTF8String): UTF8String = {
    val r = CdxKernel.surt(if (url == null) null else url.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSurt", this,
      classOf[GraftSurt].getName)
    val tmp = ctx.freshName("surt")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |org.apache.spark.unsafe.types.UTF8String $tmp = $ref.evalSurt($s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftSurt = copy(child = newChild)
}
