package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap parsing (sitemaps.org protocol 0.9) — the third frontier
  * source beside outlinks and redirects: site owners PUBLISH their URL
  * inventory, and a crawl that ignores it re-discovers the site the slow
  * way. Zero-dependency single-pass XML-subset walker (the full XML spec
  * is not needed — the protocol fixes the vocabulary), with the same
  * loud-NULL discipline as the other container kernels:
  *
  * `graft_sitemap_parse(binary) -> array<struct<kind string, loc string,
  * lastmod string, changefreq string, priority double>>`:
  *
  *  - gzip payloads (magic `1f 8b`) inflate first — sitemap.xml.gz is
  *    the same convention as warc.gz, same 256 MiB bomb cap → NULL;
  *  - a `<urlset>` document yields one element per `<url>` with
  *    `kind = 'url'`; a `<sitemapindex>` yields one per `<sitemap>`
  *    with `kind = 'sitemap'` (the recursion pointer — feed the locs
  *    back through fetch + this kernel);
  *  - element names match by LOCAL name, ASCII case-sensitively per XML
  *    (`ns:loc` matches `loc`) — sitemaps customarily use a default
  *    namespace but generators disagree about prefixes;
  *  - `loc` text is entity-decoded (the five XML predefined entities +
  *    decimal/hex charrefs — the protocol requires escaping) and
  *    trimmed; an entry with no non-empty `loc` is SKIPPED (the spec
  *    makes loc mandatory; a location-less entry carries no edge);
  *  - `lastmod` / `changefreq` come back as trimmed raw strings (W3C
  *    datetime parsing composes downstream via `to_timestamp` — the
  *    kernel does not guess calendars); `priority` parses as a strict
  *    double (digits + one optional dot) and is null otherwise;
  *  - comments (`<!-- -->`), CDATA sections (their text is taken
  *    verbatim, per XML), processing instructions, and the XML
  *    declaration are handled; any structural malformation — no
  *    root `urlset`/`sitemapindex`, an unterminated tag or comment —
  *    returns NULL for the whole value (corrupt feeds surface, never
  *    half-parse).
  *
  * SitemapSpec pins hand-built fixtures for every branch and
  * differential-fuzzes loc extraction against the JDK's own XML parser
  * (`javax.xml.parsers.DocumentBuilder`) on generated documents.
  * Reference scope: sybil has no XML surface; training-data-pipeline
  * crawl tier (q229).
  */
object SitemapKernel {

  final class Entry(val kind: String, val loc: String, val lastmod: String,
      val changefreq: String, val priority: java.lang.Double)

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** Local name of a possibly-prefixed element name. */
  private def localName(n: String): String = {
    val i = n.lastIndexOf(':')
    if (i < 0) n else n.substring(i + 1)
  }

  /** Decode the five predefined entities + numeric charrefs; a malformed
    * entity keeps the '&' literal (lenient like the HTML kernel — feed
    * bugs should not zero a whole sitemap's URL). */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val sc = s.indexOf(';', i + 1)
        val body = if (sc > i && sc - i <= 12) s.substring(i + 1, sc) else null
        val rep: String = body match {
          case null => null
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case b if b.length > 1 && b.charAt(0) == '#' =>
            try {
              val cp = if (b.charAt(1) == 'x' || b.charAt(1) == 'X')
                Integer.parseInt(b.substring(2), 16)
              else Integer.parseInt(b.substring(1))
              if (cp < 0 || cp > 0x10ffff) null
              else new String(Character.toChars(cp))
            } catch { case _: Exception => null }
          case _ => null
        }
        if (rep == null) { sb.append('&'); i += 1 }
        else { sb.append(rep); i = sc + 1 }
      }
    }
    sb.toString
  }

  private def strictDouble(s: String): java.lang.Double = {
    val ok = s.nonEmpty && s.forall(ch =>
      (ch >= '0' && ch <= '9') || ch == '.') &&
      s.count(_ == '.') <= 1 && s.exists(_.isDigit)
    if (!ok) null else java.lang.Double.valueOf(s)
  }

  /** Parse; null on malformation. */
  def parse(raw: Array[Byte]): Array[Entry] = {
    val b = if (WarcKernel.looksGzip(raw)) WarcKernel.gunzip(raw) else raw
    if (b == null) return null
    val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    val n = s.length
    var i = 0
    var rootKind: String = null // "url" for urlset, "sitemap" for index
    var inEntry = false
    var loc: String = null
    var lastmod: String = null
    var changefreq: String = null
    var priority: java.lang.Double = null
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    /** Collect the text content run starting at `p` up to the next
      * start/end tag: ordinary character runs are ENTITY-DECODED, CDATA
      * sections are verbatim (per XML — their bytes are literal),
      * comments vanish. Text lands in `textBuf`; returns the new
      * position, or -1 on an unterminated construct. */
    val textBuf = new StringBuilder
    def readText(p0: Int): Int = {
      textBuf.setLength(0)
      var p = p0
      var runStart = p0
      def flushRun(end: Int): Unit =
        if (end > runStart)
          textBuf.append(decodeEntities(s.substring(runStart, end)))
      var go = true
      while (go && p < n) {
        if (s.charAt(p) == '<') {
          if (s.startsWith("<![CDATA[", p)) {
            flushRun(p)
            val e = s.indexOf("]]>", p + 9)
            if (e < 0) return -1
            textBuf.append(s.substring(p + 9, e))
            p = e + 3; runStart = p
          } else if (s.startsWith("<!--", p)) {
            flushRun(p)
            val e = s.indexOf("-->", p + 4)
            if (e < 0) return -1
            p = e + 3; runStart = p
          } else go = false
        } else p += 1
      }
      flushRun(p)
      p
    }
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (s.startsWith("<!--", lt)) {
        val e = s.indexOf("-->", lt + 4)
        if (e < 0) return null
        i = e + 3
      } else if (s.startsWith("<![CDATA[", lt)) {
        val e = s.indexOf("]]>", lt + 9)
        if (e < 0) return null
        i = e + 3
      } else if (lt + 1 < n &&
          (s.charAt(lt + 1) == '?' || s.charAt(lt + 1) == '!')) {
        val e = s.indexOf('>', lt + 2)
        if (e < 0) return null
        i = e + 1
      } else {
        val close = lt + 1 < n && s.charAt(lt + 1) == '/'
        val ns = if (close) lt + 2 else lt + 1
        var ne = ns
        while (ne < n && !isWs(s.charAt(ne)) && s.charAt(ne) != '>' &&
          s.charAt(ne) != '/') ne += 1
        if (ne >= n) return null
        val name = localName(s.substring(ns, ne))
        val gt = s.indexOf('>', ne)
        if (gt < 0) return null
        val selfClose = !close && gt > lt && s.charAt(gt - 1) == '/'
        i = gt + 1
        if (!close) {
          name match {
            case "urlset" => if (rootKind == null) rootKind = "url"
            case "sitemapindex" => if (rootKind == null) rootKind = "sitemap"
            case "url" | "sitemap" if rootKind != null && !inEntry =>
              inEntry = true
              loc = null; lastmod = null; changefreq = null; priority = null
            case "loc" | "lastmod" | "changefreq" | "priority"
                if inEntry && !selfClose =>
              val p2 = readText(i)
              if (p2 < 0) return null
              val v = textBuf.toString.trim
              name match {
                case "loc" => if (v.nonEmpty) loc = v
                case "lastmod" => if (v.nonEmpty) lastmod = v
                case "changefreq" => if (v.nonEmpty) changefreq = v
                case "priority" => priority = strictDouble(v)
              }
              i = p2
            case _ => ()
          }
        } else {
          name match {
            case "url" | "sitemap" if inEntry =>
              inEntry = false
              if (loc != null)
                out += new Entry(rootKind, loc, lastmod, changefreq,
                  priority)
            case _ => ()
          }
        }
      }
    }
    if (rootKind == null) return null
    out.toArray
  }
}

/** `graft_sitemap_parse(binary) -> array<struct<kind, loc, lastmod,
  * changefreq, priority>>` — see [[SitemapKernel]]. NULL on malformed
  * or over-cap input. */
case class GraftSitemapParse(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sitemap_parse expects binary, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_parse"

  override protected def nullSafeEval(input: Any): Any =
    evalSitemap(input.asInstanceOf[Array[Byte]])

  /** Codegen entry point (shared with nullSafeEval). */
  def evalSitemap(bytes: Array[Byte]): GenericArrayData =
    SitemapKernel.parse(bytes) match {
      case null => null
      case entries =>
        val out = new Array[Any](entries.length)
        var i = 0
        while (i < entries.length) {
          val e = entries(i)
          out(i) = new GenericInternalRow(Array[Any](
            UTF8String.fromString(e.kind),
            UTF8String.fromString(e.loc),
            if (e.lastmod == null) null else UTF8String.fromString(e.lastmod),
            if (e.changefreq == null) null
            else UTF8String.fromString(e.changefreq),
            if (e.priority == null) null else e.priority.doubleValue()))
          i += 1
        }
        new GenericArrayData(out)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSitemapParse", this,
      classOf[GraftSitemapParse].getName)
    val tmp = ctx.freshName("sitemap")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |Object $tmp = $ref.evalSitemap($s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.GenericArrayData) $tmp; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftSitemapParse = copy(child = newChild)
}
