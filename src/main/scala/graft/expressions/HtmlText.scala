package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction kernel — the first stage of every crawl-derived
  * training-data pipeline (boilerplate stripping, link-density filtering),
  * which the engine lacked until r13. Zero-dependency single pass over the
  * UTF-8 bytes (the [[PiiKernel]] / [[GraftNormalizeText]] treatment): each
  * byte is touched O(1) times, multi-byte text passes through verbatim, and
  * the only allocations are the output buffer and one short lowercased name
  * per tag.
  *
  * The semantics are DEFINED here (HTML5-tokenizer-shaped, deterministic,
  * total — any byte string extracts) rather than delegated to a library,
  * so the DuckDB oracles can replay the text formula arithmetically:
  *
  * '''Markup''' — at `<`, the next byte decides (the HTML5 "less-than sign
  * in data" rule):
  *  - ASCII letter → start tag: name is the `[A-Za-z0-9-]` run, lowercased;
  *    the remainder is skipped quote-aware (`>` inside `"…"`/`'…'` does not
  *    end the tag); a `/` immediately before the closing `>` (outside
  *    quotes) marks the tag self-closing (documented approximation of the
  *    HTML5 unquoted-attr edge). Unterminated at EOF → dropped, uncounted.
  *  - `/` + ASCII letter → end tag (same quote-aware skip);
  *    `/` + anything else → bogus comment, dropped to the next `>`.
  *  - `!--` → comment, dropped to the next `-->` (unterminated → to EOF);
  *    `!` otherwise → declaration (doctype/CDATA), dropped to the next `>`;
  *    `?` → processing instruction, dropped to the next `>`.
  *  - anything else (digit, space, `<`, EOF) → the `<` is literal text.
  *
  * '''Raw text''' — a non-self-closing `script`/`style` start tag switches
  * to raw-text mode: bytes are DROPPED (counted in `dropped_bytes`) until
  * the case-insensitive `</script`/`</style` followed by whitespace, `/`,
  * or `>`; the closing tag then parses normally. Unterminated → rest of
  * input dropped.
  *
  * '''Entities''' — decoded in text only (attributes are skipped wholesale):
  * the named set `&amp; &lt; &gt; &quot; &apos;` plus `&nbsp;` (decoded to
  * a COLLAPSIBLE space — the pipeline-friendly choice, documented) and
  * numeric `&#123;` / `&#x1F;` forms (code points 1–0x10FFFF excluding
  * surrogates; anything else → U+FFFD). A malformed or unknown entity
  * leaves `&` as literal text and scanning continues after it, so `&amp`
  * and `&bogus;` pass through verbatim. Decoded `<` is text, never
  * re-parsed as markup.
  *
  * '''Whitespace & blocks''' — the whitespace set is exactly
  * `{space, \t, \n, \r, \f}` (NOT `\x0B`, matching the RE2/Java common
  * subset so oracles can replay collapsing with `[ \t\n\r\f]+`); runs
  * collapse to one space; decoded whitespace (incl. `&nbsp;`) collapses
  * identically. Tags in [[HtmlKernel.BlockTags]] (structural + block-level
  * elements, open/close/self-closing alike) end the current segment;
  * non-empty segments join with a single `\n` and the result carries no
  * leading/trailing whitespace. `pre` content collapses like everything
  * else (documented scope — collapsing is uniform).
  *
  * '''Counters''' (the boilerplate/link-density signals, jusText-style):
  * `n_tags` (start+end tags, excl. comments/declarations/PIs and dropped
  * unterminated tags), `text_bytes` (UTF-8 bytes of the extracted text),
  * `n_links` (`<a` start tags), `anchor_text_bytes` (text bytes emitted
  * while ≥ 1 `<a>` is open — separators attributed by depth at flush
  * time), `n_blocks` (non-empty segments), `dropped_bytes` (raw-text bytes
  * dropped inside script/style), `html_bytes` (input length). Link density
  * = `anchor_text_bytes / text_bytes` is the classic boilerplate filter
  * ([[graft.operators.HtmlExtract]]).
  *
  * Reference scope note: sybil has no HTML surface (it ingests flattened
  * JSON — src/sybil/ingest.go); this is part of the training-data-pipeline
  * extension tier, like Dedup/Similarity/TextAnalysis.
  */
object HtmlKernel {

  /** Extraction result: the text bytes plus the stat counters.
    * `links` is null unless the pass collected outlinks; the four
    * document-metadata fields are null unless the pass collected meta
    * (and individually null when the page lacks them). */
  final class Result(
      val text: Array[Byte],
      val nTags: Long,
      val nLinks: Long,
      val anchorTextBytes: Long,
      val nBlocks: Long,
      val droppedBytes: Long,
      val htmlBytes: Long,
      val links: Array[Array[Byte]] = null,
      val title: Array[Byte] = null,
      val lang: Array[Byte] = null,
      val canonical: Array[Byte] = null,
      val description: Array[Byte] = null)

  /** Structural + block-level elements whose tags end a text segment. */
  val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title",
      "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6",
      "li", "ul", "ol", "dl", "dt", "dd",
      "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
      "blockquote", "pre", "section", "article", "header", "footer",
      "nav", "aside", "main", "form", "fieldset", "figure", "figcaption",
      "address", "center").foreach(s.add)
    s
  }

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  private def isAlpha(c: Byte): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  private def isNameByte(c: Byte): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '-'
  private def lower(c: Byte): Byte =
    if (c >= 'A' && c <= 'Z') (c + 32).toByte else c

  /** Entity decode attempt at `i` (pointing at `&`), scanning below `end`:
    * packed `(codePoint << 32) | nextPos`, or -1 when the shape is
    * malformed/unknown and the `&` must stay literal. The ONE entity
    * grammar shared by the text path and the href-value path. */
  private def entAt(b: Array[Byte], end: Int, i: Int): Long = {
    if (i + 1 >= end) return -1L
    if (b(i + 1) == '#') {
      var j = i + 2
      var hex = false
      if (j < end && (b(j) == 'x' || b(j) == 'X')) { hex = true; j += 1 }
      val d0 = j
      var v = 0
      var overflow = false
      while (j < end && {
        val d = b(j)
        val dv =
          if (d >= '0' && d <= '9') d - '0'
          else if (hex && d >= 'a' && d <= 'f') d - 'a' + 10
          else if (hex && d >= 'A' && d <= 'F') d - 'A' + 10
          else -1
        if (dv >= 0) {
          v = v * (if (hex) 16 else 10) + dv
          if (v > 0x10ffff) { v = 0x110000; overflow = true }
          true
        } else false
      }) j += 1
      if (j > d0 && j < end && b(j) == ';') {
        val cp =
          if (overflow || v == 0 || v > 0x10ffff ||
            (v >= 0xd800 && v <= 0xdfff)) 0xfffd
          else v
        (cp.toLong << 32) | (j + 1).toLong
      } else -1L
    } else if (isAlpha(b(i + 1))) {
      var j = i + 1
      while (j < end && isAlpha(b(j)) && j - i <= 8) j += 1
      if (j < end && b(j) == ';') {
        val name = new String(b, i + 1, j - i - 1,
          java.nio.charset.StandardCharsets.US_ASCII)
        val cp = name match {
          case "amp" => '&'.toInt
          case "lt" => '<'.toInt
          case "gt" => '>'.toInt
          case "quot" => '"'.toInt
          case "apos" => '\''.toInt
          case "nbsp" => 0xa0
          case _ => -1
        }
        if (cp >= 0) (cp.toLong << 32) | (j + 1).toLong else -1L
      } else -1L
    } else -1L
  }

  /** The FIRST `target`-named attribute's value range inside a tag's
    * attribute region `[from, till)` (`till` excludes the closing `>`),
    * packed `(vs << 32) | ve`, or -1 when absent/valueless. Attribute
    * grammar (WHATWG-shaped, documented): skip whitespace and `/`; name
    * runs to whitespace, `=`, or `/`; an optional `=` takes a
    * `"…"`/`'…'` quoted value or an unquoted run to whitespace (so an
    * unquoted value keeps an embedded or trailing `/` — the self-closing
    * approximation's counterpart); the first attribute with the target
    * name CARRYING a value wins (ASCII case-insensitive; a bare
    * valueless attribute contributes nothing). */
  private def findAttr(b: Array[Byte], from: Int, till: Int,
      target: String): Long = {
    var i = from
    while (i < till) {
      while (i < till && (isWs(b(i)) || b(i) == '/')) i += 1
      if (i >= till) return -1L
      val ns = i
      while (i < till && !isWs(b(i)) && b(i) != '=' && b(i) != '/') i += 1
      val ne = i
      while (i < till && isWs(b(i))) i += 1
      var vs = -1; var ve = -1
      if (i < till && b(i) == '=') {
        i += 1
        while (i < till && isWs(b(i))) i += 1
        if (i < till && (b(i) == '"' || b(i) == '\'')) {
          val q = b(i); i += 1; vs = i
          while (i < till && b(i) != q) i += 1
          ve = i
          if (i < till) i += 1
        } else {
          vs = i
          while (i < till && !isWs(b(i))) i += 1
          ve = i
        }
      }
      if (vs >= 0 && ne - ns == target.length) {
        var k = 0
        while (k < target.length && lower(b(ns + k)) == target.charAt(k)) k += 1
        if (k == target.length) return (vs.toLong << 32) | ve.toLong
      }
    }
    -1L
  }

  /** `href` of an `a` tag: [[findAttr]] + the URL value decode; null when
    * absent or empty after cleaning. */
  private def findHref(b: Array[Byte], from: Int, till: Int): Array[Byte] = {
    val m = findAttr(b, from, till, "href")
    if (m < 0) return null
    val v = decodeHref(b, (m >>> 32).toInt, m.toInt)
    if (v.length == 0) null else v
  }

  /** Text-like attribute value: entity decode, whitespace (incl. decoded
    * NBSP) collapsed to single spaces, trimmed; null when empty. */
  private def decodeAttrText(b: Array[Byte], vs: Int, ve: Int): Array[Byte] = {
    val out = new Array[Byte](4 * (ve - vs) + 4)
    var len = 0
    var pendingSp = false
    def put(c: Int): Unit = {
      if (pendingSp && len > 0) { out(len) = ' '; len += 1 }
      pendingSp = false
      out(len) = c.toByte; len += 1
    }
    def putCp(cp: Int): Unit =
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
        cp == '\f' || cp == 0xa0) pendingSp = true
      else if (cp < 0x80) put(cp)
      else if (cp < 0x800) { put(0xc0 | (cp >> 6)); put(0x80 | (cp & 0x3f)) }
      else if (cp < 0x10000) {
        put(0xe0 | (cp >> 12)); put(0x80 | ((cp >> 6) & 0x3f))
        put(0x80 | (cp & 0x3f))
      } else {
        put(0xf0 | (cp >> 18)); put(0x80 | ((cp >> 12) & 0x3f))
        put(0x80 | ((cp >> 6) & 0x3f)); put(0x80 | (cp & 0x3f))
      }
    var i = vs
    while (i < ve) {
      val c = b(i)
      if (c == '&') {
        val m = entAt(b, ve, i)
        if (m < 0) { put('&'); i += 1 }
        else { putCp((m >>> 32).toInt); i = m.toInt }
      } else if (isWs(c)) { pendingSp = true; i += 1 }
      else { put(c); i += 1 }
    }
    if (len == 0) null else java.util.Arrays.copyOf(out, len)
  }

  private def decodeHref(b: Array[Byte], vs: Int, ve: Int): Array[Byte] = {
    val out = new Array[Byte](4 * (ve - vs) + 4)
    var len = 0
    def put(c: Int): Unit =
      if (c != '\t' && c != '\n' && c != '\r') { out(len) = c.toByte; len += 1 }
    def putCp(cp: Int): Unit = {
      if (cp < 0x80) put(cp)
      else if (cp < 0x800) { put(0xc0 | (cp >> 6)); put(0x80 | (cp & 0x3f)) }
      else if (cp < 0x10000) {
        put(0xe0 | (cp >> 12)); put(0x80 | ((cp >> 6) & 0x3f))
        put(0x80 | (cp & 0x3f))
      } else {
        put(0xf0 | (cp >> 18)); put(0x80 | ((cp >> 12) & 0x3f))
        put(0x80 | ((cp >> 6) & 0x3f)); put(0x80 | (cp & 0x3f))
      }
    }
    var i = vs
    while (i < ve) {
      val c = b(i)
      if (c == '&') {
        val m = entAt(b, ve, i)
        if (m < 0) { put('&'); i += 1 }
        else { putCp((m >>> 32).toInt); i = m.toInt }
      } else { put(c); i += 1 }
    }
    var s = 0; var e = len
    while (s < e && (out(s) & 0xff) <= 0x20) s += 1
    while (e > s && (out(e - 1) & 0xff) <= 0x20) e -= 1
    java.util.Arrays.copyOfRange(out, s, e)
  }

  private def eqLowerAscii(v: Array[Byte], s: String): Boolean = {
    if (v == null || v.length != s.length) return false
    var i = 0
    while (i < s.length) {
      if (lower(v(i)) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** One extraction pass. Total: never throws, never returns null. */
  def extract(u: UTF8String): Result =
    extract(u, collectLinks = false, collectMeta = false)

  def extract(u: UTF8String, collectLinks: Boolean): Result =
    extract(u, collectLinks, collectMeta = false)

  def extract(u: UTF8String, collectLinks: Boolean,
      collectMeta: Boolean): Result = {
    val b = u.getBytes
    val n = b.length
    // plain growable output buffer (ByteArrayOutputStream's synchronized
    // per-byte write costs ~2x on this hot path — measured in KernelBench)
    var out = new Array[Byte](math.max(16, n / 2))
    var outLen = 0
    // pendingSep: 0 none, 1 space, 2 segment boundary (newline)
    var pendingSep = 0
    var aDepth = 0
    var nTags = 0L; var nLinks = 0L; var anchorBytes = 0L
    var nlCount = 0L; var dropped = 0L
    var i = 0
    val linkBuf =
      if (collectLinks) new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      else null
    // first-wins document metadata (collected only when asked).
    // titleSeen is tracked apart from mTitle: decodeAttrText maps an
    // empty <title></title> to null, and first-wins must still hold —
    // a later non-empty title may not overwrite the empty first one.
    var titleSeen = false
    var mTitle: Array[Byte] = null
    var mLang: Array[Byte] = null
    var mCanonical: Array[Byte] = null
    var mDescription: Array[Byte] = null

    def write(c: Int): Unit = {
      if (outLen == out.length)
        out = java.util.Arrays.copyOf(out, out.length * 2)
      out(outLen) = c.toByte
      outLen += 1
    }
    def flush(): Unit = {
      if (pendingSep != 0) {
        if (outLen > 0) {
          val c = if (pendingSep == 2) '\n' else ' '
          write(c)
          if (pendingSep == 2) nlCount += 1
          if (aDepth > 0) anchorBytes += 1
        }
        pendingSep = 0
      }
    }
    def emit(c: Int): Unit = {
      flush()
      write(c)
      if (aDepth > 0) anchorBytes += 1
    }
    def boundary(): Unit = pendingSep = 2
    def ws(): Unit = if (pendingSep == 0) pendingSep = 1

    /** Quote-aware skip from `p` (just past the tag name) to the byte
      * AFTER the closing `>`; encodes self-closing in the sign bit-free
      * convention (negated-1) and returns Int.MinValue when unterminated. */
    def skipTag(p0: Int): Int = {
      var p = p0
      var quote: Byte = 0
      var prev: Byte = 0
      while (p < n) {
        val c = b(p)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return if (prev == '/') -(p + 1) - 1 else p + 1
        if (!isWs(c)) prev = c else if (quote == 0) prev = 0
        p += 1
      }
      Int.MinValue
    }
    /** Index just past the first occurrence of `pat` from `p`, or -1. */
    def indexAfter(p0: Int, pat: String): Int = {
      var p = p0
      val m = pat.length
      while (p + m <= n) {
        var k = 0
        while (k < m && b(p + k) == pat.charAt(k)) k += 1
        if (k == m) return p + m
        p += 1
      }
      -1
    }
    /** Raw-text close scan: start of the case-insensitive `</name` whose
      * next byte is whitespace, `/`, or `>`, from `p`; -1 when absent. */
    def rawClose(p0: Int, name: String): Int = {
      var p = p0
      val m = name.length
      while (p + 2 + m <= n) {
        if (b(p) == '<' && b(p + 1) == '/') {
          var k = 0
          while (k < m && lower(b(p + 2 + k)) == name.charAt(k)) k += 1
          if (k == m) {
            val after = p + 2 + m
            if (after < n) {
              val c = b(after)
              if (isWs(c) || c == '/' || c == '>') return p
            }
          }
        }
        p += 1
      }
      -1
    }
    /** Parse the `[A-Za-z0-9-]` name run at `p`, lowercased. */
    def tagName(p0: Int): String = {
      var p = p0
      while (p < n && isNameByte(b(p))) p += 1
      val sb = new java.lang.StringBuilder(p - p0)
      var k = p0
      while (k < p) { sb.append(lower(b(k)).toChar); k += 1 }
      sb.toString
    }
    def utf8(cp: Int): Unit = {
      if (cp < 0x80) emit(cp)
      else if (cp < 0x800) { emit(0xc0 | (cp >> 6)); emit(0x80 | (cp & 0x3f)) }
      else if (cp < 0x10000) {
        emit(0xe0 | (cp >> 12)); emit(0x80 | ((cp >> 6) & 0x3f))
        emit(0x80 | (cp & 0x3f))
      } else {
        emit(0xf0 | (cp >> 18)); emit(0x80 | ((cp >> 12) & 0x3f))
        emit(0x80 | ((cp >> 6) & 0x3f)); emit(0x80 | (cp & 0x3f))
      }
    }
    /** Decoded code point enters the same text stream: collapsible when
      * it is kernel whitespace or NBSP, literal bytes otherwise. */
    def emitCp(cp: Int): Unit =
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f' ||
        cp == 0xa0) ws()
      else utf8(cp)

    while (i < n) {
      val c = b(i)
      if (c == '<') {
        val c2: Byte = if (i + 1 < n) b(i + 1) else 0
        if (isAlpha(c2)) {
          // start tag
          val name = tagName(i + 1)
          val p = skipTag(i + 1 + name.length)
          if (p == Int.MinValue) { i = n } // unterminated: dropped, uncounted
          else {
            val selfClose = p < 0
            val after = if (selfClose) -(p + 1) else p
            nTags += 1
            if ((name == "script" || name == "style") && !selfClose) {
              val close = rawClose(after, name)
              if (close < 0) { dropped += n - after; i = n }
              else { dropped += close - after; i = close } // re-parse </name>
            } else {
              if (BlockTags.contains(name)) boundary()
              if (name == "a") {
                nLinks += 1
                if (!selfClose) aDepth += 1
                if (collectLinks) {
                  // attr region: past the name, excluding the closing '>'
                  val h = findHref(b, i + 1 + name.length, after - 1)
                  if (h != null) linkBuf += h
                }
              }
              if (collectMeta) {
                val as = i + 1 + name.length
                val ae = after - 1
                name match {
                  case "html" if mLang == null =>
                    val m = findAttr(b, as, ae, "lang")
                    if (m >= 0)
                      mLang = decodeAttrText(b, (m >>> 32).toInt, m.toInt)
                  case "link" if mCanonical == null =>
                    val rel = findAttr(b, as, ae, "rel")
                    if (rel >= 0 && eqLowerAscii(
                        decodeAttrText(b, (rel >>> 32).toInt, rel.toInt),
                        "canonical"))
                      mCanonical = findHref(b, as, ae)
                  case "meta" if mDescription == null =>
                    val nm = findAttr(b, as, ae, "name")
                    if (nm >= 0 && eqLowerAscii(
                        decodeAttrText(b, (nm >>> 32).toInt, nm.toInt),
                        "description")) {
                      val ct = findAttr(b, as, ae, "content")
                      if (ct >= 0)
                        mDescription =
                          decodeAttrText(b, (ct >>> 32).toInt, ct.toInt)
                    }
                  case "title" if !titleSeen && !selfClose =>
                    // RCDATA look-ahead: entity-decode + collapse the raw
                    // range up to </title (markup inside is literal, per
                    // RCDATA); the main walk re-reads it as text
                    titleSeen = true
                    val close = rawClose(after, "title")
                    mTitle = decodeAttrText(b, after,
                      if (close < 0) n else close)
                  case _ => ()
                }
              }
              i = after
            }
          }
        } else if (c2 == '/') {
          if (i + 2 < n && isAlpha(b(i + 2))) {
            // end tag
            val name = tagName(i + 2)
            val p = skipTag(i + 2 + name.length)
            if (p == Int.MinValue) { i = n }
            else {
              nTags += 1
              if (BlockTags.contains(name)) boundary()
              if (name == "a" && aDepth > 0) aDepth -= 1
              i = if (p < 0) -(p + 1) else p
            }
          } else if (i + 2 >= n) { emit('<'); i += 1 }
          else { // bogus comment: </ + non-letter, dropped to '>'
            val p = indexAfter(i + 2, ">")
            i = if (p < 0) n else p
          }
        } else if (c2 == '!') {
          if (i + 3 < n && b(i + 2) == '-' && b(i + 3) == '-') {
            val p = indexAfter(i + 4, "-->")
            i = if (p < 0) n else p
          } else {
            val p = indexAfter(i + 2, ">")
            i = if (p < 0) n else p
          }
        } else if (c2 == '?') {
          val p = indexAfter(i + 2, ">")
          i = if (p < 0) n else p
        } else { emit('<'); i += 1 }
      } else if (c == '&') {
        // entity; on any malformed shape the '&' is literal and scanning
        // resumes at i+1 (following bytes re-scan as ordinary text)
        val m = entAt(b, n, i)
        if (m < 0) { emit('&'); i += 1 }
        else { emitCp((m >>> 32).toInt); i = m.toInt }
      } else if (isWs(c)) { ws(); i += 1 }
      else { emit(c); i += 1 }
    }

    val text = java.util.Arrays.copyOf(out, outLen)
    new Result(text, nTags, nLinks, anchorBytes,
      if (text.length > 0) nlCount + 1 else 0, dropped, n.toLong,
      if (collectLinks) linkBuf.toArray else null,
      mTitle, mLang, mCanonical, mDescription)
  }
}

/** `graft_html_text(string) -> string` — the extracted text alone (the
  * common projection; see [[HtmlKernel]] for the exact semantics). */
case class GraftHtmlText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_html_text expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromBytes(
      HtmlKernel.extract(input.asInstanceOf[UTF8String]).text)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |  graft.expressions.HtmlKernel.extract($s).text());""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): GraftHtmlText = copy(child = newChild)
}

/** `graft_html_extract(string) -> struct<text, n_tags, text_bytes, n_links,
  * anchor_text_bytes, n_blocks, dropped_bytes, html_bytes>` — one pass
  * producing the text AND the boilerplate signals (so a query needing both
  * never runs the kernel twice). */
case class GraftHtmlExtract(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_html_extract expects string, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_tags", LongType, nullable = false),
    StructField("text_bytes", LongType, nullable = false),
    StructField("n_links", LongType, nullable = false),
    StructField("anchor_text_bytes", LongType, nullable = false),
    StructField("n_blocks", LongType, nullable = false),
    StructField("dropped_bytes", LongType, nullable = false),
    StructField("html_bytes", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_extract"

  override protected def nullSafeEval(input: Any): Any =
    evalHtml(input.asInstanceOf[UTF8String])

  /** Codegen entry point (shared with nullSafeEval). */
  def evalHtml(u: UTF8String): InternalRow = {
    val r = HtmlKernel.extract(u)
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(r.text), r.nTags, r.text.length.toLong, r.nLinks,
      r.anchorTextBytes, r.nBlocks, r.droppedBytes, r.htmlBytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHtmlExtract", this,
      classOf[GraftHtmlExtract].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.evalHtml($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftHtmlExtract = copy(child = newChild)
}

/** `graft_html_meta(string) -> struct<title, lang, canonical,
  * description>` — the page's document metadata, first occurrence wins:
  * the `<title>` element's RCDATA (entity-decoded, whitespace-collapsed —
  * markup inside stays literal, per RCDATA), `<html lang=…>`,
  * `<link rel=canonical href=…>` (URL-cleaned like an outlink), and
  * `<meta name=description content=…>`. Fields null when absent; the
  * struct is null only for null input. The standard crawl-metadata pull
  * (titles for display/dedup keys, lang as a language-ID prior,
  * canonical as the dedup URL). */
case class GraftHtmlMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_html_meta expects string, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true),
    StructField("description", StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_meta"

  override protected def nullSafeEval(input: Any): Any =
    evalMeta(input.asInstanceOf[UTF8String])

  /** Codegen entry point (shared with nullSafeEval). */
  def evalMeta(u: UTF8String): InternalRow = {
    val r = HtmlKernel.extract(u, collectLinks = false, collectMeta = true)
    def f(v: Array[Byte]): Any =
      if (v == null) null else UTF8String.fromBytes(v)
    new GenericInternalRow(Array[Any](
      f(r.title), f(r.lang), f(r.canonical), f(r.description)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHtmlMeta", this,
      classOf[GraftHtmlMeta].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.evalMeta($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftHtmlMeta = copy(child = newChild)
}

/** `graft_html_links(string) -> array<string>` — the outlinks: each `a`
  * start tag's first `href` value in document order, entity-decoded with
  * the text path's entity grammar and cleaned with the WHATWG URL
  * whitespace rules (`\t`/`\n`/`\r` stripped anywhere, ≤ 0x20 trimmed at
  * the ends); tags without an `href`, or whose value cleans to empty,
  * contribute nothing. Feeds `graft_canon_url` → domain/URL-graph work
  * (the crawl-frontier composition, q215). */
case class GraftHtmlLinks(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_html_links expects string, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_links"

  override protected def nullSafeEval(input: Any): Any =
    evalLinks(input.asInstanceOf[UTF8String])

  /** Codegen entry point (shared with nullSafeEval). */
  def evalLinks(u: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val links = HtmlKernel.extract(u, collectLinks = true).links
    val arr = new Array[Any](links.length)
    var i = 0
    while (i < links.length) { arr(i) = UTF8String.fromBytes(links(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHtmlLinks", this,
      classOf[GraftHtmlLinks].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.evalLinks($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftHtmlLinks = copy(child = newChild)
}
