package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.HtmlKernel
import graft.operators.HtmlExtract

/** HTML → text kernel semantics ([[HtmlKernel]], `graft_html_text` /
  * `graft_html_extract`): every tokenizer branch pinned by hand, the
  * documented counter rules pinned exactly, and a seeded differential
  * fuzz against an INDEPENDENT char-based reference implementation of the
  * same spec (different representation — String/char vs byte scanner;
  * different assembly — event list + split/collapse vs streaming flush). */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def text(html: String): String =
    UTF8String.fromBytes(
      HtmlKernel.extract(UTF8String.fromString(html)).text).toString
  private def ex(html: String): HtmlKernel.Result =
    HtmlKernel.extract(UTF8String.fromString(html))

  // ---------------- tokenizer branches ----------------

  test("tags strip; blocks separate; inline glues; self-closing br breaks") {
    assert(text("<p>a</p><p>b</p>") === "a\nb")
    assert(text("x <b>y</b> z") === "x y z")
    assert(text("a<br/>b<br>c") === "a\nb\nc")
    assert(text("<div><span>in</span>line</div>") === "inline")
    // consecutive block tags → ONE separator; empty segments vanish
    assert(text("<p></p><p>a</p><div></div><p>b</p>") === "a\nb")
    // leading/trailing boundaries produce no leading/trailing newline
    assert(text("<p>only</p>") === "only")
  }

  test("literal '<' (non-tag-open) is text; EOF edge cases") {
    assert(text("3 < 5") === "3 < 5")
    assert(text("a <3 b") === "a <3 b")
    assert(text("<< <") === "<< <")
    assert(text("tail<") === "tail<")
    assert(text("tail</") === "tail</")
    // unterminated start tag at EOF: dropped, uncounted
    val r = ex("a<p b")
    assert(UTF8String.fromBytes(r.text).toString === "a" && r.nTags === 0L)
  }

  test("comments, declarations, PIs, bogus comments drop silently") {
    assert(text("a<!-- x <p>no</p> -->b") === "ab")
    assert(text("a<!-- unterminated") === "a")
    assert(text("<!DOCTYPE html>a") === "a")
    assert(text("a<![CDATA[hidden]]>b") === "ab") // decl drops to FIRST '>'
    assert(text("a<?php echo 1 ?>b") === "ab")
    assert(text("a</3>b") === "ab") // bogus comment: </ + non-letter
    assert(ex("a<!-- c --><?p?><!x>b").nTags === 0L)
  }

  test("quote-aware attribute skip: '>' inside quotes does not end the tag") {
    assert(text("""<p data-x=">quoted>">a</p>""") === "a")
    assert(text("<p data-x='>q'>a</p>") === "a")
    // '/' before '>' outside quotes = self-closing; inside quotes = value
    val selfClosed = ex("""<a href="u"/>t""")
    assert(selfClosed.nLinks === 1L && selfClosed.anchorTextBytes === 0L)
    val open = ex("""<a href="u/">t""")
    assert(open.anchorTextBytes === 1L) // 't' inside the still-open anchor
  }

  test("script/style raw text drops, counts dropped_bytes, honors fake ends") {
    assert(text("""a<script>if(1<2){"</b >"}</script>b""") === "ab")
    assert(text("a<style>p{x:1}</style>b") === "ab")
    assert(text("a<script>x</scripty></script>b") === "ab") // </scripty ≠ end
    assert(text("a<SCRIPT>x</ScRiPt >b") === "ab") // case-insensitive close
    assert(text("a<script>unterminated") === "a")
    val r = ex("<style>12345</style>ok")
    assert(r.droppedBytes === 5L && r.nTags === 2L)
    // self-closing script does NOT enter raw mode
    assert(text("a<script/>b</script>c") === "abc")
  }

  // ---------------- entities ----------------

  test("named + numeric entities decode; malformed stay literal") {
    assert(text("&amp;&lt;&gt;&quot;&apos;") === "&<>\"'")
    assert(text("&#65;&#x42;&#x63;") === "ABc")
    assert(text("x&amp") === "x&amp") // no semicolon → literal
    assert(text("&bogus; &Amp; &;&#;&#x;") === "&bogus; &Amp; &;&#;&#x;")
    assert(text("&#0; &#xD800; &#x110000; &#999999999;") ===
      "� � � �")
    assert(text("&#x1F600;") === new String(Character.toChars(0x1f600)))
    // decoded '<' is text, never re-parsed as markup
    assert(text("&lt;p&gt;kept&lt;/p&gt;") === "<p>kept</p>")
    // entities in ATTRIBUTES are skipped with the tag, not decoded
    assert(text("""<p title="&amp;">a</p>""") === "a")
  }

  test("whitespace collapses: raw, decoded, and nbsp alike; \\x0B is text") {
    assert(text("a  \t\n\r\f b") === "a b")
    assert(text("a &nbsp; b") === "a b")
    assert(text("a&#10;&#9;b") === "a b")
    assert(text("  lead and trail  ") === "lead and trail")
    // \x0B is NOT kernel whitespace (the RE2/Java-common-subset rule)
    assert(text("a\u000Bb") === "a\u000Bb")
    // a literal (non-entity) U+00A0 byte sequence passes through verbatim
    assert(text("a\u00A0b") === "a\u00A0b")
  }

  test("multi-byte text passes through verbatim") {
    assert(text("<p>héllo 日本 🙂</p>") === "héllo 日本 🙂")
    val r = ex("<p>日本</p>")
    assert(r.text.length === 6L) // text_bytes counts UTF-8 bytes
  }

  // ---------------- counters ----------------

  test("counter rules: tags, links, anchor attribution, blocks, bytes") {
    val r = ex("""<div><a href="u">link</a> tail</div><p>para</p>""")
    assert(r.nTags === 6L)
    assert(r.nLinks === 1L)
    assert(r.anchorTextBytes === 4L) // 'link'; ' tail' flushes at depth 0
    assert(r.nBlocks === 2L)
    assert(UTF8String.fromBytes(r.text).toString === "link tail\npara")
    // separator attribution is BY DEPTH AT FLUSH TIME: the space between
    // two adjacent links flushes while the second anchor is open
    val two = ex("""<a href=u>w</a> <a href=u>w</a>""")
    assert(two.anchorTextBytes === 3L && two.nLinks === 2L)
    // nested anchors: depth counts; unbalanced </a> floors at 0
    val nest = ex("<a><a>x</a>y</a>z</a>w")
    assert(nest.anchorTextBytes === 2L) // x (depth 2), y (depth 1)
    assert(ex("").nBlocks === 0L && ex("<p></p>").nBlocks === 0L)
  }

  test("href extraction: attribute grammar, entity decode, URL cleanup") {
    def links(h: String): Seq[String] =
      HtmlKernel.extract(UTF8String.fromString(h), collectLinks = true)
        .links.toSeq.map(b => UTF8String.fromBytes(b).toString)
    assert(links("""<a href="u1">x</a><a href='u2'>y</a><a href=u3>z</a>""")
      === Seq("u1", "u2", "u3"))
    // case-insensitive name; first href wins; other attrs skipped
    assert(links("""<a class=c HREF="win" href="lose">x</a>""") === Seq("win"))
    // entities decode inside values (&amp; in query strings)
    assert(links("""<a href="/u?a=1&amp;b=2">x</a>""") === Seq("/u?a=1&b=2"))
    assert(links("""<a href="/u?a=1&bogus;2">x</a>""") === Seq("/u?a=1&bogus;2"))
    // WHATWG cleanup: tab/LF/CR stripped anywhere, <= 0x20 trimmed at ends
    assert(links("<a href=\" /u\tr\nl \">x</a>") === Seq("/url"))
    assert(links("<a href=\"&#9;u&#10;\">x</a>") === Seq("u"))
    // no href / empty-after-clean → nothing; quoted '>' stays in value
    assert(links("""<a name=n>x</a><a href="">y</a><a href=" ">z</a>""")
      === Seq.empty)
    assert(links("""<a href="u>v">x</a>""") === Seq("u>v"))
    // unquoted value keeps an embedded/trailing '/' (documented rule)
    assert(links("""<a href=/a/b/>x""") === Seq("/a/b/"))
    // non-a tags never contribute; self-closing a still does
    assert(links("""<link href="css"><a href="u"/>""") === Seq("u"))
  }

  test("SQL surface: graft_html_links + canon compose (q215 shape)") {
    val df = Seq((1L,
      """<p><a href="HTTP://EX1.TEST:080/p2">a</a>""" +
        """<a href="http://ex1.test/p2?a=1&amp;utm_source=x">b</a></p>"""))
      .toDF("id", "h")
    df.createOrReplaceTempView("html_links_fixture")
    val r = spark.sql(
      """SELECT graft_canon_url(href) AS c FROM html_links_fixture
        |LATERAL VIEW explode(graft_html_links(h)) t AS href
        |ORDER BY c""".stripMargin).as[String].collect()
    assert(r === Array("http://ex1.test/p2", "http://ex1.test/p2?a=1"))
  }

  test("html meta: title RCDATA, lang, canonical, description; first wins") {
    def meta(h: String) =
      HtmlKernel.extract(UTF8String.fromString(h), collectLinks = false,
        collectMeta = true)
    def s(b: Array[Byte]) =
      if (b == null) null else UTF8String.fromBytes(b).toString
    val m = meta("""<html LANG=" en "><head><title> A &amp;  B <i>raw</i>""" +
      """</title><title>second</title>""" +
      """<link rel="Canonical" href="/c?x=1&amp;y=2">""" +
      """<link rel="canonical" href="/lose">""" +
      """<meta name="DESCRIPTION" content=" d&#33;  e "></head></html>""")
    // RCDATA: markup inside title is LITERAL; entities decode; ws collapses
    assert(s(m.title) === "A & B <i>raw</i>")
    assert(s(m.lang) === "en") // attr value trimmed + collapsed
    assert(s(m.canonical) === "/c?x=1&y=2") // first canonical wins
    assert(s(m.description) === "d! e")
    // absence → per-field nulls; unterminated title captures to EOF
    val none = meta("<p>no meta</p>")
    assert(none.title === null && none.lang === null &&
      none.canonical === null && none.description === null)
    assert(s(meta("<title>tail").title) === "tail")
    // first-wins holds even when the first title is EMPTY: a later
    // non-empty <title> may not overwrite it (titleSeen != mTitle-null)
    assert(meta("<title></title><title>late</title>").title === null)
    assert(meta("<title>  </title><title>late</title>").title === null)
    // meta collection does NOT perturb the text/counter outputs
    val h2 = """<html lang=x><title>t</title><p>body</p>"""
    val plain = ex(h2)
    val withMeta = meta(h2)
    assert(UTF8String.fromBytes(plain.text).toString ===
      UTF8String.fromBytes(withMeta.text).toString)
    assert(plain.nTags === withMeta.nTags &&
      plain.nBlocks === withMeta.nBlocks)
    assert(UTF8String.fromBytes(withMeta.text).toString === "t\nbody")
  }

  // ---------------- differential fuzz vs independent reference ----------

  test("fuzz: kernel == char-based reference on 400 random documents") {
    val rnd = new scala.util.Random(0x47721301)
    val words = Seq("alpha", "héllo", "日本", "x<y", "a&b", "&amp;", "&#65;",
      "&#x41;", "&bogus;", "&amp", "&#;", "&#xD800;", "&#999999999;",
      "&nbsp;", "<3", "< x", "tail<", "ab", "🙂", "p q", "&#10;")
    val tags = Seq("p", "div", "span", "a", "b", "li", "h1", "my-tag",
      "script", "style", "pre", "em")
    def attrs(): String = rnd.nextInt(8) match {
      case 0 => ""
      case 1 => " href=\"u>v\""
      case 2 => " x='>' y=z"
      case 3 => " k=v/w"
      case 4 => " href=/u/"
      case 5 => " HREF='a&amp;b c'"
      case 6 => " x=1 href=\" q&#10;r \" href=lose"
      case _ => " href href=\"\" title='t'"
    }
    def piece(depth: Int): String = rnd.nextInt(14) match {
      case 0 | 1 | 2 | 3 => words(rnd.nextInt(words.length)) +
        (if (rnd.nextBoolean()) " " else "")
      case 4 => "<!-- c <p>x</p> -->"
      case 5 => "<!DOCTYPE html>"
      case 6 => "<?pi ?>"
      case 7 => "</3>"
      case 8 | 9 =>
        val t = tags(rnd.nextInt(tags.length))
        if (rnd.nextBoolean() && depth < 3)
          s"<$t${attrs()}>${doc(depth + 1)}</$t>"
        else s"<$t${attrs()}/>"
      case 10 =>
        val t = tags(rnd.nextInt(tags.length))
        s"</$t>"
      case 11 => s"<script>var a='</b>'; 1<2</script>"
      case 12 => rnd.nextInt(4) match { // document-metadata carriers
        case 0 => "<html lang=\" e&#78; \">"
        case 1 => "<link rel='Canonical' href=\"/c?a=1&amp;b=2\"/>"
        case 2 => "<link rel=other href=\"/lose\">"
        case _ => "<meta name=\"Description\" content=\"d &#33; e\">"
      }
      case _ =>
        if (rnd.nextBoolean()) s"<title> t&amp; ${rnd.nextInt(10)} </title>"
        else "<title>unterminated to EOF? no: " + words(rnd.nextInt(3))
    }
    def doc(depth: Int): String =
      Seq.fill(rnd.nextInt(6))(piece(depth)).mkString
    var checked = 0
    for (i <- 0 until 400) {
      val html = doc(0) + (if (i % 17 == 0) "<p unterminated" else "")
      val r = HtmlKernel.extract(UTF8String.fromString(html),
        collectLinks = true, collectMeta = true)
      val want = HtmlRef.extract(html)
      val got = UTF8String.fromBytes(r.text).toString
      assert(got === want.text, s"text mismatch on: $html")
      assert(r.nTags === want.nTags, s"nTags on: $html")
      assert(r.nLinks === want.nLinks, s"nLinks on: $html")
      assert(r.nBlocks === want.nBlocks, s"nBlocks on: $html")
      assert(r.droppedBytes === want.dropped, s"dropped on: $html")
      val gotLinks = r.links.toSeq.map(b => UTF8String.fromBytes(b).toString)
      assert(gotLinks === want.links, s"links on: $html")
      def s(b: Array[Byte]) =
        if (b == null) null else UTF8String.fromBytes(b).toString
      assert(s(r.title) === want.title, s"title on: $html")
      assert(s(r.lang) === want.lang, s"lang on: $html")
      assert(s(r.canonical) === want.canonical, s"canonical on: $html")
      assert(s(r.description) === want.description, s"description on: $html")
      // anchor attribution invariants (exact rule pinned by hand above)
      assert(r.anchorTextBytes >= 0L && r.anchorTextBytes <= r.text.length)
      if (r.nLinks == 0L) assert(r.anchorTextBytes === 0L)
      checked += 1
    }
    assert(checked === 400)
  }

  // ---------------- SQL surface + operator ----------------

  test("SQL surface: graft_html_text == graft_html_extract.text; nulls") {
    val df = Seq(
      (1L, "<p>a</p><div><a href=u>l</a> t</div>"),
      (2L, "<script>x</script>"),
      (3L, null.asInstanceOf[String])).toDF("id", "h")
    df.createOrReplaceTempView("html_fixture")
    val r = spark.sql(
      """SELECT id, graft_html_text(h) AS t1, graft_html_extract(h) AS e
        |FROM html_fixture ORDER BY id""".stripMargin).collect()
    assert(r(0).getString(1) === "a\nl t")
    assert(r(0).getStruct(2).getAs[String]("text") === "a\nl t")
    assert(r(0).getStruct(2).getAs[Long]("n_links") === 1L)
    assert(r(1).getString(1) === "" &&
      r(1).getStruct(2).getAs[Long]("dropped_bytes") === 1L)
    assert(r(2).isNullAt(1) && r(2).isNullAt(2))
  }

  test("operator: dropBoilerplate drops link farms, keeps prose") {
    val farm = "<div>" + Seq.fill(6)("""<a href="u">w</a> """).mkString +
      "</div>"
    val prose = "<p>real article text with plenty of words</p>" +
      """<div>see <a href="u">ref</a> for details</div>"""
    val empty = "<script>only()</script>"
    val df = Seq((1L, farm), (2L, prose), (3L, empty)).toDF("id", "page")
    val kept = HtmlExtract.dropBoilerplate(df, "page", maxLinkDensity = 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L))
    // linkDensity: NULL on empty text, 0 on no-link prose, 1 on pure farm
    val e = HtmlExtract.extract(df, "page", "e")
      .select(col("id"), HtmlExtract.linkDensity(col("e")).as("ld"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(e(1L) === java.lang.Double.valueOf(1.0))
    assert(e(3L) === null)
    assert(e(2L).doubleValue > 0.0 && e(2L).doubleValue < 0.2)
  }

  test("textRatio and extract() keep one kernel call per row in the plan") {
    val df = Seq((1L, "<p>abc</p>")).toDF("id", "page")
    val out = HtmlExtract.extract(df, "page")
      .select(col("id"), HtmlExtract.textRatio(col("html")).as("tr"))
      .collect()
    assert(out(0).getDouble(1) === 3.0 / 10.0)
  }
}

/** Independent reference implementation of the [[HtmlKernel]] spec for the
  * differential fuzz: char-based (String indexOf / Character APIs, not a
  * byte scanner), assembles an event list then splits/collapses segments
  * (not a streaming flush). Counters mirror the spec's DEFINITIONS, not
  * the kernel's code paths. anchor_text_bytes is deliberately NOT
  * replicated here (its flush-time separator attribution is pinned by the
  * hand cases; re-deriving it would copy the kernel's algorithm). */
object HtmlRef {
  final case class Ref(text: String, nTags: Long, nLinks: Long,
      nBlocks: Long, dropped: Long, links: Seq[String],
      title: String = null, lang: String = null, canonical: String = null,
      description: String = null)

  private sealed trait Ev
  private final case class Txt(s: String) extends Ev
  private case object Brk extends Ev

  def extract(html: String): Ref = {
    val n = html.length
    val evs = scala.collection.mutable.ArrayBuffer.empty[Ev]
    val links = scala.collection.mutable.ArrayBuffer.empty[String]
    var mTitle: String = null; var mLang: String = null
    var mCanonical: String = null; var mDescription: String = null
    var nTags = 0L; var nLinks = 0L; var dropped = 0L
    var i = 0
    def isWsC(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    def nameAt(p: Int): String = {
      var q = p
      while (q < n && (html(q).isLetterOrDigit && html(q) < 0x80 ||
        html(q) == '-')) q += 1
      html.substring(p, q).toLowerCase(java.util.Locale.ROOT)
    }
    // returns (posAfterGt, selfClosing) or null when unterminated
    def skipTag(p0: Int): (Int, Boolean) = {
      var p = p0; var quote = 0; var prev = 0
      while (p < n) {
        val c = html(p)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return (p + 1, prev == '/')
        if (!isWsC(c)) prev = c else if (quote == 0) prev = 0
        p += 1
      }
      null
    }
    def utf8len(s: String): Long =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
    while (i < n) {
      val c = html(i)
      if (c == '<' && i + 1 < n && html(i + 1).isLetter && html(i + 1) < 0x80) {
        val name = nameAt(i + 1)
        skipTag(i + 1 + name.length) match {
          case null => i = n
          case (after, selfC) =>
            nTags += 1
            if ((name == "script" || name == "style") && !selfC) {
              // raw text: first case-insensitive </name + [ws / >]
              var p = after; var found = -1
              while (found < 0 && p + 2 + name.length <= n) {
                if (html(p) == '<' && html(p + 1) == '/' &&
                  html.regionMatches(true, p + 2, name, 0, name.length) &&
                  p + 2 + name.length < n && {
                    val d = html(p + 2 + name.length)
                    isWsC(d) || d == '/' || d == '>'
                  }) found = p
                else p += 1
              }
              if (found < 0) { dropped += utf8len(html.substring(after)); i = n }
              else { dropped += utf8len(html.substring(after, found)); i = found }
            } else {
              if (HtmlKernel.BlockTags.contains(name)) evs += Brk
              val attrRegion = html.substring(i + 1 + name.length, after - 1)
              if (name == "a") {
                nLinks += 1
                refHref(attrRegion).foreach(links += _)
              }
              name match {
                case "html" if mLang == null =>
                  refAttr(attrRegion, "lang")
                    .flatMap(decodeText).foreach(mLang = _)
                case "link" if mCanonical == null =>
                  if (refAttr(attrRegion, "rel").flatMap(decodeText)
                      .exists(_.equalsIgnoreCase("canonical")))
                    refHref(attrRegion).foreach(mCanonical = _)
                case "meta" if mDescription == null =>
                  if (refAttr(attrRegion, "name").flatMap(decodeText)
                      .exists(_.equalsIgnoreCase("description")))
                    refAttr(attrRegion, "content")
                      .flatMap(decodeText).foreach(mDescription = _)
                case "title" if mTitle == null && !selfC =>
                  // RCDATA look-ahead: raw range to </title (same scan the
                  // raw-text close uses), decoded text-like; the main walk
                  // re-reads the range normally
                  var p = after; var found = -1
                  while (found < 0 && p + 2 + 5 <= n) {
                    if (html(p) == '<' && html(p + 1) == '/' &&
                      html.regionMatches(true, p + 2, "title", 0, 5) &&
                      p + 7 < n && {
                        val d = html(p + 7)
                        isWsC(d) || d == '/' || d == '>'
                      }) found = p
                    else p += 1
                  }
                  val raw = html.substring(after, if (found < 0) n else found)
                  decodeText(raw).foreach(mTitle = _)
                case _ => ()
              }
              i = after
            }
        }
      } else if (c == '<' && i + 2 < n && html(i + 1) == '/' &&
        html(i + 2).isLetter && html(i + 2) < 0x80) {
        val name = nameAt(i + 2)
        skipTag(i + 2 + name.length) match {
          case null => i = n
          case (after, _) =>
            nTags += 1
            if (HtmlKernel.BlockTags.contains(name)) evs += Brk
            i = after
        }
      } else if (c == '<' && i + 1 < n && html(i + 1) == '/' && i + 2 >= n) {
        evs += Txt("<"); i += 1
      } else if (c == '<' && i + 1 < n && html(i + 1) == '/') {
        val p = html.indexOf('>', i + 2)
        i = if (p < 0) n else p + 1
      } else if (c == '<' && i + 3 < n && html.startsWith("<!--", i)) {
        val p = html.indexOf("-->", i + 4)
        i = if (p < 0) n else p + 3
      } else if (c == '<' && i + 1 < n && html(i + 1) == '!') {
        val p = html.indexOf('>', i + 2)
        i = if (p < 0) n else p + 1
      } else if (c == '<' && i + 1 < n && html(i + 1) == '?') {
        val p = html.indexOf('>', i + 2)
        i = if (p < 0) n else p + 1
      } else if (c == '&') {
        val m = entity(html, i)
        if (m == null) { evs += Txt("&"); i += 1 }
        else {
          val cp = m._1
          val rep = if (cp == ' ' || cp == '\t' || cp == '\n' ||
            cp == '\r' || cp == '\f' || cp == 0xa0) " "
          else new String(Character.toChars(cp))
          evs += Txt(rep); i = m._2
        }
      } else if (isWsC(c)) { evs += Txt(" "); i += 1 }
      else { evs += Txt(c.toString); i += 1 }
    }
    // assemble: split on Brk, collapse spaces, drop empties, join with \n
    val segs = scala.collection.mutable.ArrayBuffer(new StringBuilder)
    evs.foreach {
      case Brk => segs += new StringBuilder
      case Txt(s) => segs.last.append(s)
    }
    val cleaned = segs.map(_.toString
        .replaceAll(" +", " ").replaceAll("^ | $", ""))
      .filter(_.nonEmpty)
    val txt = cleaned.mkString("\n")
    Ref(txt, nTags, nLinks, if (txt.isEmpty) 0L else cleaned.length.toLong,
      dropped, links.toSeq, mTitle, mLang, mCanonical, mDescription)
  }

  /** First `target`-named attribute's RAW value over one tag's attribute
    * region (excludes the closing '>'); None when absent/valueless. */
  private def refAttr(s: String, target: String): Option[String] = {
    val n = s.length; var i = 0
    def ws(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    while (i < n) {
      while (i < n && (ws(s(i)) || s(i) == '/')) i += 1
      if (i >= n) return None
      val ns = i
      while (i < n && !ws(s(i)) && s(i) != '=' && s(i) != '/') i += 1
      val name = s.substring(ns, i)
      while (i < n && ws(s(i))) i += 1
      var v: String = null
      if (i < n && s(i) == '=') {
        i += 1
        while (i < n && ws(s(i))) i += 1
        if (i < n && (s(i) == '"' || s(i) == '\'')) {
          val q = s(i); i += 1; val vs = i
          while (i < n && s(i) != q) i += 1
          v = s.substring(vs, i)
          if (i < n) i += 1
        } else {
          val vs = i
          while (i < n && !ws(s(i))) i += 1
          v = s.substring(vs, i)
        }
      }
      if (name.equalsIgnoreCase(target) && v != null) return Some(v)
    }
    None
  }

  /** Entity-decode a raw attribute value. */
  private def decodeEnts(v: String): String = {
    val sb = new StringBuilder
    var j = 0
    while (j < v.length) {
      if (v(j) == '&') entity(v, j) match {
        case null => sb.append('&'); j += 1
        case (cp, nxt) =>
          sb.append(new String(Character.toChars(cp))); j = nxt
      }
      else { sb.append(v(j)); j += 1 }
    }
    sb.toString
  }

  /** URL value cleanup: entities, tab/LF/CR stripped anywhere, ends
    * trimmed of chars <= 0x20; None when empty. */
  private def refHref(s: String): Option[String] =
    refAttr(s, "href").flatMap { v =>
      val cleaned = decodeEnts(v).filterNot(c =>
        c == '\t' || c == '\n' || c == '\r')
        .dropWhile(_ <= ' ').reverse.dropWhile(_ <= ' ').reverse
      if (cleaned.isEmpty) None else Some(cleaned)
    }

  /** Text-like value: entities (whitespace-class + NBSP → space),
    * whitespace collapsed, trimmed; None when empty. */
  private def decodeText(v: String): Option[String] = {
    // DECODED ws-class/NBSP entities become collapsible spaces; a RAW
    // U+00A0 char stays literal (the main text path's decoded-vs-raw rule)
    val sb = new StringBuilder
    var j = 0
    while (j < v.length) {
      if (v(j) == '&') entity(v, j) match {
        case null => sb.append('&'); j += 1
        case (cp, nxt) =>
          if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
            cp == '\f' || cp == 0xa0) sb.append(' ')
          else sb.append(new String(Character.toChars(cp)))
          j = nxt
      }
      else { sb.append(v(j)); j += 1 }
    }
    val mapped = sb.toString.map(c =>
      if (c == '\t' || c == '\n' || c == '\r' || c == '\f') ' ' else c)
    val cleaned = mapped.replaceAll(" +", " ").replaceAll("^ | $", "")
    if (cleaned.isEmpty) None else Some(cleaned)
  }

  /** Decoded entity at `i`, as (codePoint, posAfter); null if literal. */
  private def entity(h: String, i: Int): (Int, Int) = {
    val n = h.length
    if (i + 1 >= n) return null
    if (h(i + 1) == '#') {
      var j = i + 2; var hex = false
      if (j < n && (h(j) == 'x' || h(j) == 'X')) { hex = true; j += 1 }
      val d0 = j; var v = 0L
      while (j < n && Character.digit(h(j), if (hex) 16 else 10) >= 0) {
        if (v <= 0x10ffffL) v = v * (if (hex) 16 else 10) +
          Character.digit(h(j), if (hex) 16 else 10)
        j += 1
      }
      if (j == d0 || j >= n || h(j) != ';') return null
      val cp = if (v == 0 || v > 0x10ffffL || (v >= 0xd800 && v <= 0xdfff))
        0xfffd else v.toInt
      (cp, j + 1)
    } else {
      var j = i + 1
      while (j < n && h(j).isLetter && h(j) < 0x80 && j - i <= 8) j += 1
      if (j >= n || h(j) != ';') return null
      h.substring(i + 1, j) match {
        case "amp" => ('&'.toInt, j + 1)
        case "lt" => ('<'.toInt, j + 1)
        case "gt" => ('>'.toInt, j + 1)
        case "quot" => ('"'.toInt, j + 1)
        case "apos" => ('\''.toInt, j + 1)
        case "nbsp" => (0xa0, j + 1)
        case _ => null
      }
    }
  }
}
