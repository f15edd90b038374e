package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.HtmlExtract

/** Catalog entries: round-13 additions — the HTML → text extraction tier
  * ([[graft.expressions.HtmlKernel]], `graft_html_text` /
  * `graft_html_extract`), anchored with the q199/q211/q212 convention:
  * synthesize standards-shaped HTML per document IN-PLAN from `doc_id`
  * arithmetic plus a sanitized text fragment, extract with the kernel, and
  * have the DuckDB oracle replay the EXPECTED TEXT FORMULA only — the
  * oracle never parses HTML, so any tokenizer, entity, raw-text,
  * whitespace-collapse, or counter bug breaks the hash.
  */
object Queries25 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Sanitized fragment of the document text: lowercase letters and single
    * spaces only, so the synth HTML contains no accidental markup or
    * entities and the oracle's whitespace replay is trivial. Both engines
    * build it with the same three string functions. */
  private def fragCol: Column =
    trim(regexp_replace(
      regexp_replace(substring(col("text"), 1, 120), "[^a-z ]", ""),
      " +", " "))

  private val FragSql: String =
    "trim(regexp_replace(regexp_replace(substr(text, 1, 120), " +
      "'[^a-z ]', '', 'g'), ' +', ' ', 'g'))"

  /** HTML extraction round trip: the synth page exercises every tokenizer
    * branch — doctype, comment (with markup inside), style/script raw text
    * (with a fake end tag inside the script), a quoted `>` in an attribute,
    * named + decimal + hex entities, an unknown entity and an unterminated
    * `&amp` (both literal), a literal `<` in text, `&nbsp;` + `&#10;`
    * whitespace collapsing, inline anchor vs block tags, and a
    * self-closing `<br/>`. The oracle replays the expected text as pure
    * string arithmetic and the counters as constants + lengths. */
  val q213HtmlText: (String, QueryDef) = q(
    "q213_html_text",
    s"""WITH f AS (
       |  SELECT doc_id, $FragSql AS frag
       |  FROM documents WHERE doc_id < 200),
       |h AS (
       |  SELECT doc_id, frag,
       |    '<!DOCTYPE html><html><head><title>T&amp;' ||
       |      CAST(doc_id AS VARCHAR) ||
       |    '</title><style>p{x:1}</style><script>if(1<2){"</b >"}' ||
       |    '</script></head><body data-x="&gt;>"><h1 id=''a''>H' ||
       |      CAST(doc_id AS VARCHAR) ||
       |    ' &lt;tag&gt;</h1><!-- c <p>no</p> --><p> ' || frag ||
       |    ' &#65;&#x42; x</p><div><a href="/u?a=1&amp;b=2">link text ' ||
       |      CAST(doc_id AS VARCHAR) ||
       |    '</a> tail &bogus; &amp</div><br/>3 < 5 &nbsp;ok&#10;done' ||
       |    '</body></html>' AS html,
       |    'T&' || CAST(doc_id AS VARCHAR) || chr(10) ||
       |    'H' || CAST(doc_id AS VARCHAR) || ' <tag>' || chr(10) ||
       |    ltrim(frag || ' AB x') || chr(10) ||
       |    'link text ' || CAST(doc_id AS VARCHAR) ||
       |      ' tail &bogus; &amp' || chr(10) ||
       |    '3 < 5 ok done' AS txt
       |  FROM f)
       |SELECT doc_id, txt AS text,
       |  CAST(21 AS BIGINT) AS n_tags,
       |  CAST(length(txt) AS BIGINT) AS text_bytes,
       |  CAST(1 AS BIGINT) AS n_links,
       |  CAST(11 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
       |    AS anchor_text_bytes,
       |  CAST(5 AS BIGINT) AS n_blocks,
       |  CAST(22 AS BIGINT) AS dropped_bytes,
       |  CAST(length(html) AS BIGINT) AS html_bytes
       |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val html = concat(
      lit("<!DOCTYPE html><html><head><title>T&amp;"), ds,
      lit("</title><style>p{x:1}</style><script>if(1<2){\"</b >\"}" +
        "</script></head><body data-x=\"&gt;>\"><h1 id='a'>H"), ds,
      lit(" &lt;tag&gt;</h1><!-- c <p>no</p> --><p> "), fragCol,
      lit(" &#65;&#x42; x</p><div><a href=\"/u?a=1&amp;b=2\">link text "), ds,
      lit("</a> tail &bogus; &amp</div><br/>3 < 5 &nbsp;ok&#10;done" +
        "</body></html>"))
    t("documents").filter(d < 200)
      .select(d, call_function("graft_html_extract", html).as("e"))
      .select(d, col("e.text").as("text"), col("e.n_tags").as("n_tags"),
        col("e.text_bytes").as("text_bytes"),
        col("e.n_links").as("n_links"),
        col("e.anchor_text_bytes").as("anchor_text_bytes"),
        col("e.n_blocks").as("n_blocks"),
        col("e.dropped_bytes").as("dropped_bytes"),
        col("e.html_bytes").as("html_bytes"))
      .orderBy(d)
  }

  /** Link-density boilerplate filter through the OPERATOR surface
    * ([[HtmlExtract.extract]] / [[HtmlExtract.linkDensity]]): `doc_id % 7`
    * anchors per page plus the fragment as article text; density =
    * anchor-text share (one IEEE division, NULL on empty text), `kept` is
    * the [[HtmlExtract.dropBoilerplate]] predicate at 0.6. Link-farm rows
    * (empty fragment, k ≥ 1 → density exactly 1.0) drop; no-link prose
    * keeps; empty pages fail the size test. The oracle replays text and
    * counters arithmetically (anchor bytes 2k−1: the k `w`s plus the k−1
    * between-link spaces, attributed at flush time — the documented
    * separator rule). */
  val q214LinkDensity: (String, QueryDef) = q(
    "q214_link_density",
    s"""WITH f AS (
       |  SELECT doc_id, CAST(doc_id % 7 AS INT) AS k, $FragSql AS frag
       |  FROM documents WHERE doc_id < 300),
       |x AS (
       |  SELECT doc_id, k, frag,
       |    rtrim(repeat('w ', k)) AS s1,
       |    CASE WHEN k > 0 THEN 2*k - 1 ELSE 0 END AS a,
       |    '<div>' || repeat('<a href="u">w</a> ', k) || '</div><p>' ||
       |      frag || '</p>' AS html
       |  FROM f),
       |y AS (
       |  SELECT doc_id, k, a,
       |    CASE WHEN k > 0 AND frag <> '' THEN s1 || chr(10) || frag
       |         WHEN k > 0 THEN s1 ELSE frag END AS txt,
       |    length(html) AS hb
       |  FROM x)
       |SELECT doc_id, CAST(k AS BIGINT) AS n_links,
       |  CAST(a AS BIGINT) AS anchor_text_bytes,
       |  CAST(length(txt) AS BIGINT) AS text_bytes,
       |  CASE WHEN length(txt) > 0
       |    THEN CAST(a AS DOUBLE) / CAST(length(txt) AS DOUBLE) END
       |    AS link_density,
       |  (length(txt) >= 1 AND
       |   CAST(a AS DOUBLE) / CAST(length(txt) AS DOUBLE) <= 0.6) AS kept
       |FROM y ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val k = (d % 7).cast("int")
    val page = concat(lit("<div>"),
      call_function("repeat", lit("<a href=\"u\">w</a> "), k),
      lit("</div><p>"), fragCol, lit("</p>"))
    val base = t("documents").filter(d < 300).select(d, page.as("page"))
    val e = HtmlExtract.extract(base, "page", "e")
    val ld = HtmlExtract.linkDensity(col("e"))
    e.select(d, col("e.n_links").as("n_links"),
      col("e.anchor_text_bytes").as("anchor_text_bytes"),
      col("e.text_bytes").as("text_bytes"),
      ld.as("link_density"),
      (col("e.text_bytes") >= 1L && ld <= 0.6).as("kept"))
      .orderBy(d)
  }

  /** Outlink graph from raw pages — the crawl-frontier composition:
    * `graft_html_links` (entity-decoded hrefs, incl. `&amp;` inside
    * attribute values) → explode → `graft_canon_url` (case/default-port/
    * tracking-param folding, the q207 machinery) → group by canonical
    * URL. Three raw spellings per generated link — bare, SHOUTED host
    * with a zero-padded default port, and a query carrying an HTML
    * entity plus a tracking param — fold onto two canonical keys. The
    * oracle rebuilds the canonical form from the generating parts (the
    * q207 convention) and never touches HTML or URL parsing. */
  val q215Outlinks: (String, QueryDef) = q(
    "q215_outlink_graph",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 5 + 1 AS k
      |  FROM documents WHERE doc_id < 300),
      |l AS (
      |  SELECT doc_id, unnest(generate_series(0, CAST(k - 1 AS BIGINT)))
      |    AS j FROM p),
      |e AS (
      |  SELECT doc_id,
      |    'http://ex' || CAST((doc_id + 3*j) % 7 AS VARCHAR) || '.test/p'
      |      || CAST((doc_id + 3*j) % 13 AS VARCHAR) ||
      |    CASE WHEN (doc_id + 3*j) % 3 = 2 THEN '?a=1' ELSE '' END AS canon
      |  FROM l)
      |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_refs,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM e GROUP BY canon ORDER BY canon""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val k = (d % 5 + 1).cast("int")
    val page = concat(lit("<html><body>"),
      array_join(transform(sequence(lit(0), k - 1), j => {
        val g = d + j * 3
        val h = (g % 7).cast("string")
        val pth = (g % 13).cast("string")
        val v = g % 3
        val href =
          when(v === 1,
            concat(lit("HTTP://EX"), h, lit(".TEST:080/p"), pth))
          .when(v === 2,
            concat(lit("http://ex"), h, lit(".test/p"), pth,
              lit("?a=1&amp;utm_source=x")))
          .otherwise(concat(lit("http://ex"), h, lit(".test/p"), pth))
        concat(lit("<a href=\""), href, lit("\">x</a> "))
      }), ""),
      lit("</body></html>"))
    val base = t("documents").filter(d < 300).select(d, page.as("page"))
    graft.operators.HtmlExtract.outlinks(base, "page")
      .select(d, call_function("graft_canon_url", col("href")).as("canon"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_refs"), min(d).as("first_doc"))
      .orderBy(col("canon"))
  }

  /** The crawl pipeline's FIRST hop, end to end in one plan: synthesize a
    * two-record WARC file per document (a `warcinfo` record and an HTTP
    * `response` record whose block carries an HTML page), parse with
    * [[graft.expressions.WarcKernel]] (`graft_warc_parse`), explode to
    * records, and run `graft_html_text` on every body — WARC bytes →
    * records → HTTP status/mime/body split → text, the exact chain a
    * CommonCrawl ingest runs. The oracle replays record fields and the
    * expected text as string arithmetic (the q213 convention): any header
    * walk, Content-Length accounting, HTTP split, or angle-bracket-URI
    * bug breaks the hash. */
  val q216WarcPipeline: (String, QueryDef) = q(
    "q216_warc_pipeline",
    s"""WITH f AS (
       |  SELECT doc_id, $FragSql AS frag
       |  FROM documents WHERE doc_id < 200),
       |h AS (
       |  SELECT doc_id, frag,
       |    '<html><body><p>' || frag || '</p><a href="/next?id=' ||
       |      CAST(doc_id AS VARCHAR) || '&amp;x=1">next</a></body></html>'
       |      AS html
       |  FROM f)
       |SELECT doc_id, rec_type, uri, status, mime, body_len, txt FROM (
       |  SELECT doc_id, 'warcinfo' AS rec_type, CAST(NULL AS VARCHAR) AS uri,
       |    CAST(NULL AS INT) AS status,
       |    'application/warc-fields' AS mime,
       |    CAST(17 AS BIGINT) AS body_len, 'software: graft' AS txt
       |  FROM h
       |  UNION ALL
       |  SELECT doc_id, 'response',
       |    'http://ex' || CAST(doc_id % 7 AS VARCHAR) || '.test/p' ||
       |      CAST(doc_id AS VARCHAR),
       |    CAST(200 AS INT), 'text/html; charset=utf-8',
       |    CAST(length(html) AS BIGINT),
       |    CASE WHEN frag = '' THEN 'next'
       |         ELSE frag || chr(10) || 'next' END
       |  FROM h)
       |ORDER BY doc_id, rec_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    val base = t("documents").filter(d < 200)
      .select(d, fragCol.as("frag"))
      .withColumn("html", concat(lit("<html><body><p>"), col("frag"),
        lit("</p><a href=\"/next?id="), ds,
        lit("&amp;x=1\">next</a></body></html>")))
      .withColumn("http", concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
          "\r\n\r\n"), col("html")))
      .withColumn("warc", concat(
        lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: " +
          "application/warc-fields\r\nContent-Length: 17\r\n\r\n" +
          "software: graft\r\n\r\n\r\n" +
          "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <http://ex"),
        h, lit(".test/p"), ds,
        lit(">\r\nContent-Type: application/http; msgtype=response\r\n" +
          "Content-Length: "),
        length(col("http")).cast("string"),
        lit("\r\n\r\n"), col("http"), lit("\r\n\r\n")))
    graft.operators.Multimodal.warcRecords(
        base.select(d, col("warc").cast("binary").as("payload")))
      .select(d, col("warc_rec.rec_type").as("rec_type"),
        col("warc_rec.uri").as("uri"), col("warc_rec.status").as("status"),
        col("warc_rec.mime").as("mime"),
        length(col("warc_rec.body")).cast("long").as("body_len"),
        call_function("graft_html_text",
          col("warc_rec.body").cast("string")).as("txt"))
      .orderBy(d, col("rec_type"))
  }

  /** Charset repair ([[graft.expressions.CharsetKernel]] — the HTML5
    * rule: valid UTF-8 is UTF-8, everything else decodes windows-1252):
    * four byte-shapes per document — pure ASCII, a valid UTF-8 é
    * (`C3 A9`), a latin-1 é (`E9`, invalid UTF-8), and a cp1252 curly
    * quote (`93`) — where shapes 1 and 2 decode to the SAME text from
    * DIFFERENT bytes (the whole point of the fallback). The oracle
    * replays the expected guess and decoded text with `chr()` arithmetic
    * and never touches bytes. */
  val q217CharsetFix: (String, QueryDef) = q(
    "q217_charset_fix",
    s"""WITH f AS (
       |  SELECT doc_id, $FragSql AS frag
       |  FROM documents WHERE doc_id < 200)
       |SELECT doc_id,
       |  CASE doc_id % 4 WHEN 0 THEN 'ascii' WHEN 1 THEN 'utf-8'
       |       ELSE 'windows-1252' END AS cs,
       |  CASE doc_id % 4 WHEN 0 THEN frag
       |       WHEN 1 THEN frag || chr(233)
       |       WHEN 2 THEN frag || chr(233)
       |       ELSE frag || chr(8220) END AS txt,
       |  CAST(length(CASE doc_id % 4 WHEN 0 THEN frag
       |       WHEN 1 THEN frag || chr(233)
       |       WHEN 2 THEN frag || chr(233)
       |       ELSE frag || chr(8220) END) AS BIGINT) AS n_chars
       |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val m = d % 4
    val fragBin = fragCol.cast("binary")
    val payload = when(m === 0, fragBin)
      .when(m === 1, concat(fragBin, unhex(lit("C3A9"))))
      .when(m === 2, concat(fragBin, unhex(lit("E9"))))
      .otherwise(concat(fragBin, unhex(lit("93"))))
    t("documents").filter(d < 200)
      .select(d, call_function("graft_charset_guess", payload).as("cs"),
        call_function("graft_charset_fix", payload).as("txt"))
      .select(d, col("cs"), col("txt"),
        length(col("txt")).cast("long").as("n_chars"))
      .orderBy(d)
  }

  /** Crawl-frontier robots filter ([[graft.expressions.RobotsKernel]],
    * RFC 9309): per document, a robots.txt with a `*` group (deny all)
    * and a `graftbot` group (deny `/p{m}`, allow the longer
    * `/p{m}/ok`), evaluated over four candidate paths. Exercises group
    * selection (exact token beats `*`), longest-match precedence with
    * the Allow tie-break, and the no-rule default. The oracle replays
    * the decision table with CASE arithmetic — prefix-only fixtures, so
    * the wildcard/anchor machinery is spec-pinned (RobotsSpec fuzz), the
    * q208 exact-companion convention. */
  val q218RobotsFrontier: (String, QueryDef) = q(
    "q218_robots_frontier",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 5 AS m FROM documents WHERE doc_id < 300),
      |e AS (
      |  SELECT doc_id, m, unnest(generate_series(0, CAST(3 AS BIGINT)))
      |    AS j FROM p),
      |x AS (
      |  SELECT doc_id, m, j,
      |    CASE WHEN j = 3 THEN '/p' || CAST(m AS VARCHAR) || '/ok'
      |         ELSE '/p' || CAST(j AS VARCHAR) END AS path
      |  FROM e)
      |SELECT doc_id, path,
      |  (CASE WHEN j = 3 THEN TRUE
      |        WHEN j = m THEN FALSE ELSE TRUE END) AS bot_ok,
      |  FALSE AS other_ok
      |FROM x ORDER BY doc_id, path""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val m = (d % 5).cast("string")
    val robots = concat(
      lit("# policy\r\nUser-agent: *\nDisallow: /\n\nUser-agent: GraftBot\n" +
        "Disallow: /p"), m, lit("\nAllow: /p"), m, lit("/ok\n"))
    val paths = concat(
      transform(sequence(lit(0), lit(2)),
        j => concat(lit("/p"), j.cast("string"))),
      array(concat(lit("/p"), m, lit("/ok"))))
    t("documents").filter(d < 300)
      .select(d, robots.as("robots"), explode(paths).as("path"))
      .select(d, col("path"),
        call_function("graft_robots_allowed", col("robots"),
          lit("graftbot"), col("path")).as("bot_ok"),
        call_function("graft_robots_allowed", col("robots"),
          lit("otherbot"), col("path")).as("other_ok"))
      .orderBy(d, col("path"))
  }

  /** [[graft.operators.Crawl.cleanCorpus]] end to end — the whole r13
    * ingest surface in ONE operator call over a four-record WARC per
    * document: a warcinfo record (dropped by type), a link-farm page
    * (density 1.0, dropped by the boilerplate filter), a 404 (dropped by
    * status), and an article whose bytes carry a latin-1 `é` on every
    * third document (exercising the charset fix MID-CHAIN — the kept
    * text differs from a naive UTF-8 cast exactly there). One output row
    * per document; the oracle replays url/status/mime/charset/text/
    * bytes/density arithmetically (`strlen` for BYTE counts — the é
    * rows' text_bytes exceed their char count by one). */
  val q219CleanCorpus: (String, QueryDef) = q(
    "q219_clean_corpus",
    s"""WITH f AS (
       |  SELECT doc_id, $FragSql AS frag
       |  FROM documents WHERE doc_id < 200),
       |x AS (
       |  SELECT doc_id, frag,
       |    CASE WHEN doc_id % 3 = 0 THEN chr(233) ELSE 'e' END AS ch
       |  FROM f),
       |y AS (
       |  SELECT doc_id,
       |    rtrim('caf' || ch || ' padding words keep density low ' || frag)
       |      || chr(10) || 'ref' AS txt,
       |    CASE WHEN doc_id % 3 = 0 THEN 'windows-1252'
       |         ELSE 'ascii' END AS charset
       |  FROM x)
       |SELECT doc_id,
       |  'http://ex' || CAST(doc_id % 7 AS VARCHAR) || '.test/p' ||
       |    CAST(doc_id AS VARCHAR) AS url,
       |  CAST(200 AS INT) AS status,
       |  'text/html; charset=utf-8' AS mime, charset,
       |  txt AS text, CAST(strlen(txt) AS BIGINT) AS text_bytes,
       |  CAST(4 AS DOUBLE) / CAST(strlen(txt) AS DOUBLE) AS link_density,
       |  CAST(1 AS BIGINT) AS n_links
       |FROM y ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    val chBin = when(d % 3 === 0, unhex(lit("E9")))
      .otherwise(lit("e").cast("binary"))
    val htmlArt = concat(lit("<html><body><p>caf").cast("binary"), chBin,
      concat(lit(" padding words keep density low "), fragCol,
        lit("</p><a href=\"/r?x=1\">ref</a></body></html>")).cast("binary"))
    val httpArt = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
        "\r\n\r\n").cast("binary"), htmlArt)
    val farm = "<div>" + ("<a href=\"/u\">w</a> " * 6) + "</div>"
    val httpFarm = lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      farm).cast("binary")
    val http404 = lit("HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n" +
      "<p>gone</p>").cast("binary")
    def resp(uriSuffix: Column, body: Column): Column = concat(
      concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        "<http://ex"), h, lit(".test/"), uriSuffix,
        lit(">\r\nContent-Type: application/http; msgtype=response\r\n" +
          "Content-Length: "), length(body).cast("string"),
        lit("\r\n\r\n")).cast("binary"),
      body, lit("\r\n\r\n").cast("binary"))
    val warc = concat(
      lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: " +
        "application/warc-fields\r\nContent-Length: 17\r\n\r\n" +
        "software: graft\r\n\r\n\r\n").cast("binary"),
      resp(concat(lit("farm"), ds), httpFarm),
      resp(concat(lit("gone"), ds), http404),
      resp(concat(lit("p"), ds), httpArt))
    graft.operators.Crawl.cleanCorpus(
        t("documents").filter(d < 200).select(d, warc.as("payload")),
        minTextBytes = 1)
      .select(d, col("url"), col("status"), col("mime"), col("charset"),
        col("text"), col("text_bytes"), col("link_density"), col("n_links"))
      .orderBy(d)
  }

  /** Document metadata pull (`graft_html_meta`): title RCDATA with an
    * entity and collapsing whitespace, `<html lang>` cycling three
    * values (absent on every fourth document → NULL), a canonical link
    * whose href carries an `&amp;` and a tracking param (the extracted
    * value AND its `graft_canon_url` fold are both checked), and a
    * description built from the fragment. The oracle replays every
    * field as string arithmetic. */
  val q220HtmlMeta: (String, QueryDef) = q(
    "q220_html_meta",
    s"""WITH f AS (
       |  SELECT doc_id, $FragSql AS frag
       |  FROM documents WHERE doc_id < 200)
       |SELECT doc_id,
       |  'T&' || CAST(doc_id AS VARCHAR) || ' x' AS title,
       |  CASE WHEN doc_id % 4 = 3 THEN CAST(NULL AS VARCHAR)
       |       WHEN doc_id % 3 = 0 THEN 'en' WHEN doc_id % 3 = 1 THEN 'de'
       |       ELSE 'fr' END AS lang,
       |  'http://ex' || CAST(doc_id % 7 AS VARCHAR) ||
       |    '.test/c?a=1&utm_source=z' AS canonical,
       |  'http://ex' || CAST(doc_id % 7 AS VARCHAR) || '.test/c?a=1'
       |    AS canon,
       |  CASE WHEN doc_id % 4 = 3 THEN CAST(NULL AS VARCHAR)
       |       WHEN frag = '' THEN 'desc !'
       |       ELSE 'desc ' || frag || ' !' END AS description
       |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    val langAttr = when(d % 4 === 3, lit(""))
      .otherwise(concat(lit(" lang=\""),
        when(d % 3 === 0, "en").when(d % 3 === 1, "de").otherwise("fr"),
        lit("\"")))
    val metaTag = when(d % 4 === 3, lit(""))
      .otherwise(concat(lit("<meta name=\"Description\" content=\"desc "),
        fragCol, lit(" &#33;\">")))
    val page = concat(lit("<html"), langAttr,
      lit("><head><title> T&amp;"), ds, lit("  x </title>" +
        "<link rel=\"canonical\" href=\"http://ex"), h,
      lit(".test/c?a=1&amp;utm_source=z\"/>"), metaTag,
      lit("</head><body><p>b</p></body></html>"))
    t("documents").filter(d < 200)
      .select(d, call_function("graft_html_meta", page).as("m"))
      .select(d, col("m.title").as("title"), col("m.lang").as("lang"),
        col("m.canonical").as("canonical"),
        call_function("graft_canon_url", col("m.canonical")).as("canon"),
        col("m.description").as("description"))
      .orderBy(d)
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q213HtmlText, q214LinkDensity, q215Outlinks, q216WarcPipeline,
      q217CharsetFix, q218RobotsFrontier, q219CleanCorpus, q220HtmlMeta)
}
