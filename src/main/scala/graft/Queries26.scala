package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Catalog entries: round-14 additions — crawl-ingest loss accounting
  * ([[graft.operators.Crawl.auditCorpus]], `graft_crawl_audit`) and the
  * crawl-frontier composition tier. Convention unchanged from q213–q220:
  * archives are synthesized IN-PLAN from `doc_id` arithmetic, and the
  * DuckDB oracle replays the EXPECTED VALUES as pure CASE/string
  * arithmetic — it never parses WARC or HTML, so any kernel or funnel
  * bug breaks the hash.
  */
object Queries26 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Sanitized fragment of the document text (the q213 convention). */
  private def fragCol: Column =
    trim(regexp_replace(
      regexp_replace(substring(col("text"), 1, 120), "[^a-z ]", ""),
      " +", " "))

  /** Loss-accounting funnel ([[graft.operators.Crawl.auditCorpus]]): each
    * document's archive PLANTS one loss of every kind — a warcinfo record
    * (non-response), `doc_id % 3` copies of a 404 (status gate), a PNG
    * response (mime gate), a sub-threshold page on even docs (size
    * filter), a link farm (density filter), and one article that survives
    * (carrying a latin-1 byte on every third doc, so `charset_fallbacks`
    * is load-bearing too) — and every seventh document's payload is
    * corrupt outright (`parse_nulls`). The oracle replays all nine
    * counters as CASE arithmetic on `doc_id`; conservation
    * (`records = Σ exits`) is implied by the per-column hashes. */
  val q221CrawlAudit: (String, QueryDef) = q(
    "q221_crawl_audit",
    """SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 0
      |       ELSE 4 + (doc_id % 3) + (CASE WHEN doc_id % 2 = 0 THEN 1
      |                                ELSE 0 END) END AS BIGINT) AS records,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS parse_nulls,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS BIGINT)
      |    AS non_response,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE doc_id % 3 END AS BIGINT)
      |    AS gated_status,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS BIGINT)
      |    AS gated_mime,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 0
      |       WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS charset_fallbacks,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 0
      |       WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS dropped_small,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS BIGINT)
      |    AS dropped_boilerplate,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS BIGINT) AS kept
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    // the q219 page builders: surviving article (latin-1 byte on every
    // third doc), link farm (density 1.0), plus the planted losses
    val chBin = when(d % 3 === 0, unhex(lit("E9")))
      .otherwise(lit("e").cast("binary"))
    val htmlArt = concat(lit("<html><body><p>caf").cast("binary"), chBin,
      concat(lit(" padding words keep density low "), fragCol,
        lit("</p><a href=\"/r?x=1\">ref</a></body></html>")).cast("binary"))
    val httpArt = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
        "\r\n\r\n").cast("binary"), htmlArt)
    val farm = "<div>" + ("<a href=\"/u\">w</a> " * 6) + "</div>"
    val httpFarm = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + farm
    val http404 = "HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n" +
      "<p>gone</p>"
    val httpPng = "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nfakepng"
    val httpTiny = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<p>x</p>"
    // ASCII-only records as strings (so `repeat` can multiply them)
    def respStr(uriSuffix: String, body: String): String =
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        s"<http://ex.test/$uriSuffix>\r\nContent-Type: application/http; " +
        s"msgtype=response\r\nContent-Length: ${body.length}\r\n\r\n" +
        body + "\r\n\r\n"
    // the article record carries binary (the latin-1 byte): column form
    val respArt = concat(
      concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        "<http://ex"), h, lit(".test/p"), ds,
        lit(">\r\nContent-Type: application/http; msgtype=response\r\n" +
          "Content-Length: "), length(httpArt).cast("string"),
        lit("\r\n\r\n")).cast("binary"),
      httpArt, lit("\r\n\r\n").cast("binary"))
    val warcinfo = "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: " +
      "application/warc-fields\r\nContent-Length: 17\r\n\r\n" +
      "software: graft\r\n\r\n\r\n"
    val good = concat(
      lit(warcinfo).cast("binary"),
      repeat(lit(respStr("gone", http404)), (d % 3).cast("int"))
        .cast("binary"),
      lit(respStr("img", httpPng)).cast("binary"),
      when(d % 2 === 0, lit(respStr("tiny", httpTiny)))
        .otherwise(lit("")).cast("binary"),
      lit(respStr("farm", httpFarm)).cast("binary"),
      respArt)
    val payload = when(d % 7 === 0, lit("XX").cast("binary")).otherwise(good)
    graft.operators.Crawl.auditCorpus(
        t("documents").filter(d < 200).select(d, payload.as("payload")),
        maxLinkDensity = 0.5, minTextBytes = 5L, by = Seq("doc_id"))
      .orderBy(d)
  }

  /** Wildcard/anchor robots decision table — q218's oracle covers
    * prefix-only rules; this one pins the `*` / final-`$` machinery with
    * an exact CASE-arithmetic replay (the engine convention: oracle-
    * anchored wherever SQL can express the expectation; the 4000-case
    * RobotsSpec fuzz remains the breadth check). Per document the policy
    * mixes an anchored Disallow, a LONGER anchored Allow (raw-length
    * precedence, wildcards counted), a mid-path `*` Allow over a short
    * Disallow prefix, and an `m`-parameterized anchored rule; six paths
    * hit every branch: anchor match, anchor miss (default allow),
    * longest-wins with wildcards, mid-`*` win, prefix deny, and the
    * m-dependent rule. `otherbot` matches no group → all allowed. */
  val q222RobotsWildcards: (String, QueryDef) = q(
    "q222_robots_wildcards",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 5 AS m FROM documents WHERE doc_id < 300),
      |e AS (
      |  SELECT doc_id, m, unnest(generate_series(0, CAST(5 AS BIGINT)))
      |    AS j FROM p),
      |x AS (
      |  SELECT doc_id, m, j,
      |    CASE j
      |      WHEN 0 THEN '/t/x' || CAST(m AS VARCHAR) || '.bak'
      |      WHEN 1 THEN '/t/x' || CAST(m AS VARCHAR) || '.bakzz'
      |      WHEN 2 THEN '/t/keep' || CAST(m AS VARCHAR) || '.bak'
      |      WHEN 3 THEN '/b/q' || CAST(m AS VARCHAR) || '/c'
      |      WHEN 4 THEN '/b/q' || CAST(m AS VARCHAR) || '/d'
      |      ELSE '/w2zzx' END AS path
      |  FROM e)
      |SELECT doc_id, path,
      |  (CASE j WHEN 0 THEN FALSE WHEN 1 THEN TRUE WHEN 2 THEN TRUE
      |          WHEN 3 THEN TRUE WHEN 4 THEN FALSE
      |          ELSE (m <> 2) END) AS bot_ok,
      |  TRUE AS other_ok
      |FROM x ORDER BY doc_id, path""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val m = (d % 5).cast("string")
    val robots = concat(
      lit("User-agent: GraftBot\nDisallow: /t/*.bak$\n" +
        "Allow: /t/keep*.bak$\nAllow: /b/*/c\nDisallow: /b\n" +
        "Disallow: /w"), m, lit("*x$\n"))
    val paths = array(
      concat(lit("/t/x"), m, lit(".bak")),
      concat(lit("/t/x"), m, lit(".bakzz")),
      concat(lit("/t/keep"), m, lit(".bak")),
      concat(lit("/b/q"), m, lit("/c")),
      concat(lit("/b/q"), m, lit("/d")),
      lit("/w2zzx"))
    t("documents").filter(d < 300)
      .select(d, robots.as("robots"), explode(paths).as("path"))
      .select(d, col("path"),
        call_function("graft_robots_allowed", col("robots"),
          lit("graftbot"), col("path")).as("bot_ok"),
        call_function("graft_robots_allowed", col("robots"),
          lit("otherbot"), col("path")).as("other_ok"))
      .orderBy(d, col("path"))
  }

  /** The incremental-crawl frontier round trip — every crawl-tier piece
    * composed into the production shape: crawled pages → outlinks
    * (`graft_html_links`, q215's exact page generator) → `graft_canon_url`
    * → host extraction → BROADCAST join to the per-host robots dim →
    * `graft_robots_allowed` (an anchored `$` rule, so the wildcard
    * matcher is mid-chain) → BROADCAST anti-join against the standing
    * corpus (URLs already crawled: every even path, query-free) → dedup
    * + ref-count per new URL. At 100 TB the two dims (robots per host,
    * corpus keys per partition range) are the small sides — both joins
    * broadcast, the only shuffle is the final canon-key rollup. The
    * oracle replays robots (`pth = h`, no query) and corpus membership
    * (`pth` even, no query) as pure modular arithmetic on the link
    * generator — it never parses HTML, URLs, or robots.txt. */
  val q223CrawlFrontier: (String, QueryDef) = q(
    "q223_crawl_frontier",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 5 + 1 AS k
      |  FROM documents WHERE doc_id < 300),
      |l AS (
      |  SELECT doc_id, unnest(generate_series(0, CAST(k - 1 AS BIGINT)))
      |    AS j FROM p),
      |f AS (
      |  SELECT doc_id, (doc_id + 3*j) % 7 AS h, (doc_id + 3*j) % 13 AS pth,
      |    (doc_id + 3*j) % 3 AS v
      |  FROM l),
      |x AS (
      |  SELECT doc_id,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/p' ||
      |      CAST(pth AS VARCHAR) ||
      |      CASE WHEN v = 2 THEN '?a=1' ELSE '' END AS canon
      |  FROM f
      |  WHERE NOT (pth = h AND v <> 2)
      |    AND NOT (pth % 2 = 0 AND v <> 2))
      |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_refs,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM x GROUP BY canon ORDER BY canon""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val k = (d % 5 + 1).cast("int")
    // q215's page generator verbatim: three raw spellings per link fold
    // onto one canonical key each
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
    val links = graft.operators.HtmlExtract.outlinks(base, "page")
      .select(d, call_function("graft_canon_url", col("href")).as("canon"))
      .withColumn("host", expr("parse_url(canon, 'HOST')"))
      .withColumn("path_q", concat(expr("parse_url(canon, 'PATH')"),
        coalesce(concat(lit("?"), expr("parse_url(canon, 'QUERY')")),
          lit(""))))
    // per-host robots dim: anchored rule — /p{h} exactly, queries escape
    val robotsDim = t("documents").filter(d < 7).select(
      concat(lit("ex"), d.cast("string"), lit(".test")).as("host"),
      concat(lit("User-agent: *\nDisallow: /p"), d.cast("string"),
        lit("$\n")).as("robots"))
    // standing corpus: every (host, even path) pair, query-free
    val corpus = t("documents").filter(d < 49).select(
      concat(lit("http://ex"), (d % 7).cast("string"), lit(".test/p"),
        (floor(d / 7) * 2).cast("long").cast("string")).as("canon"))
    links
      .join(broadcast(robotsDim), Seq("host"))
      .filter(call_function("graft_robots_allowed", col("robots"),
        lit("graftbot"), col("path_q")))
      .join(broadcast(corpus), Seq("canon"), "left_anti")
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_refs"), min(d).as("first_doc"))
      .orderBy(col("canon"))
  }

  /** The crawl tier's DECADE INSTRUMENT — q221's planted-loss archive
    * construction with the `doc_id` cap REMOVED (work grows with the
    * corpus, which the q213–q223 anchors deliberately don't: their
    * fixed-N fixtures exist for oracle tractability) and the rollup by
    * host (7 groups), so ScaleBench can measure the whole WARC → charset
    * → HTML → funnel chain across ScaleGen decades and ScaleGate can
    * gate its exponents. Corruption moves to `doc_id % 11` so every
    * host group carries a mix of losses. Still fully oracle-anchored:
    * per-host SUMs of the same CASE arithmetic. */
  val q224CrawlAuditScale: (String, QueryDef) = q(
    "q224_crawl_audit_scale",
    """SELECT doc_id % 7 AS host,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0
      |       ELSE 4 + (doc_id % 3) + (CASE WHEN doc_id % 2 = 0 THEN 1
      |                                ELSE 0 END) END) AS BIGINT)
      |    AS records,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS parse_nulls,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS non_response,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE doc_id % 3 END)
      |    AS BIGINT) AS gated_status,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS gated_mime,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0
      |       WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS charset_fallbacks,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0
      |       WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS dropped_small,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS dropped_boilerplate,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS kept
      |FROM documents GROUP BY 1 ORDER BY host""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val chBin = when(d % 3 === 0, unhex(lit("E9")))
      .otherwise(lit("e").cast("binary"))
    val htmlArt = concat(lit("<html><body><p>caf").cast("binary"), chBin,
      concat(lit(" padding words keep density low "), fragCol,
        lit("</p><a href=\"/r?x=1\">ref</a></body></html>")).cast("binary"))
    val httpArt = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
        "\r\n\r\n").cast("binary"), htmlArt)
    val farm = "<div>" + ("<a href=\"/u\">w</a> " * 6) + "</div>"
    val httpFarm = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + farm
    val http404 = "HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n" +
      "<p>gone</p>"
    val httpPng = "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nfakepng"
    val httpTiny = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<p>x</p>"
    def respStr(uriSuffix: String, body: String): String =
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        s"<http://ex.test/$uriSuffix>\r\nContent-Type: application/http; " +
        s"msgtype=response\r\nContent-Length: ${body.length}\r\n\r\n" +
        body + "\r\n\r\n"
    val respArt = concat(
      concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        "<http://ex.test/p"), ds,
        lit(">\r\nContent-Type: application/http; msgtype=response\r\n" +
          "Content-Length: "), length(httpArt).cast("string"),
        lit("\r\n\r\n")).cast("binary"),
      httpArt, lit("\r\n\r\n").cast("binary"))
    val warcinfo = "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: " +
      "application/warc-fields\r\nContent-Length: 17\r\n\r\n" +
      "software: graft\r\n\r\n\r\n"
    val good = concat(
      lit(warcinfo).cast("binary"),
      repeat(lit(respStr("gone", http404)), (d % 3).cast("int"))
        .cast("binary"),
      lit(respStr("img", httpPng)).cast("binary"),
      when(d % 2 === 0, lit(respStr("tiny", httpTiny)))
        .otherwise(lit("")).cast("binary"),
      lit(respStr("farm", httpFarm)).cast("binary"),
      respArt)
    val payload = when(d % 11 === 0, lit("XX").cast("binary")).otherwise(good)
    graft.operators.Crawl.auditCorpus(
        t("documents").select((d % 7).as("host"), payload.as("payload")),
        maxLinkDensity = 0.5, minTextBytes = 5L, by = Seq("host"))
      .orderBy(col("host"))
  }

  /** q223's frontier round trip, uncapped — the second crawl decade
    * instrument: outlink extraction + canonicalization grow with the
    * corpus while the robots and standing-corpus dims stay bounded
    * (exactly the 100 TB shape: per-host policy and per-range corpus
    * keys are the broadcast sides at any scale). Oracle identical in
    * form to q223's modular-arithmetic replay, over all documents. */
  val q225FrontierScale: (String, QueryDef) = q(
    "q225_frontier_scale",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 5 + 1 AS k FROM documents),
      |l AS (
      |  SELECT doc_id, unnest(generate_series(0, CAST(k - 1 AS BIGINT)))
      |    AS j FROM p),
      |f AS (
      |  SELECT doc_id, (doc_id + 3*j) % 7 AS h, (doc_id + 3*j) % 13 AS pth,
      |    (doc_id + 3*j) % 3 AS v
      |  FROM l),
      |x AS (
      |  SELECT doc_id,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/p' ||
      |      CAST(pth AS VARCHAR) ||
      |      CASE WHEN v = 2 THEN '?a=1' ELSE '' END AS canon
      |  FROM f
      |  WHERE NOT (pth = h AND v <> 2)
      |    AND NOT (pth % 2 = 0 AND v <> 2))
      |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_refs,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM x GROUP BY canon ORDER BY canon""".stripMargin) { (s, dir) =>
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
    val base = t("documents").select(d, page.as("page"))
    val links = graft.operators.HtmlExtract.outlinks(base, "page")
      .select(d, call_function("graft_canon_url", col("href")).as("canon"))
      .withColumn("host", expr("parse_url(canon, 'HOST')"))
      .withColumn("path_q", concat(expr("parse_url(canon, 'PATH')"),
        coalesce(concat(lit("?"), expr("parse_url(canon, 'QUERY')")),
          lit(""))))
    val robotsDim = t("documents").filter(d < 7).select(
      concat(lit("ex"), d.cast("string"), lit(".test")).as("host"),
      concat(lit("User-agent: *\nDisallow: /p"), d.cast("string"),
        lit("$\n")).as("robots"))
    val corpus = t("documents").filter(d < 49).select(
      concat(lit("http://ex"), (d % 7).cast("string"), lit(".test/p"),
        (floor(d / 7) * 2).cast("long").cast("string")).as("canon"))
    links
      .join(broadcast(robotsDim), Seq("host"))
      .filter(call_function("graft_robots_allowed", col("robots"),
        lit("graftbot"), col("path_q")))
      .join(broadcast(corpus), Seq("canon"), "left_anti")
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_refs"), min(d).as("first_doc"))
      .orderBy(col("canon"))
  }

  /** Redirect edges ([[graft.operators.Crawl.redirectEdges]],
    * `graft_warc_parse`'s r14 `location` field + `graft_resolve_url` +
    * `graft_canon_url`): per document one 3xx response whose `Location`
    * cycles the four shapes a real crawl sees — absolute-path, dotted
    * relative (`../`), absolute URL in SHOUTED case with a default port
    * and a tracking param (canon folds all three), and bare relative
    * with a query — plus a 200 record that must NOT appear. The oracle
    * replays both canonical endpoints and the status as string/CASE
    * arithmetic; it never parses WARC, HTTP, or URLs, so a header-walk,
    * RFC 3986 resolution, or canonicalization bug breaks the hash. */
  val q226RedirectEdges: (String, QueryDef) = q(
    "q226_redirect_edges",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 4 AS m, doc_id % 7 AS h,
      |    (doc_id + 1) % 7 AS h2
      |  FROM documents WHERE doc_id < 300)
      |SELECT doc_id,
      |  'http://ex' || CAST(h AS VARCHAR) || '.test/dir/sub/r' ||
      |    CAST(doc_id AS VARCHAR) AS from_url,
      |  CASE m
      |    WHEN 0 THEN 'http://ex' || CAST(h AS VARCHAR) || '.test/abs/p'
      |      || CAST(doc_id AS VARCHAR)
      |    WHEN 1 THEN 'http://ex' || CAST(h AS VARCHAR) ||
      |      '.test/dir/up/p' || CAST(doc_id AS VARCHAR)
      |    WHEN 2 THEN 'http://ex' || CAST(h2 AS VARCHAR) || '.test/q' ||
      |      CAST(doc_id AS VARCHAR) || '?a=1'
      |    ELSE 'http://ex' || CAST(h AS VARCHAR) || '.test/dir/sub/p' ||
      |      CAST(doc_id AS VARCHAR) || '?x=2' END AS to_url,
      |  CAST(CASE m WHEN 0 THEN 301 WHEN 1 THEN 302 WHEN 2 THEN 307
      |       ELSE 308 END AS INT) AS status
      |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val m = d % 4
    val h = (d % 7).cast("string")
    val h2 = ((d + 1) % 7).cast("string")
    val loc = when(m === 0, concat(lit("/abs/p"), ds))
      .when(m === 1, concat(lit("../up/p"), ds))
      .when(m === 2, concat(lit("HTTP://EX"), h2, lit(".TEST:080/q"), ds,
        lit("?a=1&utm_source=z")))
      .otherwise(concat(lit("p"), ds, lit("?x=2")))
    val statusLine = when(m === 0, lit("301 Moved"))
      .when(m === 1, lit("302 Found")).when(m === 2, lit("307 TR"))
      .otherwise(lit("308 PR"))
    val httpRedir = concat(lit("HTTP/1.1 "), statusLine,
      lit("\r\nLocation: "), loc,
      lit("\r\nContent-Type: text/html\r\n\r\n<p>moved</p>"))
    val http200 = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<p>fine</p>"
    def respCol(uriSuffix: Column, body: Column): Column = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        "<http://ex"), h, lit(".test/"), uriSuffix,
      lit(">\r\nContent-Type: application/http; msgtype=response\r\n" +
        "Content-Length: "), length(body).cast("string"),
      lit("\r\n\r\n"), body, lit("\r\n\r\n"))
    val warc = concat(
      respCol(concat(lit("dir/sub/r"), ds), httpRedir),
      respCol(concat(lit("ok"), ds), lit(http200))).cast("binary")
    graft.operators.Crawl.redirectEdges(
        t("documents").filter(d < 300).select(d, warc.as("payload")))
      .select(d, col("from_url"), col("to_url"), col("status"))
      .orderBy(d)
  }

  /** Relative-outlink resolution through the operator surface
    * ([[graft.operators.HtmlExtract.resolvedOutlinks]]): pages carry the
    * three RELATIVE href shapes a real crawl sees — sibling (`p{g}`),
    * absolute-path (`/top/p{g}`), and dotted-with-query
    * (`../other/p{g}?a=1&amp;utm_source=x`, exercising entity decode,
    * `..` folding, and canon's tracking-param strip in one edge) —
    * anchored on a two-segment page URL so merge/dot-removal are both
    * load-bearing. The oracle rebuilds every canonical target from the
    * generating parts (the q215/q207 convention). */
  val q227ResolvedOutlinks: (String, QueryDef) = q(
    "q227_resolved_outlinks",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 5 + 1 AS k, doc_id % 7 AS h,
      |    doc_id % 3 AS s
      |  FROM documents WHERE doc_id < 300),
      |l AS (
      |  SELECT doc_id, h, s,
      |    unnest(generate_series(0, CAST(k - 1 AS BIGINT))) AS j FROM p),
      |e AS (
      |  SELECT doc_id, h, s, (doc_id + 3*j) AS g,
      |    (doc_id + 3*j) % 3 AS v FROM l),
      |x AS (
      |  SELECT doc_id,
      |    CASE v
      |      WHEN 0 THEN 'http://ex' || CAST(h AS VARCHAR) || '.test/sec'
      |        || CAST(s AS VARCHAR) || '/p' || CAST(g AS VARCHAR)
      |      WHEN 1 THEN 'http://ex' || CAST(h AS VARCHAR) || '.test/top/p'
      |        || CAST(g AS VARCHAR)
      |      ELSE 'http://ex' || CAST(h AS VARCHAR) || '.test/other/p' ||
      |        CAST(g AS VARCHAR) || '?a=1' END AS canon
      |  FROM e)
      |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_refs,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM x GROUP BY canon ORDER BY canon""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val k = (d % 5 + 1).cast("int")
    val h = (d % 7).cast("string")
    val sec = (d % 3).cast("string")
    val baseUrl = concat(lit("http://ex"), h, lit(".test/sec"), sec,
      lit("/idx"), d.cast("string"))
    val page = concat(lit("<html><body>"),
      array_join(transform(sequence(lit(0), k - 1), j => {
        val g = d + j * 3
        val gs = g.cast("string")
        val v = g % 3
        val href =
          when(v === 1, concat(lit("/top/p"), gs))
          .when(v === 2,
            concat(lit("../other/p"), gs, lit("?a=1&amp;utm_source=x")))
          .otherwise(concat(lit("p"), gs))
        concat(lit("<a href=\""), href, lit("\">x</a> "))
      }), ""),
      lit("</body></html>"))
    val base = t("documents").filter(d < 300)
      .select(d, baseUrl.as("page_url"), page.as("page"))
    graft.operators.HtmlExtract.resolvedOutlinks(base, "page", "page_url")
      .select(d, call_function("graft_canon_url", col("href")).as("canon"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_refs"), min(d).as("first_doc"))
      .orderBy(col("canon"))
  }

  /** Per-host politeness budget (`graft_robots_delay`): the frontier
    * scheduling query a polite crawler partitions fetches by. Hosts'
    * robots.txt carry a Crawl-delay spread — absent (host 0), fractional
    * (0.5), integral, and INVALID (`fast`, which must yield null, never
    * delay-zero) — and the budget is `n_urls × coalesce(delay, 1.0)`
    * seconds of serialized fetching per host. Broadcast robots dim,
    * per-host rollup; oracle replays counts and CASE delays
    * arithmetically. */
  val q228PolitenessBudget: (String, QueryDef) = q(
    "q228_politeness_budget",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 7 AS host_id, doc_id % 3 + 1 AS k
      |  FROM documents WHERE doc_id < 300),
      |agg AS (
      |  SELECT host_id, CAST(SUM(k) AS BIGINT) AS n_urls
      |  FROM p GROUP BY host_id),
      |d AS (
      |  SELECT host_id, n_urls,
      |    CASE host_id WHEN 0 THEN CAST(NULL AS DOUBLE)
      |      WHEN 1 THEN 0.5 WHEN 2 THEN 2.0
      |      WHEN 3 THEN CAST(NULL AS DOUBLE)
      |      ELSE CAST(host_id AS DOUBLE) END AS crawl_delay
      |  FROM agg)
      |SELECT host_id, n_urls, crawl_delay,
      |  CAST(n_urls AS DOUBLE) * COALESCE(crawl_delay, 1.0)
      |    AS est_seconds
      |FROM d ORDER BY host_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val urls = t("documents").filter(d < 300)
      .select((d % 7).as("host_id"),
        explode(sequence(lit(1), (d % 3 + 1).cast("int"))).as("j"))
    val h = col("host_id")
    val delayLine = when(h === 0, lit(""))
      .when(h === 1, lit("Crawl-delay: 0.5\n"))
      .when(h === 2, lit("Crawl-delay: 2\n"))
      .when(h === 3, lit("Crawl-delay: fast\n"))
      .otherwise(concat(lit("Crawl-delay: "), h.cast("string"), lit("\n")))
    val robotsDim = t("documents").filter(d < 7)
      .select((d % 7).as("host_id"))
      .select(h, concat(lit("User-agent: *\n"), delayLine,
        lit("Disallow: /private\n")).as("robots"))
    urls.join(broadcast(robotsDim), Seq("host_id"))
      .withColumn("delay",
        call_function("graft_robots_delay", col("robots"), lit("graftbot")))
      .groupBy(h)
      .agg(count(lit(1)).as("n_urls"), max(col("delay")).as("crawl_delay"))
      .withColumn("est_seconds",
        col("n_urls").cast("double") * coalesce(col("crawl_delay"), lit(1.0)))
      .orderBy(h)
  }

  /** Sitemap ingestion (`graft_sitemap_parse`): per document an in-plan
    * urlset whose entries cycle three shapes — plain loc, loc + lastmod,
    * and a loc whose query carries an XML entity plus a tracking param
    * (so entity decode AND canon's strip are both load-bearing) — with
    * a priority derived from the generator. The oracle replays loc,
    * canonical key, lastmod, and priority as string/CASE arithmetic
    * (priority via division — both engines' nearest-double of n/10
    * agree bit-for-bit); it never parses XML. */
  val q229SitemapFrontier: (String, QueryDef) = q(
    "q229_sitemap_frontier",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 4 + 1 AS k, doc_id % 7 AS h
      |  FROM documents WHERE doc_id < 300),
      |l AS (
      |  SELECT doc_id, h,
      |    unnest(generate_series(0, CAST(k - 1 AS BIGINT))) AS j FROM p),
      |e AS (
      |  SELECT doc_id, h, (doc_id + 3*j) AS g, (doc_id + 3*j) % 3 AS v
      |  FROM l),
      |x AS (
      |  SELECT doc_id,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/sm' ||
      |      CAST(g AS VARCHAR) ||
      |      CASE WHEN v = 2 THEN '?a=1&utm_source=z' ELSE '' END AS loc,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/sm' ||
      |      CAST(g AS VARCHAR) ||
      |      CASE WHEN v = 2 THEN '?a=1' ELSE '' END AS canon,
      |    CASE WHEN v = 1 THEN '2026-01-0' || CAST(g % 9 + 1 AS VARCHAR)
      |         ELSE CAST(NULL AS VARCHAR) END AS lastmod,
      |    CAST(g % 10 AS DOUBLE) / 10.0 AS priority
      |  FROM e)
      |SELECT doc_id, loc, canon, lastmod, priority
      |FROM x ORDER BY doc_id, loc""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val k = (d % 4 + 1).cast("int")
    val h = (d % 7).cast("string")
    val xml = concat(lit("<?xml version=\"1.0\"?><urlset>"),
      array_join(transform(sequence(lit(0), k - 1), j => {
        val g = d + j * 3
        val gs = g.cast("string")
        val v = g % 3
        val query = when(v === 2, lit("?a=1&amp;utm_source=z"))
          .otherwise(lit(""))
        val lastmod = when(v === 1,
          concat(lit("<lastmod>2026-01-0"), (g % 9 + 1).cast("string"),
            lit("</lastmod>"))).otherwise(lit(""))
        concat(lit("<url><loc>http://ex"), h, lit(".test/sm"), gs, query,
          lit("</loc>"), lastmod, lit("<priority>0."),
          (g % 10).cast("string"), lit("</priority></url>"))
      }), ""),
      lit("</urlset>"))
    t("documents").filter(d < 300)
      .select(d, xml.cast("binary").as("payload"))
      .select(d, explode(call_function("graft_sitemap_parse",
        col("payload"))).as("e"))
      .select(d, col("e.loc").as("loc"),
        call_function("graft_canon_url", col("e.loc")).as("canon"),
        col("e.lastmod").as("lastmod"),
        col("e.priority").as("priority"))
      .orderBy(d, col("loc"))
  }

  /** Multi-hop redirect resolution
    * ([[graft.operators.Crawl.resolveRedirectChains]], pointer
    * doubling): per document a chain of `doc_id % 4 + 1` hops to a
    * terminal, plus a 2-cycle on every ninth document. At `maxHops = 3`
    * the length-4 chains' heads and every cycle node must come back
    * LOUDLY unresolved (null final/hops, `resolved = false`) while all
    * shorter suffixes resolve with exact hop counts. The oracle replays
    * the whole verdict table as arithmetic on (L, j); any doubling,
    * hop-accounting, cycle, or cap bug breaks the hash. */
  val q230RedirectChains: (String, QueryDef) = q(
    "q230_redirect_chains",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 4 + 1 AS L
      |  FROM documents WHERE doc_id < 300),
      |c AS (
      |  SELECT doc_id, L,
      |    unnest(generate_series(0, CAST(L - 1 AS BIGINT))) AS j FROM p),
      |chain AS (
      |  SELECT 'http://c.test/d' || CAST(doc_id AS VARCHAR) || '/n' ||
      |      CAST(j AS VARCHAR) AS from_url,
      |    CASE WHEN L - j <= 3 THEN 'http://c.test/d' ||
      |      CAST(doc_id AS VARCHAR) || '/final' END AS final_url,
      |    CASE WHEN L - j <= 3 THEN CAST(L - j AS BIGINT) END AS hops,
      |    (L - j <= 3) AS resolved
      |  FROM c),
      |loops AS (
      |  SELECT 'http://c.test/d' || CAST(doc_id AS VARCHAR) || '/la'
      |      AS from_url,
      |    CAST(NULL AS VARCHAR) AS final_url, CAST(NULL AS BIGINT) AS hops,
      |    FALSE AS resolved
      |  FROM p WHERE doc_id % 9 = 0
      |  UNION ALL
      |  SELECT 'http://c.test/d' || CAST(doc_id AS VARCHAR) || '/lb',
      |    CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), FALSE
      |  FROM p WHERE doc_id % 9 = 0)
      |SELECT * FROM (SELECT * FROM chain UNION ALL SELECT * FROM loops)
      |ORDER BY from_url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    def base(c: Column): Column =
      concat(lit("http://c.test/d"), c.cast("string"))
    val chainEdges = t("documents").filter(d < 300)
      .select(d, explode(sequence(lit(0), (d % 4).cast("int"))).as("j"))
      .select(
        concat(base(d), lit("/n"), col("j").cast("string")).as("from_url"),
        when(col("j") === (d % 4), concat(base(d), lit("/final")))
          .otherwise(concat(base(d), lit("/n"),
            (col("j") + 1).cast("string"))).as("to_url"))
    val loopDocs = t("documents").filter(d < 300 && d % 9 === 0).select(d)
    val loops = loopDocs
      .select(concat(base(d), lit("/la")).as("from_url"),
        concat(base(d), lit("/lb")).as("to_url"))
      .unionAll(loopDocs
        .select(concat(base(d), lit("/lb")).as("from_url"),
          concat(base(d), lit("/la")).as("to_url")))
    graft.operators.Crawl
      .resolveRedirectChains(chainEdges.unionAll(loops), maxHops = 3)
      .orderBy(col("from_url"))
  }

  /** Recrawl scheduling ([[graft.operators.Crawl.recrawlSchedule]]):
    * q229's sitemap entries against an in-plan standing corpus whose
    * fetch dates anchor the freshness comparison. The three verdicts are
    * all load-bearing — `new` (odd g, absent from the corpus),
    * `refresh` (published lastmod strictly newer than the fetch date),
    * and `skip` (older/equal lastmod AND the null-lastmod case, which
    * must NOT read as stale). Oracle replays the verdict table as CASE
    * arithmetic on the shared generator. */
  val q231RecrawlSchedule: (String, QueryDef) = q(
    "q231_recrawl_schedule",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 4 + 1 AS k, doc_id % 7 AS h
      |  FROM documents WHERE doc_id < 300),
      |l AS (
      |  SELECT doc_id, h,
      |    unnest(generate_series(0, CAST(k - 1 AS BIGINT))) AS j FROM p),
      |e AS (
      |  SELECT doc_id, h, (doc_id + 3*j) AS g, (doc_id + 3*j) % 3 AS v
      |  FROM l),
      |x AS (
      |  SELECT doc_id,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/sm' ||
      |      CAST(g AS VARCHAR) AS url,
      |    CASE WHEN v = 1 THEN '2026-01-0' || CAST(g % 9 + 1 AS VARCHAR)
      |         ELSE CAST(NULL AS VARCHAR) END AS lastmod,
      |    g FROM e WHERE v <> 2),
      |y AS (
      |  SELECT doc_id, url, lastmod,
      |    CASE WHEN g % 2 = 1 THEN CAST(NULL AS VARCHAR)
      |         ELSE '2026-01-05' END AS last_crawled,
      |    CASE WHEN g % 2 = 1 THEN 'new'
      |         WHEN lastmod IS NOT NULL AND lastmod > '2026-01-05'
      |           THEN 'refresh'
      |         ELSE 'skip' END AS action
      |  FROM x)
      |SELECT doc_id, url, lastmod, last_crawled, action
      |FROM y ORDER BY doc_id, url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val k = (d % 4 + 1).cast("int")
    val h = (d % 7).cast("string")
    // q229's generator minus the query-carrying variant (v=2), so urls
    // are already canonical keys
    val entries = t("documents").filter(d < 300)
      .select(d, explode(sequence(lit(0), k - 1)).as("j"))
      .select(d, (d + col("j") * 3).as("g"))
      .filter(col("g") % 3 =!= 2)
      .select(d,
        concat(lit("http://ex"), h, lit(".test/sm"),
          col("g").cast("string")).as("url"),
        when(col("g") % 3 === 1,
          concat(lit("2026-01-0"), (col("g") % 9 + 1).cast("string")))
          .as("lastmod"),
        col("g"))
    // standing corpus: every even-g url, all fetched on 2026-01-05
    val corpus = t("documents").filter(d < 300)
      .select(d, explode(sequence(lit(0), k - 1)).as("j"))
      .select((d + col("j") * 3).as("g"), (d % 7).cast("string").as("hh"))
      .filter(col("g") % 3 =!= 2 && col("g") % 2 === 0)
      .select(concat(lit("http://ex"), col("hh"), lit(".test/sm"),
        col("g").cast("string")).as("url"),
        lit("2026-01-05").as("last_crawled"))
      .distinct()
    graft.operators.Crawl
      .recrawlSchedule(entries.drop("g"), broadcast(corpus))
      .select(d, col("url"), col("lastmod"), col("last_crawled"),
        col("action"))
      .orderBy(d, col("url"))
  }

  /** Sitemap-index recursion
    * ([[graft.operators.Crawl.expandSitemaps]]): per document a
    * two-level tree — a root `sitemapindex` whose child locs carry a
    * SHOUTED host + default port (the canon fold is what joins them to
    * the fetched set) plus one deliberately-unfetched child, and a
    * child `urlset` with `doc_id % 3 + 1` URLs. The expansion must
    * emit exactly the children's URLs at depth 2 (the missing child
    * contributes nothing, the index's own entries are not URLs).
    * Oracle replays (url, loc, priority, depth) arithmetically — the
    * child locs are already in canonical form, so `url` (the canon
    * key) equals `loc` (the publisher's raw string) row for row. */
  val q232SitemapTree: (String, QueryDef) = q(
    "q232_sitemap_tree",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 3 + 1 AS k, doc_id % 7 AS h
      |  FROM documents WHERE doc_id < 200),
      |l AS (
      |  SELECT doc_id, h,
      |    unnest(generate_series(0, CAST(k - 1 AS BIGINT))) AS j FROM p)
      |SELECT
      |  'http://ex' || CAST(h AS VARCHAR) || '.test/u' ||
      |    CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS url,
      |  'http://ex' || CAST(h AS VARCHAR) || '.test/u' ||
      |    CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS loc,
      |  CAST(NULL AS VARCHAR) AS lastmod,
      |  CAST(NULL AS VARCHAR) AS changefreq,
      |  CAST(j AS DOUBLE) / 10.0 AS priority,
      |  CAST(2 AS INT) AS depth
      |FROM l ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val k = (d % 3 + 1).cast("int")
    val h = (d % 7).cast("string")
    val ds = d.cast("string")
    val rootUrl = concat(lit("http://ex"), h, lit(".test/root"), ds,
      lit(".xml"))
    val childUrl = concat(lit("http://ex"), h, lit(".test/c"), ds,
      lit(".xml"))
    val indexXml = concat(lit("<sitemapindex><sitemap><loc>HTTP://EX"), h,
      lit(".TEST:80/c"), ds, lit(".xml</loc></sitemap>" +
        "<sitemap><loc>http://ex"), h, lit(".test/miss"), ds,
      lit(".xml</loc></sitemap></sitemapindex>"))
    val childXml = concat(lit("<urlset>"),
      array_join(transform(sequence(lit(0), k - 1), j =>
        concat(lit("<url><loc>http://ex"), h, lit(".test/u"), ds,
          lit("_"), j.cast("string"), lit("</loc><priority>0."),
          j.cast("string"), lit("</priority></url>"))), ""),
      lit("</urlset>"))
    val docs = t("documents").filter(d < 200)
    val fetched = docs
      .select(rootUrl.as("url"), indexXml.cast("binary").as("payload"))
      .unionAll(docs
        .select(childUrl.as("url"), childXml.cast("binary").as("payload")))
    val roots = docs.select(rootUrl.as("u"))
    graft.operators.Crawl.expandSitemaps(fetched, roots, maxDepth = 2)
      .orderBy(col("url"))
  }

  /** Per-URL polite fetch schedule
    * ([[graft.operators.Crawl.politeSchedule]]): q228's host delays at
    * URL granularity — a host-partitioned window ranks each host's
    * URLs deterministically and spaces them `Crawl-delay` apart (1 s
    * default where the delay is absent or invalid). The oracle replays
    * slot and offset with its own `ROW_NUMBER() OVER (PARTITION BY
    * host ORDER BY url)` — the one window both engines define
    * identically — and the same CASE delay table. */
  val q233PoliteSchedule: (String, QueryDef) = q(
    "q233_polite_schedule",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 4 + 1 AS k, doc_id % 7 AS host_id
      |  FROM documents WHERE doc_id < 300),
      |l AS (
      |  SELECT doc_id, host_id,
      |    unnest(generate_series(0, CAST(k - 1 AS BIGINT))) AS j FROM p),
      |u AS (
      |  SELECT host_id,
      |    'http://ex' || CAST(host_id AS VARCHAR) || '.test/u' ||
      |      CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS url
      |  FROM l),
      |d AS (
      |  SELECT host_id, url,
      |    CASE host_id WHEN 0 THEN CAST(NULL AS DOUBLE)
      |      WHEN 1 THEN 0.5 WHEN 2 THEN 2.0
      |      WHEN 3 THEN CAST(NULL AS DOUBLE)
      |      ELSE CAST(host_id AS DOUBLE) END AS crawl_delay,
      |    ROW_NUMBER() OVER (PARTITION BY host_id ORDER BY url) AS slot
      |  FROM u)
      |SELECT host_id, url, crawl_delay, CAST(slot AS INT) AS slot,
      |  CAST(slot - 1 AS DOUBLE) * COALESCE(crawl_delay, 1.0) AS offset_s
      |FROM d ORDER BY host_id, url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val k = (d % 4 + 1).cast("int")
    val urls = t("documents").filter(d < 300)
      .select(d, (d % 7).as("host_id"),
        explode(sequence(lit(0), k - 1)).as("j"))
      .select(col("host_id").as("host"),
        concat(lit("http://ex"), col("host_id").cast("string"),
          lit(".test/u"), d.cast("string"), lit("_"),
          col("j").cast("string")).as("url"))
    val h = col("host")
    val delayLine = when(h === 0, lit(""))
      .when(h === 1, lit("Crawl-delay: 0.5\n"))
      .when(h === 2, lit("Crawl-delay: 2\n"))
      .when(h === 3, lit("Crawl-delay: fast\n"))
      .otherwise(concat(lit("Crawl-delay: "), h.cast("string"), lit("\n")))
    val robotsDim = t("documents").filter(d < 7)
      .select((d % 7).as("host"))
      .select(h, concat(lit("User-agent: *\n"), delayLine,
        lit("Disallow: /private\n")).as("robots"))
    graft.operators.Crawl.politeSchedule(urls, robotsDim)
      .select(col("host").as("host_id"), col("url"), col("crawl_delay"),
        col("slot"), col("offset_s"))
      .orderBy(col("host_id"), col("url"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(q221CrawlAudit,
    q222RobotsWildcards, q223CrawlFrontier, q224CrawlAuditScale,
    q225FrontierScale, q226RedirectEdges, q227ResolvedOutlinks,
    q228PolitenessBudget, q229SitemapFrontier, q230RedirectChains,
    q231RecrawlSchedule, q232SitemapTree, q233PoliteSchedule)
}
