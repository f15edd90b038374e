package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Catalog entries: round-15 additions — the two-generation incremental
  * crawl round trip (q234: every crawl-tier operator composed in its
  * production order, TWICE), the redirect-aware frontier (q235:
  * [[graft.operators.Crawl.frontierResolved]] — a moved page whose
  * target is already crawled must NOT re-enter as new), and HTTP
  * freshness scheduling (q236:
  * [[graft.operators.Crawl.recrawlScheduleHttp]] — the server's
  * `Last-Modified`/`ETag` validators vs the sitemap's claim). Fixture
  * convention unchanged from q213–q233: archives, pages, and dims are
  * synthesized IN-PLAN from `doc_id` arithmetic, and the DuckDB oracle
  * replays the EXPECTED VALUES as pure CASE/COUNT arithmetic — it never
  * parses WARC, HTML, robots.txt, or IMF-fixdate, so any kernel,
  * funnel, or precedence bug breaks the hash.
  */
object Queries27 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** One synthesized WARC `response` record (ASCII bodies only, so char
    * length == byte length and `Content-Length` is exact). Shared with
    * Queries29 — the framing must never drift between query tiers. */
  private[graft] def resp(uri: Column, http: Column): Column =
    concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <"),
      uri, lit(">\r\nContent-Type: application/http; msgtype=response" +
        "\r\nContent-Length: "), length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))

  private[graft] def http200(html: Column): Column =
    concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html)

  private val http404: Column =
    lit("HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n<p>gone</p>")

  /** The link-farm page q221 plants for the boilerplate gate (density
    * 1.0, text past the size gate). */
  private val farmHtml: Column =
    lit("<div>" + ("<a href=\"/u\">w</a> " * 6) + "</div>")

  /** The incremental crawl, TWICE AROUND — the production shape every
    * crawl-tier piece exists for, composed in ONE plan:
    *
    * corpus₀ → [[graft.operators.Crawl.frontier]] (outlinks → RFC 3986
    * resolve → canon → robots gate → anti-join) →
    * [[graft.operators.Crawl.politeSchedule]] (host windows, 1 s default
    * delay) → synthesized fetch (one WARC archive per scheduled URL;
    * every 5th fetch 404s) → [[graft.operators.Crawl.cleanCorpus]] +
    * [[graft.operators.Crawl.auditCorpus]] (SAME funnel, counted) →
    * corpus₁ → [[graft.operators.Crawl.recrawlSchedule]] (sitemap
    * lastmod vs corpus₁) → frontier AGAIN over the generation-1 pages
    * (links to /c…) → second fetch (every 3rd page a link farm) →
    * second audit.
    *
    * Output: six tagged sections in one frame —
    * `(section, key, tag, a, b, c, x)` —
    *
    *  - `frontier1`/`frontier2`: key=url, a=n_refs;
    *  - `sched1`: key=url, a=slot, x=offset_s;
    *  - `audit1`/`audit2`: key=host, a=records, b=the generation's
    *    planted loss (gen 1: gated_status, gen 2: dropped_boilerplate),
    *    c=kept — conservation a = b + c is per-row hash-pinned;
    *  - `recrawl1`: key=url, tag=action (new/refresh/skip).
    *
    * The oracle replays every section as COUNT/CASE arithmetic (the
    * schedule window as DuckDB's own ROW_NUMBER over identical strings).
    * Generation-2 rows are CASE-replayable only if generation 1
    * produced exactly the right corpus — the round trip is the test. */
  val q234CrawlRoundtrip: (String, QueryDef) = q(
    "q234_crawl_roundtrip",
    """WITH p AS (
      |  SELECT doc_id AS d, doc_id % 7 AS h
      |  FROM documents WHERE doc_id < 200),
      |u AS (
      |  SELECT d, h,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/a' ||
      |      CAST(d AS VARCHAR) AS ua,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/c' ||
      |      CAST(d AS VARCHAR) AS uc,
      |    'ex' || CAST(h AS VARCHAR) || '.test' AS host
      |  FROM p),
      |f1 AS (
      |  SELECT 'frontier1' AS section, ua AS key,
      |    CAST(NULL AS VARCHAR) AS tag, CAST(1 AS BIGINT) AS a,
      |    CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS c,
      |    CAST(NULL AS DOUBLE) AS x
      |  FROM u),
      |s1 AS (
      |  SELECT 'sched1' AS section, ua AS key, CAST(NULL AS VARCHAR) AS tag,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY h ORDER BY ua) AS BIGINT)
      |      AS a,
      |    CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS c,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY h ORDER BY ua) - 1
      |      AS DOUBLE) AS x
      |  FROM u),
      |a1 AS (
      |  SELECT 'audit1' AS section, host AS key, CAST(NULL AS VARCHAR) AS tag,
      |    CAST(COUNT(*) AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN d % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN d % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS c,
      |    CAST(NULL AS DOUBLE) AS x
      |  FROM u GROUP BY host),
      |r1 AS (
      |  SELECT 'recrawl1' AS section, ua AS key,
      |    CASE WHEN d % 5 = 0 THEN 'new'
      |         WHEN d % 2 = 0 THEN 'refresh' ELSE 'skip' END AS tag,
      |    CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b,
      |    CAST(NULL AS BIGINT) AS c, CAST(NULL AS DOUBLE) AS x
      |  FROM u),
      |f2 AS (
      |  SELECT 'frontier2' AS section, uc AS key,
      |    CAST(NULL AS VARCHAR) AS tag, CAST(1 AS BIGINT) AS a,
      |    CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS c,
      |    CAST(NULL AS DOUBLE) AS x
      |  FROM u WHERE d % 5 <> 0),
      |a2 AS (
      |  SELECT 'audit2' AS section, host AS key, CAST(NULL AS VARCHAR) AS tag,
      |    CAST(COUNT(*) AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN d % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN d % 3 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS c,
      |    CAST(NULL AS DOUBLE) AS x
      |  FROM u WHERE d % 5 <> 0 GROUP BY host)
      |SELECT * FROM (
      |  SELECT * FROM f1 UNION ALL SELECT * FROM s1
      |  UNION ALL SELECT * FROM a1 UNION ALL SELECT * FROM r1
      |  UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM a2)
      |ORDER BY section, key""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    def url(p: String): Column =
      concat(lit("http://ex"), h, lit(s".test/$p"), ds)
    val host = concat(lit("ex"), h, lit(".test"))
    val docs = t("documents").filter(d < 200).select(d)

    // ---- generation 0: seeds, robots, standing corpus --------------
    val seedHtml = concat(
      lit("<html><body><a href=\"/a"), ds, lit("\">x</a> <a href=\"/b"),
      ds, lit("\">y</a> <a href=\"/priv"), ds,
      lit("\">z</a></body></html>"))
    val seeds = docs.select(url("seed").as("url"), seedHtml.as("page"))
    val robotsDim = t("documents").filter(d < 7).select(
      concat(lit("ex"), ds, lit(".test")).as("host"),
      lit("User-agent: *\nDisallow: /priv\n").as("robots"))
    val corpus0 = docs.select(url("seed").as("url"))
      .unionAll(docs.select(url("b").as("url")))

    // ---- generation 1: frontier -> schedule -> fetch -> clean/audit
    val frontier1 = graft.operators.Crawl
      .frontier(seeds, "url", "page", robotsDim, corpus0)
    val sched1 = graft.operators.Crawl.politeSchedule(
      frontier1.withColumn("host", expr("parse_url(url, 'HOST')")),
      robotsDim)
    val artHtml = concat(
      lit("<html><body><p>crawl article words for density pad"), ds,
      lit("</p><a href=\"/c"), ds, lit("\">n</a></body></html>"))
    val fetched1 = docs.select(d, host.as("host"),
      resp(url("a"), when(d % 5 === 0, http404)
        .otherwise(http200(artHtml))).cast("binary").as("payload"))
    val audit1 = graft.operators.Crawl.auditCorpus(
      fetched1.select(col("host"), col("payload")),
      minTextBytes = 5L, by = Seq("host"))
    val clean1 = graft.operators.Crawl.cleanCorpus(
      fetched1.drop("host"), minTextBytes = 5L)
    val corpus1 = corpus0.unionAll(clean1.select(col("url")))

    // ---- recrawl decision from the next sitemap publish ------------
    val entries = docs.select(url("a").as("url"),
      when(d % 2 === 0, lit("2026-03-01"))
        .otherwise(lit("2026-01-01")).as("lastmod"))
    val recrawl1 = graft.operators.Crawl.recrawlSchedule(entries,
      corpus1.withColumn("last_crawled", lit("2026-02-01")))

    // ---- generation 2: pages from the gen-1 fetch, frontier again --
    val pages2 = graft.operators.Multimodal.warcRecords(
        fetched1.drop("host"), "payload")
      .filter(col("warc_rec.status") === 200)
      .select(call_function("graft_canon_url", col("warc_rec.uri"))
        .as("url"), col("warc_rec.body").cast("string").as("page"))
    val frontier2 = graft.operators.Crawl
      .frontier(pages2, "url", "page", robotsDim, corpus1)
    val fetched2 = docs.filter(d % 5 =!= 0).select(host.as("host"),
      resp(url("c"), http200(when(d % 3 === 0, farmHtml)
        .otherwise(artHtml))).cast("binary").as("payload"))
    val audit2 = graft.operators.Crawl.auditCorpus(fetched2,
      minTextBytes = 5L, by = Seq("host"))

    // ---- six sections, one frame ------------------------------------
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("long")
    val nullD = lit(null).cast("double")
    def sec(name: String, in: DataFrame, key: Column, tag: Column,
        a: Column, b: Column, c: Column, x: Column): DataFrame =
      in.select(lit(name).as("section"), key.cast("string").as("key"),
        tag.cast("string").as("tag"), a.cast("long").as("a"),
        b.cast("long").as("b"), c.cast("long").as("c"),
        x.cast("double").as("x"))
    sec("frontier1", frontier1, col("url"), nullS, col("n_refs"),
        nullL, nullL, nullD)
      .unionAll(sec("sched1", sched1, col("url"), nullS, col("slot"),
        nullL, nullL, col("offset_s")))
      .unionAll(sec("audit1", audit1, col("host"), nullS, col("records"),
        col("gated_status"), col("kept"), nullD))
      .unionAll(sec("recrawl1", recrawl1, col("url"), col("action"),
        nullL, nullL, nullL, nullD))
      .unionAll(sec("frontier2", frontier2, col("url"), nullS,
        col("n_refs"), nullL, nullL, nullD))
      .unionAll(sec("audit2", audit2, col("host"), nullS, col("records"),
        col("dropped_boilerplate"), col("kept"), nullD))
      .orderBy(col("section"), col("key"))
  }

  /** Redirect-aware frontier ([[graft.operators.Crawl.frontierResolved]]):
    * every page links to a MOVED url (`/m…`) and a fresh one (`/n…`);
    * the redirect graph sends `/m…` to `/t…` — directly for most docs,
    * through a 2-hop chain (`/m… → /mid… → /t…`, exercising pointer
    * doubling mid-plan) for every 4th — and `/t…` is ALREADY CRAWLED for
    * even docs. The moved link must vanish for even docs (its final
    * location is in the corpus — plain frontier() would re-enter it as
    * new, the q235 seam) and surface AS `/t…` for odd docs. Oracle:
    * pure arithmetic — `/n…` for every doc, `/t…` for odd docs. */
  val q235FrontierMoved: (String, QueryDef) = q(
    "q235_frontier_moved",
    """WITH p AS (
      |  SELECT doc_id AS d, doc_id % 7 AS h
      |  FROM documents WHERE doc_id < 300),
      |n AS (
      |  SELECT 'http://ex' || CAST(h AS VARCHAR) || '.test/n' ||
      |    CAST(d AS VARCHAR) AS url, 1 AS n_refs FROM p),
      |tt AS (
      |  SELECT 'http://ex' || CAST(h AS VARCHAR) || '.test/t' ||
      |    CAST(d AS VARCHAR) AS url, 1 AS n_refs FROM p WHERE d % 2 = 1)
      |SELECT url, CAST(n_refs AS BIGINT) AS n_refs
      |FROM (SELECT * FROM n UNION ALL SELECT * FROM tt)
      |ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    def url(p: String): Column =
      concat(lit("http://ex"), h, lit(s".test/$p"), ds)
    val docs = t("documents").filter(d < 300).select(d)
    val pages = docs.select(url("s").as("url"),
      concat(lit("<a href=\"/m"), ds, lit("\">m</a> <a href=\"/n"), ds,
        lit("\">n</a>")).as("page"))
    val robotsDim = t("documents").filter(d < 7).select(
      concat(lit("ex"), ds, lit(".test")).as("host"),
      lit("User-agent: *\nDisallow: /zz\n").as("robots"))
    // the redirect graph: 1 hop normally, 2 hops for every 4th doc
    val edges = docs.select(url("m").as("from_url"),
        when(d % 4 === 0, url("mid")).otherwise(url("t")).as("to_url"))
      .unionAll(docs.filter(d % 4 === 0)
        .select(url("mid").as("from_url"), url("t").as("to_url")))
    val redirects = graft.operators.Crawl.resolveRedirectChains(edges)
    val corpus = docs.select(url("s").as("url"))
      .unionAll(docs.filter(d % 2 === 0).select(url("t").as("url")))
    graft.operators.Crawl
      .frontierResolved(pages, "url", "page", robotsDim, corpus, redirects)
      .orderBy(col("url"))
  }

  /** HTTP freshness scheduling
    * ([[graft.operators.Crawl.recrawlScheduleHttp]]): conflicting
    * sitemap/HTTP signals per doc — the sitemap claims Feb (or Jan, or
    * nothing), the copy was crawled Jan 15, and every 3rd doc's server
    * stamped the stored copy `Last-Modified: Mar 4` (NEWER than any
    * sitemap claim → the server's statement about the content beats the
    * crawl time: skip, where crawl time alone would have said refresh).
    * Every 2nd doc carries an ETag (If-None-Match beats
    * If-Modified-Since as the validator, RFC 9110 §13.1.2); every 5th
    * doc is not in the corpus at all (new). The oracle replays the
    * whole precedence as ONE CASE table — it never parses IMF-fixdate,
    * so a timestamp-comparison bug (e.g. the lexicographic trap: 'Mar'
    * < 'Feb' as strings) breaks the hash. */
  val q236RecrawlHttp: (String, QueryDef) = q(
    "q236_recrawl_http",
    """WITH p AS (
      |  SELECT doc_id AS d, doc_id % 7 AS h
      |  FROM documents WHERE doc_id < 400),
      |u AS (
      |  SELECT d,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/p' ||
      |      CAST(d AS VARCHAR) AS url,
      |    CASE WHEN d % 4 = 3 THEN CAST(NULL AS VARCHAR)
      |         WHEN d % 4 = 2 THEN '2026-01-01'
      |         ELSE '2026-02-01' END AS lastmod
      |  FROM p)
      |SELECT url, lastmod,
      |  CASE WHEN d % 5 = 0 THEN 'new'
      |       WHEN lastmod IS NULL THEN 'skip'
      |       WHEN d % 3 = 0 THEN 'skip'
      |       WHEN lastmod = '2026-02-01' THEN 'refresh'
      |       ELSE 'skip' END AS action,
      |  CASE WHEN d % 5 = 0 THEN 'none'
      |       WHEN d % 2 = 0 THEN 'etag'
      |       WHEN d % 3 = 0 THEN 'last_modified'
      |       ELSE 'none' END AS validator
      |FROM u ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    val url = concat(lit("http://ex"), h, lit(".test/p"), ds)
    val docs = t("documents").filter(d < 400).select(d)
    val entries = docs.select(d, url.as("url"),
      when(d % 4 === 3, lit(null).cast("string"))
        .when(d % 4 === 2, lit("2026-01-01"))
        .otherwise(lit("2026-02-01")).as("lastmod"))
    val corpus = docs.filter(d % 5 =!= 0).select(url.as("url"),
      lit("2026-01-15T00:00:00").as("last_crawled"),
      when(d % 3 === 0, lit("Wed, 04 Mar 2026 08:00:00 GMT"))
        .otherwise(lit(null).cast("string")).as("last_modified"),
      when(d % 2 === 0, concat(lit("\"e"), ds, lit("\"")))
        .otherwise(lit(null).cast("string")).as("etag"))
    graft.operators.Crawl.recrawlScheduleHttp(entries, corpus)
      .select(col("url"), col("lastmod"), col("action"), col("validator"))
      .orderBy(col("url"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(q234CrawlRoundtrip,
    q235FrontierMoved, q236RecrawlHttp)
}
