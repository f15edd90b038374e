package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Catalog entries: round-15 decade instruments for the ITERATIVE crawl
  * operators — the r14 verdict's watch items 2–3 made measurable. The
  * q234–q236 anchors (like q213–q233) cap their fixtures for oracle
  * tractability, which caps their scaling signal at zero; these three
  * are uncapped twins whose work grows with the corpus, so ScaleBench
  * can sweep them across ScaleGen decades and ScaleGate can gate the
  * exponents:
  *
  *  - q237: [[graft.operators.Crawl.resolveRedirectChains]] over a
  *    HUB-SKEWED redirect graph (every document's two moved URLs fan
  *    into one of 7 per-host hub chains — the pointer-doubling join's
  *    hot-key shape) plus planted 2-cycles;
  *  - q238: [[graft.operators.Crawl.expandSitemaps]] over depth-3 trees
  *    (index → index → urlset), one per document;
  *  - q239: [[graft.operators.Crawl.politeSchedule]] with ONE enormous
  *    host (~75% of all URLs — the single-task window skew the operator
  *    scaladoc documents) next to 50 median hosts.
  *
  * All three stay fully oracle-anchored at every sf (CASE arithmetic /
  * DuckDB's own ROW_NUMBER), so the decade instruments double as
  * correctness anchors, the q224/q225 convention.
  */
object Queries28 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Redirect-chain resolution at scale: per document TWO moved URLs
    * (`/r…`, `/q…`) fan into the document's host hub, whose fixed tail
    * (`hub → tail1 → tail2 → final`) makes every per-doc chain 4 hops —
    * so the `f∘f` equi-join's key distribution concentrates on 7 hub
    * keys with fan-in growing linearly in the corpus (the skew the
    * pointer-doubling docstring prices: plain key joins, AQE-plannable,
    * never a crossJoin). Every 9th document adds a 2-cycle, kept LOUDLY
    * unresolved. Oracle: closed-form CASE rows per from_url. */
  val q237RedirectChainScale: (String, QueryDef) = q(
    "q237_redirect_chain_scale",
    """WITH p AS (SELECT doc_id AS d, doc_id % 7 AS h FROM documents),
      |hs AS (SELECT doc_id % 7 AS h FROM documents WHERE doc_id < 7),
      |pref AS (
      |  SELECT 'http://ex' || CAST(h AS VARCHAR) || '.test/' AS base, d, h
      |  FROM p),
      |moved AS (
      |  SELECT base || 'r' || CAST(d AS VARCHAR) AS from_url,
      |    base || 'final' AS final_url, CAST(4 AS BIGINT) AS hops,
      |    TRUE AS resolved FROM pref
      |  UNION ALL
      |  SELECT base || 'q' || CAST(d AS VARCHAR), base || 'final',
      |    CAST(4 AS BIGINT), TRUE FROM pref),
      |fixed AS (
      |  SELECT 'http://ex' || CAST(h AS VARCHAR) || '.test/hub' AS from_url,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/final' AS final_url,
      |    CAST(3 AS BIGINT) AS hops, TRUE AS resolved FROM hs
      |  UNION ALL
      |  SELECT 'http://ex' || CAST(h AS VARCHAR) || '.test/tail1',
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/final',
      |    CAST(2 AS BIGINT), TRUE FROM hs
      |  UNION ALL
      |  SELECT 'http://ex' || CAST(h AS VARCHAR) || '.test/tail2',
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/final',
      |    CAST(1 AS BIGINT), TRUE FROM hs),
      |cyc AS (
      |  SELECT base || 'cyc' || CAST(d AS VARCHAR) AS from_url,
      |    CAST(NULL AS VARCHAR) AS final_url, CAST(NULL AS BIGINT) AS hops,
      |    FALSE AS resolved FROM pref WHERE d % 9 = 0
      |  UNION ALL
      |  SELECT base || 'cyc2' || CAST(d AS VARCHAR), CAST(NULL AS VARCHAR),
      |    CAST(NULL AS BIGINT), FALSE FROM pref WHERE d % 9 = 0)
      |SELECT * FROM (
      |  SELECT * FROM moved UNION ALL SELECT * FROM fixed
      |  UNION ALL SELECT * FROM cyc)
      |ORDER BY from_url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    val base = concat(lit("http://ex"), h, lit(".test/"))
    def u(p: String, suffix: Column = lit("")): Column =
      concat(base, lit(p), suffix)
    val docs = t("documents").select(d)
    val hosts = t("documents").filter(d < 7).select(d)
    val edges = docs.select(u("r", ds).as("from_url"), u("hub").as("to_url"))
      .unionAll(docs.select(u("q", ds).as("from_url"), u("hub").as("to_url")))
      .unionAll(hosts.select(u("hub").as("from_url"),
        u("tail1").as("to_url")))
      .unionAll(hosts.select(u("tail1").as("from_url"),
        u("tail2").as("to_url")))
      .unionAll(hosts.select(u("tail2").as("from_url"),
        u("final").as("to_url")))
      .unionAll(docs.filter(d % 9 === 0)
        .select(u("cyc", ds).as("from_url"), u("cyc2", ds).as("to_url")))
      .unionAll(docs.filter(d % 9 === 0)
        .select(u("cyc2", ds).as("from_url"), u("cyc", ds).as("to_url")))
    graft.operators.Crawl.resolveRedirectChains(edges, maxHops = 8)
      .orderBy(col("from_url"))
  }

  /** Sitemap-tree expansion at scale: a depth-3 tree PER DOCUMENT
    * (root `sitemapindex` → mid index → leaf `urlset` with
    * `doc_id % 3 + 1` URLs carrying lastmod) — the fetched set, the
    * per-level broadcast frontier, and the parsed output all grow
    * linearly with the corpus while depth stays protocol-bounded.
    * Oracle: arithmetic replay of the leaf URLs at depth 3. */
  val q238SitemapScale: (String, QueryDef) = q(
    "q238_sitemap_scale",
    """WITH p AS (
      |  SELECT doc_id AS d, doc_id % 7 AS h, doc_id % 3 + 1 AS k
      |  FROM documents),
      |l AS (
      |  SELECT d, h,
      |    unnest(generate_series(0, CAST(k - 1 AS BIGINT))) AS j FROM p)
      |SELECT
      |  'http://ex' || CAST(h AS VARCHAR) || '.test/u' ||
      |    CAST(d AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS url,
      |  'http://ex' || CAST(h AS VARCHAR) || '.test/u' ||
      |    CAST(d AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS loc,
      |  '2026-01-0' || CAST(j + 1 AS VARCHAR) AS lastmod,
      |  CAST(NULL AS VARCHAR) AS changefreq,
      |  CAST(NULL AS DOUBLE) AS priority,
      |  CAST(3 AS INT) AS depth
      |FROM l ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    val k = (d % 3 + 1).cast("int")
    def u(p: String): Column =
      concat(lit("http://ex"), h, lit(s".test/$p"), ds, lit(".xml"))
    val leafXml = concat(lit("<urlset>"),
      array_join(transform(sequence(lit(0), k - 1), j =>
        concat(lit("<url><loc>http://ex"), h, lit(".test/u"), ds,
          lit("_"), j.cast("string"), lit("</loc><lastmod>2026-01-0"),
          (j + 1).cast("string"), lit("</lastmod></url>"))), ""),
      lit("</urlset>"))
    val idx = (child: Column) => concat(
      lit("<sitemapindex><sitemap><loc>"), child,
      lit("</loc></sitemap></sitemapindex>"))
    val docs = t("documents").select(d)
    val fetched = docs
      .select(u("ri").as("url"), idx(u("mi")).cast("binary").as("payload"))
      .unionAll(docs.select(u("mi").as("url"),
        idx(u("ls")).cast("binary").as("payload")))
      .unionAll(docs.select(u("ls").as("url"),
        leafXml.cast("binary").as("payload")))
    val roots = docs.select(u("ri").as("u"))
    graft.operators.Crawl.expandSitemaps(fetched, roots, maxDepth = 3)
      .orderBy(col("url"))
  }

  /** Polite scheduling under ONE-HOST SKEW — the operator's documented
    * worst case, SHARPENED (r16): 90% of all URLs land on `big.test`,
    * the rest spread over 50 median hosts, and the explicit
    * `deskewHostUrls` threshold (256 — under big.test's count at every
    * tested sf, over every tail host's) routes the mega host through
    * the two-pass range-partition + offset rank while the tail stays on
    * the per-host window — BOTH plan shapes are load-bearing in one
    * oracle. The decade exponent prices the de-skewed rank (one sorted
    * task per host was the r15 structural watch item); the oracle
    * replays slots with its own ROW_NUMBER, blind to the plan split. */
  val q239PoliteSkewScale: (String, QueryDef) = q(
    "q239_polite_skew_scale",
    """WITH p AS (SELECT doc_id AS d FROM documents),
      |u AS (
      |  SELECT d,
      |    CASE WHEN d % 10 < 9 THEN 'big.test'
      |         ELSE 'ex' || CAST((d // 10) % 50 AS VARCHAR) || '.test'
      |    END AS host FROM p),
      |r AS (
      |  SELECT host, 'http://' || host || '/u' || CAST(d AS VARCHAR) AS url,
      |    CASE WHEN host = 'big.test' THEN 2.0
      |         ELSE CAST(NULL AS DOUBLE) END AS crawl_delay
      |  FROM u),
      |w AS (
      |  SELECT host, url, crawl_delay,
      |    ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) AS slot
      |  FROM r)
      |SELECT host, url, crawl_delay, CAST(slot AS INT) AS slot,
      |  CAST(slot - 1 AS DOUBLE) * COALESCE(crawl_delay, 1.0) AS offset_s
      |FROM w ORDER BY host, url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val host = when(d % 10 < 9, lit("big.test"))
      .otherwise(concat(lit("ex"), (floor(d / 10) % 50).cast("string"),
        lit(".test")))
    val urls = t("documents")
      .select(host.as("host"),
        concat(lit("http://"), host, lit("/u"), ds).as("url"))
    // 51 hosts: big.test publishes Crawl-delay 2, the rest nothing (the
    // 1 s default)
    val robotsDim = t("documents").filter(d < 51).select(
      when(d === 50L, lit("big.test"))
        .otherwise(concat(lit("ex"), ds, lit(".test"))).as("host"),
      when(d === 50L,
        lit("User-agent: *\nCrawl-delay: 2\nDisallow: /zz\n"))
        .otherwise(lit("User-agent: *\nDisallow: /zz\n")).as("robots"))
    graft.operators.Crawl.politeSchedule(urls, robotsDim,
        deskewHostUrls = 256L)
      .select(col("host"), col("url"), col("crawl_delay"), col("slot"),
        col("offset_s"))
      .orderBy(col("host"), col("url"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(q237RedirectChainScale,
    q238SitemapScale, q239PoliteSkewScale)
}
