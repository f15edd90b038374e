package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Catalog entries: round-15 (late) — the generation merge
  * ([[graft.operators.Crawl.mergeGeneration]]), the incremental crawl's
  * actual state transition `corpus₁ = merge(corpus₀, fetched, t₁)` with
  * RFC 9110 revalidation semantics. q234 composed the tier with a plain
  * union; this anchor makes every verdict row load-bearing. */
object Queries29 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** One synthesized WARC `response` — Queries27's shared builder. */
  private def resp(uri: Column, http: Column): Column =
    Queries27.resp(uri, http)

  /** Generation merge ([[graft.operators.Crawl.mergeGeneration]]): per
    * doc the standing corpus holds `/p…` (old text, generation-0 crawl
    * stamp, ETag on every 2nd doc), and the generation-1 fetch cycles
    * all six verdicts by `doc_id % 6` —
    *
    *  0. `200` kept → UPSERT: new text, new ETag, new crawl stamp;
    *  1. `200` but sub-threshold → REMOVE (the page rotted);
    *  2. `304` → TOUCH: old text + old ETag verbatim, new crawl stamp;
    *  3. `404` → REMOVE;
    *  4. `301` → REMOVE under the old key (the frontier re-keys moves);
    *  5. `503` → RETAIN verbatim (a hiccup never deletes corpus);
    *
    * plus a brand-new `/n…` page (every 4th doc) that must INSERT. The
    * oracle replays the surviving corpus — every column, text and
    * validators included — as pure CASE arithmetic. */
  val q240MergeGeneration: (String, QueryDef) = q(
    "q240_merge_generation",
    """WITH p AS (
      |  SELECT doc_id AS d, doc_id % 7 AS h, doc_id % 6 AS v
      |  FROM documents WHERE doc_id < 300),
      |base AS (
      |  SELECT d, h, v,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/p' ||
      |      CAST(d AS VARCHAR) AS url,
      |    'old words for page ' || CAST(d AS VARCHAR) ||
      |      ' keep density fine' AS old_text,
      |    'new words for page ' || CAST(d AS VARCHAR) ||
      |      ' fresh content here' AS new_text,
      |    CASE WHEN d % 2 = 0 THEN '"g0-' || CAST(d AS VARCHAR) || '"'
      |         ELSE CAST(NULL AS VARCHAR) END AS old_etag
      |  FROM p),
      |survivors AS (
      |  SELECT url,
      |    CASE WHEN v = 0 THEN new_text ELSE old_text END AS text,
      |    CASE WHEN v = 0 THEN '"g1-' || CAST(d AS VARCHAR) || '"'
      |         ELSE old_etag END AS etag,
      |    CASE WHEN v IN (0, 2) THEN '2026-02-01T00:00:00'
      |         ELSE '2026-01-15T00:00:00' END AS last_crawled
      |  FROM base WHERE v IN (0, 2, 5)),
      |inserts AS (
      |  SELECT 'http://ex' || CAST(h AS VARCHAR) || '.test/n' ||
      |      CAST(d AS VARCHAR) AS url,
      |    new_text AS text, '"g1-' || CAST(d AS VARCHAR) || '"' AS etag,
      |    '2026-02-01T00:00:00' AS last_crawled
      |  FROM base WHERE d % 4 = 0)
      |SELECT url, text, CAST(length(text) AS BIGINT) AS text_bytes,
      |  etag, last_crawled
      |FROM (SELECT * FROM survivors UNION ALL SELECT * FROM inserts)
      |ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    val v = d % 6
    def u(p: String): Column =
      concat(lit("http://ex"), h, lit(s".test/$p"), ds)
    val oldText = concat(lit("old words for page "), ds,
      lit(" keep density fine"))
    val newText = concat(lit("new words for page "), ds,
      lit(" fresh content here"))
    val docs = t("documents").filter(d < 300).select(d)
    val corpus0 = docs.select(u("p").as("url"), lit(200).as("status"),
      lit("text/html").as("mime"), lit("ascii").as("charset"),
      oldText.as("text"), length(oldText).cast("long").as("text_bytes"),
      lit(0.0).as("link_density"), lit(0L).as("n_links"),
      lit(null).cast("string").as("last_modified"),
      when(d % 2 === 0, concat(lit("\"g0-"), ds, lit("\"")))
        .otherwise(lit(null).cast("string")).as("etag"),
      lit("2026-01-15T00:00:00").as("last_crawled"))
    def http200(html: Column, etag: Column): Column = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nETag: "),
      etag, lit("\r\n\r\n"), html)
    val page = (txt: Column) => concat(lit("<html><body><p>"), txt,
      lit("</p></body></html>"))
    val g1Etag = concat(lit("\"g1-"), ds, lit("\""))
    val fetchedHttp =
      when(v === 0, http200(page(newText), g1Etag))
        .when(v === 1, http200(lit("<p>x</p>"), g1Etag))
        .when(v === 2, concat(lit("HTTP/1.1 304 Not Modified\r\nETag: "),
          g1Etag, lit("\r\n\r\n")))
        .when(v === 3, lit("HTTP/1.1 404 NF\r\nContent-Type: " +
          "text/html\r\n\r\n<p>gone</p>"))
        .when(v === 4, concat(lit("HTTP/1.1 301 Moved\r\nLocation: /m"),
          ds, lit("\r\n\r\n")))
        .otherwise(lit("HTTP/1.1 503 Unavailable\r\n\r\n<p>later</p>"))
    val fetched = docs
      .select(resp(u("p"), fetchedHttp).cast("binary").as("payload"))
      .unionAll(docs.filter(d % 4 === 0)
        .select(resp(u("n"), http200(page(newText), g1Etag))
          .cast("binary").as("payload")))
    graft.operators.Crawl.mergeGeneration(corpus0, fetched,
        fetchTime = "2026-02-01T00:00:00", minTextBytes = 10L)
      .select(col("url"), col("text"), col("text_bytes"), col("etag"),
        col("last_crawled"))
      .orderBy(col("url"))
  }

  /** CDXJ index ingestion + SURT keys ([[graft.expressions.CdxKernel]],
    * `graft_cdxj_parse` / `graft_surt`): per doc an index line is built
    * IN-PLAN (JSON escapes included: the url carries a `\"` and a `\/`),
    * every 11th line corrupted (loud NULL, filtered like the production
    * shape), the parsed fields selected, and a SURT key computed from a
    * NOISY respelling of the same URL (shouted case, explicit :80,
    * leading www., unsorted query) — which must equal the line's urlkey,
    * so both the parser and the SURT fold are hash-load-bearing. Oracle:
    * pure string/CASE arithmetic, no JSON or URL parsing. */
  val q241CdxIndex: (String, QueryDef) = q(
    "q241_cdx_index",
    """WITH p AS (
      |  SELECT doc_id AS d, doc_id % 7 AS h, doc_id % 3 AS m,
      |    doc_id % 4 AS s
      |  FROM documents WHERE doc_id < 300 AND doc_id % 11 <> 0)
      |SELECT
      |  'org,ex' || CAST(h AS VARCHAR) || ')/p' || CAST(d AS VARCHAR) ||
      |    '?a=1&b=2' AS urlkey,
      |  '2026010100000' || CAST(d % 10 AS VARCHAR) AS ts,
      |  'http://ex' || CAST(h AS VARCHAR) || '.org/p' ||
      |    CAST(d AS VARCHAR) || '?a="1"&b=/2' AS url,
      |  CASE m WHEN 0 THEN 'text/html' WHEN 1 THEN 'image/png'
      |    ELSE 'text/plain' END AS mime,
      |  CAST(CASE WHEN s = 1 THEN 404 ELSE 200 END AS INT) AS status,
      |  CAST(d * 7 % 1000 + 50 AS BIGINT) AS length,
      |  CAST(d * 200 AS BIGINT) AS "offset",
      |  'w' || CAST(d % 5 AS VARCHAR) || '.warc.gz' AS filename,
      |  'org,ex' || CAST(h AS VARCHAR) || ')/p' || CAST(d AS VARCHAR) ||
      |    '?a=1&b=2' AS surt_of_noisy
      |FROM p ORDER BY urlkey""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    val mime = when(d % 3 === 0, lit("text/html"))
      .when(d % 3 === 1, lit("image/png")).otherwise(lit("text/plain"))
    val status = when(d % 4 === 1, lit("404")).otherwise(lit("200"))
    val urlkey = concat(lit("org,ex"), h, lit(")/p"), ds, lit("?a=1&b=2"))
    // the JSON url value carries characters that MUST travel escaped
    val jsonUrl = concat(lit("http://ex"), h, lit(".org/p"), ds,
      lit("?a=\\\"1\\\"&b=\\/2"))
    val line = concat(urlkey, lit(" 2026010100000"), (d % 10).cast("string"),
      lit(" {\"url\": \""), jsonUrl,
      lit("\", \"mime\": \""), mime,
      lit("\", \"status\": \""), status,
      lit("\", \"length\": \""), (d * 7 % 1000 + 50).cast("string"),
      lit("\", \"offset\": \""), (d * 200).cast("string"),
      lit("\", \"filename\": \"w"), (d % 5).cast("string"),
      lit(".warc.gz\"}"))
    val corrupted = when(d % 11 === 0, lit("NOT A CDX LINE"))
      .otherwise(line)
    // a NOISY respelling of the captured URL: SURT must fold it back
    // onto the index's own urlkey
    val noisy = concat(lit("HTTP://WWW.EX"), h, lit(".ORG:80/P"), ds,
      lit("?b=2&a=1#frag"))
    t("documents").filter(d < 300)
      .select(corrupted.as("line"), noisy.as("noisy"))
      .select(call_function("graft_cdxj_parse", col("line")).as("r"),
        col("noisy"))
      .filter(col("r").isNotNull)
      .select(col("r.urlkey"), col("r.ts"), col("r.url"), col("r.mime"),
        col("r.status"), col("r.length"), col("r.offset"),
        col("r.filename"),
        call_function("graft_surt", col("noisy")).as("surt_of_noisy"))
      .orderBy(col("urlkey"))
  }

  /** Coalesced range-fetch planning ([[graft.operators.Crawl.fetchPlan]])
    * over an arithmetic index: records land in `doc_id % 5` files at
    * offset `(doc_id div 5) * 200` with length `100 + (doc_id % 3) * 40`,
    * so inter-record gaps cycle 100/60/20 and a 50-byte gap cap merges
    * exactly the records following a `% 3 == 2` predecessor. The oracle
    * implements the SAME documented coalescing algorithm independently
    * with DuckDB's own windows (the q233 convention: a window both
    * engines define identically). */
  val q242FetchPlan: (String, QueryDef) = q(
    "q242_fetch_plan",
    """WITH p AS (
      |  SELECT doc_id AS d,
      |    'w' || CAST(doc_id % 5 AS VARCHAR) || '.warc.gz' AS filename,
      |    CAST((doc_id // 5) * 200 AS BIGINT) AS off,
      |    CAST(100 + (doc_id % 3) * 40 AS BIGINT) AS len
      |  FROM documents WHERE doc_id < 300),
      |w AS (
      |  SELECT *,
      |    MAX(off + len) OVER (PARTITION BY filename ORDER BY off, len
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM p),
      |b AS (
      |  SELECT *, CASE WHEN prev_end IS NULL OR off > prev_end + 50
      |    THEN 1 ELSE 0 END AS brk FROM w),
      |g AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY filename ORDER BY off, len
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM b)
      |SELECT filename, MIN(off) AS start, MAX(off + len) AS "end",
      |  CAST(COUNT(*) AS BIGINT) AS n_records,
      |  CAST(SUM(len) AS BIGINT) AS payload_bytes,
      |  MAX(off + len) - MIN(off) - CAST(SUM(len) AS BIGINT) AS gap_bytes
      |FROM g GROUP BY filename, grp
      |ORDER BY filename, start""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val idx = t("documents").filter(d < 300).select(
      concat(lit("w"), (d % 5).cast("string"), lit(".warc.gz"))
        .as("filename"),
      (floor(d / 5) * 200).cast("long").as("offset"),
      (lit(100) + (d % 3) * 40).cast("long").as("length"))
    graft.operators.Crawl.fetchPlan(idx, maxGapBytes = 50L)
      .orderBy(col("filename"), col("start"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(q240MergeGeneration,
    q241CdxIndex, q242FetchPlan)
}
