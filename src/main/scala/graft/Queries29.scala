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

  /** One synthesized WARC `response` (ASCII payloads, q234's builder). */
  private def resp(uri: Column, http: Column): Column =
    concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <"),
      uri, lit(">\r\nContent-Type: application/http; msgtype=response" +
        "\r\nContent-Length: "), length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))

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

  val catalog: Seq[(String, QueryDef)] = Seq(q240MergeGeneration)
}
