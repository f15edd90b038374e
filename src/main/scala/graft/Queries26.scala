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

  val catalog: Seq[(String, QueryDef)] = Seq(q221CrawlAudit)
}
